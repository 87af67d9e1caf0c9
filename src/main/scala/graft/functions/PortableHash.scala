package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing for oracle-checkable fuzzy-dedup queries.
  *
  * The scale-path operators hash with `xxhash64` (fastest codegen'd
  * 64-bit hash Spark has), but no other engine reproduces Spark's
  * seeded xxhash64 — those queries could only be rows-count-checked.
  * This module trades a constant factor for *bit-exact cross-engine
  * agreement*: both Spark and DuckDB expose MD5 with identical hex
  * output, so "first 15 hex digits as an unsigned integer" is a
  * deterministic 60-bit hash computable in both. Every downstream
  * number (minhash permutations, LSH band buckets, SimHash bit votes,
  * fingerprints) is then plain 64-bit integer arithmetic, which is
  * exact in any engine.
  *
  * All modular arithmetic stays below 2^62: hash values are reduced
  * mod P (2^31-1, prime) before multiplication by coefficients < P.
  */
object PortableHash {

  /** Modulus for permutation/bucket arithmetic: 2^31 - 1 (prime). */
  val P: Long = 2147483647L

  /** Plain-JVM twin of [[hash60]] for executor-side imperative code
    * (streaming StatefulProcessors, codecs): md5 hex prefix, digit-
    * identical to the Spark column form and the DuckDB SQL form. */
  def hash60Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** 60-bit portable hash of a string column (Spark side): the fused
    * digest-to-long expression ([[org.apache.spark.sql.graftx.Md5Prefix60]]),
    * bit-identical to [[hash60Composed]] (Md5PrefixSpec) at ~2× less
    * per-row work — this is the dedup tier's innermost loop. */
  def hash60(c: Column): Column =
    org.apache.spark.sql.graftx.Md5Prefix60.col(c)

  /** The registry-free composed form (also what [[hash60SparkSql]]
    * embeds in SQL-text lambda bodies, where a custom expression
    * would need a registered SQL function). */
  def hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Spark SQL-text twin of [[hash60]] for use inside `expr(...)`
    * lambda bodies (higher-order functions take SQL fragments).
    * Resolves to the fused expression through the `md5_60` SQL
    * function `GraftExtensions` registers; a session without the
    * extensions should embed [[hash60ComposedSql]] instead. */
  def hash60SparkSql(x: String): String = s"md5_60($x)"

  /** Registry-free SQL-text twin (the composed chain). */
  def hash60ComposedSql(x: String): String =
    s"CAST(conv(substring(md5($x), 1, 15), 16, 10) AS BIGINT)"

  /** DuckDB twin of [[hash60]]: same md5 hex prefix, folded to an
    * integer with exact BIGINT arithmetic. */
  def hash60DuckSql(x: String): String =
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, 15), ''), " +
      "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), " +
      "(a, b) -> a * 16 + b)"

  /** Fixed universal-hash coefficients (a_h, b_h) for the minhash
    * permutation family h_i(x) = (a_i * (x mod P) + b_i) mod P.
    * Deterministic closed form so the Spark plan and the generated
    * oracle SQL embed the same literals. */
  val minhashCoeffs: IndexedSeq[(Long, Long)] = (0 until 64).map { h =>
    val a = ((h * 2654435761L + 1013904223L) % (P - 1)) + 1
    val b = (h * 2246822519L + 3266489917L) % P
    (a, b)
  }

  /** Spark column for permutation `h` applied to a 60-bit hash col. */
  def perm(h: Int, hashCol: Column): Column = {
    val (a, b) = minhashCoeffs(h)
    ((lit(a) * (hashCol % lit(P))) + lit(b)) % lit(P)
  }

  /** DuckDB fragment for permutation `h` over fragment `x`. */
  def permDuckSql(h: Int, x: String): String = {
    val (a, b) = minhashCoeffs(h)
    s"(${a}::BIGINT * (($x) % $P) + ${b}::BIGINT) % $P"
  }

  /** Polynomial band-bucket combine, Spark side: fold the band's
    * minhash values into one value mod P, seeded with the band index
    * (so equal signatures in different bands never collide). */
  def bandBucket(band: Int, ms: Seq[Column]): Column =
    ms.foldLeft(lit(band.toLong): Column)((acc, m) =>
      ((acc * lit(31L)) + m) % lit(P))

  /** DuckDB twin of [[bandBucket]] over fragments `ms`. */
  def bandBucketDuckSql(band: Int, ms: Seq[String]): String =
    ms.foldLeft(s"${band}::BIGINT")((acc, m) => s"(($acc) * 31 + ($m)) % $P")
}
