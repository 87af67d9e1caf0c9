package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.MergeByKey
import Exact._

/** Pipeline-operator queries: keyed upsert (M1) and multimodal binary
  * plumbing, both oracle-checked.
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q31 — mergeByKey upsert (`trips_lambda.py:180-206`): a target
  // extract, an overlapping updates batch (10% price bump, status
  // 'U'), merged on the natural key; updates win. Verified through an
  // aggregate so the result is stable and small.
  // ---------------------------------------------------------------------
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val target = o.filter(col("o_orderdate") < to_timestamp(lit("1997-07-01")))
    val updates = o
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select(col("o_orderkey"), col("o_custkey"),
        lit("U").as("o_orderstatus"),
        // +1000.0 not *1.1: a product needs re-rounding, and Spark's
        // BigDecimal HALF_UP differs from DuckDB's double rounding on
        // boundary values; addition keeps 2-decimal values exact.
        (col("o_totalprice") + 1000.0).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    MergeByKey.merge(target, updates, Seq("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        fixedSum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  private val q31Sql =
    s"""WITH target AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |         o_orderdate, o_orderpriority, 0 AS prio
       |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01'),
       |updates AS (
       |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
       |         o_totalprice + 1000.0 AS o_totalprice,
       |         o_orderdate, o_orderpriority, 1 AS prio
       |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
       |    AND o_orderdate < TIMESTAMP '1998-01-01'),
       |merged AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |      ORDER BY prio DESC) AS rn
       |    FROM (SELECT * FROM target UNION ALL SELECT * FROM updates))
       |  WHERE rn = 1)
       |SELECT o_orderstatus, count(*) AS n,
       |  count(DISTINCT o_orderkey) AS n_keys,
       |  ${fixedSumSql("o_totalprice")} AS total
       |FROM merged
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // q32 — multimodal binary plumbing: opaque bytes + typed metadata
  // (kind), byte length, hex signature; aggregated per (kind, lang).
  // The decode stage itself is exercised in the Multimodal specs (its
  // stub hashing is not SQL-expressible).
  // ---------------------------------------------------------------------
  private def q32(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.operators.Multimodal.kindFor(col("doc_id")).as("kind"),
        encode(col("text"), "UTF-8").as("content"))
      .select(col("doc_id"), col("lang"), col("kind"),
        length(col("content")).cast("long").as("n_bytes"),
        substring(hex(col("content")), 1, 16).as("sig_hex"))
      .groupBy(col("kind"), col("lang"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("sig_hex")).as("min_sig"))
      .orderBy(col("kind"), col("lang"))

  private val q32Sql =
    """WITH media AS (
      |  SELECT doc_id, lang,
      |    (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    substr(upper(hex(encode(text))), 1, 16) AS sig_hex
      |  FROM documents)
      |SELECT kind, lang, count(*) AS n_media,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  min(sig_hex) AS min_sig
      |FROM media
      |GROUP BY kind, lang
      |ORDER BY kind, lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_merge_upsert" -> (q31 _),
    "q32_multimodal_binary" -> (q32 _))

  val oracle: Map[String, String] = Map(
    "q31_merge_upsert" -> q31Sql,
    "q32_multimodal_binary" -> q32Sql)
}
