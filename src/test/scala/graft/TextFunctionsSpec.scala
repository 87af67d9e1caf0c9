package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{Geo, Text, Vectors}

/** Scalar-function units: haversine against known city distances,
  * tokenizers, shingles, quality bounds, lang-ID, vector math. */
class TextFunctionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("haversine Zurich-Bern is ~95 km (coords from " +
       "weather_lambda.py:15,19)") {
    val d = Seq((47.3769, 8.5417, 46.9480, 7.4474)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(math.abs(d - 95.0) < 2.0)
  }

  test("haversine of identical points is 0") {
    val d = Seq((47.0, 8.0)).toDF("a", "b")
      .select(Geo.haversineKm(col("a"), col("b"), col("a"), col("b")))
      .as[Double].head()
    assert(d == 0.0)
  }

  test("tokenizers split and drop empties") {
    val df = Seq("The  quick, brown fox!").toDF("t")
    assert(df.select(size(Text.words(col("t")))).as[Int].head() == 4)
    assert(df.select(Text.alnumTokens(col("t"))).as[Seq[String]].head() ==
      Seq("the", "quick", "brown", "fox"))
  }

  test("shingles: n-grams in order; short docs yield empty array") {
    val df = Seq("a b c d").toDF("t")
    assert(df.select(Text.shingles(col("t"), 3)).as[Seq[String]].head() ==
      Seq("a b c", "b c d"))
    assert(Seq("a b").toDF("t").select(Text.shingles(col("t"), 3))
      .as[Seq[String]].head().isEmpty)
  }

  test("native shingles == composed shingles bit-for-bit on real docs " +
       "and adversarial inputs") {
    val real = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select(col("text").as("t"))
    val adversarial = Seq("", " ", "  a  b  ", "a", "a b", "a b c",
      " leading", "trailing ", "x  y   z", "a b c d e").toDF("t")
    for (df <- Seq(real, adversarial); n <- Seq(1, 3, 8)) {
      val mismatches = df.select(
          Text.shingles(col("t"), n).as("nat"),
          Text.shinglesComposed(col("t"), n).as("ref"))
        .filter(not(col("nat") <=> col("ref")))
        .count()
      assert(mismatches == 0, s"n=$n: $mismatches rows differ")
    }
  }

  test("word_ngrams is registered as a SQL function and matches the " +
       "Column API") {
    val got = spark.sql(
      "SELECT word_ngrams('a b c d', 2) AS g").as[Seq[String]].head()
    assert(got == Seq("a b", "b c", "c d"))
  }

  test("quality score is within [0,1] and orders sensibly") {
    val df = Seq(
      ("good", ("meaningful document describing catalyst optimizer " +
        "internals with substantial vocabulary richness ") * 3),
      ("bad", "the the the the the the")).toDF("k", "t")
    val m = df.select(col("k"), Text.qualityScore(col("t")))
      .as[(String, Double)].collect().toMap
    assert(m.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(m("good") > m("bad"))
  }

  test("language heuristic distinguishes stopword profiles") {
    val df = Seq(
      ("en", "the cat is on the roof of the house"),
      ("es", "el gato que duerme en la casa y un perro"),
      ("de", "der hund und die katze ist ein tier zu hause"),
      ("unk", "xyzzy plugh qwerty")).toDF("expect", "t")
    val got = df.select(col("expect"), Text.langIdHeuristic(col("t")))
      .as[(String, String)].collect()
    got.foreach { case (exp, g) => assert(g == exp, s"for $exp got $g") }
  }

  test("simhash bits: 64 bits, identical text -> identical bits") {
    val df = Seq("spark catalyst tungsten", "spark catalyst tungsten")
      .toDF("text")
    val bits = df.select(Text.simhashBits(
      "filter(split(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)"))
      .as[Seq[Int]].collect()
    assert(bits(0).length == 64 && bits(0) == bits(1))
    assert(bits(0).forall(b => b == 0 || b == 1))
  }

  test("hamming distance counts differing bits") {
    val df = Seq((Seq(1, 0, 1, 0), Seq(1, 1, 0, 0))).toDF("a", "b")
    assert(df.select(Text.hamming(col("a"), col("b")))
      .as[Long].head() == 2L)
  }

  test("vector math: dot, norm, cosine on known values") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f)))
      .toDF("a", "b")
    assert(df.select(Vectors.dot(col("a"), col("b"))).as[Double].head()
      == 18.0)
    assert(df.select(Vectors.norm(col("a"))).as[Double].head() == 3.0)
    assert(math.abs(df.select(Vectors.cosine(col("a"), col("b")))
      .as[Double].head() - 1.0) < 1e-12)
    assert(df.select(Vectors.l2(col("a"), col("b"))).as[Double].head() == 3.0)
  }

  test("cosine of orthogonal vectors is 0; zero vector is null") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 0.0f))).toDF("a", "b")
    val out = df.select(Vectors.cosine(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(out(1).isNullAt(0))
  }

  test("repetitionStats flags the looped doc, not the varied one") {
    val df = Seq(
      ("loop", Seq.fill(20)("buy now click here").mkString(" ")),
      ("varied", (1 to 80).map(i => s"tok$i").mkString(" ")),
      ("tiny", "one two")) // fewer words than the n-gram width
      .toDF("k", "t")
    val out = df.select(col("k"),
        inline(array(Text.repetitionStats(col("t"), 3))))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_distinct_grams"),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val (ng, nd, frac) = out("loop")
    assert(ng == 78 && nd <= 4 && frac.exists(_ > 0.9))
    assert(out("varied")._3.exists(_ == 0.0))
    assert(out("tiny") == ((0L, 0L, None)))
  }

  test("tf-idf ranks distinctive terms above corpus-wide ones") {
    val docs = Seq(
      (1L, "shared shared zebra zebra zebra"),
      (2L, "shared shared quark"),
      (3L, "shared shared shared")).toDF("doc_id", "text")
    val top = graft.operators.TfIdf.topTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "token").as[(Long, String)].collect().toMap
    assert(top(1L) == "zebra") // df=1, high tf
    assert(top(2L) == "quark") // df=1
    assert(top(3L) == "shared") // only term; idf 0, still ranked
  }

  test("fingerprint is stable under trailing edits") {
    val df = Seq(
      ("a", "alpha beta gamma delta epsilon zeta eta theta"),
      ("b", "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("k", "t")
    val fp = df.select(col("k"), Text.fingerprint(col("t")))
      .as[(String, Long)].collect().toMap
    // min-hash over shared shingles often coincides; at minimum it's
    // deterministic and non-null
    assert(fp.size == 2)
  }
}
