package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.BloomFilterX

import graft.core.Tables
import graft.functions.Vectors
import graft.operators.{Curate, MergeByKey}

/** Corpus-curation operators: weighted sampling, content-defined
  * shared spans, centroid assignment, SCD2 time travel, bloom-filter
  * join pruning. */
class CurationSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("weightedSample: deterministic, weight-monotone, never keeps " +
       "zero-weight rows, always keeps dominant rows") {
    val df = (1L to 1000L).map(i => (i, if (i == 1) 0L else i)).toDF("k", "w")
    val s1 = Curate.weightedSample(df, col("k"), col("w"), 50.0)
      .select("k").as[Long].collect().sorted
    val s2 = Curate.weightedSample(df, col("k"), col("w"), 50.0)
      .select("k").as[Long].collect().sorted
    assert(s1.sameElements(s2), "resampling must select identical rows")
    assert(!s1.contains(1L), "zero-weight row can never be sampled")
    // expected size is k; allow generous slack for a 1000-row universe
    assert(s1.length > 20 && s1.length < 100, s"got ${s1.length}")
    // a row carrying more than W/k of the weight is kept surely:
    // u < 1 <= k*w/W
    val heavy = ((1L to 10L).map(i => (i, 1L)) :+ (99L, 1000000L))
      .toDF("k", "w")
    val hs = Curate.weightedSample(heavy, col("k"), col("w"), 2.0)
      .select("k").as[Long].collect()
    assert(hs.contains(99L), "dominant-weight row must always be kept")
  }

  test("anchor windows match shared runs at DIFFERENT offsets " +
       "(content-defined, not grid-aligned)") {
    val run = (1 to 12).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $run gamma"),            // run at offset 2
      (2L, s"$run delta epsilon zeta eta theta"), // run at offset 0
      (3L, "nothing in common with the others at all here")
    ).toDF("doc_id", "text")
    val wins = Curate.anchorWindowTable(docs, "doc_id", "text", 8, 4)
    val pairs = Curate.sharedSpanPairs(wins)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      "12-token shared run must anchor at least one common 8-window")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // docs shorter than the window emit nothing
    val short = Seq((9L, "just seven tokens sit in this doc")).toDF("doc_id", "text")
    assert(Curate.anchorWindowTable(short, "doc_id", "text", 8, 4).count() == 0)
  }

  test("assignToCenters == brute-force argmax on real embeddings") {
    val e = Tables.load(spark, TestSpark.sf001, "embeddings")
    val centers = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("center_id"), col("embedding").as("cvec"))
    val fast = Curate.assignToCenters(e.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", centers, "center_id", "cvec")
      .select(col("vec_id"), col("center_id"))
    val brute = e.select(col("vec_id"), col("embedding"))
      .crossJoin(centers)
      .withColumn("cos", Vectors.cosine(col("embedding"), col("cvec")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("cos").desc, col("center_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("center_id"))
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
  }

  test("snapshotAt honors half-open [from, to) validity") {
    val v = Seq(
      // key 1: v1 closed at 2020, v2 open since 2020
      (1L, "a", ts("2010-01-01"), Some(ts("2020-01-01")), false),
      (1L, "b", ts("2020-01-01"), None, true),
      // key 2: single open version since 2015
      (2L, "c", ts("2015-01-01"), None, true)
    ).map { case (k, x, f, t, c) => (k, x, f, t.orNull, c) }
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    def snap(at: String) =
      MergeByKey.snapshotAt(v, lit(at).cast("timestamp"))
        .select("k", "attr").as[(Long, String)].collect().toSet
    assert(snap("2012-06-01") == Set((1L, "a")))
    // AT the transition instant the new version wins (half-open)
    assert(snap("2020-01-01") == Set((1L, "b"), (2L, "c")))
    assert(snap("2009-01-01") == Set.empty[(Long, String)])
  }

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("zorder2: bijective on the bucket grid, and an aligned 8x8 " +
       "tile occupies one contiguous z range") {
    val grid = spark.range(0, 32).select(col("id").as("x"))
      .crossJoin(spark.range(0, 32).select(col("id").as("y")))
      .withColumn("z", graft.operators.Layout.zorder2(col("x"), col("y"), 5))
    val n = grid.count()
    assert(grid.select("z").distinct().count() == n, "must be a bijection")
    val mm = grid.agg(min("z"), max("z")).as[(Long, Long)].head()
    assert(mm == ((0L, 1023L)), "5+5 bits must fill [0, 1024) exactly")
    // the aligned tile x in [8,16), y in [24,32): all 64 cells share
    // one value of z >> 6 — the property that makes file-level min/max
    // stats prune 2-D boxes
    val tiles = grid.filter(col("x") >= 8 && col("x") < 16 &&
        col("y") >= 24 && col("y") < 32)
      .select(org.apache.spark.sql.functions.shiftright(col("z"), 6))
      .distinct().count()
    assert(tiles == 1, s"aligned tile fragmented into $tiles z ranges")
  }

  test("zorderWrite clusters files so a 2-D box touches few of them") {
    val dir = java.nio.file.Files.createTempDirectory("zw").toString
    val df = spark.range(0, 65536).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    graft.operators.Layout.zorderWrite(df,
      graft.operators.Layout.zorder2(col("x"), col("y"), 8), 16, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 65536)
    // the box read returns exactly the right rows from the clustered copy
    val box = back.filter(col("x") >= 16 && col("x") < 32 &&
      col("y") >= 16 && col("y") < 32)
    assert(box.count() == 256)
  }

  test("compact: collapses a many-small-files table into few evenly " +
       "sized files, losing nothing, surviving re-runs") {
    val dir = java.nio.file.Files.createTempDirectory("cmp").toString + "/t"
    spark.range(0, 10000).repartition(64)
      .write.mode("overwrite").parquet(dir)
    def parts = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts == 64)
    graft.sources.Ingest.compact(spark, dir, targetRowsPerFile = 2500L)
    assert(parts == 4, s"expected 4 files, got $parts")
    assert(spark.read.parquet(dir).count() == 10000)
    // idempotent: compacting a compacted table is a no-op rewrite
    graft.sources.Ingest.compact(spark, dir, targetRowsPerFile = 2500L)
    assert(parts == 4 && spark.read.parquet(dir).count() == 10000)
  }

  test("Salt.join == plain join, and the hot key's rows really " +
       "spread across salt buckets") {
    val fact = (1 to 20000).map(i =>
      (if (i % 2 == 0) 0L else (i % 50).toLong, i.toDouble))
      .toDF("k", "v")
    val dim = (0L until 50L).map(k => (k, s"g${k % 7}")).toDF("k", "grp")
    val salted = graft.operators.Salt.join(fact, dim, Seq("k"), 8)
    val plain = fact.join(dim, "k")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key occupies all 8 buckets
    val spread = fact.withColumn("__salt",
      pmod(xxhash64(col("k"), col("v")), lit(8)))
      .filter(col("k") === 0L).select("__salt").distinct().count()
    assert(spread == 8, s"hot key only reached $spread salt buckets")
  }

  test("chunkWindows: stride==win partitions the token stream exactly; " +
       "stride<win overlaps; empty docs vanish") {
    val docs = Seq(
      (1L, (1 to 47).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"),
      (3L, "   ")).toDF("doc_id", "text")
    // partition mode: reassembling the chunks reproduces the doc
    val part = Curate.chunkWindows(docs, "doc_id", "text", 10, 10)
    val rebuilt = part.orderBy("doc_id", "chunk_idx")
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list(col("chunk_text"))).as("re"))
      .as[(Long, String)].collect().toMap
    assert(rebuilt(1L) == (1 to 47).map(i => s"t$i").mkString(" "))
    assert(rebuilt(2L) == "a b c")
    assert(!rebuilt.contains(3L), "token-less doc must produce no chunks")
    // overlap mode: ceil(47/15)=4 chunks, all but the last full-width,
    // consecutive chunks share win-stride tokens
    val over = Curate.chunkWindows(docs, "doc_id", "text", 20, 15)
      .filter(col("doc_id") === 1L)
      .orderBy("chunk_idx")
      .select("chunk_start", "n_chunk_tokens").as[(Long, Long)].collect()
    assert(over.map(_._1).sameElements(Array(0L, 15L, 30L, 45L)))
    assert(over.map(_._2).sameElements(Array(20L, 20L, 17L, 2L)))
  }

  test("temperatureSample: deterministic; α=1 is weight-proportional; " +
       "α→0 flattens toward uniform group budgets") {
    val df = ((1 to 900).map(i => (i.toLong, "big", 100L)) ++
      (901 to 1000).map(i => (i.toLong, "small", 100L)))
      .toDF("k", "g", "w")
    def share(alpha: Double): (Long, Long) = {
      val kept = Curate.temperatureSample(df, col("k"), col("g"),
        col("w"), alpha, 200.0)
      val m = kept.groupBy("g").count().as[(String, Long)].collect().toMap
      (m.getOrElse("big", 0L), m.getOrElse("small", 0L))
    }
    val (b1, s1) = share(1.0)
    val (b2, s2) = share(0.2)
    // α=1: budgets ∝ totals (9:1) → small ≈ 20 of 200
    assert(s1 < 60, s"α=1 small-group share should stay near 20, got $s1")
    // flattening must strictly boost the small group's share
    assert(s2.toDouble / (b2 + s2) > 2.0 * s1.toDouble / (b1 + s1),
      s"α=0.2 must upsample the small group: α1=($b1,$s1) α0.2=($b2,$s2)")
    val again = share(0.2)
    assert(again == ((b2, s2)), "resampling must be deterministic")
  }

  test("packSequences: chunks preserved, bins contiguous per bucket, " +
       "every non-final bin crosses its budget boundary") {
    val chunks = (1L to 200L).map(i =>
      (i % 4, i, 7L + i % 5)).toDF("bucket", "ord", "nt")
    val packed = Curate.packSequences(chunks, col("bucket"),
      Seq(col("ord")), col("nt"), budget = 50L)
    assert(packed.count() == 200L, "packing must not drop or dup chunks")
    val bins = packed.groupBy("bucket", "bin_idx")
      .agg(sum(col("nt")).as("tok"))
      .orderBy("bucket", "bin_idx")
      .as[(Long, Long, Long)].collect()
    for ((bkt, grp) <- bins.groupBy(_._1)) {
      val idx = grp.map(_._2)
      assert(idx.sameElements(idx.indices.map(_.toLong)),
        s"bucket $bkt bins not dense: ${idx.mkString(",")}")
      // prefix property: cumulative tokens through every non-final
      // bin k reach past (k+1)·budget (bins fill before a new one opens)
      val cum = grp.map(_._3).scanLeft(0L)(_ + _).tail
      for (k <- 0 until grp.length - 1)
        assert(cum(k) >= (k + 1) * 50L,
          s"bucket $bkt bin $k closed at ${cum(k)} < ${(k + 1) * 50}")
    }
  }

  test("bm25: term hits dominate, length normalization favors the " +
       "shorter doc at equal tf, non-matching docs score zero") {
    val filler = (1 to 40).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, "spark spark merge window short doc"),
      (2L, s"spark spark merge window $filler"),
      (3L, s"nothing relevant here $filler")).toDF("doc_id", "text")
    val r = graft.operators.TfIdf.bm25(docs, "doc_id", "text",
        Seq("spark", "merge", "window"), k = 10)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(r(1L) > r(2L),
      "same tf in a shorter doc must outscore the longer doc")
    assert(r(2L) > r(3L), "matching doc must outscore non-matching")
    assert(r(3L) == 0L, "no query term ⇒ zero score")
  }

  test("capPerGroup == the row_number window formulation, rank for " +
       "rank, on tie-heavy data") {
    val df = (1L to 400L)
      .map(i => (i, s"src${i % 5}", i % 7)) // heavy order-key ties
      .toDF("id", "src", "score")
    val got = Curate.capPerGroup(df, Seq("src"),
        Seq(("score", true), ("id", false)), k = 10)
      .select("src", "id", "rank")
      .as[(String, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select("src", "id", "rank")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("balancedSample: exactly min(k, |class|) per class, " +
       "deterministic, and a different k is a prefix of the same " +
       "permutation") {
    val df = ((1L to 300L).map(i => (i, "big")) ++
      (301L to 306L).map(i => (i, "small"))).toDF("id", "cls")
    def sample(k: Int) = Curate.balancedSample(df, Seq("cls"), "id", k)
      .select("cls", "id").as[(String, Long)].collect().toSet
    val s10 = sample(10)
    assert(s10.count(_._1 == "big") == 10)
    assert(s10.count(_._1 == "small") == 6, "small class kept whole")
    assert(sample(10) == s10, "resampling must select identical rows")
    assert(sample(5).subsetOf(s10),
      "k=5 must be a prefix of the k=10 hash permutation")
  }

  test("dictEncode: dense 1-based ids ordered by value, identical " +
       "id for equal values, no corpus shuffle") {
    val df = Seq((1L, "fr"), (2L, "de"), (3L, "fr"), (4L, "en"))
      .toDF("id", "lang")
    val enc = Curate.dictEncode(df, "lang", "lang_id")
    val got = enc.select("id", "lang_id").as[(Long, Long)]
      .collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 3L, 4L -> 2L))
    assert(!enc.queryExecution.executedPlan.toString
      .contains("SortMergeJoin"), "vocab must broadcast")
  }

  test("globalCumMax: exclusive running max carries across range " +
       "partitions; first row is NULL; globalRank/globalCumSum agree " +
       "with the window formulation on a multi-partition input") {
    val rows = (1L to 100L).map(i => (i, (i * 37) % 101))
    val df = rows.toDF("k", "v")
    // exclusive running max in k order, computed naively
    val expect = rows.sortBy(_._1).scanLeft((0L, Option.empty[Long])) {
      case ((_, prev), (k, v)) =>
        (k, Some(prev.fold(v)(math.max(_, v))))
    }.sliding(2).map { case Seq((_, prev), (k, _)) => k -> prev }
      .toMap
    val got = Curate
      .globalCumMax(df, Seq(col("k")), col("v"), "m",
        inclusive = false, parts = 7)
      .select("k", "m").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).isEmpty, "first row must have no prior max")
    assert(got == expect.updated(1L, None))
    // rank + cum-sum against the window truth on the same input
    val rk = Curate.globalRank(df, Seq(col("v"), col("k")), parts = 7)
      .select("k", "rnk").as[(Long, Long)].collect().toMap
    val sorted = rows.sortBy(r => (r._2, r._1)).map(_._1).zipWithIndex
      .map { case (k, i) => k -> (i + 1L) }.toMap
    assert(rk == sorted)
    val cs = Curate.globalCumSum(df, Seq(col("k")), col("v"), "c",
        parts = 7)
      .select("k", "c").as[(Long, Long)].collect().toMap
    val cumTruth = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (k, v)) => (k, acc + v) }
      .drop(1).toMap
    assert(cs == cumTruth)
  }

  test("keyedCumSum: per-key rank and running sum carry across range " +
       "partitions and agree with the per-key window truth; keys " +
       "never mix") {
    // 3 keys × 40 rows, interleaved, with a value pattern that makes
    // any cross-key leakage or carry error visible
    val rows = for (i <- 1L to 120L) yield
      (s"k${i % 3}", i, (i * 13) % 17)
    val df = rows.toDF("key", "t", "v")
    val got = Curate.keyedCumSum(df, Seq("key"), Seq(col("t")),
        col("v"), "c", "n", parts = 7)
      .select("key", "t", "n", "c")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val truth = rows.groupBy(_._1).flatMap { case (k, rs) =>
      rs.sortBy(_._2).zipWithIndex
        .scanLeft(((k, 0L), (0L, 0L))) { case ((_, (_, acc)), ((_, t, v), i)) =>
          ((k, t), (i + 1L, acc + v))
        }.drop(1)
    }.toMap
    assert(got == truth)
  }

  test("keyedCumSum offsets-grain guard: a high-cardinality key " +
       "raises loudly before the parts×keys broadcast builds; under " +
       "the cap results are identical to the unguarded run") {
    // 120 DISTINCT keys at parts=7 -> offsets grain ~120 rows: a cap
    // of 50 must trip (this is the Window.partitionBy(key) regime)
    val rows = for (i <- 1L to 120L) yield (s"k$i", i, i % 17)
    val df = rows.toDF("key", "t", "v")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Throwable] {
      Curate.keyedCumSum(df, Seq("key"), Seq(col("t")), col("v"),
        "c", "n", parts = 7, maxOffsetRows = Some(50L)).count()
    }
    assert(msgs(ex).exists(_.contains("maxOffsetRows")), msgs(ex))
    // results-preserving when under the cap (and None opts out)
    val a = Curate.keyedCumSum(df, Seq("key"), Seq(col("t")), col("v"),
        "c", "n", parts = 7, maxOffsetRows = Some(1000L))
      .select("key", "n", "c").as[(String, Long, Long)].collect().toSet
    val b = Curate.keyedCumSum(df, Seq("key"), Seq(col("t")), col("v"),
        "c", "n", parts = 7, maxOffsetRows = None)
      .select("key", "n", "c").as[(String, Long, Long)].collect().toSet
    assert(a == b && a.size == 120)
  }

  test("redact masks every pattern match and counts them per row") {
    val df = Seq((1L, "aaa bcd eee"), (2L, "xyz"), (3L, ""))
      .toDF("id", "text")
    val got = Curate.redact(df, "text", "[ae]+", "#")
      .select("id", "text", "n_matches")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "# bcd #", 2L), (2L, "xyz", 0L), (3L, "", 0L)))
  }

  test("WordWindows generator is row-for-row identical to the " +
       "composed chunking chain") {
    val real = graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .limit(120).select(col("doc_id"), col("text"))
    val adversarial = Seq(
      (9001L, ""), (9002L, " "), (9003L, "  double  spaces  "),
      (9004L, "one"), (9005L, "exactly ten tokens a b c d e f g"),
      (9006L, (1 to 47).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val docs = real.unionByName(adversarial)
    for ((win, stride) <- Seq((10, 10), (20, 15), (8, 3), (1, 1))) {
      val gen = graft.operators.Curate
        .chunkWindows(docs, "doc_id", "text", win, stride)
      val composed = graft.operators.Curate
        .chunkWindowsComposed(docs, "doc_id", "text", win, stride)
      assert(gen.exceptAll(composed).isEmpty &&
        composed.exceptAll(gen).isEmpty,
        s"win=$win stride=$stride diverged")
    }
  }

  test("GramCells generator is row-for-row identical to the composed " +
       "HOF upper-triangle expansion, including null components") {
    val real = graft.core.Tables.load(spark, TestSpark.sf001, "embeddings")
      .limit(100).select(col("embedding"))
    val adversarial = Seq(
      Seq(0.5f, -0.25f, 0.125f),            // tiny vector
      Seq(1.0f),                            // single component
      Seq(0.123456f, -0.999999f, 0.000049f, -0.000051f)) // round edges
      .toDF("embedding")
    // a vector with a null component: p must be null for its cells
    val withNull = spark.sql(
      "SELECT array(CAST(0.5 AS FLOAT), CAST(NULL AS FLOAT), " +
        "CAST(-0.25 AS FLOAT)) AS embedding")
    val vecs = real.unionByName(adversarial).unionByName(withNull)
    val gen = vecs.select(
      org.apache.spark.sql.graftx.GramCells.col(col("embedding")))
    val composed = vecs
      .select(expr("transform(embedding, v -> " +
        "CAST(round(CAST(v AS DOUBLE) * 10000) AS BIGINT))").as("xe"))
      .select(explode(expr(
        """flatten(transform(sequence(1, size(xe)), i ->
          |  transform(sequence(i, size(xe)), j -> named_struct(
          |    'i', CAST(i AS BIGINT), 'j', CAST(j AS BIGINT),
          |    'p', element_at(xe, i) * element_at(xe, j)))))"""
          .stripMargin)).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.p").as("p"))
    assert(gen.exceptAll(composed).isEmpty &&
      composed.exceptAll(gen).isEmpty,
      "GramCells diverged from the composed HOF form")
  }

  test("bloom probe admits every true key (no false negatives) and " +
       "prunes most others") {
    val keys = spark.range(0, 2000).filter(col("id") % 2 === 0)
    val bloom = keys.agg(
      BloomFilterX.agg(xxhash64(col("id")), 1000L, 8000L).as("bf"))
    val probed = spark.range(0, 2000)
      .filter(BloomFilterX.mightContain(bloom, xxhash64(col("id"))))
      .select("id").as[Long].collect().toSet
    assert((0L until 2000L by 2).forall(probed.contains),
      "a bloom filter must never reject a member")
    val falsePos = probed.count(_ % 2 == 1)
    assert(falsePos < 100, s"expected ~1% false positives, got $falsePos")
  }
}
