package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.operators.{BikeStatus, Dedup, MergeByKey, TripParams, Trips}

/** Property-based invariants (SURVEY.md §5.3): trip bounds hold on
  * random snapshot streams with duplicates and out-of-order arrivals;
  * merge is idempotent and last-writer-wins on random batches.
  * (scalacheck Gens driven by fixed seeds — the scalatest bridge
  * module isn't in the offline dependency cache.) */
class PropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Deterministic sampler: n cases from a Gen. */
  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val base = Timestamp.valueOf("2024-06-10 00:00:00").getTime
  private val winStart = Timestamp.valueOf("2024-06-10 00:00:00")
  private val winEnd = Timestamp.valueOf("2024-06-11 00:00:00")

  private val genSnapshot: Gen[BikeStatus] = for {
    bike <- Gen.oneOf("b1", "b2", "b3")
    // offsets quantized to 30s so duplicates and exact-boundary gaps
    // actually occur
    offS <- Gen.choose(0L, 20L * 3600).map(_ / 30 * 30)
    lat <- Gen.choose(46.0, 48.0)
    lon <- Gen.choose(6.0, 9.0)
  } yield BikeStatus(bike, "p", lat, lon, false, false,
    new Timestamp(base + offS * 1000))

  test("trip invariants hold on arbitrary snapshot streams") {
    cases(Gen.listOfN(60, genSnapshot), 8).foreach { snaps =>
      val p = TripParams()
      val trips = Trips.deriveTrips(snaps.toDS(), winStart, winEnd, p)
        .collect()
      trips.foreach { t =>
        assert(!t.trip_start.after(t.trip_end))
        assert(t.total_duration >= p.minTripMinutes &&
          t.total_duration <= p.maxTripMinutes)
        assert(t.segment_count >= p.minSegments)
        assert(t.total_distance > 0)
      }
      // derivation is deterministic under shuffling of input order
      val shuffled = scala.util.Random.shuffle(snaps)
      val again = Trips.deriveTrips(shuffled.toDS(), winStart, winEnd, p)
        .collect()
      assert(trips.sortBy(_.bike_id).toSeq.map(_.bike_id) ==
        again.sortBy(_.bike_id).toSeq.map(_.bike_id))
    }
  }

  private val genBatch: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 1000L)))

  test("merge: idempotent and update-wins on random batches") {
    cases(Gen.zip(genBatch, genBatch), 8).foreach { case (t, u) =>
      // dedupe within batch deterministically (max value per key), as
      // a well-formed upsert batch would be
      val target = t.toDF("id", "v").groupBy("id").agg(max("v").as("v"))
      val updates = u.toDF("id", "v").groupBy("id").agg(max("v").as("v"))
      val m1 = MergeByKey.merge(target, updates, Seq("id"))
      val m2 = MergeByKey.merge(m1, updates, Seq("id"))
      assert(m1.exceptAll(m2).isEmpty && m2.exceptAll(m1).isEmpty)
      // every update key carries the update's value
      val uMap = updates.as[(Long, Long)].collect().toMap
      m1.as[(Long, Long)].collect().foreach { case (k, v) =>
        uMap.get(k).foreach(uv => assert(v == uv))
      }
      // key set is the union
      assert(m1.select("id").as[Long].collect().toSet ==
        (target.select("id").as[Long].collect().toSet ++ uMap.keySet))
    }
  }

  test("TopKPerKey == window row_number on random keyed data with " +
       "heavy ties and tiny/huge groups") {
    import org.apache.spark.sql.expressions.Window
    val genRow = for {
      key <- Gen.choose(0L, 5L)       // few keys -> big groups
      score <- Gen.choose(0, 4)       // tiny domain -> many ties
      id <- Gen.choose(0L, 10000L)
    } yield (key, id, score.toDouble)
    cases(Gen.listOfN(400, genRow), 4).foreach { rows =>
      val df = rows.distinct.toDF("query_id", "vec_id", "cos")
        .repartition(7)
      val custom = org.apache.spark.sql.graftx.TopKPerKeyPlan
        .topK(df, Seq("query_id"), Seq("cos" -> true, "vec_id" -> false), 3)
        .select("query_id", "vec_id", "cos", "rank")
        .as[(Long, Long, Double, Long)].collect().sorted.toSeq
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("vec_id").asc)
      val window = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select("query_id", "vec_id", "cos", "rank")
        .as[(Long, Long, Double, Long)].collect().sorted.toSeq
      assert(custom == window)
    }
  }

  test("intervalOverlap == the naive theta join on random interval " +
       "sets (boundary-heavy, bucket-straddling)") {
    val genIv: Gen[(Long, Long, Long)] = for {
      start <- Gen.choose(0L, 5000L)
      len <- Gen.frequency(3 -> Gen.choose(0L, 50L),  // short + points
        2 -> Gen.choose(50L, 400L),                    // bucket-straddling
        1 -> Gen.const(0L))                            // zero-length
    } yield (0L, start, start + len)
    cases(Gen.listOfN(60, genIv), 3).zipWithIndex.foreach {
      case (sampled, round) =>
      val ivs = sampled.zipWithIndex
        .map { case ((_, s, e), i) => (i.toLong + round * 1000, s, e) }
      val l = ivs.toDF("l_id", "l_start", "l_end")
      val r = ivs.map { case (i, s, e) => (i + 500000, s, e) }
        .toDF("r_id", "r_start", "r_end")
      val got = graft.operators.RangeJoin
        .intervalOverlap(l, r, bucketSec = 100L)
        .select("l_id", "r_id").as[(Long, Long)].collect().toList
      assert(got.size == got.toSet.size, "duplicate pair emitted")
      val naive = l.crossJoin(r)
        .filter(col("l_start") <= col("r_end") &&
          col("r_start") <= col("l_end"))
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(got.toSet == naive,
        s"round $round: grid join diverged from naive theta join")
    }
  }

  test("approx_count_distinct lands within its error bound") {
    val got = SparkEntry.queries("q41_approx_distinct")(
      spark, TestSpark.sf001).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("approx_orders_ok") == 1L,
        s"HLL orders estimate out of bound for ${r.getAs[String]("l_returnflag")}")
      assert(r.getAs[Long]("approx_parts_ok") == 1L,
        s"HLL parts estimate out of bound for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("tableDiff recovers a random perturbation's exact classification") {
    import graft.operators.Validate
    val genRows: Gen[List[(Long, Long)]] =
      Gen.listOfN(200, Gen.zip(Gen.choose(0L, 300L), Gen.choose(0L, 9L)))
    cases(genRows, 4).foreach { raw =>
      val v1rows = raw.toMap.toSeq // unique keys
      // deterministic perturbation with known ground truth
      val removed = v1rows.filter(_._1 % 11 == 0).map(_._1).toSet
      val changed = v1rows.filter(r => r._1 % 11 != 0 && r._1 % 7 == 0)
        .map(_._1).toSet
      val added = v1rows.filter(_._1 % 13 == 0).map { case (k, v) =>
        (k + 100000L, v) }
      val v2rows = v1rows.collect {
        case (k, v) if !removed.contains(k) =>
          (k, if (changed.contains(k)) v + 1 else v)
      } ++ added
      val d = Validate.tableDiff(
          v1rows.toDF("key", "v"), v2rows.toDF("key", "v"),
          col("key"), col("v").cast("string"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      v1rows.foreach { case (k, _) =>
        val expect =
          if (removed.contains(k)) "removed"
          else if (changed.contains(k)) "changed" else "unchanged"
        assert(d(k) == expect, s"key $k")
      }
      added.foreach { case (k, _) => assert(d(k) == "added", s"key $k") }
    }
  }

  test("survivor keeps, per attribute, exactly the latest non-null " +
       "on random observation histories") {
    val genObs: Gen[List[(Long, Long, Option[Long], Option[String])]] =
      Gen.listOfN(120, for {
        key <- Gen.choose(0L, 5L)
        ord <- Gen.choose(0L, 1000000L)
        a <- Gen.option(Gen.choose(0L, 99L))
        b <- Gen.option(Gen.oneOf("x", "y", "z"))
      } yield (key, ord, a, b))
    cases(genObs, 4).foreach { raw =>
      // unique ord per key (survivor's documented contract)
      val obs = raw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val out = MergeByKey.survivor(
          obs.toDF("k", "ord", "a", "b"), Seq("k"), "ord", Seq("a", "b"))
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Any]("a"), r.getAs[Any]("b"), r.getAs[Long]("n_obs")))
        .toMap
      obs.groupBy(_._1).foreach { case (k, rows) =>
        val expectA = rows.filter(_._3.isDefined).sortBy(_._2).lastOption
          .flatMap(_._3).map(Long.box).orNull
        val expectB = rows.filter(_._4.isDefined).sortBy(_._2).lastOption
          .flatMap(_._4).orNull
        val (a, b, n) = out(k)
        assert(a == expectA && b == expectB, s"key $k")
        assert(n == rows.length.toLong)
      }
    }
  }

  test("TWAP equals brute-force step-function integration on random " +
       "series") {
    import graft.operators.TimeSeries
    val genSeries: Gen[List[(Long, Long, Long)]] =
      Gen.listOfN(80, for {
        key <- Gen.choose(0L, 3L)
        t <- Gen.choose(0L, 5000L)
        v <- Gen.choose(-1000L, 1000L)
      } yield (key, t, v))
    cases(genSeries, 4).foreach { raw =>
      // unique (key, t) then a synthetic unique tiebreak id
      val series = raw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      val out = TimeSeries.twap(series.toDF("k", "es", "tie", "v"),
          Seq("k"), col("es"), col("tie"), col("v"))
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Long]("span_s"), r.getAs[Long]("area_e4s"))).toMap
      series.groupBy(_._1).foreach { case (k, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        if (sorted.length >= 2) {
          val area = sorted.sliding(2).map { case Seq(a, b) =>
            a._4 * (b._2 - a._2) }.sum
          val span = sorted.last._2 - sorted.head._2
          assert(out(k) == ((span, area)), s"key $k")
        } else assert(!out.contains(k), s"key $k: single sample must drop")
      }
    }
  }

  test("keyedCumSum matches the per-key window truth on random " +
       "inputs across key counts, row counts, duplicates in the " +
       "sort key (tiebroken), and partition counts") {
    import graft.operators.Curate
    val genCase: Gen[(Int, Int, Int)] = for {
      nKeys <- Gen.choose(1, 6)
      nRows <- Gen.choose(1, 400)
      parts <- Gen.oneOf(1, 2, 3, 7, 32)
    } yield (nKeys, nRows, parts)
    cases(genCase, 8).zipWithIndex.foreach {
      case ((nKeys, nRows, parts), ci) =>
        // values/sort keys from a seeded Gen; sort key deliberately
        // collides so the (t, id) tiebreak is load-bearing
        val rows = (0 until nRows).map { i =>
          val h = (i * 2654435761L + ci * 97L) & 0x7fffffffL
          (s"k${h % nKeys}", (h / 7) % 50, i.toLong, (h % 1000) - 500)
        }
        val df = rows.toDF("key", "t", "id", "v")
        val got = Curate.keyedCumSum(df, Seq("key"),
            Seq(col("t"), col("id")), col("v"), "c", "n", parts = parts)
          .select("key", "id", "n", "c")
          .as[(String, Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
        val truth = rows.groupBy(_._1).flatMap { case (k, rs) =>
          rs.sortBy(r => (r._2, r._3)).zipWithIndex
            .scanLeft(((k, -1L), (0L, 0L))) {
              case ((_, (_, acc)), ((_, _, id, v), i)) =>
                ((k, id), (i + 1L, acc + v))
            }.drop(1)
        }.toMap
        assert(got == truth, s"case $ci: keys=$nKeys rows=$nRows " +
          s"parts=$parts")
    }
  }

  test("rocAuc (rank-sum form) equals the O(n²) pairwise-comparison " +
       "definition on random tied inputs") {
    import graft.analytics.Audit
    val gen = for {
      n <- Gen.choose(12, 60)
      vs <- Gen.listOfN(n, Gen.choose(0L, 8L)) // heavy ties on purpose
      ys <- Gen.listOfN(n, Gen.oneOf(0, 1))
    } yield vs.zip(ys)
    cases(gen, 12).foreach { rows =>
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        // pairwise definition: P(v_pos > v_neg) + 0.5·P(tie)
        val wins = (for (p <- pos; q <- neg) yield
          if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
        val truth = math.rint(
          wins / (pos.size.toDouble * neg.size) * 1e6).toLong
        val got = Audit.rocAuc(rows.toDF("v", "y"), col("v"), col("y"))
          .collect().head
        assert(got.getAs[Long]("auc_e6") == truth,
          s"n=${rows.size} pos=${pos.size}")
        assert(got.getAs[Long]("n_pos") == pos.size.toLong)
      }
    }
  }

  test("ksStatistic equals the brute-force ECDF max over random " +
       "tied integer samples") {
    import graft.analytics.Audit
    val gen = for {
      n <- Gen.choose(10, 50)
      rows <- Gen.listOfN(n, for {
        v <- Gen.choose(0L, 12L)
        which <- Gen.oneOf(0, 1, 2) // 2 = in both samples
      } yield (v, if (which != 1) 1L else 0L, if (which != 0) 1L else 0L))
    } yield rows
    cases(gen, 12).foreach { rows =>
      val na = rows.map(_._2).sum
      val nb = rows.map(_._3).sum
      if (na > 0 && nb > 0) {
        val vs = rows.map(_._1).distinct.sorted
        def cum(sel: ((Long, Long, Long)) => Long)(v: Long): Long =
          rows.filter(_._1 <= v).map(sel).sum
        val dn = vs.map(v => math.abs(
          nb * cum(_._2)(v) - na * cum(_._3)(v))).max
        val got = Audit.ksStatistic(rows.toDF("v", "a", "b"),
          col("v"), col("a"), col("b")).collect().head
        assert(got.getAs[Long]("d_num") == dn, s"rows=$rows")
        assert(got.getAs[Long]("ks_e6") ==
          math.rint(dn.toDouble / (na.toDouble * nb) * 1e6).toLong)
      }
    }
  }

  test("gini (rank form) equals the brute-force mean-absolute-" +
       "difference definition on random positive values") {
    import graft.analytics.Audit
    val gen = Gen.choose(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 50L)))
    cases(gen, 12).foreach { vs =>
      val n = vs.size.toDouble
      val sx = vs.sum.toDouble
      // Σ_i Σ_j |x_i − x_j| / (2 n Σx) — the textbook definition
      val mad = (for (x <- vs; y <- vs) yield math.abs(x - y)).sum
      val truth = math.rint(mad / (2.0 * n * sx) * 1e6).toLong
      val got = Audit.gini(
        vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
          .toDF("x", "tb"), col("x"), col("tb"))
        .collect().head
      assert(got.getAs[Long]("gini_e6") == truth, s"vs=$vs")
    }
  }

  test("Poisson bootstrap weights have unit mean within sampling " +
       "error and reproduce exactly on recompute") {
    import graft.operators.Curate
    import graft.functions.PortableHash
    val n = 20000
    val u = PortableHash.hash60(concat(lit("p:"), col("id")))
      .cast("double") / lit(1.152921504606846976e18)
    val w = spark.range(n).select(Curate.poissonWeight(u).as("w"))
    val stats = w.agg(sum(col("w")).cast("double").as("s"),
      sum(col("w") * col("w")).cast("double").as("ss")).collect()(0)
    val mean = stats.getDouble(0) / n
    // Poisson(1): mean 1, var 1 -> mean in 1 +- 4/sqrt(n)
    assert(math.abs(mean - 1.0) < 4.0 / math.sqrt(n.toDouble), s"mean=$mean")
    // determinism: the same hash -> the same weights, bit for bit
    val again = spark.range(n).select(Curate.poissonWeight(u).as("w"))
      .agg(sum(col("w")).cast("double")).collect()(0).getDouble(0)
    assert(again == stats.getDouble(0))
  }

  // --- guard laws (the DedupSpec tripwire example promoted to
  // properties over RANDOM posting/bucket shapes): the hot-key
  // guards must be exactly loud-never-lossy —
  //  (a) results-preserving whenever every posting/bucket length is
  //      at or under the cap (guarded == unguarded, bit for bit);
  //  (b) raising whenever ANY length exceeds the cap.

  private val genPostingShape: Gen[Seq[(Long, Long)]] = for {
    nSh <- Gen.choose(2, 8)
    // per-shingle posting lengths, some small, occasionally long
    lens <- Gen.listOfN(nSh, Gen.frequency(
      (4, Gen.choose(1, 4)), (2, Gen.choose(5, 9)),
      (1, Gen.choose(10, 16))))
  } yield lens.zipWithIndex.flatMap { case (len, sh) =>
    // doc ids per posting: a deterministic spread so pairs overlap
    // across shingles (the jaccard grouping has real work to do)
    (0 until len).map(j => ((sh * 3 + j * 5 + 1).toLong, sh.toLong))
  }

  test("guard law (a): jaccardPairs guarded == unguarded on every " +
       "random posting shape with all lengths <= cap") {
    cases(genPostingShape, 12).foreach { rows =>
      val df = rows.toDF("id", "sh")
      val maxLen = rows.groupBy(_._2).map(_._2.size).max
      val guarded = Dedup
        .jaccardPairs(df, 0.0, maxPostingLen = Some(maxLen.toLong))
        .orderBy("id_a", "id_b")
        .select("id_a", "id_b", "inter", "size_a", "size_b")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      val unguarded = Dedup.jaccardPairs(df, 0.0, maxPostingLen = None)
        .orderBy("id_a", "id_b")
        .select("id_a", "id_b", "inter", "size_a", "size_b")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(guarded == unguarded, s"shape=$rows")
    }
  }

  test("guard law (b): jaccardPairs ALWAYS raises when any posting " +
       "exceeds the cap; lshCandidates likewise on bucket lengths") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    cases(genPostingShape, 12).foreach { rows =>
      val df = rows.toDF("id", "sh")
      val maxLen = rows.groupBy(_._2).map(_._2.size).max
      if (maxLen > 1) {
        val ex = intercept[Throwable] {
          Dedup.jaccardPairs(df, 0.0,
            maxPostingLen = Some(maxLen - 1L)).count()
        }
        assert(msgs(ex).exists(_.contains("maxPostingLen")),
          s"shape=$rows msgs=${msgs(ex)}")
      }
      // same shapes read as (band, bucket) memberships
      val buckets = rows.map { case (id, sh) => (id, 0, sh) }
        .toDF("id", "band", "bucket")
      if (maxLen > 1) {
        val ex2 = intercept[Throwable] {
          Dedup.lshCandidates(buckets,
            maxBucketLen = Some(maxLen - 1L)).count()
        }
        assert(msgs(ex2).exists(_.contains("maxBucketLen")),
          s"shape=$rows msgs=${msgs(ex2)}")
      }
      val nPairs = rows.groupBy(_._2).values
        .map(g => g.size.toLong * (g.size - 1) / 2).sum
      assert(Dedup.lshCandidates(buckets,
        maxBucketLen = Some(maxLen.toLong)).count() <= nPairs)
    }
  }

  test("Shift.absDiffMasses cumulant identity equals literal O(n²) " +
       "pairwise |x−y| sums on random multisets (incl. negatives, " +
       "heavy ties, and an empty side)") {
    import graft.analytics.Shift
    val genAB: Gen[(List[Long], List[Long])] = for {
      na <- Gen.choose(0, 50)
      nb <- Gen.choose(1, 50)
      a <- Gen.listOfN(na, Gen.choose(-30L, 30L))
      b <- Gen.listOfN(nb, Gen.choose(-30L, 30L))
    } yield (a, b)
    def cross(a: Seq[Long], b: Seq[Long]): BigInt =
      a.map(x => b.map(y => BigInt(math.abs(x - y))).sum)
        .foldLeft(BigInt(0))(_ + _)
    def self(a: Seq[Long]): BigInt = {
      val s = a.toIndexedSeq
      (for (i <- s.indices; j <- i + 1 until s.size)
        yield BigInt(math.abs(s(i) - s(j)))).foldLeft(BigInt(0))(_ + _)
    }
    cases(genAB, 12).foreach { case (a, b) =>
      val cnt = (a.map((_, 1L, 0L)) ++ b.map((_, 0L, 1L)))
        .toDF("v", "ca", "cb")
        .groupBy("v").agg(sum("ca").as("ca"), sum("cb").as("cb"))
      val r = Shift.absDiffMasses(cnt).collect().head
      def big(i: Int): BigInt =
        if (r.isNullAt(i)) BigInt(0)
        else BigInt(r.getDecimal(i).toBigInteger)
      assert(big(0) == cross(a, b), s"mab a=$a b=$b")
      assert(big(1) == self(a), s"maa a=$a")
      assert(big(2) == self(b), s"mbb b=$b")
    }
  }

  // ---- mining-tier laws (q442/q444/q445/q457 algorithm cores) ----

  test("Holt lattice law: on ANY integer series the HALF_UP walk " +
       "keeps 2·l within 1 of its pre-rounding sum and 4·b within " +
       "2 of its pre-rounding sum") {
    val genSeries = Gen.listOfN(12,
      Gen.choose(-1000000L, 1000000L)).suchThat(_.size >= 2)
    cases(genSeries, 30).foreach { ys =>
      var l = ys(0); var b = ys(1) - ys(0)
      ys.drop(1).foreach { y =>
        val aSum = y + l + b
        val lNew = graft.analytics.Exact.roundHalfUp(aSum.toDouble * 0.5)
        assert(math.abs(2L * lNew - aSum) <= 1L, s"level lattice: $ys")
        val bSum = lNew - l + 3L * b
        val bNew = graft.analytics.Exact.roundHalfUp(bSum.toDouble * 0.25)
        assert(math.abs(4L * bNew - bSum) <= 2L, s"trend lattice: $ys")
        l = lNew; b = bNew
      }
    }
  }

  test("BPE marker-string law: String.replace on the chr(31)-marker " +
       "form equals the greedy left-to-right symbol-list merge for " +
       "ANY word and ANY adjacent pair") {
    val mk = ""
    def mergeList(syms: Vector[String], a: String, b: String)
        : Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val genWord = Gen.listOfN(8, Gen.oneOf("a", "b")).map(_.mkString)
      .suchThat(_.nonEmpty)
    val genPair = for {
      x <- Gen.oneOf("a", "b", "aa", "ab", "ba", "bb")
      y <- Gen.oneOf("a", "b", "aa", "ab", "ba", "bb")
    } yield (x, y)
    cases(Gen.zip(genWord, genPair), 60).foreach {
      case (w, (pa, pb)) =>
        // symbolize at the CHAR level, then apply one (pa, pb) merge
        // in both representations — for multi-char pa/pb the pair
        // may simply be absent, which must also agree
        val syms0 = w.map(_.toString).toVector
        // bring the list to a state where pa/pb exist as symbols by
        // first merging their constituent chars left-to-right
        def build(sym: String, v: Vector[String]): Vector[String] =
          if (sym.length == 1) v
          else mergeList(build(sym.take(sym.length - 1), v),
            sym.take(sym.length - 1), sym.last.toString)
        val staged = build(pb, build(pa, syms0))
        // marker-prefixed AND space-terminated (the q457 form): the
        // terminator is what forces the pattern's second symbol to
        // be COMPLETE — without it, (x, y) false-matches when y
        // prefixes the following symbol (the bug this law caught)
        val marker = staged.map(mk + _ + " ").mkString
        val viaString = marker
          .replace(mk + pa + " " + mk + pb + " ", mk + pa + pb + " ")
          .split(" ").filter(_.nonEmpty)
          .map(_.stripPrefix(mk)).toVector
        val viaList = mergeList(staged, pa, pb)
        assert(viaString == viaList,
          s"w=$w pair=($pa,$pb) staged=$staged: " +
            s"$viaString vs $viaList")
    }
  }

  test("IPF sweep law: after a column sweep on ANY positive grid, " +
       "every column margin hits its target within one rounding " +
       "unit per cell") {
    val genGrid = Gen.listOfN(12,
      Gen.choose(1L, 1000000000L))
    val genTargets = Gen.listOfN(4, Gen.choose(1L, 1000000000L))
    cases(Gen.zip(genGrid, genTargets), 25).foreach {
      case (cells, targets) =>
        // 3 rows × 4 cols
        val grid = cells.grouped(4).toVector
        val colSums = (0 until 4).map(j => grid.map(_(j)).sum)
        val swept = grid.map(_.zipWithIndex.map { case (w, j) =>
          graft.analytics.Exact.roundHalfUp(
            w.toDouble * targets(j).toDouble / colSums(j).toDouble)
        })
        (0 until 4).foreach { j =>
          val got = swept.map(_(j)).sum
          assert(math.abs(got - targets(j)) <= grid.size.toLong,
            s"col $j: $got vs ${targets(j)}")
        }
    }
  }

  test("Shapley weight-table law: with the s!(3-s)! subset weights, " +
       "24·phi sums to 24·(v(full) − v(empty)) for ANY coalition " +
       "value function on 4 players") {
    def factI(n: Int): Long = (1 to n).product.toLong max 1L
    val genV = Gen.listOfN(16, Gen.choose(0L, 1000L))
    cases(genV, 40).foreach { vs =>
      val v = vs.toIndexedSeq
      val phis = (0 until 4).map { i =>
        val bit = 1 << i
        (0 until 16).filter(s => (s & bit) == 0).map { s =>
          val pc = java.lang.Integer.bitCount(s)
          factI(pc) * factI(3 - pc) * (v(s | bit) - v(s))
        }.sum
      }
      assert(phis.sum == 24L * (v(15) - v(0)),
        s"efficiency violated for v=$vs")
    }
  }
}
