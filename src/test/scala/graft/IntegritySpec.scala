package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Independent checks for the round-9 integrity tier: beyond the
  * DuckDB oracle (which shares the SQL formulation), these recompute
  * the statistics BRUTE-FORCE in plain Scala from the same parquet —
  * a third implementation that shares no query machinery with either
  * engine — and assert structural invariants the formulas promise.
  */
class IntegritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf001)

  private lazy val docs: Seq[(Long, String, String, String, Long)] =
    graft.core.Tables.load(spark, TestSpark.sf001, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSeq

  private def words(t: String): Array[String] =
    t.split(" ").filter(_.nonEmpty)

  test("q378 Fleiss' kappa equals the textbook formula computed " +
       "brute-force in Scala from the same documents") {
    val m = 3
    def cap5(x: Long): Long = math.min(x, 5L)
    val ratings: Seq[(Long, Long)] = docs.flatMap { case (id, t, _, _, nc) =>
      val r1 = cap5(nc / 150)
      val r2 = cap5(words(t).length / 30)
      val r3 = cap5(t.count(_ == '.').toLong / 2)
      Seq((id, r1), (id, r2), (id, r3))
    }
    val nij = ratings.groupBy(identity).map { case (_, v) => v.size.toLong }
    val nItems = ratings.map(_._1).distinct.size.toLong
    val a2 = nij.map(c => c * c).sum
    val cj = ratings.groupBy(_._2).map { case (_, v) => v.size.toLong }
    val sc2 = cj.map(c => c * c).sum
    // Recompute κ in the SAME cross-multiplied integer form the query
    // divides — κ = ((A−Nm)·Nm − (m−1)·Σc²) / ((m−1)·((Nm)²−Σc²)) —
    // exact integers up to the one IEEE division, so this checks the
    // formula, not double evaluation order (the textbook
    // (P̄−P̄e)/(1−P̄e) form can differ by an ulp and flip the e6
    // rounding on another dataset).
    val nm = BigInt(nItems) * m
    val num = (BigInt(a2) - nm) * nm - BigInt(m - 1) * sc2
    val den = BigInt(m - 1) * (nm * nm - sc2)
    val truth = math.rint(num.toDouble / den.toDouble * 1e6).toLong
    val row = q("q378_fleiss_kappa").collect().head
    assert(row.getAs[Long]("n_items") == nItems)
    assert(row.getAs[Long]("a_sum2") == a2)
    assert(row.getAs[Long]("s_marg2") == sc2)
    assert(row.getAs[Long]("kappa_e6") == truth)
  }

  test("q381 largest-remainder allocation: quotas sum EXACTLY to the " +
       "budget and each quota is floor or floor+1") {
    val rows = q("q381_token_budget")
      .select("source", "tokens", "weight_e3", "quota")
      .as[(String, Long, Long, Long)].collect().toSeq
    val totalTokens = rows.map(_._2).sum
    val b = totalTokens / 2
    assert(rows.map(_._4).sum == b,
      s"quotas must sum exactly to the budget $b")
    val bigW = rows.map(_._3).sum
    rows.foreach { case (src, _, w, quota) =>
      val f = (BigInt(b) * BigInt(w) / BigInt(bigW)).toLong
      assert(quota == f || quota == f + 1, s"$src: $quota vs floor $f")
    }
  }

  test("q380 winsorized and trimmed sums equal a brute-force sort-" +
       "based recompute of the events table") {
    val events = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
      .as[(String, Long)].collect().toSeq
    val got = q("q380_trimmed_means")
      .select("event_type", "n", "v_lo", "v_hi", "winsor_sum_e2",
        "trim_sum_e2")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    events.groupBy(_._1).foreach { case (et, rs) =>
      val vs = rs.map(_._2).sorted
      val n = vs.size
      val k = n / 20
      // lower order stats: smallest v with 20*rank >= n (1-indexed)
      val vLo = vs(math.ceil(n / 20.0).toInt - 1)
      val vHi = vs(math.ceil(19.0 * n / 20.0).toInt - 1)
      val winsor = vs.map(v => math.min(math.max(v, vLo), vHi)).sum
      val trimmed = vs.slice(k, n - k).sum
      val (_, gn, gLo, gHi, gW, gT) = got(et)
      assert(gn == n && gLo == vLo && gHi == vHi, s"$et bounds")
      assert(gW == winsor, s"$et winsorized sum")
      assert(gT == trimmed, s"$et trimmed sum")
    }
  }

  test("q379 MRR equals the brute per-user recompute") {
    val events = graft.core.Tables.eventsSec(spark, TestSpark.sf001)
      .select(col("user_id"), col("event_id"), col("value"),
        col("event_type"))
      .as[(Long, Long, Double, String)].collect().toSeq
    val perUser = events.groupBy(_._1).map { case (_, es) =>
      val top = es.sortBy(e => (-e._3, e._2)).take(10)
      top.zipWithIndex.collectFirst {
        case ((_, _, _, "purchase"), i) => i + 1
      }
    }
    val rrSum = perUser.flatMap(_.map(r => math.rint(1e6 / r).toLong))
      .sum
    val hits = perUser.count(_.isDefined).toLong
    val row = q("q379_feed_mrr").collect().head
    assert(row.getAs[Long]("n_users") == perUser.size.toLong)
    assert(row.getAs[Long]("n_hits") == hits)
    assert(row.getAs[Long]("rr_sum_e6") == rrSum)
  }

  test("q395 capture-recapture obeys the mark-recapture bounds: " +
       "m <= min(n1, n2) and n_est >= max(n1, n2)") {
    val row = q("q395_capture_recapture").collect().head
    val (n1, n2, m, est) = (row.getAs[Long]("n1"), row.getAs[Long]("n2"),
      row.getAs[Long]("m"), row.getAs[Long]("n_est"))
    assert(m > 0 && m <= math.min(n1, n2))
    assert(est >= math.max(n1, n2))
  }
}
