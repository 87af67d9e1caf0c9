package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PlanStats.Pinned
import graft.core.Tables
import graft.functions.Text

/** Distributed ML-training primitives (session 10, continuation):
  * the model-fitting loops a training-data platform runs ON the
  * corpus the other tiers curate — a naive-Bayes table, an exact
  * decision stump, unrolled batch-perceptron epochs, Lloyd k-means
  * iterations, the first boosting rounds. Each one is the map-reduce
  * decomposition of the textbook algorithm: per-iteration state is a
  * BOUNDED table (weights, centroids, split candidates) that
  * broadcasts, and every pass over the data is one map-side-combined
  * aggregate. No reference analogue (the reference delegates all
  * analytics to SQL; /root/reference/README.md:1-3).
  *
  * Cross-engine discipline as everywhere in the gate: exact integer
  * sufficient statistics in long/decimal(38,0) (HUGEINT in the
  * oracle), per-row ln/score values e-rounded BEFORE any cross-row
  * sum, readout chains of IEEE ops in identical operation order on
  * both engines, unique-tiebreak ORDER BY everywhere. Where an
  * argmin over a derived double is needed (stump/boosting split
  * scores), the double is produced by the SAME chain of casts and
  * divisions from the same exact integers on both engines — the
  * comparison is then bit-identical even when the math is inexact.
  *
  * Scale posture: iteration state (weights, centroids, vocab, split
  * axes) is universe-bounded and broadcasts; the data-sized side is
  * only ever scanned, never shuffled wider than one grouped
  * aggregate. The k-means point grain partitions by vec_id; the
  * stump threshold axis is the distinct-cents universe (≤ ~10^5
  * rows at any corpus size for bounded prices).
  */
object Learn {

  private val dec = "decimal(38,0)"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q467 — multinomial naive-Bayes trainer over documents: the
  // per-(lang, word) Laplace-smoothed log-likelihood table ln((c_lw +
  // 1)/(n_l + V)) on a V=50 corpus-frequency vocabulary. This is NB
  // training as one grouped count: the vocabulary (bounded, ordered
  // by global frequency with a word tiebreak) broadcasts, the token
  // scan groups once, and the (lang × vocab) grid keeps absent cells
  // as exact zero counts — the smoothing exists precisely for those
  // cells. Counts exact longs; one IEEE division inside one e9 ln
  // per OUTPUT cell (grid-bounded, never data-sized).
  // ---------------------------------------------------------------------
  private def q467(s: SparkSession, dir: String): DataFrame = {
    val v = 50
    val words = t(s, dir, "documents")
      .select(col("lang"), explode(Text.words(col("text"))).as("wd"))
      .pin()
    val vocab = words.groupBy("wd").agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("wd").asc).limit(v)
      .select(col("wd"))
    val byLang = words.groupBy("lang").agg(count(lit(1)).as("n_l"))
    val cells = words.join(broadcast(vocab), Seq("wd"))
      .groupBy("lang", "wd").agg(count(lit(1)).as("c_lw"))
    byLang.crossJoin(broadcast(vocab))
      .join(cells, Seq("lang", "wd"), "left")
      .withColumn("c_lw", coalesce(col("c_lw"), lit(0L)))
      .select(col("lang"), col("wd").as("word"), col("c_lw"),
        round(log((col("c_lw") + lit(1L)).cast("double")
            / (col("n_l") + lit(v.toLong)).cast("double"))
          * 1000000000.0).cast("long").as("ll_e9"))
      .orderBy(col("lang"), col("word"))
  }

  private val q467Sql =
    """WITH words AS (
      |  SELECT lang, unnest(list_filter(string_split(text, ' '),
      |    w -> length(w) > 0)) AS wd
      |  FROM documents),
      |vocab AS (
      |  SELECT wd FROM (
      |    SELECT wd, count(*) AS cf FROM words GROUP BY wd
      |    ORDER BY cf DESC, wd ASC LIMIT 50)),
      |bylang AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_l
      |  FROM words GROUP BY lang),
      |cells AS (
      |  SELECT lang, wd, CAST(count(*) AS BIGINT) AS c_lw
      |  FROM words JOIN vocab USING (wd) GROUP BY lang, wd)
      |SELECT bylang.lang, vocab.wd AS word,
      |  coalesce(c_lw, 0) AS c_lw,
      |  CAST(round(ln(CAST(coalesce(c_lw, 0) + 1 AS DOUBLE)
      |      / CAST(n_l + 50 AS DOUBLE))
      |    * 1000000000.0) AS BIGINT) AS ll_e9
      |FROM bylang CROSS JOIN vocab
      |LEFT JOIN cells ON cells.lang = bylang.lang AND cells.wd = vocab.wd
      |ORDER BY bylang.lang, word""".stripMargin

  // ---------------------------------------------------------------------
  // q468 — exact decision stump on the cents axis: the best binary
  // split of events (label: is-purchase) on value, scored by
  // weighted Gini impurity over EVERY distinct threshold. The
  // candidate axis is the distinct-cents universe (value-bounded,
  // never row-bounded); left-side counts are two chained
  // globalCumSums on that axis (range-partitioned, no unpartitioned
  // window); the per-threshold score is one identical IEEE chain
  // from decimal(38,0) numerators ((n²−p²−q²)/n per side, /N), so
  // the argmin ordering is bit-identical cross-engine even where the
  // doubles are inexact. The misclassification count of the winning
  // stump rides along as a pure-integer readout.
  // ---------------------------------------------------------------------
  private def q468(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir).select(
      round(col("value") * 100).cast("long").as("x"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val axis = ev.groupBy("x")
      .agg(count(lit(1)).as("nx"), sum(col("y")).as("px"))
    val c1 = graft.operators.Curate.globalCumSum(
      axis, Seq(col("x")), col("nx"), "n_le", "r1")
    val c2 = graft.operators.Curate.globalCumSum(
      c1, Seq(col("x")), col("px"), "p_le", "r2")
      .drop("r1", "r2")
    val tot = axis.agg(sum(col("nx")).as("nn"), sum(col("px")).as("pp"))
    val scored = c2.crossJoin(broadcast(tot))
      .filter(col("n_le") < col("nn")) // the max value cannot split
      .withColumn("q_le", col("n_le") - col("p_le"))
      .withColumn("n_gt", col("nn") - col("n_le"))
      .withColumn("p_gt", col("pp") - col("p_le"))
      .withColumn("q_gt", col("n_gt") - col("p_gt"))
      .withColumn("gini_e9",
        round((((col("n_le").cast(dec) * col("n_le")
              - col("p_le").cast(dec) * col("p_le")
              - col("q_le").cast(dec) * col("q_le")).cast("double")
            / col("n_le").cast("double"))
          + ((col("n_gt").cast(dec) * col("n_gt")
              - col("p_gt").cast(dec) * col("p_gt")
              - col("q_gt").cast(dec) * col("q_gt")).cast("double")
            / col("n_gt").cast("double")))
          / col("nn").cast("double") * 1000000000.0).cast("long"))
      .withColumn("err",
        least(col("p_le"), col("q_le")) + least(col("p_gt"), col("q_gt")))
    scored.orderBy(col("gini_e9").asc, col("x").asc).limit(1)
      .select(col("x").as("threshold_cents"), col("n_le"),
        col("p_le").as("pos_le"), col("gini_e9"), col("err"))
  }

  private val q468Sql =
    """WITH ev AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS x,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |axis AS (
      |  SELECT x, CAST(count(*) AS BIGINT) AS nx,
      |    CAST(sum(y) AS BIGINT) AS px
      |  FROM ev GROUP BY x),
      |cum AS (
      |  SELECT x,
      |    CAST(sum(nx) OVER (ORDER BY x) AS BIGINT) AS n_le,
      |    CAST(sum(px) OVER (ORDER BY x) AS BIGINT) AS p_le
      |  FROM axis),
      |tot AS (
      |  SELECT CAST(sum(nx) AS BIGINT) AS nn,
      |    CAST(sum(px) AS BIGINT) AS pp FROM axis),
      |scored AS (
      |  SELECT x, n_le, p_le,
      |    n_le - p_le AS q_le, nn - n_le AS n_gt,
      |    pp - p_le AS p_gt, (nn - n_le) - (pp - p_le) AS q_gt, nn
      |  FROM cum CROSS JOIN tot
      |  WHERE n_le < nn),
      |g AS (
      |  SELECT x, n_le, p_le,
      |    CAST(round((
      |      CAST(CAST(n_le AS HUGEINT) * n_le
      |        - CAST(p_le AS HUGEINT) * p_le
      |        - CAST(q_le AS HUGEINT) * q_le AS DOUBLE)
      |        / CAST(n_le AS DOUBLE)
      |      + CAST(CAST(n_gt AS HUGEINT) * n_gt
      |        - CAST(p_gt AS HUGEINT) * p_gt
      |        - CAST(q_gt AS HUGEINT) * q_gt AS DOUBLE)
      |        / CAST(n_gt AS DOUBLE))
      |      / CAST(nn AS DOUBLE) * 1000000000.0) AS BIGINT) AS gini_e9,
      |    least(p_le, q_le) + least(p_gt, q_gt) AS err
      |  FROM scored)
      |SELECT x AS threshold_cents, n_le, p_le AS pos_le, gini_e9,
      |  CAST(err AS BIGINT) AS err
      |FROM g ORDER BY gini_e9 ASC, x ASC LIMIT 1""".stripMargin

  // ---------------------------------------------------------------------
  // q469 — batch perceptron, three unrolled epochs, ENTIRELY exact:
  // integer features (bias, UTC hour, epoch-day mod 7, cents div
  // 10⁴), label y ∈ {−1,+1} (is-purchase), and the batch update
  // w_k = w_{k−1} + Σ_{y·(w·x) ≤ 0} y·x. From w₀ = 0 every row is
  // misclassified (margin 0), so epoch 1 is one grouped sum; each
  // later epoch broadcasts the 1-row weight vector back onto the
  // pinned feature scan and re-aggregates — the classic distributed
  // learning shape (parameters broadcast, gradients reduce), with
  // zero floating point anywhere. Weight sums run in decimal(38,0)
  // and land in longs (|w| ≤ N·max|x|).
  // ---------------------------------------------------------------------
  private def q469(s: SparkSession, dir: String): DataFrame = {
    val f = Tables.eventsSec(s, dir).select(
        when(col("event_type") === "purchase", 1L).otherwise(-1L).as("y"),
        lit(1L).as("x0"),
        hour(col("ts_s")).cast("long").as("x1"),
        pmod(expr("CAST(datediff(to_date(ts_s), DATE '1970-01-01') AS BIGINT)"),
          lit(7L)).as("x2"),
        (round(col("value") * 100).cast("long") / lit(10000L))
          .cast("long").as("x3"))
      .pin()
    def epoch(prev: Option[DataFrame], k: Int): DataFrame = {
      val mis = prev match {
        case None => f.withColumn("__mis", lit(true))
        case Some(w) => f.crossJoin(broadcast(
            w.select(col("w0").as("pw0"), col("w1").as("pw1"),
              col("w2").as("pw2"), col("w3").as("pw3"))))
          .withColumn("__mis",
            col("y") * (col("pw0") * col("x0") + col("pw1") * col("x1")
              + col("pw2") * col("x2") + col("pw3") * col("x3")) <= 0L)
      }
      val upd = mis.agg(
        sum(when(col("__mis"), col("y") * col("x0")).otherwise(0L)
          .cast(dec)).as("d0"),
        sum(when(col("__mis"), col("y") * col("x1")).otherwise(0L)
          .cast(dec)).as("d1"),
        sum(when(col("__mis"), col("y") * col("x2")).otherwise(0L)
          .cast(dec)).as("d2"),
        sum(when(col("__mis"), col("y") * col("x3")).otherwise(0L)
          .cast(dec)).as("d3"),
        sum(when(col("__mis"), 1L).otherwise(0L)).as("n_mis"))
      prev match {
        case None => upd.select(lit(k.toLong).as("epoch"), col("n_mis"),
          col("d0").cast("long").as("w0"), col("d1").cast("long").as("w1"),
          col("d2").cast("long").as("w2"), col("d3").cast("long").as("w3"))
        case Some(w) => upd.crossJoin(broadcast(w.select(
            col("w0").as("pw0"), col("w1").as("pw1"),
            col("w2").as("pw2"), col("w3").as("pw3"))))
          .select(lit(k.toLong).as("epoch"), col("n_mis"),
            (col("pw0") + col("d0").cast("long")).as("w0"),
            (col("pw1") + col("d1").cast("long")).as("w1"),
            (col("pw2") + col("d2").cast("long")).as("w2"),
            (col("pw3") + col("d3").cast("long")).as("w3"))
      }
    }
    val e1 = epoch(None, 1)
    val e2 = epoch(Some(e1), 2)
    val e3 = epoch(Some(e2), 3)
    e1.unionByName(e2).unionByName(e3).orderBy(col("epoch"))
  }

  private val q469Sql =
    """WITH f AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS y,
      |    CAST(1 AS BIGINT) AS x0,
      |    CAST(hour(date_trunc('second', ts)) AS BIGINT) AS x1,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(date_trunc('second', ts) AS DATE)) % 7 AS BIGINT) AS x2,
      |    CAST(round(value * 100) AS BIGINT) // 10000 AS x3
      |  FROM events),
      |e1 AS (
      |  SELECT CAST(1 AS BIGINT) AS epoch,
      |    CAST(count(*) AS BIGINT) AS n_mis,
      |    CAST(sum(y * x0) AS BIGINT) AS w0,
      |    CAST(sum(y * x1) AS BIGINT) AS w1,
      |    CAST(sum(y * x2) AS BIGINT) AS w2,
      |    CAST(sum(y * x3) AS BIGINT) AS w3
      |  FROM f),
      |m2 AS (
      |  SELECT f.*, (y * (w0*x0 + w1*x1 + w2*x2 + w3*x3) <= 0) AS mis
      |  FROM f CROSS JOIN e1),
      |e2 AS (
      |  SELECT CAST(2 AS BIGINT) AS epoch,
      |    CAST(sum(CASE WHEN mis THEN 1 ELSE 0 END) AS BIGINT) AS n_mis,
      |    CAST((SELECT w0 FROM e1)
      |      + sum(CASE WHEN mis THEN y * x0 ELSE 0 END) AS BIGINT) AS w0,
      |    CAST((SELECT w1 FROM e1)
      |      + sum(CASE WHEN mis THEN y * x1 ELSE 0 END) AS BIGINT) AS w1,
      |    CAST((SELECT w2 FROM e1)
      |      + sum(CASE WHEN mis THEN y * x2 ELSE 0 END) AS BIGINT) AS w2,
      |    CAST((SELECT w3 FROM e1)
      |      + sum(CASE WHEN mis THEN y * x3 ELSE 0 END) AS BIGINT) AS w3
      |  FROM m2),
      |m3 AS (
      |  SELECT f.*, (y * (w0*x0 + w1*x1 + w2*x2 + w3*x3) <= 0) AS mis
      |  FROM f CROSS JOIN e2),
      |e3 AS (
      |  SELECT CAST(3 AS BIGINT) AS epoch,
      |    CAST(sum(CASE WHEN mis THEN 1 ELSE 0 END) AS BIGINT) AS n_mis,
      |    CAST((SELECT w0 FROM e2)
      |      + sum(CASE WHEN mis THEN y * x0 ELSE 0 END) AS BIGINT) AS w0,
      |    CAST((SELECT w1 FROM e2)
      |      + sum(CASE WHEN mis THEN y * x1 ELSE 0 END) AS BIGINT) AS w1,
      |    CAST((SELECT w2 FROM e2)
      |      + sum(CASE WHEN mis THEN y * x2 ELSE 0 END) AS BIGINT) AS w2,
      |    CAST((SELECT w3 FROM e2)
      |      + sum(CASE WHEN mis THEN y * x3 ELSE 0 END) AS BIGINT) AS w3
      |  FROM m3)
      |SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL
      |SELECT * FROM e3 ORDER BY epoch""".stripMargin

  // ---------------------------------------------------------------------
  // q470 — two Lloyd k-means iterations over the embedding table,
  // K = 4, on the e6 integer grid: elements e6-round at the scan
  // (the q399 precedent), squared distances are exact longs
  // (|Δ| ≤ 2·10⁶ ⇒ Σ_d Δ² ≤ 64·4·10¹² ≪ 2⁶³), the centroid table
  // (K×dim, bounded) broadcasts into each assignment pass, and the
  // update is one grouped mean whose single IEEE division + round
  // re-lands on integers. Seeds: vec_id 0..3 (deterministic).
  // Empty clusters keep their previous centroid (coalesce on the
  // K×dim grid, both engines). Assignment ties break to the
  // smallest cluster id. Output: per-cluster size and mean squared
  // distance after the second assignment.
  // ---------------------------------------------------------------------
  private def q470(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "xv")))
      .select(col("vec_id"), col("d").cast("long").as("d"),
        round(col("xv").cast("double") * 1000000.0).cast("long").as("x"))
      .pin()
    val c0 = pts.filter(col("vec_id") < 4)
      .select(col("vec_id").as("k"), col("d"), col("x").as("c"))
    def assign(cent: DataFrame): DataFrame = {
      val dist = pts.join(broadcast(cent), Seq("d"))
        .groupBy(col("vec_id"), col("k"))
        .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist"))
      val best = dist.groupBy(col("vec_id")).agg(min(col("dist")).as("md"))
      dist.join(best, Seq("vec_id"))
        .filter(col("dist") === col("md"))
        .groupBy(col("vec_id"))
        .agg(min(col("k")).as("k"), min(col("md")).as("dist"))
    }
    def update(prev: DataFrame, asg: DataFrame): DataFrame = {
      val next = pts.join(asg.select("vec_id", "k"), Seq("vec_id"))
        .groupBy(col("k"), col("d"))
        .agg(round(sum(col("x")).cast(dec).cast("double")
          / count(lit(1)).cast("double")).cast("long").as("c_new"))
      prev.select(col("k"), col("d"), col("c").as("c_old"))
        .join(next, Seq("k", "d"), "left")
        .select(col("k"), col("d"),
          coalesce(col("c_new"), col("c_old")).as("c"))
    }
    val a1 = assign(c0)
    val c1 = update(c0, a1)
    val a2 = assign(c1)
    a2.groupBy(col("k"))
      .agg(count(lit(1)).as("n_points"),
        round(sum(col("dist")).cast(dec).cast("double")
          / count(lit(1)).cast("double")).cast("long").as("mean_dist"))
      .orderBy(col("k"))
  }

  private val q470Sql =
    """WITH pts AS (
      |  SELECT vec_id, CAST(p.dim AS BIGINT) AS d, p.x AS x FROM (
      |    SELECT vec_id,
      |      unnest(list_transform(range(len(embedding)),
      |        i -> {'dim': i,
      |              'x': CAST(round(CAST(embedding[i+1] AS DOUBLE)
      |                   * 1000000.0) AS BIGINT)})) AS p
      |    FROM embeddings)),
      |c0 AS (
      |  SELECT vec_id AS k, d, x AS c FROM pts WHERE vec_id < 4),
      |d1 AS (
      |  SELECT pts.vec_id, c0.k,
      |    CAST(sum((x - c) * (x - c)) AS BIGINT) AS dist
      |  FROM pts JOIN c0 USING (d) GROUP BY pts.vec_id, c0.k),
      |a1 AS (
      |  SELECT vec_id, min(k) AS k, min(md) AS dist FROM (
      |    SELECT d1.*, min(dist) OVER (PARTITION BY vec_id) AS md
      |    FROM d1) WHERE dist = md GROUP BY vec_id),
      |c1n AS (
      |  SELECT a1.k, pts.d,
      |    CAST(round(CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS c_new
      |  FROM pts JOIN a1 USING (vec_id) GROUP BY a1.k, pts.d),
      |c1 AS (
      |  SELECT c0.k, c0.d, coalesce(c_new, c0.c) AS c
      |  FROM c0 LEFT JOIN c1n ON c1n.k = c0.k AND c1n.d = c0.d),
      |d2 AS (
      |  SELECT pts.vec_id, c1.k,
      |    CAST(sum((x - c) * (x - c)) AS BIGINT) AS dist
      |  FROM pts JOIN c1 USING (d) GROUP BY pts.vec_id, c1.k),
      |a2 AS (
      |  SELECT vec_id, min(k) AS k, min(md) AS dist FROM (
      |    SELECT d2.*, min(dist) OVER (PARTITION BY vec_id) AS md
      |    FROM d2) WHERE dist = md GROUP BY vec_id)
      |SELECT k, CAST(count(*) AS BIGINT) AS n_points,
      |  CAST(round(CAST(sum(CAST(dist AS HUGEINT)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_dist
      |FROM a2 GROUP BY k ORDER BY k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q467_naive_bayes" -> (q467 _),
    "q468_decision_stump" -> (q468 _),
    "q469_batch_perceptron" -> (q469 _),
    "q470_kmeans_lloyd" -> (q470 _))

  val oracle: Map[String, String] = Map(
    "q467_naive_bayes" -> q467Sql,
    "q468_decision_stump" -> q468Sql,
    "q469_batch_perceptron" -> q469Sql,
    "q470_kmeans_lloyd" -> q470Sql)
}
