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
        // floor division (x - pmod(x,1e4))/1e4 matches DuckDB's `//`
        // for ALL signs; plain `/`+cast truncates toward zero and would
        // fork on negative cents (value_e2 is non-negative today, but
        // the form shouldn't depend on that).
        (((round(col("value") * 100).cast("long")
          - pmod(round(col("value") * 100).cast("long"), lit(10000L)))
          / lit(10000L)).cast("long")).as("x3"))
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

  // ---------------------------------------------------------------------
  // q471 — jackknife variance of a RATIO estimator (mean cents per
  // event, per event type), leave-one-DAY-out: the resampling
  // estimate for a nonlinear statistic where the naive variance
  // formula is wrong. The pseudo-value grain is the calendar-bounded
  // (type × day) table; each pseudo-ratio (S−s_i)/(N−n_i) is one
  // IEEE division e9-rounded AT ITS ROW (the per-row-then-sum
  // discipline), so the cross-row moments Σr, Σr² are exact
  // integers and the jackknife se = √((D−1)(DΣr²−(Σr)²))/D is one
  // identical readout chain. Days that hold the entire type are
  // excluded (the leave-out set would be empty).
  // ---------------------------------------------------------------------
  private def q471(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir).select(
      col("event_type").as("t"),
      expr("CAST(datediff(to_date(ts_s), DATE '1970-01-01') AS BIGINT)")
        .as("ed"),
      round(col("value") * 100).cast("long").as("c"))
    val days = ev.groupBy("t", "ed")
      .agg(count(lit(1)).as("n_i"), sum(col("c")).as("s_i"))
    val tot = days.groupBy("t").agg(sum(col("n_i")).as("nn"),
      sum(col("s_i")).as("ss"), count(lit(1)).as("dd"))
    val pseudo = days.join(tot, Seq("t"))
      .filter(col("n_i") < col("nn"))
      .select(col("t"),
        round((col("ss") - col("s_i")).cast("double")
            / (col("nn") - col("n_i")).cast("double") * 1000000000.0)
          .cast("long").as("r_e9"))
    pseudo.groupBy("t")
      .agg(count(lit(1)).as("d"), sum(col("r_e9").cast(dec)).as("sr"),
        sum(col("r_e9").cast(dec) * col("r_e9")).as("srr"))
      .join(tot, Seq("t"))
      .select(col("t").as("event_type"), col("d").as("n_days"),
        round(col("ss").cast("double") / col("nn").cast("double")
          * 1000000000.0).cast("long").as("r_e9"),
        round(col("sr").cast("double") / col("d").cast("double"))
          .cast("long").as("jk_mean_e9"),
        round(sqrt((col("d").cast(dec) * col("srr") - col("sr") * col("sr"))
            .cast("double") * (col("d").cast("double") - 1.0))
          / col("d").cast("double")).cast("long").as("jk_se_e9"))
      .orderBy(col("event_type"))
  }

  private val q471Sql =
    """WITH ev AS (
      |  SELECT event_type AS t,
      |    date_diff('day', DATE '1970-01-01',
      |      CAST(date_trunc('second', ts) AS DATE)) AS ed,
      |    CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events),
      |days AS (
      |  SELECT t, ed, CAST(count(*) AS BIGINT) AS n_i,
      |    CAST(sum(c) AS BIGINT) AS s_i
      |  FROM ev GROUP BY t, ed),
      |tot AS (
      |  SELECT t, CAST(sum(n_i) AS BIGINT) AS nn,
      |    CAST(sum(s_i) AS BIGINT) AS ss,
      |    CAST(count(*) AS BIGINT) AS dd
      |  FROM days GROUP BY t),
      |pseudo AS (
      |  SELECT days.t,
      |    CAST(round(CAST(ss - s_i AS DOUBLE)
      |      / CAST(nn - n_i AS DOUBLE) * 1000000000.0) AS BIGINT) AS r_e9
      |  FROM days JOIN tot ON days.t = tot.t
      |  WHERE n_i < nn),
      |mom AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS d,
      |    sum(CAST(r_e9 AS HUGEINT)) AS sr,
      |    sum(CAST(r_e9 AS HUGEINT) * r_e9) AS srr
      |  FROM pseudo GROUP BY t)
      |SELECT mom.t AS event_type, d AS n_days,
      |  CAST(round(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE)
      |    * 1000000000.0) AS BIGINT) AS r_e9,
      |  CAST(round(CAST(sr AS DOUBLE) / CAST(d AS DOUBLE)) AS BIGINT)
      |    AS jk_mean_e9,
      |  CAST(round(sqrt(CAST(d * srr - sr * sr AS DOUBLE)
      |      * (CAST(d AS DOUBLE) - 1.0))
      |    / CAST(d AS DOUBLE)) AS BIGINT) AS jk_se_e9
      |FROM mom JOIN tot ON mom.t = tot.t
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q472 — coarsened exact matching (CEM) for an observational
  // average-treatment-effect-on-treated: treated users are those who
  // purchased in the first 15 observed days; outcome is post-period
  // spend; covariates (pre-period activity and spend) coarsen into
  // pure-integer buckets, strata with both arms present match, and
  // ATT is the treated-count-weighted mean of per-stratum outcome
  // gaps. The matching step that makes this causal-ish is a GROUP BY
  // on a ≤16-cell grid — embarrassingly distributable; per-stratum
  // gaps e6-round at the stratum row (bounded grain), one final
  // weighted division.
  // ---------------------------------------------------------------------
  private def q472(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsSec(s, dir).select(col("user_id").as("u"),
      col("event_type").as("ty"),
      expr("CAST(datediff(to_date(ts_s), DATE '1970-01-01') AS BIGINT)")
        .as("ed"),
      round(col("value") * 100).cast("long").as("c"))
    val split = ev.agg((min(col("ed")) + 15L).as("sp"))
    val users = ev.crossJoin(broadcast(split))
      .groupBy("u")
      .agg(sum(when(col("ed") < col("sp"), 1L).otherwise(0L)).as("n_pre"),
        sum(when(col("ed") < col("sp"), col("c")).otherwise(0L)).as("s_pre"),
        max(when(col("ed") < col("sp") && col("ty") === "purchase", 1L)
          .otherwise(0L)).as("treated"),
        sum(when(col("ed") >= col("sp"), col("c")).otherwise(0L)).as("y"))
      .filter(col("n_pre") > 0L)
      // pure-integer coarsening (trunc-div then least on longs):
      // a double + cast here would fork the engines — DuckDB rounds
      // double→int casts where Spark truncates
      .withColumn("b1",
        least((col("n_pre") / lit(10L)).cast("long"), lit(3L)))
      .withColumn("b2",
        least((col("s_pre") / lit(50000L)).cast("long"), lit(3L)))
    val strata = users.groupBy("b1", "b2")
      .agg(sum(col("treated")).as("nt"),
        sum(lit(1L) - col("treated")).as("nc"),
        sum(when(col("treated") === 1L, col("y")).otherwise(0L)).as("syt"),
        sum(when(col("treated") === 0L, col("y")).otherwise(0L)).as("syc"))
      .filter(col("nt") > 0L && col("nc") > 0L)
      .withColumn("d_e6",
        round((col("syt").cast("double") / col("nt").cast("double")
          - col("syc").cast("double") / col("nc").cast("double"))
          * 1000000.0).cast("long"))
    strata.agg(count(lit(1)).as("n_strata"),
        sum(col("nt")).as("n_treated"), sum(col("nc")).as("n_control"),
        sum(col("nt").cast(dec) * col("d_e6")).as("wsum"))
      .select(col("n_strata"), col("n_treated"), col("n_control"),
        round(col("wsum").cast("double") / col("n_treated").cast("double"))
          .cast("long").as("att_e6"))
  }

  private val q472Sql =
    """WITH ev AS (
      |  SELECT user_id AS u, event_type AS ty,
      |    date_diff('day', DATE '1970-01-01',
      |      CAST(date_trunc('second', ts) AS DATE)) AS ed,
      |    CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events),
      |split AS (SELECT min(ed) + 15 AS sp FROM ev),
      |users AS (
      |  SELECT u,
      |    CAST(sum(CASE WHEN ed < sp THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
      |    CAST(sum(CASE WHEN ed < sp THEN c ELSE 0 END) AS BIGINT) AS s_pre,
      |    CAST(max(CASE WHEN ed < sp AND ty = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS treated,
      |    CAST(sum(CASE WHEN ed >= sp THEN c ELSE 0 END) AS BIGINT) AS y
      |  FROM ev CROSS JOIN split
      |  GROUP BY u
      |  HAVING sum(CASE WHEN ed < sp THEN 1 ELSE 0 END) > 0),
      |bucketed AS (
      |  SELECT u, treated, y,
      |    least(n_pre // 10, 3) AS b1,
      |    least(s_pre // 50000, 3) AS b2
      |  FROM users),
      |strata AS (
      |  SELECT b1, b2,
      |    CAST(sum(treated) AS BIGINT) AS nt,
      |    CAST(sum(1 - treated) AS BIGINT) AS nc,
      |    CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT)
      |      AS syt,
      |    CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT)
      |      AS syc
      |  FROM bucketed GROUP BY b1, b2
      |  HAVING sum(treated) > 0 AND sum(1 - treated) > 0),
      |gaps AS (
      |  SELECT nt, nc,
      |    CAST(round((CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE)
      |      - CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE))
      |      * 1000000.0) AS BIGINT) AS d_e6
      |  FROM strata)
      |SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |  CAST(sum(nt) AS BIGINT) AS n_treated,
      |  CAST(sum(nc) AS BIGINT) AS n_control,
      |  CAST(round(CAST(sum(CAST(nt AS HUGEINT) * d_e6) AS DOUBLE)
      |    / CAST(sum(nt) AS DOUBLE)) AS BIGINT) AS att_e6
      |FROM gaps""".stripMargin

  // ---------------------------------------------------------------------
  // q473 — grid-DBSCAN over the first two embedding dimensions: the
  // density-clustering shape that scales — points bucket once into
  // an ε-grid (cell = 25000 e6-units), density is the 3×3
  // neighborhood mass (a 9-offset broadcast join on the CELL grain,
  // never a point-pair join), core cells pass a corpus-relative
  // threshold (≥1% of all points), and clusters are connected
  // components of the 8-adjacent core-cell graph
  // ([[graft.operators.Dedup.connectedComponentsStar]], O(log n)
  // rounds). Point coordinates shift non-negative before integer
  // division so Spark's truncation and DuckDB's floor agree. The
  // oracle replays the components with a recursive transitive-
  // closure CTE — tractable because the cell graph is
  // grid-universe-bounded, exactly the property that makes the
  // operator scale.
  // ---------------------------------------------------------------------
  private def q473(s: SparkSession, dir: String): DataFrame = {
    val cellW = 25000L
    val pts = t(s, dir, "embeddings")
      .select(
        ((round(element_at(col("embedding"), 1).cast("double") * 1000000.0)
          .cast("long") + lit(1000000L)) / lit(cellW)).cast("long").as("cx"),
        ((round(element_at(col("embedding"), 2).cast("double") * 1000000.0)
          .cast("long") + lit(1000000L)) / lit(cellW)).cast("long").as("cy"))
    val cells = pts.groupBy("cx", "cy").agg(count(lit(1)).as("cnt")).pin()
    val n = cells.agg(sum(col("cnt")).as("n_total"))
    // integer div BEFORE the -1 shift: id/3 is DOUBLE division in
    // Spark, and trunc(id/3 - 1) folds -0.67 to 0, not -1
    val offs = s.range(9).select(
      ((col("id") / 3L).cast("long") - 1L).as("dx"),
      (col("id") % 3L - 1L).cast("long").as("dy"))
    val neigh = cells.crossJoin(broadcast(offs))
      .groupBy((col("cx") + col("dx")).as("cx"),
        (col("cy") + col("dy")).as("cy"))
      .agg(sum(col("cnt")).as("nmass"))
    val core = cells.join(neigh, Seq("cx", "cy"))
      .crossJoin(broadcast(n))
      .filter(col("nmass") * 100L >= col("n_total"))
      .select(col("cx"), col("cy"), col("cnt"),
        (col("cx") * 4096L + col("cy")).as("ck"))
      .pin()
    val edges = core.select(col("cx"), col("cy"), col("ck"))
      .crossJoin(broadcast(offs))
      .filter(col("dx") =!= 0L || col("dy") =!= 0L)
      .select((col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"),
        col("ck").as("id_a"))
      .join(core.select(col("cx"), col("cy"), col("ck").as("id_b")),
        Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // components via a single-partition union-find over the
    // raise_error-guarded CELL-EDGE grain (the q442 bounded-walk
    // pattern): the grid is universe-bounded by construction
    // (≤ 81×81 cells at this ε regardless of corpus size), so the
    // O(log n) distributed star contraction would spend its rounds
    // on a driver-scale graph — only cell edges funnel into the one
    // partition, never points
    import s.implicits._
    val nCells = core.agg(count(lit(1)).as("nc"))
    val comp = edges.crossJoin(broadcast(nCells))
      .select(
        when(col("nc") <= 100000L, col("id_a"))
          .otherwise(raise_error(concat(
            lit("gridDbscan: cell universe exceeded 100000 ("),
            col("nc").cast("string"),
            lit(") — widen the cell or raise the bound explicitly."))))
          .as("id_a"),
        col("id_b"))
      .as[(Long, Long)].repartition(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) {
            val n = parent(c); parent(c) = r; c = n
          }
          r
        }
        it.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val ids = parent.keys.toSeq ++ parent.values.toSeq
        ids.distinct.map(id => (id, find(id))).iterator
      }
      .toDF("id", "cluster")
    core.join(comp, core("ck") === comp("id"), "left")
      .select(col("ck"), col("cnt"),
        coalesce(col("cluster"), col("ck")).as("cluster"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_cells"), sum(col("cnt")).as("n_points"))
      .orderBy(col("cluster"))
  }

  private val q473Sql =
    """WITH RECURSIVE pts AS (
      |  SELECT (CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000.0)
      |      AS BIGINT) + 1000000) // 25000 AS cx,
      |    (CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000.0)
      |      AS BIGINT) + 1000000) // 25000 AS cy
      |  FROM embeddings),
      |cells AS (
      |  SELECT cx, cy, CAST(count(*) AS BIGINT) AS cnt
      |  FROM pts GROUP BY cx, cy),
      |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM cells),
      |offs AS (
      |  SELECT CAST(i // 3 - 1 AS BIGINT) AS dx,
      |    CAST(i % 3 - 1 AS BIGINT) AS dy
      |  FROM range(9) t(i)),
      |neigh AS (
      |  -- aliases ncx/ncy, NOT cx/cy: DuckDB binds output aliases in
      |  -- GROUP BY, so "GROUP BY cx + dx" with an output named cx
      |  -- would double-shift
      |  SELECT cells.cx + dx AS ncx, cells.cy + dy AS ncy,
      |    CAST(sum(cnt) AS BIGINT) AS nmass
      |  FROM cells CROSS JOIN offs
      |  GROUP BY cells.cx + dx, cells.cy + dy),
      |core AS (
      |  SELECT cells.cx, cells.cy, cnt, cells.cx * 4096 + cells.cy AS ck
      |  FROM cells
      |  JOIN neigh ON ncx = cells.cx AND ncy = cells.cy
      |  CROSS JOIN n
      |  WHERE nmass * 100 >= n_total),
      |edges AS (
      |  SELECT a.ck AS src, b.ck AS dst
      |  FROM core a JOIN core b
      |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
      |    AND a.ck <> b.ck),
      |reach(ck, lbl) AS (
      |  SELECT ck, ck AS lbl FROM core
      |  UNION
      |  SELECT e.src, r.lbl
      |  FROM reach r JOIN edges e ON r.ck = e.dst
      |  WHERE r.lbl < e.src),
      |comp AS (SELECT ck, min(lbl) AS cluster FROM reach GROUP BY ck)
      |SELECT cluster, CAST(count(*) AS BIGINT) AS n_cells,
      |  CAST(sum(cnt) AS BIGINT) AS n_points
      |FROM core JOIN comp USING (ck)
      |GROUP BY cluster
      |ORDER BY cluster""".stripMargin

  // ---------------------------------------------------------------------
  // q474 — minimizer-sketch near-dup candidates: the genomics
  // sketching scheme (minimap-style) as the positional alternative
  // to MinHash — every 5-window of consecutive 3-gram shingles
  // selects its minimum portable-hash shingle, the distinct selected
  // set is the doc's sketch, and candidate pairs share a minimizer.
  // Window selection is a doc-partitioned LEAD + running window min
  // (never unpartitioned); the posting join df-prunes minimizers in
  // >50 docs (stop-shingles) before pairing, the same hot-key
  // discipline as the jaccard family. NOTE the readout semantics:
  // jacc_e6 is a PRUNED-HYBRID jaccard — `shared` counts only df≤50
  // minimizers while ma/mb are the UNPRUNED sketch sizes, so pairs
  // sharing hot minimizers read systematically LOW. That is the
  // intended candidate-ranking estimate (hot minimizers carry no
  // discriminative signal), deterministic and identical on both
  // engines; it is not the plain minimizer-set jaccard. Top-20 by
  // shared mass.
  // ---------------------------------------------------------------------
  private def q474(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(Text.words(col("text")))
        .as(Seq("p", "w")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val kg = toks
      .withColumn("w1", lead(col("w"), 1).over(wDoc))
      .withColumn("w2", lead(col("w"), 2).over(wDoc))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("p"),
        graft.functions.PortableHash.hash60(
          concat_ws(" ", col("w"), col("w1"), col("w2"))).as("h"))
    val wmin = kg
      .withColumn("mh", min(col("h")).over(
        wDoc.rowsBetween(0, 4)))
      .select(col("doc_id"), col("mh")).distinct().pin()
    val sizes = wmin.groupBy("doc_id").agg(count(lit(1)).as("m"))
    val pruned = wmin.join(
      wmin.groupBy("mh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50L).select("mh"), Seq("mh"))
    val pairs = pruned.as("a").join(pruned.as("b"),
        col("a.mh") === col("b.mh")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("doc_id").as("da"), col("m").as("ma")), Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("m").as("mb")), Seq("db"))
      .select(col("da"), col("db"), col("shared"),
        round(col("shared").cast("double")
          / (col("ma") + col("mb") - col("shared")).cast("double")
          * 1000000.0).cast("long").as("jacc_e6"))
      .orderBy(col("shared").desc, col("da").asc, col("db").asc)
      .limit(20)
  }

  private val q474Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "concat_ws(' ', w, w1, w2)")
    s"""WITH toks AS (
      |  SELECT doc_id, CAST(q.p AS BIGINT) AS p, q.w AS w FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(len(ws)),
      |        i -> {'p': i, 'w': ws[i+1]})) AS q
      |    FROM (SELECT doc_id, list_filter(string_split(text, ' '),
      |      x -> length(x) > 0) AS ws FROM documents))),
      |kg AS (
      |  SELECT doc_id, p, $h AS h FROM (
      |    SELECT doc_id, p, w,
      |      lead(w, 1) OVER (PARTITION BY doc_id ORDER BY p) AS w1,
      |      lead(w, 2) OVER (PARTITION BY doc_id ORDER BY p) AS w2
      |    FROM toks)
      |  WHERE w2 IS NOT NULL),
      |wmin AS (
      |  SELECT DISTINCT doc_id, mh FROM (
      |    SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS mh
      |    FROM kg)),
      |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m
      |  FROM wmin GROUP BY doc_id),
      |pruned AS (
      |  SELECT wmin.doc_id, mh FROM wmin
      |  JOIN (SELECT mh FROM wmin GROUP BY mh HAVING count(*) <= 50)
      |    USING (mh)),
      |pairs AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db,
      |    CAST(count(*) AS BIGINT) AS shared
      |  FROM pruned a JOIN pruned b
      |    ON a.mh = b.mh AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT da, db, shared,
      |  CAST(round(CAST(shared AS DOUBLE)
      |    / CAST(sa.m + sb.m - shared AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS jacc_e6
      |FROM pairs
      |JOIN sizes sa ON sa.doc_id = da
      |JOIN sizes sb ON sb.doc_id = db
      |ORDER BY shared DESC, da ASC, db ASC
      |LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q475 — repeated-substring span audit (the Lee et al.
  // "Deduplicating Training Data Makes Language Models Better"
  // primitive): every word-level 10-gram that occurs more than once
  // ANYWHERE in the corpus marks its [p, p+9] token span, and
  // per-doc overlapping/adjacent spans merge into maximal duplicated
  // runs via the gaps-and-islands pattern (exclusive running max of
  // span end, doc-partitioned windows only). Output: the 20 most
  // duplicated docs with span count, duplicated-token mass, and
  // share. The global duplicate test is one grouped count on the
  // 10-gram hash grain — the suffix-array result at shuffle cost.
  // ---------------------------------------------------------------------
  private def q475(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(Text.words(col("text")))
        .as(Seq("p", "w")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val leads = (1 to 9).foldLeft(toks) { case (df, i) =>
      df.withColumn(s"w$i", lead(col("w"), i).over(wDoc))
    }
    val grams = leads.filter(col("w9").isNotNull)
      .select(col("doc_id"), col("p"),
        graft.functions.PortableHash.hash60(concat_ws(" ",
          col("w") +: (1 to 9).map(i => col(s"w$i")): _*)).as("h"))
      .pin()
    val dup = grams.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1L).select("h")
    val marked = grams.join(dup, Seq("h"))
      .select(col("doc_id"), col("p"), (col("p") + 9L).as("pe"))
    val isl = marked
      .withColumn("me", max(col("pe")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("me").isNull || col("p") > col("me") + 1L, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("ni")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg((max(col("pe")) - min(col("p")) + 1L).as("len"))
    val sizes = t(s, dir, "documents")
      .select(col("doc_id"), size(Text.words(col("text"))).cast("long")
        .as("n_tokens"))
    isl.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("len")).as("dup_tokens"))
      .join(sizes, Seq("doc_id"))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"),
        col("n_tokens"),
        round(col("dup_tokens").cast("double")
          / col("n_tokens").cast("double") * 1000000.0).cast("long")
          .as("share_e6"))
      .orderBy(col("dup_tokens").desc, col("doc_id").asc)
      .limit(20)
  }

  private val q475Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "concat_ws(' ', w, w1, w2, w3, w4, w5, w6, w7, w8, w9)")
    s"""WITH toks AS (
      |  SELECT doc_id, CAST(q.p AS BIGINT) AS p, q.w AS w FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(len(ws)),
      |        i -> {'p': i, 'w': ws[i+1]})) AS q
      |    FROM (SELECT doc_id, list_filter(string_split(text, ' '),
      |      x -> length(x) > 0) AS ws FROM documents))),
      |leads AS (
      |  SELECT doc_id, p, w,
      |    lead(w, 1) OVER dw AS w1, lead(w, 2) OVER dw AS w2,
      |    lead(w, 3) OVER dw AS w3, lead(w, 4) OVER dw AS w4,
      |    lead(w, 5) OVER dw AS w5, lead(w, 6) OVER dw AS w6,
      |    lead(w, 7) OVER dw AS w7, lead(w, 8) OVER dw AS w8,
      |    lead(w, 9) OVER dw AS w9
      |  FROM toks
      |  WINDOW dw AS (PARTITION BY doc_id ORDER BY p)),
      |grams AS (
      |  SELECT doc_id, p, $h AS h FROM leads WHERE w9 IS NOT NULL),
      |dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) > 1),
      |marked AS (
      |  SELECT doc_id, p, p + 9 AS pe FROM grams JOIN dup USING (h)),
      |isl AS (
      |  SELECT doc_id, p, pe,
      |    max(pe) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS me
      |  FROM marked),
      |num AS (
      |  SELECT doc_id, p, pe,
      |    sum(CASE WHEN me IS NULL OR p > me + 1 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY p
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM isl),
      |spans AS (
      |  SELECT doc_id, island, max(pe) - min(p) + 1 AS len
      |  FROM num GROUP BY doc_id, island),
      |sizes AS (
      |  SELECT doc_id, CAST(len(list_filter(string_split(text, ' '),
      |    x -> length(x) > 0)) AS BIGINT) AS n_tokens
      |  FROM documents),
      |agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |    CAST(sum(len) AS BIGINT) AS dup_tokens
      |  FROM spans GROUP BY doc_id)
      |SELECT agg.doc_id, n_spans, dup_tokens, n_tokens,
      |  CAST(round(CAST(dup_tokens AS DOUBLE)
      |    / CAST(n_tokens AS DOUBLE) * 1000000.0) AS BIGINT) AS share_e6
      |FROM agg JOIN sizes ON agg.doc_id = sizes.doc_id
      |ORDER BY dup_tokens DESC, agg.doc_id ASC
      |LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q476 — the first two gradient-boosting rounds (squared loss,
  // stump base learners): round 1 fits a stump on the UTC hour to
  // the cents target, round 2 fits a stump on epoch-day-mod-7 to the
  // ROUND-1 RESIDUALS — additive boosting exactly as Friedman
  // defines it, with every statistic exact. Each fit is the q468
  // machinery on a clock-bounded axis (24/7 rows): cumulants of
  // (n, Σr, Σr²), argmax of the variance-reduction gain
  // S²_le/n_le + S²_gt/n_gt on a bit-identical IEEE chain, leaf
  // predictions round(mean) in integer cents so residuals stay
  // integers, and SSE before/after in closed form from the exact
  // sufficient statistics (never a second data pass per candidate).
  // ---------------------------------------------------------------------
  private def q476(s: SparkSession, dir: String): DataFrame = {
    // stump fit on a bounded integer feature axis: returns one row
    // (thr, pred_le, pred_gt, sse_before, sse_after)
    def fitStump(data: DataFrame, f: Column, r: Column): DataFrame = {
      val base = data.select(f.as("f"), r.as("r"))
      val axis = base.groupBy("f").agg(count(lit(1)).as("nf"),
        sum(col("r").cast(dec)).as("sf"),
        sum(col("r").cast(dec) * col("r")).as("qf"))
      // cumulants via a broadcast triangular self-join (the
      // globalRank offsets idiom): the axis is CLOCK-BOUNDED
      // (hour/day-of-week, ≤24 rows → ≤576 joined rows), so three
      // range-partitioned globalCumSums would pay six shuffles and
      // checkpoints for nothing
      val c3 = axis.as("a").join(broadcast(axis.as("b")),
          col("b.f") <= col("a.f"))
        .groupBy(col("a.f").as("f"))
        .agg(sum(col("b.nf")).as("n_le"), sum(col("b.sf")).as("s_le"),
          sum(col("b.qf")).as("q_le"))
      val tot = axis.agg(sum(col("nf")).as("nn"),
        sum(col("sf")).as("ss"), sum(col("qf")).as("qq"))
      val scored = c3.crossJoin(broadcast(tot))
        .filter(col("n_le") < col("nn"))
        .withColumn("n_gt", col("nn") - col("n_le"))
        .withColumn("s_gt", col("ss") - col("s_le"))
        .withColumn("gain",
          (col("s_le") * col("s_le")).cast("double")
            / col("n_le").cast("double")
          + (col("s_gt") * col("s_gt")).cast("double")
            / col("n_gt").cast("double"))
      val best = scored
        .orderBy(col("gain").desc, col("f").asc).limit(1)
      best.select(col("f").as("thr"),
        round(col("s_le").cast("double") / col("n_le").cast("double"))
          .cast("long").as("pred_le"),
        round(col("s_gt").cast("double") / col("n_gt").cast("double"))
          .cast("long").as("pred_gt"),
        col("n_le"), col("s_le"), col("q_le"),
        col("nn"), col("ss"), col("qq"))
        .withColumn("mean0",
          round(col("ss").cast("double") / col("nn").cast("double"))
            .cast("long"))
        .select(col("thr"), col("pred_le"), col("pred_gt"),
          (col("qq") - lit(2L) * col("mean0") * col("ss")
            + col("nn") * col("mean0").cast(dec) * col("mean0"))
            .cast("long").as("sse_before"),
          ((col("q_le") - lit(2L) * col("pred_le") * col("s_le")
            + col("n_le") * col("pred_le").cast(dec) * col("pred_le"))
          + ((col("qq") - col("q_le"))
            - lit(2L) * col("pred_gt") * (col("ss") - col("s_le"))
            + (col("nn") - col("n_le"))
              * col("pred_gt").cast(dec) * col("pred_gt")))
            .cast("long").as("sse_after"))
    }
    val ev = Tables.eventsSec(s, dir).select(
        hour(col("ts_s")).cast("long").as("hr"),
        pmod(expr("CAST(datediff(to_date(ts_s), DATE '1970-01-01') AS BIGINT)"),
          lit(7L)).as("dw"),
        round(col("value") * 100).cast("long").as("y"))
      .pin()
    val s1 = fitStump(ev, col("hr"), col("y"))
    val withRes = ev.crossJoin(broadcast(
        s1.select(col("thr").as("t1"), col("pred_le").as("pl1"),
          col("pred_gt").as("pg1"))))
      .withColumn("r1", col("y") -
        when(col("hr") <= col("t1"), col("pl1")).otherwise(col("pg1")))
    val s2 = fitStump(withRes, col("dw"), col("r1"))
    s1.withColumn("round", lit(1L))
      .unionByName(s2.withColumn("round", lit(2L)))
      .select(col("round"), col("thr"), col("pred_le"), col("pred_gt"),
        col("sse_before"), col("sse_after"))
      .orderBy(col("round"))
  }

  private val q476Sql =
    """WITH ev AS (
      |  SELECT CAST(hour(date_trunc('second', ts)) AS BIGINT) AS hr,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(date_trunc('second', ts) AS DATE)) % 7 AS BIGINT) AS dw,
      |    CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events),
      |ax1 AS (
      |  SELECT hr AS f, CAST(count(*) AS BIGINT) AS nf,
      |    sum(CAST(y AS HUGEINT)) AS sf,
      |    sum(CAST(y AS HUGEINT) * y) AS qf
      |  FROM ev GROUP BY hr),
      |cum1 AS (
      |  SELECT f, sum(nf) OVER w AS n_le, sum(sf) OVER w AS s_le,
      |    sum(qf) OVER w AS q_le
      |  FROM ax1 WINDOW w AS (ORDER BY f)),
      |tot1 AS (
      |  SELECT CAST(sum(nf) AS BIGINT) AS nn, sum(sf) AS ss,
      |    sum(qf) AS qq FROM ax1),
      |sc1 AS (
      |  SELECT f, n_le, s_le, q_le, nn, ss, qq,
      |    nn - n_le AS n_gt, ss - s_le AS s_gt,
      |    CAST(s_le * s_le AS DOUBLE) / CAST(n_le AS DOUBLE)
      |      + CAST((ss - s_le) * (ss - s_le) AS DOUBLE)
      |        / CAST(nn - n_le AS DOUBLE) AS gain
      |  FROM cum1 CROSS JOIN tot1
      |  WHERE n_le < nn),
      |b1 AS (
      |  SELECT f AS thr,
      |    CAST(round(CAST(s_le AS DOUBLE) / CAST(n_le AS DOUBLE))
      |      AS BIGINT) AS pred_le,
      |    CAST(round(CAST(s_gt AS DOUBLE) / CAST(n_gt AS DOUBLE))
      |      AS BIGINT) AS pred_gt,
      |    CAST(round(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
      |      AS BIGINT) AS mean0,
      |    n_le, s_le, q_le, nn, ss, qq
      |  FROM sc1 ORDER BY gain DESC, f ASC LIMIT 1),
      |r1row AS (
      |  SELECT thr, pred_le, pred_gt,
      |    CAST(qq - 2 * mean0 * ss + nn * CAST(mean0 AS HUGEINT) * mean0
      |      AS BIGINT) AS sse_before,
      |    CAST((q_le - 2 * pred_le * s_le
      |        + n_le * CAST(pred_le AS HUGEINT) * pred_le)
      |      + ((qq - q_le) - 2 * pred_gt * (ss - s_le)
      |        + (nn - n_le) * CAST(pred_gt AS HUGEINT) * pred_gt)
      |      AS BIGINT) AS sse_after
      |  FROM b1),
      |res AS (
      |  SELECT dw, y - (CASE WHEN hr <= thr THEN pred_le
      |    ELSE pred_gt END) AS r
      |  FROM ev CROSS JOIN b1),
      |ax2 AS (
      |  SELECT dw AS f, CAST(count(*) AS BIGINT) AS nf,
      |    sum(CAST(r AS HUGEINT)) AS sf,
      |    sum(CAST(r AS HUGEINT) * r) AS qf
      |  FROM res GROUP BY dw),
      |cum2 AS (
      |  SELECT f, sum(nf) OVER w AS n_le, sum(sf) OVER w AS s_le,
      |    sum(qf) OVER w AS q_le
      |  FROM ax2 WINDOW w AS (ORDER BY f)),
      |tot2 AS (
      |  SELECT CAST(sum(nf) AS BIGINT) AS nn, sum(sf) AS ss,
      |    sum(qf) AS qq FROM ax2),
      |sc2 AS (
      |  SELECT f, n_le, s_le, q_le, nn, ss, qq,
      |    nn - n_le AS n_gt, ss - s_le AS s_gt,
      |    CAST(s_le * s_le AS DOUBLE) / CAST(n_le AS DOUBLE)
      |      + CAST((ss - s_le) * (ss - s_le) AS DOUBLE)
      |        / CAST(nn - n_le AS DOUBLE) AS gain
      |  FROM cum2 CROSS JOIN tot2
      |  WHERE n_le < nn),
      |b2 AS (
      |  SELECT f AS thr,
      |    CAST(round(CAST(s_le AS DOUBLE) / CAST(n_le AS DOUBLE))
      |      AS BIGINT) AS pred_le,
      |    CAST(round(CAST(s_gt AS DOUBLE) / CAST(n_gt AS DOUBLE))
      |      AS BIGINT) AS pred_gt,
      |    CAST(round(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
      |      AS BIGINT) AS mean0,
      |    n_le, s_le, q_le, nn, ss, qq
      |  FROM sc2 ORDER BY gain DESC, f ASC LIMIT 1),
      |r2row AS (
      |  SELECT thr, pred_le, pred_gt,
      |    CAST(qq - 2 * mean0 * ss + nn * CAST(mean0 AS HUGEINT) * mean0
      |      AS BIGINT) AS sse_before,
      |    CAST((q_le - 2 * pred_le * s_le
      |        + n_le * CAST(pred_le AS HUGEINT) * pred_le)
      |      + ((qq - q_le) - 2 * pred_gt * (ss - s_le)
      |        + (nn - n_le) * CAST(pred_gt AS HUGEINT) * pred_gt)
      |      AS BIGINT) AS sse_after
      |  FROM b2)
      |SELECT CAST(1 AS BIGINT) AS round, thr, pred_le, pred_gt,
      |  sse_before, sse_after FROM r1row
      |UNION ALL
      |SELECT CAST(2 AS BIGINT) AS round, thr, pred_le, pred_gt,
      |  sse_before, sse_after FROM r2row
      |ORDER BY round""".stripMargin

  // ---------------------------------------------------------------------
  // q477 — weighted sampling WITHOUT replacement
  // (Efraimidis–Spirakis A-Res): each doc draws a deterministic
  // uniform u from its portable hash and keys on ln(u)/w (w =
  // n_chars); the k largest keys ARE a weight-proportional sample
  // without replacement — the one-pass distributed answer to
  // "sample 50 docs by length" that a sequential reservoir cannot
  // give. Per-row ln e9-rounds at the row; top-k is one
  // TakeOrdered. Deterministic u = (hash mod 10⁹ + 1)/10⁹ keeps
  // the whole pipeline engine-reproducible (the q131 Poisson-
  // bootstrap convention).
  // ---------------------------------------------------------------------
  private def q477(s: SparkSession, dir: String): DataFrame = {
    val keyed = t(s, dir, "documents").select(col("doc_id"),
        col("n_chars").as("w"),
        (graft.functions.PortableHash.hash60(
          concat(lit("wsamp:"), col("doc_id").cast("string")))
          % 1000000000L + 1L).as("u_e9"))
      .select(col("doc_id"), col("w"),
        round(log(col("u_e9").cast("double") / 1000000000.0)
          / col("w").cast("double") * 1000000000.0).cast("long")
          .as("key_e9"))
    keyed.orderBy(col("key_e9").desc, col("doc_id").asc).limit(50)
  }

  private val q477Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "concat('wsamp:', CAST(doc_id AS VARCHAR))")
    s"""WITH keyed AS (
      |  SELECT doc_id, n_chars AS w,
      |    CAST(round(ln(CAST($h % 1000000000 + 1 AS DOUBLE)
      |        / 1000000000.0)
      |      / CAST(n_chars AS DOUBLE) * 1000000000.0) AS BIGINT)
      |      AS key_e9
      |  FROM documents)
      |SELECT doc_id, w, key_e9 FROM keyed
      |ORDER BY key_e9 DESC, doc_id ASC LIMIT 50""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q478 — PCA top component by POWER ITERATION, matrix-free: two
  // rounds of v ← normalize(Xᵀ(Xv)) over the (id, dim) grain —
  // never materializing the covariance, which is the only shape that
  // survives wide X at scale. The 64-row vector broadcasts; each
  // half-step is one grouped sum (scores per id, loadings per dim);
  // products Xv stay exact longs, the Xᵀs reduction runs in
  // decimal(38,0), and the vector re-quantizes to e6 integers after
  // each normalization (one identical sqrt-divide-round chain), so
  // both engines walk the same integer lattice. λ reads out as the
  // pre-normalization magnitude of the final step.
  // ---------------------------------------------------------------------
  private def q478(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "xv")))
      .select(col("vec_id"), col("d").cast("long").as("d"),
        round(col("xv").cast("double") * 1000000.0).cast("long").as("x"))
      .pin()
    val v0 = pts.select(col("d")).distinct()
      .select(col("d"), when(col("d") === 0L, 1000000L).otherwise(0L)
        .as("v"))
    // loadings re-quantize to e9 longs BEFORE the norm (raw w ~ 10²²
    // would overflow decimal(38,0) when squared); the rescale is the
    // same IEEE chain on both engines, so the lattice stays shared
    def step(v: DataFrame): DataFrame = {
      val scores = pts.join(broadcast(v), Seq("d"))
        .groupBy("vec_id").agg(sum(col("x") * col("v")).as("sc"))
      val loads = pts.join(scores, Seq("vec_id"))
        .groupBy("d").agg(sum(col("x").cast(dec) * col("sc")).as("w"))
        .select(col("d"),
          round(col("w").cast("double") / 1.0e9).cast("long").as("w9"))
      val nrm = loads.agg(sum(col("w9").cast(dec) * col("w9")).as("n2"))
      loads.crossJoin(broadcast(nrm))
        .select(col("d"),
          round(col("w9").cast("double")
            / sqrt(greatest(col("n2").cast("double"), lit(1.0)))
            * 1000000.0).cast("long").as("v"),
          col("n2"))
    }
    val v1 = step(v0).select("d", "v")
    val v2 = step(v1)
    v2.select(col("d").as("dim"), col("v").as("v_e6"),
        round(sqrt(greatest(col("n2").cast("double"), lit(1.0))) / 1000.0)
          .cast("long").as("lambda_e6"))
      .orderBy(col("dim"))
  }

  private val q478Sql =
    """WITH pts AS (
      |  SELECT vec_id, CAST(p.dim AS BIGINT) AS d, p.x AS x FROM (
      |    SELECT vec_id,
      |      unnest(list_transform(range(len(embedding)),
      |        i -> {'dim': i,
      |              'x': CAST(round(CAST(embedding[i+1] AS DOUBLE)
      |                   * 1000000.0) AS BIGINT)})) AS p
      |    FROM embeddings)),
      |v0 AS (
      |  SELECT DISTINCT d,
      |    CASE WHEN d = 0 THEN 1000000 ELSE 0 END AS v
      |  FROM pts),
      |sc1 AS (
      |  SELECT vec_id, CAST(sum(x * v) AS BIGINT) AS sc
      |  FROM pts JOIN v0 USING (d) GROUP BY vec_id),
      |ld1 AS (
      |  SELECT d, CAST(round(CAST(sum(CAST(x AS HUGEINT) * sc) AS DOUBLE)
      |    / 1.0e9) AS BIGINT) AS w9
      |  FROM pts JOIN sc1 USING (vec_id) GROUP BY d),
      |n1 AS (SELECT sum(CAST(w9 AS HUGEINT) * w9) AS n2 FROM ld1),
      |v1 AS (
      |  SELECT d, CAST(round(CAST(w9 AS DOUBLE)
      |    / sqrt(greatest(CAST(n2 AS DOUBLE), 1.0))
      |    * 1000000.0) AS BIGINT) AS v
      |  FROM ld1 CROSS JOIN n1),
      |sc2 AS (
      |  SELECT vec_id, CAST(sum(x * v) AS BIGINT) AS sc
      |  FROM pts JOIN v1 USING (d) GROUP BY vec_id),
      |ld2 AS (
      |  SELECT d, CAST(round(CAST(sum(CAST(x AS HUGEINT) * sc) AS DOUBLE)
      |    / 1.0e9) AS BIGINT) AS w9
      |  FROM pts JOIN sc2 USING (vec_id) GROUP BY d),
      |n2t AS (SELECT sum(CAST(w9 AS HUGEINT) * w9) AS n2 FROM ld2)
      |SELECT d AS dim,
      |  CAST(round(CAST(w9 AS DOUBLE)
      |    / sqrt(greatest(CAST(n2 AS DOUBLE), 1.0))
      |    * 1000000.0) AS BIGINT) AS v_e6,
      |  CAST(round(sqrt(greatest(CAST(n2 AS DOUBLE), 1.0)) / 1000.0)
      |    AS BIGINT) AS lambda_e6
      |FROM ld2 CROSS JOIN n2t
      |ORDER BY dim""".stripMargin

  // ---------------------------------------------------------------------
  // q479 — ridge regression in closed form, 3 features (bias, UTC
  // hour, epoch-day-mod-7) against cents: w = (XᵀX + λI)⁻¹ Xᵀy
  // solved by CRAMER'S RULE on exact decimal(38,0) sufficient
  // statistics — six Gram entries + three moment entries from ONE
  // map-side-combined scan, 3×3 determinants as integer polynomial
  // expressions (≲10³⁵ at sf100, inside both engines' 128-bit
  // decimals), one IEEE division per weight. The distributed-
  // training point: the data pass is feature-count-bounded
  // aggregation; the solve is O(p³) on the driver-side literal
  // plan, p = 3.
  // ---------------------------------------------------------------------
  private def q479(s: SparkSession, dir: String): DataFrame = {
    val lam = 1000L
    val f = Tables.eventsSec(s, dir).select(
      hour(col("ts_s")).cast("long").as("h"),
      pmod(expr("CAST(datediff(to_date(ts_s), DATE '1970-01-01') AS BIGINT)"),
        lit(7L)).as("dw"),
      round(col("value") * 100).cast("long").as("y"))
    val g = f.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("h").cast(dec)).as("sh"),
      sum(col("dw").cast(dec)).as("sd"),
      sum(col("h").cast(dec) * col("h")).as("shh"),
      sum(col("h").cast(dec) * col("dw")).as("shd"),
      sum(col("dw").cast(dec) * col("dw")).as("sdd"),
      sum(col("y").cast(dec)).as("sy"),
      sum(col("h").cast(dec) * col("y")).as("shy"),
      sum(col("dw").cast(dec) * col("y")).as("sdy"))
    def det3(a: Column, b: Column, c: Column,
             d: Column, e: Column, fq: Column,
             p: Column, q: Column, r: Column): Column =
      a * (e * r - fq * q) - b * (d * r - fq * p) + c * (d * q - e * p)
    val a11 = col("n") + lit(lam); val a12 = col("sh"); val a13 = col("sd")
    val a22 = col("shh") + lit(lam); val a23 = col("shd")
    val a33 = col("sdd") + lit(lam)
    g.select(col("n").cast("long").as("n"),
        det3(a11, a12, a13, a12, a22, a23, a13, a23, a33).as("det"),
        det3(col("sy"), a12, a13, col("shy"), a22, a23,
          col("sdy"), a23, a33).as("d0"),
        det3(a11, col("sy"), a13, a12, col("shy"), a23,
          a13, col("sdy"), a33).as("d1"),
        det3(a11, a12, col("sy"), a12, a22, col("shy"),
          a13, a23, col("sdy")).as("d2"))
      .select(col("n"),
        round(col("d0").cast("double") / col("det").cast("double")
          * 1000000.0).cast("long").as("w0_e6"),
        round(col("d1").cast("double") / col("det").cast("double")
          * 1000000.0).cast("long").as("w1_e6"),
        round(col("d2").cast("double") / col("det").cast("double")
          * 1000000.0).cast("long").as("w2_e6"))
  }

  private val q479Sql =
    """WITH f AS (
      |  SELECT CAST(hour(date_trunc('second', ts)) AS BIGINT) AS h,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(date_trunc('second', ts) AS DATE)) % 7 AS BIGINT) AS dw,
      |    CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events),
      |g AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(h AS HUGEINT)) AS sh,
      |    sum(CAST(dw AS HUGEINT)) AS sd,
      |    sum(CAST(h AS HUGEINT) * h) AS shh,
      |    sum(CAST(h AS HUGEINT) * dw) AS shd,
      |    sum(CAST(dw AS HUGEINT) * dw) AS sdd,
      |    sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(h AS HUGEINT) * y) AS shy,
      |    sum(CAST(dw AS HUGEINT) * y) AS sdy
      |  FROM f),
      |d AS (
      |  SELECT CAST(n AS BIGINT) AS n,
      |    (n + 1000) * ((shh + 1000) * (sdd + 1000) - shd * shd)
      |      - sh * (sh * (sdd + 1000) - shd * sd)
      |      + sd * (sh * shd - (shh + 1000) * sd) AS det,
      |    sy * ((shh + 1000) * (sdd + 1000) - shd * shd)
      |      - sh * (shy * (sdd + 1000) - shd * sdy)
      |      + sd * (shy * shd - (shh + 1000) * sdy) AS d0,
      |    (n + 1000) * (shy * (sdd + 1000) - shd * sdy)
      |      - sy * (sh * (sdd + 1000) - shd * sd)
      |      + sd * (sh * sdy - shy * sd) AS d1,
      |    (n + 1000) * ((shh + 1000) * sdy - shy * shd)
      |      - sh * (sh * sdy - shy * sd)
      |      + sy * (sh * shd - (shh + 1000) * sd) AS d2
      |  FROM g)
      |SELECT n,
      |  CAST(round(CAST(d0 AS DOUBLE) / CAST(det AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS w0_e6,
      |  CAST(round(CAST(d1 AS DOUBLE) / CAST(det AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS w1_e6,
      |  CAST(round(CAST(d2 AS DOUBLE) / CAST(det AS DOUBLE)
      |    * 1000000.0) AS BIGINT) AS w2_e6
      |FROM d""".stripMargin

  // ---------------------------------------------------------------------
  // q480 — learning-curve audit: the sample-complexity sweep a
  // training platform runs before paying for more data. Rows bucket
  // 0–9 by deterministic hash; for every train fraction k/10
  // (cumulative buckets < k, k = 1..9) a stump on the UTC hour fits
  // from (bucket × hour)-grain cumulants — ONE scan feeds all nine
  // fits — and evaluates on the held-out bucket 9. Train/validation
  // SSE in closed form from exact sufficient statistics; the
  // (k × hour) working grain is 216 rows at any corpus size.
  // ---------------------------------------------------------------------
  private def q480(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.eventsSec(s, dir).select(
        hour(col("ts_s")).cast("long").as("hr"),
        round(col("value") * 100).cast("long").as("y"),
        (graft.functions.PortableHash.hash60(
          concat(lit("lc:"), col("event_id").cast("string")))
          % 10L).as("b"))
    val bh = ev.groupBy("b", "hr").agg(count(lit(1)).as("nf"),
      sum(col("y").cast(dec)).as("sf"),
      sum(col("y").cast(dec) * col("y")).as("qf")).pin()
    val ks = s.range(1, 10).select(col("id").as("k"))
    val kh = bh.join(broadcast(ks), col("b") < col("k"))
      .groupBy("k", "hr").agg(sum(col("nf")).as("nf"),
        sum(col("sf")).as("sf"), sum(col("qf")).as("qf"))
    val wK = Window.partitionBy(col("k")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = kh
      .withColumn("n_le", sum(col("nf")).over(wK))
      .withColumn("s_le", sum(col("sf")).over(wK))
      .withColumn("q_le", sum(col("qf")).over(wK))
    val tot = kh.groupBy("k").agg(sum(col("nf")).as("nn"),
      sum(col("sf")).as("ss"), sum(col("qf")).as("qq"))
    // the when() guard is belt-and-braces for ANSI mode: the argmax
    // join re-evaluates this projection in two subtrees and a
    // reordered evaluation must not divide on a filtered-out row
    val scored = cum.join(tot, Seq("k"))
      .filter(col("n_le") < col("nn"))
      .withColumn("gain",
        when(col("n_le") > 0L && col("n_le") < col("nn"),
          (col("s_le") * col("s_le")).cast("double")
            / col("n_le").cast("double")
          + ((col("ss") - col("s_le")) * (col("ss") - col("s_le")))
            .cast("double") / (col("nn") - col("n_le")).cast("double")))
    val mg = scored.groupBy("k").agg(max(col("gain")).as("mg"))
    val thrK = scored.join(mg, Seq("k"))
      .filter(col("gain") === col("mg"))
      .groupBy("k").agg(min(col("hr")).as("thr"))
      .select(col("k").as("tk"), col("thr")) // renamed: self-join lineage
    val best = scored.join(thrK,
        scored("k") === col("tk") && scored("hr") === col("thr"))
      .select(scored("k"), col("thr"), col("n_le"), col("s_le"),
        col("q_le"), col("nn"), col("ss"), col("qq"))
      .withColumn("pred_le",
        round(col("s_le").cast("double") / col("n_le").cast("double"))
          .cast("long"))
      .withColumn("pred_gt",
        round((col("ss") - col("s_le")).cast("double")
          / (col("nn") - col("n_le")).cast("double")).cast("long"))
      .withColumn("train_sse",
        ((col("q_le") - lit(2L) * col("pred_le") * col("s_le")
          + col("n_le") * col("pred_le").cast(dec) * col("pred_le"))
        + ((col("qq") - col("q_le"))
          - lit(2L) * col("pred_gt") * (col("ss") - col("s_le"))
          + (col("nn") - col("n_le"))
            * col("pred_gt").cast(dec) * col("pred_gt")))
          .cast("long"))
      .pin()
    val vax = ev.filter(col("b") === 9L).groupBy("hr")
      .agg(count(lit(1)).as("n9"), sum(col("y").cast(dec)).as("s9"),
        sum(col("y").cast(dec) * col("y")).as("q9"))
    val vsse = vax.crossJoin(broadcast(
        best.select(col("k"), col("thr"), col("pred_le"), col("pred_gt"))))
      .withColumn("pred", when(col("hr") <= col("thr"), col("pred_le"))
        .otherwise(col("pred_gt")))
      .groupBy("k")
      .agg(sum(col("q9") - lit(2L) * col("pred") * col("s9")
        + col("n9") * col("pred").cast(dec) * col("pred"))
        .cast("long").as("val_sse"))
      .select(col("k").as("vk"), col("val_sse"))
    best.join(vsse, best("k") === col("vk"))
      .select(best("k"), col("nn").as("n_train"), col("thr"),
        col("pred_le"), col("pred_gt"), col("train_sse"), col("val_sse"))
      .orderBy(col("k"))
  }

  private val q480Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "concat('lc:', CAST(event_id AS VARCHAR))")
    s"""WITH ev AS (
      |  SELECT CAST(hour(date_trunc('second', ts)) AS BIGINT) AS hr,
      |    CAST(round(value * 100) AS BIGINT) AS y,
      |    $h % 10 AS b
      |  FROM events),
      |bh AS (
      |  SELECT b, hr, CAST(count(*) AS BIGINT) AS nf,
      |    sum(CAST(y AS HUGEINT)) AS sf,
      |    sum(CAST(y AS HUGEINT) * y) AS qf
      |  FROM ev GROUP BY b, hr),
      |ks AS (SELECT CAST(i AS BIGINT) AS k FROM range(1, 10) t(i)),
      |kh AS (
      |  SELECT k, hr, CAST(sum(nf) AS BIGINT) AS nf,
      |    sum(sf) AS sf, sum(qf) AS qf
      |  FROM bh JOIN ks ON b < k GROUP BY k, hr),
      |cum AS (
      |  SELECT k, hr, sum(nf) OVER w AS n_le, sum(sf) OVER w AS s_le,
      |    sum(qf) OVER w AS q_le
      |  FROM kh WINDOW w AS (PARTITION BY k ORDER BY hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (
      |  SELECT k, CAST(sum(nf) AS BIGINT) AS nn, sum(sf) AS ss,
      |    sum(qf) AS qq
      |  FROM kh GROUP BY k),
      |scored AS (
      |  SELECT cum.k, hr, n_le, s_le, q_le, nn, ss, qq,
      |    CAST(s_le * s_le AS DOUBLE) / CAST(n_le AS DOUBLE)
      |      + CAST((ss - s_le) * (ss - s_le) AS DOUBLE)
      |        / CAST(nn - n_le AS DOUBLE) AS gain
      |  FROM cum JOIN tot ON cum.k = tot.k
      |  WHERE n_le < nn),
      |mg AS (SELECT k, max(gain) AS m FROM scored GROUP BY k),
      |thrk AS (
      |  SELECT scored.k, min(hr) AS thr
      |  FROM scored JOIN mg ON scored.k = mg.k AND gain = m
      |  GROUP BY scored.k),
      |best AS (
      |  SELECT s.k, thr, n_le, s_le, q_le, nn, ss, qq,
      |    CAST(round(CAST(s_le AS DOUBLE) / CAST(n_le AS DOUBLE))
      |      AS BIGINT) AS pred_le,
      |    CAST(round(CAST(ss - s_le AS DOUBLE)
      |      / CAST(nn - n_le AS DOUBLE)) AS BIGINT) AS pred_gt
      |  FROM scored s JOIN thrk ON s.k = thrk.k AND s.hr = thrk.thr),
      |trn AS (
      |  SELECT k, thr, nn, pred_le, pred_gt,
      |    CAST((q_le - 2 * pred_le * s_le
      |        + n_le * CAST(pred_le AS HUGEINT) * pred_le)
      |      + ((qq - q_le) - 2 * pred_gt * (ss - s_le)
      |        + (nn - n_le) * CAST(pred_gt AS HUGEINT) * pred_gt)
      |      AS BIGINT) AS train_sse
      |  FROM best),
      |vax AS (
      |  SELECT hr, CAST(count(*) AS BIGINT) AS n9,
      |    sum(CAST(y AS HUGEINT)) AS s9,
      |    sum(CAST(y AS HUGEINT) * y) AS q9
      |  FROM ev WHERE b = 9 GROUP BY hr),
      |vs AS (
      |  SELECT k, CAST(sum(q9 - 2 * pred * s9
      |      + n9 * CAST(pred AS HUGEINT) * pred) AS BIGINT) AS val_sse
      |  FROM (
      |    SELECT trn.k, q9, s9, n9,
      |      CASE WHEN hr <= thr THEN pred_le ELSE pred_gt END AS pred
      |    FROM vax CROSS JOIN trn)
      |  GROUP BY k)
      |SELECT trn.k, nn AS n_train, thr, pred_le, pred_gt, train_sse,
      |  val_sse
      |FROM trn JOIN vs ON trn.k = vs.k
      |ORDER BY trn.k""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q481 — Rocchio (nearest-centroid) TF-IDF text classifier with
  // its confusion matrix: the train-and-eval loop as three grouped
  // aggregates. TF-IDF weights are exact integers (tf × e6 idf, one
  // e6 ln per VOCAB word); per-lang centroids are unnormalized SUMS
  // (cosine is scale-invariant, so skipping the mean division keeps
  // the centroid exact); scoring joins each doc's sparse vector to
  // the 50×5 centroid table and argmaxes one identical
  // dot/√(‖d‖²·‖c‖²) chain per (doc, lang), ties to the smaller
  // lang. Docs with no vocabulary token drop on both engines alike.
  // Output: the lang × lang confusion matrix.
  // ---------------------------------------------------------------------
  private def q481(s: SparkSession, dir: String): DataFrame = {
    val v = 50
    val words = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(Text.words(col("text"))).as("wd"))
      .pin()
    val vocab = words.groupBy("wd").agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("wd").asc).limit(v)
      .select(col("wd"))
    val nDocs = t(s, dir, "documents").agg(count(lit(1)).as("nd"))
    val df = words.join(broadcast(vocab), Seq("wd"))
      .groupBy("wd").agg(countDistinct(col("doc_id")).as("df"))
    val idf = df.crossJoin(broadcast(nDocs))
      .select(col("wd"),
        round(log(col("nd").cast("double") / col("df").cast("double"))
          * 1000000.0).cast("long").as("idf_e6"))
    val docw = words.join(broadcast(vocab), Seq("wd"))
      .groupBy("doc_id", "lang", "wd").agg(count(lit(1)).as("tf"))
      .join(broadcast(idf), Seq("wd"))
      .select(col("doc_id"), col("lang"), col("wd"),
        (col("tf") * col("idf_e6")).as("w"))
      .pin()
    val cent = docw.groupBy(col("lang").as("cl"), col("wd"))
      .agg(sum(col("w").cast(dec)).as("c"))
    val nc2 = cent.groupBy("cl").agg(sum(col("c") * col("c")).as("nc2"))
    val nd2 = docw.groupBy("doc_id")
      .agg(sum(col("w").cast(dec) * col("w")).as("nd2"))
    val dots = docw.join(broadcast(cent), Seq("wd"))
      .groupBy("doc_id", "lang", "cl")
      .agg(sum(col("w").cast(dec) * col("c")).as("dot"))
    val scoredDocs = dots.join(nd2, Seq("doc_id"))
      .join(broadcast(nc2), Seq("cl"))
      .withColumn("score", col("dot").cast("double")
        / sqrt(col("nd2").cast("double") * col("nc2").cast("double")))
    val mx = scoredDocs.groupBy("doc_id").agg(max(col("score")).as("ms"))
    val pred = scoredDocs.join(mx, Seq("doc_id"))
      .filter(col("score") === col("ms"))
      .groupBy("doc_id", "lang").agg(min(col("cl")).as("pred_lang"))
    pred.groupBy(col("lang").as("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("true_lang"), col("pred_lang"))
  }

  private val q481Sql =
    """WITH words AS (
      |  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '),
      |    w -> length(w) > 0)) AS wd
      |  FROM documents),
      |vocab AS (
      |  SELECT wd FROM (
      |    SELECT wd, count(*) AS cf FROM words GROUP BY wd
      |    ORDER BY cf DESC, wd ASC LIMIT 50)),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
      |idf AS (
      |  SELECT wd, CAST(round(ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE))
      |      * 1000000.0) AS BIGINT) AS idf_e6
      |  FROM (SELECT wd, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |    FROM words JOIN vocab USING (wd) GROUP BY wd)
      |  CROSS JOIN nd),
      |docw AS (
      |  SELECT doc_id, lang, wd, tf * idf_e6 AS w FROM (
      |    SELECT doc_id, lang, wd, CAST(count(*) AS BIGINT) AS tf
      |    FROM words JOIN vocab USING (wd) GROUP BY doc_id, lang, wd)
      |  JOIN idf USING (wd)),
      |cent AS (
      |  SELECT lang AS cl, wd, sum(CAST(w AS HUGEINT)) AS c
      |  FROM docw GROUP BY lang, wd),
      |nc2 AS (SELECT cl, sum(c * c) AS nc2 FROM cent GROUP BY cl),
      |nd2 AS (
      |  SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS nd2
      |  FROM docw GROUP BY doc_id),
      |dots AS (
      |  SELECT doc_id, lang, cl, sum(CAST(w AS HUGEINT) * c) AS dot
      |  FROM docw JOIN cent USING (wd)
      |  GROUP BY doc_id, lang, cl),
      |scored AS (
      |  SELECT doc_id, lang, cl,
      |    CAST(dot AS DOUBLE)
      |      / sqrt(CAST(nd2 AS DOUBLE) * CAST(nc2 AS DOUBLE)) AS score
      |  FROM dots JOIN nd2 USING (doc_id) JOIN nc2 USING (cl)),
      |mx AS (SELECT doc_id, max(score) AS ms FROM scored GROUP BY doc_id),
      |pred AS (
      |  SELECT scored.doc_id, lang, min(cl) AS pred_lang
      |  FROM scored JOIN mx ON scored.doc_id = mx.doc_id AND score = ms
      |  GROUP BY scored.doc_id, lang)
      |SELECT lang AS true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      |FROM pred
      |GROUP BY lang, pred_lang
      |ORDER BY true_lang, pred_lang""".stripMargin

  // ---------------------------------------------------------------------
  // q482 — bagging: eight Poisson-bootstrap replicates (the q131
  // engine-reproducible resampling convention — deterministic
  // Poisson(1) weights from the portable hash) each fit a WEIGHTED
  // stump on the UTC hour, showing the ensemble's structural
  // variance directly: per-replicate thresholds and leaf predictions
  // from weighted cumulants on the (rep × hour) grain. One scan
  // carries all eight replicates; zero-weight sides are excluded
  // before the gain division on both engines.
  // ---------------------------------------------------------------------
  private def q482(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = graft.functions.PortableHash.hash60(
        concat(lit("bag:"), col("event_id"), lit(":"), col("rep")))
      .cast("double") / lit(1.152921504606846976e18)
    val ev = Tables.eventsSec(s, dir).select(col("event_id"),
        hour(col("ts_s")).cast("long").as("hr"),
        round(col("value") * 100).cast("long").as("y"))
      .withColumn("rep", explode(sequence(lit(0L), lit(7L))))
      .withColumn("w", graft.operators.Curate.poissonWeight(u).cast("long"))
    val axis = ev.groupBy("rep", "hr")
      .agg(sum(col("w")).as("nf"), sum(col("w").cast(dec) * col("y")).as("sf"))
    val wR = Window.partitionBy(col("rep")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = axis
      .withColumn("n_le", sum(col("nf")).over(wR))
      .withColumn("s_le", sum(col("sf")).over(wR))
    val tot = axis.groupBy("rep").agg(sum(col("nf")).as("nn"),
      sum(col("sf")).as("ss"))
    val scored = cum.join(tot, Seq("rep"))
      .filter(col("n_le") > 0L && col("n_le") < col("nn"))
      .withColumn("gain",
        when(col("n_le") > 0L && col("n_le") < col("nn"),
          (col("s_le") * col("s_le")).cast("double")
            / col("n_le").cast("double")
          + ((col("ss") - col("s_le")) * (col("ss") - col("s_le")))
            .cast("double") / (col("nn") - col("n_le")).cast("double")))
    val mg = scored.groupBy("rep").agg(max(col("gain")).as("mg"))
    val thr = scored.join(mg, Seq("rep"))
      .filter(col("gain") === col("mg"))
      .groupBy("rep").agg(min(col("hr")).as("thr"))
      .select(col("rep").as("tr"), col("thr")) // renamed: self-join lineage
    scored.join(thr,
        scored("rep") === col("tr") && scored("hr") === col("thr"))
      .select(scored("rep"), col("thr"),
        round(col("s_le").cast("double") / col("n_le").cast("double"))
          .cast("long").as("pred_le"),
        round((col("ss") - col("s_le")).cast("double")
          / (col("nn") - col("n_le")).cast("double")).cast("long")
          .as("pred_gt"),
        col("nn").as("n_eff"))
      .orderBy(col("rep"))
  }

  private val q482Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "'bag:' || CAST(event_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)")
    val w = graft.operators.Curate.poissonWeightDuckSql(
      s"CAST($h AS DOUBLE) / 1.152921504606846976e18")
    s"""WITH ev AS (
      |  SELECT event_id,
      |    CAST(hour(date_trunc('second', ts)) AS BIGINT) AS hr,
      |    CAST(round(value * 100) AS BIGINT) AS y,
      |    unnest(range(8)) AS rep
      |  FROM events),
      |wtd AS (
      |  SELECT CAST(rep AS BIGINT) AS rep, hr, y, CAST($w AS BIGINT) AS w
      |  FROM ev),
      |axis AS (
      |  SELECT rep, hr, CAST(sum(w) AS BIGINT) AS nf,
      |    sum(CAST(w AS HUGEINT) * y) AS sf
      |  FROM wtd GROUP BY rep, hr),
      |cum AS (
      |  SELECT rep, hr, sum(nf) OVER ww AS n_le, sum(sf) OVER ww AS s_le
      |  FROM axis WINDOW ww AS (PARTITION BY rep ORDER BY hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (
      |  SELECT rep, CAST(sum(nf) AS BIGINT) AS nn, sum(sf) AS ss
      |  FROM axis GROUP BY rep),
      |scored AS (
      |  SELECT cum.rep, hr, n_le, s_le, nn, ss,
      |    CAST(s_le * s_le AS DOUBLE) / CAST(n_le AS DOUBLE)
      |      + CAST((ss - s_le) * (ss - s_le) AS DOUBLE)
      |        / CAST(nn - n_le AS DOUBLE) AS gain
      |  FROM cum JOIN tot ON cum.rep = tot.rep
      |  WHERE n_le > 0 AND n_le < nn),
      |mg AS (SELECT rep, max(gain) AS m FROM scored GROUP BY rep),
      |thr AS (
      |  SELECT scored.rep, min(hr) AS thr
      |  FROM scored JOIN mg ON scored.rep = mg.rep AND gain = m
      |  GROUP BY scored.rep)
      |SELECT s.rep, thr.thr,
      |  CAST(round(CAST(s_le AS DOUBLE) / CAST(n_le AS DOUBLE))
      |    AS BIGINT) AS pred_le,
      |  CAST(round(CAST(ss - s_le AS DOUBLE) / CAST(nn - n_le AS DOUBLE))
      |    AS BIGINT) AS pred_gt,
      |  nn AS n_eff
      |FROM scored s JOIN thr ON s.rep = thr.rep AND s.hr = thr.thr
      |ORDER BY s.rep""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q483 — one full ALS alternation (k = 2, ridge λ = 1) on the
  // customer × brand quantity matrix: the canonical distributed
  // matrix-factorization step. Item factors initialize
  // deterministically on the e6 lattice and BROADCAST; the user
  // solve is one groupBy(customer) building each user's 2×2 normal
  // equations (Σffᵀ + λI, Σf·r — exact decimal sums over ≤|brands|
  // terms) closed by Cramer's rule in a single bit-identical
  // IEEE chain; the item solve then re-aggregates the e6-quantized
  // user factors per brand the same way. Parameters broadcast,
  // solves reduce — never a factor-matrix shuffle. Output: the
  // updated 25-row brand factor table.
  // ---------------------------------------------------------------------
  private def q483(s: SparkSession, dir: String): DataFrame = {
    val lamE12 = 1000000000000L // λ̃ = 1 on the e6·e6 integer scale
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val part = t(s, dir, "part")
    val r = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey").as("u"), col("p_brand").as("b"))
      .agg(sum(col("l_quantity").cast("long")).as("r"))
      .pin()
    val f0 = r.select("b").distinct()
      .select(col("b"), lit(1000000L).as("f0"),
        (graft.functions.PortableHash.hash60(concat(lit("als:"), col("b")))
          % 1000000L).as("f1"))
    // user solve: w̃_e6 = round(1e12 · cramer(A, c)) per user
    val ua = r.join(broadcast(f0), Seq("b"))
      .groupBy("u").agg(
        sum(col("f0").cast(dec) * col("f0")).as("a11"),
        sum(col("f0").cast(dec) * col("f1")).as("a12"),
        sum(col("f1").cast(dec) * col("f1")).as("a22"),
        sum(col("f0").cast(dec) * col("r")).as("c0"),
        sum(col("f1").cast(dec) * col("r")).as("c1"))
      .select(col("u"),
        ((col("a11") + lamE12) * (col("a22") + lamE12)
          - col("a12") * col("a12")).as("det"),
        (col("c0") * (col("a22") + lamE12) - col("c1") * col("a12"))
          .as("n0"),
        ((col("a11") + lamE12) * col("c1") - col("a12") * col("c0"))
          .as("n1"))
      .select(col("u"),
        // user factors land on the e3 lattice, not e6: the item
        // solve squares and SUMS them over ALL users, and e6-scale
        // squares would push a corpus-sized determinant past
        // decimal(38,0) (observed at sf0.1); e3 keeps det ≲ 10³⁷
        // even at sf100 while the λ/readout scales adjust to match
        round(col("n0").cast("double") / col("det").cast("double")
          * 1000000000.0).cast("long").as("w0"),
        round(col("n1").cast("double") / col("det").cast("double")
          * 1000000000.0).cast("long").as("w1"))
    // item solve from the e3 user factors (λ on the e3·e3 scale)
    val lamE6 = 1000000L
    r.join(ua, Seq("u"))
      .groupBy("b").agg(
        count(lit(1)).as("n_users"),
        sum(col("w0").cast(dec) * col("w0")).as("a11"),
        sum(col("w0").cast(dec) * col("w1")).as("a12"),
        sum(col("w1").cast(dec) * col("w1")).as("a22"),
        sum(col("w0").cast(dec) * col("r")).as("c0"),
        sum(col("w1").cast(dec) * col("r")).as("c1"))
      .select(col("b").as("brand"), col("n_users"),
        round((col("c0") * (col("a22") + lamE6)
          - col("c1") * col("a12")).cast("double")
          / ((col("a11") + lamE6) * (col("a22") + lamE6)
            - col("a12") * col("a12")).cast("double")
          * 1000000000.0).cast("long").as("g0_e6"),
        round(((col("a11") + lamE6) * col("c1")
          - col("a12") * col("c0")).cast("double")
          / ((col("a11") + lamE6) * (col("a22") + lamE6)
            - col("a12") * col("a12")).cast("double")
          * 1000000000.0).cast("long").as("g1_e6"))
      .orderBy(col("brand"))
  }

  private val q483Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql("concat('als:', b)")
    s"""WITH r AS (
      |  SELECT o_custkey AS u, p_brand AS b,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |  GROUP BY o_custkey, p_brand),
      |f0 AS (
      |  SELECT b, CAST(1000000 AS BIGINT) AS f0, $h % 1000000 AS f1
      |  FROM (SELECT DISTINCT b FROM r)),
      |ua AS (
      |  SELECT u,
      |    sum(CAST(f0 AS HUGEINT) * f0) AS a11,
      |    sum(CAST(f0 AS HUGEINT) * f1) AS a12,
      |    sum(CAST(f1 AS HUGEINT) * f1) AS a22,
      |    sum(CAST(f0 AS HUGEINT) * r.r) AS c0,
      |    sum(CAST(f1 AS HUGEINT) * r.r) AS c1
      |  FROM r JOIN f0 USING (b) GROUP BY u),
      |uw AS (
      |  SELECT u,
      |    CAST(round(CAST(c0 * (a22 + 1000000000000)
      |        - c1 * a12 AS DOUBLE)
      |      / CAST((a11 + 1000000000000) * (a22 + 1000000000000)
      |        - a12 * a12 AS DOUBLE)
      |      * 1000000000.0) AS BIGINT) AS w0,
      |    CAST(round(CAST((a11 + 1000000000000) * c1
      |        - a12 * c0 AS DOUBLE)
      |      / CAST((a11 + 1000000000000) * (a22 + 1000000000000)
      |        - a12 * a12 AS DOUBLE)
      |      * 1000000000.0) AS BIGINT) AS w1
      |  FROM ua),
      |ia AS (
      |  SELECT b, CAST(count(*) AS BIGINT) AS n_users,
      |    sum(CAST(w0 AS HUGEINT) * w0) AS a11,
      |    sum(CAST(w0 AS HUGEINT) * w1) AS a12,
      |    sum(CAST(w1 AS HUGEINT) * w1) AS a22,
      |    sum(CAST(w0 AS HUGEINT) * r.r) AS c0,
      |    sum(CAST(w1 AS HUGEINT) * r.r) AS c1
      |  FROM r JOIN uw USING (u) GROUP BY b)
      |SELECT b AS brand, n_users,
      |  CAST(round(CAST(c0 * (a22 + 1000000) - c1 * a12 AS DOUBLE)
      |    / CAST((a11 + 1000000) * (a22 + 1000000)
      |      - a12 * a12 AS DOUBLE)
      |    * 1000000000.0) AS BIGINT) AS g0_e6,
      |  CAST(round(CAST((a11 + 1000000) * c1 - a12 * c0 AS DOUBLE)
      |    / CAST((a11 + 1000000) * (a22 + 1000000)
      |      - a12 * a12 AS DOUBLE)
      |    * 1000000000.0) AS BIGINT) AS g1_e6
      |FROM ia ORDER BY brand""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q484 — the damped-bias baseline predictor (the classic
  // recommender baseline): r̂ = μ + b_item + b_user with each bias a
  // regularized residual mean, fit in two closed-form passes and
  // scored in a third — μ e6-rounds ONCE so every residual is an
  // exact integer, item biases aggregate residuals vs μ, user biases
  // aggregate residuals vs μ + b_item, and the model RMSE reads out
  // from one exact decimal SSE. Bias denominators carry the damping
  // terms (λ_i = 25, λ_u = 10). Output: the 25-row brand bias table
  // with the (constant) global mean and model RMSE.
  // ---------------------------------------------------------------------
  private def q484(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val part = t(s, dir, "part")
    val r = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey").as("u"), col("p_brand").as("b"))
      .agg((sum(col("l_quantity").cast("long")) * 1000000L).as("re6"))
      .pin()
    val mu = r.agg(round(sum(col("re6").cast(dec)).cast("double")
      / count(lit(1)).cast("double")).cast("long").as("mu_e6"))
    val bi = r.crossJoin(broadcast(mu))
      .groupBy("b")
      .agg(count(lit(1)).as("n_i"),
        sum((col("re6") - col("mu_e6")).cast(dec)).as("resid"))
      .select(col("b"), col("n_i"),
        round(col("resid").cast("double")
          / (col("n_i") + lit(25L)).cast("double")).cast("long")
          .as("bi_e6"))
    val bu = r.crossJoin(broadcast(mu))
      .join(broadcast(bi.select(col("b"), col("bi_e6"))), Seq("b"))
      .groupBy("u")
      .agg(count(lit(1)).as("n_u"),
        sum((col("re6") - col("mu_e6") - col("bi_e6")).cast(dec))
          .as("resid"))
      .select(col("u"),
        round(col("resid").cast("double")
          / (col("n_u") + lit(10L)).cast("double")).cast("long")
          .as("bu_e6"))
    val sse = r.crossJoin(broadcast(mu))
      .join(broadcast(bi.select(col("b"), col("bi_e6"))), Seq("b"))
      .join(bu, Seq("u"))
      .agg(count(lit(1)).as("n"),
        sum((col("re6") - col("mu_e6") - col("bi_e6") - col("bu_e6"))
          .cast(dec)
          * (col("re6") - col("mu_e6") - col("bi_e6") - col("bu_e6")))
          .as("sse"))
      .select(round(sqrt(col("sse").cast("double")
        / col("n").cast("double"))).cast("long").as("rmse_e6"))
    bi.crossJoin(broadcast(mu)).crossJoin(broadcast(sse))
      .select(col("b").as("brand"), col("n_i"), col("bi_e6"),
        col("mu_e6"), col("rmse_e6"))
      .orderBy(col("brand"))
  }

  private val q484Sql =
    """WITH r AS (
      |  SELECT o_custkey AS u, p_brand AS b,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) * 1000000 AS BIGINT)
      |      AS re6
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |  GROUP BY o_custkey, p_brand),
      |mu AS (
      |  SELECT CAST(round(CAST(sum(CAST(re6 AS HUGEINT)) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mu_e6
      |  FROM r),
      |bi AS (
      |  SELECT b, CAST(count(*) AS BIGINT) AS n_i,
      |    CAST(round(CAST(sum(CAST(re6 - mu_e6 AS HUGEINT)) AS DOUBLE)
      |      / CAST(count(*) + 25 AS DOUBLE)) AS BIGINT) AS bi_e6
      |  FROM r CROSS JOIN mu GROUP BY b),
      |bu AS (
      |  SELECT u,
      |    CAST(round(CAST(sum(CAST(re6 - mu_e6 - bi_e6 AS HUGEINT))
      |        AS DOUBLE)
      |      / CAST(count(*) + 10 AS DOUBLE)) AS BIGINT) AS bu_e6
      |  FROM r CROSS JOIN mu JOIN bi USING (b) GROUP BY u),
      |sse AS (
      |  SELECT CAST(round(sqrt(
      |      CAST(sum(CAST(re6 - mu_e6 - bi_e6 - bu_e6 AS HUGEINT)
      |        * (re6 - mu_e6 - bi_e6 - bu_e6)) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE))) AS BIGINT) AS rmse_e6
      |  FROM r CROSS JOIN mu JOIN bi USING (b) JOIN bu USING (u))
      |SELECT b AS brand, n_i, bi_e6, mu_e6, rmse_e6
      |FROM bi CROSS JOIN mu CROSS JOIN sse
      |ORDER BY brand""".stripMargin

  // ---------------------------------------------------------------------
  // q485 — MacQueen ONLINE k-means (K = 2, 1-D) over the daily
  // revenue series: each day in order assigns to the nearer centroid
  // and moves it to the count-weighted running mean — MacQueen's
  // one-point-one-update online variant, where q470 is Lloyd's batch
  // variant; the two are the classic k-means execution disciplines.
  // The walk is sequential BY DEFINITION, so it runs as the q442
  // single-partition pattern: only the pinned, raise_error-guarded
  // (≤1000 rows) day grain funnels into one partition, never fact
  // rows, and the recurrence is the SHARED
  // [[graft.streaming.TwsKmeans.step]] the streaming twin (q486)
  // executes — the two engines and the two execution modes all face
  // one recursive-CTE oracle.
  // ---------------------------------------------------------------------
  private def dayRevL(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts_s")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long")
        .as("d"), col("y"))
      .pin()

  private def q485(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.streaming.TwsKmeans
    val day = dayRevL(s, dir)
    val cnt = day.agg(count(lit(1)).as("n_days"))
    val guarded = day.crossJoin(broadcast(cnt))
      .select(
        when(col("n_days") <= 1000L, col("d"))
          .otherwise(raise_error(concat(
            lit("macqueenWalk: day grain exceeded 1000 ("),
            col("n_days").cast("string"),
            lit(") — aggregate to a coarser grain or raise the bound " +
              "explicitly.")))).as("d"),
        col("y"))
    guarded.as[(Long, Long)].repartition(1)
      .sortWithinPartitions("d")
      .mapPartitions { it =>
        val a = it.toArray
        if (a.length < 2) Iterator.empty
        else {
          var w = TwsKmeans.KmWalk(a(0)._2, 1L, a(1)._2, 1L,
            started = true, hasFirst = true, a(0)._1, a(0)._2)
          val out =
            Array.newBuilder[(Long, Long, Long, Long, Long, Long, Long)]
          out += ((a(0)._1, a(0)._2, 1L, w.c1, w.n1, w.c2, w.n2))
          out += ((a(1)._1, a(1)._2, 2L, w.c1, w.n1, w.c2, w.n2))
          var t = 2
          while (t < a.length) {
            val (d, y) = a(t)
            val (k, w2) = TwsKmeans.step(w, y)
            w = w2
            out += ((d, y, k, w.c1, w.n1, w.c2, w.n2))
            t += 1
          }
          out.result().iterator
        }
      }
      .toDF("d", "y", "k", "c1", "n1", "c2", "n2")
      .orderBy("d")
  }

  private val q485Sql =
    """WITH RECURSIVE day AS (
      |  SELECT CAST(CAST(date_trunc('second', ts) AS DATE)
      |      - DATE '1970-01-01' AS BIGINT) AS d,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY 1),
      |ranked AS (SELECT d, y,
      |  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS r FROM day),
      |walk(r, d, y, k, c1, n1, c2, n2) AS (
      |  SELECT r1.r, r1.d, r1.y, CAST(1 AS BIGINT), r1.y,
      |    CAST(1 AS BIGINT), r2.y, CAST(1 AS BIGINT)
      |  FROM ranked r1 JOIN ranked r2 ON r1.r = 1 AND r2.r = 2
      |  UNION ALL
      |  SELECT n.r, n.d, n.y,
      |    CASE WHEN n.r = 2 THEN 2
      |      WHEN abs(n.y - w.c1) <= abs(n.y - w.c2) THEN 1
      |      ELSE 2 END,
      |    CASE WHEN n.r = 2 THEN w.c1
      |      WHEN abs(n.y - w.c1) <= abs(n.y - w.c2)
      |        THEN CAST(round(CAST(w.c1 * w.n1 + n.y AS DOUBLE)
      |          / CAST(w.n1 + 1 AS DOUBLE)) AS BIGINT)
      |      ELSE w.c1 END,
      |    CASE WHEN n.r = 2 THEN w.n1
      |      WHEN abs(n.y - w.c1) <= abs(n.y - w.c2) THEN w.n1 + 1
      |      ELSE w.n1 END,
      |    CASE WHEN n.r = 2 THEN w.c2
      |      WHEN abs(n.y - w.c1) <= abs(n.y - w.c2) THEN w.c2
      |      ELSE CAST(round(CAST(w.c2 * w.n2 + n.y AS DOUBLE)
      |        / CAST(w.n2 + 1 AS DOUBLE)) AS BIGINT) END,
      |    CASE WHEN n.r = 2 THEN w.n2
      |      WHEN abs(n.y - w.c1) <= abs(n.y - w.c2) THEN w.n2
      |      ELSE w.n2 + 1 END
      |  FROM walk w JOIN ranked n ON n.r = w.r + 1)
      |SELECT d, y, k, c1, n1, c2, n2 FROM walk ORDER BY d""".stripMargin

  // ---------------------------------------------------------------------
  // q486 — the STREAMING twin of q485 (transformWithState): the same
  // MacQueen recurrence — literally the same [[TwsKmeans.step]]
  // function — executed as days CLOSE in event time (per-day sums in
  // MapState, boundary timers drain closed days in order). Gated
  // against the SAME recursive-CTE oracle as the batch walk, so
  // batch, stream, and DuckDB triangulate one semantics (the q455
  // stream-Holt discipline).
  // ---------------------------------------------------------------------
  private def q486(s: SparkSession, dir: String): DataFrame =
    graft.streaming.TwsKmeans.replayFromParquet(s, s"$dir/events.parquet")
      .orderBy(col("d"))

  // ---------------------------------------------------------------------
  // q487 — greedy facility-location data selection (submodular
  // max-coverage, k = 5): pick the five documents that together
  // cover the most distinct 3-gram shingles — the coverage-based
  // subset-selection primitive LLM curation uses to choose a small
  // representative corpus slice. Lazy-greedy is inherently
  // sequential in k, so the loop runs k BOUNDED rounds, each ONE
  // distributed aggregate: per-doc marginal gain = |S_d \ covered|
  // via an anti-join against the broadcast covered set (≤ the
  // selected docs' shingles — small by construction), then a
  // TakeOrdered argmax with doc-id tiebreak. The 1−1/e guarantee is
  // the textbook one; the plan shape is k scans of the pinned
  // shingle table, never a doc × doc join.
  // ---------------------------------------------------------------------
  private def q487(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(Text.words(col("text")))
        .as(Seq("p", "w")))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val sh = toks
      .withColumn("w1", lead(col("w"), 1).over(wDoc))
      .withColumn("w2", lead(col("w"), 2).over(wDoc))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"),
        graft.functions.PortableHash.hash60(
          concat_ws(" ", col("w"), col("w1"), col("w2"))).as("h"))
      .distinct().pin()
    var covered: DataFrame = null // grows by ≤ one doc's shingles/round
    var picks = Seq.empty[(Long, Long, Long, Long)]
    var totalCovered = 0L
    (1 to 5).foreach { round =>
      val remaining = picks.map(_._2) match {
        case sel if sel.nonEmpty => sh.filter(!col("doc_id").isin(sel: _*))
        case _ => sh
      }
      val uncovered = covered match {
        case null => remaining
        case c => remaining.join(broadcast(c), Seq("h"), "left_anti")
      }
      val gains = uncovered.groupBy("doc_id")
        .agg(count(lit(1)).as("gain"))
      val win = gains.orderBy(col("gain").desc, col("doc_id").asc)
        .limit(1).collect().headOption
      win.foreach { r =>
        val doc = r.getAs[Long]("doc_id"); val g = r.getAs[Long]("gain")
        totalCovered += g
        picks :+= ((round.toLong, doc, g, totalCovered))
        val newCov = sh.filter(col("doc_id") === doc).select("h")
        covered = if (covered == null) newCov
          else covered.unionByName(newCov).distinct()
        covered = covered.pin()
      }
    }
    import s.implicits._
    picks.toDF("round", "doc_id", "gain", "covered_total")
      .orderBy("round")
  }

  private val q487Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "concat_ws(' ', w, w1, w2)")
    // five unrolled greedy rounds; wN = the round-N winner, covN =
    // the union of winners' shingles through round N
    // MATERIALIZED + ANTI JOIN are load-bearing: without them DuckDB
    // re-inlines the whole cov-chain into every round's NOT IN and
    // the oracle goes quadratic-in-rounds over the shingle table
    // (observed: >7 min at sf1 vs seconds materialized)
    def round(n: Int): String = {
      val prevSel = (1 until n).map(i => s"SELECT doc_id FROM w$i")
        .mkString(" UNION ALL ")
      val src =
        if (n == 1) "sh"
        else s"(FROM sh ANTI JOIN cov${n - 1} USING (h)\n" +
          s"         |    WHERE doc_id NOT IN ($prevSel))"
      s"""g$n AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
         |  FROM $src
         |  GROUP BY doc_id),
         |w$n AS (SELECT doc_id, gain FROM g$n
         |  ORDER BY gain DESC, doc_id ASC LIMIT 1),
         |cov$n AS MATERIALIZED (
         |  ${if (n == 1) "SELECT DISTINCT h FROM sh JOIN w1 USING (doc_id)"
            else s"SELECT h FROM cov${n - 1} UNION " +
              s"SELECT h FROM sh JOIN w$n USING (doc_id)"})""".stripMargin
    }
    s"""WITH toks AS (
      |  SELECT doc_id, CAST(q.p AS BIGINT) AS p, q.w AS w FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(len(ws)),
      |        i -> {'p': i, 'w': ws[i+1]})) AS q
      |    FROM (SELECT doc_id, list_filter(string_split(text, ' '),
      |      x -> length(x) > 0) AS ws FROM documents))),
      |sh AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, $h AS h FROM (
      |    SELECT doc_id, p, w,
      |      lead(w, 1) OVER dw AS w1, lead(w, 2) OVER dw AS w2
      |    FROM toks WINDOW dw AS (PARTITION BY doc_id ORDER BY p))
      |  WHERE w2 IS NOT NULL),
      |${(1 to 5).map(round).mkString(",\n")}
      |SELECT r.round, r.doc_id, r.gain,
      |  CAST(sum(r.gain) OVER (ORDER BY r.round) AS BIGINT)
      |    AS covered_total
      |FROM (
      |  SELECT CAST(1 AS BIGINT) AS round, doc_id, gain FROM w1
      |  UNION ALL SELECT CAST(2 AS BIGINT), doc_id, gain FROM w2
      |  UNION ALL SELECT CAST(3 AS BIGINT), doc_id, gain FROM w3
      |  UNION ALL SELECT CAST(4 AS BIGINT), doc_id, gain FROM w4
      |  UNION ALL SELECT CAST(5 AS BIGINT), doc_id, gain FROM w5) r
      |ORDER BY r.round""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q488 — confident-learning label-noise screen on the Rocchio
  // scores: for every doc the margin between its best-scoring lang
  // centroid and its OWN label's centroid — a large positive margin
  // with pred ≠ true is exactly the "likely mislabeled" signal of
  // Northcutt's confident learning. Reuses q481's train-and-score
  // shape verbatim (integer TF-IDF, unnormalized centroids, one
  // identical cosine chain), adds the per-doc true-label score
  // lookup, e6-rounds the margin AT THE DOC ROW, and emits the
  // top-20 suspects (margin desc, doc_id asc).
  // ---------------------------------------------------------------------
  private def q488(s: SparkSession, dir: String): DataFrame = {
    val v = 50
    val words = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(Text.words(col("text"))).as("wd"))
      .pin()
    val vocab = words.groupBy("wd").agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("wd").asc).limit(v)
      .select(col("wd"))
    val nDocs = t(s, dir, "documents").agg(count(lit(1)).as("nd"))
    val idf = words.join(broadcast(vocab), Seq("wd"))
      .groupBy("wd").agg(countDistinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("wd"),
        round(log(col("nd").cast("double") / col("df").cast("double"))
          * 1000000.0).cast("long").as("idf_e6"))
    val docw = words.join(broadcast(vocab), Seq("wd"))
      .groupBy("doc_id", "lang", "wd").agg(count(lit(1)).as("tf"))
      .join(broadcast(idf), Seq("wd"))
      .select(col("doc_id"), col("lang"), col("wd"),
        (col("tf") * col("idf_e6")).as("w"))
      .pin()
    val cent = docw.groupBy(col("lang").as("cl"), col("wd"))
      .agg(sum(col("w").cast(dec)).as("c"))
    val nc2 = cent.groupBy("cl").agg(sum(col("c") * col("c")).as("nc2"))
    val nd2 = docw.groupBy("doc_id")
      .agg(sum(col("w").cast(dec) * col("w")).as("nd2"))
    val scored = docw.join(broadcast(cent), Seq("wd"))
      .groupBy("doc_id", "lang", "cl")
      .agg(sum(col("w").cast(dec) * col("c")).as("dot"))
      .join(nd2, Seq("doc_id"))
      .join(broadcast(nc2), Seq("cl"))
      .withColumn("score_e6",
        round(col("dot").cast("double")
          / sqrt(col("nd2").cast("double") * col("nc2").cast("double"))
          * 1000000.0).cast("long"))
    val best = scored.groupBy("doc_id")
      .agg(max(col("score_e6")).as("ms"))
    val pred = scored.join(best, Seq("doc_id"))
      .filter(col("score_e6") === col("ms"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(min(col("cl")).as("pred_lang"), min(col("ms")).as("best_e6"))
    val own = scored.filter(col("cl") === col("lang"))
      .select(col("doc_id"), col("score_e6").as("own_e6"))
    pred.join(own, Seq("doc_id"))
      .filter(col("pred_lang") =!= col("lang"))
      .select(col("doc_id"), col("lang").as("true_lang"),
        col("pred_lang"), (col("best_e6") - col("own_e6")).as("margin_e6"))
      .orderBy(col("margin_e6").desc, col("doc_id").asc)
      .limit(20)
  }

  private val q488Sql =
    """WITH words AS (
      |  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '),
      |    w -> length(w) > 0)) AS wd
      |  FROM documents),
      |vocab AS (
      |  SELECT wd FROM (
      |    SELECT wd, count(*) AS cf FROM words GROUP BY wd
      |    ORDER BY cf DESC, wd ASC LIMIT 50)),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
      |idf AS (
      |  SELECT wd, CAST(round(ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE))
      |      * 1000000.0) AS BIGINT) AS idf_e6
      |  FROM (SELECT wd, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |    FROM words JOIN vocab USING (wd) GROUP BY wd)
      |  CROSS JOIN nd),
      |docw AS (
      |  SELECT doc_id, lang, wd, tf * idf_e6 AS w FROM (
      |    SELECT doc_id, lang, wd, CAST(count(*) AS BIGINT) AS tf
      |    FROM words JOIN vocab USING (wd) GROUP BY doc_id, lang, wd)
      |  JOIN idf USING (wd)),
      |cent AS (
      |  SELECT lang AS cl, wd, sum(CAST(w AS HUGEINT)) AS c
      |  FROM docw GROUP BY lang, wd),
      |nc2 AS (SELECT cl, sum(c * c) AS nc2 FROM cent GROUP BY cl),
      |nd2 AS (
      |  SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS nd2
      |  FROM docw GROUP BY doc_id),
      |scored AS (
      |  SELECT doc_id, lang, cl,
      |    CAST(round(CAST(dot AS DOUBLE)
      |      / sqrt(CAST(nd2 AS DOUBLE) * CAST(nc2 AS DOUBLE))
      |      * 1000000.0) AS BIGINT) AS score_e6
      |  FROM (
      |    SELECT doc_id, lang, cl, sum(CAST(w AS HUGEINT) * c) AS dot
      |    FROM docw JOIN cent USING (wd)
      |    GROUP BY doc_id, lang, cl)
      |  JOIN nd2 USING (doc_id) JOIN nc2 USING (cl)),
      |best AS (SELECT doc_id, max(score_e6) AS ms
      |  FROM scored GROUP BY doc_id),
      |pred AS (
      |  SELECT scored.doc_id, lang, min(cl) AS pred_lang,
      |    min(ms) AS best_e6
      |  FROM scored JOIN best ON scored.doc_id = best.doc_id
      |    AND score_e6 = ms
      |  GROUP BY scored.doc_id, lang),
      |own AS (
      |  SELECT doc_id, score_e6 AS own_e6 FROM scored WHERE cl = lang)
      |SELECT pred.doc_id, lang AS true_lang, pred_lang,
      |  best_e6 - own_e6 AS margin_e6
      |FROM pred JOIN own ON pred.doc_id = own.doc_id
      |WHERE pred_lang <> lang
      |ORDER BY margin_e6 DESC, pred.doc_id ASC
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q489 — one-shot model averaging (the FedAvg/parameter-averaging
  // tradeoff, exactly): eight hash shards each train a TWO-epoch
  // batch perceptron locally (after epoch 2 the shard models diverge
  // nonlinearly — their misclassified sets differ), the averaged
  // model w̄ = round(Σw_s/8) competes against the full-batch
  // two-epoch model, and ALL TEN models evaluate in ONE data pass
  // (events × broadcast 10-row model table). Everything is integer
  // except the one rounding division in the average. The readout IS
  // the distributed-training lesson: local epochs are cheap but
  // averaging is not equivalent to batch training.
  // ---------------------------------------------------------------------
  private def q489(s: SparkSession, dir: String): DataFrame = {
    val f = Tables.eventsSec(s, dir).select(
        when(col("event_type") === "purchase", 1L).otherwise(-1L).as("y"),
        lit(1L).as("x0"),
        hour(col("ts_s")).cast("long").as("x1"),
        pmod(expr("CAST(datediff(to_date(ts_s), DATE '1970-01-01') AS BIGINT)"),
          lit(7L)).as("x2"),
        (((round(col("value") * 100).cast("long")
          - pmod(round(col("value") * 100).cast("long"), lit(10000L)))
          / lit(10000L)).cast("long")).as("x3"),  // floor-div, see q469
        (graft.functions.PortableHash.hash60(
          concat(lit("fa:"), col("event_id").cast("string")))
          % 8L).as("sh"))
      .pin()
    // local epoch 1: from w=0 every row is misclassified per shard
    val w1 = f.groupBy("sh").agg(
      sum((col("y") * col("x0")).cast(dec)).as("w0"),
      sum((col("y") * col("x1")).cast(dec)).as("w1"),
      sum((col("y") * col("x2")).cast(dec)).as("w2"),
      sum((col("y") * col("x3")).cast(dec)).as("w3"))
      .select(col("sh"), col("w0").cast("long").as("w0"),
        col("w1").cast("long").as("w1"), col("w2").cast("long").as("w2"),
        col("w3").cast("long").as("w3"))
    // local epoch 2: margins against the own shard's w1
    val w2 = f.join(broadcast(w1.select(col("sh"),
        col("w0").as("p0"), col("w1").as("p1"),
        col("w2").as("p2"), col("w3").as("p3"))), Seq("sh"))
      .withColumn("__mis",
        col("y") * (col("p0") * col("x0") + col("p1") * col("x1")
          + col("p2") * col("x2") + col("p3") * col("x3")) <= 0L)
      .groupBy("sh").agg(
        (first(col("p0")) + sum(when(col("__mis"), col("y") * col("x0"))
          .otherwise(0L).cast(dec)).cast("long")).as("w0"),
        (first(col("p1")) + sum(when(col("__mis"), col("y") * col("x1"))
          .otherwise(0L).cast(dec)).cast("long")).as("w1"),
        (first(col("p2")) + sum(when(col("__mis"), col("y") * col("x2"))
          .otherwise(0L).cast(dec)).cast("long")).as("w2"),
        (first(col("p3")) + sum(when(col("__mis"), col("y") * col("x3"))
          .otherwise(0L).cast(dec)).cast("long")).as("w3"))
      .pin()
    val avg = w2.agg(
      round(sum(col("w0")).cast("double") / 8.0).cast("long").as("w0"),
      round(sum(col("w1")).cast("double") / 8.0).cast("long").as("w1"),
      round(sum(col("w2")).cast("double") / 8.0).cast("long").as("w2"),
      round(sum(col("w3")).cast("double") / 8.0).cast("long").as("w3"))
      .select(lit("avg").as("model"), col("w0"), col("w1"), col("w2"),
        col("w3"))
    // full-batch two-epoch twin (the q469 recurrence, epochs 1-2)
    val g1 = f.agg(
      sum((col("y") * col("x0")).cast(dec)).as("w0"),
      sum((col("y") * col("x1")).cast(dec)).as("w1"),
      sum((col("y") * col("x2")).cast(dec)).as("w2"),
      sum((col("y") * col("x3")).cast(dec)).as("w3"))
      .select(col("w0").cast("long").as("w0"),
        col("w1").cast("long").as("w1"), col("w2").cast("long").as("w2"),
        col("w3").cast("long").as("w3"))
    val g2 = f.crossJoin(broadcast(g1.select(
        col("w0").as("p0"), col("w1").as("p1"),
        col("w2").as("p2"), col("w3").as("p3"))))
      .withColumn("__mis",
        col("y") * (col("p0") * col("x0") + col("p1") * col("x1")
          + col("p2") * col("x2") + col("p3") * col("x3")) <= 0L)
      .agg(
        (first(col("p0")) + sum(when(col("__mis"), col("y") * col("x0"))
          .otherwise(0L).cast(dec)).cast("long")).as("w0"),
        (first(col("p1")) + sum(when(col("__mis"), col("y") * col("x1"))
          .otherwise(0L).cast(dec)).cast("long")).as("w1"),
        (first(col("p2")) + sum(when(col("__mis"), col("y") * col("x2"))
          .otherwise(0L).cast(dec)).cast("long")).as("w2"),
        (first(col("p3")) + sum(when(col("__mis"), col("y") * col("x3"))
          .otherwise(0L).cast(dec)).cast("long")).as("w3"))
      .select(lit("full").as("model"), col("w0"), col("w1"), col("w2"),
        col("w3"))
    val models = w2
      .select(concat(lit("shard"), col("sh").cast("string")).as("model"),
        col("w0"), col("w1"), col("w2"), col("w3"))
      .unionByName(avg).unionByName(g2)
    val evaled = f.crossJoin(broadcast(models.select(
        col("model").as("m"), col("w0").as("e0"), col("w1").as("e1"),
        col("w2").as("e2"), col("w3").as("e3"))))
      .withColumn("__mis",
        col("y") * (col("e0") * col("x0") + col("e1") * col("x1")
          + col("e2") * col("x2") + col("e3") * col("x3")) <= 0L)
      .groupBy(col("m").as("model"))
      .agg(sum(when(col("__mis"), 1L).otherwise(0L)).as("n_mis"))
    models.join(evaled, Seq("model"))
      .select(col("model"), col("w0"), col("w1"), col("w2"), col("w3"),
        col("n_mis"))
      .orderBy(col("model"))
  }

  private val q489Sql = {
    val h = graft.functions.PortableHash.hash60DuckSql(
      "concat('fa:', CAST(event_id AS VARCHAR))")
    s"""WITH f AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS y,
      |    CAST(1 AS BIGINT) AS x0,
      |    CAST(hour(date_trunc('second', ts)) AS BIGINT) AS x1,
      |    CAST(date_diff('day', DATE '1970-01-01',
      |      CAST(date_trunc('second', ts) AS DATE)) % 7 AS BIGINT) AS x2,
      |    CAST(round(value * 100) AS BIGINT) // 10000 AS x3,
      |    $h % 8 AS sh
      |  FROM events),
      |w1 AS (
      |  SELECT sh, CAST(sum(y * x0) AS BIGINT) AS w0,
      |    CAST(sum(y * x1) AS BIGINT) AS w1,
      |    CAST(sum(y * x2) AS BIGINT) AS w2,
      |    CAST(sum(y * x3) AS BIGINT) AS w3
      |  FROM f GROUP BY sh),
      |m2 AS (
      |  SELECT f.*, w1.w0 AS p0, w1.w1 AS p1, w1.w2 AS p2, w1.w3 AS p3,
      |    (y * (w1.w0*x0 + w1.w1*x1 + w1.w2*x2 + w1.w3*x3) <= 0) AS mis
      |  FROM f JOIN w1 USING (sh)),
      |w2 AS (
      |  SELECT sh,
      |    CAST(any_value(p0)
      |      + sum(CASE WHEN mis THEN y * x0 ELSE 0 END) AS BIGINT) AS w0,
      |    CAST(any_value(p1)
      |      + sum(CASE WHEN mis THEN y * x1 ELSE 0 END) AS BIGINT) AS w1,
      |    CAST(any_value(p2)
      |      + sum(CASE WHEN mis THEN y * x2 ELSE 0 END) AS BIGINT) AS w2,
      |    CAST(any_value(p3)
      |      + sum(CASE WHEN mis THEN y * x3 ELSE 0 END) AS BIGINT) AS w3
      |  FROM m2 GROUP BY sh),
      |avgm AS (
      |  SELECT 'avg' AS model,
      |    CAST(round(CAST(sum(w0) AS DOUBLE) / 8.0) AS BIGINT) AS w0,
      |    CAST(round(CAST(sum(w1) AS DOUBLE) / 8.0) AS BIGINT) AS w1,
      |    CAST(round(CAST(sum(w2) AS DOUBLE) / 8.0) AS BIGINT) AS w2,
      |    CAST(round(CAST(sum(w3) AS DOUBLE) / 8.0) AS BIGINT) AS w3
      |  FROM w2),
      |g1 AS (
      |  SELECT CAST(sum(y * x0) AS BIGINT) AS w0,
      |    CAST(sum(y * x1) AS BIGINT) AS w1,
      |    CAST(sum(y * x2) AS BIGINT) AS w2,
      |    CAST(sum(y * x3) AS BIGINT) AS w3
      |  FROM f),
      |gm2 AS (
      |  SELECT f.*, g1.w0 AS p0, g1.w1 AS p1, g1.w2 AS p2, g1.w3 AS p3,
      |    (y * (g1.w0*x0 + g1.w1*x1 + g1.w2*x2 + g1.w3*x3) <= 0) AS mis
      |  FROM f CROSS JOIN g1),
      |g2 AS (
      |  SELECT 'full' AS model,
      |    CAST(any_value(p0)
      |      + sum(CASE WHEN mis THEN y * x0 ELSE 0 END) AS BIGINT) AS w0,
      |    CAST(any_value(p1)
      |      + sum(CASE WHEN mis THEN y * x1 ELSE 0 END) AS BIGINT) AS w1,
      |    CAST(any_value(p2)
      |      + sum(CASE WHEN mis THEN y * x2 ELSE 0 END) AS BIGINT) AS w2,
      |    CAST(any_value(p3)
      |      + sum(CASE WHEN mis THEN y * x3 ELSE 0 END) AS BIGINT) AS w3
      |  FROM gm2),
      |models AS (
      |  SELECT concat('shard', CAST(sh AS VARCHAR)) AS model,
      |    w0, w1, w2, w3 FROM w2
      |  UNION ALL SELECT model, w0, w1, w2, w3 FROM avgm
      |  UNION ALL SELECT model, w0, w1, w2, w3 FROM g2),
      |evaled AS (
      |  SELECT model, CAST(sum(CASE WHEN
      |      y * (m.w0*x0 + m.w1*x1 + m.w2*x2 + m.w3*x3) <= 0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_mis
      |  FROM f CROSS JOIN models m
      |  GROUP BY model)
      |SELECT models.model, w0, w1, w2, w3, n_mis
      |FROM models JOIN evaled USING (model)
      |ORDER BY models.model""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q467_naive_bayes" -> (q467 _),
    "q468_decision_stump" -> (q468 _),
    "q469_batch_perceptron" -> (q469 _),
    "q470_kmeans_lloyd" -> (q470 _),
    "q471_jackknife_ratio" -> (q471 _),
    "q472_cem_att" -> (q472 _),
    "q473_grid_dbscan" -> (q473 _),
    "q474_minimizer_sketch" -> (q474 _),
    "q475_repeated_spans" -> (q475 _),
    "q476_gbdt_rounds" -> (q476 _),
    "q477_weighted_sample" -> (q477 _),
    "q478_pca_power" -> (q478 _),
    "q479_ridge_cramer" -> (q479 _),
    "q480_learning_curve" -> (q480 _),
    "q481_rocchio_tfidf" -> (q481 _),
    "q482_bagged_stumps" -> (q482 _),
    "q483_als_alternation" -> (q483 _),
    "q484_bias_baseline" -> (q484 _),
    "q485_macqueen_walk" -> (q485 _),
    "q486_stream_macqueen" -> (q486 _),
    "q487_greedy_coverage" -> (q487 _),
    "q488_label_noise" -> (q488 _),
    "q489_model_averaging" -> (q489 _))

  val oracle: Map[String, String] = Map(
    "q467_naive_bayes" -> q467Sql,
    "q468_decision_stump" -> q468Sql,
    "q469_batch_perceptron" -> q469Sql,
    "q470_kmeans_lloyd" -> q470Sql,
    "q471_jackknife_ratio" -> q471Sql,
    "q472_cem_att" -> q472Sql,
    "q473_grid_dbscan" -> q473Sql,
    "q474_minimizer_sketch" -> q474Sql,
    "q475_repeated_spans" -> q475Sql,
    "q476_gbdt_rounds" -> q476Sql,
    "q477_weighted_sample" -> q477Sql,
    "q478_pca_power" -> q478Sql,
    "q479_ridge_cramer" -> q479Sql,
    "q480_learning_curve" -> q480Sql,
    "q481_rocchio_tfidf" -> q481Sql,
    "q482_bagged_stumps" -> q482Sql,
    "q483_als_alternation" -> q483Sql,
    "q484_bias_baseline" -> q484Sql,
    "q485_macqueen_walk" -> q485Sql,
    "q486_stream_macqueen" -> q485Sql,
    "q487_greedy_coverage" -> q487Sql,
    "q488_label_noise" -> q488Sql,
    "q489_model_averaging" -> q489Sql)
}
