package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Distribution-shift / effect-size / multiple-testing tier
  * (session 10): the statistical machinery a training-data platform
  * runs when two corpus snapshots, two cohorts, or two model feeds
  * must be compared DISTRIBUTIONALLY rather than by point summaries —
  * the natural next ring around round 8's model-quality tier (KS,
  * CUSUM, PSI) and round 9's testing tier (χ², JS, McNemar).
  * No reference analogue (the reference delegates all analytics to
  * SQL; /root/reference/README.md:1-3).
  *
  * New statistics, none previously in the gate: Wasserstein-1
  * (earth-mover), Cramér–von Mises two-sample, energy distance,
  * Brown–Forsythe (Levene, median-centered), Kruskal–Wallis H,
  * Benjamini–Hochberg step-up selection, Page–Hinkley sequential
  * drift, ERR@10 (dyadic cascade), Grubbs max-outlier, Tukey-fence
  * outlier audit, Cohen's d, and the Hodges–Lehmann shift estimator.
  *
  * Cross-engine discipline as everywhere in the gate: per-row e2/e4
  * quantization, exact long/decimal(38,0) integer reductions (HUGEINT
  * in the oracle), per-row ln/÷ only rounded AT THE ROW before any
  * cross-row sum (the q375 precedent), readout chains of IEEE ops in
  * IDENTICAL operation order on both engines (the q261 precedent),
  * unique-tiebreak ORDER BY, no Decimal/Float in final schemas.
  *
  * Scale posture: every distribution statistic here reduces to the
  * DISTINCT-VALUE grain first (counts per e2-quantized value — the
  * q260/q380 argument: bounded by the value UNIVERSE, not data
  * volume), so the cumulative windows run over ≤10⁵ rows no matter
  * how many trillions of events fed them; the map-side partial
  * aggregation does the heavy lifting. Pairwise constructions
  * (Hodges–Lehmann) run on the DAY grain with a loud tripwire.
  */
object Shift {

  private val dec = "decimal(38,0)"

  /** The ONE unpartitioned-window site for this module (allowlisted in
    * PlanQualitySpec's source lint with this argument): every use runs
    * over a DISTINCT-VALUE table (e2 cents universe ≤ ~10⁵ rows,
    * n_chars universe ≤ ~10³ rows), a day-grain table (observation
    * span), or a (source × lang) hypothesis enumeration — all bounded
    * by a domain/universe, never by data volume. */
  private def axis(sort: Column*) = Window.orderBy(sort: _*)

  /** click-vs-view per-distinct-value counts of e2-quantized event
    * value: the shared reduction for q405/q406/q407. One fact scan,
    * map-side combine to the value-universe grain. */
  private def cvCounts(s: SparkSession, dir: String): DataFrame =
    Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("v")
      .agg(sum((col("event_type") === "click").cast("long")).as("ca"),
        sum((col("event_type") === "view").cast("long")).as("cb"))

  private val cvCountsSql =
    """SELECT CAST(round(value * 100) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS cb
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q405 — Wasserstein-1 (earth-mover) distance between the click and
  // view value distributions: W₁ = ∫|F_A − F_B| dx, computed exactly
  // on the e2-quantized value axis as Σ_v |cumA(v)·nB − cumB(v)·nA| ·
  // (next_v − v) in decimal(38,0) (the cross-multiplied form clears
  // both denominators), ONE e6 division at the readout (descaling the
  // cents). The axis table is the distinct-value grain — bounded by
  // the e2 value universe, not event volume.
  // ---------------------------------------------------------------------
  private def q405(s: SparkSession, dir: String): DataFrame = {
    val cnt = cvCounts(s, dir)
    val tot = cnt.agg(sum("ca").as("na"), sum("cb").as("nb"),
      count(lit(1)).as("n_support"))
    val wc = axis(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val wl = axis(col("v"))
    val cum = cnt
      .withColumn("cuma", sum("ca").over(wc))
      .withColumn("cumb", sum("cb").over(wc))
      .withColumn("dv", lead(col("v"), 1).over(wl) - col("v"))
    cum.crossJoin(broadcast(tot))
      .groupBy("na", "nb", "n_support")
      .agg(sum(abs(col("cuma").cast(dec) * col("nb")
          - col("cumb").cast(dec) * col("na")) * col("dv")).as("mass"))
      .select(col("na"), col("nb"), col("n_support"),
        round(col("mass").cast("double")
          / (col("na").cast("double") * col("nb").cast("double") * 100.0)
          * 1000000.0).cast("long").as("w1_e6"))
      .orderBy("na")
  }

  private val q405Sql =
    s"""WITH cnt AS (
       |  $cvCountsSql),
       |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
       |  CAST(sum(cb) AS BIGINT) AS nb, count(*) AS n_support FROM cnt),
       |cum AS (
       |  SELECT v, ca, cb,
       |    CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
       |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
       |    CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
       |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb,
       |    lead(v) OVER (ORDER BY v) - v AS dv
       |  FROM cnt)
       |SELECT na, nb, n_support,
       |  CAST(round(CAST(sum(abs(CAST(cuma AS HUGEINT) * nb
       |      - CAST(cumb AS HUGEINT) * na) * dv) AS DOUBLE)
       |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * 100.0)
       |    * 1000000.0) AS BIGINT) AS w1_e6
       |FROM cum CROSS JOIN tot
       |GROUP BY na, nb, n_support
       |ORDER BY na""".stripMargin

  // ---------------------------------------------------------------------
  // q406 — Cramér–von Mises two-sample statistic between the same two
  // value distributions: T = nm/(n+m)² · Σ_points (F_n − G_m)², the
  // ECDF-difference functional evaluated at every combined sample
  // point (each distinct value weighted by its multiplicity ca+cb).
  // The inner sum clears denominators: Σ (ca+cb)·(cumA·nb − cumB·na)²
  // runs in decimal(38,0); T is ONE e9 division (S / (na·nb·N²)).
  // Complements q-KS (sup-norm) with the integrated-square norm, which
  // is sensitive to distributed small shifts KS misses.
  // ---------------------------------------------------------------------
  private def q406(s: SparkSession, dir: String): DataFrame = {
    val cnt = cvCounts(s, dir)
    val tot = cnt.agg(sum("ca").as("na"), sum("cb").as("nb"),
      count(lit(1)).as("n_support"))
    val wc = axis(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = cnt
      .withColumn("cuma", sum("ca").over(wc))
      .withColumn("cumb", sum("cb").over(wc))
    cum.crossJoin(broadcast(tot))
      .groupBy("na", "nb", "n_support")
      .agg(sum({
        // parenthesized: a leading `-` on a continuation line would
        // otherwise parse as a discarded unary-minus statement
        val d = (col("cuma").cast(dec) * col("nb")
          - col("cumb").cast(dec) * col("na"))
        (col("ca") + col("cb")).cast(dec) * d * d
      }).as("ss"))
      .select(col("na"), col("nb"), col("n_support"),
        round(col("ss").cast("double")
          / (col("na").cast("double") * col("nb").cast("double")
            * (col("na") + col("nb")).cast("double")
            * (col("na") + col("nb")).cast("double"))
          * 1000000000.0).cast("long").as("t_e9"))
      .orderBy("na")
  }

  private val q406Sql =
    s"""WITH cnt AS (
       |  $cvCountsSql),
       |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
       |  CAST(sum(cb) AS BIGINT) AS nb, count(*) AS n_support FROM cnt),
       |cum AS (
       |  SELECT v, ca, cb,
       |    CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
       |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
       |    CAST(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
       |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
       |  FROM cnt)
       |SELECT na, nb, n_support,
       |  CAST(round(CAST(sum(CAST(ca + cb AS HUGEINT)
       |      * (CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
       |      * (CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na))
       |      AS DOUBLE)
       |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
       |      * CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE))
       |    * 1000000000.0) AS BIGINT) AS t_e9
       |FROM cum CROSS JOIN tot
       |GROUP BY na, nb, n_support
       |ORDER BY na""".stripMargin

  // ---------------------------------------------------------------------
  // q407 — energy distance between the same two distributions:
  // E = 2·E|X−Y| − E|X−X′| − E|Y−Y′|. Each pairwise-absolute-
  // difference mass is computed WITHOUT materializing pairs, from the
  // sorted value axis: Σ_{x,y}|x−y| = Σ_v c(v)·(v·C_below − S_below)
  // summed from both sides (strictly-below cumulants; ties contribute
  // zero). All three masses come out of ONE pass over the same
  // distinct-value table with four exclusive cumulative windows; the
  // readout clears denominators in decimal(38,0) and spends one e6
  // division. E = 0 iff the distributions are equal — the metric
  // property KS/CvM lack (they're only pseudo-metrics on ties).
  // ---------------------------------------------------------------------
  private def q407(s: SparkSession, dir: String): DataFrame = {
    val cnt = cvCounts(s, dir)
      .withColumn("sa", col("v") * col("ca"))
      .withColumn("sb", col("v") * col("cb"))
    val tot = cnt.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val wp = axis(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val cum = cnt
      .withColumn("cax", coalesce(sum("ca").over(wp), lit(0L)))
      .withColumn("cbx", coalesce(sum("cb").over(wp), lit(0L)))
      .withColumn("sax", coalesce(sum("sa").over(wp), lit(0L)))
      .withColumn("sbx", coalesce(sum("sb").over(wp), lit(0L)))
    val masses = cum.agg(
      sum(col("ca").cast(dec) * (col("v") * col("cbx") - col("sbx"))
        + col("cb").cast(dec) * (col("v") * col("cax") - col("sax")))
        .as("mab"),
      sum(col("ca").cast(dec) * (col("v") * col("cax") - col("sax")))
        .as("maa"),
      sum(col("cb").cast(dec) * (col("v") * col("cbx") - col("sbx")))
        .as("mbb"))
    masses.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        col("mab").cast("long").as("mass_ab"),
        col("maa").cast("long").as("mass_aa"),
        col("mbb").cast("long").as("mass_bb"),
        round((lit(2).cast(dec) * col("mab") * col("na") * col("nb")
          - lit(2).cast(dec) * col("maa") * col("nb") * col("nb")
          - lit(2).cast(dec) * col("mbb") * col("na") * col("na"))
          .cast("double")
          / (col("na").cast("double") * col("na").cast("double")
            * col("nb").cast("double") * col("nb").cast("double") * 100.0)
          * 1000000.0).cast("long").as("e_e6"))
      .orderBy("na")
  }

  private val q407Sql =
    s"""WITH cnt AS (
       |  SELECT v, ca, cb, v * ca AS sa, v * cb AS sb FROM (
       |  $cvCountsSql)),
       |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
       |  CAST(sum(cb) AS BIGINT) AS nb FROM cnt),
       |cum AS (
       |  SELECT v, ca, cb,
       |    COALESCE(CAST(sum(ca) OVER w AS BIGINT), 0) AS cax,
       |    COALESCE(CAST(sum(cb) OVER w AS BIGINT), 0) AS cbx,
       |    COALESCE(CAST(sum(sa) OVER w AS BIGINT), 0) AS sax,
       |    COALESCE(CAST(sum(sb) OVER w AS BIGINT), 0) AS sbx
       |  FROM cnt
       |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND 1 PRECEDING)),
       |m AS (
       |  SELECT
       |    sum(CAST(ca AS HUGEINT) * (v * cbx - sbx)
       |      + CAST(cb AS HUGEINT) * (v * cax - sax)) AS mab,
       |    sum(CAST(ca AS HUGEINT) * (v * cax - sax)) AS maa,
       |    sum(CAST(cb AS HUGEINT) * (v * cbx - sbx)) AS mbb
       |  FROM cum)
       |SELECT na, nb,
       |  CAST(mab AS BIGINT) AS mass_ab,
       |  CAST(maa AS BIGINT) AS mass_aa,
       |  CAST(mbb AS BIGINT) AS mass_bb,
       |  CAST(round(CAST(2 * mab * na * nb - 2 * maa * nb * nb
       |      - 2 * mbb * na * na AS DOUBLE)
       |    / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE)
       |      * CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * 100.0)
       |    * 1000000.0) AS BIGINT) AS e_e6
       |FROM m CROSS JOIN tot
       |ORDER BY na""".stripMargin

  // ---------------------------------------------------------------------
  // q408 — Brown–Forsythe test (Levene with median centering) of
  // n_chars spread homogeneity across sources: are all sources
  // equally dispersed, or did one source's length distribution blow
  // out? z_ij = |x_ij − med_i| (exact longs; the group median is the
  // LOWER median — rank (n+1) div 2 — so it is always an observed
  // integer value); F = ((N−k)/(k−1)) · SSB/SSW. Each group's S_i²/n_i
  // is ONE per-group division e6-rounded AT THE GROUP ROW (the q261
  // per-cell precedent), integer-summed; SSW stays fully exact
  // (10⁶·Σz² − Σt_i); F is one final readout division. Group count k
  // is the source domain — the rollup is broadcast-sized.
  // ---------------------------------------------------------------------
  private def q408(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("source"), col("n_chars").as("x"), col("doc_id"))
    val wr = Window.partitionBy("source").orderBy(col("x"), col("doc_id"))
    val wn = Window.partitionBy("source")
    val med = d
      .withColumn("rn", row_number().over(wr).cast("long"))
      .withColumn("ni", count(lit(1)).over(wn))
      .groupBy("source")
      .agg(min(when(col("rn") === expr("(ni + 1) div 2"), col("x")))
        .as("med"))
    val grp = d.join(med, "source")
      .select(col("source"), abs(col("x") - col("med")).as("z"))
      .groupBy("source")
      .agg(count(lit(1)).as("ni"), sum("z").as("si"),
        sum(col("z") * col("z")).as("qi"))
      .withColumn("ti", round(col("si").cast("double")
        * col("si").cast("double") / col("ni").cast("double")
        * 1000000.0).cast("long"))
    grp.agg(sum("ni").as("n"), count(lit(1)).as("k"), sum("si").as("sz"),
        sum("qi").as("q"), sum("ti").as("sum_ti"))
      .select(col("n").as("n_docs"), col("k").as("k_groups"),
        (col("sum_ti") - round(col("sz").cast("double")
          * col("sz").cast("double") / col("n").cast("double")
          * 1000000.0).cast("long")).as("ssb_e6"),
        (col("q") * lit(1000000L) - col("sum_ti")).as("ssw_e6"))
      .select(col("n_docs"), col("k_groups"), col("ssb_e6"), col("ssw_e6"),
        when(col("ssw_e6") > 0L,
          round(lit(1000000.0)
            * (col("n_docs") - col("k_groups")).cast("double")
            * col("ssb_e6").cast("double")
            / ((col("k_groups") - 1).cast("double")
              * col("ssw_e6").cast("double"))).cast("long"))
          .otherwise(lit(null).cast("long")).as("f_e6"))
      .orderBy("n_docs")
  }

  private val q408Sql =
    """WITH d AS (SELECT source, n_chars AS x, doc_id FROM documents),
      |ranked AS (
      |  SELECT source, x,
      |    row_number() OVER (PARTITION BY source ORDER BY x, doc_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY source) AS ni
      |  FROM d),
      |med AS (
      |  SELECT source, min(CASE WHEN rn = (ni + 1) // 2 THEN x END)
      |    AS med
      |  FROM ranked GROUP BY source),
      |grp AS (
      |  SELECT d.source, count(*) AS ni,
      |    CAST(sum(abs(d.x - med.med)) AS BIGINT) AS si,
      |    CAST(sum(abs(d.x - med.med) * abs(d.x - med.med)) AS BIGINT)
      |      AS qi
      |  FROM d JOIN med ON d.source = med.source GROUP BY d.source),
      |grp2 AS (
      |  SELECT *, CAST(round(CAST(si AS DOUBLE) * CAST(si AS DOUBLE)
      |    / CAST(ni AS DOUBLE) * 1000000.0) AS BIGINT) AS ti
      |  FROM grp),
      |tot AS (
      |  SELECT CAST(sum(ni) AS BIGINT) AS n, count(*) AS k,
      |    CAST(sum(si) AS BIGINT) AS sz, CAST(sum(qi) AS BIGINT) AS q,
      |    CAST(sum(ti) AS BIGINT) AS sum_ti
      |  FROM grp2),
      |parts AS (
      |  SELECT n AS n_docs, CAST(k AS BIGINT) AS k_groups,
      |    sum_ti - CAST(round(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
      |      / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT) AS ssb_e6,
      |    q * 1000000 - sum_ti AS ssw_e6
      |  FROM tot)
      |SELECT n_docs, k_groups, ssb_e6, ssw_e6,
      |  CASE WHEN ssw_e6 > 0 THEN
      |    CAST(round(1000000.0 * CAST(n_docs - k_groups AS DOUBLE)
      |      * CAST(ssb_e6 AS DOUBLE)
      |      / (CAST(k_groups - 1 AS DOUBLE) * CAST(ssw_e6 AS DOUBLE)))
      |      AS BIGINT)
      |  END AS f_e6
      |FROM parts
      |ORDER BY n_docs""".stripMargin

  // ---------------------------------------------------------------------
  // q409 — Kruskal–Wallis H (k-group rank test) of n_chars across
  // sources: the nonparametric one-way ANOVA a corpus audit prefers
  // when lengths are heavy-tailed. Ranks never materialize per row:
  // midranks come off the DISTINCT-VALUE axis as DOUBLED integers
  // (2·below + ct + 1 — ties stay exact, the q260 doubling trick), so
  // each group's rank sum R_i is an exact long from a value-grain
  // join. Σ R_i²/n_i spends one per-group division e3-rounded AT THE
  // GROUP ROW; H and its tie-corrected form are readout chains in
  // IDENTICAL IEEE op order on both engines. The value axis is the
  // n_chars universe — bounded, not data-sized.
  // ---------------------------------------------------------------------
  private def q409(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("source"), col("n_chars").as("x"))
    val pv = d.groupBy("x").agg(count(lit(1)).as("ct"))
    val wp = axis(col("x")).rowsBetween(Window.unboundedPreceding, -1)
    val dr = pv
      .withColumn("cex", coalesce(sum("ct").over(wp), lit(0L)))
      .select(col("x"), (lit(2L) * col("cex") + col("ct") + 1L).as("drank"),
        col("ct"))
    val r2 = d.groupBy("source", "x").agg(count(lit(1)).as("cs"))
      .join(dr.select("x", "drank"), "x")
      .groupBy("source")
      .agg(sum(col("cs") * col("drank")).as("r2"), sum("cs").as("ni"))
      .withColumn("ti", round(col("r2").cast("double")
        * col("r2").cast("double")
        / (lit(4.0) * col("ni").cast("double")) * 1000.0).cast("long"))
    val ties = dr.agg(sum(col("ct") * col("ct") * col("ct") - col("ct"))
      .as("tie_d"))
    r2.agg(sum("ni").as("n"), count(lit(1)).as("k"), sum("ti").as("t"))
      .crossJoin(broadcast(ties))
      .select(col("n").as("n_docs"), col("k").as("k_groups"),
        col("t").as("sum_r2n_e3"), col("tie_d"),
        round(lit(12000.0) * col("t").cast("double")
          / (col("n").cast("double") * (col("n") + 1L).cast("double"))
          - lit(3000000.0) * (col("n") + 1L).cast("double"))
          .cast("long").as("h_e6"))
      .withColumn("h_adj_e6",
        when(col("tie_d") < (col("n_docs") * col("n_docs") * col("n_docs")
            - col("n_docs")),
          round((lit(12000.0) * col("sum_r2n_e3").cast("double")
            / (col("n_docs").cast("double")
              * (col("n_docs") + 1L).cast("double"))
            - lit(3000000.0) * (col("n_docs") + 1L).cast("double"))
            / (lit(1.0) - col("tie_d").cast("double")
              / (col("n_docs").cast("double") * col("n_docs").cast("double")
                * col("n_docs").cast("double")
                - col("n_docs").cast("double")))).cast("long"))
          .otherwise(lit(null).cast("long")))
      .orderBy("n_docs")
  }

  private val q409Sql =
    """WITH d AS (SELECT source, n_chars AS x FROM documents),
      |pv AS (SELECT x, count(*) AS ct FROM d GROUP BY x),
      |dr AS (
      |  SELECT x, 2 * COALESCE(CAST(sum(ct) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS BIGINT), 0) + ct + 1 AS drank, ct
      |  FROM pv),
      |r2 AS (
      |  SELECT source, CAST(sum(cs * drank) AS BIGINT) AS r2,
      |    CAST(sum(cs) AS BIGINT) AS ni
      |  FROM (SELECT source, x, count(*) AS cs FROM d GROUP BY 1, 2) sv
      |  JOIN dr USING (x) GROUP BY source),
      |r2t AS (
      |  SELECT *, CAST(round(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
      |    / (4.0 * CAST(ni AS DOUBLE)) * 1000.0) AS BIGINT) AS ti
      |  FROM r2),
      |ties AS (SELECT CAST(sum(ct * ct * ct - ct) AS BIGINT) AS tie_d
      |  FROM dr),
      |tot AS (
      |  SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(count(*) AS BIGINT)
      |    AS k, CAST(sum(ti) AS BIGINT) AS t
      |  FROM r2t)
      |SELECT n AS n_docs, k AS k_groups, t AS sum_r2n_e3, tie_d,
      |  CAST(round(12000.0 * CAST(t AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
      |    - 3000000.0 * CAST(n + 1 AS DOUBLE)) AS BIGINT) AS h_e6,
      |  CASE WHEN tie_d < n * n * n - n THEN
      |    CAST(round((12000.0 * CAST(t AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
      |      - 3000000.0 * CAST(n + 1 AS DOUBLE))
      |      / (1.0 - CAST(tie_d AS DOUBLE)
      |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |          - CAST(n AS DOUBLE)))) AS BIGINT)
      |  END AS h_adj_e6
      |FROM tot CROSS JOIN ties
      |ORDER BY n_docs""".stripMargin

  // ---------------------------------------------------------------------
  // q410 — Benjamini–Hochberg step-up selection over the
  // (source × lang) composition-drift hypothesis family: each cell
  // tests "this source's share of this lang equals the corpus share"
  // with the Hoeffding tail bound p ≤ exp(−2·n_s·(p̂−p₀)²) as its
  // deterministic p-value. The comparison runs entirely in LOG space
  // (ln p = −2·num²/(n_s·N²) — a readout chain from exact longs; the
  // α·i/m threshold takes one per-row ln, e9-rounded AT THE ROW, the
  // q375 discipline), so no exp() ever evaluates — exp is not
  // cross-engine-stable, ln is. The step-up rule itself is the gated
  // operator: rank by p ascending, k* = max{i : p_i ≤ α·i/m}, select
  // ranks ≤ k*. The hypothesis family is the source×lang DOMAIN —
  // broadcast-sized regardless of corpus volume.
  // ---------------------------------------------------------------------
  private def q410(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select("source", "lang")
    val cells = d.groupBy("source", "lang").agg(count(lit(1)).as("nsl"))
    val bySrc = d.groupBy("source").agg(count(lit(1)).as("ns"))
    val byLang = d.groupBy("lang").agg(count(lit(1)).as("nl"))
    val tot = d.agg(count(lit(1)).as("nn"))
    val scored = cells.join(bySrc, "source")
      .join(broadcast(byLang), "lang")
      .crossJoin(broadcast(tot))
      .withColumn("num", col("nsl") * col("nn") - col("nl") * col("ns"))
      .withColumn("score_e9", round(lit(-2000000000.0)
        * col("num").cast("double") * col("num").cast("double")
        / (col("ns").cast("double") * col("nn").cast("double")
          * col("nn").cast("double"))).cast("long"))
    val m = scored.agg(count(lit(1)).as("m"))
    val ranked = scored.crossJoin(broadcast(m))
      .withColumn("rnk", row_number()
        .over(axis(col("score_e9"), col("source"), col("lang")))
        .cast("long"))
      .withColumn("thr_e9", round(lit(1000000000.0)
        * log(lit(0.05) * col("rnk").cast("double")
          / col("m").cast("double"))).cast("long"))
    val kstar = ranked
      .agg(max(when(col("score_e9") <= col("thr_e9"), col("rnk")))
        .as("kstar"))
    ranked.crossJoin(broadcast(kstar))
      .select(col("source"), col("lang"), col("rnk"), col("score_e9"),
        col("thr_e9"),
        when(col("rnk") <= coalesce(col("kstar"), lit(0L)), 1L)
          .otherwise(0L).as("selected"))
      .orderBy("rnk")
  }

  private val q410Sql =
    """WITH d AS (SELECT source, lang FROM documents),
      |cells AS (SELECT source, lang, count(*) AS nsl FROM d
      |  GROUP BY 1, 2),
      |by_src AS (SELECT source, count(*) AS ns FROM d GROUP BY 1),
      |by_lang AS (SELECT lang, count(*) AS nl FROM d GROUP BY 1),
      |tot AS (SELECT count(*) AS nn FROM d),
      |scored AS (
      |  SELECT source, lang,
      |    nsl * nn - nl * ns AS num,
      |    CAST(round(-2000000000.0
      |      * CAST(nsl * nn - nl * ns AS DOUBLE)
      |      * CAST(nsl * nn - nl * ns AS DOUBLE)
      |      / (CAST(ns AS DOUBLE) * CAST(nn AS DOUBLE)
      |        * CAST(nn AS DOUBLE))) AS BIGINT) AS score_e9
      |  FROM cells JOIN by_src USING (source) JOIN by_lang USING (lang)
      |  CROSS JOIN tot),
      |m AS (SELECT count(*) AS m FROM scored),
      |ranked AS (
      |  SELECT source, lang, score_e9,
      |    CAST(row_number() OVER (ORDER BY score_e9, source, lang)
      |      AS BIGINT) AS rnk, m.m
      |  FROM scored CROSS JOIN m),
      |ranked2 AS (
      |  SELECT *, CAST(round(1000000000.0
      |    * ln(0.05 * CAST(rnk AS DOUBLE) / CAST(m AS DOUBLE)))
      |    AS BIGINT) AS thr_e9
      |  FROM ranked),
      |kstar AS (
      |  SELECT max(CASE WHEN score_e9 <= thr_e9 THEN rnk END) AS kstar
      |  FROM ranked2)
      |SELECT source, lang, rnk, score_e9, thr_e9,
      |  CAST(CASE WHEN rnk <= COALESCE(kstar, 0) THEN 1 ELSE 0 END
      |    AS BIGINT) AS selected
      |FROM ranked2 CROSS JOIN kstar
      |ORDER BY rnk""".stripMargin

  // ---------------------------------------------------------------------
  // q411 — Page–Hinkley sequential drift detector over the daily mean
  // event value: PH_t = Σ_{s≤t}(x_s − μ̂_s − δ) against the EXPANDING
  // mean μ̂_s, alarming when PH_t − min_{s≤t} PH_s exceeds λ — the
  // classic online changepoint complement to the gated CUSUM (which
  // tests against a FIXED reference). δ = 25 cents tolerance,
  // λ = 500 cents. Day means and expanding means are per-row e4
  // divisions (one IEEE op each, rounded AT THE ROW); the PH walk and
  // its running minimum are then exact long cumulants. The windows run
  // on the DAY grain — bounded by the observation span.
  // ---------------------------------------------------------------------
  private def q411(s: SparkSession, dir: String): DataFrame = {
    val day = Tables.eventsSec(s, dir)
      .select(to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("day").agg(count(lit(1)).as("nd"), sum("v").as("sd"))
      .withColumn("x_e4", round(lit(10000.0) * col("sd").cast("double")
        / col("nd").cast("double")).cast("long"))
    val wc = axis(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    day
      .withColumn("cums", sum("sd").over(wc))
      .withColumn("cumn", sum("nd").over(wc))
      .withColumn("mu_e4", round(lit(10000.0) * col("cums").cast("double")
        / col("cumn").cast("double")).cast("long"))
      .withColumn("dev", col("x_e4") - col("mu_e4") - lit(250000L))
      .withColumn("ph_e4", sum("dev").over(wc))
      .withColumn("runmin", min(col("ph_e4")).over(wc))
      .select(col("day"), col("nd"), col("x_e4"), col("mu_e4"),
        col("ph_e4"), (col("ph_e4") - col("runmin")).as("gap_e4"),
        when(col("ph_e4") - col("runmin") > lit(5000000L), 1L)
          .otherwise(0L).as("alarm"))
      .orderBy("day")
  }

  private val q411Sql =
    """WITH day AS (
      |  SELECT CAST(date_trunc('second', ts) AS DATE) AS day,
      |    count(*) AS nd,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sd
      |  FROM events GROUP BY 1),
      |d2 AS (
      |  SELECT day, nd, sd,
      |    CAST(round(10000.0 * CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE))
      |      AS BIGINT) AS x_e4,
      |    CAST(sum(sd) OVER w AS BIGINT) AS cums,
      |    CAST(sum(nd) OVER w AS BIGINT) AS cumn
      |  FROM day
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)),
      |d3 AS (
      |  SELECT day, nd, x_e4,
      |    x_e4 - CAST(round(10000.0 * CAST(cums AS DOUBLE)
      |      / CAST(cumn AS DOUBLE)) AS BIGINT) - 250000 AS dev,
      |    CAST(round(10000.0 * CAST(cums AS DOUBLE)
      |      / CAST(cumn AS DOUBLE)) AS BIGINT) AS mu_e4
      |  FROM d2),
      |d4 AS (
      |  SELECT *, CAST(sum(dev) OVER w AS BIGINT) AS ph_e4 FROM d3
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)),
      |d5 AS (
      |  SELECT *, min(ph_e4) OVER w AS runmin FROM d4
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW))
      |SELECT day, CAST(nd AS BIGINT) AS nd, x_e4, mu_e4, ph_e4,
      |  ph_e4 - runmin AS gap_e4,
      |  CAST(CASE WHEN ph_e4 - runmin > 5000000 THEN 1 ELSE 0 END
      |    AS BIGINT) AS alarm
      |FROM d5 ORDER BY day""".stripMargin

  // ---------------------------------------------------------------------
  // q412 — ERR@10 (expected reciprocal rank, Chapelle et al.'s cascade
  // model) of the per-user value-ranked feed, EXACTLY in integers:
  // with graded relevance g ∈ {0..3} (purchase 3, signup 2, click 1)
  // and the dyadic satisfaction R = (2^g − 1)/2^g, the cascade
  // survival Π(1−R_i) collapses to 2^(−Σg_i) — so scaling by
  // K = lcm(1..10)·2³⁰ = 2520·2³⁰ makes every term (2520/r)·(2^g−1)·
  // 2^(30−g−G_prev) an exact long (G_prev ≤ 27 over 9 preceding
  // ranks, so the exponent never goes negative). The corpus mean is
  // ONE readout division. Per-user windows — the grain that scales.
  // ---------------------------------------------------------------------
  private def q412(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id").asc)
    val wg = Window.partitionBy("user_id").orderBy("r")
      .rowsBetween(Window.unboundedPreceding, -1)
    val perUser = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        when(col("event_type") === "purchase", 3L)
          .when(col("event_type") === "signup", 2L)
          .when(col("event_type") === "click", 1L).otherwise(0L).as("g"))
      .withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= 10L)
      .withColumn("gprev", coalesce(sum("g").over(wg), lit(0L)))
      .withColumn("term", expr(
        "(2520 div r) * (shiftleft(cast(1 as bigint), cast(g as int))" +
          " - 1) * shiftleft(cast(1 as bigint)," +
          " cast(30 - g - gprev as int))"))
      .groupBy("user_id").agg(sum("term").as("err_scaled"))
    perUser.agg(count(lit(1)).as("n_users"),
        sum("err_scaled").as("sum_err_scaled"))
      .select(col("n_users"), col("sum_err_scaled"),
        round(lit(1000000000.0) * col("sum_err_scaled").cast("double")
          / (col("n_users").cast("double") * 2705829396480.0))
          .cast("long").as("err_e9"))
      .orderBy("n_users")
  }

  private val q412Sql =
    """WITH ranked AS (
      |  SELECT user_id,
      |    CASE WHEN event_type = 'purchase' THEN 3
      |      WHEN event_type = 'signup' THEN 2
      |      WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id ASC) AS BIGINT) AS r
      |  FROM events),
      |top AS (SELECT * FROM ranked WHERE r <= 10),
      |terms AS (
      |  SELECT user_id,
      |    (2520 // r) * ((CAST(1 AS BIGINT) << CAST(g AS INTEGER)) - 1)
      |      * (CAST(1 AS BIGINT) << CAST(30 - g - COALESCE(sum(g)
      |        OVER (PARTITION BY user_id ORDER BY r ROWS BETWEEN
      |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INTEGER))
      |      AS term
      |  FROM top),
      |per_user AS (
      |  SELECT user_id, CAST(sum(term) AS BIGINT) AS err_scaled
      |  FROM terms GROUP BY user_id)
      |SELECT count(*) AS n_users,
      |  CAST(sum(err_scaled) AS BIGINT) AS sum_err_scaled,
      |  CAST(round(1000000000.0 * CAST(sum(err_scaled) AS DOUBLE)
      |    / (CAST(count(*) AS DOUBLE) * 2705829396480.0)) AS BIGINT)
      |    AS err_e9
      |FROM per_user
      |ORDER BY n_users""".stripMargin

  // ---------------------------------------------------------------------
  // q413 — Grubbs max-outlier statistic per source: G = max|x − x̄|/s,
  // the single-outlier screen a length audit runs before trusting a
  // source's moments. Everything cross-multiplies to exact longs:
  // dev = |x·n − S| (per-row), G² = dev²·(n−1)/(n·(n·Q − S²)) spends
  // ONE e9 readout division per source. The arg-max document is
  // recovered exactly (min doc_id among ties). Per-source windows —
  // the source grain scales out; the rollup is domain-sized.
  // ---------------------------------------------------------------------
  private def q413(s: SparkSession, dir: String): DataFrame = {
    val wn = Window.partitionBy("source")
    val rows = Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars").as("x"))
      .withColumn("nn", count(lit(1)).over(wn))
      .withColumn("ss", sum("x").over(wn))
      .withColumn("dev", abs(col("x") * col("nn") - col("ss")))
    val grp = rows.groupBy("source").agg(
      max(col("nn")).as("n"), max(col("ss")).as("sx"),
      sum(col("x") * col("x")).as("q"), max(col("dev")).as("maxdev"))
    val arg = rows
      .join(grp.select(col("source"), col("maxdev")), Seq("source"))
      .filter(col("dev") === col("maxdev"))
      .groupBy("source").agg(min(col("doc_id")).as("outlier_doc"))
    grp.join(arg, Seq("source"))
      .withColumn("nqs2", col("n") * col("q") - col("sx") * col("sx"))
      .select(col("source"), col("n").as("n_docs"), col("maxdev"),
        col("outlier_doc"),
        when(col("n") > 2L && col("nqs2") > 0L,
          round(lit(1000000000.0)
            * (col("maxdev") * col("maxdev")).cast("double")
            * (col("n") - 1L).cast("double")
            / (col("n").cast("double") * col("nqs2").cast("double")))
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("g2_e9"))
      .orderBy("source")
  }

  private val q413Sql =
    """WITH rows_ AS (
      |  SELECT source, doc_id, n_chars AS x,
      |    count(*) OVER (PARTITION BY source) AS nn,
      |    CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS ss
      |  FROM documents),
      |rows2 AS (SELECT *, abs(x * nn - ss) AS dev FROM rows_),
      |grp AS (
      |  SELECT source, CAST(max(nn) AS BIGINT) AS n,
      |    CAST(max(ss) AS BIGINT) AS sx,
      |    CAST(sum(x * x) AS BIGINT) AS q,
      |    CAST(max(dev) AS BIGINT) AS maxdev
      |  FROM rows2 GROUP BY source),
      |arg AS (
      |  SELECT r.source, min(r.doc_id) AS outlier_doc
      |  FROM rows2 r JOIN grp g ON r.source = g.source
      |    AND r.dev = g.maxdev
      |  GROUP BY r.source)
      |SELECT g.source, g.n AS n_docs, g.maxdev, arg.outlier_doc,
      |  CASE WHEN g.n > 2 AND g.n * g.q - g.sx * g.sx > 0 THEN
      |    CAST(round(1000000000.0
      |      * CAST(g.maxdev * g.maxdev AS DOUBLE)
      |      * CAST(g.n - 1 AS DOUBLE)
      |      / (CAST(g.n AS DOUBLE)
      |        * CAST(g.n * g.q - g.sx * g.sx AS DOUBLE))) AS BIGINT)
      |  END AS g2_e9
      |FROM grp g JOIN arg ON g.source = arg.source
      |ORDER BY g.source""".stripMargin

  // ---------------------------------------------------------------------
  // q414 — Tukey-fence outlier audit per source: the box-plot screen
  // (outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR]) every length-distribution
  // dashboard draws. Quartiles are EXACT type-1 order statistics
  // (rank ⌈p·n⌉ via (n+3) div 4 / (3n+3) div 4 — always observed
  // values, no interpolation), and the 1.5 factor runs in DOUBLED
  // integer units (2x vs 2Q1 − 3·IQR) so the whole audit is integer-
  // exact. Per-source windows + one self-join on the source grain.
  // ---------------------------------------------------------------------
  private def q414(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars").as("x"))
    val wr = Window.partitionBy("source").orderBy(col("x"), col("doc_id"))
    val wn = Window.partitionBy("source")
    val qs = d.withColumn("rn", row_number().over(wr).cast("long"))
      .withColumn("ni", count(lit(1)).over(wn))
      .groupBy("source").agg(
        max("ni").as("n"),
        min(when(col("rn") === expr("(ni + 3) div 4"), col("x")))
          .as("q1"),
        min(when(col("rn") === expr("(3 * ni + 3) div 4"), col("x")))
          .as("q3"))
    d.join(qs, Seq("source"))
      .withColumn("iqr", col("q3") - col("q1"))
      .withColumn("out",
        lit(2L) * col("x") < lit(2L) * col("q1") - lit(3L) * col("iqr")
          || lit(2L) * col("x") > lit(2L) * col("q3")
            + lit(3L) * col("iqr"))
      .groupBy("source").agg(max("n").as("n_docs"),
        max("q1").as("q1"), max("q3").as("q3"),
        sum(col("out").cast("long")).as("n_out"),
        min(when(col("out"), col("x"))).as("min_out"),
        max(when(col("out"), col("x"))).as("max_out"))
      .orderBy("source")
  }

  private val q414Sql =
    """WITH d AS (SELECT source, doc_id, n_chars AS x FROM documents),
      |ranked AS (
      |  SELECT source, x,
      |    row_number() OVER (PARTITION BY source ORDER BY x, doc_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY source) AS ni
      |  FROM d),
      |qs AS (
      |  SELECT source, CAST(max(ni) AS BIGINT) AS n,
      |    min(CASE WHEN rn = (ni + 3) // 4 THEN x END) AS q1,
      |    min(CASE WHEN rn = (3 * ni + 3) // 4 THEN x END) AS q3
      |  FROM ranked GROUP BY source),
      |flagged AS (
      |  SELECT d.source, qs.n, qs.q1, qs.q3, d.x,
      |    (2 * d.x < 2 * qs.q1 - 3 * (qs.q3 - qs.q1)
      |      OR 2 * d.x > 2 * qs.q3 + 3 * (qs.q3 - qs.q1)) AS out
      |  FROM d JOIN qs ON d.source = qs.source)
      |SELECT source, max(n) AS n_docs,
      |  CAST(max(q1) AS BIGINT) AS q1, CAST(max(q3) AS BIGINT) AS q3,
      |  CAST(sum(CASE WHEN out THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
      |  min(CASE WHEN out THEN x END) AS min_out,
      |  max(CASE WHEN out THEN x END) AS max_out
      |FROM flagged GROUP BY source
      |ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q415 — Cohen's d (pooled-variance standardized mean difference)
  // between click and view values: the effect-size readout an A/B
  // report pairs with q260's Mann–Whitney significance. The six
  // sufficient statistics (n, Σv, Σv²) per arm reduce in ONE exact
  // long pass; d = (x̄_A − x̄_B)/s_p is then a readout chain of IEEE
  // ops in IDENTICAL order on both engines (the q261 precedent; sqrt
  // is correctly-rounded per IEEE-754, so it is cross-engine-stable,
  // unlike exp). Positivity of s_p² is pre-checked EXACTLY in
  // decimal(38,0) before any floating math runs.
  // ---------------------------------------------------------------------
  private def q415(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("na"),
        sum(when(col("event_type") === "click", col("v"))
          .otherwise(0L)).as("sa"),
        sum(when(col("event_type") === "click", col("v") * col("v"))
          .otherwise(0L)).as("qa"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("nb"),
        sum(when(col("event_type") === "view", col("v"))
          .otherwise(0L)).as("sb"),
        sum(when(col("event_type") === "view", col("v") * col("v"))
          .otherwise(0L)).as("qb"))
    val sp2pos = (col("qa").cast(dec) * col("na")
      - col("sa").cast(dec) * col("sa")) * col("nb") +
      (col("qb").cast(dec) * col("nb")
        - col("sb").cast(dec) * col("sb")) * col("na")
    agg.select(col("na"), col("nb"), col("sa"), col("sb"),
      when(col("na") > 1L && col("nb") > 1L && sp2pos > 0,
        round(lit(1000000.0)
          * (col("sa").cast("double") / col("na").cast("double")
            - col("sb").cast("double") / col("nb").cast("double"))
          / sqrt(((col("qa").cast("double")
            - col("sa").cast("double") * col("sa").cast("double")
              / col("na").cast("double"))
            + (col("qb").cast("double")
              - col("sb").cast("double") * col("sb").cast("double")
                / col("nb").cast("double")))
            / (col("na").cast("double") + col("nb").cast("double")
              - 2.0))).cast("long"))
        .otherwise(lit(null).cast("long")).as("d_e6"))
      .orderBy("na")
  }

  private val q415Sql =
    """WITH agg AS (
      |  SELECT
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN event_type = 'click'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS sa,
      |    CAST(sum(CASE WHEN event_type = 'click'
      |      THEN CAST(round(value * 100) AS BIGINT)
      |        * CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS qa,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS nb,
      |    CAST(sum(CASE WHEN event_type = 'view'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS sb,
      |    CAST(sum(CASE WHEN event_type = 'view'
      |      THEN CAST(round(value * 100) AS BIGINT)
      |        * CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS qb
      |  FROM events WHERE event_type IN ('click', 'view'))
      |SELECT na, nb, sa, sb,
      |  CASE WHEN na > 1 AND nb > 1 AND
      |      (CAST(qa AS HUGEINT) * na - CAST(sa AS HUGEINT) * sa) * nb
      |      + (CAST(qb AS HUGEINT) * nb - CAST(sb AS HUGEINT) * sb)
      |        * na > 0 THEN
      |    CAST(round(1000000.0
      |      * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
      |        - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
      |      / sqrt(((CAST(qa AS DOUBLE)
      |        - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
      |          / CAST(na AS DOUBLE))
      |        + (CAST(qb AS DOUBLE)
      |          - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
      |            / CAST(nb AS DOUBLE)))
      |        / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0)))
      |      AS BIGINT)
      |  END AS d_e6
      |FROM agg
      |ORDER BY na""".stripMargin

  // ---------------------------------------------------------------------
  // q416 — Hodges–Lehmann shift estimator between the click and view
  // DAILY MEAN series: the median of all pairwise differences — the
  // robust "how much higher does click run than view" readout that a
  // single outlier day cannot drag (unlike the mean difference).
  // Day means are per-row e4 divisions; the pair table is the
  // day-grain cross (span² pairs), kept honest by a raise_error
  // tripwire at 1000 days/side — the pairwise expansion is bounded by
  // the OBSERVATION SPAN, never by event volume. The median is the
  // exact lower order statistic of the integer diffs.
  // ---------------------------------------------------------------------
  private def q416(s: SparkSession, dir: String): DataFrame = {
    val day = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("event_type", "day")
      .agg(round(lit(10000.0) * sum("v").cast("double")
        / count(lit(1)).cast("double")).cast("long").as("x_e4"))
    val da = day.filter(col("event_type") === "click")
      .select(col("day").as("dda"), col("x_e4").as("xa"))
    val db = day.filter(col("event_type") === "view")
      .select(col("day").as("ddb"), col("x_e4").as("xb"))
    val cnts = da.agg(count(lit(1)).as("n_a"))
      .crossJoin(db.agg(count(lit(1)).as("n_b")))
    val pairs = da.crossJoin(broadcast(db)).crossJoin(broadcast(cnts))
      .withColumn("diff",
        when(col("n_a") <= 1000L && col("n_b") <= 1000L,
          col("xa") - col("xb"))
          .otherwise(raise_error(concat(
            lit("hodgesLehmann: day grain exceeded 1000×1000 ("),
            col("n_a").cast("string"), lit("×"),
            col("n_b").cast("string"),
            lit(") — aggregate to a coarser grain or raise the bound " +
              "explicitly.")))))
      .withColumn("rn", row_number()
        .over(axis(col("diff"), col("dda"), col("ddb"))).cast("long"))
    pairs.groupBy("n_a", "n_b")
      .agg(min(when(col("rn") === expr("(n_a * n_b + 1) div 2"),
        col("diff"))).as("hl_e4"))
      .select(col("n_a"), col("n_b"), (col("n_a") * col("n_b"))
        .as("n_pairs"), col("hl_e4"))
      .orderBy("n_a")
  }

  private val q416Sql =
    """WITH day AS (
      |  SELECT event_type, CAST(date_trunc('second', ts) AS DATE)
      |      AS day,
      |    CAST(round(10000.0 * CAST(sum(CAST(round(value * 100)
      |      AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE))
      |      AS BIGINT) AS x_e4
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY 1, 2),
      |da AS (SELECT day AS dda, x_e4 AS xa FROM day
      |  WHERE event_type = 'click'),
      |db AS (SELECT day AS ddb, x_e4 AS xb FROM day
      |  WHERE event_type = 'view'),
      |cnts AS (SELECT (SELECT count(*) FROM da) AS n_a,
      |  (SELECT count(*) FROM db) AS n_b),
      |ranked AS (
      |  SELECT xa - xb AS diff,
      |    CAST(row_number() OVER (ORDER BY xa - xb, dda, ddb)
      |      AS BIGINT) AS rn
      |  FROM da CROSS JOIN db)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(n_a * n_b AS BIGINT) AS n_pairs,
      |  min(CASE WHEN rn = (n_a * n_b + 1) // 2 THEN diff END)
      |    AS hl_e4
      |FROM cnts CROSS JOIN ranked
      |GROUP BY n_a, n_b
      |ORDER BY n_a""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q405_wasserstein" -> (q405 _),
    "q406_cvm_two_sample" -> (q406 _),
    "q407_energy_distance" -> (q407 _),
    "q408_brown_forsythe" -> (q408 _),
    "q409_kruskal_wallis" -> (q409 _),
    "q410_bh_stepup" -> (q410 _),
    "q411_page_hinkley" -> (q411 _),
    "q412_err_at_10" -> (q412 _),
    "q413_grubbs_outlier" -> (q413 _),
    "q414_tukey_fences" -> (q414 _),
    "q415_cohens_d" -> (q415 _),
    "q416_hodges_lehmann" -> (q416 _))

  val oracle: Map[String, String] = Map(
    "q405_wasserstein" -> q405Sql,
    "q406_cvm_two_sample" -> q406Sql,
    "q407_energy_distance" -> q407Sql,
    "q408_brown_forsythe" -> q408Sql,
    "q409_kruskal_wallis" -> q409Sql,
    "q410_bh_stepup" -> q410Sql,
    "q411_page_hinkley" -> q411Sql,
    "q412_err_at_10" -> q412Sql,
    "q413_grubbs_outlier" -> q413Sql,
    "q414_tukey_fences" -> q414Sql,
    "q415_cohens_d" -> q415Sql,
    "q416_hodges_lehmann" -> q416Sql)
}
