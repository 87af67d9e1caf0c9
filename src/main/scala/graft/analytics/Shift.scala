package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.PlanStats.Pinned

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
  /** Pairwise |x−y| mass identity: from a per-DISTINCT-VALUE count
    * table (v, ca, cb) — two multisets A and B reduced to the value
    * grain — returns ONE row (mab, maa, mbb) = Σ|x−y| over A×B,
    * unordered A-pairs, and unordered B-pairs, via exclusive
    * cumulants on the sorted value axis (Σ_pairs|x−y| =
    * Σ_v c(v)·(v·C_below(v) − S_below(v)) from both sides; equal
    * values contribute zero so strict-below suffices). Never
    * materializes a pair; the axis is the value UNIVERSE. Columns come
    * back as decimal(38,0). Public: PropertySpec checks the identity
    * against literal O(n²) loops on random multisets. */
  def absDiffMasses(cnt: DataFrame): DataFrame = {
    val base = cnt
      .withColumn("sa", col("v") * col("ca"))
      .withColumn("sb", col("v") * col("cb"))
    val wp = axis(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cax", coalesce(sum("ca").over(wp), lit(0L)))
      .withColumn("cbx", coalesce(sum("cb").over(wp), lit(0L)))
      .withColumn("sax", coalesce(sum("sa").over(wp), lit(0L)))
      .withColumn("sbx", coalesce(sum("sb").over(wp), lit(0L)))
      .agg(
        sum(col("ca").cast(dec) * (col("v") * col("cbx") - col("sbx"))
          + col("cb").cast(dec) * (col("v") * col("cax") - col("sax")))
          .as("mab"),
        sum(col("ca").cast(dec) * (col("v") * col("cax") - col("sax")))
          .as("maa"),
        sum(col("cb").cast(dec) * (col("v") * col("cbx") - col("sbx")))
          .as("mbb"))
  }

  private def q407(s: SparkSession, dir: String): DataFrame = {
    val cnt = cvCounts(s, dir)
    val tot = cnt.agg(sum("ca").as("na"), sum("cb").as("nb"))
    absDiffMasses(cnt).crossJoin(broadcast(tot))
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

  // package-visible: q426's STREAMING Page–Hinkley faces this same
  // oracle (one walk, two execution models)
  private[analytics] val q411Sql =
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

  // ---------------------------------------------------------------------
  // q417 — Anderson–Darling two-sample statistic (Scholz–Stephens
  // A²akN, the ties-adjusted form of Pettitt's two-sample AD) between
  // click and view values: the tail-weighted ECDF distance — the
  // j(N−j) denominator upweights the tails where KS/CvM are least
  // sensitive, which is exactly where value distributions drift first.
  // On the doubled mid-cumulant grid (M2 = 2·cumA_below + ca,
  // B2 = 2·cum_below + l) the halves clear: A² = (N−1)/N² ·
  // Σ_v l·(N·M2 − na·B2)²/(B2(2N−B2) − N·l) — integer numerator in
  // decimal(38,0), integer denominator, ONE per-row e9 division (the
  // 1/N² folded in to keep the rounded term bounded by l), exact sum,
  // one readout scale. Fully-tied axes hit den = 0 with num = 0 —
  // the term is dropped on both engines.
  // ---------------------------------------------------------------------
  private def q417(s: SparkSession, dir: String): DataFrame = {
    val cnt = cvCounts(s, dir)
    val tot = cnt.agg(sum("ca").as("na"), sum("cb").as("nb"),
      count(lit(1)).as("n_support"))
    val wp = axis(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val terms = cnt
      .withColumn("cax", coalesce(sum("ca").over(wp), lit(0L)))
      .withColumn("cx",
        coalesce(sum(col("ca") + col("cb")).over(wp), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("nn", col("na") + col("nb"))
      .withColumn("l", col("ca") + col("cb"))
      .withColumn("m2", lit(2L) * col("cax") + col("ca"))
      .withColumn("b2", lit(2L) * col("cx") + col("l"))
      .withColumn("dnum",
        col("nn") * col("m2") - col("na") * col("b2"))
      .withColumn("den", col("b2") * (lit(2L) * col("nn") - col("b2"))
        - col("nn") * col("l"))
      .withColumn("r_e9", when(col("den") > 0L,
        round(lit(1000000000.0)
          * (col("l").cast(dec) * col("dnum") * col("dnum"))
            .cast("double")
          / (col("den").cast("double") * col("nn").cast("double")
            * col("nn").cast("double"))).cast("long"))
        .otherwise(0L))
    terms.groupBy("na", "nb", "n_support", "nn")
      .agg(sum("r_e9").as("sum_r_e9"))
      .select(col("na"), col("nb"), col("n_support"), col("sum_r_e9"),
        round((col("nn") - 1L).cast("double")
          * col("sum_r_e9").cast("double") / 1000.0)
          .cast("long").as("a2_e6"))
      .orderBy("na")
  }

  private val q417Sql =
    s"""WITH cnt AS (
       |  $cvCountsSql),
       |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
       |  CAST(sum(cb) AS BIGINT) AS nb, count(*) AS n_support FROM cnt),
       |cum AS (
       |  SELECT v, ca, cb,
       |    COALESCE(CAST(sum(ca) OVER w AS BIGINT), 0) AS cax,
       |    COALESCE(CAST(sum(ca + cb) OVER w AS BIGINT), 0) AS cx
       |  FROM cnt
       |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND 1 PRECEDING)),
       |terms AS (
       |  SELECT na, nb, n_support, na + nb AS nn, ca + cb AS l,
       |    2 * cax + ca AS m2, 2 * cx + ca + cb AS b2
       |  FROM cum CROSS JOIN tot),
       |terms2 AS (
       |  SELECT na, nb, n_support, nn, l,
       |    nn * m2 - na * b2 AS dnum,
       |    b2 * (2 * nn - b2) - nn * l AS den
       |  FROM terms),
       |terms3 AS (
       |  SELECT na, nb, n_support, nn,
       |    CASE WHEN den > 0 THEN
       |      CAST(round(1000000000.0
       |        * CAST(CAST(l AS HUGEINT) * dnum * dnum AS DOUBLE)
       |        / (CAST(den AS DOUBLE) * CAST(nn AS DOUBLE)
       |          * CAST(nn AS DOUBLE))) AS BIGINT)
       |    ELSE 0 END AS r_e9
       |  FROM terms2)
       |SELECT na, nb, n_support, CAST(sum(r_e9) AS BIGINT) AS sum_r_e9,
       |  CAST(round(CAST(nn - 1 AS DOUBLE)
       |    * CAST(sum(r_e9) AS DOUBLE) / 1000.0) AS BIGINT) AS a2_e6
       |FROM terms3
       |GROUP BY na, nb, n_support, nn
       |ORDER BY na""".stripMargin

  // ---------------------------------------------------------------------
  // q418 — Cliff's delta per weekday: the effect size belonging to
  // q260's Mann–Whitney significance — δ = P(X>Y) − P(X<Y) =
  // (2U − nm)/nm, read DIRECTLY off the same doubled-U cumulant
  // construction (u_x2 counts ties half, doubled), so δ = (u_x2 −
  // nm)/nm is ONE e6 division per weekday from exact longs. δ = 0 is
  // stochastic equality; |δ| ≥ 0.474 is Romano's "large". Same
  // distinct-value grain and windows as q260 — the significance and
  // the effect size come out of one reduction shape.
  // ---------------------------------------------------------------------
  private def q418(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(dayofweek(col("ts_s")).cast("long").as("dow"),
        col("event_type"),
        round(col("value") * 10000).cast("long").as("v_e4"))
    val cnt = e.groupBy("dow", "v_e4")
      .agg(sum((col("event_type") === "click").cast("long")).as("ca"),
        sum((col("event_type") === "view").cast("long")).as("cb"))
    val w = Window.partitionBy("dow").orderBy("v_e4")
      .rowsBetween(Window.unboundedPreceding, -1)
    cnt
      .withColumn("cb_below", coalesce(sum("cb").over(w), lit(0L)))
      .groupBy("dow")
      .agg(sum("ca").as("n_click"), sum("cb").as("n_view"),
        sum(col("ca") * (lit(2) * col("cb_below") + col("cb")))
          .as("u_click_x2"))
      .select(col("dow"), col("n_click"), col("n_view"),
        col("u_click_x2"),
        round(lit(1000000.0)
          * (col("u_click_x2") - col("n_click") * col("n_view"))
            .cast("double")
          / (col("n_click") * col("n_view")).cast("double"))
          .cast("long").as("delta_e6"))
      .orderBy("dow")
  }

  private val q418Sql =
    s"""WITH e AS (
       |  SELECT CAST(dayofweek(date_trunc('second', ts)) + 1 AS BIGINT)
       |      AS dow,
       |    event_type,
       |    CAST(round(value * 10000) AS BIGINT) AS v_e4
       |  FROM events WHERE event_type IN ('click', 'view')),
       |cnt AS (
       |  SELECT dow, v_e4,
       |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS cb
       |  FROM e GROUP BY 1, 2),
       |cum AS (
       |  SELECT dow, ca, cb,
       |    COALESCE(CAST(sum(cb) OVER (PARTITION BY dow ORDER BY v_e4
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS BIGINT), 0) AS cb_below
       |  FROM cnt),
       |u AS (
       |  SELECT dow, CAST(sum(ca) AS BIGINT) AS n_click,
       |    CAST(sum(cb) AS BIGINT) AS n_view,
       |    CAST(sum(ca * (2 * cb_below + cb)) AS BIGINT) AS u_click_x2
       |  FROM cum GROUP BY dow)
       |SELECT dow, n_click, n_view, u_click_x2,
       |  CAST(round(1000000.0
       |    * CAST(u_click_x2 - n_click * n_view AS DOUBLE)
       |    / CAST(n_click * n_view AS DOUBLE)) AS BIGINT) AS delta_e6
       |FROM u ORDER BY dow""".stripMargin

  // ---------------------------------------------------------------------
  // q419 — Friedman test + Kendall's W over the three deterministic
  // document "raters" (q378's chars/tokens/punctuation bucketers as
  // repeated measures on each document block): do the raters rank
  // documents concordantly? Within-block doubled midranks
  // (2·below + eq + 1, eq including self) come from the k²-bounded
  // within-block self-join (k = 3); the tie-general Friedman form
  // clears ALL fractions with doubled ranks:
  // χ²_F = (k−1)(ΣR2_j² − N²k(k+1)²)/(Σdr² − N·k(k+1)²) — exact
  // integers up to ONE e6 division; W = χ²/(N(k−1)) is a second
  // readout of the same integers. ΣR2² ≥ 48N² by Cauchy–Schwarz so
  // the numerator is never negative; a fully-tied corpus hits
  // den = 0 and reads NULL on both engines.
  // ---------------------------------------------------------------------
  private def q419(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Text
    val rated = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(array(
        struct(lit(1L).as("rater"),
          least(expr("n_chars div 150"), lit(5L)).as("sc")),
        struct(lit(2L).as("rater"),
          least((size(Text.words(col("text"))) / 30).cast("long"),
            lit(5L)).as("sc")),
        struct(lit(3L).as("rater"),
          least(expr(
            "(length(text) - length(replace(text, '.'))) div 2"),
            lit(5L)).as("sc")))).as("r"))
      .select(col("doc_id"), col("r.rater").as("rater"),
        col("r.sc").as("sc"))
    val dr = rated.as("a")
      .join(rated.as("b"), col("a.doc_id") === col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id"), col("a.rater").as("rater"),
        col("a.sc").as("sc"))
      .agg(sum((col("b.sc") < col("a.sc")).cast("long")).as("below"),
        sum((col("b.sc") === col("a.sc")).cast("long")).as("eq"))
      .select(col("doc_id"), col("rater"),
        (lit(2L) * col("below") + col("eq") + 1L).as("dr"))
    val stats = dr.agg(
      countDistinct(col("doc_id")).as("n_docs"),
      sum(when(col("rater") === 1L, col("dr"))).as("r2_1"),
      sum(when(col("rater") === 2L, col("dr"))).as("r2_2"),
      sum(when(col("rater") === 3L, col("dr"))).as("r2_3"),
      sum(col("dr") * col("dr")).as("sum_dr2"))
    stats
      .withColumn("numer", col("r2_1") * col("r2_1")
        + col("r2_2") * col("r2_2") + col("r2_3") * col("r2_3")
        - lit(48L) * col("n_docs") * col("n_docs"))
      .withColumn("den", col("sum_dr2") - lit(48L) * col("n_docs"))
      .select(col("n_docs"), col("r2_1"), col("r2_2"), col("r2_3"),
        col("sum_dr2"),
        when(col("den") > 0L, round(lit(1000000.0) * lit(2.0)
          * col("numer").cast("double") / col("den").cast("double"))
          .cast("long")).otherwise(lit(null).cast("long"))
          .as("chi2_e6"),
        when(col("den") > 0L, round(lit(1000000.0)
          * col("numer").cast("double")
          / (col("den").cast("double") * col("n_docs").cast("double")))
          .cast("long")).otherwise(lit(null).cast("long"))
          .as("w_e6"))
      .orderBy("n_docs")
  }

  private val q419Sql =
    """WITH rated AS (
      |  SELECT doc_id, 1 AS rater,
      |    least(n_chars // 150, 5) AS sc FROM documents
      |  UNION ALL
      |  SELECT doc_id, 2,
      |    least(len(list_filter(string_split(text, ' '),
      |      w -> length(w) > 0)) // 30, 5) FROM documents
      |  UNION ALL
      |  SELECT doc_id, 3,
      |    least((length(text) - length(replace(text, '.', ''))) // 2, 5)
      |  FROM documents),
      |dr AS (
      |  SELECT a.doc_id, a.rater,
      |    2 * sum(CASE WHEN b.sc < a.sc THEN 1 ELSE 0 END)
      |      + sum(CASE WHEN b.sc = a.sc THEN 1 ELSE 0 END) + 1 AS dr
      |  FROM rated a JOIN rated b ON a.doc_id = b.doc_id
      |  GROUP BY a.doc_id, a.rater, a.sc),
      |stats AS (
      |  SELECT count(DISTINCT doc_id) AS n_docs,
      |    CAST(sum(CASE WHEN rater = 1 THEN dr END) AS BIGINT) AS r2_1,
      |    CAST(sum(CASE WHEN rater = 2 THEN dr END) AS BIGINT) AS r2_2,
      |    CAST(sum(CASE WHEN rater = 3 THEN dr END) AS BIGINT) AS r2_3,
      |    CAST(sum(dr * dr) AS BIGINT) AS sum_dr2
      |  FROM dr),
      |parts AS (
      |  SELECT *,
      |    r2_1 * r2_1 + r2_2 * r2_2 + r2_3 * r2_3
      |      - 48 * n_docs * n_docs AS numer,
      |    sum_dr2 - 48 * n_docs AS den
      |  FROM stats)
      |SELECT n_docs, r2_1, r2_2, r2_3, sum_dr2,
      |  CASE WHEN den > 0 THEN
      |    CAST(round(1000000.0 * 2.0 * CAST(numer AS DOUBLE)
      |      / CAST(den AS DOUBLE)) AS BIGINT) END AS chi2_e6,
      |  CASE WHEN den > 0 THEN
      |    CAST(round(1000000.0 * CAST(numer AS DOUBLE)
      |      / (CAST(den AS DOUBLE) * CAST(n_docs AS DOUBLE)))
      |      AS BIGINT) END AS w_e6
      |FROM parts
      |ORDER BY n_docs""".stripMargin

  // ---------------------------------------------------------------------
  // q420 — Cochran's Q over three deterministic binary screens on
  // every event (value > 100 units, engagement type, even-user): do k
  // binary classifiers flag at the same marginal rate? Q =
  // (k−1)(kΣC_j² − S²)/(kS − ΣR_i²) is ENTIRELY integer sufficient
  // statistics — column totals C_j, per-item row totals R_i ∈ 0..k,
  // grand total S — reduced in one scan with map-side combine, ONE e6
  // readout division. The McNemar (q385) generalization to k > 2.
  // ---------------------------------------------------------------------
  private def q420(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(
        (round(col("value") * 100).cast("long") > 10000L).cast("long")
          .as("c1"),
        col("event_type").isin("click", "purchase").cast("long")
          .as("c2"),
        (col("user_id") % 2L === 0L).cast("long").as("c3"))
      .withColumn("r", col("c1") + col("c2") + col("c3"))
    e.agg(count(lit(1)).as("n_events"),
        sum("c1").as("s1"), sum("c2").as("s2"), sum("c3").as("s3"),
        sum(col("r") * col("r")).as("sum_r2"))
      .withColumn("s", col("s1") + col("s2") + col("s3"))
      .select(col("n_events"), col("s1"), col("s2"), col("s3"),
        col("sum_r2"),
        when(lit(3L) * col("s") - col("sum_r2") > 0L,
          round(lit(1000000.0) * lit(2.0)
            * (lit(3L) * (col("s1") * col("s1") + col("s2") * col("s2")
              + col("s3") * col("s3")) - col("s") * col("s"))
              .cast("double")
            / (lit(3L) * col("s") - col("sum_r2")).cast("double"))
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("q_e6"))
      .orderBy("n_events")
  }

  private val q420Sql =
    """WITH e AS (
      |  SELECT
      |    CASE WHEN CAST(round(value * 100) AS BIGINT) > 10000
      |      THEN 1 ELSE 0 END AS c1,
      |    CASE WHEN event_type IN ('click', 'purchase')
      |      THEN 1 ELSE 0 END AS c2,
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS c3
      |  FROM events),
      |agg AS (
      |  SELECT count(*) AS n_events,
      |    CAST(sum(c1) AS BIGINT) AS s1, CAST(sum(c2) AS BIGINT) AS s2,
      |    CAST(sum(c3) AS BIGINT) AS s3,
      |    CAST(sum((c1 + c2 + c3) * (c1 + c2 + c3)) AS BIGINT)
      |      AS sum_r2
      |  FROM e),
      |parts AS (SELECT *, s1 + s2 + s3 AS s FROM agg)
      |SELECT n_events, s1, s2, s3, sum_r2,
      |  CASE WHEN 3 * s - sum_r2 > 0 THEN
      |    CAST(round(1000000.0 * 2.0
      |      * CAST(3 * (s1 * s1 + s2 * s2 + s3 * s3) - s * s AS DOUBLE)
      |      / CAST(3 * s - sum_r2 AS DOUBLE)) AS BIGINT)
      |  END AS q_e6
      |FROM parts
      |ORDER BY n_events""".stripMargin

  // ---------------------------------------------------------------------
  // q421 — Theil inequality index of document lengths per source:
  // T = (1/n)Σ(x/μ)ln(x/μ), the entropy-based concentration measure a
  // corpus-mix planner reads next to the Gini — T decomposes additively
  // across subgroups, which Gini does not. Algebra collapses it to
  // T = (Σ x·ln x)/S + ln(n/S): ONE per-row x·ln x, e9-rounded AT THE
  // ROW (the q375 discipline), an exact long sum, and a readout chain
  // with one division and one ln in identical IEEE order on both
  // engines. Map-side combine does everything; the rollup is the
  // source domain.
  // ---------------------------------------------------------------------
  private def q421(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("source"), col("n_chars").as("x"))
      .withColumn("xlx_e9", round(col("x").cast("double")
        * log(col("x").cast("double")) * 1000000000.0).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("xlx_e9").as("sxlx_e9"))
      .select(col("source"), col("n"), col("sx"),
        round(col("sxlx_e9").cast("double") / col("sx").cast("double")
          + lit(1000000000.0) * log(col("n").cast("double")
            / col("sx").cast("double"))).cast("long").as("theil_e9"))
      .orderBy("source")

  private val q421Sql =
    """WITH d AS (
      |  SELECT source, n_chars AS x,
      |    CAST(round(CAST(n_chars AS DOUBLE)
      |      * ln(CAST(n_chars AS DOUBLE)) * 1000000000.0) AS BIGINT)
      |      AS xlx_e9
      |  FROM documents),
      |grp AS (
      |  SELECT source, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(xlx_e9) AS BIGINT) AS sxlx_e9
      |  FROM d GROUP BY source)
      |SELECT source, n, sx,
      |  CAST(round(CAST(sxlx_e9 AS DOUBLE) / CAST(sx AS DOUBLE)
      |    + 1000000000.0 * ln(CAST(n AS DOUBLE) / CAST(sx AS DOUBLE)))
      |    AS BIGINT) AS theil_e9
      |FROM grp ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q422 — Mood's median test across sources: the k-group location
  // test that needs only above/below-the-grand-median counts — the
  // coarsest, most outlier-proof of the location family (vs q409's
  // rank-sum KW). The grand median is the exact lower order statistic
  // off the value-universe axis; the k×2 contingency χ² then runs in
  // the q383 per-cell discipline: (O·N − R·C)² exact-long cross
  // products evaluated in DOUBLE in identical op order, e6-rounded
  // PER CELL, integer-summed. Degenerate margins (median = max) zero
  // their cells on both engines.
  // ---------------------------------------------------------------------
  private def q422(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(col("source"), col("n_chars").as("x"))
    val tot = d.agg(count(lit(1)).as("nn"))
    val wc = axis(col("x")).rowsBetween(Window.unboundedPreceding, 0)
    val med = d.groupBy("x").agg(count(lit(1)).as("ct"))
      .withColumn("cum", sum("ct").over(wc))
      .crossJoin(broadcast(tot))
      .agg(min(when(col("cum") >= expr("(nn + 1) div 2"), col("x")))
        .as("med"))
    val cells = d.crossJoin(broadcast(med))
      .select(col("source"), (col("x") > col("med")).cast("long")
        .as("abv"), col("med"))
      .groupBy("source", "med")
      .agg(count(lit(1)).as("ni"), sum("abv").as("oi"))
    val marg = cells.groupBy(lit(1)).agg(sum("ni").as("nn"),
      sum("oi").as("aa"), count(lit(1)).as("k")).drop("1")
    def cell(o: Column, r: Column, c: Column, nn: Column): Column =
      when(r * c > 0L, round(lit(1000000.0)
        * (o * nn - r * c).cast("double")
        * (o * nn - r * c).cast("double")
        / (r.cast("double") * c.cast("double") * nn.cast("double")))
        .cast("long")).otherwise(0L)
    cells.crossJoin(broadcast(marg))
      .withColumn("t1", cell(col("oi"), col("ni"), col("aa"),
        col("nn")))
      .withColumn("t2", cell(col("ni") - col("oi"), col("ni"),
        col("nn") - col("aa"), col("nn")))
      .groupBy("nn", "k", "med", "aa")
      .agg(sum(col("t1") + col("t2")).as("chi2_e6"))
      .select(col("nn").as("n_docs"), col("k").as("k_groups"),
        col("med").as("median"), col("aa").as("n_above"),
        col("chi2_e6"))
      .orderBy("n_docs")
  }

  private val q422Sql =
    """WITH d AS (SELECT source, n_chars AS x FROM documents),
      |tot AS (SELECT count(*) AS nn FROM d),
      |pv AS (SELECT x, count(*) AS ct FROM d GROUP BY x),
      |med AS (
      |  SELECT min(CASE WHEN cum >= (nn + 1) // 2 THEN x END) AS med
      |  FROM (SELECT x, CAST(sum(ct) OVER (ORDER BY x ROWS BETWEEN
      |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |    FROM pv) c CROSS JOIN tot),
      |cells AS (
      |  SELECT source, med, count(*) AS ni,
      |    CAST(sum(CASE WHEN x > med THEN 1 ELSE 0 END) AS BIGINT)
      |      AS oi
      |  FROM d CROSS JOIN med GROUP BY source, med),
      |marg AS (SELECT CAST(sum(ni) AS BIGINT) AS nn,
      |  CAST(sum(oi) AS BIGINT) AS aa, count(*) AS k FROM cells),
      |terms AS (
      |  SELECT nn, k, med, aa,
      |    CASE WHEN ni * aa > 0 THEN
      |      CAST(round(1000000.0
      |        * CAST(oi * nn - ni * aa AS DOUBLE)
      |        * CAST(oi * nn - ni * aa AS DOUBLE)
      |        / (CAST(ni AS DOUBLE) * CAST(aa AS DOUBLE)
      |          * CAST(nn AS DOUBLE))) AS BIGINT) ELSE 0 END
      |    + CASE WHEN ni * (nn - aa) > 0 THEN
      |      CAST(round(1000000.0
      |        * CAST((ni - oi) * nn - ni * (nn - aa) AS DOUBLE)
      |        * CAST((ni - oi) * nn - ni * (nn - aa) AS DOUBLE)
      |        / (CAST(ni AS DOUBLE) * CAST(nn - aa AS DOUBLE)
      |          * CAST(nn AS DOUBLE))) AS BIGINT) ELSE 0 END AS t
      |  FROM cells CROSS JOIN marg)
      |SELECT nn AS n_docs, CAST(k AS BIGINT) AS k_groups,
      |  med AS median, aa AS n_above, CAST(sum(t) AS BIGINT)
      |    AS chi2_e6
      |FROM terms GROUP BY nn, k, med, aa
      |ORDER BY n_docs""".stripMargin

  // ---------------------------------------------------------------------
  // q423 — Jonckheere–Terpstra ordered-alternative trend test: does
  // document length trend MONOTONICALLY across sources in index order
  // (src0 < src1 < … — e.g. ingestion epochs)? J = Σ_{a<b} U(a,b)
  // needs every ordered group pair's Mann–Whitney count, computed with
  // ZERO pair materialization: per-group exclusive cumulants on a
  // DENSE (group × value-universe) grid (domain-bounded: |groups| ×
  // |support|), then one equi-join on the value with g_a < g_b —
  // 2J = Σ c_b(v)·(2·cum_a(<v) + c_a(v)) stays integer through ties.
  // The z readout uses the standard untied null variance
  // [N²(2N+3) − Σn²(2n+3)]/72 (ties are midrank-halved in J itself);
  // mean2 = (N²−Σn²)/2 is always an even-product integer.
  // ---------------------------------------------------------------------
  private def q423(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
      .select(expr("cast(substring(source, 4) as long)").as("g"),
        col("n_chars").as("x"))
    val cnt = d.groupBy("g", "x").agg(count(lit(1)).as("c"))
    val grid = d.select("x").distinct()
      .crossJoin(broadcast(d.select("g").distinct()))
      .join(cnt, Seq("g", "x"), "left").na.fill(0L, Seq("c"))
    val wg = Window.partitionBy("g").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = grid.withColumn("cex", coalesce(sum("c").over(wg), lit(0L)))
    val j2 = cum.as("a").join(cum.as("b"),
        col("a.x") === col("b.x") && col("a.g") < col("b.g"))
      .agg(coalesce(sum(col("b.c")
        * (lit(2L) * col("a.cex") + col("a.c"))), lit(0L)).as("j_x2"))
    val stats = d.groupBy("g").agg(count(lit(1)).as("ng"))
      .agg(sum("ng").as("nn"), count(lit(1)).as("k"),
        sum(col("ng") * col("ng")).as("sn2"),
        sum(col("ng") * col("ng") * (lit(2L) * col("ng") + 3L))
          .as("sn23"))
    j2.crossJoin(broadcast(stats))
      .withColumn("mean_j_x2",
        (col("nn") * col("nn") - col("sn2")) / 2)
      .withColumn("var_num72", col("nn") * col("nn")
        * (lit(2L) * col("nn") + 3L) - col("sn23"))
      .select(col("nn").as("n_docs"), col("k").as("k_groups"),
        col("j_x2"), col("mean_j_x2").cast("long").as("mean_j_x2"),
        col("var_num72"),
        when(col("var_num72") > 0L, round(lit(1000000.0)
          * (col("j_x2") - col("mean_j_x2")).cast("double")
          / (lit(2.0) * sqrt(col("var_num72").cast("double") / 72.0)))
          .cast("long")).otherwise(lit(null).cast("long")).as("z_e6"))
      .orderBy("n_docs")
  }

  private val q423Sql =
    """WITH d AS (
      |  SELECT CAST(substring(source, 4) AS BIGINT) AS g,
      |    n_chars AS x
      |  FROM documents),
      |cnt AS (SELECT g, x, count(*) AS c FROM d GROUP BY g, x),
      |grid AS (
      |  SELECT gs.g, xs.x, COALESCE(cnt.c, 0) AS c
      |  FROM (SELECT DISTINCT x FROM d) xs
      |  CROSS JOIN (SELECT DISTINCT g FROM d) gs
      |  LEFT JOIN cnt ON cnt.g = gs.g AND cnt.x = xs.x),
      |cum AS (
      |  SELECT g, x, c,
      |    COALESCE(CAST(sum(c) OVER (PARTITION BY g ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS BIGINT), 0) AS cex
      |  FROM grid),
      |j2 AS (
      |  SELECT COALESCE(CAST(sum(b.c * (2 * a.cex + a.c)) AS BIGINT),
      |    0) AS j_x2
      |  FROM cum a JOIN cum b ON a.x = b.x AND a.g < b.g),
      |stats AS (
      |  SELECT CAST(sum(ng) AS BIGINT) AS nn, count(*) AS k,
      |    CAST(sum(ng * ng) AS BIGINT) AS sn2,
      |    CAST(sum(ng * ng * (2 * ng + 3)) AS BIGINT) AS sn23
      |  FROM (SELECT g, count(*) AS ng FROM d GROUP BY g) grp)
      |SELECT nn AS n_docs, CAST(k AS BIGINT) AS k_groups, j_x2,
      |  (nn * nn - sn2) // 2 AS mean_j_x2,
      |  nn * nn * (2 * nn + 3) - sn23 AS var_num72,
      |  CASE WHEN nn * nn * (2 * nn + 3) - sn23 > 0 THEN
      |    CAST(round(1000000.0
      |      * CAST(j_x2 - (nn * nn - sn2) // 2 AS DOUBLE)
      |      / (2.0 * sqrt(CAST(nn * nn * (2 * nn + 3) - sn23
      |        AS DOUBLE) / 72.0))) AS BIGINT)
      |  END AS z_e6
      |FROM j2 CROSS JOIN stats
      |ORDER BY n_docs""".stripMargin

  // ---------------------------------------------------------------------
  // q424 — two-sample decile shift (quantile treatment effect): WHERE
  // in the distribution does click differ from view — uniformly, or
  // only in the tails? Nine exact type-1 decile order statistics per
  // side (rank ⌈p·n/10⌉ = (p·n+9) div 10 — observed values, no
  // interpolation), one row per decile with the integer shift. The
  // per-side rank windows partition by arm; the decile probe is a
  // 9-row broadcast join. Complements the single-number distances
  // (q405–q407, q415) with the full shift PROFILE.
  // ---------------------------------------------------------------------
  private def q424(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("v"))
    val wr = Window.partitionBy("event_type")
      .orderBy(col("v"), col("event_id"))
    val wn = Window.partitionBy("event_type")
    val ranked = e
      .withColumn("rn", row_number().over(wr).cast("long"))
      .withColumn("ni", count(lit(1)).over(wn))
    val ps = s.range(1, 10).select(col("id").as("p10"))
    ranked.join(broadcast(ps),
        col("rn") === expr("(p10 * ni + 9) div 10"))
      .groupBy("p10")
      .agg(min(when(col("event_type") === "click", col("v")))
        .as("q_click"),
        min(when(col("event_type") === "view", col("v")))
          .as("q_view"))
      .select(col("p10"), col("q_click"), col("q_view"),
        (col("q_click") - col("q_view")).as("qte"))
      .orderBy("p10")
  }

  private val q424Sql =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE event_type IN ('click', 'view')),
      |ranked AS (
      |  SELECT event_type, v,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY v, event_id) AS BIGINT) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS ni
      |  FROM e),
      |ps AS (SELECT unnest(generate_series(1, 9)) AS p10)
      |SELECT CAST(p10 AS BIGINT) AS p10,
      |  min(CASE WHEN event_type = 'click' THEN v END) AS q_click,
      |  min(CASE WHEN event_type = 'view' THEN v END) AS q_view,
      |  min(CASE WHEN event_type = 'click' THEN v END)
      |    - min(CASE WHEN event_type = 'view' THEN v END) AS qte
      |FROM ranked JOIN ps ON rn = (p10 * ni + 9) // 10
      |GROUP BY p10
      |ORDER BY p10""".stripMargin

  // ---------------------------------------------------------------------
  // q427 — log-rank test (Mantel–Cox) with right censoring: do users
  // who ever purchased stay active longer? Lifetime = last−first
  // active day; a user still active on the corpus's final day is
  // CENSORED (contributes to at-risk sets, never to deaths) — the
  // survival bookkeeping naive churn averages get wrong. At-risk
  // counts come off the day-span axis as reverse cumulants (≤31
  // rows); each death time's expected-deaths and variance terms are
  // e9-rounded AT THE ROW (q375 discipline) in one fixed IEEE chain;
  // χ² = (O−E)²/V is the single readout division.
  // ---------------------------------------------------------------------
  private def q427(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("user_id"), to_date(col("ts_s")).as("d"),
        col("event_type"))
    val byUser = e.groupBy("user_id").agg(
      min(col("d")).as("fd"), max(col("d")).as("ld"),
      max((col("event_type") === "purchase").cast("long")).as("grp"))
    val maxDay = e.agg(max(col("d")).as("md"))
    val users = byUser.crossJoin(broadcast(maxDay))
      .select(col("grp"),
        datediff(col("ld"), col("fd")).cast("long").as("t"),
        (col("ld") < col("md")).cast("long").as("death"))
    val perT = users.groupBy("t").agg(
      sum(when(col("grp") === 1L, 1L).otherwise(0L)).as("c1"),
      sum(when(col("grp") === 0L, 1L).otherwise(0L)).as("c0"),
      sum(when(col("grp") === 1L && col("death") === 1L, 1L)
        .otherwise(0L)).as("d1"),
      sum(when(col("grp") === 0L && col("death") === 1L, 1L)
        .otherwise(0L)).as("d0"))
    val wd = axis(col("t").desc).rowsBetween(Window.unboundedPreceding, 0)
    val terms = perT
      .withColumn("n1", sum("c1").over(wd))
      .withColumn("n0", sum("c0").over(wd))
      .filter(col("d1") + col("d0") > 0L)
      .withColumn("dt", col("d1") + col("d0"))
      .withColumn("nt", col("n1") + col("n0"))
      .withColumn("e1_e9", round(lit(1000000000.0)
        * col("dt").cast("double") * col("n1").cast("double")
        / col("nt").cast("double")).cast("long"))
      .withColumn("v_e9", when(col("nt") > 1L,
        round(lit(1000000000.0) * col("dt").cast("double")
          * col("n1").cast("double") / col("nt").cast("double")
          * col("n0").cast("double") / col("nt").cast("double")
          * (col("nt") - col("dt")).cast("double")
          / (col("nt") - 1L).cast("double")).cast("long"))
        .otherwise(0L))
    val tot = users.agg(
      sum(when(col("grp") === 1L, 1L).otherwise(0L)).as("n1_users"),
      sum(when(col("grp") === 0L, 1L).otherwise(0L)).as("n0_users"))
    terms.agg(sum("d1").as("o1"), sum("e1_e9").as("e1_e9"),
        sum("v_e9").as("v_e9"))
      .crossJoin(broadcast(tot))
      .select(col("n1_users"), col("n0_users"), col("o1"),
        col("e1_e9"), col("v_e9"),
        when(col("v_e9") > 0L, round(lit(1000000.0)
          * (col("o1") * lit(1000000000L) - col("e1_e9")).cast("double")
          * (col("o1") * lit(1000000000L) - col("e1_e9")).cast("double")
          / (lit(1000000000.0) * col("v_e9").cast("double")))
          .cast("long")).otherwise(lit(null).cast("long"))
          .as("chi2_e6"))
      .orderBy("n1_users")
  }

  private val q427Sql =
    """WITH e AS (
      |  SELECT user_id, CAST(date_trunc('second', ts) AS DATE) AS d,
      |    event_type
      |  FROM events),
      |by_user AS (
      |  SELECT user_id, min(d) AS fd, max(d) AS ld,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS grp
      |  FROM e GROUP BY user_id),
      |md AS (SELECT max(d) AS md FROM e),
      |users AS (
      |  SELECT grp, CAST(ld - fd AS BIGINT) AS t,
      |    CASE WHEN ld < md THEN 1 ELSE 0 END AS death
      |  FROM by_user CROSS JOIN md),
      |per_t AS (
      |  SELECT t,
      |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c1,
      |    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS c0,
      |    CAST(sum(CASE WHEN grp = 1 AND death = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS d1,
      |    CAST(sum(CASE WHEN grp = 0 AND death = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS d0
      |  FROM users GROUP BY t),
      |risk AS (
      |  SELECT *, CAST(sum(c1) OVER w AS BIGINT) AS n1,
      |    CAST(sum(c0) OVER w AS BIGINT) AS n0
      |  FROM per_t
      |  WINDOW w AS (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)),
      |terms AS (
      |  SELECT d1, d1 + d0 AS dt, n1, n0, n1 + n0 AS nt,
      |    CAST(round(1000000000.0 * CAST(d1 + d0 AS DOUBLE)
      |      * CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)) AS BIGINT)
      |      AS e1_e9,
      |    CASE WHEN n1 + n0 > 1 THEN
      |      CAST(round(1000000000.0 * CAST(d1 + d0 AS DOUBLE)
      |        * CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)
      |        * CAST(n0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)
      |        * CAST(n1 + n0 - (d1 + d0) AS DOUBLE)
      |        / CAST(n1 + n0 - 1 AS DOUBLE)) AS BIGINT)
      |    ELSE 0 END AS v_e9
      |  FROM risk WHERE d1 + d0 > 0),
      |tot AS (
      |  SELECT CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n1_users,
      |    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n0_users
      |  FROM users),
      |agg AS (
      |  SELECT CAST(sum(d1) AS BIGINT) AS o1,
      |    CAST(sum(e1_e9) AS BIGINT) AS e1_e9,
      |    CAST(sum(v_e9) AS BIGINT) AS v_e9
      |  FROM terms)
      |SELECT n1_users, n0_users, o1, e1_e9, v_e9,
      |  CASE WHEN v_e9 > 0 THEN
      |    CAST(round(1000000.0
      |      * CAST(o1 * 1000000000 - e1_e9 AS DOUBLE)
      |      * CAST(o1 * 1000000000 - e1_e9 AS DOUBLE)
      |      / (1000000000.0 * CAST(v_e9 AS DOUBLE))) AS BIGINT)
      |  END AS chi2_e6
      |FROM agg CROSS JOIN tot
      |ORDER BY n1_users""".stripMargin

  // ---------------------------------------------------------------------
  // q428 — Nelson–Aalen cumulative hazard: the hazard-SUM twin of the
  // gated Kaplan–Meier survival curve (q274 estimates S(t) by a
  // product; Ĥ(t) = Σ_{s≤t} d_s/n_s estimates −ln S(t) by a sum —
  // the sum form is what drift monitors difference week over week).
  // Same censoring bookkeeping as q427; per-time d/n is e9-rounded AT
  // THE ROW, the cumulative hazard is then an exact integer cumulant
  // along the ≤31-row day-span axis.
  // ---------------------------------------------------------------------
  private def q428(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
      .select(col("user_id"), to_date(col("ts_s")).as("d"))
    val byUser = e.groupBy("user_id")
      .agg(min(col("d")).as("fd"), max(col("d")).as("ld"))
    val maxDay = e.agg(max(col("d")).as("md"))
    val users = byUser.crossJoin(broadcast(maxDay))
      .select(datediff(col("ld"), col("fd")).cast("long").as("t"),
        (col("ld") < col("md")).cast("long").as("death"))
    val perT = users.groupBy("t").agg(count(lit(1)).as("c"),
      sum(col("death")).as("dd"))
    val wd = axis(col("t").desc).rowsBetween(Window.unboundedPreceding, 0)
    val wa = axis(col("t")).rowsBetween(Window.unboundedPreceding, 0)
    perT
      .withColumn("n_at_risk", sum("c").over(wd))
      .withColumn("h_inc_e9", round(lit(1000000000.0)
        * col("dd").cast("double") / col("n_at_risk").cast("double"))
        .cast("long"))
      .withColumn("h_e9", sum("h_inc_e9").over(wa))
      .select(col("t"), col("n_at_risk"), col("dd").as("d_events"),
        col("h_e9"))
      .orderBy("t")
  }

  private val q428Sql =
    """WITH e AS (
      |  SELECT user_id, CAST(date_trunc('second', ts) AS DATE) AS d
      |  FROM events),
      |by_user AS (
      |  SELECT user_id, min(d) AS fd, max(d) AS ld FROM e
      |  GROUP BY user_id),
      |md AS (SELECT max(d) AS md FROM e),
      |users AS (
      |  SELECT CAST(ld - fd AS BIGINT) AS t,
      |    CASE WHEN ld < md THEN 1 ELSE 0 END AS death
      |  FROM by_user CROSS JOIN md),
      |per_t AS (
      |  SELECT t, count(*) AS c, CAST(sum(death) AS BIGINT) AS dd
      |  FROM users GROUP BY t),
      |risk AS (
      |  SELECT *, CAST(sum(c) OVER (ORDER BY t DESC ROWS BETWEEN
      |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_at_risk
      |  FROM per_t),
      |inc AS (
      |  SELECT *, CAST(round(1000000000.0 * CAST(dd AS DOUBLE)
      |    / CAST(n_at_risk AS DOUBLE)) AS BIGINT) AS h_inc_e9
      |  FROM risk)
      |SELECT t, n_at_risk, dd AS d_events,
      |  CAST(sum(h_inc_e9) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
      |    PRECEDING AND CURRENT ROW) AS BIGINT) AS h_e9
      |FROM inc ORDER BY t""".stripMargin

  // ---------------------------------------------------------------------
  // q429 — forecast-quality audit (MASE + sMAPE) per event type: the
  // expanding-mean "model" (q411's μ̂, one day ahead) against the
  // naive lag-1 forecast. MASE = Σ|y−ŷ_model| / Σ|y−ŷ_naive| needs
  // NO per-day division — both error sums are exact cents longs and
  // the ratio is ONE readout division (MASE < 1 ⇔ the model beats
  // naive, the scale-free forecast verdict). sMAPE terms are
  // e9-rounded per day. Day grain per type — bounded by span.
  // ---------------------------------------------------------------------
  private def q429(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.eventsSec(s, dir)
      .select(col("event_type"), to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("event_type", "day").agg(sum("v").as("sd"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val wp = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val scored = daily
      .withColumn("prev", lag(col("sd"), 1).over(w))
      .withColumn("model", round(sum("sd").over(wp).cast("double")
        / count(lit(1)).over(wp).cast("double")).cast("long"))
      .filter(col("prev").isNotNull)
      .withColumn("em", abs(col("sd") - col("model")))
      .withColumn("en", abs(col("sd") - col("prev")))
      .withColumn("sm_e9", round(lit(1000000000.0) * lit(2.0)
        * abs(col("sd") - col("model")).cast("double")
        / (col("sd") + col("model")).cast("double")).cast("long"))
    scored.groupBy("event_type")
      .agg(count(lit(1)).as("n_days_eval"),
        sum("em").as("sum_err_model"), sum("en").as("sum_err_naive"),
        sum("sm_e9").as("sum_smape_e9"))
      .select(col("event_type"), col("n_days_eval"),
        col("sum_err_model"), col("sum_err_naive"),
        when(col("sum_err_naive") > 0L, round(lit(1000000.0)
          * col("sum_err_model").cast("double")
          / col("sum_err_naive").cast("double")).cast("long"))
          .otherwise(lit(null).cast("long")).as("mase_e6"),
        round(col("sum_smape_e9").cast("double")
          / col("n_days_eval").cast("double") / 1000.0).cast("long")
          .as("smape_e6"))
      .orderBy("event_type")
  }

  private val q429Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('second', ts) AS DATE)
      |      AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS sd
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT event_type, sd,
      |    lag(sd) OVER w AS prev,
      |    CAST(round(CAST(sum(sd) OVER wp AS DOUBLE)
      |      / CAST(count(*) OVER wp AS DOUBLE)) AS BIGINT) AS model
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day),
      |    wp AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN
      |      UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |errs AS (
      |  SELECT event_type, abs(sd - model) AS em, abs(sd - prev) AS en,
      |    CAST(round(1000000000.0 * 2.0
      |      * CAST(abs(sd - model) AS DOUBLE)
      |      / CAST(sd + model AS DOUBLE)) AS BIGINT) AS sm_e9
      |  FROM scored WHERE prev IS NOT NULL)
      |SELECT event_type, count(*) AS n_days_eval,
      |  CAST(sum(em) AS BIGINT) AS sum_err_model,
      |  CAST(sum(en) AS BIGINT) AS sum_err_naive,
      |  CASE WHEN sum(en) > 0 THEN
      |    CAST(round(1000000.0 * CAST(sum(em) AS DOUBLE)
      |      / CAST(sum(en) AS DOUBLE)) AS BIGINT) END AS mase_e6,
      |  CAST(round(CAST(sum(sm_e9) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) / 1000.0) AS BIGINT) AS smape_e6
      |FROM errs GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q430 — pinball (quantile) loss evaluation: per event type, train
  // static q10/q50/q90 predictors on the FIRST HALF of days (exact
  // type-1 order statistics) and score the second half with
  // L_τ(y,ŷ) = max(τ(y−ŷ), (τ−1)(y−ŷ)) — scaled ×10 so every loss is
  // an exact long (τ·10 ∈ {1,5,9}). The readout a quantile-forecast
  // service actually monitors: is the q90 predictor's pinball loss
  // where a q90 should sit? One rank window per type, a 3-row
  // broadcast of predictors, exact integer loss sums.
  // ---------------------------------------------------------------------
  private def q430(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.eventsSec(s, dir)
      .select(col("event_type"), to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("event_type", "day").agg(sum("v").as("sd"))
    val wDay = Window.partitionBy("event_type").orderBy("day")
    val wN = Window.partitionBy("event_type")
    val halved = daily
      .withColumn("rn", row_number().over(wDay).cast("long"))
      .withColumn("n", count(lit(1)).over(wN))
    val train = halved.filter(col("rn") <= expr("n div 2"))
    val wTrain = Window.partitionBy("event_type")
      .orderBy(col("sd"), col("day"))
    val preds = train
      .withColumn("rt", row_number().over(wTrain).cast("long"))
      .withColumn("ntr", count(lit(1)).over(wN))
      .groupBy("event_type")
      .agg(
        min(when(col("rt") === expr("(1 * ntr + 9) div 10"), col("sd")))
          .as("p1"),
        min(when(col("rt") === expr("(5 * ntr + 9) div 10"), col("sd")))
          .as("p5"),
        min(when(col("rt") === expr("(9 * ntr + 9) div 10"), col("sd")))
          .as("p9"))
      .select(col("event_type"), explode(array(
        struct(lit(1L).as("tau10"), col("p1").as("pred")),
        struct(lit(5L).as("tau10"), col("p5").as("pred")),
        struct(lit(9L).as("tau10"), col("p9").as("pred")))).as("p"))
      .select(col("event_type"), col("p.tau10").as("tau10"),
        col("p.pred").as("pred"))
    halved.filter(col("rn") > expr("n div 2"))
      .join(broadcast(preds), Seq("event_type"))
      .withColumn("loss_x10", greatest(
        col("tau10") * (col("sd") - col("pred")),
        (col("tau10") - 10L) * (col("sd") - col("pred"))))
      .groupBy("event_type", "tau10")
      .agg(max(col("pred")).as("pred"), count(lit(1)).as("n_test"),
        sum("loss_x10").as("sum_loss_x10"))
      .select(col("event_type"), col("tau10"), col("pred"),
        col("n_test"), col("sum_loss_x10"),
        round(col("sum_loss_x10").cast("double")
          / col("n_test").cast("double") / 10.0).cast("long")
          .as("mean_loss_e0"))
      .orderBy("event_type", "tau10")
  }

  private val q430Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('second', ts) AS DATE)
      |      AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS sd
      |  FROM events GROUP BY 1, 2),
      |halved AS (
      |  SELECT event_type, day, sd,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY day) AS BIGINT) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM daily),
      |train AS (
      |  SELECT event_type, sd,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY sd, day) AS BIGINT) AS rt,
      |    count(*) OVER (PARTITION BY event_type) AS ntr
      |  FROM halved WHERE rn <= n // 2),
      |preds0 AS (
      |  SELECT event_type,
      |    min(CASE WHEN rt = (1 * ntr + 9) // 10 THEN sd END) AS p1,
      |    min(CASE WHEN rt = (5 * ntr + 9) // 10 THEN sd END) AS p5,
      |    min(CASE WHEN rt = (9 * ntr + 9) // 10 THEN sd END) AS p9
      |  FROM train GROUP BY event_type),
      |preds AS (
      |  SELECT event_type, 1 AS tau10, p1 AS pred FROM preds0
      |  UNION ALL SELECT event_type, 5, p5 FROM preds0
      |  UNION ALL SELECT event_type, 9, p9 FROM preds0),
      |test AS (SELECT event_type, sd FROM halved WHERE rn > n // 2),
      |losses AS (
      |  SELECT t.event_type, p.tau10, p.pred,
      |    greatest(p.tau10 * (t.sd - p.pred),
      |      (p.tau10 - 10) * (t.sd - p.pred)) AS loss_x10
      |  FROM test t JOIN preds p ON t.event_type = p.event_type)
      |SELECT event_type, CAST(tau10 AS BIGINT) AS tau10,
      |  CAST(max(pred) AS BIGINT) AS pred, count(*) AS n_test,
      |  CAST(sum(loss_x10) AS BIGINT) AS sum_loss_x10,
      |  CAST(round(CAST(sum(loss_x10) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) / 10.0) AS BIGINT)
      |    AS mean_loss_e0
      |FROM losses GROUP BY event_type, tau10
      |ORDER BY event_type, tau10""".stripMargin

  // ---------------------------------------------------------------------
  // q431 — stationary distribution of the event-type Markov chain by
  // power iteration, cross-engine EXACT: transitions come from
  // per-user LAG pairs (the q392/q102 grain); the probability vector
  // lives as e9-scaled longs, and every iteration's matrix–vector
  // product rounds PER TERM (round(v_i·c_ij/r_i) — one deterministic
  // IEEE division per edge) before the integer sum, so both engines
  // walk the identical lattice point sequence for all 12 iterations —
  // the oracle UNROLLS the same 12 steps as generated CTEs. The chain
  // is the |event_type|² grain — domain-sized; the only corpus pass
  // is the transition count.
  // ---------------------------------------------------------------------
  private val markovIters = 12

  private def q431(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_s"), col("event_id"))
    val trans = Tables.eventsSec(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_s"),
        col("event_type").as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
    val rowTot = trans.groupBy("cur").agg(sum("c").as("r"))
    // pin the domain-sized edge table (r12): without it the corpus
    // pass (events window + transition count) ran TWICE — once under
    // states.count() and once inside the final 12-step plan — and the
    // unrolled loop replanned the whole corpus subtree 12 times
    // (ReusedExchange dedups the execution, not the planning). The
    // pinned grain is |event_type|² rows, the measured corpus pass
    // happens exactly once, and each power-iteration joins a
    // checkpoint scan. Same lattice walk, identical result.
    val edges = trans.join(rowTot, Seq("cur")).pin()
    val states = edges.select(col("cur").as("state")).distinct()
    val nStates = states.count() // domain-sized (≤ event-type universe)
    var v = states.select(col("state"),
      lit(1000000000L / nStates).as("v")) // exact integer share
    for (_ <- 1 to markovIters) {
      v = edges.join(v, col("cur") === col("state"))
        .select(col("nxt"),
          round(col("v").cast("double") * col("c").cast("double")
            / col("r").cast("double")).cast("long").as("t"))
        .groupBy(col("nxt")).agg(sum("t").as("v"))
        .select(col("nxt").as("state"), col("v"))
    }
    v.select(col("state").as("event_type"), col("v").as("pi_e9"))
      .orderBy("event_type")
  }

  private val q431Sql = {
    val steps = (1 to markovIters).map { k =>
      s"""v$k AS (
         |  SELECT nxt AS state,
         |    CAST(sum(CAST(round(CAST(v AS DOUBLE) * CAST(c AS DOUBLE)
         |      / CAST(r AS DOUBLE)) AS BIGINT)) AS BIGINT) AS v
         |  FROM edges JOIN v${k - 1} ON cur = state
         |  GROUP BY nxt)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT event_type AS cur,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY date_trunc('second', ts), event_id) AS nxt
       |  FROM events),
       |trans AS (
       |  SELECT cur, nxt, count(*) AS c FROM pairs
       |  WHERE nxt IS NOT NULL GROUP BY cur, nxt),
       |row_tot AS (SELECT cur, CAST(sum(c) AS BIGINT) AS r FROM trans
       |  GROUP BY cur),
       |edges AS (SELECT t.cur, t.nxt, t.c, rt.r FROM trans t
       |  JOIN row_tot rt ON t.cur = rt.cur),
       |n_states AS (SELECT count(*) AS ns FROM row_tot),
       |v0 AS (SELECT cur AS state,
       |  CAST(1000000000 // ns AS BIGINT) AS v
       |  FROM row_tot CROSS JOIN n_states),
       |$steps
       |SELECT state AS event_type, v AS pi_e9 FROM v$markovIters
       |ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q432 — empirical-Bayes (beta) shrinkage of per-user purchase
  // rates: the smoothed-rates op every per-entity dashboard needs —
  // a 3-event user with 1 purchase is NOT a 33% converter. Beta prior
  // by method of moments on the per-user e9 rates (exact long /
  // decimal sufficient statistics; α, β emerge from ONE readout chain
  // in identical IEEE order, e6-rounded; degenerate moments fall back
  // to the documented Laplace (1,1) prior). Each user's shrunk rate
  // (k+α)/(n+α+β) is then ONE per-row division of exact longs — the
  // e6-scaled α/β clear the fractions. Reports the 20 most-shrunk
  // users (unique tiebreak), i.e. exactly the entities a raw-rate
  // ranking most misleads on.
  // ---------------------------------------------------------------------
  private def q432(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.eventsSec(s, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("k"))
      .withColumn("r_e9", round(lit(1000000000.0)
        * col("k").cast("double") / col("n").cast("double"))
        .cast("long"))
    val mom = perUser.agg(count(lit(1)).as("u"), sum("r_e9").as("sr"),
        sum(col("r_e9").cast(dec) * col("r_e9")).as("sr2"))
      .withColumn("m", col("sr").cast("double")
        / (col("u").cast("double") * 1000000000.0))
      .withColumn("vv", col("sr2").cast("double")
        / (col("u").cast("double") * 1.0e18)
        - col("m") * col("m"))
      .withColumn("phi", col("m") * (lit(1.0) - col("m")) / col("vv")
        - lit(1.0))
      .select(
        when(col("vv") > 0.0 && col("phi") > 0.0,
          round(lit(1000000.0) * col("m") * col("phi")).cast("long"))
          .otherwise(1000000L).as("alpha_e6"),
        when(col("vv") > 0.0 && col("phi") > 0.0,
          round(lit(1000000.0) * (lit(1.0) - col("m")) * col("phi"))
            .cast("long"))
          .otherwise(1000000L).as("beta_e6"))
    perUser.crossJoin(broadcast(mom))
      .select(col("user_id"), col("n"), col("k"),
        round(lit(1000000.0) * col("k").cast("double")
          / col("n").cast("double")).cast("long").as("raw_e6"),
        round(lit(1000000.0)
          * (col("k") * lit(1000000L) + col("alpha_e6")).cast("double")
          / (col("n") * lit(1000000L) + col("alpha_e6")
            + col("beta_e6")).cast("double")).cast("long")
          .as("shrunk_e6"),
        col("alpha_e6"), col("beta_e6"))
      .orderBy(abs(col("shrunk_e6") - col("raw_e6")).desc,
        col("user_id"))
      .limit(20)
  }

  private val q432Sql =
    """WITH per_user AS (
      |  SELECT user_id, count(*) AS n,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |      END) AS BIGINT) AS k
      |  FROM events GROUP BY user_id),
      |rates AS (
      |  SELECT *, CAST(round(1000000000.0 * CAST(k AS DOUBLE)
      |    / CAST(n AS DOUBLE)) AS BIGINT) AS r_e9
      |  FROM per_user),
      |mom0 AS (
      |  SELECT count(*) AS u, CAST(sum(r_e9) AS BIGINT) AS sr,
      |    sum(CAST(r_e9 AS HUGEINT) * r_e9) AS sr2
      |  FROM rates),
      |mom1 AS (
      |  SELECT u, sr, sr2,
      |    CAST(sr AS DOUBLE) / (CAST(u AS DOUBLE) * 1000000000.0)
      |      AS m,
      |    CAST(sr2 AS DOUBLE) / (CAST(u AS DOUBLE) * 1.0e18)
      |      - (CAST(sr AS DOUBLE) / (CAST(u AS DOUBLE)
      |        * 1000000000.0))
      |      * (CAST(sr AS DOUBLE) / (CAST(u AS DOUBLE)
      |        * 1000000000.0)) AS vv
      |  FROM mom0),
      |mom2 AS (
      |  SELECT m, vv, m * (1.0 - m) / vv - 1.0 AS phi FROM mom1),
      |prior AS (
      |  SELECT
      |    CASE WHEN vv > 0.0 AND phi > 0.0 THEN
      |      CAST(round(1000000.0 * m * phi) AS BIGINT)
      |    ELSE 1000000 END AS alpha_e6,
      |    CASE WHEN vv > 0.0 AND phi > 0.0 THEN
      |      CAST(round(1000000.0 * (1.0 - m) * phi) AS BIGINT)
      |    ELSE 1000000 END AS beta_e6
      |  FROM mom2)
      |SELECT user_id, n, k,
      |  CAST(round(1000000.0 * CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
      |    AS BIGINT) AS raw_e6,
      |  CAST(round(1000000.0
      |    * CAST(k * 1000000 + alpha_e6 AS DOUBLE)
      |    / CAST(n * 1000000 + alpha_e6 + beta_e6 AS DOUBLE))
      |    AS BIGINT) AS shrunk_e6,
      |  alpha_e6, beta_e6
      |FROM per_user CROSS JOIN prior
      |ORDER BY abs(CAST(round(1000000.0
      |    * CAST(k * 1000000 + alpha_e6 AS DOUBLE)
      |    / CAST(n * 1000000 + alpha_e6 + beta_e6 AS DOUBLE))
      |    AS BIGINT)
      |  - CAST(round(1000000.0 * CAST(k AS DOUBLE)
      |    / CAST(n AS DOUBLE)) AS BIGINT)) DESC, user_id
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q433 — bandit-regret replay of the greedy policy: treat event
  // types as arms (reward = value), replay "pick the arm with the best
  // PRIOR-days mean" day by day, and charge the realized regret
  // against the per-day oracle best arm — the offline policy audit an
  // experimentation platform runs before trusting a bandit rollout.
  // Per-(arm, day) means and expanding prior means are per-row e4
  // divisions; arg-max is the packed-key max (mean·8 + reversed arm
  // index — the q151 tiebreak discipline, alphabetically-first arm
  // wins ties, day 1 has zero priors and falls back to that
  // tiebreak); cumulative regret is an exact long cumulant on the
  // day axis. Only arms OBSERVED on a day are eligible that day —
  // the identical convention on both engines.
  // ---------------------------------------------------------------------
  private def q433(s: SparkSession, dir: String): DataFrame = {
    val idx = when(col("arm") === "click", 0L)
      .when(col("arm") === "error", 1L)
      .when(col("arm") === "purchase", 2L)
      .when(col("arm") === "signup", 3L).otherwise(4L)
    val daily = Tables.eventsSec(s, dir)
      .select(col("event_type").as("arm"), to_date(col("ts_s")).as("day"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy("arm", "day").agg(count(lit(1)).as("nd"),
        sum("v").as("sd"))
      .withColumn("mean_e4", round(lit(10000.0) * col("sd").cast("double")
        / col("nd").cast("double")).cast("long"))
    val wp = Window.partitionBy("arm").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val scored = daily
      .withColumn("pn", coalesce(sum("nd").over(wp), lit(0L)))
      .withColumn("ps", coalesce(sum("sd").over(wp), lit(0L)))
      .withColumn("prior_e4", when(col("pn") > 0L,
        round(lit(10000.0) * col("ps").cast("double")
          / col("pn").cast("double")).cast("long")).otherwise(0L))
      .withColumn("pick_key", col("prior_e4") * 8L + (lit(4L) - idx))
      .withColumn("best_key", col("mean_e4") * 8L + (lit(4L) - idx))
    val keys = scored.groupBy("day").agg(max("pick_key").as("pk"),
      max("best_key").as("bk"))
    val picked = scored.alias("s1").join(keys.alias("k1"),
        col("s1.day") === col("k1.day")
          && col("s1.pick_key") === col("k1.pk"))
      .select(col("s1.day").as("day"), col("s1.arm").as("picked_arm"),
        col("s1.mean_e4").as("picked_mean_e4"))
    val best = scored.alias("s2").join(keys.alias("k2"),
        col("s2.day") === col("k2.day")
          && col("s2.best_key") === col("k2.bk"))
      .select(col("s2.day").as("day"), col("s2.arm").as("best_arm"),
        col("s2.mean_e4").as("best_mean_e4"))
    val wc = axis(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    picked.alias("p").join(best.alias("b"),
        col("p.day") === col("b.day"))
      .select(col("p.day").as("day"), col("picked_arm"),
        col("picked_mean_e4"), col("best_arm"), col("best_mean_e4"))
      .withColumn("regret_e4", col("best_mean_e4")
        - col("picked_mean_e4"))
      .withColumn("cum_regret_e4", sum("regret_e4").over(wc))
      .orderBy("day")
  }

  private val q433Sql =
    """WITH daily AS (
      |  SELECT event_type AS arm,
      |    CAST(date_trunc('second', ts) AS DATE) AS day,
      |    count(*) AS nd,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS sd
      |  FROM events GROUP BY 1, 2),
      |scored AS (
      |  SELECT arm, day,
      |    CAST(round(10000.0 * CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE))
      |      AS BIGINT) AS mean_e4,
      |    COALESCE(CAST(sum(nd) OVER wp AS BIGINT), 0) AS pn,
      |    COALESCE(CAST(sum(sd) OVER wp AS BIGINT), 0) AS ps,
      |    CASE arm WHEN 'click' THEN 0 WHEN 'error' THEN 1
      |      WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END
      |      AS idx
      |  FROM daily
      |  WINDOW wp AS (PARTITION BY arm ORDER BY day ROWS BETWEEN
      |    UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |keyed AS (
      |  SELECT *,
      |    (CASE WHEN pn > 0 THEN CAST(round(10000.0
      |      * CAST(ps AS DOUBLE) / CAST(pn AS DOUBLE)) AS BIGINT)
      |      ELSE 0 END) * 8 + (4 - idx) AS pick_key,
      |    mean_e4 * 8 + (4 - idx) AS best_key
      |  FROM scored),
      |keys AS (
      |  SELECT day, max(pick_key) AS pk, max(best_key) AS bk
      |  FROM keyed GROUP BY day),
      |picked AS (
      |  SELECT k.day, s.arm AS picked_arm,
      |    s.mean_e4 AS picked_mean_e4
      |  FROM keyed s JOIN keys k ON s.day = k.day
      |    AND s.pick_key = k.pk),
      |best AS (
      |  SELECT k.day, s.arm AS best_arm, s.mean_e4 AS best_mean_e4
      |  FROM keyed s JOIN keys k ON s.day = k.day
      |    AND s.best_key = k.bk),
      |joined AS (
      |  SELECT p.day, p.picked_arm, p.picked_mean_e4, b.best_arm,
      |    b.best_mean_e4,
      |    b.best_mean_e4 - p.picked_mean_e4 AS regret_e4
      |  FROM picked p JOIN best b ON p.day = b.day)
      |SELECT day, picked_arm, picked_mean_e4, best_arm, best_mean_e4,
      |  regret_e4,
      |  CAST(sum(regret_e4) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
      |    PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_regret_e4
      |FROM joined ORDER BY day""".stripMargin

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
    "q416_hodges_lehmann" -> (q416 _),
    "q417_anderson_darling" -> (q417 _),
    "q418_cliffs_delta" -> (q418 _),
    "q419_friedman_kendall_w" -> (q419 _),
    "q420_cochrans_q" -> (q420 _),
    "q421_theil_index" -> (q421 _),
    "q422_mood_median" -> (q422 _),
    "q423_jonckheere_terpstra" -> (q423 _),
    "q424_decile_shift" -> (q424 _),
    "q427_logrank" -> (q427 _),
    "q428_nelson_aalen" -> (q428 _),
    "q429_forecast_mase" -> (q429 _),
    "q430_pinball_loss" -> (q430 _),
    "q431_markov_stationary" -> (q431 _),
    "q432_eb_shrinkage" -> (q432 _),
    "q433_bandit_regret" -> (q433 _))

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
    "q416_hodges_lehmann" -> q416Sql,
    "q417_anderson_darling" -> q417Sql,
    "q418_cliffs_delta" -> q418Sql,
    "q419_friedman_kendall_w" -> q419Sql,
    "q420_cochrans_q" -> q420Sql,
    "q421_theil_index" -> q421Sql,
    "q422_mood_median" -> q422Sql,
    "q423_jonckheere_terpstra" -> q423Sql,
    "q424_decile_shift" -> q424Sql,
    "q427_logrank" -> q427Sql,
    "q428_nelson_aalen" -> q428Sql,
    "q429_forecast_mase" -> q429Sql,
    "q430_pinball_loss" -> q430Sql,
    "q431_markov_stationary" -> q431Sql,
    "q432_eb_shrinkage" -> q432Sql,
    "q433_bandit_regret" -> q433Sql)
}
