package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the reference's
  * `utils/data_validation.py` capability (file absent from the
  * snapshot; behavior evidenced by `README.md:22` and the ingest
  * lambdas' null-guarded inserts, e.g. `lambda/air_lambda.py:57-60`)
  * as a Spark operator pair.
  *
  * Scale shape: [[profile]] is ONE scan with an aggregate of
  * conditional sums (map-side combined — the violation report costs a
  * single pass no matter how many rules); [[split]] is a per-row
  * filter, no shuffle at all. Rules are plain `Column` predicates, so
  * everything stays in whole-stage codegen and pushes down where the
  * scan supports it.
  */
object Validate {

  /** A named row-level constraint. `predicate` must be true for a
    * clean row; null predicate results count as violations (null-safe
    * like SQL CHECK ... IS NOT FALSE inverted). */
  case class Rule(name: String, predicate: Column)

  /** One row per rule: (rule, n_violations, n_rows). Single scan. */
  def profile(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      sum(when(coalesce(r.predicate, lit(false)), 0L).otherwise(1L))
        .as(r.name)) :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map(r =>
      s"'${r.name}', ${r.name}").mkString(", ")
    wide.select(expr(
        s"stack(${rules.length}, $stacked) AS (rule, n_violations)"),
        col("__n").as("n_rows"))
      .select(col("rule"), col("n_violations"), col("n_rows"))
  }

  /** Fixed-width numeric histogram for profiling — integer-exact by
    * construction: values are first scaled to e4 fixed-point BIGINTs,
    * the bin width is the integer ⌈range/bins⌉, and bin assignment is
    * integer division — so the SAME bins come out of any engine,
    * layout, or float library (a double-width histogram puts
    * boundary values in different bins at 1 ulp of divergence).
    *
    * Scale: one tiny (min,max) aggregate broadcast back, then a
    * per-row bin id and a `bins`-row groupBy — two scans, the second
    * shuffling only `bins` partial rows per task.
    *
    * Returns (bin_idx, lo_e4, n, min_e4, max_e4): bin k covers
    * [lo + k·w, lo + (k+1)·w) in e4 units; empty bins are absent. */
  def histogram(df: DataFrame, valueCol: Column, bins: Int): DataFrame = {
    require(bins > 0, s"bins=$bins must be > 0")
    val e4 = round(valueCol * 10000).cast("long")
    val bounds = df.agg(min(e4).as("__lo"), max(e4).as("__hi"))
    df.select(e4.as("__v"))
      .crossJoin(broadcast(bounds))
      .withColumn("__w",
        expr(s"(__hi - __lo + $bins) div $bins")) // ceil((hi-lo+1)/bins)
      .withColumn("bin_idx", expr("(__v - __lo) div __w"))
      .groupBy(col("bin_idx"))
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("min_e4"), max(col("__v")).as("max_e4"),
        min(col("__lo") + col("bin_idx") * col("__w")).as("lo_e4"))
      .select(col("bin_idx"), col("lo_e4"), col("n"),
        col("min_e4"), col("max_e4"))
  }

  /** Order-independent table checksum — the migration/integrity audit
    * op: after any copy, merge, compaction, or engine switch, two
    * sides agree iff their (count, xor, modular-sum) triples agree
    * per group. The row digest is the portable 60-bit hash of a
    * caller-built canonical serialization, so ANY engine (the DuckDB
    * oracle, a second Spark cluster, the source warehouse) reproduces
    * it bit-for-bit. `bit_xor` alone cancels duplicated row PAIRS;
    * the modular sum catches exactly that case — together with the
    * count they detect any single-row divergence.
    *
    * Scale: all three aggregates are commutative-associative, so they
    * partial-aggregate map-side; the shuffle carries one row per
    * (group × task). This is the cheapest full-fidelity comparison
    * two 100 TB tables can have — no sort, no join, one scan each. */
  def tableChecksum(df: DataFrame, rowKey: Column,
                    groupCols: Seq[Column]): DataFrame =
    df.withColumn("__h", graft.functions.PortableHash.hash60(rowKey))
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(__h)").as("xor_checksum"),
        sum(col("__h") % lit(1000003L)).as("sum_mod"))

  /** Exact distributed moments — the mean/variance/stddev profiling
    * op with NO float drift and NO overflow cliff: values are e4
    * fixed-point BIGINTs, the second moment accumulates as
    * DECIMAL(38,0) (128-bit — a 9.2e18 BIGINT sum-of-squares would
    * overflow silently near ~10⁶ rows of mid-size values; at 100 TB
    * that is a certainty, and Spark long arithmetic wraps rather
    * than errors). Both sums are commutative-associative, so they
    * partial-aggregate map-side and the result is identical on any
    * engine, partitioning, or row order — derive mean/variance from
    * (n, sum_e4, sumsq_e8) at the edge, in one float step, where
    * drift can no longer compound. */
  def momentsExact(df: DataFrame, valueCol: Column,
                   groupCols: Seq[Column]): DataFrame = {
    val e4 = round(valueCol * 10000).cast("long")
    df.withColumn("__v", e4)
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__v")).as("sum_e4"),
        sum(col("__v").cast("decimal(38,0)") *
          col("__v").cast("decimal(38,0)")).as("sumsq_e8"))
  }

  /** Winsorization (percentile outlier clipping) — the feature-
    * hygiene op: values below the pLo / above the pHi percentile are
    * clipped to the bound. Clipped values stay integer e4 (ceil/floor
    * of the bound), so downstream sums remain exact.
    *
    * The bounds are EXACT interpolated percentiles (`quantile_cont`
    * semantics, rounded to 4 decimals to absorb last-ulp
    * interpolation-order differences across engines — the q37
    * discipline) computed WITHOUT buffering the column: a naive
    * `percentile(col, p)` holds every value in one aggregation buffer
    * and OOMs at 100× scale. Instead:
    *
    *   1. one sketch pass: `percentile_approx` (GK summary, rank
    *      error ≤ n/accuracy by construction) probes p ± 3/accuracy
    *      ± 4/n, yielding VALUES that provably bracket the target
    *      order statistics;
    *   2. one exact boundary pass: count rows below the bracket and
    *      collect-sorted ONLY the rows inside it — a buffer of
    *      ~8n/accuracy + O(1) values (n/1250 at the default, and
    *      shrinking with higher accuracy), not n;
    *   3. the k-th / (k+1)-th order statistics are indexed out of the
    *      window and interpolated with Spark's own `percentile`
    *      formula `lower + frac * (higher - lower)`, so the result is
    *      bit-identical to the single-buffer exact aggregate.
    *
    * A coverage violation (can't happen under the GK guarantee, but
    * belt-and-braces) surfaces as a loud ANSI out-of-bounds
    * `element_at` error, never a silently-wrong bound. The corpus
    * never shuffles: two aggregate passes for bounds, one codegen'd
    * per-row CASE. Runs one `count()` action at construction time to
    * place the probe percentiles (foldable literals by Spark's
    * `percentile_approx` contract).
    *
    * Input must carry the e4-long `valueE4`; output adds `clipped`
    * plus `is_lo`/`is_hi` flags. */
  def winsorize(df: DataFrame, valueE4: Column,
                pLo: Double, pHi: Double,
                accuracy: Int = 10000): DataFrame = {
    val tagged = df.withColumn("__v", valueE4)
    val n = tagged.count()
    if (n == 0) return tagged.drop("__v") // nothing to clip
      .withColumn("is_lo", lit(false)).withColumn("is_hi", lit(false))
      .withColumn("clipped", valueE4)
    // probe margins: 3/accuracy absorbs the sketch's rank error
    // (≤ n/accuracy) with room to spare at scale; 4/n covers the
    // small-n regime where a 1-rank error exceeds the relative margin
    val m = 3.0 / accuracy + 4.0 / n
    def clamp(p: Double) = math.min(1.0, math.max(0.0, p))
    val probes = Seq(clamp(pLo - m), clamp(pLo + m),
      clamp(pHi - m), clamp(pHi + m))
    val sketch = tagged.agg(percentile_approx(col("__v"),
      array(probes.map(lit): _*), lit(accuracy)).as("pa"))
    // exact boundary pass: rows below each bracket are only COUNTED;
    // rows inside it (a ~8n/accuracy rank window) are the only ones
    // ever collected into a buffer
    def cntLt(b: Column) = sum(when(col("__v") < b, 1L).otherwise(0L))
    def window(a: Column, b: Column) =
      sort_array(collect_list(when(col("__v").between(a, b), col("__v"))))
    val cand = tagged.crossJoin(broadcast(sketch)).agg(
      cntLt(col("pa")(0)).as("cnt_lo"),
      window(col("pa")(0), col("pa")(1)).as("win_lo"),
      cntLt(col("pa")(2)).as("cnt_hi"),
      window(col("pa")(2), col("pa")(3)).as("win_hi"))
    // order-statistic indexing + Spark's percentile interpolation,
    // with the fractional position computed driver-side in the same
    // double arithmetic both engines use: h = (n-1)·p
    def bound(p: Double, cnt: Column, win: Column): Column = {
      val h = (n - 1).toDouble * p
      val kLo = math.floor(h).toLong
      val frac = h - kLo
      val sLo = element_at(win, (lit(kLo + 1) - cnt).cast("int"))
        .cast("double")
      if (frac == 0.0) round(sLo, 4)
      else {
        val sHi = element_at(win, (lit(kLo + 2) - cnt).cast("int"))
          .cast("double")
        round(sLo + lit(frac) * (sHi - sLo), 4)
      }
    }
    val bounds = cand.select(
      bound(pLo, col("cnt_lo"), col("win_lo")).as("__lo"),
      bound(pHi, col("cnt_hi"), col("win_hi")).as("__hi"))
    tagged.crossJoin(broadcast(bounds))
      .withColumn("is_lo", col("__v") < col("__lo"))
      .withColumn("is_hi", col("__v") > col("__hi"))
      .withColumn("clipped",
        when(col("is_lo"), ceil(col("__lo")).cast("long"))
          .when(col("is_hi"), floor(col("__hi")).cast("long"))
          .otherwise(col("__v")))
      .drop("__v", "__lo", "__hi")
  }

  /** Exact per-GROUP interpolated percentiles WITHOUT a per-group
    * full-column buffer — the grouped generalization of
    * [[winsorize]]'s approx-bracket + exact-boundary-pass machinery
    * (same three steps, same coverage guarantee, same loud ANSI
    * `element_at` failure mode), for per-class feature normalization
    * where a plain `percentile(v, p)` would buffer every group's
    * whole column in its aggregation buffer.
    *
    * Differences from the global form, forced by per-group sizes:
    *  - probe margins use the SMALLEST group's n (one scalar
    *    pre-aggregate), so every group's bracket coverage holds:
    *    m·n_g = 3n_g/accuracy + 4n_g/n_min ≥ n_g/accuracy + 4;
    *    larger groups just get slightly wider (still ~8n_g/accuracy)
    *    windows;
    *  - the fractional position h = (n_g−1)·p is a per-group COLUMN,
    *    interpolated with Spark's own `percentile` formula in the
    *    identical IEEE expression, so results are bit-equal to the
    *    single-buffer exact aggregate (GroupedPercentileSpec proves
    *    it per group).
    *
    * Returns one row per group: (groupName, outNames...), each output
    * the exact `percentile(value, p)` as a double. */
  def groupedPercentilesExact(df: DataFrame, group: Column,
                              groupName: String, value: Column,
                              ps: Seq[Double], outNames: Seq[String],
                              accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.length == outNames.length,
      "one output name per probe percentile")
    val tagged = df.select(group.as(groupName), value.as("__v"))
    val nMinRow = tagged.groupBy(groupName).count()
      .agg(min("count")).head()
    if (nMinRow.isNullAt(0)) // empty input: no groups, empty result
      return tagged.groupBy(groupName)
        .agg(count(lit(1)).as("__n"))
        .select(col(groupName) +: outNames.map(lit(0.0).as(_)): _*)
    val nMin = nMinRow.getLong(0)
    val m = 3.0 / accuracy + 4.0 / nMin
    def clamp(p: Double) = math.min(1.0, math.max(0.0, p))
    val probes = ps.flatMap(p => Seq(clamp(p - m), clamp(p + m)))
    val sketch = tagged.groupBy(groupName)
      .agg(percentile_approx(col("__v"),
        array(probes.map(lit): _*), lit(accuracy)).as("__pa"))
    val aggs = ps.indices.flatMap { i =>
      Seq(
        sum(when(col("__v") < col("__pa")(2 * i), 1L).otherwise(0L))
          .as(s"__cnt_$i"),
        sort_array(collect_list(when(col("__v")
            .between(col("__pa")(2 * i), col("__pa")(2 * i + 1)),
          col("__v")))).as(s"__win_$i"))
    } :+ count(lit(1)).as("__n")
    val cand = tagged.join(broadcast(sketch), groupName)
      .groupBy(groupName).agg(aggs.head, aggs.tail: _*)
    val outs = ps.zipWithIndex.map { case (p, i) =>
      val h = (col("__n") - 1).cast("double") * lit(p)
      val kLo = floor(h).cast("long")
      val frac = h - kLo.cast("double")
      val sLo = element_at(col(s"__win_$i"),
        (kLo + 1 - col(s"__cnt_$i")).cast("int")).cast("double")
      // CaseWhen evaluates branches lazily, so the (k+2)-th index is
      // only read when interpolation actually needs it
      val sHi = element_at(col(s"__win_$i"),
        (kLo + 2 - col(s"__cnt_$i")).cast("int")).cast("double")
      when(frac === 0.0, sLo)
        .otherwise(sLo + frac * (sHi - sLo)).as(outNames(i))
    }
    cand.select(col(groupName) +: outs: _*)
  }

  /** Referential-integrity audit: orphan child keys under a parent
    * relation (the FK check a warehouse load runs after every batch —
    * late-arriving dimensions make nonzero counts routine). One
    * left-anti join per relation — broadcastable when the parent key
    * set is dimension-sized — reduced to a single audit row. */
  def refIntegrity(relation: String, child: DataFrame, childKey: Column,
                   parent: DataFrame, parentKey: Column): DataFrame = {
    val orphans = child.select(childKey.as("__k"))
      .join(parent.select(parentKey.as("__k")), Seq("__k"), "left_anti")
    child.select(childKey.as("__k")).agg(count(lit(1)).as("n_child"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans"),
        // -1, not NULL, for the clean-relation case: the audit row
        // stays fully integer-typed on any engine
        coalesce(min(col("__k")), lit(-1L)).as("min_orphan"),
        coalesce(max(col("__k")), lit(-1L)).as("max_orphan")))
      .select(lit(relation).as("relation"), col("n_child"),
        col("n_orphans"), col("min_orphan"), col("max_orphan"))
  }

  /** Snapshot reconciliation — classify every key of two table
    * versions as added / removed / changed / unchanged (the audit run
    * after any backfill, migration, or CDC replay; [[tableChecksum]]
    * says WHETHER two tables diverged, this says WHERE). One full
    * outer join on the key — hash-shuffled both sides, no sort, no
    * window — comparing a caller-built canonical row digest, so the
    * comparison cost per row is one long equality regardless of
    * column count.
    *
    * PROBABILISTIC caveat: rows compare by a 60-bit digest, so a
    * changed row whose v1/v2 digests collide is misclassified
    * "unchanged" with probability ~2⁻⁶⁰ per changed row — negligible
    * (a billion changed rows ⇒ ~10⁻⁹ chance of one miss), but this
    * audit is a screen, not a proof; re-verify flagged-clean tables
    * with a full-column comparison where a guarantee is required.
    *
    * Returns one row per key: (key, change_type). Aggregate downstream
    * for counts; keep row-level for repair joins. */
  def tableDiff(v1: DataFrame, v2: DataFrame,
                key: Column, digest: Column): DataFrame = {
    val a = v1.select(key.as("key"),
      graft.functions.PortableHash.hash60(digest).as("__d1"))
    val b = v2.select(key.as("key"),
      graft.functions.PortableHash.hash60(digest).as("__d2"))
    a.join(b, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__d1").isNull, "added")
          .when(col("__d2").isNull, "removed")
          .when(col("__d1") === col("__d2"), "unchanged")
          .otherwise("changed").as("change_type"))
  }

  /** Per-group simple linear regression (slope / intercept / r²) from
    * EXACT integer sums — the feature-correlation audit with no float
    * drift: x and y are e2 fixed-point BIGINTs, the five power sums
    * accumulate as DECIMAL(38,0) (exact, map-side-combinable,
    * order-independent), and only the final slope/intercept/r²
    * arithmetic runs in doubles — one deterministic IEEE expression
    * over identical integers on any engine or topology. Emits e6
    * fixed-point BIGINT stats. */
  def regressionExact(df: DataFrame, xE2: Column, yE2: Column,
                      groupCols: Seq[Column]): DataFrame = {
    val dec = "decimal(38,0)"
    val sums = df
      .withColumn("__x", xE2.cast(dec)).withColumn("__y", yE2.cast(dec))
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val (n, sx, sy, sxy, sxx, syy) =
      (col("n").cast("double"), col("__sx").cast("double"),
        col("__sy").cast("double"), col("__sxy").cast("double"),
        col("__sxx").cast("double"), col("__syy").cast("double"))
    val covN = n * sxy - sx * sy     // n² · covariance
    val varXN = n * sxx - sx * sx    // n² · variance(x)
    val varYN = n * syy - sy * sy
    val slope = covN / varXN         // e2 scales cancel
    val intercept = (sy - slope * sx) / n / lit(100.0) // back to units
    val r2 = (covN * covN) / (varXN * varYN)
    sums.select(groupCols.map(c => c) :+ col("n") :+
      round(slope * 1000000).cast("long").as("slope_e6") :+
      round(intercept * 1000000).cast("long").as("intercept_e6") :+
      round(r2 * 1000000).cast("long").as("r2_e6"): _*)
  }

  /** Per-column Shannon entropy — the distribution-profiling op
    * (feature selection, leak/constant-column detection, join-key
    * cardinality health): H = ln(n) − (Σ c·ln c)/n over each column's
    * value counts.
    *
    * Exactness discipline (the q68 pattern): the order-dependent float
    * sum is eliminated by rounding each distinct value's c·ln(c) term
    * to an e6 integer BEFORE summing — the sum is then exact and
    * associative, and only the final H is one deterministic IEEE
    * expression over exact integers. Scale shape: one
    * map-side-combined count aggregate per column (shuffle sized by
    * distinct values, never rows) and a one-row reduction on top.
    *
    * Output per column: (column_name, n_rows, n_distinct,
    * sum_clnc_e6, entropy_e6). Nulls count as a regular value. */
  def entropyProfile(df: DataFrame, colNames: Seq[String]): DataFrame =
    colNames.map { c =>
      val counts = df.groupBy(col(c).as("__v"))
        .agg(count(lit(1)).as("__c"))
      counts.agg(
          count(lit(1)).as("n_distinct"),
          sum(col("__c")).as("n_rows"),
          sum(round(log(col("__c").cast("double")) * col("__c") *
            lit(1000000)).cast("long")).as("sum_clnc_e6"))
        .select(lit(c).as("column_name"), col("n_rows"),
          col("n_distinct"), col("sum_clnc_e6"),
          round((log(col("n_rows").cast("double")) -
            col("sum_clnc_e6").cast("double") / lit(1000000.0) /
              col("n_rows").cast("double")) * lit(1000000.0))
            .cast("long").as("entropy_e6"))
    }.reduce(_ unionByName _)

  /** Per-group Spearman rank correlation from EXACT integer ranks —
    * the monotonic-association audit next to [[regressionExact]]'s
    * linear fit (a feature can be perfectly rank-correlated with
    * target drift while its linear r² is near zero).
    *
    * Ranks are `row_number` over (x, tie) and (y, tie) — `tie` makes
    * both orders total, so the ranks are a permutation of 1..n and
    * the no-ties closed form applies: ρ = 1 − 6·Σd²/(n(n²−1)), with
    * d = rank_x − rank_y. Σd² accumulates as DECIMAL(38,0) (exact,
    * map-side-combinable); only the final ρ is one deterministic IEEE
    * expression over those exact integers, emitted e6 fixed-point.
    *
    * Shape: two sorts per group partition (the two rank windows on
    * the same key — one exchange, reused), then a hash aggregate.
    * Groups of a single row are dropped (ρ undefined).
    * Output: (groupCols..., n, sum_d2, rho_e6). */
  def spearmanExact(df: DataFrame, groupCols: Seq[String],
                    x: Column, y: Column, tie: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wx = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(x.asc_nulls_first, tie.asc)
    val wy = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(y.asc_nulls_first, tie.asc)
    val ranked = df.select(groupCols.map(col) ++ Seq(
      row_number().over(wx).cast("long").as("__rx"),
      row_number().over(wy).cast("long").as("__ry")): _*)
    val d = (col("__rx") - col("__ry")).cast("decimal(38,0)")
    val sums = ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(d * d).as("__d2"))
      .filter(col("n") > 1)
    val nd = col("n").cast("double")
    val rho = (lit(1.0) - lit(6.0) * col("__d2").cast("double") /
      (nd * (nd * nd - lit(1.0)))) * lit(1000000.0)
    sums.select(groupCols.map(col) ++ Seq(col("n"),
      col("__d2").cast("long").as("sum_d2"),
      round(rho).cast("long").as("rho_e6")): _*)
  }

  /** Parent–child balance audit — the NUMERIC sibling of
    * [[refIntegrity]]'s key-existence check: for every parent row,
    * the exact fixed-point imbalance between its own value and the
    * sum of its children's (header-vs-lines reconciliation: invoice
    * totals, ledger rollups, order totals). Child values pre-aggregate
    * map-side before one key-partitioned left join; parents with no
    * children surface with `n_children = 0` rather than vanishing.
    * All arithmetic is exact integer — an audit that can drift is
    * worse than no audit. */
  def balanceAudit(parent: DataFrame, parentKey: Column, parentValE: Column,
                   child: DataFrame, childKey: Column,
                   childValE: Column): DataFrame = {
    val kids = child.select(childKey.as("key"), childValE.as("__cv"))
      .groupBy("key")
      .agg(sum(col("__cv")).as("child_e"), count(lit(1)).as("n_children"))
    parent.select(parentKey.as("key"), parentValE.as("parent_e"))
      .join(kids, Seq("key"), "left")
      .select(col("key"), col("parent_e"),
        coalesce(col("child_e"), lit(0L)).as("child_e"),
        coalesce(col("n_children"), lit(0L)).as("n_children"),
        (col("parent_e") - coalesce(col("child_e"), lit(0L)))
          .as("imbalance_e"))
  }

  /** (clean, rejects): rejects carry a `violated` column with the
    * names of every failed rule, comma-joined in rule order. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val violated = array_compact(array(rules.map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name))): _*))
    val tagged = df.withColumn("__violated", violated)
    val clean = tagged.filter(size(col("__violated")) === 0)
      .drop("__violated")
    val rejects = tagged.filter(size(col("__violated")) > 0)
      .withColumn("violated", array_join(col("__violated"), ","))
      .drop("__violated")
    (clean, rejects)
  }
}
