package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Settings mirror the production posture described in SURVEY.md §4:
  * UTC session time zone (oracle parity with the reference's
  * timestamp-without-tz columns, `lambda/bike_lambda.py:45`), AQE on
  * (skew handling — per-bike snapshot skew is real in the reference's
  * domain), shuffle partitions sized for the local harness rather than
  * the 200 default. On a real cluster the same builder is used with
  * `master` unset and shuffle partitions sized to ~2-3× total cores.
  */
object GraftSession {

  def builder(cores: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new org.apache.spark.sql.graftx.GraftExtensions)
      .appName("graft")
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // driver testdata events.parquet is TIMESTAMP(NANOS); Spark has
      // no nanosecond type — read as long (converted by Exact.secFromAny)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucket-sorted scans (Layout.bucketedWrite guarantees — and
      // post-write ASSERTS — exactly one file per bucket, the only
      // case this flag is safe for; writes that bypass bucketedWrite
      // must not rely on scan ordering): lets a co-located sort-merge
      // join consume bucketed tables with zero sort as well as zero
      // exchange
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // always honor bucket layout at the scan: the auto heuristic
      // only keeps bucketing when it removes an exchange, which drops
      // bucket PRUNING for key-filter point lookups (q128) — for
      // tables this engine bucketed deliberately, reading 1/N of the
      // files beats scan parallelism
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      // honor DSv2 scans' reported KeyGroupedPartitioning (the
      // SynthEvents userparts mode): a grouped read over the scan's
      // key runs with zero exchange, like a bucketed table
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE rewrites a sort-merge join to shuffled-hash at runtime
      // when EVERY post-shuffle partition is under this byte bound
      // (guide §3.1; default 0 = off). r12 interleaved A/B over the
      // non-broadcast join family: −5.6% (q184 −0.63 s, q434
      // −0.50 s, q143 −0.27 s), no regression beyond the harness's
      // +0.15 s bias floor. Deliberately AQE-ONLY — the static
      // preferSortMergeJoin=false variant also converts the
      // BUCKET-SORTED co-located joins (q117/q128), where the scan
      // order makes sort-merge free and a hash build is pure waste;
      // the AQE rule only fires on joins that actually shuffle, so
      // the bucketed discipline is untouched. Scale-safe by
      // construction: the bound is per post-shuffle partition
      // (measured, not estimated), and partition count scales with
      // the data; sort-merge stays the fallback wherever the bound
      // fails.
      // (env-overridable so perf A/Bs and clusters with other
      // per-task memory budgets can retune without a rebuild)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "256m"))
      // COUPLING (r12 advice): the AQE SMJ→SHJ rewrite fires only
      // while every post-shuffle partition is under the threshold
      // above, and partition sizing follows advisoryPartitionSizeInBytes
      // — raising the advisory size past the SHJ threshold would
      // silently disable the adopted optimization. Pinned explicitly
      // (at Spark's 64m default) so a later retune sees the pair
      // together; keep advisory ≤ SHJ threshold.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.ui.enabled", "false")

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = 4): SparkSession = {
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // post-pushdown optimizer rule (the "User Provided Optimizers"
    // batch runs AFTER early scan pushdown — extensions'
    // injectOptimizerRule would run BEFORE it): re-resolves a DSv2
    // scan's reported KeyGroupedPartitioning that Spark's
    // aggregate-pushdown rewrite drops; see the rule's scaladoc
    if (!spark.experimental.extraOptimizations
          .contains(org.apache.spark.sql.graftx.RestoreReportedPartitioningRule))
      spark.experimental.extraOptimizations ++=
        Seq(org.apache.spark.sql.graftx.RestoreReportedPartitioningRule)
    spark
  }
}
