package graft.core

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.Dataset

/** Plan-fingerprint accumulator that sees THROUGH `localCheckpoint`.
  *
  * The bench's plan fingerprints (exchange/broadcast counts,
  * interpreted-HOF presence) are computed from a query's final
  * executed plan — but a `localCheckpoint()` truncates lineage, so
  * everything upstream of a pin (the window shuffles, the iterative
  * join rounds — exactly where the regression-prone work lives) is
  * invisible there: q292 fingerprinted as {exchanges: 0} while
  * running 12 joins and 6 checkpoint rounds.
  *
  * Fix: every pin in the library goes through [[PlanStats.Pinned.pin]]
  * instead of calling `localCheckpoint()` directly. When the bench's
  * fingerprint pass flips [[enable]], each pin first counts the
  * operators in ITS OWN executed plan (the pre-checkpoint DAG — by
  * construction the plan that actually ran to materialize the pin)
  * and bumps a checkpoint-round counter, then checkpoints as before.
  * Outside the fingerprint pass the accounting is a single atomic
  * read of `on` — zero overhead on the measured passes.
  *
  * Counters are plain atomics, not Spark accumulators: pins execute
  * eagerly on the driver thread during plan construction, so driver-
  * side counting is exact.
  *
  * SEQUENTIAL-ONLY CONTRACT: this is a process-global singleton.
  * While [[enable]]d, exactly one query may be constructed at a time
  * — concurrent construction interleaves the counters, and the
  * bench's post-fingerprint cleanup unpersists ALL session
  * persistent RDDs, not just the fingerprinted query's checkpoint
  * blocks. The bench runner (the only enabler) is single-threaded
  * by construction; any future parallel harness must keep the
  * fingerprint pass outside its parallel section.
  */
object PlanStats {

  private val on = new AtomicBoolean(false)
  private val ex = new AtomicInteger(0)
  private val bc = new AtomicInteger(0)
  private val cp = new AtomicInteger(0)
  private val hof = new AtomicBoolean(false)

  // Light-count mode: bump ONLY the cheap counters (checkpoint rounds,
  // streaming starts) without rendering any plan text — an atomic
  // check + increment per pin, safe to leave on during MEASURED bench
  // passes. The bench uses it to classify each query as IO-bound
  // (pins/state-store IO present) vs CPU-bound, so tools/bench_diff.py
  // can normalize each class by the matching drift canary.
  private val lightOn = new AtomicBoolean(false)
  private val sst = new AtomicInteger(0)

  def enableLightCount(): Unit = lightOn.set(true)
  def disableLightCount(): Unit = lightOn.set(false)

  /** Streaming-query start marker: every library site that starts a
    * Structured Streaming query with a checkpointLocation calls this,
    * so state-store/HDFS-checkpoint IO is visible to the bench's
    * query classification even though no `pin()` is involved.
    */
  def markStreamingStart(): Unit =
    if (on.get() || lightOn.get()) sst.incrementAndGet()
  def streamingStarts: Int = sst.get()

  /** Batch file-sink marker: library sites that write real files mid-
    * query (merge/upsert targets, compaction layouts, ingest sinks)
    * call this, so disk-IO-bound batch queries join the IO class even
    * without pins or streams (q142's upsert path is pure file IO).
    */
  private val bio = new AtomicInteger(0)
  def markBatchSinkIo(): Unit =
    if (on.get() || lightOn.get()) bio.incrementAndGet()
  def batchSinkIos: Int = bio.get()

  // Test-only plan-text log: when enabled, every pin's pre-checkpoint
  // executed plan is captured verbatim so a spec can assert whole-query
  // invariants (e.g. "the source is scanned exactly once") that the
  // final plan alone cannot show once lineage is truncated. Same
  // SEQUENTIAL-ONLY contract as the counters.
  private val logOn = new AtomicBoolean(false)
  private val logBuf = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def enablePlanLog(): Unit = { logBuf.clear(); logOn.set(true) }
  def disablePlanLog(): Unit = logOn.set(false)
  def loggedPlans: Seq[String] = {
    import scala.jdk.CollectionConverters._
    logBuf.iterator.asScala.toSeq
  }

  def enable(): Unit = on.set(true)
  def disable(): Unit = on.set(false)
  def reset(): Unit = {
    ex.set(0); bc.set(0); cp.set(0); hof.set(false); sst.set(0); bio.set(0)
  }

  def exchanges: Int = ex.get()
  def broadcasts: Int = bc.get()
  def checkpoints: Int = cp.get()
  def sawInterpretedHof: Boolean = hof.get()

  /** Count shuffle/broadcast exchanges + interpreted-HOF markers in
    * the dataset's executed plan and add them to the accumulator.
    * No-op unless [[enable]]d.
    */
  def record(ds: Dataset[_]): Unit = if (on.get() || logOn.get()) {
    val p = ds.queryExecution.executedPlan.toString
    if (on.get()) {
      ex.addAndGet(countIn(p, "Exchange hashpartitioning") +
        countIn(p, "Exchange rangepartitioning"))
      bc.addAndGet(countIn(p, "BroadcastExchange"))
      if (p.toLowerCase.contains("lambdafunction")) hof.set(true)
    }
    if (logOn.get()) logBuf.add(p)
  }

  private def countIn(hay: String, needle: String): Int = {
    var n = 0
    var i = hay.indexOf(needle)
    while (i >= 0) { n += 1; i = hay.indexOf(needle, i + needle.length) }
    n
  }

  implicit class Pinned[T](private val ds: Dataset[T]) extends AnyVal {
    /** Fingerprint-then-checkpoint. Library code pins with this, not
      * with a bare `localCheckpoint()`, so the bench's fingerprints
      * include the pre-checkpoint subtrees.
      *
      * SCALE CAVEAT (r12 advice): `localCheckpoint` trades fault
      * tolerance for speed — the pinned partitions live in executor
      * local storage and CANNOT be recomputed if an executor dies.
      * For the tiny pair-list/domain-grain pins that is a free win at
      * any scale; for the corpus-sized pins (q127/q172/q234's
      * (event_type, v) projections, q239's (doc_id, word) table) a
      * 100 TB run materializes a multi-TB intermediate, so a cluster
      * deployment should either budget executor storage for it or
      * swap these sites to reliable `checkpoint()`/recompute — the
      * within-query reuse (3–5 derivations of the same scan) is what
      * the A/Bs measured, not the storage medium.
      */
    def pin(): Dataset[T] = {
      if (on.get() || lightOn.get()) cp.incrementAndGet()
      record(ds)
      ds.localCheckpoint()
    }
  }
}
