package org.apache.spark.sql.graftx

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Cumulative task counter for the bench's scaling observability
  * (round 13, after the r12 driver probe flagged
  * `suspect_cpus_ignored`): at sf0.1 most queries are overhead-bound,
  * so an 8-vs-32-core wall-clock ratio reads ≈1 and is
  * indistinguishable from "the bench ignores `$SPARK_GRAFT_CPUS`"
  * from the outside. Publishing each query's TASK count and summed
  * task time makes the difference observable in the archive itself:
  * a query that launches the same ~hundreds of tasks and accrues the
  * same total task-seconds at both core counts is demonstrably
  * parallel-and-overhead-bound, not serial.
  *
  * Lives under `org.apache.spark` because reading a consistent
  * snapshot requires `listenerBus.waitUntilEmpty()` (listener events
  * are delivered asynchronously), which is `private[spark]`. The
  * probe is additive instrumentation: `snapshot` is only called
  * OUTSIDE the timed region (after the per-query timestamp is
  * taken), and the listener body is two atomic increments.
  */
object TaskProbe {
  private val taskCount = new AtomicLong(0L)
  private val taskTimeMs = new AtomicLong(0L)
  @volatile private var installed = false

  /** Register the counting listener once per JVM. */
  def install(sc: SparkContext): Unit = synchronized {
    if (!installed) {
      sc.addSparkListener(new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
          taskCount.incrementAndGet()
          val ti = e.taskInfo
          if (ti != null) taskTimeMs.addAndGet(ti.duration)
        }
      })
      installed = true
    }
  }

  /** Drain the listener bus and return the cumulative
    * (tasks completed, summed task wall-time in ms) totals. Callers
    * difference two snapshots around a query to attribute its tasks. */
  def snapshot(sc: SparkContext): (Long, Long) = {
    sc.listenerBus.waitUntilEmpty()
    (taskCount.get(), taskTimeMs.get())
  }
}
