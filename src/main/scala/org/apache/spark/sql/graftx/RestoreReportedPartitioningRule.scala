package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions.V2ExpressionUtils
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.SupportsReportPartitioning
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning => V2KeyGroupedPartitioning}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** Restore a DSv2 scan's reported `KeyGroupedPartitioning` after
  * Spark's aggregate-pushdown rewrite drops it (Spark 4.1.2
  * limitation, root-caused from the shipped bytecode):
  *
  * `V2ScanRelationPushDown.rewriteAggregate` rebuilds the scan
  * relation's output as FRESH attributes from `scan.readSchema()`
  * (group columns + one `aggN` per pushed aggregate). The very next
  * rule, `V2ScanPartitioningAndOrdering`, resolves the connector's
  * reported partitioning keys against the ORIGINAL table relation
  * (`toCatalystOpt(key, relation, funCatalog)` — binding to the
  * table's attribute exprIds) and then requires the resolved
  * references to be a subset of the SCAN relation's output
  * (`references.subsetOf(d.outputSet)`). After the aggregate rewrite
  * those are different attribute instances even when the NAMES match
  * exactly, so the check always fails, `keyGroupedPartitioning`
  * stays `None`, and `BatchScanExec` reports `UnknownPartitioning` —
  * forcing a hash exchange before the finalize aggregate that the
  * connector's key-disjoint layout makes redundant. No connector-side
  * naming can dodge this: it is attribute IDENTITY, not naming.
  *
  * This rule re-resolves the reported keys against the scan
  * relation's OWN output (name resolution over the post-pushdown
  * attributes — the binding Spark's rule should have used) and fills
  * `keyGroupedPartitioning` where the built-in rule gave up. It runs
  * in the "User Provided Optimizers" batch
  * (`spark.experimental.extraOptimizations`, registered by
  * `GraftSession`), which the optimizer places AFTER the early
  * scan-pushdown batch; the `None` guard makes it idempotent under
  * the batch's fixed-point driver, and scans the built-in rule
  * already handled (`Some(_)`) are never touched.
  */
object RestoreReportedPartitioningRule extends Rule[LogicalPlan] {
  // Respect Spark's kill switch for key-grouped planning: the built-in
  // V2ScanPartitioningAndOrdering only fills keyGroupedPartitioning when
  // spark.sql.sources.v2.bucketing.enabled is on, so this repair rule
  // must gate on the same conf or it would force KGP in sessions that
  // disabled it.
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.v2BucketingEnabled) plan else plan.transform {
    case d @ DataSourceV2ScanRelation(
        relation, scan: SupportsReportPartitioning, _, None, _)
        if scan.outputPartitioning().isInstanceOf[V2KeyGroupedPartitioning] =>
      val kgp = scan.outputPartitioning().asInstanceOf[V2KeyGroupedPartitioning]
      val keys = kgp.keys.toSeq.map(k =>
        V2ExpressionUtils.toCatalystOpt(k, d, relation.funCatalog))
      if (keys.forall(_.isDefined) &&
          keys.flatten.forall(_.references.subsetOf(d.outputSet)))
        d.copy(keyGroupedPartitioning = Some(keys.flatten))
      else d
  }
}
