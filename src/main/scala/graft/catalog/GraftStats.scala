package graft.catalog

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** Join-planning statistics for catalog reads — the missing half of
  * [[GraftScan.estimateStatistics]].
  *
  * Why this exists: Spark's `V2ScanRelationPushDown` wraps every
  * [[org.apache.spark.sql.connector.read.V1Scan]] in a `V1ScanWrapper`
  * that implements ONLY `Scan` — `DataSourceV2ScanRelation.computeStats`
  * therefore never sees the scan's `SupportsReportStatistics` face and
  * falls back to `defaultSizeInBytes` (= Long.Max). The consequence at
  * scale is severe: a SQL join against an engine table can NEVER
  * auto-broadcast its small side — every dim join becomes a shuffle.
  *
  * The fix is the extension pattern this engine already proves for MERGE
  * and views: claim the plan. A pre-CBO rule (runs once, after pushdown
  * has built the pruned scan) wraps each V1-bridged graft relation in a
  * [[GraftStatsRelation]] leaf whose `computeStats` reports the PRUNED
  * scan's real input-file bytes; a one-line strategy plans the leaf by
  * delegating straight back to the wrapped relation, so execution is
  * byte-identical — only the logical statistics change. The leaf holds
  * the relation as a constructor field (not a child), which also makes
  * the rule idempotent: transform never descends into an already-wrapped
  * relation.
  */
final case class GraftStatsRelation(inner: DataSourceV2ScanRelation, bytes: BigInt)
    extends LeafNode {
  override def output: Seq[Attribute] = inner.output
  override def maxRows: Option[Long] = inner.maxRows
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = bytes.max(1))
  override def innerChildren: Seq[LogicalPlan] = Seq(inner)
  override def simpleString(maxFields: Int): String =
    s"GraftStatsRelation sizeInBytes=$bytes"
}

/** Pre-CBO rule: attach real size statistics to V1-bridged graft scans
  * (see [[GraftStatsRelation]]). Matches only scans built by
  * [[GraftScanBuilder]]; every other relation passes through untouched.
  */
object GraftStatsRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: DataSourceV2ScanRelation => r.scan match {
      case w: V1ScanWrapper => w.v1Scan match {
        case gs: GraftScan => GraftStatsRelation(r, BigInt(gs.inputBytesCached))
        case _ => r
      }
      case _ => r
    }
  }
}

/** Plans [[GraftStatsRelation]] by handing its wrapped relation back to
  * the planner — the physical plan is exactly what the relation alone
  * would have produced.
  */
object GraftStatsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GraftStatsRelation => planLater(g.inner) :: Nil
    case _ => Nil
  }
}
