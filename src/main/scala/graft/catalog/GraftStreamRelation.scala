package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** `spark.readStream.table("graft.ns.t")` — the catalog-identifier
  * streaming read every lakehouse exposes (Delta/Iceberg users stream by
  * table name, not by filesystem path; the reference's consumers address
  * tables through its catalog the same way, `spark_streaming.py` reading
  * what `spark_exactly_once.py` commits).
  *
  * Why a rule: the analyzer resolves a streaming identifier to
  * `StreamingRelationV2` over the catalog's DSv2 Table and then demands
  * MICRO_BATCH_READ — a capability only a native DSv2 stream (offsets +
  * executor-side PartitionReaderFactory) can declare. The engine's
  * streaming source is (deliberately) a V1 [[graft.streaming
  * .GraftTableStreamSource]]: its batches are whole engine READ PLANS
  * (MoR delete anti-joins, declared-schema evolution, changelog netting),
  * which a row-factory interface cannot carry. So this Hints-batch rule —
  * running BEFORE the Resolution batch plants the V2 node, same slot as
  * [[GraftViewDdlRule]] — claims the still-unresolved streaming relation
  * and plants exactly the leaf `readStream.format("graft-table")
  * .option("path", root)` would have planted. Reader options pass
  * through: `.option("mode", "changelog")`, `startVersion`, `branch`,
  * `maxVersionsPerTrigger`, `skipNonAppend` all mean what they mean on
  * the provider.
  *
  * Precedence: temp views shadow (checked explicitly — this rule runs
  * before the resolution rules that would normally give them precedence);
  * non-graft identifiers and metadata tables pass through untouched to
  * Spark's own handling. A stored graft VIEW refuses with the reason
  * named (a view is a batch text expansion — streaming it would
  * otherwise surface as a bare not-found).
  */
final case class GraftStreamRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Existence probes must never throw during resolution (malformed
    * segments are simply "not ours" — Spark's own not-found applies).
    * NonFatal, not just IllegalArgumentException: a corrupt `_meta` dir or
    * an IO hiccup inside tableExists would otherwise abort analysis of ANY
    * streaming query touching the name instead of falling through. */
  private def probes(b: => Boolean): Boolean =
    try b catch { case scala.util.control.NonFatal(_) => false }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case u @ UnresolvedRelation(parts, opts, true)
        if !spark.sessionState.catalog.isTempView(parts) =>
      GraftViews.resolveIdent(spark, parts) match {
        case Some((cat, ident)) if probes(cat.tableExists(ident)) =>
          val passed = opts.asScala.toMap
          require(!passed.keySet.exists(_.equalsIgnoreCase("path")),
            s"readStream.table(${parts.mkString(".")}): the table identifier " +
              "IS the path — don't also pass a path option")
          org.apache.spark.sql.graftbridge.Internals.v1StreamingRelation(
            spark, "graft-table", passed + ("path" -> cat.tableFor(ident).root))
        case Some((cat, ident)) if probes(cat.viewExists(ident)) =>
          // falling through would surface as a bare not-found (the batch
          // view-read rule only claims non-streaming relations)
          throw new UnsupportedOperationException(
            s"readStream.table(${parts.mkString(".")}): stored views are " +
              "batch text expansions and cannot be streamed — stream the " +
              "base table (mode=changelog for the keyed change feed)")
        case _ => u
      }
  }
}
