package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Restores source pushdown for predicates over `coalesce(attrs...)` — the
  * read shape a metadata-only [[graft.cdc.KeyedParquetTable.renameColumn]]
  * produces: the scan resolves a renamed column as `coalesce(newName,
  * oldNames...)`, Spark's own `PushDownPredicates` inlines that coalesce
  * into filters it pushes through the projection, and the parquet source
  * cannot translate a Coalesce — so a filter on a renamed column loses
  * row-group pruning until maintenance materializes the rename (the one
  * named cost in renameColumn's Scaladoc, VERDICT-r9-style read tax).
  *
  * The fix is an ADDITIVE rewrite on filters directly above a leaf: for a
  * deterministic conjunct `c` containing exactly one distinct
  * `Coalesce(p1..pn)` whose children are all attributes, conjoin the twin
  * `Or_i c[coalesce -> p_i]`. Soundness (the twin is implied, so adding it
  * never drops a row): on any row, `coalesce(p1..pn)` evaluates to `p_j`
  * (first non-null) or to null when all are null; in the first case
  * `c[coalesce -> p_j] = c`, in the second every substitution evaluates
  * `c` with the same null — either way `c` true forces the twin true. The
  * original conjunct stays, so results are identical; the twin's pure
  * attribute comparisons are what the parquet source CAN push, and on
  * files lacking one generation's column its disjunct evaluates against
  * all-null stats and prunes correctly, while the other generation's
  * disjunct decides.
  *
  * Fires only on Filter-over-leaf (the post-pushdown canonical shape),
  * skips subquery/nondeterministic conjuncts, expands only single-coalesce
  * conjuncts (no exponential blowup), and skips twins already present
  * (idempotent under re-application). Injected as a once-run pre-CBO rule
  * by [[graft.core.GraftExtensions]].
  */
object CoalescePushdown extends Rule[LogicalPlan] {

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other     => Seq(other)
  }

  private def coalesceOverAttrs(c: Expression): Seq[Coalesce] =
    c.collect {
      case co: Coalesce if co.children.nonEmpty &&
        co.children.forall(_.isInstanceOf[Attribute]) => co
    }.groupBy(_.canonicalized).map(_._2.head).toSeq

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child: LeafNode) =>
      val conjuncts = splitConj(cond)
      val twins = conjuncts.flatMap { c =>
        val cos = coalesceOverAttrs(c)
        val safe = c.deterministic && cos.size == 1 &&
          c.collectFirst { case s: SubqueryExpression => s }.isEmpty
        if (!safe) None
        else {
          val co = cos.head
          Some(co.children.map { phys =>
            c.transformUp {
              case e: Coalesce if e.canonicalized == co.canonicalized => phys
            }
          }.reduceLeft[Expression](Or(_, _)))
        }
      }
      val fresh = twins.filterNot(t => conjuncts.exists(_.semanticEquals(t)))
      if (fresh.isEmpty) f
      else Filter((conjuncts ++ fresh).reduceLeft[Expression](And(_, _)), child)
  }
}
