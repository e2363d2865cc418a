package graft.catalog

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** `UPDATE ... SET ... WHERE` / `DELETE FROM ... WHERE` as literal SQL over
  * catalog tables — the predicate-DML verbs the engine already exposes on
  * the Scala surface ([[graft.cdc.KeyedParquetTable.updateWhere]] /
  * [[graft.cdc.KeyedParquetTable.deleteWhere]]) made reachable from SQL
  * text. The reference itself only issues MERGE/DDL/CALL statements, so
  * this is interface completion rather than parity debt: a user of an
  * Iceberg-backed table writes `DELETE FROM t WHERE ts < X` for retention
  * and `UPDATE t SET flag = 'x' WHERE ...` for corrections, and both must
  * run here with the same statement text.
  *
  * Same claim pattern as [[MergeIntoGraftTableRule]]: Spark resolves the
  * statement fully, then (for tables without `SupportsRowLevelOperations`
  * / `SupportsDelete`) the planner throws — so a post-resolution rule
  * rewrites the resolved node into an eagerly-executed command backed by
  * the engine's own verbs, and non-graft targets pass through untouched.
  *
  * Expression handoff: resolved catalyst expressions reference the DSv2
  * relation's attribute ids, while the engine verbs evaluate Columns
  * against their own snapshot read — so attribute references are rebound
  * BY NAME (the engine schema and the relation schema are the same
  * declared schema; updateWhere/deleteWhere re-resolve names against it).
  *
  * Refuse-loudly contract (mirroring MERGE):
  *   - subqueries in WHERE or SET (`PlanExpression`) — the engine's
  *     predicate DML is a single self-contained bucket-scoped commit, and
  *     a target-referencing subquery would need the pre-image protocol;
  *     rewrite as MERGE with a computed source instead;
  *   - assignments to key/bucket columns (a key move is delete+insert) —
  *     [[graft.cdc.KeyedParquetTable.updateWhere]] raises with the
  *     actionable message;
  *   - time-travel targets.
  */
object GraftDml {

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      "graft UPDATE/DELETE supports self-contained predicates and " +
        s"assignments over the target's own columns; unsupported here: $what")

  /** Rebind a resolved expression's attribute references by name and wrap
    * as a Column the engine verbs can re-resolve against their own read.
    * The handoff is the expression's own SQL rendering (the Column-from-
    * Expression constructors are private[sql]); attribute references are
    * first rewritten to bare quoted names so the rendering never carries
    * the relation qualifier. Canonical DML expressions (comparisons,
    * arithmetic, builtins, literals, IN lists) round-trip exactly; an
    * expression whose rendering cannot re-parse fails the statement loudly
    * at expr() — never silently mis-executes.
    */
  private[catalog] def rebind(e: Expression, targetRefs: AttributeSet,
                              what: String): Column = {
    if (e.exists(_.isInstanceOf[PlanExpression[_]]))
      refuse(s"$what contains a subquery (rewrite as MERGE INTO with a " +
        "computed source)")
    if (!e.references.subsetOf(targetRefs))
      refuse(s"$what references columns outside the target table: ${e.sql}")
    org.apache.spark.sql.functions.expr(e.transform {
      case a: Attribute => UnresolvedAttribute.quoted(a.name)
    }.sql)
  }

  private[catalog] def translateUpdate(u: UpdateTable): LogicalPlan = {
    val (rel, table) = GraftMergeInto.graftTarget(u.table).get
    if (!table.isCurrent) refuse("UPDATE of a time-travel read")
    val targetRefs = AttributeSet(rel.output)
    val set: Seq[(String, Column)] = u.assignments.map {
      case Assignment(key: Attribute, value) =>
        key.name -> rebind(value, targetRefs, s"SET ${key.name}")
      case Assignment(other, _) => refuse(s"assignment to non-column ${other.sql}")
    }
    val cond = u.condition.map(rebind(_, targetRefs, "WHERE"))
    GraftUpdateCommand(table, set, cond)
  }

  private[catalog] def translateDelete(d: DeleteFromTable): LogicalPlan = {
    val (rel, table) = GraftMergeInto.graftTarget(d.table).get
    if (!table.isCurrent) refuse("DELETE from a time-travel read")
    GraftDeleteCommand(table, rebind(d.condition, AttributeSet(rel.output), "WHERE"))
  }
}

/** Post-resolution claim of resolved UPDATE/DELETE over graft tables. */
final case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case u: UpdateTable if u.resolved &&
        GraftMergeInto.graftTarget(u.table).isDefined =>
      GraftDml.translateUpdate(u)
    case d: DeleteFromTable if d.resolved &&
        GraftMergeInto.graftTarget(d.table).isDefined =>
      GraftDml.translateDelete(d)
  }
}

/** UPDATE: one bucket-scoped copy-on-write commit of the matched buckets
  * ([[graft.cdc.KeyedParquetTable.updateWhere]] — untouched buckets
  * hard-link through).
  */
final case class GraftUpdateCommand(table: GraftTable, set: Seq[(String, Column)],
                                    cond: Option[Column])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    CommitRetry.retrying("UPDATE") {
      table.kpt.updateWhere(cond.getOrElse(lit(true)), set.toMap)
    }
    Nil
  }
}

/** DELETE: merge-on-read delete-set commit — matched keys land in the
  * `_deletes` shards, no data file rewrites
  * ([[graft.cdc.KeyedParquetTable.deleteWhere]]).
  */
final case class GraftDeleteCommand(table: GraftTable, cond: Column)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    CommitRetry.retrying("DELETE") { table.kpt.deleteWhere(cond) }
    Nil
  }
}
