package graft.catalog

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeSet, EqualTo, Expression, If, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UnaryCommand, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{assert_true, col, count, lit, when}
import org.apache.spark.sql.types.{StructField, StructType}

/** `MERGE INTO` SQL text over catalog tables — the reference's core CDC
  * statement (`/root/reference/src/processor/spark_batch.py:273-280`):
  *
  *   MERGE INTO graft.ns.t target USING src source
  *   ON target.k = source.k
  *   WHEN MATCHED AND source.operation = 'd' THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *
  * Spark has no built-in execution for MERGE on tables without
  * `SupportsRowLevelOperations` (the analyzer resolves the statement fully,
  * then `BasicOperators` throws), so the engine claims the statement via
  * its extension point: [[MergeIntoGraftTableRule]] rewrites the RESOLVED
  * `MergeIntoTable` into an eagerly-executed command whose child projects
  * the source into (target columns..., operation) rows, and
  * [[GraftMergeExec]] commits it through [[graft.cdc.KeyedParquetTable]]'s
  * own bucket-scoped MERGE — the identical path the Scala surface uses, so
  * SQL text and Scala calls produce byte-identical table state.
  *
  * Supported shape (the canonical CDC family; everything else refuses with
  * a message naming the limitation rather than mis-executing):
  *   - ON: conjunction of equalities covering exactly the table's declared
  *     keys, each between a target key column and a source-side expression
  *   - WHEN MATCHED: optional `AND <source-only cond> THEN DELETE` first,
  *     then an UNCONDITIONAL `UPDATE SET *` (or explicit SET assigning
  *     every column from source-only expressions)
  *   - WHEN NOT MATCHED: unconditional `INSERT *` (or explicit assignments
  *     identical to the update's — one projected row serves both verbs)
  *   - WHEN NOT MATCHED BY SOURCE: either absent, or exactly one
  *     unconditional DELETE — the statement then declares the source the
  *     COMPLETE desired state and executes as the engine's atomic snapshot
  *     reconcile ([[graft.cdc.KeyedParquetTable.reconcile]]); conditional
  *     and UPDATE by-source variants refuse (they need per-row target
  *     pre-images inside the decision)
  *
  * Why conditions must reference only the source: the engine's MERGE
  * replaces a matched row wholesale from the projected source row, decided
  * per SOURCE row before target rows are read; a target-referencing
  * condition would need per-row pre-images inside the decision, which is
  * [[graft.streaming.IncrementalAgg]]'s retraction machinery, not MERGE.
  * The reference's exactly-once variant adds the theta conjunct
  * `AND target.batch_id <> source.batch_id` for replay protection
  * (`spark_exactly_once.py:494`) — that concern maps to this engine's txn
  * markers (`merge(source, opCol, txn)`: a replayed batch no-ops on its
  * marker), so the theta form is refused rather than emulated.
  *
  * ANSI cardinality: SQL MERGE must fail when two source rows match one
  * target row. The engine's Scala merge documents a deduped-source
  * contract instead; the SQL path cannot assume its caller read a
  * Scaladoc, so [[GraftMergeExec]] adds an in-plan one-row-per-key guard
  * (count over a key window + assert_true) that rides the merge's own
  * evaluation — a duplicate-key source fails the statement loudly, exactly
  * like Spark's MERGE_CARDINALITY_VIOLATION.
  */
object GraftMergeInto {

  private[catalog] val OpCol = "__graft_merge_op"

  private def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => unwrap(c)
    case other => other
  }

  private[catalog] def graftTarget(p: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
    unwrap(p) match {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftTable => Some((r, g))
        case _ => None
      }
      case _ => None
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      "graft MERGE INTO supports the canonical CDC shape — ON equality over " +
        "the table keys, [WHEN MATCHED AND <source cond> THEN DELETE,] " +
        "WHEN MATCHED THEN UPDATE SET *, WHEN NOT MATCHED THEN INSERT * " +
        s"(conditions/assignments over source columns only); unsupported here: $what")

  /** Translate a RESOLVED canonical MergeIntoTable into the command, or
    * refuse loudly. Never returns the original node for a graft target —
    * silently leaving it would hit Spark's opaque planner error instead of
    * an actionable one.
    */
  private[catalog] def translate(m: MergeIntoTable): LogicalPlan = {
    val (rel, table) = graftTarget(m.targetTable).get
    if (!table.isCurrent) refuse("MERGE into a time-travel read")
    // WHEN NOT MATCHED BY SOURCE THEN DELETE declares the source to be the
    // COMPLETE desired state — exactly the engine's snapshot reconcile
    // ([[graft.cdc.KeyedParquetTable.reconcile]]): matched rows update,
    // unmatched insert, target keys absent from the source delete, one
    // atomic commit. Conditional/UPDATE by-source variants need per-row
    // target pre-images inside the decision and refuse.
    val reconcileBySource = m.notMatchedBySourceActions match {
      case Seq() => false
      case Seq(DeleteAction(None)) => true
      case Seq(DeleteAction(Some(c))) =>
        refuse(s"conditional NOT MATCHED BY SOURCE DELETE ('${c.sql}') — the " +
          "reconcile contract is unconditional full-snapshot convergence")
      case other => refuse(s"NOT MATCHED BY SOURCE shape " +
        s"${other.map(_.getClass.getSimpleName)} (exactly one unconditional DELETE)")
    }
    if (m.withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION")
    val sourceRefs = m.sourceTable.outputSet
    val targetRefs = AttributeSet(rel.output)
    def sourceOnly(e: Expression): Boolean = e.references.subsetOf(sourceRefs)

    // ---- ON condition → key column -> source expression ----
    val keyExprs: Map[String, Expression] = conjuncts(m.mergeCondition).map {
      case EqualTo(a: Attribute, b) if targetRefs.contains(a) && sourceOnly(b) => a.name -> b
      case EqualTo(b, a: Attribute) if targetRefs.contains(a) && sourceOnly(b) => a.name -> b
      case other => refuse(s"ON conjunct '${other.sql}' (need target.key = <source expr>)")
    }.toMap
    if (keyExprs.keySet != table.kpt.keys.toSet)
      refuse(s"ON must cover exactly the declared keys ${table.kpt.keys.mkString(",")} " +
        s"(got ${keyExprs.keySet.toSeq.sorted.mkString(",")})")

    // ---- matched actions: [Delete(srcCond)?, Update(unconditional)] ----
    val (deleteCond, updateAssigns) = m.matchedActions match {
      case Seq(DeleteAction(Some(c)), u: UpdateAction) =>
        if (!sourceOnly(c)) refuse(s"DELETE condition '${c.sql}' references the target")
        if (u.condition.isDefined) refuse("a conditional UPDATE after DELETE")
        (Some(c), u.assignments)
      case Seq(u: UpdateAction) =>
        if (u.condition.isDefined)
          refuse("a conditional UPDATE with no terminal unconditional action")
        (None, u.assignments)
      case other => refuse(s"matched-clause shape ${other.map(_.getClass.getSimpleName)}")
    }
    val assignMap: Map[String, Expression] = updateAssigns.map { a =>
      val name = a.key match {
        case attr: Attribute => attr.name
        case other => refuse(s"assignment to non-column '${other.sql}'")
      }
      if (!sourceOnly(a.value))
        refuse(s"assignment $name = ${a.value.sql} references the target " +
          "(partial SET keeps pre-image columns — assign every column from source)")
      name -> a.value
    }.toMap
    val missing = rel.output.map(_.name).filterNot(assignMap.contains)
    if (missing.nonEmpty) refuse(s"UPDATE leaves columns ${missing.mkString(",")} unassigned")
    // key assignments must agree with the ON mapping, or a matched row
    // would be re-keyed (a key move is delete+insert, not MERGE UPDATE)
    keyExprs.foreach { case (k, onExpr) =>
      if (assignMap(k).canonicalized != onExpr.canonicalized)
        refuse(s"UPDATE assigns key '$k' differently from the ON clause")
    }

    // ---- not-matched: unconditional INSERT with identical assignments ----
    m.notMatchedActions match {
      case Seq(i: InsertAction) =>
        if (i.condition.isDefined) refuse("a conditional INSERT (the engine " +
          "cannot drop unmatched rows selectively — filter the source instead)")
        val insMap = i.assignments.map(a => a.key.asInstanceOf[Attribute].name -> a.value).toMap
        if (insMap.keySet != assignMap.keySet ||
            insMap.exists { case (k, v) => v.canonicalized != assignMap(k).canonicalized })
          refuse("INSERT assignments differing from UPDATE's (one projected " +
            "source row must serve both verbs)")
      case other => refuse(s"not-matched shape ${other.map(_.getClass.getSimpleName)} " +
        "(exactly one unconditional INSERT required)")
    }

    if (reconcileBySource && deleteCond.isDefined)
      refuse("combining WHEN MATCHED ... THEN DELETE (tombstone protocol) " +
        "with NOT MATCHED BY SOURCE DELETE (full-state reconcile) — a source " +
        "carrying delete markers is not a complete desired state")

    // ---- projected source: (target columns..., op) ----
    val cols: Seq[NamedExpression] = rel.output.map(a =>
      Alias(assignMap(a.name), a.name)())
    val opExpr = deleteCond match {
      case Some(c) => If(c, Literal("d"), Literal("u"))
      case None => Literal("u")
    }
    GraftMergeCommand(table, hasDelete = deleteCond.isDefined,
      reconcile = reconcileBySource,
      Project(cols :+ Alias(opExpr, OpCol)(), m.sourceTable))
  }
}

/** The rewritten MERGE as an eagerly-executed command (Command nodes run on
  * `spark.sql(...)` itself — the semantics SQL users expect of MERGE).
  */
final case class GraftMergeCommand(table: GraftTable, hasDelete: Boolean,
                                   reconcile: Boolean, child: LogicalPlan)
    extends UnaryCommand {
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftMergeCommand =
    copy(child = newChild)
}

/** Post-resolution rewrite: claim every resolved MergeIntoTable whose
  * target is a graft catalog table. Non-graft targets pass through to
  * Spark's own handling (row-level-operation connectors or the planner's
  * unsupported error).
  */
final case class MergeIntoGraftTableRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case m: MergeIntoTable if m.resolved &&
        GraftMergeInto.graftTarget(m.targetTable).isDefined =>
      GraftMergeInto.translate(m)
  }
}

/** Plans [[GraftMergeCommand]]; everything else declines. */
object GraftMergeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GraftMergeCommand =>
      GraftMergeExec(g.table, g.hasDelete, g.reconcile, planLater(g.child)) :: Nil
    case _ => Nil
  }
}

/** Executes the merge: child rows (target columns + op) become a DataFrame
  * fed to the table's own bucket-scoped MERGE. The InternalRow→Row hop here
  * costs one pass over the BATCH (bounded by the CDC batch contract), not
  * the table; the merge itself then runs the engine's normal scoped-commit
  * plan. The one-row-per-key guard rides the same evaluation.
  *
  * Two SQL-surface obligations the Scala surface documents away:
  *
  *  - single evaluation: the engine merge evaluates its source plan more
  *    than once (bucket probe, then the merge itself), under a documented
  *    deterministic-source contract; SQL text can carry `rand()` or an
  *    unordered LIMIT, so the guarded batch is `localCheckpoint`ed once
  *    (the same O(batch) materialization `mergeMor` pays, and it also
  *    forces the cardinality guard exactly once);
  *
  *  - ANSI unmatched-delete semantics: `WHEN MATCHED AND c THEN DELETE`
  *    applies only to MATCHED rows — a source row satisfying `c` whose key
  *    is NOT in the target must still take the unconditional
  *    `WHEN NOT MATCHED THEN INSERT *`. The engine's CDC op protocol would
  *    drop it (a tombstone for an absent key is a no-op by design), so
  *    delete-marked rows are probed against the target with the
  *    bucket+stats-pruned key read ([[graft.cdc.KeyedParquetTable.readForKeys]])
  *    and unmatched ones are re-marked as upserts. The probe scans only
  *    the buckets the delete keys hash into — O(delete subset), not
  *    O(table).
  */
final case class GraftMergeExec(table: GraftTable, hasDelete: Boolean,
                                reconcileBySource: Boolean,
                                child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = Nil

  override protected def withNewChildInternal(newChild: SparkPlan): GraftMergeExec =
    copy(child = newChild)

  private val done = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def run(): Unit = if (done.compareAndSet(false, true)) {
    val spark = table.kpt.spark
    val schema = StructType(child.output.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema)).resolveAndBind()
    val rowRdd = child.execute().mapPartitions { it =>
      val de = enc.createDeserializer()
      it.map(r => de(r.copy()))
    }
    val keys = table.kpt.keys
    val src = spark.createDataFrame(rowRdd, schema)
    // ANSI MERGE cardinality: exactly one source row per key, asserted
    // in-plan (the window rides the merge evaluation; assert_true sits in
    // a projected column Catalyst cannot prune)
    val w = Window.partitionBy(keys.map(col): _*)
    val guarded = src
      .withColumn("__graft_n", count(lit(1)).over(w))
      .withColumn("__graft_card_ok", assert_true(col("__graft_n") === 1,
        lit(s"MERGE cardinality violation: multiple source rows share a key " +
          s"(${keys.mkString(",")})")))
      .filter(col("__graft_card_ok").isNull)
      .drop("__graft_n", "__graft_card_ok")
      .localCheckpoint(true) // single evaluation + guard fires exactly once
    val op = GraftMergeInto.OpCol
    // def, not val: readForKeys pins the target version at CONSTRUCTION, so
    // the matched/unmatched classification must be rebuilt per commit
    // attempt — after a lost race, a key the winner just inserted must flip
    // from 'u' (insert) back to 'd' (real delete) on the retry, or the
    // tombstone row's projected values would be upserted instead.
    def batch(): org.apache.spark.sql.DataFrame = if (!hasDelete) guarded else {
      // ANSI: only MATCHED rows delete — re-mark unmatched tombstones as
      // inserts. Probe = pruned read of the buckets the delete keys hit.
      val dRows = guarded.filter(col(op) === "d")
      val keyCols = keys.map(col)
      val tgtKeys = table.kpt.readForKeys(dRows.select(keyCols: _*))
        .select(keyCols: _*).distinct()
        .withColumn("__graft_exists", lit(true))
      val dFixed = dRows.join(tgtKeys, keys, "left_outer")
        .withColumn(op, when(col("__graft_exists").isNotNull, lit("d"))
          .otherwise(lit("u")))
        .drop("__graft_exists")
      guarded.filter(col(op) =!= "d").unionByName(dFixed)
    }
    // lost-race retry (CommitRetry): each attempt (a) pins the base
    // version, (b) rebuilds the matched/unmatched classification, and
    // (c) merges with expectedBase = that pin — so a racer committing
    // ANYWHERE between the probe and the commit surfaces as a lost race
    // (merge entry check or the commit claim's post-acquire fence) and the
    // retry re-probes the winner's state. Without the pin, a commit landing
    // between probe and merge left no conflict to detect: the merge simply
    // re-read the NEWER state as its base and applied the STALE
    // classification over it (a delete-marked key the racer just inserted
    // stayed 'u' and upserted the tombstone's projected values — caught by
    // the racing-deletes chaos spec). The checkpointed `guarded` keeps the
    // source single-evaluation across attempts.
    if (reconcileBySource)
      // NOT MATCHED BY SOURCE DELETE: the source is the complete desired
      // state — reconcile converges the table to it in one atomic commit
      // (it pins its own base for diff+merge, and its one-row-per-key
      // contract check subsumes the window guard; `guarded` already fired
      // the ANSI cardinality assert on evaluation)
      CommitRetry.retrying("MERGE INTO (reconcile)") {
        table.kpt.reconcile(guarded.drop(op))
      }
    else
      CommitRetry.retrying("MERGE INTO") {
        val base = table.kpt.currentVersion
        table.kpt.merge(batch(), op, None, None, expectedBase = base)
      }
  }

  override def executeCollect(): Array[InternalRow] = { run(); Array.empty }

  override protected def doExecute(): RDD[InternalRow] = {
    run(); sparkContext.emptyRDD
  }
}
