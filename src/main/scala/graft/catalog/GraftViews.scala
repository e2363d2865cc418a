package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, TableAlreadyExistsException, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedView, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DropView, LogicalPlan, Project, ShowViews, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.StringUtils
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StructField, StructType}

/** SQL-text views over the engine catalog — `CREATE VIEW graft.ns.v AS
  * SELECT ...` / `SELECT ... FROM graft.ns.v` / `SHOW VIEWS IN graft.ns` /
  * `DROP VIEW graft.ns.v`, the view half of the reference's
  * catalog-addressable surface (its REST catalog serves view metadata the
  * same way it serves table metadata; `spark_session.py:97-199` registers
  * one catalog for both).
  *
  * Why this file exists at all: [[GraftCatalog]] implements the DSv2
  * `ViewCatalog` interface, but Spark 4.1's analyzer never consults it —
  * `ResolveSessionCatalog` routes every `CREATE/DROP/SHOW VIEW` statement
  * to the session catalog and throws `UNSUPPORTED_FEATURE.CATALOG_OPERATION`
  * for any other catalog (ResolveSessionCatalog.scala:276 in 4.1.2), and
  * relation resolution never calls `loadView` on a v2 catalog. So the
  * engine claims the statements itself, the same extension-point pattern
  * [[MergeIntoGraftTableRule]] proves for MERGE, with one twist: the
  * refusal fires inside the analyzer's main Resolution batch, BEFORE any
  * injected resolution rule gets a look — so [[GraftViewDdlRule]] is
  * injected into the Hints batch (`injectHintResolutionRule`), which runs
  * first, and matches the still-unresolved statement shapes
  * (`UnresolvedIdentifier` / `UnresolvedNamespace` children).
  *
  * Semantics stored and honored (the `ViewCatalog` contract):
  *   - a view is its SQL text plus the capture context (current catalog +
  *     namespace at CREATE); reads re-parse and re-resolve the text, so
  *     new base-table data is visible without recreation;
  *   - unqualified relation names inside the text resolve in the CAPTURED
  *     context, not the reader's ([[GraftViewReadRule.qualify]]) — the
  *     part of view semantics that silently breaks if one just re-parses;
  *   - temp views still shadow: Spark's own `ResolveRelations` runs
  *     earlier in each Resolution-batch pass, so an identically-named temp
  *     view wins before [[GraftViewReadRule]] is consulted.
  *
  * Direct self-reference refuses loudly; a deeper cycle exhausts the
  * analyzer's fixed-point iterations (Spark's own legacy-view behavior).
  */
object GraftViews {

  /** Resolve a multi-part SQL name to (graft catalog, identifier) if and
    * only if it addresses a [[GraftCatalog]] — two-step name resolution
    * mirroring Spark's: a first part naming a registered catalog wins,
    * otherwise the current catalog + current namespace apply.
    */
  def resolveIdent(spark: SparkSession, parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    val (plugin, rest, explicitCat) =
      if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail, true)
      else (cm.currentCatalog, parts, false)
    plugin match {
      case g: GraftCatalog if rest.nonEmpty =>
        // mirror Spark's CatalogAndIdentifier: a bare name under the
        // CURRENT catalog binds to the current namespace; a name that
        // spelled its catalog explicitly carries exactly the namespace it
        // wrote (possibly none)
        val ns =
          if (rest.length > 1) rest.init.toArray
          else if (explicitCat) Array.empty[String]
          else cm.currentNamespace
        Some((g, Identifier.of(ns, rest.last)))
      case _ => None
    }
  }

  /** Names of temporary views an ANALYZED plan resolved through — the
    * session catalog resolves a temp view to `View(desc, isTempView=true,
    * child)`, so collecting those nodes (including inside subquery
    * expressions) is exactly Spark's own `ViewHelper` temp-object walk.
    */
  def collectTempViewRefs(plan: LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.View
    plan.collect {
      case v: View if v.isTempView => Seq(v.desc.identifier.unquotedString)
      case node => node.expressions.flatMap(_.collect {
        case sq: SubqueryExpression => collectTempViewRefs(sq.plan)
      }.flatten)
    }.flatten
  }

  def resolveNamespace(spark: SparkSession, parts: Seq[String]): Option[(GraftCatalog, Array[String])] = {
    val cm = spark.sessionState.catalogManager
    val (plugin, rest) =
      if (parts.nonEmpty && cm.isCatalogRegistered(parts.head))
        (cm.catalog(parts.head), parts.tail)
      else (cm.currentCatalog, parts)
    plugin match {
      case g: GraftCatalog => Some((g, rest.toArray))
      case _ => None
    }
  }
}

/** Hints-batch rule: claim view DDL addressed at a graft catalog while the
  * statement is still unresolved (see [[GraftViews]] for why so early).
  * Non-graft identifiers pass through untouched to Spark's own handling.
  */
final case class GraftViewDdlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case c @ CreateView(UnresolvedIdentifier(parts, _), userCols, comment, _, props,
                        originalText, _, allowExisting, replace, _) =>
      GraftViews.resolveIdent(spark, parts) match {
        case Some((cat, ident)) =>
          val text = originalText.getOrElse(throw new UnsupportedOperationException(
            s"CREATE VIEW ${parts.mkString(".")} without SQL text (Dataset-defined " +
              "views are session-scoped — use createOrReplaceTempView)"))
          GraftCreateViewCommand(cat, ident, text, userCols.map(c => (c._1, c._2)),
            comment, props, allowExisting, replace)
        case None => c
      }
    case d @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      GraftViews.resolveIdent(spark, parts) match {
        case Some((cat, ident)) => GraftDropViewCommand(cat, ident, ifExists)
        case None => d
      }
    // ALTER VIEW v AS <query> = redefine in place (view must exist; the
    // new text analyzes against the OLD definition like OR REPLACE)
    case a @ AlterViewAs(UnresolvedView(parts, _, _, _), text, _) =>
      GraftViews.resolveIdent(spark, parts) match {
        case Some((cat, ident)) =>
          GraftAlterViewAsCommand(cat, ident, text)
        case None => a
      }
    case s @ ShowViews(UnresolvedNamespace(parts, _), pattern, output) =>
      GraftViews.resolveNamespace(spark, parts) match {
        case Some((cat, ns)) => GraftShowViewsCommand(cat, ns, pattern, output)
        case None => s
      }
    // bare `SHOW VIEWS` (no IN clause) parses with a CurrentNamespace
    // child — claim it when the CURRENT catalog is a graft catalog
    case s @ ShowViews(org.apache.spark.sql.catalyst.analysis.CurrentNamespace,
                       pattern, output) =>
      spark.sessionState.catalogManager.currentCatalog match {
        case g: GraftCatalog =>
          GraftShowViewsCommand(g,
            spark.sessionState.catalogManager.currentNamespace, pattern, output)
        case _ => s
      }
  }
}

/** CREATE [OR REPLACE] VIEW [IF NOT EXISTS]: analyze the text once (schema
  * + error surface at CREATE, matching Spark's session-view behavior),
  * then persist text + capture context through the catalog's ViewCatalog
  * face. Driver-side metadata only — no job runs.
  */
final case class GraftCreateViewCommand(
    catalog: GraftCatalog, ident: Identifier, text: String,
    userCols: Seq[(String, Option[String])], comment: Option[String],
    props: Map[String, String], allowExisting: Boolean, replace: Boolean)
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    if (catalog.tableExists(ident))
      throw new TableAlreadyExistsException(
        (catalog.name() +: ident.namespace() :+ ident.name()).toSeq)
    val exists = catalog.viewExists(ident)
    if (exists && allowExisting) return Nil
    if (exists && !replace) throw new ViewAlreadyExistsException(ident)
    // analyze BEFORE any drop: OR REPLACE text referencing the view itself
    // must resolve against the OLD definition (standard redefinition)
    val analyzed = session.sql(text) // analysis only; nothing executes
    // Refuse text that resolved through a TEMPORARY view (Spark's own rule
    // for persistent views): CREATE analyzes in the creating session where
    // temp views shadow, but reads re-resolve in the CAPTURED catalog +
    // namespace — the temp relation won't exist there, and a same-named
    // graft table would silently bind the read to a DIFFERENT relation
    // than the one CREATE validated.
    val tempRefs = GraftViews.collectTempViewRefs(
      analyzed.queryExecution.analyzed).distinct
    if (tempRefs.nonEmpty) throw new UnsupportedOperationException(
      s"CREATE VIEW ${ident.name()}: the view text references temporary " +
        s"view(s) ${tempRefs.mkString(", ")} — a persistent graft view " +
        "cannot capture session-scoped relations (they resolve differently " +
        "or not at all on read)")
    val qNames = analyzed.schema.fieldNames
    if (userCols.nonEmpty) require(userCols.length == qNames.length,
      s"CREATE VIEW column list has ${userCols.length} names for ${qNames.length} query columns")
    val aliases = userCols.map(_._1).toArray
    val comments = userCols.map(_._2.orNull).toArray
    val schema =
      if (userCols.isEmpty) analyzed.schema
      else StructType(analyzed.schema.fields.zip(aliases).map {
        case (f, a) => f.copy(name = a) })
    val cm = session.sessionState.catalogManager
    val p = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => p.put(k, v) }
    comment.foreach(c => p.put("comment", c))
    if (exists) catalog.dropView(ident) // replace: swap after successful analysis
    catalog.createView(new ViewInfo(ident, text, cm.currentCatalog.name(),
      cm.currentNamespace, schema, qNames, aliases, comments, p))
    Nil
  }
}

final case class GraftDropViewCommand(catalog: GraftCatalog, ident: Identifier,
                                      ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists) throw new NoSuchViewException(ident)
    Nil
  }
}

/** ALTER VIEW ... AS: redefinition of an EXISTING view — OR REPLACE
  * semantics minus the create-if-absent half.
  */
final case class GraftAlterViewAsCommand(catalog: GraftCatalog, ident: Identifier,
                                         text: String)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!catalog.viewExists(ident)) throw new NoSuchViewException(ident)
    GraftCreateViewCommand(catalog, ident, text, Nil, None, Map.empty,
      allowExisting = false, replace = true).run(session)
  }
}

/** SHOW VIEWS [IN ns] [LIKE pattern] — output attributes are the parsed
  * statement's own (namespace, viewName, isTemporary), so the shape always
  * matches Spark's session-catalog SHOW VIEWS.
  */
final case class GraftShowViewsCommand(catalog: GraftCatalog, ns: Array[String],
                                       pattern: Option[String],
                                       override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val names = catalog.listViews(ns.toSeq: _*).map(_.name()).toSeq
    val kept = pattern.map(p => StringUtils.filterPattern(names, p)).getOrElse(names)
    kept.sorted.map(n => Row(ns.mkString("."), n, false))
  }
}

/** Resolution-batch rule: a still-unresolved relation naming a stored graft
  * view expands to its parsed SQL text, names qualified in the CAPTURED
  * context. Runs after Spark's own ResolveRelations in each pass, so temp
  * views and real tables take precedence; fixed-point iteration resolves
  * views-over-views one layer per pass.
  */
final case class GraftViewReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** View-text name resolution: unqualified names bind to the capture
    * context, explicit catalog-qualified names stay as written.
    */
  private def qualify(p: Seq[String], ctxCat: String, ctxNs: Array[String]): Seq[String] =
    if (p.length == 1) (ctxCat +: ctxNs.toSeq) ++ p
    else if (spark.sessionState.catalogManager.isCatalogRegistered(p.head)) p
    else ctxCat +: p

  /** Existence probes must never throw during resolution: an identifier
    * the catalog considers malformed (non-path-safe segment) is simply not
    * a stored view — the analyzer's own table-not-found handling applies.
    */
  private def probes(b: => Boolean): Boolean =
    try b catch { case _: IllegalArgumentException => false }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u @ UnresolvedRelation(parts, _, false) =>
      GraftViews.resolveIdent(spark, parts) match {
        case Some((cat, ident))
          if probes(!cat.tableExists(ident) && cat.viewExists(ident)) =>
          val view = cat.loadView(ident)
          val parsed = spark.sessionState.sqlParser.parsePlan(view.query)
          val ctxCat = view.currentCatalog
          val ctxNs = view.currentNamespace
          val qualified = parsed.transformUp {
            case r @ UnresolvedRelation(p, opts, stream) =>
              UnresolvedRelation(qualify(p, ctxCat, ctxNs), opts, stream)
          }
          qualified.foreach {
            case UnresolvedRelation(p, _, _)
              if GraftViews.resolveIdent(spark, p).exists {
                case (c2, i2) => (c2 eq cat) && i2 == ident } =>
              throw new UnsupportedOperationException(
                s"recursive view: ${view.name()} references itself")
            case _ =>
          }
          val aliased =
            if (view.columnAliases() == null || view.columnAliases().isEmpty) qualified
            else Project(view.queryColumnNames().zip(view.columnAliases()).toSeq.map {
              case (q, a) => Alias(UnresolvedAttribute.quoted(q), a)()
            }, qualified)
          SubqueryAlias(ident.name, aliased)
        case _ => u
      }
  }
}
