package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, RenameTable, SetViewProperties, ShowViews, SubqueryAlias, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL VIEW support for DSv2 [[ViewCatalog]] catalogs (graft's
  * catalog implements the full connector API, but stock Spark 4.1
  * never calls it: `ResolveSessionCatalog` refuses every view verb
  * addressed at a non-session catalog with MISSING_CATALOG_ABILITY —
  * the same gap Iceberg fills with its own extension rules).
  *
  * [[GraftViewRule]] is injected into the HINT-resolution batch — the
  * only injection point that runs BEFORE the resolution batch where
  * `ResolveSessionCatalog` would throw — and rewrites exactly the
  * plans whose identifier's catalog is a [[ViewCatalog]]:
  *
  *   - CREATE [OR REPLACE] VIEW / DROP VIEW / SHOW VIEWS /
  *     ALTER VIEW SET|UNSET TBLPROPERTIES / ALTER VIEW RENAME →
  *     leaf commands executing against the connector API;
  *   - a SELECT over a stored view expands IN PLACE to its parsed
  *     definition, relation names qualified under the catalog/
  *     namespace captured at creation (so the definition means the
  *     same thing no matter who reads it), wrapped in the view's
  *     column aliases. Nested views expand on the batch's next
  *     fixpoint iteration; a definition cycle exhausts the batch's
  *     iteration budget and fails loudly rather than looping.
  *
  * Everything is metadata-only at any scale: a view is one JSON file
  * in the catalog; expansion is pure plan rewriting.
  */
case class GraftViewRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def catalogManager = session.sessionState.analyzer.catalogManager

  private def viewCatalogOf(name: String): Option[ViewCatalog] =
    try catalogManager.catalog(name) match {
      case v: ViewCatalog => Some(v)
      case _ => None
    } catch { case _: Exception => None }

  /** (catalog, ident) when `parts` names something under a ViewCatalog. */
  private def route(parts: Seq[String]): Option[(String, ViewCatalog, Identifier)] =
    if (parts.length < 2) None
    else viewCatalogOf(parts.head).map(vc =>
      (parts.head, vc, Identifier.of(parts.tail.init.toArray, parts.last)))

  /** Complete a 1/2-part identifier under the CURRENT catalog when that
    * catalog is a ViewCatalog (i.e. after `USE <graft catalog>`) — the
    * same completion the session catalog applies to partial names.
    * Without it a 2-part `SELECT * FROM db.v` or `CREATE VIEW db.v`
    * in a graft-current session would fall through to
    * ResolveSessionCatalog's confusing MISSING_CATALOG_ABILITY /
    * NoSuchTable error instead of routing here. A name that is already
    * catalog-qualified, or a session whose current catalog is not a
    * ViewCatalog, passes through untouched.
    */
  private def completed(parts: Seq[String]): Seq[String] = {
    if (parts.length >= 3 || viewCatalogOf(parts.headOption.getOrElse("")).isDefined)
      parts
    else catalogManager.currentCatalog match {
      case v: ViewCatalog if parts.length == 2 => v.name() +: parts
      case v: ViewCatalog if parts.length == 1 =>
        (v.name() +: catalogManager.currentNamespace.toSeq) ++ parts
      case _ => parts
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), userCols, comment, _,
        props, originalText, _, allowExisting, replace, _) =>
      route(completed(parts)) match {
        case Some((cat, _, ident)) =>
          val sql = originalText.getOrElse(throw new IllegalArgumentException(
            s"CREATE VIEW ${parts.mkString(".")} has no SQL text to store"))
          GraftCreateViewCommand(cat, ident, sql,
            userCols.map(_._1), userCols.map(_._2), comment, props,
            allowExisting, replace,
            catalogManager.currentCatalog.name(),
            catalogManager.currentNamespace.toSeq)
        case None => cv
      }

    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      route(completed(parts)) match {
        case Some((cat, _, ident)) => GraftDropViewCommand(cat, ident, ifExists)
        case None => dv
      }

    case sv @ ShowViews(child, pattern, output) =>
      // `SHOW VIEWS [IN ns]` in a graft-current session lists the
      // current (or named) namespace of the current catalog; a bare
      // SHOW VIEWS parses with a CurrentNamespace child
      val parts: Option[Seq[String]] = child match {
        case UnresolvedNamespace(p, _) => Some(p)
        case org.apache.spark.sql.catalyst.analysis.CurrentNamespace => Some(Nil)
        case _ => None
      }
      val resolved: Option[Seq[String]] = parts.flatMap { p =>
        if (p.nonEmpty && viewCatalogOf(p.head).isDefined) Some(p)
        else catalogManager.currentCatalog match {
          case v: ViewCatalog => Some(v.name() +:
            (if (p.isEmpty) catalogManager.currentNamespace.toSeq else p))
          case _ => None
        }
      }
      resolved.map(p => GraftShowViewsCommand(p.head, p.tail, pattern, output))
        .getOrElse(sv)

    case sp @ SetViewProperties(UnresolvedView(parts, _, _, _), props) =>
      route(completed(parts)) match {
        case Some((cat, _, ident)) =>
          GraftAlterViewPropsCommand(cat, ident, props, Seq.empty, ifExists = true)
        case None => sp
      }

    case up @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, ifExists) =>
      route(completed(parts)) match {
        case Some((cat, _, ident)) =>
          GraftAlterViewPropsCommand(cat, ident, Map.empty, keys, ifExists)
        case None => up
      }

    case rt @ RenameTable(UnresolvedTableOrView(parts, _, _), newName, isView)
        if isView && route(completed(parts)).isDefined =>
      val Some((cat, _, from)) = route(completed(parts))
      val toCompleted = completed(newName)
      val toParts =
        if (toCompleted.headOption.contains(cat)) toCompleted.tail else toCompleted
      val _ = rt
      GraftRenameViewCommand(cat, from,
        Identifier.of(toParts.init.toArray, toParts.last))

    // SELECT through a stored view: expand to the qualified definition
    case u: UnresolvedRelation if completed(u.multipartIdentifier).length >= 3 =>
      route(completed(u.multipartIdentifier)) match {
        case Some((_, vc, ident)) if vc.viewExists(ident) =>
          val v = vc.loadView(ident)
          val parsed = session.sessionState.sqlParser.parsePlan(v.query())
          val qualified = GraftViewRule.qualify(parsed,
            v.currentCatalog(), v.currentNamespace().toSeq)
          val aliased =
            if (v.columnAliases() == null || v.columnAliases().isEmpty) qualified
            else UnresolvedSubqueryColumnAliases(v.columnAliases().toSeq, qualified)
          SubqueryAlias(u.multipartIdentifier.last, aliased)
        case _ => u
      }
  }
}

object GraftViewRule {
  /** Re-anchor the parsed definition under the context it was CREATED
    * in: bare (1-part) and db-qualified (2-part) relation names get the
    * stored catalog/namespace prefixed, so the view reads identically
    * from any session context. Fully-qualified (3+-part) names pass
    * through untouched.
    */
  private[plans] def qualify(plan: LogicalPlan, currentCatalog: String,
      currentNamespace: Seq[String]): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length == 1 =>
      u.copy(multipartIdentifier =
        (currentCatalog +: currentNamespace) :+ u.multipartIdentifier.head)
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 =>
      u.copy(multipartIdentifier = currentCatalog +: u.multipartIdentifier)
  }

  private[plans] def viewCatalog(session: SparkSession, name: String): ViewCatalog =
    session.sessionState.analyzer.catalogManager.catalog(name) match {
      case v: ViewCatalog => v
      case other => throw new IllegalStateException(
        s"catalog '$name' ($other) is not a ViewCatalog")
    }
}

/** CREATE [OR REPLACE] VIEW [IF NOT EXISTS] against a [[ViewCatalog]].
  * The definition is analyzed ONCE here (schema capture + validation —
  * a broken SELECT fails the CREATE, not the first read), then stored
  * as SQL text + context.
  */
case class GraftCreateViewCommand(catalog: String, ident: Identifier,
    sql: String, columnAliases: Seq[String], columnComments: Seq[Option[String]],
    comment: Option[String], properties: Map[String, String],
    allowExisting: Boolean, replace: Boolean,
    currentCatalog: String, currentNamespace: Seq[String])
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    val vc = GraftViewRule.viewCatalog(session, catalog)
    val parsed = session.sessionState.sqlParser.parsePlan(sql)
    val qualified = GraftViewRule.qualify(parsed, currentCatalog, currentNamespace)
    val analyzed = session.sessionState.executePlan(qualified).analyzed
    val querySchema = analyzed.schema
    require(columnAliases.isEmpty || columnAliases.length == querySchema.length,
      s"CREATE VIEW column list has ${columnAliases.length} names for a " +
        s"${querySchema.length}-column query")
    val schema =
      if (columnAliases.isEmpty) querySchema
      else org.apache.spark.sql.types.StructType(
        querySchema.fields.zip(columnAliases).map { case (f, a) => f.copy(name = a) })
    val props = properties ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
    val info = new ViewInfo(ident, sql, currentCatalog, currentNamespace.toArray,
      schema, querySchema.fieldNames, columnAliases.toArray,
      columnComments.map(_.orNull).toArray, props.asJava)
    if (replace) vc.replaceView(info, true)
    else if (allowExisting && vc.viewExists(ident)) ()
    else vc.createView(info)
    Seq.empty
  }
}

case class GraftDropViewCommand(catalog: String, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val dropped = GraftViewRule.viewCatalog(session, catalog).dropView(ident)
    if (!dropped && !ifExists) throw new NoSuchViewException(ident)
    Seq.empty
  }
}

case class GraftShowViewsCommand(catalog: String, namespace: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val vc = GraftViewRule.viewCatalog(session, catalog)
    vc.listViews(namespace: _*).toSeq
      .filter(i => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(i.name()), p).nonEmpty))
      .map(i => Row(i.namespace().mkString("."), i.name(), false))
  }
}

case class GraftAlterViewPropsCommand(catalog: String, ident: Identifier,
    set: Map[String, String], unset: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val vc = GraftViewRule.viewCatalog(session, catalog)
    val existing = vc.loadView(ident).properties().asScala
    // Spark semantics: UNSET without IF EXISTS must FAIL on a missing
    // key — silently filtering it out would let typo'd property names
    // "succeed" while changing nothing
    if (unset.nonEmpty && !ifExists) {
      val missing = unset.filterNot(existing.contains)
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"ALTER VIEW ${ident}: cannot UNSET missing TBLPROPERTIES " +
          s"${missing.mkString("'", "', '", "'")} — add IF EXISTS to ignore")
    }
    val changes: Seq[ViewChange] =
      set.toSeq.map { case (k, v2) => ViewChange.setProperty(k, v2) } ++
        unset.filter(existing.contains).map(ViewChange.removeProperty)
    vc.alterView(ident, changes: _*)
    Seq.empty
  }
}

case class GraftRenameViewCommand(catalog: String, from: Identifier,
    to: Identifier) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    GraftViewRule.viewCatalog(session, catalog).renameView(from, to)
    Seq.empty
  }
}
