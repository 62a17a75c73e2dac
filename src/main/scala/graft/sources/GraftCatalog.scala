package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark DSv2 `TableCatalog` over [[Snapshot]] tables — the piece
  * that makes the table layer a pure-SQL surface:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/warehouse")
  *
  *   CREATE TABLE graft.db.orders (o_orderkey BIGINT, o_total DECIMAL(12,2))
  *   INSERT INTO graft.db.orders SELECT ...       -- one O(batch) append version
  *   INSERT OVERWRITE graft.db.orders SELECT ...  -- a full-replace version
  *   SELECT * FROM graft.db.orders                -- latest, stats-pruned scan
  *   SELECT * FROM graft.db.orders VERSION AS OF 3
  *   SELECT * FROM graft.db.orders TIMESTAMP AS OF '2026-08-01 00:00:00'
  *   ALTER TABLE graft.db.orders RENAME COLUMN o_total TO total  -- metadata-only
  *   ALTER TABLE graft.db.orders DROP COLUMN note                -- metadata-only
  *   ALTER TABLE graft.db.orders ADD COLUMN note STRING          -- metadata-only
  * }}}
  *
  * Layout: a table named `ns1.….t` lives at `<warehouse>/ns1/…/t` —
  * the directory IS the table (its `_versions/` log is the catalog
  * state), so there is no metastore to drift from the data: `DROP
  * TABLE` is a directory delete, a namespace is a directory, and any
  * existing snapshot dir moved under the warehouse is instantly a
  * catalog table. Time travel resolves through the same
  * version/timestamp machinery as the library API (`VERSION AS OF` →
  * that manifest, `TIMESTAMP AS OF` → binary search over monotone
  * commit timestamps, schema and column mapping OF THAT ERA).
  *
  * ALTERs route to the metadata-only column-mapping commits: RENAME /
  * DROP / ADD COLUMN never touch a data byte regardless of table size.
  * `DELETE FROM t [WHERE …]` works too (SupportsDelete → the
  * MERGE-ON-READ `Snapshot.deleteWhere`: deletion vectors, zero file
  * rewrites). UPDATE/MERGE INTO SQL is not wired into the analyzer
  * (that needs the full SupportsRowLevelOperations plumbing); use the
  * library API (`Snapshot.upsert` / `mergeInto`) — the same split most
  * formats shipped with first.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark = SparkSession.active

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"catalog '$name' needs spark.sql.catalog.$name.warehouse = <dir>")
  }

  override def name(): String = catalogName

  private def checkPart(p: String): String = {
    require(p.nonEmpty && !p.contains("/") && !p.startsWith("_") && !p.startsWith("."),
      s"illegal catalog name part '$p'")
    p
  }

  private def tableDir(ident: Identifier): String =
    (warehouse +: (ident.namespace().toSeq :+ ident.name()).map(checkPart)).mkString("/")

  private def nsDir(ns: Array[String]): String =
    (warehouse +: ns.toSeq.map(checkPart)).mkString("/")

  private def isTable(dir: String): Boolean =
    Snapshot.latestVersion(spark, dir).isDefined

  // ---------------------------------------------------------------
  // tables
  // ---------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = new Path(nsDir(namespace))
    if (!fs.exists(d)) throw new NoSuchNamespaceException(namespace.toSeq)
    fs.listStatus(d).toSeq
      .filter(s => s.isDirectory && isTable(s.getPath.toString))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    val v = Snapshot.latestVersion(spark, dir).getOrElse(
      throw new NoSuchTableException(ident))
    new SnapshotStreamTable(Snapshot.readManifest(spark, dir, v).schema, dir)
  }

  /** `VERSION AS OF <v>` — the scan is PINNED to that manifest (its
    * file set, schema, and column mapping), immutable under any later
    * commit.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft VERSION AS OF takes a numeric snapshot version, got '$version'")
    }
    require(Snapshot.versions(spark, dir).contains(v),
      s"no version $v at $dir (vacuumed or never committed)")
    new SnapshotStreamTable(Snapshot.readManifest(spark, dir, v).schema, dir, Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    val v = Snapshot.versionAtOrBefore(spark, dir, timestampMicros / 1000L)
    new SnapshotStreamTable(Snapshot.readManifest(spark, dir, v).schema, dir, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables take no PARTITIONED BY: layout is the snapshot layer's " +
        "optimize(clusterBy/zorderBy) + manifest-stats skipping")
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident.namespace().toSeq :+ ident.name())
    // version 1 = the schema with zero rows; every later INSERT is an
    // O(batch) append version
    Snapshot.commit(spark, dir,
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    new SnapshotStreamTable(schema, dir)
  }

  /** SQL ALTER TABLE routed to the METADATA-ONLY column-mapping
    * commits — rename/drop/add never rewrite a data file.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    changes.foreach {
      case c: TableChange.RenameColumn =>
        require(c.fieldNames().length == 1, "nested column rename is not supported")
        Snapshot.renameColumn(spark, dir, c.fieldNames()(0), c.newName())
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames().length == 1, "nested column drop is not supported")
        Snapshot.dropColumn(spark, dir, c.fieldNames()(0))
      case c: TableChange.AddColumn =>
        require(c.fieldNames().length == 1, "nested column add is not supported")
        Snapshot.addColumn(spark, dir, c.fieldNames()(0), c.dataType().sql)
      case other => throw new UnsupportedOperationException(
        s"graft catalog cannot apply $other — supported ALTERs: " +
          "RENAME COLUMN, DROP COLUMN, ADD COLUMN (all metadata-only)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) false
    else fs.delete(new Path(dir), true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    val to = tableDir(newIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent.namespace().toSeq :+ newIdent.name())
    fs.mkdirs(new Path(to).getParent)
    require(fs.rename(new Path(from), new Path(to)),
      s"rename $from -> $to failed")
  }

  // ---------------------------------------------------------------
  // namespaces (directories)
  // ---------------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_") &&
        !isTable(s.getPath.toString))
      .map(s => Array(s.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val d = new Path(nsDir(namespace))
    if (!fs.exists(d)) throw new NoSuchNamespaceException(namespace.toSeq)
    fs.listStatus(d).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_") &&
        !isTable(s.getPath.toString))
      .map(s => namespace :+ s.getPath.getName).toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!fs.exists(new Path(nsDir(namespace))))
      throw new NoSuchNamespaceException(namespace.toSeq)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    fs.mkdirs(new Path(nsDir(namespace)))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = new Path(nsDir(namespace))
    if (!fs.exists(d)) false
    else {
      require(cascade || fs.listStatus(d).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
      fs.delete(d, true)
    }
  }
}
