package graft

import java.nio.file.Files

import graft.sources.Snapshot
import org.apache.spark.sql.functions._

/** The pure-SQL surface of the snapshot table layer: a DSv2
  * TableCatalog (`graft.sources.GraftCatalog`) registered at runtime,
  * driven entirely through `spark.sql`.
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-warehouse").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", w)
    w
  }

  test("CREATE TABLE / INSERT INTO / SELECT / VERSION AS OF / INSERT OVERWRITE / DROP TABLE — all through SQL") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.t (id BIGINT, name STRING, bal DOUBLE)")
    spark.sql("INSERT INTO graft.db.t VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
    spark.sql("INSERT INTO graft.db.t VALUES (3, 'c', 30.0)")
    assert(spark.sql("SELECT count(*) FROM graft.db.t").collect()(0).getLong(0) == 3L)
    assert(spark.sql("SELECT sum(bal) FROM graft.db.t").collect()(0).getDouble(0) == 60.0)
    // every INSERT was one append version: v1 empty, v2 two rows, v3 three
    assert(spark.sql("SELECT count(*) FROM graft.db.t VERSION AS OF 1")
      .collect()(0).getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) FROM graft.db.t VERSION AS OF 2")
      .collect()(0).getLong(0) == 2L)
    // INSERT OVERWRITE = a full-replace version; history stays readable
    spark.sql("INSERT OVERWRITE graft.db.t VALUES (9, 'z', 90.0)")
    assert(spark.sql("SELECT count(*) FROM graft.db.t").collect()(0).getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) FROM graft.db.t VERSION AS OF 3")
      .collect()(0).getLong(0) == 3L)
    // listTables sees it; DROP removes it
    assert(spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("t"))
    spark.sql("DROP TABLE graft.db.t")
    assert(!spark.sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).contains("t"))
  }

  test("ALTER TABLE RENAME/DROP/ADD COLUMN are metadata-only commits through SQL; time travel reads each era's names") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.alt (id BIGINT, score DOUBLE, note STRING)")
    spark.sql("INSERT INTO graft.db.alt VALUES (1, 1.5, 'n1'), (2, 2.5, 'n2')")
    val dir = s"$warehouse/db/alt"
    val filesBefore = Snapshot.history(spark, dir).count()
    spark.sql("ALTER TABLE graft.db.alt RENAME COLUMN score TO points")
    spark.sql("ALTER TABLE graft.db.alt DROP COLUMN note")
    spark.sql("ALTER TABLE graft.db.alt ADD COLUMN note STRING")
    assert(spark.sql("SELECT * FROM graft.db.alt").columns.toSeq ==
      Seq("id", "points", "note"))
    // renamed column reads old bytes; re-added note is EMPTY (fresh slot)
    assert(spark.sql("SELECT sum(points) FROM graft.db.alt")
      .collect()(0).getDouble(0) == 4.0)
    assert(spark.sql("SELECT count(note) FROM graft.db.alt")
      .collect()(0).getLong(0) == 0L)
    // pre-alter version still answers under its own names
    assert(spark.sql("SELECT count(note) FROM graft.db.alt VERSION AS OF 2")
      .collect()(0).getLong(0) == 2L)
    // and the three ALTERs moved zero data files
    val m = Snapshot.columnMappingOf(spark, dir)
    assert(m("points") == "score" && m("note") != "note")
    assert(Snapshot.history(spark, dir).count() == filesBefore + 3)
  }

  test("INSERT INTO after a rename writes through the mapping; pushed filters still prune the SQL scan") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.p (id BIGINT, v DOUBLE)")
    import spark.implicits._
    (1L to 50L).map(i => (i, i.toDouble)).toDF("id", "v")
      .repartitionByRange(2, col("id"))
      .createOrReplaceTempView("src50")
    spark.sql("INSERT INTO graft.db.p SELECT * FROM src50")
    spark.sql("ALTER TABLE graft.db.p RENAME COLUMN v TO value")
    spark.sql("INSERT INTO graft.db.p VALUES (51, 51.0)")
    assert(spark.sql("SELECT sum(value) FROM graft.db.p")
      .collect()(0).getDouble(0) == (1 to 51).map(_.toDouble).sum)
    // point predicate on a stats-disjoint layout prunes planned partitions
    val pruned = spark.sql("SELECT value FROM graft.db.p WHERE id = 51")
    assert(pruned.collect().map(_.getDouble(0)).toSeq == Seq(51.0))
    assert(pruned.rdd.getNumPartitions <= 2,
      s"expected <=2 planned partitions, got ${pruned.rdd.getNumPartitions}")
  }

  test("TIMESTAMP AS OF through SQL resolves the era's version") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.ts (id BIGINT)")
    spark.sql("INSERT INTO graft.db.ts VALUES (1)")
    val t = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(5)
    spark.sql("INSERT INTO graft.db.ts VALUES (2)")
    assert(spark.sql(s"SELECT count(*) FROM graft.db.ts TIMESTAMP AS OF '$t'")
      .collect()(0).getLong(0) == 1L)
  }

  test("SQL DELETE FROM is merge-on-read: zero files rewritten, history time-travels, bare DELETE empties metadata-only") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.del (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.db.del SELECT id, CAST(id AS DOUBLE) FROM range(1, 101)")
    val dir = s"$warehouse/db/del"
    def files(ver: Long): Set[String] =
      Snapshot.filesForTest(spark, dir, ver).map(_._1).toSet
    spark.sql("DELETE FROM graft.db.del WHERE id <= 20 AND v > 5.0")    // v3
    assert(spark.sql("SELECT count(*) FROM graft.db.del").collect()(0).getLong(0) == 85L)
    assert(files(2L) == files(3L), "SQL DELETE must not rewrite a data file (merge-on-read)")
    assert(spark.sql("SELECT count(*) FROM graft.db.del VERSION AS OF 2")
      .collect()(0).getLong(0) == 100L)
    // bare DELETE FROM: every row-bearing file fully dead → dropped
    // metadata-only (CREATE TABLE's zero-row part file may remain —
    // it holds nothing to delete)
    spark.sql("DELETE FROM graft.db.del")                                // v4
    assert(spark.sql("SELECT count(*) FROM graft.db.del").collect()(0).getLong(0) == 0L)
    assert(files(4L).subsetOf(files(1L)),
      "bare DELETE must drop every row-bearing file from the manifest")
  }

  test("DataFrameWriterV2: writeTo(...).append() / overwrite commit append and replace versions") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.w2 (id BIGINT, v DOUBLE)")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").writeTo("graft.db.w2").append()
    Seq((3L, 3.0)).toDF("id", "v").writeTo("graft.db.w2").append()
    assert(spark.table("graft.db.w2").count() == 3L)
    Seq((9L, 9.0)).toDF("id", "v").writeTo("graft.db.w2")
      .overwrite(org.apache.spark.sql.functions.lit(true))
    assert(spark.table("graft.db.w2").count() == 1L)
    // every write was a version; appends time-travel
    assert(spark.sql("SELECT count(*) FROM graft.db.w2 VERSION AS OF 3")
      .collect()(0).getLong(0) == 3L)
    val ops = Snapshot.history(spark, s"$warehouse/db/w2").collect()
      .map(_.getString(1)).toSeq
    assert(ops == Seq("init", "append", "append", "replace"))
  }

  test("CBO sees manifest sizes: a small catalog table auto-broadcasts in a join (sizeInBytes from metadata, no file I/O)") {
    warehouse
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.dim (k BIGINT, name STRING)")
    spark.sql("INSERT INTO graft.db.dim SELECT id, 'n' || id FROM range(0, 100)")
    val fact = (0L until 10000L).map(i => (i, i % 100)).toDF("row", "k")
    val joined = fact.join(spark.table("graft.db.dim"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small snapshot table should broadcast from manifest stats:\n$plan")
    assert(joined.count() == 10000L)
  }

  test("table maintenance composes: a deleteWhere'd catalog table reads dv-filtered through SQL") {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("CREATE TABLE graft.db.d (id BIGINT, v DOUBLE)")
    import spark.implicits._
    spark.sql("INSERT INTO graft.db.d SELECT id, CAST(id AS DOUBLE) FROM range(1, 101)")
    Snapshot.deleteWhere(spark, s"$warehouse/db/d", col("id") <= 10L)
    assert(spark.sql("SELECT count(*) FROM graft.db.d").collect()(0).getLong(0) == 90L)
    assert(spark.sql("SELECT min(id) FROM graft.db.d").collect()(0).getLong(0) == 11L)
  }
}
