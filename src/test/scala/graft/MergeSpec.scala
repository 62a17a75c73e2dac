package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  private def snap = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
  }

  test("update, insert, delete in one batch") {
    import spark.implicits._
    val changes = Seq(
      (2L, "b2", 22.0, false), // update
      (3L, "c", 30.0, true),   // tombstone
      (9L, "i", 90.0, false))  // insert
      .toDF("k", "name", "bal", "_del")
    val out = Merge.upsert(snap, changes, Seq("k"), Some("_del"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 22.0), (9L, "i", 90.0)))
  }

  test("an update may set a column to NULL (presence beats coalesce)") {
    import spark.implicits._
    val changes = Seq((1L, null.asInstanceOf[String], 11.0, false))
      .toDF("k", "name", "bal", "_del")
    val out = Merge.upsert(snap, changes, Seq("k"), Some("_del"))
      .filter(col("k") === 1L).collect().head
    assert(out.isNullAt(out.fieldIndex("name")))
    assert(out.getAs[Double]("bal") == 11.0)
  }

  test("no delete column: every change row upserts") {
    import spark.implicits._
    val changes = Seq((1L, "a1", 1.0), (4L, "d", 40.0)).toDF("k", "name", "bal")
    val out = Merge.upsert(snap, changes, Seq("k"))
      .orderBy("k").collect().map(_.getString(1)).toSeq
    assert(out == Seq("a1", "b", "c", "d"))
  }

  test("empty changes batch is the identity") {
    val changes = snap.filter(lit(false))
    val out = Merge.upsert(snap, changes, Seq("k"))
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("diff tags added/removed/changed, drops unchanged, null-safe on values") {
    import spark.implicits._
    val nu = Seq(
      (1L, "a", 10.0),                          // unchanged → absent
      (2L, null.asInstanceOf[String], 20.0),    // changed (name → NULL)
      (9L, "i", 90.0))                          // added; 3 removed
      .toDF("k", "name", "bal")
    val out = Merge.diff(snap, nu, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getAs[String]("change_type"))).toSeq
    assert(out == Seq((2L, "changed"), (3L, "removed"), (9L, "added")))
  }

  test("diff then upsert round-trips: applying the diff to old yields new") {
    import spark.implicits._
    val nu = Seq((1L, "a", 10.0), (2L, "b2", 22.0), (9L, "i", 90.0)).toDF("k", "name", "bal")
    val d = Merge.diff(snap, nu, Seq("k"))
      .withColumn("_del", col("change_type") === "removed")
      .drop("change_type")
    val applied = Merge.upsert(snap, d, Seq("k"), Some("_del"))
    assert(graft.operators.Integrity.same(applied.orderBy("k"), nu.orderBy("k")))
  }

  test("composite key merge") {
    import spark.implicits._
    val s2 = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val ch = Seq((1L, "y", 9.0)).toDF("k1", "k2", "v")
    val out = Merge.upsert(s2, ch, Seq("k1", "k2"))
      .orderBy("k2").collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(1.0, 9.0))
  }
}
