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

  // -----------------------------------------------------------------
  // multi-clause MERGE
  // -----------------------------------------------------------------

  import Merge.{tgt, src, MatchedUpdate, MatchedDelete, NotMatchedInsert,
    NotMatchedInsertAll, NotMatchedBySourceUpdate, NotMatchedBySourceDelete}

  private def target4 = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
  }

  test("multi-clause: conditional update, conditional delete, conditional insert, by-source delete, unclaimed passthrough") {
    import spark.implicits._
    val source = Seq(
      (1L, "A", 100.0),  // matched, bal<15 → update fires
      (2L, "B", -1.0),   // matched, source bal<0 → delete fires
      (3L, "C", 300.0),  // matched, neither condition → passthrough
      (8L, "H", 80.0),   // not matched, v>50 → insert fires
      (9L, "I", 5.0))    // not matched, v<=50 → NOT inserted
      .toDF("k", "nm", "v")
    val out = Merge.merge(target4, source, Seq("k"), Seq(
      MatchedDelete(Some(src("v") < 0)),
      MatchedUpdate(Some(tgt("bal") < 15.0),
        Map("name" -> src("nm"), "bal" -> src("v"))),
      NotMatchedInsert(Some(src("v") > 50.0),
        Map("name" -> src("nm"), "bal" -> src("v"))),
      // target rows absent from the source: keep 3? no — 3 matches;
      // 4 is target-only with bal 40 → delete when bal > 35
      NotMatchedBySourceDelete(Some(tgt("bal") > 35.0))))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "A", 100.0), (3L, "c", 30.0), (8L, "H", 80.0)))
  }

  test("multi-clause: first-match order within a group decides") {
    import spark.implicits._
    val source = Seq((1L, 99.0)).toDF("k", "v")
    // both clauses' conditions hold; the FIRST (set bal=v) must win
    val first = Merge.merge(target4, source, Seq("k"), Seq(
      MatchedUpdate(Some(src("v") > 0), Map("bal" -> src("v"))),
      MatchedUpdate(None, Map("bal" -> lit(-1.0)))))
      .filter(col("k") === 1L).collect().head.getDouble(2)
    assert(first == 99.0)
    val swapped = Merge.merge(target4, source, Seq("k"), Seq(
      MatchedUpdate(None, Map("bal" -> lit(-1.0))),
      MatchedUpdate(Some(src("v") > 0), Map("bal" -> src("v")))))
      .filter(col("k") === 1L).collect().head.getDouble(2)
    assert(swapped == -1.0)
  }

  test("multi-clause: INSERT * maps same-named source columns, nulls the rest; plain INSERT nulls unlisted columns") {
    import spark.implicits._
    val source = Seq((7L, "g"), (8L, "h")).toDF("k", "name") // no bal column
    val all = Merge.merge(target4, source, Seq("k"),
      Seq(NotMatchedInsertAll(None))).filter(col("k") >= 7L)
      .orderBy("k").collect()
    assert(all.map(_.getString(1)).toSeq == Seq("g", "h"))
    assert(all.forall(_.isNullAt(2)), "INSERT * must null-fill missing source columns")
    val listed = Merge.merge(target4, source, Seq("k"),
      Seq(NotMatchedInsert(None, Map("bal" -> lit(7.0)))))
      .filter(col("k") >= 7L).orderBy("k").collect()
    assert(listed.forall(_.isNullAt(1)), "unlisted columns insert NULL")
    assert(listed.map(_.getDouble(2)).toSeq == Seq(7.0, 7.0))
  }

  test("multi-clause: by-source UPDATE flags stale rows; matched rows and claimed inserts coexist") {
    import spark.implicits._
    val source = Seq((1L, 11.0)).toDF("k", "v")
    val out = Merge.merge(target4, source, Seq("k"), Seq(
      MatchedUpdate(None, Map("bal" -> src("v"))),
      NotMatchedBySourceUpdate(Some(tgt("bal") >= 30.0), Map("name" -> lit("stale")))))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a", 11.0), (2L, "b", 20.0),
      (3L, "stale", 30.0), (4L, "stale", 40.0)))
  }

  test("multi-clause merge with update-all + insert-all reproduces upsert exactly") {
    import spark.implicits._
    val changes = Seq((2L, "b2", 22.0), (9L, "i", 90.0)).toDF("k", "name", "bal")
    val viaMerge = Merge.merge(target4, changes, Seq("k"), Seq(
      MatchedUpdate(None, Map("name" -> src("name"), "bal" -> src("bal"))),
      NotMatchedInsertAll(None)))
    val viaUpsert = Merge.upsert(target4, changes, Seq("k"))
    assert(graft.operators.Integrity.same(viaMerge.orderBy("k"), viaUpsert.orderBy("k")))
  }

  test("multi-clause: NULL clause condition is false (SQL WHEN semantics)") {
    import spark.implicits._
    val source = Seq((1L, null.asInstanceOf[java.lang.Double])).toDF("k", "v")
    val out = Merge.merge(target4, source, Seq("k"), Seq(
      MatchedUpdate(Some(src("v") > 0), Map("bal" -> lit(-1.0)))))
      .filter(col("k") === 1L).collect().head.getDouble(2)
    assert(out == 10.0, "a NULL condition must not fire the clause")
  }
}
