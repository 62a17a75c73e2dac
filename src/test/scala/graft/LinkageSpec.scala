package graft

import graft.operators.Linkage
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {

  test("scoreBlockedPairs: scores are the exact field-weight sums, blocks never cross") {
    import spark.implicits._
    val df = Seq(
      (1L, "b1", "x", 10L), (2L, "b1", "x", 10L), (3L, "b1", "y", 10L),
      (4L, "b2", "x", 10L)) // different block: never paired with 1-3
      .toDF("id", "blk", "f1", "f2")
    val out = Linkage.scoreBlockedPairs(df, "id", Seq("blk"),
      Seq(("f1", 30, -10), ("f2", 20, -10)))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("score")).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out((1L, 2L)) == 50L)  // both agree
    assert(out((1L, 3L)) == 10L)  // f1 disagrees, f2 agrees
  }

  test("scoreBlockedPairs: nulls never agree (both-null compares disagree)") {
    import spark.implicits._
    val df = Seq((1L, "b", Option.empty[String]), (2L, "b", Option.empty[String]),
      (3L, "b", Some("v")))
      .toDF("id", "blk", "f1")
    val out = Linkage.scoreBlockedPairs(df, "id", Seq("blk"), Seq(("f1", 5, -1)))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("score")).toMap
    assert(out.values.toSet == Set(-1L)) // no pair scores the agree weight
  }

  test("scoreBlockedPairs: the maxBlock guard drops oversized blocks entirely") {
    import spark.implicits._
    val big = (1L to 50L).map(i => (i, "hot", "v"))
    val small = Seq((100L, "cold", "v"), (101L, "cold", "v"))
    val df = (big ++ small).toDF("id", "blk", "f1")
    val out = Linkage.scoreBlockedPairs(df, "id", Seq("blk"),
      Seq(("f1", 1, 0)), maxBlock = 10).collect()
    assert(out.length == 1) // only the cold pair; the hot block is dropped
    assert(out.head.getAs[Long]("id_a") == 100L)
  }
}
