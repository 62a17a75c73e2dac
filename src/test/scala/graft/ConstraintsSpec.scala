package graft

import graft.operators.Constraints
import graft.operators.Constraints.Check
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

class ConstraintsSpec extends SparkSpec {

  test("report: metrics land in bands, violations fail, one row per check") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None, -5.0), (4L, Some("a"), 40.0)
    ).toDF("id", "tag", "amount")
    val out = Constraints.report(df, Seq(
      Check("complete_tag", Constraints.completeness(col("tag")), 1.0, 1.0),
      Check("unique_id", Constraints.uniqueness(col("id")), 1.0, 1.0),
      Check("amount_min", min(col("amount")).cast(DoubleType), 0.0, 1e18),
      Check("tag_domain", Constraints.containment(col("tag"), Seq("a", "b")), 1.0, 1.0)
    )).collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(out.size == 4)
    assert(out("complete_tag") == (0.75, false))   // one null tag
    assert(out("unique_id") == (1.0, true))
    assert(out("amount_min") == (-5.0, false))     // below the floor
    assert(out("tag_domain") == (1.0, true))       // nulls count as contained
  }

  test("uniqueness metric detects duplicate keys") {
    import spark.implicits._
    val dup = Seq(1L, 2L, 2L, 3L).toDF("id")
    val out = Constraints.report(dup,
      Seq(Check("unique_id", Constraints.uniqueness(col("id")), 1.0, 1.0))).collect().head
    assert(out.getDouble(1) == 0.75 && !out.getBoolean(2))
  }

  test("containedIn: dangling foreign keys lower the metric; nulls are contained") {
    import spark.implicits._
    val fact = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val r = Constraints.containedIn(fact, "fk", dim, "k", "ref").collect().head
    assert(r.getString(0) == "ref")
    assert(r.getDouble(1) == 0.75)   // 99 dangles; null counts as contained
    assert(!r.getBoolean(2))
    val clean = Constraints.containedIn(
      Seq(1L, 2L).toDF("fk"), "fk", dim, "k", "ref2").collect().head
    assert(clean.getDouble(1) == 1.0 && clean.getBoolean(2))
  }
}
