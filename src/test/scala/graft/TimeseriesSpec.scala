package graft

import graft.operators.Timeseries
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TimeseriesSpec extends SparkSpec {

  test("densify: full spine per key, zero-fill, forward-fill across the gap") {
    import spark.implicits._
    val series = Seq(
      ("a", Timestamp.valueOf("2026-01-01 10:00:00"), 2L, 5.0),
      // 11:00 and 12:00 missing for a
      ("a", Timestamp.valueOf("2026-01-01 13:00:00"), 1L, 7.0),
      ("b", Timestamp.valueOf("2026-01-01 11:00:00"), 3L, 9.0)
    ).toDF("k", "h", "n", "total")
    val out = Timeseries.densify(series, "k", "h", "1 hour",
        zeroFill = Seq("n"), ffill = Seq("total"))
      .orderBy(col("k"), col("h")).collect()
    // spine: 2 keys x 4 hours (10:00..13:00)
    assert(out.length == 8)
    val a = out.filter(_.getString(0) == "a")
      .map(r => (r.getTimestamp(1).toString, r.getLong(2), r.getAs[Double]("ffill_total")))
    assert(a.toSeq == Seq(
      ("2026-01-01 10:00:00.0", 2L, 5.0),
      ("2026-01-01 11:00:00.0", 0L, 5.0),   // gap: zero count, carried total
      ("2026-01-01 12:00:00.0", 0L, 5.0),
      ("2026-01-01 13:00:00.0", 1L, 7.0)))
    val b = out.filter(_.getString(0) == "b")
      .map(r => (r.getTimestamp(1).toString, r.getAs[Double]("ffill_total")))
    // b has nothing before 11:00 → ffill floor 0.0
    assert(b.head == ("2026-01-01 10:00:00.0", 0.0))
    assert(b(1) == ("2026-01-01 11:00:00.0", 9.0))
    assert(b(3) == ("2026-01-01 13:00:00.0", 9.0))
  }
}
