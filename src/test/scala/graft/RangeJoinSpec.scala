package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("priorAggWithin: strict lookback window, zero rows included, bucket boundary crossed") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, ts("2026-01-01 10:00:00"), 1.0),
      (2L, 7L, ts("2026-01-01 10:09:59"), 2.0),  // within 10m of #1
      (3L, 7L, ts("2026-01-01 10:10:00"), 4.0),  // exactly 10m after #1 (inclusive), 1s after #2
      (4L, 7L, ts("2026-01-01 11:00:00"), 8.0),  // nothing within 10m
      (5L, 9L, ts("2026-01-01 10:00:30"), 16.0)  // other user unaffected
    ).toDF("event_id", "user_id", "ts", "value")
    val out = RangeJoin.priorAggWithin(ev, ev, "user_id", "event_id", "ts", "ts",
        "value", delayUs = 600000000L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_prior"), r.getAs[Double]("prior_value")))).toMap
    assert(out(1L) == ((0L, 0.0)))
    assert(out(2L) == ((1L, 1.0)))
    assert(out(3L) == ((2L, 3.0)))  // inclusive ≤ 10m catches #1, plus #2
    assert(out(4L) == ((0L, 0.0)))
    assert(out(5L) == ((0L, 0.0)))
  }

  test("bandCandidates: |Δt| ≤ δ pairs across bucket boundaries, keyed") {
    import spark.implicits._
    val l = Seq((7L, ts("2026-01-01 10:00:05"), "L1")).toDF("k0", "t", "ltag")
    val r = Seq(
      (7L, ts("2026-01-01 09:59:58"), "R-prev-bucket"),
      (7L, ts("2026-01-01 10:00:09"), "R-same"),
      (7L, ts("2026-01-01 10:00:20"), "R-too-late"),
      (8L, ts("2026-01-01 10:00:05"), "R-other-key")
    ).toDF("k0", "rt", "rtag")
    val pairs = RangeJoin.bandCandidates(l, r, "k0", "t", "rt", delayUs = 10000000L,
        leftCols = Seq("ltag"), rightCols = Seq("rtag"))
      .select("rtag").collect().map(_.getString(0)).toSet
    assert(pairs == Set("R-prev-bucket", "R-same"))
  }
}
