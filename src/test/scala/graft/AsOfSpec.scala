package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("lastValueAsOf: latest right at-or-before left time; null when none; inclusive ties") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, ts("2026-01-01 10:00:00")),
      (2L, 100L, ts("2026-01-01 10:05:00")),
      (3L, 100L, ts("2026-01-01 09:00:00")),  // before any quote → null
      (4L, 200L, ts("2026-01-01 10:00:00"))   // key with no quotes at all → null
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (100L, ts("2026-01-01 10:00:00"), 1.5), // tie with trade 1 → inclusive match
      (100L, ts("2026-01-01 10:03:00"), 2.5)
    ).toDF("sym", "qt", "px")

    val out = AsOf.lastValueAsOf(trades, quotes, "sym", "t", "sym", "qt",
        struct(col("qt"), col("px")), "q")
      .select(col("trade_id"), col("q.px").as("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(out(1L).contains(1.5))  // inclusive: quote at exactly 10:00
    assert(out(2L).contains(2.5))  // latest of the two prior quotes
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("forward direction: earliest right at-or-after; tolerance nulls distant matches") {
    import spark.implicits._
    val orders = Seq(
      (1L, 100L, ts("2026-01-01 10:00:00")),   // fill at 10:01 (earliest ≥)
      (2L, 100L, ts("2026-01-01 10:01:00")),   // tie → inclusive, matches 10:01
      (3L, 100L, ts("2026-01-01 12:00:00"))    // nothing after → null
    ).toDF("order_id", "sym", "t")
    val fills = Seq(
      (100L, ts("2026-01-01 09:00:00"), 1.0),
      (100L, ts("2026-01-01 10:01:00"), 2.0),
      (100L, ts("2026-01-01 10:30:00"), 3.0)
    ).toDF("sym", "ft", "fx")
    val fwd = AsOf.lastValueAsOf(orders, fills, "sym", "t", "sym", "ft",
        col("fx"), "fx", direction = "forward")
      .collect().map(r => r.getAs[Long]("order_id") -> Option(r.get(3))).toMap
    assert(fwd(1L).contains(2.0))
    assert(fwd(2L).contains(2.0))
    assert(fwd(3L).isEmpty)

    // backward with 2-minute tolerance: order 1's nearest prior fill is
    // 09:00 — 60 minutes away → nulled; order 2's is 10:01 (0 min) → kept
    val tol = AsOf.lastValueAsOf(orders, fills, "sym", "t", "sym", "ft",
        col("fx"), "fx", toleranceMs = 2 * 60 * 1000L)
      .collect().map(r => r.getAs[Long]("order_id") -> Option(r.get(3))).toMap
    assert(tol(1L).isEmpty)
    assert(tol(2L).contains(2.0))
  }

  test("left columns pass through unchanged") {
    import spark.implicits._
    val l = Seq((1L, "a", ts("2026-01-01 00:00:01"))).toDF("id", "tag", "t")
    val r = Seq((1L, ts("2026-01-01 00:00:00"), 9.0)).toDF("id", "rt", "v")
    val out = AsOf.lastValueAsOf(l, r, "id", "t", "id", "rt", col("v"), "v")
    assert(out.columns.toSeq == Seq("id", "tag", "t", "v"))
    val row = out.collect().head
    assert(row.getAs[String]("tag") == "a" && row.getAs[Double]("v") == 9.0)
  }

  test("nativeAsOf (custom exec): inclusive backward matches, null before-any and no-key") {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, ts("2026-01-01 10:00:00")),
      (2L, 100L, ts("2026-01-01 10:05:00")),
      (3L, 100L, ts("2026-01-01 09:00:00")),
      (4L, 200L, ts("2026-01-01 10:00:00"))
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (100L, ts("2026-01-01 10:00:00"), 1.5),
      (100L, ts("2026-01-01 10:03:00"), 2.5)
    ).toDF("sym", "qt", "px")
    val out = AsOf.nativeAsOf(trades, quotes, "sym", "t", "sym", "qt")
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("r_px"))).toMap
    assert(out(1L).contains(1.5))
    assert(out(2L).contains(2.5))
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("nativeAsOf: forward direction and tolerance match the union-merge form") {
    import spark.implicits._
    val orders = Seq(
      (1L, 100L, ts("2026-01-01 10:00:00")),
      (2L, 100L, ts("2026-01-01 10:01:00")),
      (3L, 100L, ts("2026-01-01 12:00:00"))
    ).toDF("order_id", "sym", "t")
    val fills = Seq(
      (100L, ts("2026-01-01 09:00:00"), 1.0),
      (100L, ts("2026-01-01 10:01:00"), 2.0),
      (100L, ts("2026-01-01 10:30:00"), 3.0)
    ).toDF("sym", "ft", "fx")
    val fwd = AsOf.nativeAsOf(orders, fills, "sym", "t", "sym", "ft",
        direction = "forward")
      .collect().map(r => r.getAs[Long]("order_id") -> Option(r.getAs[Any]("r_fx"))).toMap
    assert(fwd(1L).contains(2.0))
    assert(fwd(2L).contains(2.0))
    assert(fwd(3L).isEmpty)
    val tol = AsOf.nativeAsOf(orders, fills, "sym", "t", "sym", "ft",
        toleranceMs = 2 * 60 * 1000L)
      .collect().map(r => r.getAs[Long]("order_id") -> Option(r.getAs[Any]("r_fx"))).toMap
    assert(tol(1L).isEmpty)
    assert(tol(2L).contains(2.0))
  }

  test("nativeAsOf ≡ lastValueAsOf on the events corpus (differential)") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_uid"), col("ts").as("click_ts"))
      .agg(max(col("value")).as("click_value"))
    val union = AsOf.lastValueAsOf(purchases, clicks,
        "user_id", "ts", "c_uid", "click_ts",
        struct(col("click_ts"), col("click_value")), "asof")
      .select(col("event_id"), col("asof.click_value").as("click_value"))
    val native = AsOf.nativeAsOf(purchases, clicks, "user_id", "ts", "c_uid", "click_ts")
      .select(col("event_id"), col("r_click_value").as("click_value"))
    assert(native.count() == purchases.count())
    assert(union.exceptAll(native).isEmpty && native.exceptAll(union).isEmpty)
  }

  test("exec null handling: null left key/time rows come through with a null match") {
    import spark.implicits._
    // Drive AsOfJoinPlan.dataFrame DIRECTLY (nativeAsOf pre-filters
    // right nulls; the public plan entry must be safe on its own —
    // a null left time must NOT unbox to epoch-0 and match).
    val left = Seq(
      (1L, Some(100L), Some(1000L)),
      (2L, Some(100L), None),        // null time → null match
      (3L, None, Some(1000L))        // null key → null match
    ).toDF("id", "__lk", "__lt")
    val right = Seq(
      (Some(100L), Some(500L), "early"),
      (Some(100L), None, "null-time"), // unmatchable, must be skipped
      (None, Some(1L), "null-key")     // unmatchable, must be skipped
    ).toDF("__rk", "__rt", "payload")
    val out = graft.plans.AsOfJoinPlan.dataFrame(spark,
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        "__lk", "__lt", "__rk", "__rt", 0L)
      .select(col("id"), col("payload"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains("early"))
    assert(out(2L).isEmpty, "null left time must not match (epoch-0 unbox bug)")
    assert(out(3L).isEmpty, "null left key must not match")
  }

  test("nativeAsOf rejects reserved-name and prefix collisions up front") {
    import spark.implicits._
    val l  = Seq((1L, ts("2026-01-01 10:00:00"))).toDF("k", "t")
    val lr = Seq((1L, ts("2026-01-01 10:00:00"), 0L)).toDF("k", "t", "__lk")
    val r  = Seq((1L, ts("2026-01-01 09:00:00"), 2.0)).toDF("k", "t", "px")
    intercept[IllegalArgumentException] {
      AsOf.nativeAsOf(lr, r, "k", "t", "k", "t")
    }
    // left column "r_px" collides with the prefixed right "px"
    val lClash = Seq((1L, ts("2026-01-01 10:00:00"), 9.0)).toDF("k", "t", "r_px")
    intercept[IllegalArgumentException] {
      AsOf.nativeAsOf(lClash, r, "k", "t", "k", "t")
    }
    // distinct prefix resolves the clash
    val ok = AsOf.nativeAsOf(lClash, r, "k", "t", "k", "t", rightPrefix = "rt_")
    assert(ok.columns.count(_ == "r_px") == 1 && ok.columns.contains("rt_px"))
  }
}
