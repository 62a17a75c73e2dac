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

  /** Driver-side Viterbi forward pass mirroring kleinbergBursts'
    * fold EXACTLY (same op order, same tie rules) — both run on JVM
    * doubles with Math.log, so the comparison is bit-exact.
    */
  private def referenceViterbi(tsMicros: Seq[Long], s: Double, gamma: Double)
      : (Long, Double) = {
    val gaps = tsMicros.sorted.sliding(2).map { case Seq(a, b) => (b - a).toDouble / 1.0e6 }.toSeq
    val t = gaps.foldLeft(0.0)(_ + _)
    val lam0 = gaps.size.toDouble / t
    val lam1 = lam0 * s
    val gln = gamma * math.log(gaps.size.toDouble)
    var (c0, c1, b0, b1) = (0.0, 1.0e18, 0L, 0L)
    gaps.foreach { x =>
      val cost0 = lam0 * x - math.log(lam0)
      val cost1 = lam1 * x - math.log(lam1)
      val enter = c0 + gln
      val c0n = math.min(c0, c1) + cost0
      val b0n = if (c0 <= c1) b0 else b1
      val c1n = math.min(enter, c1) + cost1
      val b1n = (if (c1 <= enter) b1 else b0) + 1L
      c0 = c0n; c1 = c1n; b0 = b0n; b1 = b1n
    }
    (if (c0 <= c1) b0 else b1, math.min(c0, c1))
  }

  test("kleinbergBursts: exact replay of the distributed fold on real event data") {
    val ev = Tables(spark, sf("x"), "events")
    val out = Timeseries.kleinbergBursts(ev, "user_id", "ts", s = 2.0, gamma = 1.0,
        minEvents = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(5))).toMap
    assert(out.nonEmpty, "no users above the minEvents floor at sf0.001")
    val raw = ev.select(col("user_id"), unix_micros(col("ts")).as("tu"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    out.foreach { case (u, (nEvents, burstSteps, cost)) =>
      val tsU = raw(u)
      assert(tsU.size.toLong == nEvents)
      val (refSteps, refCost) = referenceViterbi(tsU, 2.0, 1.0)
      assert(burstSteps == refSteps, s"user $u: $burstSteps vs $refSteps")
      assert(math.abs(cost - BigDecimal(refCost).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"user $u cost")
    }
  }

  test("kleinbergBursts: a planted burst is found, a uniform stream is not") {
    import spark.implicits._
    // user 1: uniform 100s gaps. user 2: same but 10 rapid 2s gaps mid-stream.
    val base = (0 until 30).map(i => (1L, Timestamp.from(
      java.time.Instant.ofEpochSecond(1000000L + i * 100L))))
    val bursty = {
      val pre = (0 until 15).map(i => 1000000L + i * 100L)
      val burst = (1 to 10).map(i => pre.last + i * 2L)
      val post = (1 to 15).map(i => burst.last + i * 100L)
      (pre ++ burst ++ post).map(t => (2L, Timestamp.from(
        java.time.Instant.ofEpochSecond(t))))
    }
    val df = (base ++ bursty).toDF("user_id", "ts")
    val out = Timeseries.kleinbergBursts(df, "user_id", "ts", s = 2.0, gamma = 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 0L, s"uniform stream must stay in the base state: ${out(1L)}")
    assert(out(2L) == 10L, s"planted 10-gap burst must be exactly flagged: ${out(2L)}")
  }
}
