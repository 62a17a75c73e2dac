package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

/** Differential spec for the distributed bin-then-refine exact
  * selection: every (group, p) must equal the brute-force sorted
  * quantile_cont computed locally.
  */
class SelectionSpec extends SparkSpec {

  /** Reference: quantile_cont over an in-memory sorted vector. */
  private def refQuantile(sorted: Vector[Double], p: Double): Double = {
    val idx = p * (sorted.size - 1)
    val lo  = math.floor(idx).toInt
    val hi  = math.ceil(idx).toInt
    sorted(lo) + (sorted(hi) - sorted(lo)) * (idx - lo)
  }

  test("exactQuantiles matches brute-force quantile_cont on skewed multi-group data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // three groups with different sizes and shapes, incl. heavy value
    // skew in g-skew (90% of mass in one narrow band — the worst case
    // for equi-width binning, which only costs refine-pass size)
    val data =
      (1 to 4001).map(_ => ("g-uniform", rnd.nextDouble() * 1000.0)) ++
      (1 to 997).map(_ => ("g-exp", -math.log(rnd.nextDouble()) * 50.0)) ++
      (1 to 3000).map(i => ("g-skew",
        if (i % 10 == 0) rnd.nextDouble() * 5000.0 else 100.0 + rnd.nextDouble()))
    val df = data.toDF("g", "v").repartition(7)
    val ps = Seq(0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0)
    val got = Selection.exactQuantiles(df, "g", "v", ps, bins = 64)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byGroup = data.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toVector.sorted }
    for ((g, sorted) <- byGroup; p <- ps) {
      val want = refQuantile(sorted, p)
      val have = got((g, p))
      assert(math.abs(have - want) < 1e-9 * math.max(1.0, math.abs(want)),
        s"group $g p=$p: got $have want $want")
    }
    assert(got.size == byGroup.size * ps.size)
  }

  test("exactQuantiles edge cases: single row, all-identical group, two rows") {
    import spark.implicits._
    val df = Seq(
      ("one", 7.5),
      ("same", 3.0), ("same", 3.0), ("same", 3.0),
      ("two", 1.0), ("two", 2.0)).toDF("g", "v")
    val got = Selection.exactQuantiles(df, "g", "v", Seq(0.0, 0.5, 1.0), bins = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got(("one", 0.0)) == 7.5 && got(("one", 0.5)) == 7.5 && got(("one", 1.0)) == 7.5)
    assert(got(("same", 0.5)) == 3.0)                 // degenerate short-circuit
    assert(got(("two", 0.0)) == 1.0)
    assert(math.abs(got(("two", 0.5)) - 1.5) < 1e-12) // interpolated midpoint
    assert(got(("two", 1.0)) == 2.0)
  }

  test("exactQuantilesMulti: two columns share passes and match per-column singles") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map(_ => ("g" + rnd.nextInt(3),
      rnd.nextDouble() * 100.0, -math.log(rnd.nextDouble()))).toDF("g", "a", "b")
    val multi = Selection.exactQuantilesMulti(df, "g",
        Seq("a" -> Seq(0.25, 0.75), "b" -> Seq(0.5)), bins = 32)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    val aSingle = Selection.exactQuantiles(df, "g", "a", Seq(0.25, 0.75), bins = 32)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val bSingle = Selection.exactQuantiles(df, "g", "b", Seq(0.5), bins = 32)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(multi.size == 9) // 3 groups × (2 + 1) targets
    aSingle.foreach { case ((g, p), v) => assert(multi((g, "a", p)) == v, s"a $g $p") }
    bSingle.foreach { case ((g, p), v) => assert(multi((g, "b", p)) == v, s"b $g $p") }
  }

  test("exactQuantiles ignores nulls like the SQL aggregate") {
    import spark.implicits._
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(3.0)))
      .toDF("g", "v")
    val got = Selection.exactQuantiles(df, "g", "v", Seq(0.5))
      .collect().map(r => r.getDouble(2))
    assert(got.length == 1 && math.abs(got(0) - 2.0) < 1e-12)
  }
}
