package graft

import org.apache.spark.sql.functions._

/** Accuracy contract for the HLL sketch query: the approx count must
  * land within the configured relative error of the exact distinct
  * count. The exact path is computed HERE (test-only) — the shipped
  * `sketch_hll` query deliberately carries only the sketch (see
  * Queries.sketchHll).
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val dir = sf("lineitem")
    val approx = Queries.sketchHll.fn(spark, dir)
      .select(col("l_returnflag"), col("approx_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, ex) =>
      val ap = approx(flag).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05,
        s"group $flag: approx $ap vs exact $ex drifted beyond 5%")
    }
  }

  test("approx quantiles within 1% of the exact window-sort percentiles") {
    val dir = sf("lineitem")
    val approx = Queries.sketchQuantiles.fn(spark, dir).collect()
      .map(r => r.getString(0) ->
        Seq(r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))).toMap
    val exact = Queries.q13Percentiles.fn(spark, dir).collect()
      .map(r => r.getString(0) ->
        Seq(r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, ex) =>
      approx(flag).zip(ex).foreach { case (a, e) =>
        assert(math.abs(a - e) / e <= 0.01, s"group $flag: approx $a vs exact $e")
      }
    }
  }

  test("count-min sketch estimates are exact-or-overestimates within eps bound") {
    val dir = sf("events")
    val approx = Queries.sketchCms.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, dir, "events")
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (t, ex) =>
      val ap = approx(t)
      assert(ap >= ex, s"CMS must never underestimate: $t $ap < $ex")
      assert(ap <= ex + (0.001 * total).ceil.toLong + 1,
        s"CMS overestimate beyond eps*N bound: $t $ap vs $ex (N=$total)")
    }
  }

  test("frequent-items sketch surfaces every true heavy hitter") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // one dominant value (60%), one moderate (25%), long uniform tail
    val vals = (1 to 2000).map { _ =>
      val d = rnd.nextDouble()
      if (d < 0.6) "hot" else if (d < 0.85) "warm" else s"cold${rnd.nextInt(500)}"
    }
    val found = vals.toDF("k").stat.freqItems(Seq("k"), 0.2)
      .collect().head.getSeq[String](0).toSet
    assert(found.contains("hot") && found.contains("warm"),
      s"heavy hitters must be present, got $found")
  }

  test("hllRollup: per-group and merged-from-sketches estimates within 5% of exact") {
    val dir = sf("lineitem")
    val li = Tables(spark, dir, "lineitem")
    val est = Queries.sketchHllMerge.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("ex"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    exact.foreach { case (g, ex) =>
      assert(math.abs(est(g) - ex) / ex <= 0.05, s"group $g: ${est(g)} vs $ex")
    }
    assert(math.abs(est("__all__") - exactAll) / exactAll <= 0.05,
      s"merged: ${est("__all__")} vs $exactAll")
  }

  test("thetaSetOps: set-algebra estimates within 5% of exact user-set algebra") {
    val dir = sf("events")
    val ev = Tables(spark, dir, "events")
    val r = Queries.sketchTheta.fn(spark, dir).collect().head
    val a = ev.filter(col("event_type") === "click")
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    def ok(est: Double, ex: Int, what: String): Unit =
      assert(ex == 0 || math.abs(est - ex) / ex <= 0.05, s"$what: $est vs $ex")
    ok(r.getAs[Long]("approx_a").toDouble, a.size, "A")
    ok(r.getAs[Long]("approx_b").toDouble, b.size, "B")
    ok(r.getAs[Long]("approx_union").toDouble, (a ++ b).size, "A∪B")
    ok(r.getAs[Long]("approx_intersect").toDouble, (a & b).size, "A∩B")
    ok(r.getAs[Long]("approx_a_minus_b").toDouble, (a -- b).size, "A\\B")
  }

  test("hllSetEstimates: inclusion-exclusion intersection within 10% of exact; direct estimates within 5%") {
    val dir = sf("events")
    val ev = Tables(spark, dir, "events")
    val r = Queries.sketchHllIe.fn(spark, dir).collect().head
    val a = ev.filter(col("event_type") === "click")
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    def ok(est: Double, ex: Int, tol: Double, what: String): Unit =
      assert(ex == 0 || math.abs(est - ex) / ex <= tol, s"$what: $est vs $ex")
    // HLL estimates |A|, |B|, |A∪B| directly (lgK=12 → ~1.6% rsd)
    ok(r.getAs[Long]("approx_a").toDouble, a.size, 0.05, "A")
    ok(r.getAs[Long]("approx_b").toDouble, b.size, 0.05, "B")
    ok(r.getAs[Long]("approx_union").toDouble, (a ++ b).size, 0.05, "A∪B")
    // the intersection inherits all three absolute errors — the IE
    // premium the operator docstring warns about. Here |A∩B| is a
    // large share of |A∪B|, so 10% is a sound ceiling.
    ok(r.getAs[Long]("approx_intersect_ie").toDouble, (a & b).size, 0.10, "A∩B (IE)")
  }

  test("kllQuantiles: merged p50 lands within 3% rank error of the distribution") {
    val dir = sf("lineitem")
    val li = Tables(spark, dir, "lineitem")
    val est = Queries.sketchKllMerge.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap // p50
    // rank of the estimated median must be within 0.5 ± 0.03 (KLL
    // k=200 guarantees ~1.7% two-sided rank error at 99% confidence)
    val n = li.count().toDouble
    val below = li.filter(col("l_extendedprice") <= est("__all__")).count().toDouble
    assert(math.abs(below / n - 0.5) <= 0.03,
      s"merged p50 ${est("__all__")} sits at rank ${below / n}")
  }

  test("topKCombined: combined per-day states reproduce the exact type counts") {
    val dir = sf("events")
    val ev = Tables(spark, dir, "events")
    val est = Queries.sketchTopKMerge.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tracked capacity (64) ≥ distinct types → counts are exact
    exact.toSeq.sortBy(-_._2).take(5).foreach { case (k, v) =>
      assert(est.get(k).contains(v), s"$k: est ${est.get(k)} vs exact $v")
    }
  }

  test("rollingDistinct: per-day HLL merge within 5% of the exact 7-day rolling distinct") {
    val dir = sf("events")
    val ev = Tables(spark, dir, "events").select(
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("d"),
      col("user_id"))
    val approx = graft.operators.Sketches.rollingDistinct(ev, "d", "user_id", width = 7)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exact twin: the q82 linear window-end expansion on the deduped frame
    val du = ev.distinct()
    val days = du.select(col("d").as("wend")).distinct()
    val exact = du.select(explode(sequence(col("d"), col("d") + 6)).as("wend"), col("user_id"))
      .join(days, "wend")
      .groupBy("wend").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet, "same window-end days")
    exact.foreach { case (wend, ex) =>
      assert(math.abs(approx(wend).toDouble - ex) / ex <= 0.05,
        s"window $wend: approx ${approx(wend)} vs exact $ex")
    }
  }

  test("bloom sketch: zero false negatives, FPR ≤ 1%, census consistent") {
    val dir = sf("customer")
    val row = Queries.sketchBloom.fn(spark, dir).collect()(0)
    assert(row.getAs[Long]("n_false_negative") == 0L,
      "bloom filters NEVER drop true members")
    assert(row.getAs[Long]("n_pass") ==
      row.getAs[Long]("n_member") + row.getAs[Long]("n_false_pass"))
    assert(row.getAs[Double]("fpr") <= 0.01,
      s"observed fpr ${row.getAs[Double]("fpr")} above 1% for 2^16 bits / 6 hashes")
  }

  test("bloom sketch bytes are partitioning-independent (OR-merge exactness)") {
    import graft.operators.Sketches
    val dir = sf("customer")
    val cust = Tables(spark, dir, "customer")
    val a = Sketches.bloomFilter(cust, "c_custkey", numBits = 1 << 12, numHashes = 4)
      .collect()(0).getAs[Array[Byte]]("bloom")
    val b = Sketches.bloomFilter(cust.repartition(7), "c_custkey", numBits = 1 << 12, numHashes = 4)
      .collect()(0).getAs[Array[Byte]]("bloom")
    assert(java.util.Arrays.equals(a, b),
      "sketch must be identical under any partitioning (merge = bitwise OR)")
  }

  test("varopt sample: total weight is exact (the VarOpt invariant); subset sums within 25% across a multi-partition merge") {
    import graft.operators.Sketches
    import spark.implicits._
    // 20k items, 4 classes, weights 1..100 — built multi-partition so
    // the union/merge path genuinely runs
    val df = (1L to 20000L).map(i => (i, ((i % 100) + 1).toDouble, s"c${i % 4}"))
      .toDF("it", "w", "cls").repartition(8)
    val out = Sketches.varoptShares(df, "it", "w", "cls", k = 512)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(out.map(_._1).sorted == Seq("c0", "c1", "c2", "c3"))
    val exactTotal = out.map(_._2).sum
    val estTotal = out.map(_._3).sum
    // "exact" up to double accumulation over a nondeterministic merge
    // order + the 2dp readout rounding — 1e-6 still catches any real
    // invariant break (the bug class this pins is O(1) relative error)
    assert(math.abs(estTotal - exactTotal) / exactTotal < 1e-6,
      s"Σ adjusted weights must equal the exact total: $estTotal vs $exactTotal")
    out.foreach { case (cls, ex, est) =>
      assert(math.abs(est - ex) / ex <= 0.25,
        s"class $cls subset-sum estimate $est drifted beyond 25% of $ex")
    }
  }

  test("varopt sample: an item listed under two classes is credited ONCE (canonical class), keeping the total invariant") {
    import graft.operators.Sketches
    import spark.implicits._
    // every item appears under BOTH classes; naive per-class crediting
    // would double the estimated total
    val df = (1L to 5000L).flatMap(i =>
        Seq((i, ((i % 50) + 1).toDouble, "a"), (i, ((i % 50) + 1).toDouble, "b")))
      .toDF("it", "w", "cls").repartition(4)
    val out = Sketches.varoptShares(df, "it", "w", "cls", k = 256)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    val exactTotal = out.map(_._2).sum
    val estTotal = out.map(_._3).sum
    assert(math.abs(estTotal - exactTotal) / exactTotal < 1e-6,
      s"duplicate-class items must not double-count: est $estTotal vs exact $exactTotal")
  }
}
