package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  private lazy val (big, small) = {
    import spark.implicits._
    // one pathologically hot key (90% of rows) + a long tail
    val bigDf = ((1 to 900).map(i => (7L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 5, 1000L + i)))
      .toDF("k", "row_id")
    val smallDf = (0L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    (bigDf, smallDf)
  }

  test("salted join returns exactly the rows of the plain join") {
    val plain = big.join(small, Seq("k"))
      .select("k", "row_id", "name").collect().map(_.toSeq).toSet
    val salted = SkewJoin.salted(big, small, Seq("k"), col("row_id"), salts = 8)
      .select("k", "row_id", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("left join keeps unmatched big-side rows exactly once") {
    import spark.implicits._
    val b = Seq((1L, 10L), (99L, 11L)).toDF("k", "row_id") // 99 unmatched
    val out = SkewJoin.salted(b, small, Seq("k"), col("row_id"), salts = 4, joinType = "left")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Any]("name")))
    assert(out.length == 2)
    assert(out.toMap.apply(99L) == null)
  }

  test("the hot key's rows actually spread across salts") {
    import spark.implicits._
    val b = big.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8L)).cast("int"))
    val hotSalts = b.filter(col("k") === 7L)
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(hotSalts == 8L, s"hot key should hit all 8 salts, hit $hotSalts")
  }

  test("right/full join types are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.salted(big, small, Seq("k"), col("row_id"), 4, "full_outer")
    }
  }

  test("AQE skew-join splitting and explicit salting don't fight: identical rows both modes") {
    // The r8 verdict's open 100 TB operational question: salting is
    // deliberately AQE-independent, but on a real cluster AQE's own
    // skew splitter WILL also see the salted shuffle. Run the salted
    // join under a child session with AQE skew handling forced
    // aggressive (tiny thresholds, broadcast off so the join actually
    // shuffles — the only path AQE's splitter touches) and with it
    // disabled: AQE may only re-slice partitions, never change rows.
    def run(aqeSkew: Boolean): (Set[Seq[Any]], String) = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.adaptive.enabled", "true")
      s2.conf.set("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
      s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import s2.implicits._
      val bigDf = ((1 to 900).map(i => (7L, i.toLong)) ++
        (1 to 100).map(i => (i.toLong % 5, 1000L + i))).toDF("k", "row_id")
      val smallDf = (0L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
      val joined = SkewJoin.salted(bigDf, smallDf, Seq("k"), col("row_id"), salts = 8)
        .select("k", "row_id", "name")
      val rows = joined.collect().map(_.toSeq).toSet
      (rows, joined.queryExecution.executedPlan.toString)
    }
    val (on, planOn) = run(aqeSkew = true)
    val (off, _) = run(aqeSkew = false)
    // broadcast disabled → the salted join really took the shuffle-join
    // path AQE's skew splitter operates on
    assert(planOn.contains("SortMergeJoin") || planOn.contains("ShuffledHashJoin"),
      s"expected a shuffle join under the AQE-on run:\n$planOn")
    assert(on == off, "AQE skew splitting changed the salted join's rows")
    assert(on.size == 1000)
  }
}
