package graft

import graft.plans.TopKPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPlanSpec extends SparkSpec {

  private lazy val orders = Tables(spark, sf("any"), "orders")

  private def windowForm(k: Int) = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  private def nativeForm(k: Int) =
    TopKPlan.topKPerGroup(orders, Seq("o_orderpriority"),
      struct(col("o_totalprice"), -col("o_orderkey")), k)

  test("native grouped top-k matches the window row_number form for several k") {
    for (k <- Seq(1, 3, 10)) {
      val expected = windowForm(k)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect().map(_.toString).sorted
      val got = nativeForm(k)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect().map(_.toString).sorted
      assert(got.toSeq == expected.toSeq, s"k=$k: ${got.length} vs ${expected.length}")
    }
  }

  test("plan contains GroupedTopKExec and exactly one hash exchange, no sort") {
    val p = nativeForm(3).queryExecution.executedPlan.toString
    assert(p.contains("GroupedTopK"), p)
    // count only the operator's own (ENSURE_REQUIREMENTS) exchange —
    // the cached table's one-time localSpread build also renders one
    assert("ENSURE_REQUIREMENTS".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Sort ["), s"bounded heap must not plan a sort:\n$p")
  }

  test("rows with a null order value are dropped") {
    import spark.implicits._
    val df = Seq((1L, "a", Some(5.0)), (2L, "a", None), (3L, "a", Some(1.0)))
      .toDF("id", "g", "v")
    val got = TopKPlan.topKPerGroup(df, Seq("g"), struct(col("v"), -col("id")), 2)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L), got.toSeq.toString)
  }

  test("groups smaller than k keep all their rows") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "g", "v")
    val got = TopKPlan.topKPerGroup(df, Seq("g"), col("v"), 5)
    assert(got.count() == 2)
  }

  test("opt-in optimizer rule prunes row_number<=k filters through GroupedTopK") {
    // unique total order (price, key) via a derived attribute so the
    // single-sort-key rule shape applies exactly
    def q = {
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("sk"))
      orders
        .withColumn("sk", struct(col("o_totalprice"), col("o_orderkey")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("o_orderkey"), col("o_orderpriority"), col("rn"))
    }
    // default: rule off — plain window plan
    val off = q
    assert(!off.queryExecution.optimizedPlan.toString.contains("GroupedTopK"),
      off.queryExecution.optimizedPlan.toString)
    val baseline = off.collect().map(_.toString).sorted.toSeq
    try {
      spark.conf.set(graft.plans.TopKRewriteRule.ConfKey, "true")
      val on = q
      assert(on.queryExecution.optimizedPlan.toString.contains("GroupedTopK"),
        on.queryExecution.optimizedPlan.toString)
      assert(on.collect().map(_.toString).sorted.toSeq == baseline)
    } finally spark.conf.unset(graft.plans.TopKRewriteRule.ConfKey)
  }

  test("rewrite declines nullable sort keys and global row_number") {
    import spark.implicits._
    try {
      spark.conf.set(graft.plans.TopKRewriteRule.ConfKey, "true")
      // nullable sort key: GroupedTopK would DROP the null row that
      // row_number ranks first (NULLS FIRST asc default) — must not fire
      val df = Seq((1L, "a", Some(5.0)), (2L, "a", None), (3L, "a", Some(1.0)))
        .toDF("id", "g", "v")
      val wNull = Window.partitionBy(col("g")).orderBy(col("v"))
      val qNull = df.withColumn("rn", row_number().over(wNull)).filter(col("rn") <= 2)
      assert(!qNull.queryExecution.optimizedPlan.toString.contains("GroupedTopK"),
        qNull.queryExecution.optimizedPlan.toString)
      // NULLS FIRST: the null row ranks 1, then v=1.0 — the exact rows
      // a GroupedTopK prune would have gotten wrong
      assert(qNull.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
      // global row_number (empty PARTITION BY): ClusteredDistribution(Nil)
      // is unplannable — the rewrite must decline, and the query still run
      val sk = Seq((1L, 3.0), (2L, 1.0), (3L, 2.0)).toDF("id", "v")
        .withColumn("skv", struct(col("v"), col("id")))
      val wGlobal = Window.orderBy(col("skv"))
      val qGlobal = sk.withColumn("rn", row_number().over(wGlobal)).filter(col("rn") <= 2)
      assert(!qGlobal.queryExecution.optimizedPlan.toString.contains("GroupedTopK"),
        qGlobal.queryExecution.optimizedPlan.toString)
      assert(qGlobal.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    } finally spark.conf.unset(graft.plans.TopKRewriteRule.ConfKey)
  }
}
