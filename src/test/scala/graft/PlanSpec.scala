package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-plan shape assertions on the CLUSTER load path (local
  * spread OFF — a child session with the flag cleared, so scans are
  * the plain parquet reads a real cluster would run). These lock in
  * the properties that matter at 100 TB: pushdown reaching the scan,
  * column pruning, dims broadcast, partial aggregation before the
  * shuffle, top-k never globally sorting.
  */
class PlanSpec extends SparkSpec {

  private lazy val cold: SparkSession = {
    val s = spark.newSession()
    s.conf.set(GraftSession.LocalSpreadKey, "false")
    s
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def q(qd: QueryDef): DataFrame = qd.fn(cold, sf("any"))

  test("q2: filters and projection push into the parquet scan") {
    val p = plan(q(Queries.q2Filter))
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p)
    assert(p.contains("GreaterThan"), s"range filter should push down:\n$p")
    // column pruning: the scan reads only the 6 referenced columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"scan should prune unreferenced columns:\n$readSchema")
  }

  test("q1: aggregation is partial (map-side) before the shuffle") {
    val p = plan(q(Queries.q1Agg))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"expected map-side partial aggregation:\n$p")
  }

  test("q3/q5: dimension sides broadcast, never shuffled") {
    assert(plan(q(Queries.q3Join)).contains("BroadcastHashJoin"))
    val p5 = plan(q(Queries.q5Multi))
    assert(p5.contains("BroadcastHashJoin"), p5)
  }

  test("q7: top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan(q(Queries.q7TopK))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q4: semi join stays a join, not a distinct+inner rewrite") {
    val p = plan(q(Queries.q4Semi))
    assert(p.contains("LeftSemi"), p)
  }

  test("cold session reads are plain scans (no load-path exchange)") {
    val p = plan(Tables(cold, sf("any"), "lineitem").select("l_orderkey"))
    assert(!p.contains("Exchange"), s"ungated load path must not repartition:\n$p")
  }

  test("selection: no full-fact sort into O(groups) partitions — refine windows key on (group, bin)") {
    // The full declarative plan (materialize=false — the default
    // eagerly checkpoints the two tiny metadata frames, hiding the
    // counting subtree from this inspection). Every window that
    // orders by the VALUE column must partition by (group, vcol, bin)
    // — a window keyed on the group alone sorts the whole fact into 3
    // tasks.
    val df = graft.operators.Selection.exactQuantilesMulti(
      Tables(cold, sf("lineitem"), "lineitem"), "l_returnflag",
      Seq("l_extendedprice" -> Seq(0.25, 0.5, 0.75), "l_quantity" -> Seq(0.5)),
      materialize = false)
    val p = plan(df)
    val specs = "windowspecdefinition\\(([^)]*)\\)".r.findAllMatchIn(p).map(_.group(1)).toList
    val valueWindows = specs.filter(s => s.contains("v#"))
    assert(valueWindows.nonEmpty, s"expected the refine window:\n$p")
    assert(valueWindows.forall(_.contains("bin#")),
      s"value-ranking windows must be bounded by the bin key:\n$valueWindows")
    assert(p.contains("partial_count"), s"bin counts must partial-aggregate map-side:\n$p")
  }

  test("q43: winsorize thresholds broadcast back onto the fact scan") {
    val p = plan(q(Queries.q43Winsorize))
    // the only presentation sort runs AFTER the group aggregate (O(groups)
    // rows); the clamp itself must be a broadcast join onto the scan
    assert(p.contains("BroadcastHashJoin"),
      s"thresholds must broadcast back onto the fact scan:\n$p")
    assert(p.contains("partial_sum"),
      s"clamped aggregation must partial-aggregate map-side:\n$p")
  }

  test("connectedComponents edges: both directions from one explode, no self-union") {
    import org.apache.spark.sql.functions._
    import cold.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    // inspect the edge-expansion plan shape BEFORE the checkpoint
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val p = plan(edges)
    assert(p.contains("Generate explode") && !p.contains("Union"),
      s"edge doubling must be one Generate pass, not a self-union diamond:\n$p")
    // and the operator's fixpoint is right
    val labels = graft.operators.Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("dynamic partition pruning fires on a partitioned fact joined to a filtered dim") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Tables(cold, sf("orders"), "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(s"$dir/fact")
    import cold.implicits._
    Seq(("F", "final"), ("O", "open"), ("P", "pending")).toDF("status", "label")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val joined = cold.read.parquet(s"$dir/fact")
      .join(cold.read.parquet(s"$dir/dim").filter(col("label") === "open"),
        col("o_orderstatus") === col("status"))
      .select(col("o_orderkey"), col("label"))
    val p = plan(joined).toLowerCase
    assert(p.contains("dynamicpruning"),
      s"selective dim filter should prune fact partitions at runtime:\n$p")
  }

  test("runtime bloom filter from a selective dim prunes the fact side of a shuffle join") {
    import org.apache.spark.sql.functions._
    // A shuffle join (broadcast off) where one side is filtered small:
    // the optimizer should build a bloom filter over the small side's
    // keys and push bloom_filter_might_contain into the fact scan —
    // at 100 TB this skips most of the probe-side shuffle write.
    val s = spark.newSession()
    s.conf.set(GraftSession.LocalSpreadKey, "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val li = Tables(s, sf("lineitem"), "lineitem")
    val o = Tables(s, sf("orders"), "orders").filter(col("o_totalprice") > 400000.0)
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
    val p = joined.queryExecution.optimizedPlan.toString.toLowerCase
    assert(p.contains("bloom_filter_might_contain") || p.contains("bloomfilter"),
      s"selective shuffle-join side should inject a runtime bloom filter:\n$p")
  }

  test("q49: custom AsOfJoinExec plans — two key-hash exchanges, local sorts only") {
    val df = Queries.q49AsOfNative.fn(cold, sf("any"))
    df.write.format("noop").mode("overwrite").save() // AQE-final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec should plan:\n$p")
    // both as-of inputs sort LOCALLY (global=false) — the only global
    // sort allowed is the final presentation ORDER BY event_id
    val localSorts = p.linesIterator.count(l => l.contains("Sort [__") && l.contains("false, 0"))
    assert(localSorts >= 2, s"expected two local (key,time) sorts:\n$p")
  }

  test("q50: sliding windows expand map-side — one data shuffle, no window-table join") {
    val p = plan(q(Queries.q50Sliding))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"window expansion must be map-side (explode), got $shuffles shuffles:\n$p")
    assert(!p.contains("Join"), s"no join against a generated window table:\n$p")
    assert(p.contains("partial_"), s"partial agg before the shuffle:\n$p")
  }

  test("etl_constraints: the four table metrics evaluate in one aggregation pass") {
    val p = plan(Queries.etlConstraints.fn(cold, sf("any")))
    // one scan of orders for the metric block (the referential check
    // legitimately scans orders once more for its broadcast join)
    val ordersScans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("orders"))
    assert(ordersScans <= 2, s"metrics must share one scan:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"referential check must broadcast the dim keys:\n$p")
  }

  test("text_c4: pure map-side — no exchange anywhere before the presentation sort") {
    val p = plan(graft.operators.TextAnalysis.c4Stats(
      Tables(cold, sf("documents"), "documents"), "doc_id", "text"))
    assert(!p.contains("Exchange"), s"C4 stats must be scan-speed map work:\n$p")
  }

  test("sketch rollups: merged __all__ estimate aggregates sketches, not the table") {
    // Two-level API: the caller persists the sketch table; both the
    // per-group readout and the merged row must read THAT frame — the
    // merged estimate comes from sketch state, the data is scanned
    // once at build. (The one-shot hllRollup convenience runs this
    // same shape internally, then releases the cache.)
    val sk = graft.operators.Sketches.hllSketches(
      Tables(cold, sf("lineitem"), "lineitem"), "l_returnflag", "l_partkey").persist()
    try {
      val p = plan(graft.operators.Sketches.hllRollupFrom(sk))
      assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
        s"both rollup branches should read the cached sketch frame:\n$p")
    } finally sk.unpersist(false)
  }

  test("lineDedup: first-occurrence is a partial agg, never a window on the line key") {
    val df = graft.operators.Dedup.lineDedup(
      Tables(cold, sf("documents"), "documents"), "doc_id", "text")
    val p = plan(df)
    assert(!p.contains("Window"),
      s"a window partitioned by the line funnels hot boilerplate into one task:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_"),
      s"first-occurrence winners must map-side partial-aggregate:\n$p")
  }

  test("q74 triangles: ordered edge joins plan as hash joins — no cartesian/BNLJ anywhere") {
    // triangleStats pins its two 1-row frames (localCheckpoint) so the
    // final stitched plan observably reads two ExistingRDDs — the real
    // contracts live on the PRE-checkpoint subplans, asserted here on
    // the exact frames triangleStats builds internally.
    import org.apache.spark.sql.functions.col
    val edges = Tables(cold, sf("any"), "lineitem")
      .select(col("l_partkey").as("p1"), col("l_suppkey").as("p2"))
    val e = graft.operators.Graph.triangleCanonicalEdges(edges, "p1", "p2")

    val pw = plan(graft.operators.Graph.triangleWedgeAgg(e))
    assert(pw.contains("partial_count") || pw.contains("partial_sum"),
      s"degree/wedge counts must partial-aggregate map-side:\n$pw")
    assert(!pw.contains("CartesianProduct") && !pw.contains("BroadcastNestedLoopJoin"),
      s"the wedge aggregation has no join at all:\n$pw")

    val pt = plan(graft.operators.Graph.triangleJoinAgg(e))
    assert(!pt.contains("CartesianProduct") && !pt.contains("BroadcastNestedLoopJoin"),
      s"edge⋈edge joins must be equi-joins (hash/sort-merge):\n$pt")
    assert(pt.contains("partial_count"),
      s"triangle count must partial-aggregate before the final shuffle:\n$pt")

    // Final stitch: two pinned 1-row frames crossed — a broadcast
    // nested-loop Cross of 1×1 rows is the intended O(1) shape; a
    // CartesianProduct (shuffle cross) is still forbidden.
    val p = plan(q(Queries.q74Triangles))
    assert(!p.contains("CartesianProduct"),
      s"triangle counting must never plan a shuffle cartesian:\n$p")
  }

  test("text_oov: occurrences collapse BEFORE the vocab join, vocab side broadcasts") {
    val p = plan(q(Queries.textOov))
    assert(p.contains("BroadcastHashJoin"),
      s"the top-K vocab is tiny and must broadcast:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"(source, token) counts must partial-aggregate before any join:\n$p")
  }

  test("q81 trimmed mean: selection thresholds broadcast back onto the fact scan") {
    val p = plan(q(Queries.q81TrimmedMean))
    assert(p.contains("BroadcastHashJoin"),
      s"the O(groups) cut frame must broadcast, not shuffle the fact table:\n$p")
  }

  test("q86: the lineitem-only disjunction pushes into the parquet scan as an Or filter") {
    val p = plan(q(Queries.q86Disjunctive))
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("Or("),
      s"the (qty OR discount) branch must reach the scan:\n$pushed")
    assert(p.contains("BroadcastHashJoin"), s"part side must broadcast:\n$p")
  }

  test("decontaminate: eval gram side broadcasts into the semi join") {
    val docs = Tables(cold, sf("documents"), "documents")
    val df = graft.operators.Curation.contaminatedIds(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 0),
      "doc_id", "text", n = 4)
    df.write.format("noop").mode("overwrite").save() // AQE-final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"small eval side should broadcast into the semi join:\n$p")
  }

  test("q136 AUC: the rank window runs over the COLLAPSED score domain, not the fact") {
    // the unpartitioned cumsum window is legal only because its input
    // is the post-aggregation distinct-score frame — an aggregate must
    // sit between the window and every scan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec        => nodes(s.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val df = q(Queries.q136Auc)
    df.write.format("noop").mode("overwrite").save() // AQE-final plan
    val all = nodes(df.queryExecution.executedPlan)
    val windows = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, "expected the offset cumsum window")
    windows.foreach { w =>
      val aggBelow = nodes(w.child).collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
      assert(aggBelow.nonEmpty,
        s"window must consume the collapsed aggregate frame:\n${w.treeString}")
    }
  }

  test("etl_linkage: block-size guard is a partial agg + semi join, never a window") {
    val p = plan(q(Queries.etlLinkage))
    assert(!p.contains("WindowExec") && !p.contains("RunningWindow"),
      s"a count window over the block key would funnel the hot block:\n$p")
    assert(p.contains("LeftSemi"),
      s"expected the ok-blocks semi join:\n$p")
  }

  test("q139 target encode: the category frame broadcasts back onto the fact") {
    val p = plan(q(Queries.q139TargetEncode))
    assert(p.contains("BroadcastHashJoin"),
      s"the O(categories) group frame must broadcast, not shuffle the fact:\n$p")
  }
}
