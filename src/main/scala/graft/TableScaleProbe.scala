package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-off SCALE PROBES for the table-format family, whose costs are
  * O(files) / O(commits) / O(epochs) rather than O(rows) — the axis the
  * sf1 analytics spot-bench (round 13) deliberately did not cover:
  *
  *   A. FILE-COUNT scaling: the same rows laid out as N vs 10N files;
  *      measures append / CoW upsert / MoR update / CDF endpoint diff /
  *      aggregate read as manifest entries grow 10× with data constant.
  *   B. COMMIT-COUNT scaling: a branch carrying N vs 10N commits;
  *      measures per-commit latency early-vs-late in the chain (the
  *      delta-log + periodic-checkpoint design should keep it flat) and
  *      the rename-free fastForward publish.
  *   C. EPOCH scaling: a ~500-epoch `writeStream.toTable` run; measures
  *      sink epoch latency early-vs-late (exactly-once cursor + delta
  *      commits should keep it flat as versions accumulate).
  *
  * Emits one [probe] line per measurement and a final JSON line; run:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.TableScaleProbe /root/testdata/sf0.1"`.
  * Results are adjudicated in PLANS_r14.md, not tracked by Bench.
  */
object TableScaleProbe {

  private def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config(GraftSession.LocalSpreadKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Snapshot
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft-probe").toString
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      results(label) = s
      System.err.println(s"[probe] $label: ${fmt(s)}s")
      r
    }

    val orders = Tables(spark, src, "orders").select(
      col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice").cast(DecimalType(12, 2)).as("price"))
    orders.count() // spread once; never inside a measurement

    // ── A. file-count scaling: same rows, 10× the files ──
    Seq(2000, 20000).foreach { nf =>
      val tbl = s"$root/files_$nf"
      timed(s"A.commit_${nf}f")(
        Snapshot.commit(spark, tbl, orders.repartition(nf)))
      timed(s"A.append_${nf}f")(
        Snapshot.append(spark, tbl, orders.limit(1000).coalesce(1)))
      timed(s"A.mor_update_${nf}f")(
        Snapshot.updateWhereMor(spark, tbl,
          pmod(col("o_orderkey"), lit(997)) === 0,
          Map("o_orderstatus" -> lit("U"))))
      timed(s"A.cow_upsert_${nf}f")(
        Snapshot.upsert(spark, tbl,
          orders.filter(pmod(col("o_orderkey"), lit(1999)) === 0)
            .withColumn("price",
              (col("price") + lit(1)).cast(DecimalType(12, 2))),
          Seq("o_orderkey")))
      val vs = Snapshot.versions(spark, tbl)
      timed(s"A.cdf_${nf}f") {
        Snapshot.changes(spark, tbl, vs.head, vs.last, Seq("o_orderkey"))
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"A.read_agg_${nf}f") {
        Snapshot.read(spark, tbl).groupBy(col("o_orderstatus")).count()
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ── B. commit-count scaling + rename-free fastForward ──
    Seq(100, 1000).foreach { nc =>
      val tbl = s"$root/commits_$nc"
      Snapshot.commit(spark, tbl, orders.limit(100).coalesce(1))
      Snapshot.createBranch(spark, tbl, "load")
      val bdir = Snapshot.branchDir(tbl, "load")
      val batch = orders.limit(2).coalesce(1).collect()
      val batchDf = spark.createDataFrame(
        spark.sparkContext.parallelize(batch.toIndexedSeq, 1),
        orders.schema)
      var early = 0.0; var late = 0.0
      timed(s"B.${nc}_branch_commits") {
        (1 to nc).foreach { i =>
          val t0 = System.nanoTime()
          Snapshot.append(spark, bdir, batchDf)
          val s = (System.nanoTime() - t0) / 1e9
          if (i <= nc / 10) early += s
          if (i > nc - nc / 10) late += s
        }
      }
      results(s"B.commit_early_avg_$nc") = early / (nc / 10)
      results(s"B.commit_late_avg_$nc") = late / (nc / 10)
      System.err.println(s"[probe] B.$nc commit latency early=${fmt(early / (nc / 10))}s " +
        s"late=${fmt(late / (nc / 10))}s")
      timed(s"B.fastforward_${nc}c")(Snapshot.fastForward(spark, tbl, "load"))
      timed(s"B.read_after_ff_${nc}c") {
        Snapshot.read(spark, tbl).agg(count(lit(1))).collect()
      }
    }

    // ── C. 500-epoch identifier-based streaming sink ──
    {
      val wh = s"$root/wh"
      spark.conf.set("spark.sql.catalog.gprobe", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.gprobe.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gprobe.db")
      spark.sql("CREATE TABLE gprobe.db.sink (id BIGINT, v DOUBLE)")
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)](spark)
      val q = ms.toDF().toDF("id", "v").writeStream
        .option("checkpointLocation", s"$root/ck")
        .toTable("gprobe.db.sink")
      val epochs = 500
      var early = 0.0; var late = 0.0
      timed(s"C.${epochs}_epochs") {
        (1 to epochs).foreach { i =>
          val t0 = System.nanoTime()
          ms.addData((i.toLong, i.toDouble))
          q.processAllAvailable()
          val s = (System.nanoTime() - t0) / 1e9
          if (i <= epochs / 10) early += s
          if (i > epochs - epochs / 10) late += s
        }
      }
      q.stop()
      results(s"C.epoch_early_avg") = early / (epochs / 10)
      results(s"C.epoch_late_avg") = late / (epochs / 10)
      System.err.println(s"[probe] C epoch latency early=${fmt(early / (epochs / 10))}s " +
        s"late=${fmt(late / (epochs / 10))}s")
      val dir = s"$wh/db/sink"
      timed("C.read_after_500_epochs") {
        Snapshot.read(spark, dir).agg(count(lit(1))).collect()
      }
      results("C.rows") = Snapshot.read(spark, dir).count().toDouble
    }

    val json = results.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString(",")
    println(s"""{"metric":"table_scale_probe","probes":{$json}}""")
    // the probe's tables are throwaway
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(rm))
      p.delete(); ()
    }
    rm(new java.io.File(root))
    spark.stop()
  }
}
