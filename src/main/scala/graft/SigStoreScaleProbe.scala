package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** InSet/bloom pruned-file-fraction probe at a MULTI-MILLION-row
  * signature store (r14 verdict item 7 / handoff item 3): the
  * IncrementalDedup store-probe pruning path is spec-proven at 40
  * files; this measures it at scale and proves
  * `optimize(clusterBy = sig)` as the maintenance loop.
  *
  * Build: 4M (id, band, sig) rows — 250k docs × 16 bands, sig =
  * xxhash64 uniform — appended as 20 arrival waves into a
  * stats+bloom-carrying snapshot store (the exact IncrementalDedup
  * store spec). Probe: a novel 16-signature batch (the InSet path —
  * isin past 10 values rewrites to InSet), measured as candidate
  * files touched and wall time of the probe join, before and after
  * one sig-clustered optimize.
  *
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.SigStoreScaleProbe"`.
  * Diagnostics only; results adjudicated in OPTIMIZATION_r15.md.
  */
object SigStoreScaleProbe {
  private def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Snapshot

    val root = java.nio.file.Files.createTempDirectory("graft-sigscale").toString
    val sigs = s"$root/sigs"
    val docsPerWave = 12500L
    val waves = 20
    val bands = 16
    def waveSigs(w: Int) = spark.range(w * docsPerWave, (w + 1) * docsPerWave)
      .select(col("id"))
      .crossJoin(spark.range(bands).select(col("id").cast("int").as("band")))
      .withColumn("sig", xxhash64(col("id"), col("band"), lit("probe-v1")))

    val t0 = System.nanoTime()
    (0 until waves).foreach { w =>
      val df = waveSigs(w)
      if (w == 0)
        Snapshot.commit(spark, sigs, df, Some(w.toLong), Some("sigscale"),
          spec = Some(Snapshot.TableSpec(statsCols = Seq("sig"), bloomCols = Seq("sig"))))
      else Snapshot.append(spark, sigs, df, Some(w.toLong), Some("sigscale"))
    }
    println(f"[probe] build ${waves}x$docsPerWave docs x $bands bands: ${(System.nanoTime() - t0) / 1e9}%.1fs")

    val v = Snapshot.latestVersion(spark, sigs).get
    val total = Snapshot.filesForTest(spark, sigs, v).size
    val rows = Snapshot.read(spark, sigs).count()
    println(s"[probe] store: $rows rows in $total files")

    // novel probe batch: one unseen doc's 16 band signatures
    val probeVals = spark.range(10000000L, 10000001L)
      .crossJoin(spark.range(bands).select(col("id").cast("int").as("band")))
      .withColumn("sig", xxhash64(col("id"), col("band"), lit("probe-v1")))
      .select("sig").collect().map(_.getLong(0))

    def touched(ver: Long): Int = Snapshot.candidateFilePaths(spark, sigs, ver,
      col("sig").isin(probeVals.toIndexedSeq: _*)).size
    def probeWall(): Double = {
      val t = System.nanoTime()
      Snapshot.read(spark, sigs).filter(col("sig").isin(probeVals.toIndexedSeq: _*))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }

    val beforeTouched = touched(v)
    val beforeWall = probeWall()
    println(f"[probe] unclustered: probe touches $beforeTouched/$total files, scan ${fmt(beforeWall)}s")

    // second probe: EXISTING signatures (a re-arriving doc from wave 7)
    // — the hit path that must still find its matches
    val hitVals = spark.range(7 * docsPerWave + 3, 7 * docsPerWave + 4)
      .crossJoin(spark.range(bands).select(col("id").cast("int").as("band")))
      .withColumn("sig", xxhash64(col("id"), col("band"), lit("probe-v1")))
      .select("sig").collect().map(_.getLong(0))
    def touchedHit(ver: Long): Int = Snapshot.candidateFilePaths(spark, sigs, ver,
      col("sig").isin(hitVals.toIndexedSeq: _*)).size
    val beforeHit = touchedHit(v)
    println(s"[probe] unclustered: existing-sig probe touches $beforeHit/$total files")

    val tOpt = System.nanoTime()
    // small targetBytes keeps the clustered store multi-file so the
    // pruned FRACTION is observable (one 128MB file would prune 0/1);
    // smallBytes=MaxValue makes every input file rewrite-eligible
    Snapshot.optimize(spark, sigs, targetBytes = 2L * 1024 * 1024,
      smallBytes = Long.MaxValue, clusterBy = Seq("sig"))
    val optWall = (System.nanoTime() - tOpt) / 1e9
    val v2 = Snapshot.latestVersion(spark, sigs).get
    val total2 = Snapshot.filesForTest(spark, sigs, v2).size
    val afterTouched = touched(v2)
    val afterWall = probeWall()
    val afterHit = touchedHit(v2)
    println(f"[probe] optimize(clusterBy=sig): ${fmt(optWall)}s -> $total2 files")
    println(f"[probe] clustered: probe touches $afterTouched/$total2 files, scan ${fmt(afterWall)}s")
    println(s"[probe] clustered: existing-sig probe touches $afterHit/$total2 files")
    println(s"""{"probe":"sig_store_scale","rows":$rows,"files_before":$total,""" +
      s""""touched_before":$beforeTouched,"hit_touched_before":$beforeHit,""" +
      s""""scan_before_s":${fmt(beforeWall)},""" +
      s""""optimize_s":${fmt(optWall)},"files_after":$total2,""" +
      s""""touched_after":$afterTouched,"hit_touched_after":$afterHit,""" +
      s""""scan_after_s":${fmt(afterWall)}}""")
    // leave /tmp as found
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles()).toSeq.flatten.foreach(rm)
      p.delete(); ()
    }
    rm(new java.io.File(root))
    spark.stop()
  }
}
