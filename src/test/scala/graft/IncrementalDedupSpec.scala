package graft

import graft.sources.Snapshot
import graft.streaming.IncrementalDedup
import java.nio.file.Files

/** Dedup on arrival: the incremental MinHash-LSH pipeline that probes a
  * versioned signature store per batch instead of re-deduping the
  * corpus (IncrementalDedup.scala).
  */
class IncrementalDedupSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft-incdedup").toString

  private val base =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar"
  /** Same 15-word doc with only the LAST word changed: 12 of 13
    * 3-shingles shared, exact Jaccard 12/14 ≈ 0.857 ≥ the 0.8 gate.
    */
  private def nearDup(tail: String) =
    base.split(" ").init.mkString(" ") + " " + tail
  private def distinctDoc(seed: Int) =
    (0 until 15).map(i => s"w${seed}_$i").mkString(" ")

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def corpusIds(dir: String): Set[Long] =
    Snapshot.read(spark, dir).select("doc_id").collect().map(_.getLong(0)).toSet

  test("dedup on arrival: novel docs admit, cross-batch near/exact dups reject against the store, intra-batch dups collapse") {
    val root = tmp()
    val corpus = s"$root/corpus"; val sigs = s"$root/sigs"

    // batch 0: four distinct docs — all admit, store seeds
    val n0 = IncrementalDedup.applyBatch(
      docs(1L -> base, 2L -> distinctDoc(2), 3L -> distinctDoc(3), 4L -> distinctDoc(4)),
      0L, corpus, sigs, "doc_id", "text")
    assert(n0 == 4L)
    assert(corpusIds(corpus) == Set(1L, 2L, 3L, 4L))
    assert(Snapshot.read(spark, sigs).count() == 4L * 16)

    // batch 1: a near-dup of doc 1, an EXACT copy of doc 2, one novel doc
    val n1 = IncrementalDedup.applyBatch(
      docs(5L -> nearDup("zulu"), 6L -> distinctDoc(2), 7L -> distinctDoc(7)),
      1L, corpus, sigs, "doc_id", "text")
    assert(n1 == 1L, "only the novel doc must admit")
    assert(corpusIds(corpus) == Set(1L, 2L, 3L, 4L, 7L))
    assert(Snapshot.read(spark, sigs).count() == 5L * 16)

    // batch 2: two docs that near-dup EACH OTHER (both novel vs corpus):
    // first occurrence by id wins, the second rejects intra-batch
    val fresh = "papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu one two three four"
    val freshDup = fresh.split(" ").init.mkString(" ") + " five"
    val n2 = IncrementalDedup.applyBatch(
      docs(8L -> fresh, 9L -> freshDup), 2L, corpus, sigs, "doc_id", "text")
    assert(n2 == 1L)
    assert(corpusIds(corpus) == Set(1L, 2L, 3L, 4L, 7L, 8L))

    // work per batch is store-PROBE-shaped: the store scan is
    // pre-filtered on the batch's sig values (stats/bloom-prunable),
    // never an unconditional full-history scan — and the store itself
    // is a normal snapshot table the maintenance loop can cluster
    assert(Snapshot.history(spark, sigs).count() == 3L)
  }

  test("exactly-once: full replays are no-ops; a crash between the corpus and signature appends recovers the store from the corpus version") {
    val root = tmp()
    val corpus = s"$root/corpus"; val sigs = s"$root/sigs"
    IncrementalDedup.applyBatch(docs(1L -> base, 2L -> distinctDoc(2)),
      0L, corpus, sigs, "doc_id", "text")
    val corpusV = Snapshot.latestVersion(spark, corpus).get
    val sigRows = Snapshot.read(spark, sigs).count()

    // FULL replay of batch 0: nothing moves anywhere
    val r = IncrementalDedup.applyBatch(docs(1L -> base, 2L -> distinctDoc(2)),
      0L, corpus, sigs, "doc_id", "text")
    assert(r == 0L)
    assert(Snapshot.latestVersion(spark, corpus).get == corpusV)
    assert(Snapshot.read(spark, sigs).count() == sigRows)

    // CRASH BETWEEN THE APPENDS: corpus committed batch 1, store did not
    // (simulated by appending the corpus half directly under the same
    // writer identity the pipeline uses)
    Snapshot.append(spark, corpus, docs(10L -> distinctDoc(10)),
      Some(1L), Some("default"))
    // the replayed batch takes the recovery path: store catches up from
    // the corpus version's added files, corpus is untouched, no probe
    // runs (probing now would reject the batch against itself)
    val rec = IncrementalDedup.applyBatch(docs(10L -> distinctDoc(10)),
      1L, corpus, sigs, "doc_id", "text")
    assert(rec == 0L)
    assert(corpusIds(corpus) == Set(1L, 2L, 10L))
    assert(Snapshot.read(spark, sigs).count() == sigRows + 16)
    // the recovered signatures are LIVE: a later near-dup of doc 10 rejects
    val n2 = IncrementalDedup.applyBatch(
      docs(11L -> (distinctDoc(10).split(" ").init.mkString(" ") + " tail")),
      2L, corpus, sigs, "doc_id", "text")
    assert(n2 == 0L)
    assert(corpusIds(corpus) == Set(1L, 2L, 10L))
  }

  test("maintenance loop: optimize(clusterBy = sig) makes the store probe's In-prune skip most files") {
    import spark.implicits._
    import graft.sources.Snapshot
    val root = tmp()
    val corpus = s"$root/corpus"; val sigs = s"$root/sigs"
    // ten arrival waves of distinct docs → a ten-file unclustered store
    (0 until 10).foreach { w =>
      val batch = (0 until 40)
        .map(i => ((w * 100 + i).toLong, distinctDoc(w * 100 + i)))
      IncrementalDedup.applyBatch(docs(batch: _*), w.toLong,
        corpus, sigs, "doc_id", "text")
    }
    val v = Snapshot.latestVersion(spark, sigs).get
    val all = Snapshot.filesForTest(spark, sigs, v).size
    assert(all >= 10)
    // a small probe (one future batch's sig values): before clustering,
    // every file spans the whole uniform sig domain → nothing prunes
    val probeSigs = graft.operators.Dedup.bandedSignatures(
      docs(9999L -> distinctDoc(50)), "doc_id", "text")
      .select("sig").collect().map(_.getLong(0))
    def pruned(ver: Long): Int = Snapshot.candidateFilePaths(spark, sigs, ver,
      org.apache.spark.sql.functions.col("sig")
        .isin(probeSigs.toIndexedSeq: _*)).size
    val beforeTouched = pruned(v)
    // the probe doc is NOVEL, so per-file sig blooms alone must prune
    // (most of) the unclustered store — this is the InSet pruning path
    // (isin past 10 values rewrites to InSet)
    assert(beforeTouched < all,
      s"blooms must prune a novel probe: touched $beforeTouched of $all")
    // the maintenance loop: one sig-clustered rewrite (tiny targetBytes
    // so the toy store still yields several range-disjoint files)
    Snapshot.optimize(spark, sigs, targetBytes = 16L * 1024,
      smallBytes = Long.MaxValue, clusterBy = Seq("sig"))
    val v2 = Snapshot.latestVersion(spark, sigs).get
    val total2 = Snapshot.filesForTest(spark, sigs, v2).size
    val afterTouched = pruned(v2)
    info(s"probe touches $beforeTouched/$all files unclustered, " +
      s"$afterTouched/$total2 after optimize(clusterBy = sig)")
    assert(afterTouched < total2,
      "a sig-clustered store must prune non-candidate files for a point probe")
    assert(afterTouched <= beforeTouched)
    // the clustered store still finds real dups: a near-dup of ADMITTED
    // doc 120 rejects, while the genuinely novel doc admits
    val n = IncrementalDedup.applyBatch(
      docs(9999L -> (distinctDoc(120).split(" ").init.mkString(" ") + " tail"),
        9998L -> distinctDoc(5000)),
      10L, corpus, sigs, "doc_id", "text")
    assert(n == 1L, "clustering must not lose any signature")
  }

  test("streaming form: dedupOnArrival admits across micro-batches and restarts exactly-once") {
    import spark.implicits._
    val root = tmp()
    val corpus = s"$root/corpus"; val sigs = s"$root/sigs"
    val src = s"$root/src"; val ck = s"$root/ck"
    Seq((1L, base), (2L, distinctDoc(2))).toDF("doc_id", "text")
      .write.parquet(s"$src/b1")
    val schema = spark.read.parquet(s"$src/b1").schema
    def run(): Unit = {
      val q = IncrementalDedup.dedupOnArrival(
        spark.readStream.schema(schema).parquet(s"$src/*"),
        corpus, sigs, "doc_id", "text", ck)
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(corpusIds(corpus) == Set(1L, 2L))
    // restart with a near-dup of doc 1 and a novel doc
    Seq((3L, nearDup("zulu")), (4L, distinctDoc(4))).toDF("doc_id", "text")
      .write.parquet(s"$src/b2")
    run()
    assert(corpusIds(corpus) == Set(1L, 2L, 4L))
    // idle restart: no new versions on either table
    val cv = Snapshot.latestVersion(spark, corpus).get
    val sv = Snapshot.latestVersion(spark, sigs).get
    run()
    assert(Snapshot.latestVersion(spark, corpus).get == cv)
    assert(Snapshot.latestVersion(spark, sigs).get == sv)
  }
}
