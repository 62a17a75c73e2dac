package graft.streaming

import graft.operators.Dedup
import graft.sources.Snapshot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DoubleType

/** INCREMENTAL near-dup dedup over the snapshot stream — "dedup on
  * arrival", the shape a 100 TB ingest actually runs: instead of
  * re-deduping the whole corpus per batch (O(corpus) every arrival),
  * the pipeline maintains a VERSIONED SIGNATURE STORE (a snapshot
  * table of banded MinHash signatures, 16 rows of (id, band, sig) per
  * admitted document) and each arriving batch LSH-PROBES the store:
  *
  *   1. intra-batch: new-vs-new near-dups collapse first (verified
  *      MinHash pairs, first-occurrence-by-id wins);
  *   2. cross-batch: the batch's band signatures probe the store —
  *      the store scan is pre-filtered with the batch's sig values
  *      (64-bit uniform keys), so a store carrying per-file stats or
  *      blooms on `sig` prunes to the candidate files instead of
  *      scanning history (run `optimize(clusterBy = sig)` as the
  *      maintenance loop to keep files sig-disjoint);
  *   3. candidates verify with EXACT n-gram Jaccard against only the
  *      matched historical docs' text (pulled from the corpus table
  *      by id — bounded by candidates, never O(corpus));
  *   4. survivors append to the corpus table AND their signatures to
  *      the store, both under the SAME per-writer exactly-once cursor
  *      (batchId, app).
  *
  * Crash consistency across the two appends: the corpus commit is the
  * decision record. A replay where BOTH tables cover the batch is a
  * no-op; a crash BETWEEN the appends (corpus yes, store no) recovers
  * by re-deriving the admitted rows from the corpus version that
  * carries this (app, batchId) — its added files, read directly — and
  * appending exactly their signatures, never re-running the probe
  * (probing after the corpus append would reject the batch against
  * itself). Work per batch: O(batch × bands) signature rows, one
  * pruned store probe, one candidate-bounded verify join.
  */
object IncrementalDedup {

  /** One arriving batch, batch-API form (the foreachBatch body).
    * `batch` must carry `id` (unique, monotone-ish across batches) and
    * `text`. Returns the number of rows admitted (0 on replay).
    */
  def applyBatch(batch: DataFrame, batchId: Long, corpusDir: String,
      sigDir: String, id: String, text: String,
      minJaccard: Double = 0.8, numPerm: Int = 64, bands: Int = 16,
      n: Int = 3, sigProbeCap: Int = 8192): Long = {
    val spark = batch.sparkSession
    val app = Refresh.txnIdentity(spark)
    val corpusDone = Snapshot.txnCursor(spark, corpusDir, app).exists(_ >= batchId)
    val sigDone = Snapshot.txnCursor(spark, sigDir, app).exists(_ >= batchId)
    if (corpusDone && sigDone) return 0L // full replay
    if (corpusDone && !sigDone) { // crash between the two appends
      recoverSignatures(spark, corpusDir, sigDir, batchId, app,
        id, text, numPerm, bands, n)
      return 0L
    }
    if (batch.isEmpty) return 0L

    // ── 1. intra-batch collapse: first occurrence (min id) wins ──
    // ONE tokenize→shingle→minhash pass yields both the verified pairs
    // and the batch's banded signatures (composing minhashVerifiedPairs
    // + bandedSignatures re-ran the signature pipeline per consumer)
    val (pairs, banded) = Dedup.minhashPairsAndBandedSigs(batch, id, text,
      minJaccard, numPerm, bands, n)
    // id_a < id_b by construction: every id that loses to an earlier id
    val intraLosers = pairs.select(col("id_b").as("lid")).distinct()
    val survivors = batch.join(intraLosers,
      batch(id) === intraLosers("lid"), "left_anti")

    // ── 2. cross-batch probe of the signature store ──
    // survivors' signatures = the batch's banded frame minus the
    // intra-batch losers (identical rows to re-signing the survivors)
    val newSigs = banded.join(intraLosers,
        banded("id") === intraLosers("lid"), "left_anti")
      .persist()
    try {
      val rejected: DataFrame =
        if (Snapshot.latestVersion(spark, sigDir).isEmpty) {
          spark.range(0).select(col("id").as("rid"))
        } else {
          // prune the store scan with the batch's sig values — uniform
          // 64-bit keys, so per-file stats/blooms on `sig` cut the scan
          // to candidate files. The In-list prune is O(values × files)
          // driver-side bloom checks, so past the cap fall back to the
          // full join — for a BIG batch the store-scan cost amortizes
          // over the batch anyway; the prune exists for the common
          // small-arrival case
          val sigValues = newSigs.select("sig").distinct()
            .limit(sigProbeCap + 1).collect().map(_.getLong(0))
          val store0 = Snapshot.read(spark, sigDir)
          val store =
            if (sigValues.length <= sigProbeCap)
              store0.filter(col("sig").isin(sigValues.toIndexedSeq: _*))
            else store0
          val cands = store
            .select(col("id").as("old_id"), col("band"), col("sig"))
            .join(newSigs.select(col("id").as("new_id"), col("band"), col("sig")),
              Seq("band", "sig"))
            .select("new_id", "old_id").distinct()
          // exact verification against ONLY the matched docs' text
          val oldDocs = Snapshot.read(spark, corpusDir)
            .select(col(id).as("old_id"), col(text).as("old_text"))
            .join(cands.select("old_id").distinct(), Seq("old_id"), "left_semi")
          val newDocs = survivors.select(col(id).as("new_id"), col(text).as("new_text"))
            .join(cands.select("new_id").distinct(), Seq("new_id"), "left_semi")
          val toksOld = graft.operators.TextAnalysis.tokens(col("old_text"))
          val toksNew = graft.operators.TextAnalysis.tokens(col("new_text"))
          cands.join(oldDocs, Seq("old_id")).join(newDocs, Seq("new_id"))
            .withColumn("ga", Dedup.shingles(toksNew, n))
            .withColumn("gb", Dedup.shingles(toksOld, n))
            .withColumn("j",
              size(array_intersect(col("ga"), col("gb"))).cast(DoubleType) /
                size(array_union(col("ga"), col("gb"))).cast(DoubleType))
            .filter(col("j") >= minJaccard)
            .select(col("new_id").as("rid")).distinct()
        }
      val admitted = survivors.join(rejected,
        survivors(id) === rejected("rid"), "left_anti").persist()
      try {
        // ── 3. publish: corpus first (the decision record), then sigs ──
        // The write path counts rows for its manifest metrics, so the
        // admitted census comes from commitCounted/appendCounted — a
        // separate count() action per wave was pure overhead. The
        // corpus spec pins stats to the id column: the default spec
        // would min/max-aggregate the TEXT column per file, whose
        // encoded stats are then dropped anyway (> MaxStatsStringLen)
        // — all cost, no pruning.
        val nAdmitted =
          if (Snapshot.latestVersion(spark, corpusDir).isEmpty)
            Snapshot.commitCounted(spark, corpusDir, admitted, Some(batchId), Some(app),
              spec = Some(Snapshot.TableSpec(statsCols = Seq(id))))._2
          else
            Snapshot.appendCounted(spark, corpusDir, admitted, Some(batchId), Some(app))._2
        val admittedSigs = newSigs.join(
          admitted.select(col(id).as("aid")),
          newSigs("id") === col("aid"), "left_semi")
        if (Snapshot.latestVersion(spark, sigDir).isEmpty)
          Snapshot.commit(spark, sigDir, admittedSigs, Some(batchId), Some(app),
            spec = Some(Snapshot.TableSpec(statsCols = Seq("sig"),
              bloomCols = Seq("sig"))))
        else
          Snapshot.append(spark, sigDir, admittedSigs, Some(batchId), Some(app))
        nAdmitted
      } finally { admitted.unpersist(); () }
    } finally { newSigs.unpersist(); () }
  }

  /** Recovery half of the exactly-once contract: the corpus append for
    * (app, batchId) committed but the signature append did not (crash
    * between the two). Re-derive the admitted rows from that corpus
    * version's ADDED FILES — read directly, O(batch) — and publish
    * exactly their signatures. Never re-probes (the corpus already
    * contains the batch; a probe would reject it against itself).
    */
  private def recoverSignatures(spark: SparkSession, corpusDir: String,
      sigDir: String, batchId: Long, app: String, id: String, text: String,
      numPerm: Int, bands: Int, n: Int): Unit = {
    val hist = Snapshot.history(spark, corpusDir)
      .select(col("version"), col("batch_id")).collect()
    val v = hist.collect {
      case r if !r.isNullAt(1) && r.getLong(1) == batchId => r.getLong(0)
    }.sorted.lastOption.getOrElse(throw new IllegalStateException(
      s"recovery: corpus cursor covers batch $batchId but no version carries it"))
    val prevFiles = Snapshot.filesForTest(spark, corpusDir, v - 1).map(_._1).toSet
    val added = Snapshot.filesForTest(spark, corpusDir, v).map(_._1)
      .filterNot(prevFiles.contains).toSet
    val admitted = Snapshot.readVersion(spark, corpusDir, v)
      .withColumn("__f", col("_metadata.file_path"))
      .filter(added.map(a => col("__f").endsWith(lit(a))).reduceOption(_ || _)
        .getOrElse(lit(false)))
      .drop("__f")
    val sigs = Dedup.bandedSignatures(admitted, id, text, numPerm, bands, n)
    if (Snapshot.latestVersion(spark, sigDir).isEmpty)
      Snapshot.commit(spark, sigDir, sigs, Some(batchId), Some(app),
        spec = Some(Snapshot.TableSpec(statsCols = Seq("sig"),
          bloomCols = Seq("sig"))))
    else Snapshot.append(spark, sigDir, sigs, Some(batchId), Some(app))
    ()
  }

  /** Streaming form: every micro-batch of `docs` is probed and its
    * survivors land in `corpusDir` (+ signatures in `sigDir`) with
    * exactly-once epochs. Pair with a scheduled
    * `Snapshot.optimize(sigDir, clusterBy = Seq("sig"))` so the store
    * stays sig-clustered and probes keep pruning.
    */
  def dedupOnArrival(docs: DataFrame, corpusDir: String, sigDir: String,
      id: String, text: String, checkpointDir: String,
      minJaccard: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyBatch(batch, batchId, corpusDir, sigDir, id, text, minJaccard)
        ()
      }
      .start()
}
