package graft.operators

import graft.functions.vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for an LLM-training-data pipeline:
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.
  *
  * Scale design (the point of every method here): no operator ever
  * materializes the O(n²) pair space. Candidate generation is always
  * through a *blocking key* — content digest, shared n-gram, LSH band
  * signature, SimHash band — so the shuffle volume stays ~O(n·b). At
  * 100 TB the digests/signatures are uniformly distributed, so the
  * hash-partitioned shuffles have no planner-visible skew; the one
  * data-driven skew source (hot n-grams shared by millions of docs) is
  * handled by stop-gram removal (`maxGramDf`, standard prefix-filter).
  */
object Dedup {

  /** Exact dedup: canonical md5 digest → min-id survivor per digest.
    * One hash-partitioned aggregation; digest keys are uniform so no
    * skew at any scale. (Reference has no dedup — this extends its
    * transform stage; see SURVEY.md §2c.)
    */
  def exact(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), TextAnalysis.fingerprintMd5(col(text)).as("digest"))
      .groupBy("digest")
      .agg(min(col(id)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles; empty array when < n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val t = TextAnalysis.tokens(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j)): _*))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted index
    * (explode shingles → self-join on shared gram) with blocking:
    * only pairs sharing `block` and within `lenBand` of length are
    * considered. `maxGramDf > 0` drops grams occurring in more than
    * that many docs before the join (prefix-filter / stop-gram
    * removal) — the standard skew guard at scale; union sizes still
    * use the full gram sets so Jaccard is only *under*-estimated.
    */
  def ngramJaccardPairs(docs: DataFrame, id: String, text: String,
      block: String, len: String, lenBand: Int,
      n: Int = 3, minJaccard: Double = 0.2, maxGramDf: Long = 0L): DataFrame = {
    val g = docs.select(col(id).as("id"), col(block).as("blk"),
      col(len).cast(LongType).as("len"), explode(shingles(col(text), n)).as("gram"))
    val pruned =
      if (maxGramDf > 0L) {
        val hot = g.groupBy("gram").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxGramDf).select("gram")
        g.join(broadcast(hot), Seq("gram"), "left_anti")
      } else g
    val sizes = g.groupBy("id").agg(count(lit(1)).as("sz")) // grams are distinct per doc
    val a = pruned.select(col("blk"), col("gram"),
      col("id").as("id_a"), col("len").as("len_a"))
    val b = pruned.select(col("blk"), col("gram"),
      col("id").as("id_b"), col("len").as("len_b"))
    val inter = a.join(b, Seq("blk", "gram"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= lenBand)
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")).cast(DoubleType), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** MinHash signatures: permutation i = xxhash64(gram_hash, i) —
    * independent uniform re-hashes with a fixed seed ⇒ deterministic
    * across runs/partitionings, and no overflow under ANSI mode (an
    * affine Carter–Wegman transform would long-overflow there).
    * Returns (id, h0..h{numPerm-1}).
    */
  def minhashSignatures(docs: DataFrame, id: String, text: String,
      numPerm: Int = 128, n: Int = 3): DataFrame = {
    val g = docs.select(col(id).as("id"), explode(shingles(col(text), n)).as("gram"))
      .withColumn("g64", xxhash64(col("gram")))
    val aggs = (0 until numPerm).map { i =>
      min(xxhash64(col("g64"), lit(i))).as(s"h$i")
    }
    g.groupBy("id").agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  /** LSH banding over MinHash signatures: docs agreeing on all rows of
    * any band become candidate pairs. Join key is (band, bandSig) —
    * uniform 64-bit hashes, so the self-join is balanced at any scale.
    */
  def minhashLshCandidates(docs: DataFrame, id: String, text: String,
      numPerm: Int = 128, bands: Int = 32, n: Int = 3): DataFrame = {
    require(numPerm % bands == 0, "numPerm must be divisible by bands")
    val rows = numPerm / bands
    val sig  = minhashSignatures(docs, id, text, numPerm, n)
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        xxhash64((bi * rows until (bi + 1) * rows).map(i => col(s"h$i")): _*).as("sig"))
    }
    val banded = sig.select(col("id"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.sig").as("sig"))
    banded.as("x").join(banded.as("y"), Seq("band", "sig"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
  }

  /** MinHash-LSH dedup: candidates verified with exact n-gram Jaccard;
    * docs that are the higher-id member of a verified pair are removed.
    * (Greedy pairwise removal, not transitive-closure clustering — at
    * scale true clustering needs an iterative connected-components
    * pass; pairwise is the standard first-cut and errs toward keeping.)
    */
  def minhashDedupSurvivors(docs: DataFrame, id: String, text: String,
      minJaccard: Double = 0.8, numPerm: Int = 128, bands: Int = 32,
      n: Int = 3): DataFrame = {
    val cand = minhashLshCandidates(docs, id, text, numPerm, bands, n)
    val grams = docs.select(col(id).as("gid"), shingles(col(text), n).as("grams"))
    val verified = cand
      .join(grams.select(col("gid").as("id_a"), col("grams").as("ga")), "id_a")
      .join(grams.select(col("gid").as("id_b"), col("grams").as("gb")), "id_b")
      .withColumn("j",
        size(array_intersect(col("ga"), col("gb"))).cast(DoubleType) /
          size(array_union(col("ga"), col("gb"))).cast(DoubleType))
      .filter(col("j") >= minJaccard)
    docs.join(verified.select(col("id_b").as(id)).distinct(), Seq(id), "left_anti")
  }

  /** 64-bit SimHash over word n-gram shingles: per-bit ±1 vote summed
    * per doc (one wide partial aggregation — map-side combined, no raw
    * doc shuffle), sign → bit. Returns (id, simhash: long).
    */
  def simhash(docs: DataFrame, id: String, text: String, n: Int = 2): DataFrame = {
    val g = docs.select(col(id).as("id"), explode(shingles(col(text), n)).as("gram"))
      .withColumn("g64", xxhash64(col("gram")))
    val aggs = (0 until 64).map { j =>
      sum(when(shiftright(col("g64"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$j")
    }
    val bitSums = g.groupBy("id").agg(aggs.head, aggs.tail: _*)
    val packed = (0 until 64)
      .map(j => when(col(s"b$j") > 0L, lit(1L << j)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    bitSums.select(col("id"), packed.as("simhash"))
  }

  /** SimHash near-dup candidate pairs with Hamming ≤ maxHamming,
    * found via 4×16-bit bands (pigeonhole: any pair within Hamming 3
    * agrees exactly on ≥1 band ⇒ recall 1.0 for maxHamming ≤ 3).
    */
  def simhashCandidates(sig: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bandCols = (0 until 4).map { bi =>
      struct(lit(bi).as("band"),
        shiftright(col("simhash"), bi * 16).bitwiseAND(lit(0xFFFFL)).as("key"))
    }
    val banded = sig.select(col("id"), col("simhash"), explode(array(bandCols: _*)).as("b"))
      .select(col("id"), col("simhash"), col("b.band").as("band"), col("b.key").as("key"))
    banded.as("x").join(banded.as("y"), Seq("band", "key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: cosine ≥ minCos within a blocking
    * column (here a label/cluster id; at 100 TB the block would be an
    * LSH hyperplane bucket from Similarity.hyperplaneBuckets so each
    * block is small and the pair space stays near-linear).
    */
  def embeddingNearDupPairs(emb: DataFrame, id: String, vec: String,
      block: String, minCos: Double): DataFrame = {
    val a = emb.select(col(block).as("blk"), col(id).as("id_a"), col(vec).as("v_a"))
    val b = emb.select(col(block).as("blk"), col(id).as("id_b"), col(vec).as("v_b"))
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(vector.cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }
}
