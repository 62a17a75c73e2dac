package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Quantified recall for the approximate (rows-only) dedup/ANN paths,
  * differential-tested against the exact oracled paths on the sf0.001
  * documents/embeddings tables — so "rows-only" never means
  * "unmeasured". Floors are deliberately below the theoretical recall
  * (MinHash 64/16 at j=0.7 ⇒ ~0.988; SimHash 4×16 bands ⇒ 1.0 by
  * pigeonhole) to keep the spec non-flaky while still catching a
  * broken banding/bucketing change.
  */
class RecallSpec extends SparkSpec {

  private val dir = sf("documents")

  test("minhash-LSH verified pairs recall ≥0.9 of exact n-gram Jaccard pairs") {
    val docs = Tables(spark, dir, "documents")
    // exact ground truth: all-pairs Jaccard (constant block, no length
    // band, stop-gram guard off) at the same threshold + shingle size
    val truth = Dedup.ngramJaccardPairs(
        docs.withColumn("one", lit(1)), "doc_id", "text", "one", "n_chars",
        lenBand = Int.MaxValue, n = 3, minJaccard = 0.7, maxGramDf = 0L)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(truth.nonEmpty, "sf0.001 documents should contain j≥0.7 near-dups")
    val found = Dedup.minhashVerifiedPairs(docs, "doc_id", "text", minJaccard = 0.7)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(found.subsetOf(truth), "exact-Jaccard verification makes precision 1.0")
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"minhash recall $recall (${found.size}/${truth.size})")
  }

  test("simhash banded candidates recall = 1.0 for hamming ≤ 3 (pigeonhole)") {
    val sigs = Dedup.simhash(Tables(spark, dir, "documents"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash"))
    // brute-force ground truth over the collected signatures (test-only)
    val truth = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(truth.nonEmpty, "sf0.001 documents should contain hamming≤3 simhash pairs")
    val found = Dedup.simhashCandidates(
        Dedup.simhash(Tables(spark, dir, "documents"), "doc_id", "text"), maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(found == truth,
      s"4×16-bit banding must be lossless at hamming≤3: missed ${(truth -- found).take(5)}")
  }

  test("ann_ivf top-k recall ≥0.7 of brute-force top-k") {
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(emb, q,
      "vec_id", "embedding", "q_id", "q_vec", 5))
    val approx = topSets(Similarity.ivfTopK(emb, q,
      "vec_id", "embedding", "q_id", "q_vec", dim = 64, k = 5, nCells = 32, nProbe = 8))
    val recalls = exact.map { case (qid, truth) =>
      approx.getOrElse(qid, Set.empty).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, f"mean ann_ivf recall $mean%.3f below 0.7 floor")
  }

  test("ann_lsh top-k recall ≥0.5 of brute-force top-k") {
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(emb, q,
      "vec_id", "embedding", "q_id", "q_vec", 5))
    val approx = topSets(Similarity.lshTopK(emb, q,
      "vec_id", "embedding", "q_id", "q_vec", dim = 64, k = 5, bits = 4, bands = 4))
    assert(exact.nonEmpty)
    val recalls = exact.map { case (qid, truth) =>
      approx.getOrElse(qid, Set.empty).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, f"mean ann_lsh recall $mean%.3f below 0.5 floor")
  }

  test("ann_pq top-k recall ≥0.4 of brute-force top-k (compressed-domain search)") {
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(emb, q,
      "vec_id", "embedding", "q_id", "q_vec", 5))
    val approx = topSets(Similarity.pqTopK(emb, q,
      "vec_id", "embedding", "q_id", "q_vec", dim = 64, k = 5, m = 8, ksub = 64))
    assert(exact.nonEmpty)
    val recalls = exact.map { case (qid, truth) =>
      approx.getOrElse(qid, Set.empty).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, f"mean ann_pq recall $mean%.3f below 0.4 floor")
  }

  test("pq encode is deterministic and reconstruction preserves cosine ≥0.8 on average") {
    val emb = Tables(spark, dir, "embeddings").filter(col("vec_id") < 256)
    val cbs = Similarity.trainPqCodebooks(emb, "embedding", dim = 64, m = 8, ksub = 64)
    val enc1 = Similarity.pqEncode(emb, "embedding", 64, cbs)
      .select(col("vec_id"), col("embedding_pq")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val enc2 = Similarity.pqEncode(emb, "embedding", 64, cbs)
      .select(col("vec_id"), col("embedding_pq")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc1 == enc2, "pq codes must be deterministic")
    assert(enc1.values.forall(codes => codes.length == 8 && codes.forall(c => c >= 0 && c < 64)))
    // reconstruction fidelity: cos(x, x̂) averaged over the sample
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val cosines = enc1.map { case (id, codes) =>
      val xhat = codes.zipWithIndex.flatMap { case (c, j) => cbs(j)(c) }.toArray
      val x = rows(id)
      val dot = x.zip(xhat).map { case (a, b) => a * b }.sum
      val na = math.sqrt(x.map(v => v * v).sum); val nb = math.sqrt(xhat.map(v => v * v).sum)
      dot / (na * nb)
    }
    val meanCos = cosines.sum / cosines.size
    assert(meanCos >= 0.8, f"mean reconstruction cosine $meanCos%.3f below 0.8")
  }

  test("weighted-minhash verified pairs recall ≥0.9 of exact all-pairs weighted Jaccard") {
    val docs = Tables(spark, dir, "documents")
    // exact ground truth: all-pairs capped weighted Jaccard from the
    // tf frame (test-only O(n²) via the token join — 500 docs)
    val tf = docs
      .select(col("doc_id").as("id"), explode(graft.operators.TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(least(count(lit(1)), lit(16L)).as("w"))
      .persist()
    val tot = tf.groupBy(col("id")).agg(sum(col("w")).as("tot"))
    val truth = tf.select(col("id").as("id_a"), col("token"), col("w").as("wa"))
      .join(tf.select(col("id").as("id_b"), col("token"), col("w").as("wb")), Seq("token"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(col("wa"), col("wb"))).as("icap"))
      .join(tot.select(col("id").as("id_a"), col("tot").as("tot_a")), "id_a")
      .join(tot.select(col("id").as("id_b"), col("tot").as("tot_b")), "id_b")
      .withColumn("wj", col("icap").cast(org.apache.spark.sql.types.DoubleType) /
        (col("tot_a") + col("tot_b") - col("icap")).cast(org.apache.spark.sql.types.DoubleType))
      .filter(col("wj") >= 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    tf.unpersist()
    assert(truth.nonEmpty, "sf0.001 documents should contain wj≥0.5 near-dups")
    val found = Dedup.wminhashVerifiedPairs(docs, "doc_id", "text", minWJaccard = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(found.subsetOf(truth), "exact Σmin/Σmax verification makes precision 1.0")
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"wminhash recall $recall (${found.size}/${truth.size})")
  }

  test("ann_ivfpq top-k recall ≥0.3 of brute-force top-k (pruned + compressed)") {
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(emb, q,
      "vec_id", "embedding", "q_id", "q_vec", 5))
    val approx = topSets(Similarity.ivfPqTopK(emb, q,
      "vec_id", "embedding", "q_id", "q_vec", dim = 64, k = 5,
      nCells = 32, nProbe = 8, m = 8, ksub = 64))
    assert(exact.nonEmpty)
    val recalls = exact.map { case (qid, truth) =>
      approx.getOrElse(qid, Set.empty).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, f"mean ann_ivfpq recall $mean%.3f below 0.3 floor")
  }
}
