package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf("x"), "documents")

  test("mixtureSample: per-source rates hold approximately, unlisted sources dropped") {
    val bySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Curation.mixtureSample(docs, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.3))
    val out = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("src0") == bySource("src0"))          // rate 1.0 keeps all
    val r1 = out("src1").toDouble / bySource("src1")
    assert(r1 > 0.15 && r1 < 0.45, s"src1 rate $r1") // ~0.3 on small n
    assert(!out.contains("src2"))                    // unlisted → dropped
  }

  test("negativePairs: cross-group only, ≤ m per anchor, anchor ≠ negative, deterministic") {
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def run() = Curation.negativePairs(docs, "doc_id", "source", m = 2, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = run()
    assert(pairs.nonEmpty, "some anchors must find negatives")
    assert(pairs.forall { case (a, n) => a != n }, "anchor never pairs with itself")
    assert(pairs.forall { case (a, n) => srcOf(a) != srcOf(n) },
      "negatives always come from a different source")
    val perAnchor = pairs.groupBy(_._1).map(_._2.length)
    assert(perAnchor.max <= 2, s"at most m per anchor: ${perAnchor.max}")
    assert(run().toSeq == pairs.toSeq, "deterministic under re-run")
  }

  test("sampling and split are deterministic across invocations") {
    val a = Curation.mixtureSample(docs, "source", "doc_id", Map("src0" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.mixtureSample(docs, "source", "doc_id", Map("src0" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    val s1 = Curation.split(docs, "doc_id", 0.1, 0.1)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s2 = Curation.split(docs, "doc_id", 0.1, 0.1)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 == s2)
  }

  test("mixtureOversample replicates whole epochs plus a fractional tail") {
    val n0 = docs.filter(col("source") === "src0").count()
    val out = Curation.mixtureOversample(docs, "source", "doc_id", Map("src0" -> 2.3))
    val counts = out.groupBy("doc_id").count().collect().map(_.getLong(1))
    assert(counts.forall(c => c == 2L || c == 3L), "every doc gets 2 or 3 copies")
    val total = counts.sum.toDouble / n0
    assert(total > 2.1 && total < 2.5, s"mean copies $total should be ~2.3")
    // epoch tags are 1..copies
    val epochs = out.filter(col("doc_id") === out.select("doc_id").head().getLong(0))
      .select("epoch").collect().map(_.getLong(0)).sorted
    assert(epochs.head == 1L && epochs.toSet.size == epochs.length)
  }

  test("packChunks: spans are contiguous per shard and chunks cover every straddle") {
    val packed = Curation.packChunks(docs, "doc_id", "n_chars", budget = 500L, shards = 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("chunk"), r.getAs[Long]("start_off"), r.getAs[Long]("end_off")))
    // per shard: doc spans tile the stream with no gaps or overlaps
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val spans = rows.map(r => (r._1, r._4, r._5)).distinct.sortBy(_._2).toSeq
      spans.sliding(2).foreach {
        case Seq((_, _, endA), (_, startB, _)) => assert(endA == startB, "contiguous layout")
        case _ => ()
      }
      assert(spans.head._2 == 0L, "stream starts at offset 0")
    }
    // a doc overlapping k chunk boundaries appears in k+1 chunks
    packed.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      val (s, e) = (rows.head._4, rows.head._5)
      val expected = (s / 500L) to ((e - 1) / 500L)
      assert(rows.map(_._3).sorted.toSeq == expected.toSeq)
    }
  }

  test("takePerGroup: exactly n per group (whole group when smaller), deterministic, salted") {
    val n = 7
    val out = Curation.takePerGroup(docs, "lang", "doc_id", n)
    val perGroup = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (g, sz) =>
      assert(perGroup(g) == math.min(sz, n.toLong), s"group $g: ${perGroup(g)}")
    }
    val again = Curation.takePerGroup(docs, "lang", "doc_id", n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
    val other = Curation.takePerGroup(docs, "lang", "doc_id", n, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != again, "different salts draw different samples")
  }

  test("split is exhaustive, disjoint, and roughly proportioned") {
    val s = Curation.split(docs, "doc_id", valFrac = 0.2, testFrac = 0.1)
    val counts = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.values.sum == n.toLong)            // exhaustive
    assert(counts("val") / n > 0.1 && counts("val") / n < 0.3)
    assert(counts("test") / n > 0.03 && counts("test") / n < 0.2)
    assert(counts("train") / n > 0.6)
    // different salts decorrelate
    val other = Curation.split(docs, "doc_id", 0.2, 0.1, salt = "other")
      .filter(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).toSet
    val mine = s.filter(col("split") === "test").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != mine)
  }

  test("decontaminate drops exactly the docs sharing an n-gram with the eval set") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"),
      (3L, "totally unrelated words here now")).toDF("id", "text")
    val eval = Seq(
      (100L, "prefix alpha beta gamma delta suffix"), // shares 4-gram with 1
      (101L, "no overlap with anything else at all")).toDF("id", "text")
    val bad = Curation.contaminatedIds(train, eval, "id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(bad == Set(1L))
    val kept = Curation.decontaminate(train, eval, "id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("weightedSample: heavier rows sampled proportionally more; deterministic; exact k") {
    import spark.implicits._
    // 400 light rows (w=1) and 100 heavy rows (w=20): heavy carries
    // 2000/2400 of the total weight, so a k=60 sample should be
    // heavy-dominated despite heavy being a 1-in-5 minority
    val df = ((1L to 400L).map(i => (i, "light", 1.0)) ++
      (401L to 500L).map(i => (i, "heavy", 20.0)))
      .toDF("id", "stratum", "w")
    val sample = Curation.weightedSample(df, "id", "w", k = 60)
    val byStratum = sample.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sample.count() == 60)
    assert(byStratum.getOrElse("heavy", 0L) > byStratum.getOrElse("light", 0L) * 2,
      s"weight-20 minority should dominate the sample: $byStratum")
    // deterministic in (id, salt)
    val again = Curation.weightedSample(df, "id", "w", k = 60)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == sample.select("id").collect().map(_.getLong(0)).toSet)
    // different salt → different sample
    val other = Curation.weightedSample(df, "id", "w", k = 60, salt = "other")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(other != again)
  }

  test("chunkDocs with zero overlap partitions every doc's tokens exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf("documents"), "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val rebuilt = Curation.chunkDocs(docs, "doc_id", "text", chunkTokens = 32, overlap = 0)
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(sort_array(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
          s => s.getField("chunk_text"))).as("rebuilt"))
    val orig = docs.select(col("doc_id"),
      concat_ws(" ", graft.operators.TextAnalysis.tokens(col("text"))).as("norm"))
    val mismatches = orig.join(rebuilt, "doc_id")
      .filter(col("norm") =!= col("rebuilt")).count()
    assert(mismatches == 0, "stride == window: concatenated chunks must equal the token stream")
  }

  test("chunkDocs: overlapping windows, short tail, single-chunk doc, context preserved") {
    import spark.implicits._
    val doc10 = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val docs = Seq((1L, doc10), (2L, "a b c")).toDF("doc_id", "text")
    val out = Curation.chunkDocs(docs, "doc_id", "text", chunkTokens = 4, overlap = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    // doc 1: starts 0,2,4,6,8 → 5 chunks; overlap of 2 tokens between neighbors
    assert(out((1L, 0L)) == ("t1 t2 t3 t4", 4L))
    assert(out((1L, 1L)) == ("t3 t4 t5 t6", 4L))  // carries t3 t4 context
    assert(out((1L, 4L)) == ("t9 t10", 2L))       // short tail
    assert(!out.contains((1L, 5L)))
    // doc 2 fits in one window... plus the start-2 tail per the fixed stride
    assert(out((2L, 0L)) == ("a b c", 3L))
    assert(out((2L, 1L)) == ("c", 1L))
    assert(out.size == 5 + 2)
  }

  test("kcenterSelect: distinct centers, seed = min id, max-min radius non-increasing, deterministic") {
    val emb = Tables(spark, sf("x"), "embeddings")
    def run() = Curation.kcenterSelect(emb, "vec_id", "embedding", k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val sel = run()
    assert(sel.map(_._1) == (0L until 6L), "one row per round, in order")
    assert(sel.map(_._2).distinct.length == 6, "centers are distinct")
    val minId = emb.agg(min(col("vec_id"))).head().getLong(0)
    assert(sel.head._2 == minId, "seeded at the minimum id")
    val radii = sel.tail.map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"farthest-first radii must be non-increasing: $radii")
    assert(radii.last > 0, "no duplicate center selected")
    assert(run() == sel, "deterministic under re-run")
  }

  test("naiveBayes: total mass conserved per class; capped vocab mostly agrees with exact") {
    val exact = graft.operators.TextAnalysis.naiveBayes(docs, "doc_id", "text", "lang")
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val outPerLang = exact.groupBy("actual").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outPerLang == perLang, "every doc gets exactly one prediction")
    // capped vocab: still exactly one prediction per doc, and the
    // selection is deterministic under re-run (the corpus here is
    // tiny-vocab synthetic text, so prediction AGREEMENT with the
    // exact model is not a meaningful floor — mass + determinism is)
    def capped() = graft.operators.TextAnalysis
      .naiveBayes(docs, "doc_id", "text", "lang", topK = 20)
    val c1 = capped().collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(c1.length == docs.count(), "capped model predicts every doc once")
    assert(capped().collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
      .sameElements(c1), "capped model deterministic under re-run")
  }
}
