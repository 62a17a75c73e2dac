package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dataset-curation operators for training-data assembly: mixture
  * sampling and train/val/test splitting.
  *
  * Both are DETERMINISTIC hash gates on a stable id — not `rand()`:
  * reproducible across runs, retries, partitionings and cluster
  * sizes, joinable back to the source (the same id always lands in
  * the same split), and pure map-side (no shuffle, no state) at any
  * scale. `rand()`-based sampling breaks all four.
  */
object Curation {

  /** Uniform [0,1) hash gate from a stable id column + salt. */
  def hashGate(id: Column, salt: String): Column =
    (pmod(xxhash64(id, lit(salt)), lit(1000000L)).cast("double") / 1000000.0)

  /** Per-source mixture sampling: keep each row with its source's
    * rate (missing sources → dropped). E.g. down-weight a crawl dump
    * to 10% while keeping curated sources whole.
    */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
      rates: Map[String, Double], salt: String = "mix-v1"): DataFrame = {
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.filter(hashGate(col(idCol), salt) < rate)
  }

  /** Deterministic weighted sample WITHOUT replacement (A-Res
    * reservoir): each row's key is ln(u)/w for a hash-derived uniform
    * u — the k largest keys are a correct weighted sample (Efraimidis
    * & Spirakis), heavier rows proportionally likelier. Ranking runs
    * through the bounded `top_k_by` aggregate, so map-side partials
    * hold ≤ k rows and the shuffle is O(partitions·k) — a full sort
    * of the corpus by sampling key would be a 100 TB global sort for
    * a k-row answer. Deterministic in (id, salt); weights must be > 0.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "wsample-v1"): DataFrame = {
    // 53-bit mantissa-exact uniform in (0,1): top bits of xxhash64
    val u = (shiftrightunsigned(xxhash64(col(idCol), lit(salt)), 11)
      .cast("double") + 0.5) / 9007199254740992.0
    val key = log(u) / col(weightCol).cast("double")
    val ids = df
      .select(graft.functions.vector.topKBy(key, col(idCol).cast("long"), k).as("top"))
      .select(explode(col("top")).as("s"))
      .select(col("s.id").as("__sid"))
    df.join(broadcast(ids), col(idCol) === col("__sid")).drop("__sid")
  }

  /** Deterministic cross-group negative sampling for contrastive
    * training pairs: each anchor doc gets up to `m` negatives drawn
    * from OTHER groups (sources) — without any cross join. Docs land
    * in hash buckets; anchors in bucket k meet only candidates whose
    * shifted hash lands in k (the adjacent bucket), so join fan-out
    * is bounded by bucket occupancy, and the per-anchor choice is the
    * bounded `top_k_by` aggregate on a pair hash (map-side partials ≤
    * m rows — no per-anchor sort, no window funnel). Fully
    * deterministic in (ids, salt): re-runs and re-partitionings
    * produce the same pairs.
    */
  def negativePairs(df: DataFrame, idCol: String, groupCol: String,
      m: Int = 2, buckets: Int = 64, salt: String = "neg-v1"): DataFrame = {
    val h = xxhash64(col(idCol), lit(salt))
    val anchors = df.select(col(idCol).as("anchor_id"), col(groupCol).as("anchor_grp"),
      pmod(h, lit(buckets.toLong)).as("bk"))
    // Candidate pool THINNED to ≤ 8m per bucket BEFORE the join (hash-
    // ranked via the bounded top_k_by): bucket occupancy grows O(n/B),
    // so an unthinned bucket join would be quadratic at corpus scale —
    // thinning caps join fan-out per anchor at 8m and total work at
    // O(n·m), while the hash ranking keeps the choice deterministic.
    val pool = df.select(col(idCol).as("neg_id"), col(groupCol).as("neg_grp"),
        pmod(h + 1, lit(buckets.toLong)).as("bk"),
        shiftrightunsigned(xxhash64(col(idCol), lit(salt + "-pool")), 11)
          .cast("double").as("pscore"))
      .groupBy(col("bk"))
      .agg(graft.functions.vector.topKBy(col("pscore"), col("neg_id").cast("long"), 8 * m).as("top"))
      .select(col("bk"), explode(col("top")).as("s"))
      .select(col("bk"), col("s.id").as("neg_id"))
      .join(df.select(col(idCol).as("neg_id"), col(groupCol).as("neg_grp")), "neg_id")
    anchors.join(pool, "bk")
      .filter(col("anchor_grp") =!= col("neg_grp"))
      .select(col("anchor_id"),
        shiftrightunsigned(xxhash64(col("anchor_id"), col("neg_id"), lit(salt)), 11)
          .cast("double").as("score"),
        col("neg_id"))
      .groupBy(col("anchor_id"))
      .agg(graft.functions.vector.topKBy(col("score"), col("neg_id").cast("long"), m).as("top"))
      .select(col("anchor_id"), explode(col("top")).as("s"))
      .select(col("anchor_id"), col("s.id").as("neg_id"))
  }

  /** Disjoint deterministic split: adds `split` ∈ {train, val, test}
    * with the given proportions (must sum to ≤ 1; remainder → train).
    */
  def split(df: DataFrame, idCol: String, valFrac: Double, testFrac: Double,
      salt: String = "split-v1"): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1.0)
    val g = hashGate(col(idCol), salt)
    df.withColumn("split",
      when(g < testFrac, "test")
        .when(g < testFrac + valFrac, "val")
        .otherwise("train"))
  }

  /** Mixture sampling with rates > 1 (epoch oversampling): a rate of
    * 2.3 yields 2 copies of every row plus a 30% deterministic chance
    * of a third, tagged with `epoch` (1-based) so downstream shuffling
    * /packing can interleave epochs. Rates < 1 behave like
    * [[mixtureSample]]. Pure map-side (explode of a computed count) —
    * no shuffle, reproducible at any scale.
    */
  def mixtureOversample(df: DataFrame, sourceCol: String, idCol: String,
      rates: Map[String, Double], salt: String = "mix-v1"): DataFrame = {
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    val whole = floor(rate).cast("long")
    val frac  = rate - floor(rate)
    val copies = (whole + when(hashGate(col(idCol), salt) < frac, 1L).otherwise(0L)).cast("long")
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  /** Deterministic exact-N-per-group sample (eval-set construction:
    * "N docs per language/source"). Selection order is a salted hash —
    * a pseudo-random but reproducible permutation — and the ranking
    * runs through the bounded `top_k_by` aggregate: each map task
    * keeps ≤ n candidates per group, so the shuffle carries
    * O(partitions·n) rows however large the corpus (a row_number
    * window would funnel every group's full row set into one reducer).
    * Groups smaller than n are returned whole.
    */
  def takePerGroup(df: DataFrame, groupCol: String, idCol: String, n: Int,
      salt: String = "take-v1"): DataFrame = {
    require(n > 0)
    val picked = df
      .select(col(groupCol).as("__g"), col(idCol).cast("long").as("__id"),
        hashGate(col(idCol), salt).as("__s"))
      .groupBy(col("__g"))
      .agg(graft.functions.vector.topKBy(col("__s"), col("__id"), n).as("__top"))
      .select(explode(col("__top")).as("__t"))
      .select(col("__t.id").as(idCol))
    df.join(picked, Seq(idCol), "left_semi")
  }

  /** Sequence packing (concatenate-and-chop): lay the corpus out as a
    * per-shard concatenated token stream and assign every document the
    * fixed-size chunk(s) its span [start_off, end_off) overlaps — the
    * standard pretraining batching step, where documents straddle
    * chunk boundaries rather than leaving padding.
    *
    * Scale shape: one window per SHARD (never a global order) — the
    * running sum is computed inside each shard's partition, so the
    * only shuffle is the hash partition on `shard`, and shard count is
    * the parallelism knob. `weightCol` is whatever budget unit the
    * tokenizer defines (token count, chars, bytes).
    *
    * Sharding here is `id % shards` (oracle-expressible); production
    * ids that aren't dense integers would hash first — the layout
    * logic is identical.
    */
  /** Eval-set decontamination: ids of training docs sharing ANY word
    * n-gram with the eval corpus. The standard pre-training hygiene
    * pass (real pipelines use n≈8–13; the default here is small so the
    * synthetic test corpus yields overlap).
    *
    * Scale shape: both sides explode to distinct (doc, gram) rows and
    * meet in ONE equi-join on the gram — eval sets are orders of
    * magnitude smaller than training corpora, so the eval gram side is
    * broadcast-eligible and AQE picks that up; nothing is ever
    * collected to the driver.
    */
  def contaminatedIds(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 4): DataFrame = {
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
        .select(col(idCol), explode(Dedup.shingles(col("toks"), n)).as("gram"))
    grams(train)
      .join(grams(eval).select("gram").distinct(), Seq("gram"), "left_semi")
      .select(idCol).distinct()
  }

  /** Training corpus with eval-contaminated docs removed. */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 4): DataFrame =
    train.join(contaminatedIds(train, eval, idCol, textCol, n), Seq(idCol), "left_anti")

  /** Overlapping token-window chunking (the long-document split for
    * pretraining sequences and RAG passages): each document yields
    * windows of `chunkTokens` tokens starting every
    * `chunkTokens − overlap` tokens, the tail window shorter. Distinct
    * from [[packChunks]] (which concatenates WHOLE docs into budget
    * bins): chunking SPLITS one long doc, preserving `overlap` tokens
    * of context across the cut.
    *
    * Scale shape: pure map-side — tokenize once (materialized array,
    * §5b HOF rule), explode the start sequence, slice per chunk; no
    * shuffle at all. Returns (id, chunk_idx, chunk_text, n_chunk_tokens).
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens: chunkTokens=$chunkTokens overlap=$overlap")
    val step = chunkTokens - overlap
    docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__start",
        explode(sequence(lit(0), greatest(col("__n") - 1, lit(0)), lit(step))))
      .filter(col("__start") < col("__n"))
      .withColumn("chunk", slice(col("__toks"), col("__start") + 1, lit(chunkTokens)))
      .select(col(idCol),
        (col("__start") / step).cast(LongType).as("chunk_idx"),
        concat_ws(" ", col("chunk")).as("chunk_text"),
        size(col("chunk")).cast(LongType).as("n_chunk_tokens"))
  }

  def packChunks(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
    df.select(col(idCol), col(weightCol),
        pmod(col(idCol), lit(shards.toLong)).cast("long").as("shard"))
      .filter(col(weightCol) > 0)
      .withColumn("end_off", sum(col(weightCol)).over(w))
      .withColumn("start_off", col("end_off") - col(weightCol))
      .withColumn("chunk", explode(sequence(
        floor(col("start_off").cast("double") / budget.toDouble).cast("long"),
        floor((col("end_off") - 1).cast("double") / budget.toDouble).cast("long"))))
      .select(col(idCol), col("shard"), col("chunk"),
        col("start_off").cast("long").as("start_off"),
        col("end_off").cast("long").as("end_off"))
  }

  /** k-center greedy (farthest-first traversal) coreset selection
    * over an embedding column — the classic 2-approximation to the
    * k-center objective, used as diversity-based data selection:
    * each round picks the point farthest (max-min distance) from
    * everything already selected. Seeded deterministically at the
    * minimum id; distance ties break toward the smaller id.
    *
    * Determinism: embeddings quantize ONCE to scale-7 fixed point
    * (floor(double·1e7 + 0.5), the q113 discipline) and every
    * distance is an exact integer Σ(Δ·Δ) — the whole selection is
    * integer arithmetic, bit-reproducible on any engine or cluster.
    *
    * Scale shape: k-1 passes over the quantized frame, each pure
    * map-side (zip_with against a 64-literal broadcast center) plus
    * a top-1 TakeOrdered reduce; running min-distance state rides a
    * column, re-planned O(1)-deep via eager localCheckpoint (single
    * consumer). Driver holds only the k selected vectors — the
    * FAISS-style bounded driver state, like IVF training.
    */
  def kcenterSelect(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = df.sparkSession
    import org.apache.spark.sql.types.DoubleType
    val ints = df.select(col(idCol).cast(LongType).as("id"),
        transform(col(vecCol),
          x => floor(x.cast(DoubleType) * lit(1.0e7) + lit(0.5))).as("iv"))
      .persist()
    val seedId = ints.agg(min(col("id"))).head().getLong(0)
    var selected = Vector((0L, seedId, 0L))
    var state = ints.withColumn("mind2", lit(Long.MaxValue))
    for (r <- 1 until k) {
      val centerIv = ints.filter(col("id") === selected.last._2)
        .head().getSeq[Long](1)
      val cLit = array(centerIv.map(lit): _*)
      state = state.withColumn("mind2",
          least(col("mind2"),
            aggregate(zip_with(col("iv"), cLit, (a, b) => (a - b) * (a - b)),
              lit(0L), (acc, x) => acc + x)))
        .localCheckpoint(true)
      val next = state.orderBy(desc("mind2"), col("id"))
        .select(col("id"), col("mind2")).head()
      selected = selected :+ ((r.toLong, next.getLong(0), next.getLong(1)))
    }
    ints.unpersist()
    import spark.implicits._
    selected.toDF("sel_round", "vec_id", "d2_units")
  }
}
