package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for an LLM-training-data pipeline: token
  * counting, quality scoring, language ID, fingerprinting. Everything
  * is `functions._` (codegen'd, no UDFs) so these run at scan speed and
  * never force a shuffle — at 100 TB these are pure map-side work.
  */
object TextAnalysis {

  /** Whitespace-collapsed, trimmed, lower-cased canonical form. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the canonical form. */
  def tokens(text: Column): Column = split(normalized(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** Token-array variants: pass a MATERIALIZED `tokens(text)` column
    * (projected once) when several measures share the tokenization —
    * `filter`/`aggregate` lambdas run interpreted, so an inline
    * `tokens(text)` argument would re-run the regex split per call.
    */
  def tokenCountOf(toks: Column): Column = size(toks).cast(LongType)

  def tokenHitsOf(toks: Column, words: Seq[String]): Column =
    // native set-membership count (graft.functions.TokenSetHits) —
    // the filter+isin HOF ran an interpreted lambda with an
    // O(|words|) In probe per token and allocated the filtered array;
    // identical binary-equality count, null tokens non-members
    graft.functions.text.tokenSetHits(toks, words)

  def qualityScoreOf(toks: Column, text: Column, nChars: Column): Column = {
    val nTok  = tokenCountOf(toks).cast(DoubleType)
    val stopR = when(nTok > 0, tokenHitsOf(toks, stopwords).cast(DoubleType) / nTok).otherwise(0.0)
    val punct = punctRatio(text)
    val lenS  = least(nChars.cast(DoubleType) / 500.0, lit(1.0))
    round(lit(0.4) * (lit(1.0) - punct) + lit(0.3) * least(stopR * 5.0, lit(1.0)) + lit(0.3) * lenS, 6)
  }

  /** Language ID from a materialized token array + the raw text:
    * stopword-profile voting (the classic n-gram/stopword-counting
    * method) over real per-language function-word lists, plus a CJK
    * script check for Chinese (function words don't transfer to
    * unsegmented scripts — character class does). `und` when no
    * profile fires. Pure codegen'd expressions, zero shuffle.
    */
  def langIdOf(toks: Column, text: Column): Column = {
    val cjk = regexp_count(text, lit("[\\u4e00-\\u9fff]")).cast(DoubleType)
    val n   = greatest(length(text).cast(DoubleType), lit(1.0))
    val scores = langProfiles.map { case (lang, words) => lang -> tokenHitsOf(toks, words) }
    val vote = scores.zipWithIndex.foldRight(lit(scores.last._1)) { case (((lang, s), i), elseC) =>
      scores.drop(i + 1).map(_._2) match {
        case Nil        => elseC
        case one :: Nil => when(s >= one, lang).otherwise(elseC)
        case rest       => when(s >= greatest(rest: _*), lang).otherwise(elseC)
      }
    }
    when(cjk / n > 0.15, "zh")
      .when(scores.map(_._2).reduce(_ + _) === 0, "und")
      .otherwise(vote)
  }

  /** BPE-ish subword-piece estimate: runs of letters, runs of digits,
    * and single other non-space chars each count as one piece.
    */
  def pieceCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast(LongType)

  /** Count of tokens that are in `words`. */
  def tokenHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit): _*))).cast(LongType)

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column = {
    val n = length(text).cast(DoubleType)
    when(n > 0,
      (n - length(regexp_replace(lower(text), "[^a-z0-9\\s]", "")).cast(DoubleType)) / n)
      .otherwise(0.0)
  }

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "or", "to", "in")

  /** Composite quality score in [0,1]: stopword presence, low
    * punctuation noise, adequate length. Deterministic arithmetic
    * (same fixed weights on both engines for the oracle).
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val nTok  = tokenCount(text).cast(DoubleType)
    val stopR = when(nTok > 0, tokenHits(text, stopwords).cast(DoubleType) / nTok).otherwise(0.0)
    val punct = punctRatio(text)
    val lenS  = least(nChars.cast(DoubleType) / 500.0, lit(1.0))
    round(lit(0.4) * (lit(1.0) - punct) + lit(0.3) * least(stopR * 5.0, lit(1.0)) + lit(0.3) * lenS, 6)
  }

  /** Flesch reading-ease score, map-side and portable: words are the
    * shared whitespace tokenization, sentences are runs of terminal
    * punctuation (`[.!?]+`, floored at 1 so fragments don't divide by
    * zero), and syllables use the standard vowel-group proxy
    * (`[aeiouy]+` runs — the classic dictionary-free approximation;
    * exact syllabification needs a pronunciation lexicon, which a
    * corpus filter deliberately avoids). All three counts are exact
    * integers from regexp_count, so the score is one deterministic
    * double expression — reproducible across engines and
    * partitionings. 206.835 − 1.015·(W/S) − 84.6·(Y/W).
    */
  def readability(text: Column): Column = {
    val words = greatest(tokenCount(text), lit(1L)).cast(DoubleType)
    val sents = greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast(DoubleType)
    val sylls = regexp_count(lower(text), lit("[aeiouy]+")).cast(DoubleType)
    round(lit(206.835) - lit(1.015) * (words / sents) - lit(84.6) * (sylls / words), 4)
  }

  /** Per-language function-word (stopword) profiles — the highest-
    * frequency closed-class words of each language, the standard
    * signal for statistical language ID: they appear in essentially
    * every sentence and rarely transfer across languages. Forms shared
    * across Romance languages ("de", "la", "en", "un") are excluded so
    * a hit is evidence for one language, not two; "que" stays in both
    * fr and es where it genuinely occurs (its votes cancel).
    * Chinese is handled by script detection, not word lists —
    * whitespace tokenization doesn't segment CJK text.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "was",
      "for", "with", "this", "have", "are", "be", "not", "from", "they"),
    "fr" -> Seq("le", "les", "des", "du", "et", "est", "une", "que",
      "qui", "dans", "pour", "pas", "vous", "je", "sur", "avec", "ne",
      "ce", "il", "au", "aux", "son", "ses"),
    "es" -> Seq("el", "los", "las", "y", "una", "que", "por", "para",
      "con", "no", "su", "como", "pero", "muy", "sin", "sobre", "se",
      "lo", "del", "al", "más"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den",
      "ein", "eine", "nicht", "zu", "im", "auf", "für", "sich", "dem",
      "auch", "werden", "bei", "einer", "nach"))

  /** Predicted language straight from text (tokenizes internally —
    * prefer [[langIdOf]] with a materialized token array when other
    * measures share the tokenization).
    */
  def langId(text: Column): Column = langIdOf(tokens(text), text)

  /** Vocabulary build: document frequency per word n-gram — the
    * corpus-statistics pass behind stop-gram lists, prefix filters and
    * tokenizer vocabularies. One explode + one count-distinct-free
    * aggregation (grams are pre-deduped per doc, so `count(*)` IS the
    * document frequency — no distinct shuffle).
    */
  def gramDocFreq(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String, n: Int): org.apache.spark.sql.DataFrame =
    docs.select(org.apache.spark.sql.functions.col(id).as("id"),
        tokens(org.apache.spark.sql.functions.col(text)).as("toks"))
      .select(org.apache.spark.sql.functions.explode(
        Dedup.shingles(org.apache.spark.sql.functions.col("toks"), n)).as("gram"))
      .groupBy("gram")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("df"))

  /** Corpus-statistics language-model quality score (the CCNet-style
    * LM filter, unigram order): score(doc) = Σ c_t·ln p(t) / Σ c_t
    * over the doc's tokens, with p(t) estimated from the corpus
    * itself. Low scores flag gibberish / boilerplate-shuffled docs.
    *
    * Scale shape: the vocabulary is ONE bounded aggregation (cap it
    * with `topK` so the broadcast stays small at 100 TB — out-of-vocab
    * tokens get the 1/N floor); per-doc term counts partial-aggregate
    * map-side before the hash shuffle on (doc, token); the vocab join
    * is a broadcast, never a shuffle of the corpus.
    */
  def unigramLogProb(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String, topK: Int = 0): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count, lit, log, sum, round => rnd, coalesce, desc}
    val tok = docs.select(col(id).as("id"), explode(tokens(col(text))).as("token"))
    val vocabAll = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
    val vocab = if (topK > 0) vocabAll.orderBy(desc("cnt"), col("token")).limit(topK)
                else vocabAll
    val total = tok.agg(count(lit(1)).cast(DoubleType).as("n"))
    tok.groupBy(col("id"), col("token")).agg(count(lit(1)).as("c"))
      .join(broadcast(vocab), Seq("token"), "left")
      .crossJoin(broadcast(total))
      .withColumn("lnp", log(coalesce(col("cnt").cast(DoubleType), lit(1.0)) / col("n")))
      .groupBy("id")
      .agg(rnd(sum(col("c") * col("lnp")) / sum(col("c")), 6).as("logprob"))
  }

  /** BM25 ranked retrieval for a bag of query terms: the standard
    * probabilistic relevance score,
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)) with
    * idf = ln((N-df+½)/(df+½) + 1). Returns (id, bm25) for docs
    * matching ≥1 term.
    *
    * Scale shape: exploded tokens are FILTERED to the query terms
    * before any aggregation — the shuffled volume is O(matching
    * postings), not the corpus; corpus-level stats (N, avgdl) and the
    * per-term df are scalars/tiny frames joined by broadcast. Ranking
    * composes with the bounded `top_k_by` aggregate for a
    * shuffle-bounded top-k.
    */
  def bm25(docs: org.apache.spark.sql.DataFrame, id: String, text: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{avg, broadcast, count, explode, lit, log, round => rnd, size, sum}
    val base = docs.select(col(id).as("id"), tokens(col(text)).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).cast(DoubleType).as("dl"))
    val stats = base.agg(count(lit(1)).cast(DoubleType).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = base.select(col("id"), col("dl"), explode(col("toks")).as("token"))
      .filter(col("token").isin(terms.map(lit): _*))
      .groupBy(col("id"), col("dl"), col("token"))
      .agg(count(lit(1)).cast(DoubleType).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).cast(DoubleType).as("df"))
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("s", col("idf") * col("tf") * (k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("id")
      .agg(rnd(sum(col("s")), 6).as("bm25"))
  }

  /** All word n-gram occurrences (NOT deduped — counts matter for
    * repetition stats, unlike [[Dedup.shingles]]); empty when < n
    * tokens. Same materialized-`toks` rule as [[Dedup.shingles]].
    */
  def shinglesAll(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Count of the most frequent element of a SORTED array = its
    * longest equal-run, found in one interpreted fold over the
    * indices (O(n) element_at probes — fine for per-document arrays;
    * `sorted` must be a bound attribute or the fold re-sorts per
    * probe, the §5b HOF-CSE trap).
    */
  private[graft] def maxRunLength(sorted: Column): Column =
    when(size(sorted) <= 1, size(sorted).cast(LongType)).otherwise(
      aggregate(sequence(lit(2), size(sorted)),
        struct(lit(1L).as("run"), lit(1L).as("best")),
        (acc, i) => {
          val run = when(element_at(sorted, i) === element_at(sorted, i - 1),
            acc.getField("run") + 1L).otherwise(lit(1L))
          struct(run.as("run"), greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best")))

  /** Gopher-style repetition quality signals, per document:
    * duplicate-token fraction, fraction of tokens covered by the
    * single most-repeated bigram, and duplicate-trigram fraction
    * (the "repetitious document" filters of Rae et al. 2021 §A1.1,
    * re-expressed on whitespace tokens).
    *
    * Scale shape: ENTIRELY map-side — every measure is per-row
    * expression work over materialized token/shingle arrays (no
    * explode, no shuffle), so at 100 TB this runs at scan speed as
    * part of the quality-filter pass. Each intermediate array is
    * projected once (bound attribute) so the interpreted HOFs never
    * re-derive it per element probe.
    */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String): org.apache.spark.sql.DataFrame =
    // one native pass (graft.functions.RepStats) yields the five
    // exact integers the five interpreted array walks produced
    // (bigram build + sort + run-fold, trigram build, two
    // array_distinct probes); the fractional compositions below are
    // the identical round/when arithmetic, so results are
    // bit-identical. least(1.0, …): overlapping repeats ("a a a a" →
    // run 3, 4 tokens) would push the covered-token estimate past 1;
    // the column is documented as a fraction, so cap it (oracle caps
    // identically).
    docs.select(col(id), graft.functions.text.repStats(tokens(col(text))).as("rs"))
      .select(col(id),
        col("rs.n_tokens").as("n_tokens"),
        round(lit(1.0) - col("rs.n_distinct").cast(DoubleType) /
          col("rs.n_tokens").cast(DoubleType), 6).as("dup_token_frac"),
        round(when(col("rs.n_tokens") >= 2,
          least(lit(1.0),
            col("rs.max_bigram").cast(DoubleType) * 2.0 /
              col("rs.n_tokens").cast(DoubleType)))
          .otherwise(0.0), 6).as("top_bigram_frac"),
        round(when(col("rs.n_tri") > 0,
          lit(1.0) - col("rs.n_tri_distinct").cast(DoubleType) /
            col("rs.n_tri").cast(DoubleType))
          .otherwise(0.0), 6).as("dup_trigram_frac"))

  /** Per-group token-distribution divergence from the whole corpus:
    * KL(P_g ‖ Q) and Jensen–Shannon JS(P_g, Q), natural-log nats —
    * the mixture-monitoring pass of a training-data pipeline (which
    * sources drift from the corpus mix; JS is the symmetric, bounded
    * [0, ln 2] form).
    *
    * Scale shape: one partial-aggregated count per (group, token) is
    * the only corpus-sized shuffle; the vocabulary and group totals
    * are tiny aggregates joined back by broadcast. The (groups ×
    * vocab) grid makes the p=0 JS terms explicit — it never touches
    * the corpus again.
    *
    * `maxVocab` bounds the broadcast vocabulary (top-K tokens by
    * global count, ties broken by token) — at 100 TB the full distinct
    * vocabulary is 10⁸⁺ tokens and an unbounded broadcast OOMs the
    * driver. All out-of-vocab mass collapses into ONE residual bucket
    * per group (its p and q are the leftover masses, so both
    * distributions still sum to exactly 1 and KL/JS stay
    * well-defined). `maxVocab = 0` disables the cap (exact — the
    * oracle form).
    */
  def sourceDivergence(docs: org.apache.spark.sql.DataFrame, text: String,
      group: String, maxVocab: Int = 1 << 16): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count, desc, sum, log => ln}
    val tok      = docs.select(col(group).as("grp"), explode(tokens(col(text))).as("token"))
    val byGrpAll = tok.groupBy("grp", "token").agg(count(lit(1)).as("c"))
    val vocabAll = byGrpAll.groupBy("token").agg(sum(col("c")).as("gc"))
    val gN       = vocabAll.agg(sum(col("gc")).as("gn")) // corpus total incl. OOV
    val grpN     = byGrpAll.groupBy("grp").agg(sum(col("c")).as("n")) // group totals incl. OOV
    val capped   = maxVocab > 0
    val vocab =
      if (capped) vocabAll.orderBy(desc("gc"), col("token")).limit(maxVocab) else vocabAll
    val byGrp =
      if (capped) byGrpAll.join(broadcast(vocab.select("token")), Seq("token"), "left_semi")
      else byGrpAll
    val grid = grpN.crossJoin(broadcast(vocab)).crossJoin(broadcast(gN))
      .join(byGrp, Seq("grp", "token"), "left")
      .select(col("grp"), col("n"), coalesce(col("c"), lit(0L)).as("c"), col("gc"), col("gn"))
    val rows =
      if (!capped) grid
      else {
        // OOV residual bucket: per-group leftover count vs the global
        // leftover mass. If nothing is OOV globally, every group's
        // residual is 0 too and the bucket contributes nothing.
        val invByGrp = byGrp.groupBy("grp").agg(sum(col("c")).as("inv"))
        val vSum     = vocab.agg(sum(col("gc")).as("vs"))
        val oov = grpN.join(invByGrp, Seq("grp"), "left")
          .crossJoin(broadcast(vSum)).crossJoin(broadcast(gN))
          .select(col("grp"), col("n"),
            (col("n") - coalesce(col("inv"), lit(0L))).as("c"),
            (col("gn") - col("vs")).as("gc"), col("gn"))
        grid.unionByName(oov)
      }
    rows
      .withColumn("p", col("c").cast(DoubleType) / col("n").cast(DoubleType))
      .withColumn("q", col("gc").cast(DoubleType) / col("gn").cast(DoubleType))
      .withColumn("m", (col("p") + col("q")) / 2.0)
      .groupBy(col("grp"))
      .agg(
        round(sum(when(col("p") > 0.0, col("p") * ln(col("p") / col("q"))).otherwise(0.0)), 6).as("kl"),
        round(sum(when(col("p") > 0.0, col("p") * ln(col("p") / col("m"))).otherwise(0.0)) / 2.0 +
          sum(when(col("q") > 0.0, col("q") * ln(col("q") / col("m"))).otherwise(0.0)) / 2.0, 6).as("js"))
  }

  /** Per-group token-distribution Shannon entropy (nats) plus the
    * normalized form H/ln(vocab) ∈ [0,1] — the corpus-health twin of
    * [[sourceDivergence]]: low entropy flags template/boilerplate
    * sources, saturated entropy flags near-random text.
    *
    * Scale shape (same as sourceDivergence's count leg): map-side
    * explode → ONE partial-agg (group, token) count shuffle → per-group
    * O(vocab) sum. No broadcast of the vocabulary, no grid — entropy
    * only needs each group's own counts, so the capped-vocab machinery
    * is unnecessary here.
    */
  def tokenEntropy(docs: org.apache.spark.sql.DataFrame, text: String,
      group: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{count, sum, log => ln}
    docs.select(col(group).as("grp"), explode(tokens(col(text))).as("token"))
      .groupBy("grp", "token").agg(count(lit(1)).as("c"))
      .groupBy("grp")
      .agg(
        sum(col("c")).as("n_tokens"),
        // rows are unique per (grp, token) here, so a plain count IS the
        // vocabulary size — no distinct machinery
        count(lit(1)).as("vocab"),
        sum(col("c").cast(DoubleType) * ln(col("c").cast(DoubleType))).as("sclnc"))
      .select(col("grp"), col("n_tokens"), col("vocab"),
        // H = ln n − (Σ c ln c)/n, algebraically −Σ p ln p but with one
        // pass over counts (no per-term division before the sum)
        round(ln(col("n_tokens").cast(DoubleType)) -
          col("sclnc") / col("n_tokens").cast(DoubleType), 6).as("entropy"),
        round(when(col("vocab") > 1,
          (ln(col("n_tokens").cast(DoubleType)) -
            col("sclnc") / col("n_tokens").cast(DoubleType)) /
            ln(col("vocab").cast(DoubleType))).otherwise(0.0), 6).as("norm_entropy"))
  }

  /** C4-style page heuristics (Raffel et al. 2020 §2.2), per document:
    * line counts, the fraction of lines that are "keepable" (≥ 5 words
    * AND terminal punctuation — C4 keeps only such lines), boilerplate
    * flags (lorem ipsum / curly brace / "javascript"), and the page
    * keep decision (≥ 3 keepable lines, no boilerplate flags).
    *
    * Scale shape: ENTIRELY map-side — split + HOF filters over the
    * line array, no explode, no shuffle; at 100 TB this is another
    * scan-speed leg of the quality-filter pass. The line array is
    * projected once (bound attribute) so the interpreted lambda never
    * re-splits per probe.
    */
  def c4Stats(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String): org.apache.spark.sql.DataFrame = {
    val lower = org.apache.spark.sql.functions.lower(col(text))
    docs.select(col(id), lower.as("__lo"),
        split(col(text), "\n").as("__lines"))
      .withColumn("__keep_lines", filter(col("__lines"), l =>
        (size(split(trim(l), "\\s+")) >= 5) &&
          regexp_like(trim(l), lit("[.!?\"]$"))))
      .select(col(id),
        size(col("__lines")).cast(LongType).as("n_lines"),
        size(col("__keep_lines")).cast(LongType).as("n_kept_lines"),
        round(size(col("__keep_lines")).cast(DoubleType) /
          size(col("__lines")).cast(DoubleType), 6).as("kept_line_frac"),
        col("__lo").contains("lorem ipsum").as("has_lorem"),
        col("__lo").contains("{").as("has_brace"),
        col("__lo").contains("javascript").as("has_javascript"),
        (size(col("__keep_lines")) >= 3 &&
          !col("__lo").contains("lorem ipsum") &&
          !col("__lo").contains("{") &&
          !col("__lo").contains("javascript")).as("keep"))
  }

  /** Corpus bigram PMI (pointwise mutual information): for each
    * adjacent token pair, ln( p(ab) / (p(a)·p(b)) ) — the standard
    * collocation statistic (Church & Hanks 1990) used to mine
    * multi-word expressions for tokenizer vocabularies and to spot
    * templated/boilerplate phrasing (pathologically high PMI).
    * Returns the `topK` bigrams by count with their PMI, count, and
    * the two unigram counts.
    *
    * Scale shape: one explode for bigram counts + one for unigram
    * counts, both partial-aggregated map-side before their O(vocab)
    * shuffles. The unigram joins BROADCAST THE topK SIDE and stream
    * the vocabulary (the vocabulary is unbounded at corpus scale —
    * broadcasting it is the driver-OOM pattern); the two count frames
    * persist for the duration of the call (totals + top-K + joins all
    * read them), the O(topK) result materializes eagerly, and the
    * caches release before returning.
    */
  def bigramPmi(docs: org.apache.spark.sql.DataFrame, text: String,
      topK: Int = 50, minCount: Long = 2L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count, desc, sum, log => ln}
    val toks = docs.select(tokens(col(text)).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
      .persist()
    val bic = toks.select(explode(shinglesAll(col("toks"), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minCount)
      .persist()
    try {
      val uniN = uni.agg(sum(col("cw")).cast(DoubleType).as("nu"))
      val biN  = bic.agg(sum(col("cab")).cast(DoubleType).as("nb"))
      val top = bic.orderBy(desc("cab"), col("gram")).limit(topK)
        .withColumn("w1", split(col("gram"), " ").getItem(0))
        .withColumn("w2", split(col("gram"), " ").getItem(1))
      val withC1 = uni.select(col("w").as("w1"), col("cw").as("c1"))
        .join(broadcast(top), Seq("w1"))
      val withC2 = uni.select(col("w").as("w2"), col("cw").as("c2"))
        .join(broadcast(withC1), Seq("w2"))
      withC2
        .crossJoin(broadcast(uniN)).crossJoin(broadcast(biN))
        .select(col("gram"), col("cab"), col("c1"), col("c2"),
          round(ln((col("cab").cast(DoubleType) / col("nb")) /
            ((col("c1").cast(DoubleType) / col("nu")) *
              (col("c2").cast(DoubleType) / col("nu")))), 6).as("pmi"))
        .orderBy(desc("cab"), col("gram"))
        .localCheckpoint(true)
    } finally { uni.unpersist(false); bic.unpersist(false) }
  }

  /** Per-document top-k TF-IDF terms: tf = in-doc term count, idf =
    * ln(N / df) over per-doc-deduped document frequency — the
    * classic salient-term extraction behind keyword indexing and
    * topic drift monitoring.
    *
    * Scale shape: term counts partial-aggregate before the one
    * (doc, term)-keyed shuffle; the O(vocab) document-frequency frame
    * joins back on the term WITHOUT a broadcast hint — the vocabulary
    * is unbounded at corpus scale (AQE still broadcasts it when it
    * measures small); the per-doc ranking window partitions by the
    * doc id (high cardinality — thousands of small partitions, never
    * a funnel). Ties break on the term for determinism.
    */
  def tfIdfTopTerms(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, count, row_number, desc, log => ln}
    val tf = docs.select(col(id).as("id"), explode(tokens(col(text))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df")) // tf rows are per-doc-distinct
    val n = docs.agg(count(lit(1)).cast(DoubleType).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf").cast(DoubleType) * ln(col("n_docs") / col("df").cast(DoubleType)), 6))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(desc("tfidf"), col("term"))))
      .filter(col("rk") <= k)
      .select(col("id"), col("rk"), col("term"), col("tfidf"))
  }

  /** Canonical md5 fingerprint (content-addressed dedup key). */
  def fingerprintMd5(text: Column): Column = md5(normalized(text))

  /** 64-bit rolling fingerprint over tokens:
    * f = fold(h, tok => xxhash64(h, tok)) — an order-sensitive cousin
    * of the md5 digest (detects reordering). Hash-chaining instead of
    * a multiply-add polynomial so ANSI mode can't overflow.
    * Not SQL-expressible → spec-tested.
    */
  def fingerprintRolling(text: Column): Column =
    aggregate(tokens(text), lit(-3750763034362895579L),
      (acc, t) => xxhash64(acc, t))

  /** PII redaction: emails → `<EMAIL>`, IPv4 literals → `<IP>`.
    * Pure codegen'd regexp_replace chain — map-side, no shuffle, and
    * the patterns stay in the portable regex subset both the JVM and
    * RE2-based engines (the DuckDB oracle) interpret identically.
    * The standard scrub pass before text lands in a training corpus.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>")),
      lit("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"), lit("<IP>"))

  /** Hashing-trick featurizer (feature hashing / "the hashing
    * vectorizer"): fixed `dims`-dim token-count vector per doc, token
    * → bucket by salted hash — no vocabulary build, no global state,
    * the standard way to featurize an unbounded token space at corpus
    * scale. One partial-agg shuffle to (id, bucket) counts, dense
    * assembly map-side from the ≤ dims entries per doc. Deterministic
    * in (token, salt, dims).
    */
  def featureHash(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String, dims: Int = 64,
      salt: String = "fh-v1"): org.apache.spark.sql.DataFrame = {
    require(dims > 0, s"dims must be > 0: $dims")
    docs.select(col(id).as("id"), explode(tokens(col(text))).as("token"))
      .withColumn("b", pmod(xxhash64(col("token"), lit(salt)), lit(dims.toLong)))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c")))).as("m"),
        sum(col("c")).as("n_tokens"), count(lit(1)).as("nnz"))
      .select(col("id"),
        transform(sequence(lit(0L), lit((dims - 1).toLong)),
          i => coalesce(element_at(col("m"), i), lit(0L))).as("vec"),
        col("n_tokens"), col("nnz"))
  }

  /** Multinomial Naive Bayes classifier, trained and scored in one
    * pass over the corpus — the fastText/CCNet-style label model a
    * curation pipeline uses to score documents (here: language, the
    * table's labeled column). Laplace-smoothed per-class token
    * log-likelihoods ln((C+1)/(T+V)) plus a class prior; tokens
    * outside the (optionally capped) vocabulary fall back to the
    * class's zero-count likelihood. Returns (id, actual, predicted).
    *
    * Scale shape: token partial-agg shuffles build the model; the
    * model itself is a broadcast bounded by `topK` (0 = full vocab —
    * exact, for the oracle; at 100 TB cap it like unigramLogProb);
    * scoring is a map-side broadcast join over the per-doc token
    * counts and one per-doc shuffle.
    *
    * Determinism: per-token score contributions are quantized to
    * integer 1e-9 units via floor(x·1e9 + 0.5), so per-(doc, class)
    * sums are exact BIGINTs (order-independent) and the argmax
    * (score desc, class asc on ties) is stable cross-engine — a raw
    * double score sum would be partition-order-dependent.
    */
  def naiveBayes(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String, labelCol: String,
      topK: Int = 0): org.apache.spark.sql.DataFrame = {
    val dt = docs
      .select(col(id).as("id"), col(labelCol).as("actual"),
        explode(tokens(col(text))).as("token"))
      .groupBy(col("id"), col("actual"), col("token"))
      .agg(count(lit(1)).as("c"))
      .persist() // consumed by the model build AND the scoring join
    val classCnt = dt.groupBy(col("actual").as("mcls"), col("token"))
      .agg(sum(col("c")).as("cnt"))
      .persist() // vocab, totals, and the model read it
    try {
    val vocabAll = classCnt.groupBy(col("token"))
      .agg(sum(col("cnt")).as("gcnt"))
    val vocab = if (topK > 0)
      vocabAll.orderBy(desc("gcnt"), col("token")).limit(topK) else vocabAll
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val clsStats = classCnt.groupBy(col("mcls")).agg(sum(col("cnt")).as("t"))
      .join(docs.groupBy(col(labelCol).as("mcls")).agg(count(lit(1)).as("ndocs")), "mcls")
      .crossJoin(broadcast(vSize)).crossJoin(broadcast(nDocs))
      .select(col("mcls"), col("t"), col("v"),
        floor(log(col("ndocs").cast(DoubleType) / col("n").cast(DoubleType)) * lit(1.0e9) + lit(0.5))
          .as("prior_u"),
        log(lit(1.0) / (col("t") + col("v")).cast(DoubleType)).as("oov"))
    val model = classCnt.join(vocab.select("token"), Seq("token"), "left_semi")
      .join(broadcast(clsStats.select(col("mcls"), col("t"), col("v"))), "mcls")
      .select(col("mcls"), col("token"),
        log((col("cnt") + 1).cast(DoubleType) / (col("t") + col("v")).cast(DoubleType)).as("lnp"))
    dt.crossJoin(broadcast(clsStats.select(col("mcls"), col("prior_u"), col("oov"))))
      .join(broadcast(model), Seq("mcls", "token"), "left")
      .withColumn("u",
        floor((col("c").cast(DoubleType) * coalesce(col("lnp"), col("oov"))) * lit(1.0e9) + lit(0.5)))
      .groupBy(col("id"), col("actual"), col("mcls"))
      .agg((sum(col("u")) + max(col("prior_u"))).as("score_u"))
      .groupBy(col("id"), col("actual"))
      .agg(min(struct((-col("score_u")).as("neg"), col("mcls").as("p"))).as("m"))
      .select(col("id"), col("actual"), col("m.p").as("predicted"))
      // materialize before releasing the two shared count caches
      .localCheckpoint(true)
    } finally { dt.unpersist(false); classCnt.unpersist(false) }
  }

  /** Mutual information I(token-presence; label) per token over the
    * 2×L document-level contingency table — supervised feature
    * selection (the chi-square/MI filter of a classification
    * pipeline). Returns (token, mi_units, mi) for the top `limit`
    * tokens by MI, ties toward the lexicographically smaller token.
    *
    * Scale shape: one distinct-presence partial agg (doc, label,
    * token), one (token, label) count shuffle, the L-row label frame
    * broadcast onto the token grid, a per-token sum, and a bounded
    * TakeOrdered top-`limit` — no full sort, no driver loop.
    *
    * Determinism: each of the 2L cell contributions is quantized to
    * integer 1e-12 nat units (floor(x·1e12 + 0.5)); per-token sums
    * are exact BIGINTs, so ranking and ties are stable cross-engine.
    */
  def miFeatures(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String, labelCol: String,
      limit: Int = 50): org.apache.spark.sql.DataFrame = {
    val D = DoubleType
    val pres = docs
      .select(col(id).as("id"), col(labelCol).as("lbl"),
        explode(tokens(col(text))).as("token"))
      .distinct()
      .groupBy(col("token"), col("lbl")).agg(count(lit(1)).as("njl"))
    val nj = pres.groupBy(col("token")).agg(sum(col("njl")).as("nj"))
    val nl = docs.groupBy(col(labelCol).as("lbl")).agg(count(lit(1)).as("nl"))
    val nn = docs.agg(count(lit(1)).as("n"))
    val grid = nj.crossJoin(broadcast(nl)).crossJoin(broadcast(nn))
      .join(pres, Seq("token", "lbl"), "left")
      .withColumn("njl", coalesce(col("njl"), lit(0L)))
    val presentCell = when(col("njl") > 0,
      (col("njl").cast(D) / col("n").cast(D)) *
        log(col("njl").cast(D) * col("n").cast(D) /
          (col("nj").cast(D) * col("nl").cast(D)))).otherwise(lit(0.0))
    val absentCell = when((col("nl") - col("njl")) > 0 && (col("n") - col("nj")) > 0,
      ((col("nl") - col("njl")).cast(D) / col("n").cast(D)) *
        log((col("nl") - col("njl")).cast(D) * col("n").cast(D) /
          ((col("n") - col("nj")).cast(D) * col("nl").cast(D)))).otherwise(lit(0.0))
    grid
      .withColumn("u",
        floor(presentCell * lit(1.0e12) + lit(0.5)) +
          floor(absentCell * lit(1.0e12) + lit(0.5)))
      .groupBy(col("token")).agg(sum(col("u")).as("mi_units"))
      .select(col("token"), col("mi_units"),
        (col("mi_units").cast(D) / lit(1.0e12)).as("mi"))
      .orderBy(desc("mi_units"), col("token"))
      .limit(limit)
  }

  /** DSIR-style importance score: per-doc mean log-likelihood RATIO
    * between a target-domain unigram LM and the whole-corpus base LM —
    * ln p_target(doc) − ln p_base(doc), length-normalized. Docs scoring
    * high look like the target domain; selecting the top-N is data
    * selection by importance resampling (Xie et al.'s DSIR recipe with
    * unigram features). Both LMs use the 1/N count floor for
    * out-of-vocabulary tokens (the [[unigramLogProb]] convention).
    *
    * Scale shape: both vocabularies are bounded aggregations (cap with
    * `topK` at 100 TB so the broadcast model stays small; 0 = exact for
    * the oracle); per-doc term counts partial-aggregate before one
    * (doc, token) shuffle; both LM joins broadcast.
    */
  def dsirScore(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String, isTarget: Column,
      topK: Int = 0): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, count, lit, log, sum, round => rnd, coalesce, desc}
    val tok = docs.select(col(id).as("id"), isTarget.as("tgt"),
      explode(tokens(col(text))).as("token"))
    def lm(t: org.apache.spark.sql.DataFrame) = {
      val vAll = t.groupBy("token").agg(count(lit(1)).as("cnt"))
      if (topK > 0) vAll.orderBy(desc("cnt"), col("token")).limit(topK) else vAll
    }
    val baseV = lm(tok)
    val tgtV  = lm(tok.filter(col("tgt")))
    val baseN = tok.agg(count(lit(1)).cast(DoubleType).as("bn"))
    val tgtN  = tok.filter(col("tgt")).agg(count(lit(1)).cast(DoubleType).as("tn"))
    tok.groupBy(col("id"), col("token")).agg(count(lit(1)).as("c"))
      .join(broadcast(baseV.withColumnRenamed("cnt", "bcnt")), Seq("token"), "left")
      .join(broadcast(tgtV.withColumnRenamed("cnt", "tcnt")), Seq("token"), "left")
      .crossJoin(broadcast(baseN)).crossJoin(broadcast(tgtN))
      .withColumn("llr",
        log(coalesce(col("tcnt").cast(DoubleType), lit(1.0)) / col("tn")) -
          log(coalesce(col("bcnt").cast(DoubleType), lit(1.0)) / col("bn")))
      .groupBy("id")
      .agg(rnd(sum(col("c") * col("llr")) / sum(col("c")), 6).as("dsir_score"))
  }

  /** Per-source Zipf rank-frequency slope: OLS of ln(freq) on ln(rank)
    * over each source's head vocabulary — natural corpora track slope
    * ≈ −1 (Zipf's law), so per-source deviation is a cheap synthetic-
    * text / template-spam signal alongside [[sourceDivergence]].
    *
    * Scale shape: token counting is the usual partial-agg shuffle; the
    * ranking window runs on the COLLAPSED (source, token, cnt) frame
    * already thinned by `minCount` (at 100 TB the head vocabulary a
    * frequency floor keeps is orders of magnitude below the corpus),
    * and only the top `topK` ranks enter the regression. ln values
    * quantize to 1e6 units so the OLS moment sums are exact BIGINTs;
    * the closed-form slope combines them in DECIMAL(38,0) (n·Σxy
    * overflows a raw 64-bit long at topK=500).
    */
  def zipfSlope(docs: org.apache.spark.sql.DataFrame, source: String,
      text: String, minCount: Long = 5L,
      topK: Int = 500): org.apache.spark.sql.DataFrame = {
    require(topK >= 3, s"topK must be >= 3: $topK")
    val cnts = docs
      .select(col(source).as("src"), explode(tokens(col(text))).as("token"))
      .groupBy(col("src"), col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(desc("cnt"), col("token"))
    val D38 = DecimalType(38, 0)
    val ranked = cnts.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= topK)
      .select(col("src"),
        floor(log(col("rank").cast(DoubleType)) * 1.0e6 + 0.5).cast(LongType).as("xu"),
        floor(log(col("cnt").cast(DoubleType)) * 1.0e6 + 0.5).cast(LongType).as("yu"))
    ranked.groupBy(col("src"))
      .agg(count(lit(1)).as("n"), sum(col("xu")).as("sx"), sum(col("yu")).as("sy"),
        sum(col("xu") * col("yu")).as("sxy"), sum(col("xu") * col("xu")).as("sxx"))
      .select(col("src").as("source"), col("n"),
        round((col("n").cast(D38) * col("sxy").cast(D38) -
            col("sx").cast(D38) * col("sy").cast(D38)).cast(DoubleType) /
          (col("n").cast(D38) * col("sxx").cast(D38) -
            col("sx").cast(D38) * col("sx").cast(D38)).cast(DoubleType), 6)
          .as("zipf_slope"))
      .orderBy(col("source"))
  }
}
