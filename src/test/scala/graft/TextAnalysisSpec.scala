package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("text")
  }

  test("tokens normalizes whitespace and case") {
    val r = one("  The  QUICK\tbrown\n fox ")
      .select(TextAnalysis.tokens(col("text"))).collect().head.getSeq[String](0)
    assert(r == Seq("the", "quick", "brown", "fox"))
  }

  test("tokenCount and pieceCount") {
    val r = one("Hello, world! 42x")
      .select(TextAnalysis.tokenCount(col("text")), TextAnalysis.pieceCount(col("text")))
      .collect().head
    assert(r.getLong(0) == 3L)
    // pieces: hello , world ! 42 x  → 6
    assert(r.getLong(1) == 6L)
  }

  test("punctRatio in [0,1], 0 for empty") {
    val r = one("ab,.").select(TextAnalysis.punctRatio(col("text"))).collect().head.getDouble(0)
    assert(math.abs(r - 0.5) < 1e-9)
    val e = one("").select(TextAnalysis.punctRatio(col("text"))).collect().head.getDouble(0)
    assert(e == 0.0)
  }

  test("qualityScore bounded and monotone in stopword presence") {
    import spark.implicits._
    val df = Seq(("the cat sat on the mat", 22L), ("zzz qqq xxx", 11L))
      .toDF("text", "n_chars")
      .select(TextAnalysis.qualityScore(col("text"), col("n_chars")).as("q"))
    val Array(a, b) = df.collect().map(_.getDouble(0))
    assert(a >= 0.0 && a <= 1.0 && b >= 0.0 && b <= 1.0)
    assert(a > b)
  }

  test("langId classifies real multilingual snippets") {
    import spark.implicits._
    val snippets = Seq(
      ("en", "The quick brown fox jumps over the lazy dog and runs to the forest with great speed"),
      ("en", "It was the best of times, it was the worst of times, it was the age of wisdom"),
      ("fr", "Je ne sais pas pour quoi vous avez fait cela mais c'est une belle surprise pour nous"),
      ("fr", "Le petit prince est un livre qui parle des étoiles et du renard dans le désert"),
      ("es", "El perro corre por el parque con los niños pero no quiere volver a su casa"),
      ("es", "La vida es muy corta para perder el tiempo sin hacer lo que importa de verdad"),
      ("de", "Der schnelle braune Fuchs springt über den faulen Hund und läuft in den Wald"),
      ("de", "Das ist eine sehr gute Idee und wir werden sie nicht vergessen bei der Arbeit"),
      ("zh", "敏捷的棕色狐狸跳过了懒惰的狗 它跑向森林"),
      ("und", "xyzzy plugh foobar qux 12345"))
    val out = snippets.toDF("expected", "text")
      .select(col("expected"), TextAnalysis.langId(col("text")).as("predicted"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (expected, predicted) =>
      assert(predicted == expected, s"expected $expected got $predicted")
    }
  }

  test("unigramLogProb: common-word docs score higher; topK OOV floor applies") {
    import spark.implicits._
    // "the" dominates the corpus; doc 2 is all rare tokens
    val docs = Seq(
      (1L, "the the the the the"),
      (2L, "zeta omicron floccinaucinihilipilification qux corge"),
      (3L, "the the zeta the the")).toDF("doc_id", "text")
    val full = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(full(1L) > full(3L) && full(3L) > full(2L),
      s"common-word docs must score higher: $full")
    // topK=1 keeps only "the"; every other token takes the 1/N floor
    val capped = TextAnalysis.unigramLogProb(docs, "doc_id", "text", topK = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 15.0 // total tokens
    assert(math.abs(capped(2L) - math.log(1.0 / n)) < 1e-6, "pure-OOV doc sits at the floor")
    assert(capped(1L) > capped(2L))
  }

  test("bm25 ranks term-dense docs higher; rare terms weigh more; non-matches absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "data data data filler filler filler"),
      (2L, "data filler filler filler filler filler"),
      (3L, "rareterm filler filler filler filler filler"),
      (4L, "filler filler filler filler filler filler")).toDF("doc_id", "text")
    val scores = TextAnalysis.bm25(docs, "doc_id", "text", Seq("data", "rareterm"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!scores.contains(4L), "docs matching no term don't appear")
    assert(scores(1L) > scores(2L), "higher tf ranks higher at equal length")
    assert(scores(3L) > scores(2L), "a rarer term (df=1) outweighs a common one (df=2)")
  }

  test("fingerprintMd5 is whitespace/case canonical") {
    import spark.implicits._
    val df = Seq("A  b\tC", "a b c", "a b d").toDF("text")
      .select(TextAnalysis.fingerprintMd5(col("text")).as("f"))
    val Array(x, y, z) = df.collect().map(_.getString(0))
    assert(x == y && x != z)
  }

  test("redactPii scrubs emails and IPv4 literals, leaves clean text alone") {
    import spark.implicits._
    val out = Seq(
      "mail me at jane.doe+x@sub.example.co.uk today",
      "server 192.168.1.254 and 10.0.0.1 are up",
      "nothing sensitive here 1.2 or v1.2.3").toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "server <IP> and <IP> are up")
    assert(out(2) == "nothing sensitive here 1.2 or v1.2.3")
  }

  test("unicode_normalize: NFC unifies composed and decomposed codepoints") {
    import spark.implicits._
    import graft.functions.text
    val composed = "caf\u00e9"       // e-acute as one codepoint
    val decomposed = "cafe\u0301"   // e + combining acute
    val out = Seq(composed, decomposed).toDF("t")
      .select(text.unicodeNormalize(col("t"), "NFC").as("n"))
      .collect().map(_.getString(0))
    assert(out(0) == out(1))
    assert(out(0) == composed)
    // and their dedup hashes now agree
    val hashes = Seq(composed, decomposed).toDF("t")
      .select(md5(text.unicodeNormalize(col("t")).cast("binary")))
      .collect().map(_.getString(0))
    assert(hashes(0) == hashes(1))
  }

  test("unicode_normalize: NFKC folds ligatures and full-width forms, NFC keeps them") {
    import spark.implicits._
    import graft.functions.text
    // U+FB01 (fi ligature), U+FF41-43 (full-width abc)
    val raw = "\ufb01le \uff41\uff42\uff43"
    val df = Seq(raw).toDF("t")
    val nfkc = df.select(text.unicodeNormalize(col("t"), "NFKC")).head().getString(0)
    val nfc = df.select(text.unicodeNormalize(col("t"), "NFC")).head().getString(0)
    assert(nfkc == "file abc")
    assert(nfc == raw)
  }

  test("unicode_normalize: null-safe and SQL-registered") {
    import spark.implicits._
    val out = Seq(Some("caf\u00e9"), None).toDF("t")
      .selectExpr("unicode_normalize(t, 'NFC') AS n")
      .collect()
    assert(out(0).getString(0) == "caf\u00e9")
    assert(out(1).isNullAt(0))
  }

  test("repetitionStats: hand-computed values on crafted docs") {
    import spark.implicits._
    val docs = Seq(
      // 1: "a b a b a b" \u2014 6 tokens {a,b}, bigrams: [a b, b a, a b, b a, a b]
      //    top bigram "a b" \u00d73 \u2192 6/6=1.0; trigrams 4, distinct 2 \u2192 dup 0.5
      (1L, "a b a b a b"),
      // 2: all distinct tokens, no repeated grams
      (2L, "one two three four five"),
      // 3: single token \u2014 no bigrams/trigrams, dup_token 0
      (3L, "solo"),
      // 4: same token \u00d74 \u2014 dup_token 0.75; overlapping runs ("x x" \u00d73,
      //    2*3/4 = 1.5) cap to 1.0 \u2014 the column is a fraction of tokens
      (4L, "x x x x")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val d1 = r(0)
    assert(d1.getLong(1) == 6L)
    assert(math.abs(d1.getDouble(2) - (1.0 - 2.0 / 6.0)) < 1e-6)
    assert(math.abs(d1.getDouble(3) - 1.0) < 1e-6)       // 3*2/6
    assert(math.abs(d1.getDouble(4) - 0.5) < 1e-6)       // 4 tri, 2 distinct
    val d2 = r(1)
    assert(d2.getDouble(2) == 0.0 && d2.getDouble(4) == 0.0)
    assert(math.abs(d2.getDouble(3) - 2.0 / 5.0) < 1e-6) // all bigrams \u00d71
    val d3 = r(2)
    assert(d3.getLong(1) == 1L && d3.getDouble(3) == 0.0 && d3.getDouble(4) == 0.0)
    val d4 = r(3)
    assert(math.abs(d4.getDouble(2) - 0.75) < 1e-6)
    assert(math.abs(d4.getDouble(3) - 1.0) < 1e-6)       // 2*3/4 = 1.5, capped at 1.0
    assert(math.abs(d4.getDouble(4) - 0.5) < 1e-6)       // 2 tri, 1 distinct
  }

  test("maxRunLength finds the longest equal-run of a sorted array") {
    import spark.implicits._
    val r = Seq(Tuple1(Seq("a", "a", "b", "b", "b", "c")), Tuple1(Seq("z")), Tuple1(Seq.empty[String]))
      .toDF("arr")
      .select(TextAnalysis.maxRunLength(col("arr"))).collect()
    assert(r(0).getLong(0) == 3L)
    assert(r(1).getLong(0) == 1L)
    assert(r(2).getLong(0) == 0L)
  }

  test("sourceDivergence: zero for identical distributions, bounded JS, KL \u2265 JS-consistent") {
    import spark.implicits._
    // two groups with IDENTICAL token distributions \u2192 kl = js = 0
    val same = Seq(("g1", "a b c"), ("g2", "a b c")).toDF("source", "text")
    val r0 = TextAnalysis.sourceDivergence(same, "text", "source").collect()
    assert(r0.forall(row => math.abs(row.getDouble(1)) < 1e-9 && math.abs(row.getDouble(2)) < 1e-9))
    // disjoint vocabularies \u2192 maximal drift: js near its per-group bound, kl > 0
    val disj = Seq(("g1", "a a a"), ("g2", "b b b")).toDF("source", "text")
    val r1 = TextAnalysis.sourceDivergence(disj, "text", "source").collect()
    r1.foreach { row =>
      assert(row.getDouble(1) > 0.0)                      // kl
      assert(row.getDouble(2) > 0.0 && row.getDouble(2) <= math.log(2.0) + 1e-9) // js \u2208 (0, ln2]
    }
  }

  test("sourceDivergence: bounded vocab + OOV bucket stays close to exact on a long tail") {
    import spark.implicits._
    // Long-tail corpus: a few hot tokens carry most mass, a large tail
    // of singletons. g2 drifts on the hot tokens, so the capped form
    // (which keeps the hot tokens and collapses the tail into one OOV
    // bucket) must land near the exact divergence.
    val docs = (
      (1 to 60).map(i => ("g1", s"hot$i common common common shared")) ++
      (1 to 60).map(i => ("g2", s"tail$i rare rare shared shared"))
    ).toDF("source", "text")
    val exact  = TextAnalysis.sourceDivergence(docs, "text", "source", maxVocab = 0)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val capped = TextAnalysis.sourceDivergence(docs, "text", "source", maxVocab = 6)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(capped.keySet == exact.keySet)
    capped.foreach { case (g, (kl, js)) =>
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9, s"$g capped js out of range: $js")
      assert(kl >= -1e-9, s"$g capped kl negative: $kl")
      // collapsing the tail into one bucket loses only within-tail
      // detail: the hot-token drift dominates, so capped ≈ exact
      assert(math.abs(js - exact(g)._2) < 0.08,
        s"$g: capped js $js vs exact ${exact(g)._2}")
    }
    // identical distributions stay at 0 even when capped (residual
    // masses match too)
    val same = Seq(("g1", "a b c d e f g h"), ("g2", "a b c d e f g h")).toDF("source", "text")
    val r = TextAnalysis.sourceDivergence(same, "text", "source", maxVocab = 3).collect()
    assert(r.forall(row => math.abs(row.getDouble(1)) < 1e-9 && math.abs(row.getDouble(2)) < 1e-9))
  }

  test("c4Stats: keeps a clean multi-line page, flags boilerplate pages") {
    import spark.implicits._
    val clean = Seq(
      "The quick brown fox jumped over the lazy dog today.",
      "It was a bright cold day in April and the clocks were striking.",
      "Every good sentence in this page ends with proper punctuation marks.").mkString("\n")
    val boiler = Seq(
      "function init() { return 42; }",
      "Enable JavaScript to view this page properly and completely.",
      "Lorem ipsum dolor sit amet consectetur adipiscing elit sed do.").mkString("\n")
    val shortLines = Seq("Buy now.", "Click here!", "Sale today.").mkString("\n")
    val df = Seq((1L, clean), (2L, boiler), (3L, shortLines)).toDF("doc_id", "text")
    val r = TextAnalysis.c4Stats(df, "doc_id", "text")
      .collect().map(row => row.getAs[Long]("doc_id") -> row).toMap
    assert(r(1L).getAs[Long]("n_lines") == 3L)
    assert(r(1L).getAs[Long]("n_kept_lines") == 3L)
    assert(r(1L).getAs[Boolean]("keep"))
    assert(r(2L).getAs[Boolean]("has_brace"))
    assert(r(2L).getAs[Boolean]("has_javascript"))
    assert(r(2L).getAs[Boolean]("has_lorem"))
    assert(!r(2L).getAs[Boolean]("keep"))
    // short lines (< 5 words) are not keepable even with terminal punctuation
    assert(r(3L).getAs[Long]("n_kept_lines") == 0L)
    assert(!r(3L).getAs[Boolean]("keep"))
  }

  test("compressRatio: repetition compresses below prose, prose below noise; deterministic") {
    import spark.implicits._
    val repetitive = "lorem ipsum " * 400
    val prose = "The five boxing wizards jump quickly over a lazy dog while " +
      "seventy jovial zookeepers quietly mixed bright vats of liquid oxygen. " * 20
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(4800)((rnd.nextInt(94) + 33).toChar).mkString
    val df = Seq(("rep", repetitive), ("prose", prose), ("noise", noise), ("empty", ""))
      .toDF("k", "text")
      .select(col("k"), graft.functions.text.compressRatio(col("text")).as("r"))
    val r = df.collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(r("rep") < 0.1, s"repeated phrase must collapse: ${r("rep")}")
    assert(r("rep") < r("prose") && r("prose") < r("noise"),
      s"ordering rep < prose < noise: $r")
    assert(r("prose") < 0.9 && r("noise") > 0.8, s"bands: $r")
    assert(r("empty") == 1.0, "empty text is defined as ratio 1")
    val again = df.collect().map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(again == r, "deterministic under re-evaluation")
  }

  test("featureHash: Σvec equals token count, fixed dims, deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox the end"), (2L, "a b a b a"),
      (3L, "")).toDF("doc_id", "text")
    def run() = TextAnalysis.featureHash(docs, "doc_id", "text", dims = 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val rows = run()
    rows.foreach { case (id, vec, nTok, nnz) =>
      assert(vec.length == 8, s"doc $id: fixed dimensionality")
      assert(vec.sum == nTok, s"doc $id: vector mass must equal the token count")
      assert(vec.count(_ > 0) == nnz && nnz <= 8, s"doc $id: nnz consistent")
    }
    assert(rows.find(_._1 == 1L).get._3 == 6L)
    assert(rows.find(_._1 == 2L).get._3 == 5L)
    // "a b a b a" has 2 distinct tokens → at most 2 buckets hit
    assert(rows.find(_._1 == 2L).get._4 <= 2)
    assert(run().toSeq == rows.toSeq, "deterministic under re-run")
  }

  test("compressSize/NCD: identity near 0, unrelated near 1, symmetric, ratio consistent") {
    import spark.implicits._
    val prose = "The five boxing wizards jump quickly over a lazy dog while " +
      "seventy jovial zookeepers quietly mixed bright vats of liquid oxygen. " * 10
    val rnd = new scala.util.Random(7)
    val noise = Array.fill(2400)((rnd.nextInt(94) + 33).toChar).mkString
    def ncd(a: String, b: String): Double = {
      val r = Seq((a, b)).toDF("a", "b").select(
        graft.functions.text.compressSize(col("a")).as("ca"),
        graft.functions.text.compressSize(col("b")).as("cb"),
        graft.functions.text.compressSize(concat(col("a"), lit(" "), col("b"))).as("cab"))
        .collect()(0)
      (r.getLong(2) - math.min(r.getLong(0), r.getLong(1))).toDouble /
        math.max(r.getLong(0), r.getLong(1))
    }
    assert(ncd(prose, prose) < 0.1, "self-NCD must be near zero")
    assert(ncd(prose, noise) > 0.7, "incompressible unrelated text lands near 1")
    assert(math.abs(ncd(prose, noise) - ncd(noise, prose)) < 0.1, "roughly symmetric")
    // size and ratio expressions agree: ratio = size / octet_length
    val chk = Seq(prose).toDF("t").select(
      graft.functions.text.compressSize(col("t")).as("s"),
      graft.functions.text.compressRatio(col("t")).as("r"),
      octet_length(col("t")).as("n")).collect()(0)
    assert(math.abs(chk.getLong(0).toDouble / chk.getInt(2) - chk.getDouble(1)) < 1e-12)
  }

  test("compressRatio: null-safe and codegen/eval agree") {
    import spark.implicits._
    val df = Seq(Some("abc abc abc abc"), None).toDF("text")
    val rows = df.select(graft.functions.text.compressRatio(col("text")).as("r")).collect()
    assert(rows(1).isNullAt(0), "null in, null out")
    val viaEval = graft.functions.CompressRatioUtil.ratio(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc abc abc abc"))
    assert(math.abs(rows(0).getDouble(0) - viaEval) < 1e-15,
      "interpreted helper and codegen path produce the identical ratio")
  }

  test("jaroWinkler: textbook values, boost threshold, null-safety, codegen/eval agree") {
    import spark.implicits._
    val df = Seq(
      (Option("MARTHA"), Option("MARHTA")),
      (Option("DIXON"), Option("DICKSONX")),
      (Option("JELLYFISH"), Option("SMELLYFISH")), // jaro > 0.7 but prefix 0 -> no boost
      (Option("abc"), Option("abc")),
      (Option(""), Option("abc")),
      (None: Option[String], Option("x"))).toDF("a", "b")
    val rows = df.select(graft.functions.text.jaroWinkler(col("a"), col("b")).as("s")).collect()
    assert(math.abs(rows(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(math.abs(rows(1).getDouble(0) - 0.8133333333333332) < 1e-15)
    assert(math.abs(rows(2).getDouble(0) - 0.8962962962962964) < 1e-15)
    assert(rows(3).getDouble(0) == 1.0)
    assert(rows(4).getDouble(0) == 0.0)
    assert(rows(5).isNullAt(0), "null in, null out")
    val viaEval = graft.functions.JaroWinklerUtil.sim(
      org.apache.spark.unsafe.types.UTF8String.fromString("MARTHA"),
      org.apache.spark.unsafe.types.UTF8String.fromString("MARHTA"))
    assert(rows(0).getDouble(0) == viaEval,
      "interpreted helper and codegen path agree")
  }

  test("dsirScore ranks target-domain-looking docs above base-looking ones") {
    import spark.implicits._
    // target docs speak "alpha beta"; base-only docs speak "gamma delta".
    // A probe doc written in target vocabulary must out-score a probe
    // written in base-only vocabulary.
    val docs = (
      (1 to 10).map(i => (i.toLong, "alpha beta alpha beta", true)) ++
      (11 to 20).map(i => (i.toLong, "gamma delta gamma delta", false)) ++
      Seq((100L, "alpha beta alpha", false), (101L, "gamma delta gamma", false)))
      .toDF("doc_id", "text", "tgt")
    val out = graft.operators.TextAnalysis
      .dsirScore(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("dsir_score")).toMap
    assert(out(100L) > out(101L), s"${out(100L)} vs ${out(101L)}")
    assert(out(100L) > 0.0)   // target-like: more likely under target LM
    assert(out(101L) < 0.0)   // base-only vocabulary: OOV floor under target LM
  }

  test("lcs_len: native codegen DP matches the nested-aggregate HOF fold bit-for-bit") {
    import spark.implicits._
    val docs = Tables(spark, sf("x"), "documents")
      .select(col("doc_id"), slice(TextAnalysis.tokens(col("text")), 1, 64).as("w"))
      .limit(60)
    val pairs = docs.select(col("doc_id").as("ia"), col("w").as("wa"))
      .crossJoin(docs.select(col("doc_id").as("ib"), col("w").as("wb")))
      .filter(col("ia") < col("ib")).limit(400)
    val hof = org.apache.spark.sql.functions.element_at(
      aggregate(col("wa"), array_repeat(lit(0), size(col("wb")) + 1),
        (prev, ai) => aggregate(col("wb"), array(lit(0)), (acc, bj) => {
          val j = size(acc)
          concat(acc, array(
            when(ai === bj, org.apache.spark.sql.functions.element_at(prev, j) + 1)
              .otherwise(greatest(org.apache.spark.sql.functions.element_at(prev, j + 1),
                org.apache.spark.sql.functions.element_at(acc, j)))))
        })), -1)
    val diff = pairs.select(
        graft.functions.text.lcsLen(col("wa"), col("wb")).as("native"), hof.as("ref"))
      .filter(col("native") =!= col("ref"))
    assert(diff.count() == 0)
    // hand-checked cases: classic, empty, identical, null element never matches
    val r = spark.sql(
      "SELECT lcs_len(array('a','b','c','b','d'), array('b','d','c','a','b')) AS l1, " +
      "lcs_len(array('a'), CAST(array() AS ARRAY<STRING>)) AS l2, " +
      "lcs_len(array('x','y'), array('x','y')) AS l3, " +
      "lcs_len(array('x', NULL), array('x', NULL)) AS l4").collect().head
    assert(r.getInt(0) == 3 && r.getInt(1) == 0 && r.getInt(2) == 2 && r.getInt(3) == 1)
  }

  test("dtw_long: native codegen DP matches the fold-of-folds reference bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 20).map { i =>
      (Array.fill(3 + rnd.nextInt(40))(rnd.nextInt(100000).toLong),
       Array.fill(3 + rnd.nextInt(40))(rnd.nextInt(100000).toLong))
    }
    val df = rows.toDF("a1", "a2")
    val a1 = col("a1"); val a2 = col("a2")
    val n1 = size(a1); val n2 = size(a2)
    val row1 = aggregate(slice(a2, lit(2), greatest(n2 - 1, lit(0))),
      array(abs(org.apache.spark.sql.functions.element_at(a1, 1) -
        org.apache.spark.sql.functions.element_at(a2, 1))),
      (acc, v) => concat(acc, array(
        org.apache.spark.sql.functions.element_at(acc, size(acc)) +
          abs(org.apache.spark.sql.functions.element_at(a1, 1) - v))))
    val dp = aggregate(slice(a1, lit(2), greatest(n1 - 1, lit(0))), row1,
      (prev, y) => aggregate(sequence(lit(2), n2),
        array(org.apache.spark.sql.functions.element_at(prev, 1) +
          abs(y - org.apache.spark.sql.functions.element_at(a2, 1))),
        (acc, j) => concat(acc, array(
          abs(y - org.apache.spark.sql.functions.element_at(a2, j)) +
            least(org.apache.spark.sql.functions.element_at(prev, j),
              org.apache.spark.sql.functions.element_at(prev, j - 1),
              org.apache.spark.sql.functions.element_at(acc, size(acc)))))))
    val ref = org.apache.spark.sql.functions.element_at(dp, n2)
    val diff = df.select(graft.functions.text.dtwLong(a1, a2).as("native"), ref.as("ref"))
      .filter(col("native") =!= col("ref"))
    assert(diff.count() == 0)
  }
}
