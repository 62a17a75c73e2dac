package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  /** Driver-side reference BPE, same semantics as Bpe.learnMerges:
    * word-frequency dict, adjacent-pair census (overlaps included),
    * argmax with (count desc, left asc, right asc) tie order,
    * leftmost-first non-overlapping merge application.
    */
  private def refBpe(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    val words = texts.flatMap(_.toLowerCase.split("[^a-z]+")).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var dict: Map[Vector[String], Long] = words
      .groupBy { case (w, _) => w.map(_.toString).toVector :+ "</w>" }
      .view.mapValues(_.values.sum).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      dict.foreach { case (syms, f) =>
        syms.sliding(2).foreach { case Vector(a, b) => counts((a, b)) += f; case _ => } }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < 2) done = true
        else {
          out += ((step, l, r, c))
          dict = dict.toSeq.map { case (syms, f) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { x =>
              if (acc.nonEmpty && acc.last == l && x == r) acc(acc.size - 1) = l + r
              else acc += x
            }
            acc.toVector -> f
          }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          step += 1
        }
      }
    }
    out.toSeq
  }

  private def run(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    Bpe.learnMerges(texts.toDF("text"), "text", k)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
  }

  test("merge table matches the reference implementation exactly") {
    val corpus = Seq(
      "the cat sat on the mat",
      "the cats chatter that the rats scatter",
      "that mat is the cat hat",
      "lower lowest low slower slowest newer newest")
    assert(run(corpus, 12) === refBpe(corpus, 12))
  }

  test("repeated-symbol words merge leftmost-first, non-overlapping") {
    // 'aaaa' stresses overlap semantics: (a,a) appears 3x per word
    // but merges pair up as [aa][aa], never [a][aa][a]
    val corpus = Seq("aaaa aaaa aaaa banana banana")
    assert(run(corpus, 6) === refBpe(corpus, 6))
  }

  test("ties break by (left, right) ascending and counts are freq-weighted") {
    // every adjacent pair in this corpus counts exactly 2, so the
    // winner is decided PURELY by the (left asc, right asc) tie rule:
    // lexicographic min among {(q,</w>), (x,y), (x,z), (y,q), (y,x),
    // (z,</w>)} is (q, </w>) — pin it explicitly so a tie-direction
    // regression fails loudly
    val corpus = Seq("xyq xyq", "yxz yxz")
    val m = run(corpus, 1)
    assert(m.size === 1)
    assert((m.head._2, m.head._3) === ("q", "</w>"))
    assert(m === refBpe(corpus, 1))
  }

  test("merges preserve word content (concatenation invariant)") {
    import spark.implicits._
    val docs = Seq("the quick brown fox jumped over the lazy dogs").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 8).collect()
    // every merged token is exactly left+right
    merges.foreach(r => assert(r.getString(3) === r.getString(1) + r.getString(2)))
    // steps are 1..n consecutive
    assert(merges.map(_.getInt(0)).toSeq === (1 to merges.length))
  }

  test("stops early when no pair reaches the count floor") {
    // all words distinct singletons -> every pair count is 1 -> no merges
    val m = run(Seq("ab cd ef"), 5)
    assert(m.isEmpty)
  }

  test("encode applies learned merges and preserves content") {
    import spark.implicits._
    val corpus = Seq("the cat sat on the mat", "that cat chatter", "lower lowest slower")
    val docs = corpus.toDF("text")
    val table = Bpe.learnMerges(docs, "text", 8)
    val enc = Bpe.encode(docs, "text", table).select("text", "tokens").collect()
    enc.foreach { r =>
      val words = r.getString(0).toLowerCase.split("[^a-z]+").filter(_.length >= 2)
      val toks = r.getSeq[String](1)
      // concatenation invariant: tokens re-concatenate to the exact
      // word stream with one sentinel per word
      assert(toks.mkString === words.map(_ + "</w>").mkString)
    }
    // learned merges actually fire: some multi-char token exists
    assert(enc.flatMap(_.getSeq[String](1)).exists(t => t.replace("</w>", "").length > 1))
    // training corpus tokens come from the learned vocab: every token
    // is a char, a sentinel-char, or a product of the merge table
    val vocab = table.collect().map(_.getString(3)).toSet
    val base = enc.flatMap(_.getSeq[String](1)).toSet
    base.foreach(t =>
      assert(vocab.contains(t) || t.replace("</w>", "").length <= 1, s"unexpected token $t"))
  }
}
