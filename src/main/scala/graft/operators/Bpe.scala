package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding merge learning — the on-cluster
  * tokenizer-training pass (Sennrich et al. 2016's algorithm in its
  * word-frequency-dictionary form). Reference behavior: the engine's
  * training-data surface tokenizes and counts (server.js:120-137's
  * transform counts words); BPE learning is the step that turns that
  * corpus statistic into a subword vocabulary.
  *
  * Scale shape: the corpus collapses ONCE to the word-frequency
  * dictionary (one partial-agg shuffle over the raw text — the only
  * pass whose cost scales with corpus bytes; at 100 TB the dict is
  * O(distinct words), orders of magnitude smaller). Each of the k
  * merge rounds then runs on the dictionary alone: one map-side pair
  * explode + partial-agg count, a driver argmax of ONE row (the
  * documented O(1) collect, like IVF centroid training), and a
  * map-side fold applying the merge. Dict rides an eager
  * localCheckpoint per round so the plan stays O(1) deep.
  *
  * Determinism: pair counts are exact longs; the winning pair breaks
  * ties by (left asc, right asc) UTF8-binary order; the fold applies
  * merges leftmost-first non-overlapping — so the merge table is a
  * pure function of the corpus.
  */
object Bpe {

  /** Learn `k` merges. Returns (step, left, right, merged,
    * pair_count) ordered by step — the merge table a tokenizer
    * applies in order at encode time.
    */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = docs.sparkSession
    var dict = docs
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      // initial symbols: characters + the end-of-word sentinel, so a
      // word-final subword is a different symbol than the same chars
      // mid-word (the standard </w> marker)
      .select(concat(split(col("w"), ""), array(lit("</w>"))).as("syms"), col("freq"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      // adjacent-pair census, overlaps included, weighted by word freq
      val top = dict
        // a fully-merged word (one symbol) has no pairs — and Spark's
        // sequence(1, 0) DESCENDS rather than returning empty, so the
        // guard is load-bearing, not an optimization
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Row(step, l, r, l + r, cnt)
        // leftmost-first non-overlapping merge: fold keeps the built
        // prefix; a formed token never re-merges with the symbol that
        // produced it (And is short-circuit, so the element_at guard
        // is ANSI-safe on the empty accumulator)
        val prev = dict
        dict = dict
          .withColumn("syms", aggregate(col("syms"),
            array().cast(ArrayType(StringType)),
            (acc, x) => when(size(acc) > 0 &&
                element_at(acc, size(acc)) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(x)))))
          .localCheckpoint(true)
        prev.unpersist(false) // superseded round's checkpoint blocks
        step += 1
      }
    }
    dict.unpersist(false) // final round's checkpoint blocks — the
    // merge table below is driver-built, so dict is done
    val schema = StructType(Seq(
      StructField("step", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(merges.toSeq, 1), schema)
  }

  /** Tokenize with a learned merge table: each document gains a
    * `tokens` array<string> column. Encode is DEFINED as applying the
    * merges exhaustively in learned order (step 1..k, each
    * leftmost-first non-overlapping) — the same fold learnMerges used
    * while training, so train-then-encode round-trips bit-exactly on
    * the training corpus.
    *
    * Scale: entirely map-side — the merge table arrives as k chained
    * codegen'd HOF folds (k is the vocab budget, a constant; there is
    * no shuffle, no broadcast join, no per-row interpretation), so
    * this composes into any downstream pipeline as a zero-exchange
    * projection. Symbol concatenation is preserved: concat(tokens of
    * a word) == word + "</w>" always (BpeSpec invariant).
    */
  def encode(docs: DataFrame, textCol: String, mergeTable: DataFrame): DataFrame = {
    val merges = mergeTable.select("step", "left", "right")
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    val words = split(lower(col(textCol)), "[^a-z]+")
    val applied = merges.foldLeft(
      transform(filter(words, w => length(w) >= 2),
        w => concat(split(w, ""), array(lit("</w>"))))) { case (acc, (l, r)) =>
      transform(acc, syms => aggregate(syms,
        array().cast(ArrayType(StringType)),
        (a, x) => when(size(a) > 0 &&
            element_at(a, size(a)) === lit(l) && x === lit(r),
          concat(slice(a, lit(1), size(a) - 1), array(lit(l + r))))
          .otherwise(concat(a, array(x)))))
    }
    docs.withColumn("tokens", flatten(applied))
  }
}
