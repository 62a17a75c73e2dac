package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan locality at scale.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * parquet footers carry per-file/rowgroup min-max stats, and a scan
  * with a predicate on a clustered column skips every file whose
  * range misses. Sorting by ONE column gives perfect skipping on that
  * column and none on any other; interleaving the bits of TWO keys
  * (Morton / Z-order) gives each file a compact rectangle in (a, b)
  * space, so predicates on EITHER dimension prune.
  *
  * Everything is plain long arithmetic on codegen'd built-ins
  * (shiftleft / bitwiseAND / bitwiseOR) — no UDF, stays inside
  * whole-stage codegen, and the identical expression runs in any
  * ANSI engine (the DuckDB oracle mirrors it bit for bit).
  */
object Layout {

  /** Spread the low 16 bits of `c` to even bit positions 0,2,…,30
    * (classic magic-bits Morton expansion, all on long).
    */
  def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key interleaving the low 16 bits of `a` (even
    * positions) and `b` (odd positions).
    */
  def mortonKey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Rewrite `df` into `numFiles` range partitions of the Morton key
    * of (a, b), locally sorted by it — each output file then covers a
    * compact (a, b) rectangle, so min-max stats prune scans filtered
    * on either column. The sort is per-partition (no global sort
    * barrier); the only exchange is the range partitioner's sample +
    * shuffle, the same cost as any repartition of the write.
    */
  def zorderBy(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame =
    df.withColumn("_zorder", mortonKey(a, b))
      .repartitionByRange(numFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")

  /** Hilbert index of (a, b)'s low `bits` bits — the locality-
    * preserving sibling of [[mortonKey]] (no Z-curve jumps:
    * consecutive indices are always grid-adjacent, so files cut along
    * the curve cover TIGHTER rectangles). A native codegen expression
    * ([[graft.functions.HilbertIndex]]) — the per-level when-chain
    * formulation grows ~4× per level and leaves codegen past order 4.
    */
  def hilbertKey(a: Column, b: Column, bits: Int = 16): Column =
    call_function("hilbert_index", a.cast("long"), b.cast("long"), lit(bits))

  /** [[zorderBy]]'s Hilbert twin: range-partition + locally sort by
    * the Hilbert key. Same single-exchange cost; tighter per-file
    * rectangles on range scans.
    */
  def hilbertBy(df: DataFrame, a: Column, b: Column, numFiles: Int,
      bits: Int = 16): DataFrame =
    df.withColumn("_hilbert", hilbertKey(a, b, bits))
      .repartitionByRange(numFiles, col("_hilbert"))
      .sortWithinPartitions("_hilbert")
      .drop("_hilbert")

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet
    * table. Bucketing is the 100 TB join layout: two fact tables
    * bucketed on the same key with the same bucket count sort-merge
    * join with ZERO exchanges (each task reads matching bucket files
    * from both sides), and an equality predicate on the bucket key
    * prunes the scan to a single bucket (`SelectedBucketsCount` in
    * the plan). The write itself shuffles once — that cost is paid at
    * ingest, then every downstream join/filter on the key rides free.
    * Both properties are plan-asserted in LayoutSpec.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
