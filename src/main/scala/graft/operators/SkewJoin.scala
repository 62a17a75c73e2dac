package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Salted join for skewed keys — the explicit fallback when AQE's
  * skew-join split can't help:
  *
  *   - AQE only splits *sort-merge/shuffle-hash join* partitions, and
  *     only when runtime stats expose the skew; it does nothing for a
  *     skewed key feeding a later aggregation, and nothing when the
  *     planner picked the join shape before stats existed.
  *   - Salting restructures the key space itself: the big side gets a
  *     deterministic salt in [0, salts), the small side is replicated
  *     `salts` times, and the join key becomes (key, salt) — a key
  *     carried by 10⁹ rows spreads over `salts` reducers instead of
  *     hammering one.
  *
  * Cost model: small side × salts extra rows shuffled (it was going to
  * be shuffled or broadcast anyway — keep `salts` modest, 8–32, sized
  * to the worst key's row count / a healthy partition size). Results
  * are identical to the unsalted join: salt is an equi-join column on
  * both sides with matching distribution by construction.
  */
object SkewJoin {

  /** Inner/left join of a skew-keyed big side against a small side.
    *
    * `saltFrom` must be a column (or expression) on `big` that varies
    * WITHIN a hot key — a row id, a line number, an event timestamp —
    * so the hash spreads the hot key's rows across salts
    * deterministically (no `rand()`: retries and speculative tasks
    * must salt identically or the join drops/duplicates rows).
    */
  def salted(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFrom: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salting supports inner/left joins (got $joinType); right/full would " +
        "multiply unmatched small-side rows by the replication factor")
    val b = big.withColumn("__salt",
      pmod(xxhash64(saltFrom), lit(salts.toLong)).cast(IntegerType))
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
