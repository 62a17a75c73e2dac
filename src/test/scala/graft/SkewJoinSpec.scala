package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  private lazy val (big, small) = {
    import spark.implicits._
    // one pathologically hot key (90% of rows) + a long tail
    val bigDf = ((1 to 900).map(i => (7L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 5, 1000L + i)))
      .toDF("k", "row_id")
    val smallDf = (0L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    (bigDf, smallDf)
  }

  test("salted join returns exactly the rows of the plain join") {
    val plain = big.join(small, Seq("k"))
      .select("k", "row_id", "name").collect().map(_.toSeq).toSet
    val salted = SkewJoin.salted(big, small, Seq("k"), col("row_id"), salts = 8)
      .select("k", "row_id", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("left join keeps unmatched big-side rows exactly once") {
    import spark.implicits._
    val b = Seq((1L, 10L), (99L, 11L)).toDF("k", "row_id") // 99 unmatched
    val out = SkewJoin.salted(b, small, Seq("k"), col("row_id"), salts = 4, joinType = "left")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Any]("name")))
    assert(out.length == 2)
    assert(out.toMap.apply(99L) == null)
  }

  test("the hot key's rows actually spread across salts") {
    import spark.implicits._
    val b = big.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8L)).cast("int"))
    val hotSalts = b.filter(col("k") === 7L)
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(hotSalts == 8L, s"hot key should hit all 8 salts, hit $hotSalts")
  }

  test("right/full join types are rejected") {
    intercept[IllegalArgumentException] {
      SkewJoin.salted(big, small, Seq("k"), col("row_id"), 4, "full_outer")
    }
  }
}
