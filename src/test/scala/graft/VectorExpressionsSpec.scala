package graft

import graft.functions.vector
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {

  test("native dot/cosine match the HOF reference bit-for-bit on real embeddings") {
    val emb = Tables(spark, sf("x"), "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val diff = emb.crossJoin(q)
      .select(
        vector.dot(col("embedding"), col("q_vec")).as("d_native"),
        vector.dotHof(col("embedding"), col("q_vec")).as("d_hof"),
        vector.cosine(col("embedding"), col("q_vec")).as("c_native"),
        vector.cosineHof(col("embedding"), col("q_vec")).as("c_hof"))
      .filter(col("d_native") =!= col("d_hof") ||
        col("c_native") =!= col("c_hof") ||
        col("c_native").isNull =!= col("c_hof").isNull)
    assert(diff.count() == 0)
  }

  test("null semantics: zero vector, length mismatch, null element") {
    import spark.implicits._
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),   // zero norm
      (Array(1.0f), Array(1.0f, 2.0f))           // length mismatch
    ).toDF("a", "b")
    val r = df.select(vector.cosine(col("a"), col("b")).as("c")).collect()
    assert(r.forall(_.isNullAt(0)))
    val withNullElem = spark.sql("SELECT array(1.0F, NULL) AS a, array(1.0F, 2.0F) AS b")
    assert(withNullElem.select(vector.dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("double arrays work too (hyperplane literals)") {
    import spark.implicits._
    val r = Seq((Array(1.0f, 2.0f), 1)).toDF("v", "x")
      .select(vector.dot(col("v"), typedLit(Seq(0.5, 0.25))).as("d"))
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("vec_cosine / vec_dot registered as SQL functions via GraftExtensions") {
    val out = spark.sql(
      "SELECT vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c, " +
      "vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d").collect().head
    assert(out.getDouble(0) == 1.0)
    assert(out.getDouble(1) == 11.0)
  }

  test("top_k_by: bounded heap ranks by score desc, ties to smaller id, k > n ok") {
    import spark.implicits._
    val df = Seq((1L, 0.9, 10L), (1L, 0.9, 7L), (1L, 0.5, 3L), (1L, 0.99, 4L), (2L, 0.1, 1L))
      .toDF("g", "score", "id")
    val out = df.groupBy(col("g"))
      .agg(vector.topKBy(col("score"), col("id"), 3).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.id"), col("t.score"), col("t.rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(out == Set(
      (1L, 4L, 0.99, 1L), (1L, 7L, 0.9, 2L), (1L, 10L, 0.9, 3L),
      (2L, 1L, 0.1, 1L)))
    // SQL registration
    val sqlOut = df.createOrReplaceTempView("tkb")
    val viaSql = spark.sql(
      "SELECT g, top_k_by(score, id, 1) AS t FROM tkb GROUP BY g").count()
    assert(viaSql == 2)
  }

  test("top_k_by_long: exact above 2^53 where a double cast would merge scores") {
    import spark.implicits._
    // two scores that collide when cast to double (2^53 and 2^53+1):
    // the long heap must keep them distinct and rank the larger first
    val big = 1L << 53
    val df = Seq((1L, big + 1, 11L), (1L, big, 5L), (1L, big + 1, 3L), (1L, 1L, 9L))
      .toDF("g", "score", "id")
    val out = df.groupBy(col("g"))
      .agg(vector.topKByLong(col("score"), col("id"), 3).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id"), col("t.score"), col("t.rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((3L, big + 1, 1L), (11L, big + 1, 2L), (5L, big, 3L)))
    // double heap on the same data CANNOT hold this ranking: big and
    // big+1 round to the same double, so the id tie-break reorders to
    // 3,5,11 — the exact long ranking is 3,11,5
    val dOrder = df.groupBy(col("g"))
      .agg(vector.topKBy(col("score").cast("double"), col("id"), 3).as("top"))
      .select(explode(col("top")).as("t")).select(col("t.id"), col("t.rank"))
      .collect().sortBy(_.getLong(1)).map(_.getLong(0)).toSeq
    assert(dOrder == Seq(3L, 5L, 11L))
    // SQL registration
    df.createOrReplaceTempView("tkbl")
    assert(spark.sql("SELECT g, top_k_by_long(score, id, 2) AS t FROM tkbl GROUP BY g")
      .selectExpr("t[0].score").collect().head.getLong(0) == big + 1)
  }

  test("top_k_by_long: partial/merge agreement across many small partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map(i => (i.toLong % 5, rnd.nextInt(50).toLong, i.toLong))
    val df1 = rows.toDF("g", "score", "id").repartition(1)
    val df37 = rows.toDF("g", "score", "id").repartition(37)
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("g"))
      .agg(vector.topKByLong(col("score"), col("id"), 7).as("top"))
      .select(col("g"), col("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(run(df1) == run(df37))
  }

  test("vec_sqdist_long matches the HOF reference bit-for-bit on quantized embeddings") {
    val emb = Tables(spark, sf("x"), "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1.0e7 + 0.5).cast("long")).as("vu"))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("vu").as("q_vu"))
    val diff = emb.crossJoin(q)
      .select(
        vector.sqdistLong(col("vu"), col("q_vu")).as("native"),
        vector.sqdistLongHof(col("vu"), col("q_vu")).as("hof"))
      .filter(col("native") =!= col("hof") || col("native").isNull =!= col("hof").isNull)
    assert(diff.count() == 0)
    // exact on a known pair + null semantics (mismatch, null element)
    val r = spark.sql(
      "SELECT vec_sqdist_long(array(3L, -2L), array(1L, 2L)) AS d, " +
      "vec_sqdist_long(array(1L), array(1L, 2L)) AS mis, " +
      "vec_sqdist_long(array(1L, NULL), array(1L, 2L)) AS ne").collect().head
    assert(r.getLong(0) == 20L)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("vec_sqdist_long stays inside whole-stage codegen") {
    val emb = Tables(spark, sf("x"), "embeddings")
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 1.0e7 + 0.5).cast("long")).as("vu"))
    val q = emb.limit(1).select(col("vu").as("q_vu"))
    val df = emb.crossJoin(broadcast(q))
      .select(vector.sqdistLong(col("vu"), col("q_vu")).as("d"))
    df.collect()
    assert("""\*\(\d+\) Project \[vec_sqdist_long""".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined)
  }

  test("native cosine stays inside whole-stage codegen") {
    val emb = Tables(spark, sf("x"), "embeddings")
    val q = emb.limit(1).select(col("embedding").as("q_vec"))
    val df = emb.crossJoin(broadcast(q))
      .select(vector.cosine(col("embedding"), col("q_vec")).as("c"))
    df.collect() // finalize the adaptive plan
    // `*(n)` marks a WholeStageCodegen stage in the plan rendering —
    // the Project evaluating vec_cosine must carry it
    assert("""\*\(\d+\) Project \[vec_cosine""".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined)
  }
}
