package graft

import graft.sources.{Readers, Writers}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  private lazy val df = {
    import spark.implicits._
    Seq((1L, "MIT", "USA", 42.5), (2L, "ETH", null, 9.0), (3L, "TUM", "Germany", -1.0))
      .toDF("id", "name", "country", "score")
  }

  test("parquet round-trip preserves schema and values") {
    Writers.parquet(df, s"$tmp/p")
    val back = Readers.parquet(spark, s"$tmp/p")
    assert(back.schema.map(f => (f.name, f.dataType)) == df.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == 3)
  }

  test("partitioned parquet writes one dir per key and prunes on read") {
    Writers.parquet(df.withColumn("part", coalesce(col("country"), lit("unknown"))),
      s"$tmp/pp", partitionBy = Seq("part"))
    val pruned = Readers.parquet(spark, s"$tmp/pp").filter(col("part") === "USA")
    assert(pruned.count() == 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(new java.io.File(s"$tmp/pp/part=USA").exists())
  }

  test("csv round-trip with null→'' coalesce (reference download format)") {
    Writers.csv(df, s"$tmp/c")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("country", StringType), StructField("score", DoubleType)))
    val back = Readers.csv(spark, s"$tmp/c", Some(schema))
    assert(back.count() == 3)
    // null country became empty → read back as null under default null handling
    assert(back.filter(col("id") === 2).collect().head.isNullAt(2))
  }

  test("json-lines round-trip and multiLine array-of-objects read") {
    Writers.json(df, s"$tmp/j")
    val back = Readers.json(spark, s"$tmp/j")
    assert(back.count() == 3)
    // the reference's pretty-printed JSON array layout (server.js:106)
    val arr = s"$tmp/arr.json"
    Files.writeString(java.nio.file.Paths.get(arr),
      """[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]""")
    val multi = Readers.json(spark, arr, multiLine = true)
    assert(multi.count() == 2)
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    val wh = new java.io.File("spark-warehouse")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    if (wh.exists()) rm(wh)
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "vb")
    Writers.bucketedTable(a, "bkt_a", "k", 4)
    Writers.bucketedTable(b, "bkt_b", "k", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path: the point is that bucketing provides
      // the join's required hash partitioning with NO shuffle exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("xml round-trip preserves values incl. nulls via the built-in datasource") {
    Writers.xml(df, s"$tmp/x", rowTag = "rec")
    val back = Readers.xml(spark, s"$tmp/x", rowTag = "rec")
    assert(back.count() == 3)
    val r1 = back.filter(col("id") === 1).collect().head
    assert(r1.getAs[String]("name") == "MIT" && r1.getAs[Double]("score") == 42.5)
    // null country round-trips as null (absent element)
    assert(back.filter(col("id") === 2).select(col("country")).collect().head.isNullAt(0))
    // explicit schema read pins types without inference
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("country", StringType), StructField("score", DoubleType)))
    val typed = Readers.xml(spark, s"$tmp/x", rowTag = "rec", schema = Some(schema))
    assert(typed.schema.map(_.dataType) == schema.map(_.dataType))
    assert(typed.agg(sum(col("score"))).collect().head.getDouble(0) == 50.5)
  }

  test("orc round-trip preserves schema; text reads one line per row") {
    Writers.orc(df, s"$tmp/o")
    val back = Readers.orc(spark, s"$tmp/o")
    assert(back.schema.map(f => (f.name, f.dataType)) == df.schema.map(f => (f.name, f.dataType)))
    assert(back.count() == 3)
    Files.writeString(java.nio.file.Paths.get(s"$tmp/raw.txt"), "line one\nline two\n")
    val txt = Readers.text(spark, s"$tmp/raw.txt")
    assert(txt.columns.toSeq == Seq("value") && txt.count() == 2)
  }

  test("single-file sinks write exactly one file with the reference column order") {
    // reference download endpoints serve ONE file (server.js:106,129-130)
    val csvPath = Writers.csvSingleFile(
      df.select("name", "country", "id", "score"), s"$tmp/one.csv")
    val f = new java.io.File(csvPath)
    assert(f.isFile, s"$csvPath should be a single regular file")
    assert(!new java.io.File(s"$tmp/.one.csv.staging").exists(), "staging dir cleaned up")
    val lines = Files.readAllLines(java.nio.file.Paths.get(csvPath))
    assert(lines.get(0) == "name,country,id,score") // header preserves column order
    assert(lines.size() == 4)
    assert(lines.toString.contains("ETH,,2")) // null → '' like the reference

    val jsonPath = Writers.jsonSingleFile(df, s"$tmp/one.json")
    assert(new java.io.File(jsonPath).isFile)
    assert(Readers.json(spark, jsonPath).count() == 3)
  }

  test("avro round-trip: full type subset incl. timestamp/date/decimal/array/struct nulls") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2026-03-01 10:15:30.123456")
    val rich = Seq(
      (1L, "alpha", Some(2.5), Some(ts), Some(java.sql.Date.valueOf("2026-03-01")),
        Seq(1.0f, 2.0f), Some(BigDecimal("12345.67"))),
      (2L, "beta", None, None, None, Seq.empty[Float], None)
    ).toDF("id", "name", "score", "ts", "day", "vec", "amount")
      .withColumn("amount", col("amount").cast(DecimalType(12, 2)))
      .withColumn("nested", struct(col("id").as("nid"), col("name").as("nname")))
    Writers.avro(rich, s"$tmp/avro")
    val back = Readers.avro(spark, s"$tmp/avro")
    // catalogString ignores nullability markers (everything comes back
    // nullable from the [null, T] unions)
    assert(back.schema.map(f => (f.name, f.dataType.catalogString)).toList ==
      rich.schema.map(f => (f.name, f.dataType.catalogString)).toList)
    val rows = back.orderBy("id").collect()
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getLong(0) == 1L && r1.getString(1) == "alpha" && r1.getDouble(2) == 2.5)
    assert(r1.getTimestamp(3) == ts, s"timestamp micros must survive: ${r1.getTimestamp(3)}")
    assert(r1.getDate(4) == java.sql.Date.valueOf("2026-03-01"))
    assert(r1.getSeq[Float](5) == Seq(1.0f, 2.0f))
    assert(r1.getDecimal(6) == new java.math.BigDecimal("12345.67"))
    assert(r1.getStruct(7).getLong(0) == 1L && r1.getStruct(7).getString(1) == "alpha")
    val r2 = rows(1)
    assert(r2.isNullAt(2) && r2.isNullAt(3) && r2.isNullAt(4) && r2.isNullAt(6))
    assert(r2.getSeq[Float](5).isEmpty)
    // files are standard Avro object-container files
    val files = new java.io.File(s"$tmp/avro").listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty)
    val head = java.nio.file.Files.readAllBytes(files.head.toPath).take(4)
    assert(head.sameElements(Array[Byte]('O', 'b', 'j', 1)), "Avro magic bytes")
  }

  test("avro round-trip survives empty partitions and an all-empty frame") {
    import spark.implicits._
    val sparse = Seq((1L, "only"), (2L, "rows")).toDF("id", "v").repartition(8)
    Writers.avro(sparse, s"$tmp/avro-sparse")
    assert(Readers.avro(spark, s"$tmp/avro-sparse").count() == 2)
    val empty = sparse.limit(0)
    Writers.avro(empty, s"$tmp/avro-empty")
    val back = Readers.avro(spark, s"$tmp/avro-empty")
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v"),
      "schema must survive an empty write (container headers carry it)")
  }

  test("avro round-trip on a real table sample preserves row multiset") {
    val li = Tables(spark, sf("lineitem"), "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate", "l_returnflag")
      .limit(500)
    Writers.avro(li, s"$tmp/avro-li")
    val back = Readers.avro(spark, s"$tmp/avro-li")
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("append mode accumulates") {
    Writers.parquet(df, s"$tmp/a", mode = SaveMode.Overwrite)
    Writers.parquet(df, s"$tmp/a", mode = SaveMode.Append)
    assert(Readers.parquet(spark, s"$tmp/a").count() == 6)
  }

  test("csvWithQuarantine captures malformed rows without failing or nulling silently") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,qty\n1,10\n2,notanumber\n3,30\n".getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType)))
    val all = Readers.csvWithQuarantine(spark, s"$dir/in.csv", schema)
    val clean = all.filter(col("_corrupt_record").isNull)
    val bad   = all.filter(col("_corrupt_record").isNotNull)
    assert(clean.count() == 2)
    assert(bad.count() == 1)
    assert(bad.collect().head.getAs[String]("_corrupt_record") == "2,notanumber")
  }

  test("parquetMerged unions evolved schemas; old rows null-fill new columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/old")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/new")
    val merged = Readers.parquetMerged(spark, s"$dir/{old,new}")
    assert(merged.schema.fieldNames.toSet == Set("id", "name", "score"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("score")))
    assert(byId(2L).getAs[Double]("score") == 9.5)
  }

  test("compact rewrites a many-small-file dir into few files, rows intact") {
    import spark.implicits._
    import graft.operators.Integrity
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "name")
    df.repartition(40).write.parquet(dir)
    def partFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(partFiles == 40)
    val before = Integrity.fingerprint(spark.read.parquet(dir)).head()
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length).sum
    val n = Writers.compact(spark, dir, targetBytes = bytes / 4 + 1)
    assert(n <= 5, s"expected ~4 output files, got $n")
    assert(partFiles == n)
    assert(Integrity.fingerprint(spark.read.parquet(dir)).head() == before)
    // staging/backup dirs cleaned up
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("compact")), parent.mkString(","))
  }

  test("schemaDiff reports added, removed, and type-changed columns; empty when equal") {
    import spark.implicits._
    val before = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val after = Seq((1L, 1, true)).toDF("id", "score", "flag")
    val diff = Writers.schemaDiff(spark, before, after)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(diff == Set(
      ("flag", "added"),
      ("name", "removed"),
      ("score", "type_changed:double->int")), diff.toString)
    assert(Writers.schemaDiff(spark, before, before).count() == 0)
  }
}
