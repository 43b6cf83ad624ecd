package graft

import org.apache.spark.sql.functions._

/** Source/sink robustness semantics: schema evolution across parquet
  * file generations, malformed-record handling in the text formats, and
  * a partitioned columnar round-trip — the ingestion failure modes a
  * 100 TB pipeline hits daily. */
class SourcesSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("parquet schema evolution: mergeSchema unions file generations, old files read null") {
    import spark.implicits._
    val dir = tmp("graft_evolve")
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    // a later generation adds a column — the daily reality of long-lived tables
    Seq((3L, "gamma", 0.9)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "quality", "text"))
    assert(merged.count() == 3)
    assert(merged.filter(col("quality").isNull).count() == 2)
    assert(merged.filter(col("doc_id") === 3L).select("quality").head().getDouble(0) == 0.9)
  }

  test("csv malformed records: PERMISSIVE quarantines the bad line, DROPMALFORMED removes it") {
    val dir = tmp("graft_csv")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      "1,alpha,3.5\nnot_a_long,gamma,1.0\n4,delta,2.25\n")
    // cache() first: Spark disallows querying ONLY the corrupt-record
    // column straight off a raw file scan
    val permissive = spark.read
      .schema("id LONG, name STRING, score DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    try {
      assert(permissive.count() == 3)
      val bad = permissive.filter(col("_corrupt_record").isNotNull)
      assert(bad.count() == 1)
      assert(bad.head().getAs[String]("_corrupt_record").startsWith("not_a_long"))
    } finally permissive.unpersist()
    // DROPMALFORMED removes the unparseable row — but ONLY on paths that
    // actually parse fields: a bare count() pushes down to a raw line
    // count and reports the malformed rows as present. Materialize the
    // fields to observe the drop (a real pitfall worth pinning).
    val dropped = spark.read
      .schema("id LONG, name STRING, score DOUBLE")
      .option("mode", "DROPMALFORMED")
      .csv(dir)
    assert(dropped.count() == 3, "bare count() sees raw lines, pre-parse")
    val rows = dropped.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Any]("id") != null))
  }

  test("json malformed records: PERMISSIVE quarantines unparseable lines") {
    val dir = tmp("graft_json")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.json"),
      """{"id":1,"v":"a"}""" + "\n{bad json\n" + """{"id":2,"v":"b"}""" + "\n")
    val p = spark.read
      .schema("id LONG, v STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    try {
      assert(p.count() == 3)
      assert(p.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(p.filter(col("id").isNotNull).count() == 2)
    } finally p.unpersist()
  }

  test("xml round-trip (Spark 4 native source) preserves rows and nested values") {
    val dir = tmp("graft_xml")
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").limit(50)
    docs.write.mode("overwrite").option("rowTag", "doc").xml(dir)
    val back = spark.read.option("rowTag", "doc").xml(dir)
    assert(back.count() == 50)
    // values survive the trip (xml infers longs for integral columns)
    assert(back.select(col("doc_id").cast("long"), col("lang"), col("n_chars").cast("int"))
      .exceptAll(docs.select(col("doc_id"), col("lang"), col("n_chars"))).count() == 0)
  }

  test("binaryFile source: the multimodal file-ingest path (glob filter, recursive, content intact)") {
    // the standard image/audio ingestion path at scale: raw media files
    // become (path, modificationTime, length, content) rows that feed
    // the Multimodal batch-decode plumbing; non-matching formats are
    // excluded by pathGlobFilter at LISTING time (never read)
    val dir = tmp("graft_binary")
    val sub = java.nio.file.Paths.get(dir, "shard=0")
    java.nio.file.Files.createDirectories(sub)
    val payloads = Map("a.img" -> Array[Byte](1, 2, 3, 0, -1),
                       "b.img" -> Array.tabulate(1024)(i => (i % 251).toByte))
    payloads.foreach { case (n, b) =>
      java.nio.file.Files.write(sub.resolve(n), b) }
    java.nio.file.Files.writeString(sub.resolve("skip.txt"), "not media")
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img")
      .option("recursiveFileLookup", "true")
      .load(dir)
    val rows = df.collect()
    assert(rows.length == 2, "glob filter must exclude skip.txt")
    rows.foreach { r =>
      val name = r.getAs[String]("path").split('/').last
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("content"), payloads(name)))
      assert(r.getAs[Long]("length") == payloads(name).length.toLong)
    }
  }

  test("corrupt parquet files: fail loudly by default, skip-and-continue when opted in") {
    val dir = tmp("graft_corrupt")
    Tables.documents(spark, sf).select("doc_id", "lang").limit(20)
      .write.mode("overwrite").parquet(dir)
    // a truncated/garbage part file lands in the directory (the failed-
    // writer / partial-upload case a 100 TB ingest hits routinely)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-99999-garbage.snappy.parquet"),
      "this is not parquet".getBytes)
    // default: the job must FAIL — silent data loss is never the default
    intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
    // explicit opt-in: corrupt file skipped, valid rows all survive
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try assert(spark.read.parquet(dir).count() == 20)
    finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
  }

  test("partitioned ORC round-trip preserves rows and prunes partitions on read") {
    val dir = tmp("graft_orc")
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    docs.write.mode("overwrite").partitionBy("lang").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0)
    // a lang filter must prune to that partition's directory, not scan all
    val one = back.filter(col("lang") === "en")
    val scan = one.queryExecution.executedPlan.toString
    assert(one.count() == docs.filter(col("lang") === "en").count())
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter not pushed to partition pruning:\n${scan.take(500)}")
  }
}
