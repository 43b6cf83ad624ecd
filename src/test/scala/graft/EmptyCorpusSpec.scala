package graft

/** TOTALITY on degenerate input: every declared query must run (possibly
  * to an empty result) against a corpus whose ten tables all have ZERO
  * rows. At 100 TB "no data yet" is an ordinary state — a fresh
  * partition, a filtered-out day, a new tenant — and a pipeline whose
  * operators throw on it (head() on an empty aggregate, schema inference
  * over a partitionBy write that emitted no files, division landing on a
  * null) pages someone at 3am. The driver's oracle gate can never see
  * this (its corpus is non-empty), so this spec is the only guard.
  */
class EmptyCorpusSpec extends SparkSpec {

  test("every declared query is a total function on an all-empty corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    for (n <- Tables.names)
      Tables.load(spark, sf, n).limit(0).write.parquet(s"$dir/$n.parquet")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val r = try { fn(spark, dir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).replace('\n', ' ').take(160)}")
        }
      CacheTracker.releaseAll()
      r
    }
    assert(failures.isEmpty,
      s"${failures.size} queries are not total on an empty corpus:\n${failures.mkString("\n")}")
  }
}
