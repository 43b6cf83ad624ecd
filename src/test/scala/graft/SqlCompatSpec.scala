package graft

/** The FULL SQL surface through Spark's frontend (r14 verdict item 4):
  * every one of the ~291 oracle SQL strings — the ANSI text DuckDB
  * executes as the correctness oracle — is swept through `spark.sql`
  * against the Hive-catalog tables WITH the graft DuckDB-dialect alias
  * layer installed ([[functions.DuckDbDialect]] — the same surface a
  * production session gets from GraftExtensions), and the outcome is
  * pinned three ways with ZERO silent skips:
  *
  *   - **identical**: strict driver-style canon (columns sorted by
  *     name, rows sorted, 12-significant-digit floats) equals the
  *     DataFrame form's — the query is fully catalog-servable.
  *   - **value-equal, type differs** ([[knownTypeDiff]]): every value
  *     numerically equal but a column is typed differently by the SQL
  *     frontend than by the DataFrame form (e.g. DECIMAL where the
  *     DataFrame casts to DOUBLE). Catalog users get correct values
  *     with a different declared type; each row names the construct.
  *   - **incompatible** ([[knownIncompatible]]): the text uses a
  *     DuckDB-ism Spark's parser/analyzer rejects (or evaluates to
  *     different values). Each row names the exact construct, so the
  *     matrix documents precisely which oracle strings are
  *     DuckDB-dialect rather than portable ANSI.
  *
  * The matrix is SELF-VERIFYING in both directions: an undocumented
  * divergence fails the spec, and a documented one that stops
  * diverging (e.g. a Spark upgrade adds the function) also fails, so
  * the committed lists can never go stale. A machine-readable copy is
  * written to `target/sql_compat.json` for the round record.
  */
class SqlCompatSpec extends SparkSpec {

  /** Oracle strings that are DuckDB dialect, not portable ANSI — the
    * construct each one needs is named. These queries' CORRECTNESS is
    * still driver-verified (Spark DataFrame vs DuckDB); this matrix is
    * only about whether the SAME TEXT runs on Spark's SQL frontend. */
  // GENERATED-MATRIX-BEGIN (regenerated from target/sql_compat.json)
  private val knownIncompatible: Map[String, String] = Map(
    "q_bpe_encode" -> "WITH ... AS MATERIALIZED hint (load-bearing for the DuckDB oracle's recursive-CTE runtime)",
    "q_bpe_merges" -> "WITH ... AS MATERIALIZED hint (load-bearing for the DuckDB oracle's recursive-CTE runtime)",
    "q_dedup_cdc_chunks" -> "HUGEINT data type (the Gear-table literal; the chunker state machine needs 64-bit unsigned wrap)",
    "q_emb_colstats" -> "HUGEINT data type",
    "q_pca_power" -> "HUGEINT data type",
    "q_rolling_fingerprint" -> "HUGEINT data type")

  /** Value-equal but differently typed through the SQL frontend. */
  private val knownTypeDiff: Map[String, String] = Map.empty

  // GENERATED-MATRIX-END

  private def firstLine(s: String): String =
    Option(s).flatMap(_.linesIterator.find(_.trim.nonEmpty))
      .getOrElse("<no message>").trim.take(160)

  test("all oracle SQL via spark.sql: identical, value-equal-typed, or documented — zero silent skips") {
    CatalogFixture.registerCatalogTables(spark, sf)
    // the production catalog session carries the DuckDB-dialect aliases
    // via GraftExtensions; ad-hoc sessions get them from register() —
    // the sweep measures THAT surface (SURVEY round-15 addendum)
    functions.DuckDbDialect.register(spark)
    spark.sql(s"USE ${CatalogFixture.db}")
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    val outcomes = scala.collection.mutable.LinkedHashMap.empty[String, String]
    try {
      val names = SparkEntry.oracleSql.keys.toSeq.sorted
      assert(names.nonEmpty && names.size == SparkEntry.queries.size,
        s"oracleSql (${names.size}) and queries (${SparkEntry.queries.size}) drifted")
      names.foreach { name =>
        val sql = SparkEntry.oracleSql(name)
        // Right(true)=strict identical, Right(false)=loose-equal only,
        // Left(reason)=error or value divergence
        val outcome: Either[String, Boolean] =
          try {
            val viaSql = spark.sql(sql)
            val viaDf = SparkEntry.queries(name)(spark, sf)
            if (CatalogFixture.canon(viaSql) == CatalogFixture.canon(viaDf)) Right(true)
            else if (CatalogFixture.canonLoose(viaSql) == CatalogFixture.canonLoose(viaDf)) Right(false)
            else {
              val a = CatalogFixture.canonLoose(viaSql); val b = CatalogFixture.canonLoose(viaDf)
              Left(s"value divergence: sql ${a.size} rows vs df ${b.size}; first diff " +
                a.zipAll(b, "<missing>", "<missing>").find { case (x, y) => x != y }
                  .map { case (x, y) => s"[$x] vs [$y]" }.getOrElse("<none>"))
            }
          } catch {
            case t: Throwable => Left(s"${t.getClass.getSimpleName}: ${firstLine(t.getMessage)}")
          } finally CacheTracker.releaseQueryScope(spark)

        outcome match {
          case Right(true) =>
            outcomes(name) = "identical"
            if (knownIncompatible.contains(name))
              problems += s"$name: listed incompatible (${knownIncompatible(name)}) but ran identical — remove the stale entry"
            if (knownTypeDiff.contains(name))
              problems += s"$name: listed type-diff (${knownTypeDiff(name)}) but ran strictly identical — remove the stale entry"
          case Right(false) =>
            outcomes(name) = "type-differs"
            if (!knownTypeDiff.contains(name))
              problems += s"$name: value-equal but typed differently and NOT documented in knownTypeDiff"
            if (knownIncompatible.contains(name))
              problems += s"$name: listed incompatible but is value-equal (type diff only) — move to knownTypeDiff"
          case Left(reason) =>
            outcomes(name) = s"incompatible: $reason"
            if (!knownIncompatible.contains(name))
              problems += s"$name: UNDOCUMENTED incompatibility — $reason"
        }
      }
      val nIdent = outcomes.valuesIterator.count(_ == "identical")
      val nType = outcomes.valuesIterator.count(_ == "type-differs")
      val nInc = outcomes.size - nIdent - nType
      // round record (machine-readable; the committed matrix lives in
      // the two maps above)
      val j = outcomes.map { case (k, v) =>
        "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }.mkString("{", ",", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get("target/sql_compat.json"),
        (s"""{"identical":$nIdent,"type_differs":$nType,"incompatible":$nInc,"queries":$j}""" + "\n")
          .getBytes("UTF-8"))
      info(s"${outcomes.size} oracle SQL texts: $nIdent identical, $nType value-equal/type-differs, $nInc incompatible (documented)")
      assert(problems.isEmpty, s"${problems.size} matrix drift(s):\n${problems.mkString("\n")}")
    } finally spark.sql("USE default")
  }
}
