package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's registry; `oracleSql` holds
  * the DuckDB-equivalent SQL for each (same column names — the driver's
  * compare sorts columns by name before hashing).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.registry, operators.Relational.oracle),
      (operators.Gateway.registry, operators.Gateway.oracle),
      (operators.Dedup.registry, operators.Dedup.oracle),
      (operators.Curation.registry, operators.Curation.oracle),
      (operators.TextAnalysis.registry, operators.TextAnalysis.oracle),
      (operators.Similarity.registry, operators.Similarity.oracle),
      (operators.Multimodal.registry, operators.Multimodal.oracle),
      (operators.EventWindows.registry, operators.EventWindows.oracle),
      (operators.Advanced.registry, operators.Advanced.oracle),
      (operators.TpchDeep.registry, operators.TpchDeep.oracle),
      (operators.Scale.registry, operators.Scale.oracle),
      (operators.Reshape.registry, operators.Reshape.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. The merge is
    * duplicate-checked: `++` would silently let a later module's key
    * override an earlier one, dropping a query from BOTH the bench and
    * the correctness dump with nothing failing. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = modules.map(_._1).reduce(_ ++ _)
    require(merged.size == modules.map(_._1.size).sum,
      s"duplicate query keys across modules: ${
        modules.flatMap(_._1.keys).groupBy(identity).collect {
          case (k, ks) if ks.size > 1 => k
        }.mkString(", ")}")
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] = {
    val merged = modules.map(_._2).reduce(_ ++ _)
    require(merged.size == modules.map(_._2.size).sum,
      s"duplicate oracle keys across modules: ${
        modules.flatMap(_._2.keys).groupBy(identity).collect {
          case (k, ks) if ks.size > 1 => k
        }.mkString(", ")}")
    merged
  }
}
