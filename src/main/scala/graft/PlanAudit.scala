package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan self-audit: the scale-relevant shape of a query as a
  * one-row-per-metric DataFrame — shuffle exchanges, join strategies,
  * whole-stage-codegen spans, scans and scan-level filter pushdown.
  *
  * This is the check the Scaladoc scale notes promise, packaged for
  * users: `PlanAudit.describe(df).show()` answers "does this plan
  * broadcast what I think it broadcasts / shuffle where I think it
  * shuffles" without reading an EXPLAIN dump. Counting happens on the
  * executed-plan STRING, which renders the whole tree even under AQE
  * (adaptive roots hide children from collect()). Caveat: for adaptive
  * plans (any plan with an exchange) `codegen_spans` reads 0 before the
  * first action — AQE finalizes whole-stage codegen per stage at
  * runtime; audit after materializing if that metric matters.
  */
object PlanAudit {

  def metrics(df: DataFrame): Seq[(String, Long)] = {
    val s = df.queryExecution.executedPlan.toString
    def count(pat: String): Long = {
      var n = 0L; var i = s.indexOf(pat)
      while (i >= 0) { n += 1; i = s.indexOf(pat, i + 1) }
      n
    }
    val codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(s).map(_.group(1)).toSet.size.toLong
    val pushedNonEmpty = count("PushedFilters: [") - count("PushedFilters: []")
    Seq(
      "shuffle_exchanges" -> (count("Exchange hashpartitioning") +
        count("Exchange rangepartitioning") + count("Exchange SinglePartition")),
      "broadcast_exchanges" -> count("BroadcastExchange"),
      "broadcast_hash_joins" -> count("BroadcastHashJoin"),
      "sort_merge_joins" -> count("SortMergeJoin"),
      "shuffled_hash_joins" -> count("ShuffledHashJoin"),
      "nested_loop_joins" -> count("BroadcastNestedLoopJoin"),
      "codegen_spans" -> codegenSpans,
      "parquet_scans" -> count("Scan parquet"),
      "scans_with_pushed_filters" -> pushedNonEmpty,
      "in_memory_scans" -> count("InMemoryTableScan"))
  }

  def describe(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    metrics(df).toDF("metric", "value")
  }
}
