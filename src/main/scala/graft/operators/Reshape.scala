package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reshaping + null-handling surface: pivot (wide conditional
  * aggregation), generator/explode with ordinality, and the null
  * functions family. */
object Reshape {

  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** Pivot: per-nation account balance by market segment as columns.
    * Explicit value list keeps the plan a single pass (no distinct-values
    * pre-query) — required practice at scale. */
  def qPivotSegments(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_nationkey")
      .pivot("c_mktsegment", segments)
      .agg(dsum(col("c_acctbal")))

  /** Generator with ordinality: one row per word with its 1-based
    * position (posexplode). Restricted to a doc subset to keep the
    * result row count sane at bench scale. */
  def qExplodeWords(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "word")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("word"),
        upper(col("word")).as("word_u"), length(col("word")).as("word_len"))

  /** Null-handling family: nullif / coalesce / ifnull-style defaults +
    * null-aware counting. */
  def qNullFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_discount"), lit(0.0)).as("disc_or_null"))
      .withColumn("disc_defaulted", coalesce(col("disc_or_null"), lit(-1.0)))
      .withColumn("is_discounted", col("disc_or_null").isNotNull)
      .groupBy("is_discounted")
      .agg(count(lit(1)).as("n"),
        count(col("disc_or_null")).as("n_nonnull"),
        dsum(col("disc_defaulted")).as("sum_defaulted"))

  /** Array + map function family over documents/events: set ops on
    * arrays, sort/slice/contains, and map extraction from JSON. */
  def qArrayMapOps(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 25 === 0)
      .withColumn("words", split(col("text"), " "))
      .withColumn("a1", slice(col("words"), 1, 5))
      .withColumn("a2", slice(col("words"), 3, 5))
      .select(
        col("doc_id"),
        size(array_union(col("a1"), col("a2"))).as("n_union"),
        size(array_intersect(col("a1"), col("a2"))).as("n_inter"),
        size(array_except(col("a1"), col("a2"))).as("n_except"),
        element_at(array_sort(col("a1")), 1).as("first_sorted"),
        array_contains(col("words"), "the").as("has_the"),
        size(flatten(array(col("a1"), col("a2")))).as("n_flat"),
        array_join(array_sort(array_distinct(col("a1"))), "|").as("a1_distinct"))

  def qMapOps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("m", from_json(col("props"), lit("map<string,int>")))
      .select(
        col("event_id"),
        size(col("m")).as("n_entries"),
        element_at(map_keys(col("m")), 1).as("first_key"),
        element_at(map_values(col("m")), 1).as("first_val"))

  /** UNPIVOT (melt) — the inverse of [[qPivotSegments]]: lineitem's
    * per-row measures become (metric, value) rows. Spark's native
    * unpivot keeps this a generator-style single pass (no union of N
    * scans); the oracle is the dialect-safe UNION ALL form. */
  def qUnpivotMeasures(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "metric_value")

  /** Array aggregation (collect_list family): per-nation sorted key
    * list. collect_list is merge-order-dependent, so determinism (and
    * oracle parity) comes from sort_array before serialization — the
    * required practice whenever an array agg feeds output. */
  def qArrayAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") % 100 === 0)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        array_join(sort_array(collect_list(col("c_custkey"))), ",").as("custkeys"))

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_array_agg" -> (qArrayAgg _),
    "q_unpivot_measures" -> (qUnpivotMeasures _),
    "q_pivot_segments" -> (qPivotSegments _),
    "q_explode_words" -> (qExplodeWords _),
    "q_null_funcs" -> (qNullFuncs _),
    "q_array_map_ops" -> (qArrayMapOps _),
    "q_map_ops" -> (qMapOps _))

  val oracle: Map[String, String] = Map(
    "q_array_agg" ->
      """SELECT c_nationkey, COUNT(*) AS n,
        |  array_to_string(list_sort(list(c_custkey)), ',') AS custkeys
        |FROM customer WHERE c_custkey % 100 = 0 GROUP BY 1""".stripMargin,
    "q_unpivot_measures" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS metric_value
        |FROM lineitem WHERE l_orderkey % 50 = 0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem WHERE l_orderkey % 50 = 0
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem WHERE l_orderkey % 50 = 0""".stripMargin,
    "q_pivot_segments" ->
      """SELECT c_nationkey,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS AUTOMOBILE,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS BUILDING,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS FURNITURE,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS HOUSEHOLD,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS MACHINERY
        |FROM customer GROUP BY c_nationkey""".stripMargin,
    "q_explode_words" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id % 25 = 0),
        |x AS (SELECT doc_id, t.i AS upos, list_extract(words, t.i) AS uword
        |  FROM w, LATERAL unnest(range(1, len(words) + 1)) AS t(i))
        |SELECT doc_id, CAST(upos AS INTEGER) AS pos, uword AS word,
        |  UPPER(uword) AS word_u, CAST(LENGTH(uword) AS INTEGER) AS word_len
        |FROM x""".stripMargin,
    "q_array_map_ops" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents WHERE doc_id % 25 = 0),
        |a AS (SELECT doc_id, words, list_slice(words, 1, 5) AS a1, list_slice(words, 3, 7) AS a2 FROM w)
        |SELECT doc_id,
        |  CAST(len(list_distinct(list_concat(a1, a2))) AS INTEGER) AS n_union,
        |  CAST(len(list_distinct(list_intersect(a1, a2))) AS INTEGER) AS n_inter,
        |  CAST(len(list_filter(list_distinct(a1), x -> NOT list_contains(a2, x))) AS INTEGER) AS n_except,
        |  list_extract(list_sort(a1), 1) AS first_sorted,
        |  list_contains(words, 'the') AS has_the,
        |  CAST(len(a1) + len(a2) AS INTEGER) AS n_flat,
        |  array_to_string(list_sort(list_distinct(a1)), '|') AS a1_distinct
        |FROM a""".stripMargin,
    "q_map_ops" ->
      """SELECT event_id, 1 AS n_entries, 'k' AS first_key,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS first_val
        |FROM events""".stripMargin,
    "q_null_funcs" ->
      """WITH t AS (
        |  SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc_or_null,
        |    COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_defaulted
        |  FROM lineitem)
        |SELECT (disc_or_null IS NOT NULL) AS is_discounted, COUNT(*) AS n,
        |  COUNT(disc_or_null) AS n_nonnull,
        |  CAST(SUM(CAST(disc_defaulted AS DECIMAL(18,2))) AS DOUBLE) AS sum_defaulted
        |FROM t GROUP BY 1""".stripMargin)
}
