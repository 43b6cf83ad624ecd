package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deeper TPC-H-style relational coverage over the available columns:
  * EXISTS/correlated patterns, nation-pair volume analysis, conditional
  * (CASE) aggregation ratios, bracketed OR-of-ANDs predicates, and
  * scalar-subquery comparisons — the query shapes Catalyst's subquery
  * decorrelation, semi-join planning, and predicate simplification exist
  * for. All oracle-checked.
  */
object TpchDeep {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def discCol: org.apache.spark.sql.Column =
    dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  /** Q4-style: orders having a late-shipping lineitem (EXISTS → left-semi
    * join; Catalyst plans the correlated EXISTS as a semi join). */
  def q4PriorityExists(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val late = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(late,
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q7-style volume shipping between two nations (either direction),
    * grouped by supplier/customer nation and ship year. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val n1 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(sum(discCol).cast("double").as("revenue"))
  }

  /** Q14-style promo revenue share per month: conditional aggregation,
    * exact-decimal numerator/denominator → deterministic double ratio. */
  def q14PromoShare(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).as("y"), month(col("l_shipdate")).as("m"))
      .agg(
        (sum(when(col("p_type") === "PROMO", discCol).otherwise(lit(0).cast(DecimalType(18, 2))))
          .cast("double") * 100.0 /
         sum(discCol).cast("double")).as("promo_share"),
        count(lit(1)).as("n"))

  /** Q19-style bracketed predicate: OR of (brand × size-range ×
    * qty-range) conjunction groups — Catalyst folds these into a single
    * scan filter. */
  def q19Brackets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 40) &&
          col("l_quantity").between(20, 50)))
      .agg(sum(discCol).cast("double").as("revenue"), count(lit(1)).as("n"))

  /** Customers above their nation's average balance — correlated scalar
    * subquery shape, decorrelated to an aggregate + join. Exact-decimal
    * average so the threshold is engine-stable. */
  def qAboveAvgCustomers(s: SparkSession, d: String): DataFrame = {
    val natAvg = Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nk"))
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("nation_avg"))
    Tables.customer(s, d)
      .join(natAvg, col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        col("nation_avg"))
  }

  /** Q22-style: wealthy-but-idle customers — scalar subquery (global
    * positive-balance average) + anti join (no orders), counted per
    * nation. */
  def q22IdleCustomers(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val globalAvg = c.filter(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    c.crossJoin(broadcast(globalAvg))
      .filter(col("c_acctbal") > col("avg_bal"))
      // anti against recent orders — "idle lately", keeps the path live
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-06-01 00:00:00")))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
  }

  /** Q10-style returned-item report: revenue lost to returns per
    * customer, top 20 — join + conditional filter + agg + deterministic
    * top-k. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(discCol).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  /** Q13-style: distribution of customers by order count (left join so
    * zero-order customers land in the 0 bucket, then a second
    * aggregation over the counts). */
  def q13OrderCountDist(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))

  /** Q18-style large-volume customers: orders whose total quantity
    * exceeds a threshold (aggregate-filtered IN-subquery shape). */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_ordercount_dist" -> (q13OrderCountDist _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q10_returned_items" -> (q10ReturnedItems _),
    "q4_priority_exists" -> (q4PriorityExists _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q14_promo_share" -> (q14PromoShare _),
    "q19_brackets" -> (q19Brackets _),
    "q_above_avg_customers" -> (qAboveAvgCustomers _),
    "q22_idle_customers" -> (q22IdleCustomers _))

  private val discSql = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  val oracle: Map[String, String] = Map(
    "q13_ordercount_dist" ->
      """WITH cc AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist FROM cc GROUP BY c_count""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name, CAST(SUM($discSql) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |  CAST(SUM($discSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3""".stripMargin,
    "q14_promo_share" ->
      s"""SELECT CAST(year(l_shipdate) AS INTEGER) AS y, CAST(month(l_shipdate) AS INTEGER) AS m,
         |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $discSql ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |    * 100.0 / CAST(SUM($discSql) AS DOUBLE) AS promo_share,
         |  COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1, 2""".stripMargin,
    "q19_brackets" ->
      s"""SELECT CAST(SUM($discSql) AS DOUBLE) AS revenue, COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 20 AND 50)""".stripMargin,
    "q_above_avg_customers" ->
      """WITH na AS (
        |  SELECT c_nationkey AS nk,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS nation_avg
        |  FROM customer GROUP BY 1)
        |SELECT c_custkey, c_nationkey, c_acctbal, nation_avg
        |FROM customer JOIN na ON c_nationkey = nk
        |WHERE c_acctbal > nation_avg""".stripMargin,
    "q22_idle_customers" ->
      """WITH g AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, g
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
        |GROUP BY c_nationkey""".stripMargin)
}
