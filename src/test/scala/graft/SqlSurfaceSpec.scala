package graft

import org.apache.spark.sql.functions._

/** The SQL surface: the same engine drives `spark.sql` over registered
  * views (the north star's Spark SQL usage mode), and malformed input
  * degrades per SQL semantics rather than failing the job. */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views matches the DataFrame query result") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem_v")
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem_v
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
      .orderBy("l_returnflag", "l_linestatus").collect()
    val viaDf = operators.Relational.q1PricingSummary(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty")
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("from_json yields null on malformed input instead of failing (G2 decode robustness)") {
    import spark.implicits._
    val df = Seq("""{"k": 7}""", """not json at all""", """{"k": "oops"}""", null)
      .toDF("props")
      .select(from_json(col("props"), lit("k INT")).getField("k").as("k"))
    val ks = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(ks.toSeq == Seq(Some(7), None, None, None))
  }

  test("decimal money pipeline is exact end to end (no float drift vs per-row recompute)") {
    val total = operators.Relational.q1PricingSummary(spark, sf)
      .agg(sum(col("sum_base_price")).as("t")).collect()(0).getDouble(0)
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .agg(dsum(col("l_extendedprice")).as("t")).collect()(0).getDouble(0)
    assert(total == direct)
  }
}
