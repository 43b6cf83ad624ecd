package graft

import org.apache.spark.sql.functions._

/** Hive-catalog support (the north star's "Spark SQL + HiveContext") and
  * observe()-based audit metrics (G16, gateway.ts:78-81, 315-316). */
class HiveAuditSpec extends SparkSpec {

  test("session runs with the Hive catalog and round-trips a Hive table") {
    assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
    spark.sql("DROP TABLE IF EXISTS graft_hive_nation")
    val dir = new java.io.File("/tmp/graft_warehouse/graft_hive_nation")
    if (dir.exists()) new scala.reflect.io.Directory(dir).deleteRecursively()
    Tables.nation(spark, sf).write.mode("overwrite").saveAsTable("graft_hive_nation")
    val back = spark.sql("SELECT COUNT(*) AS n FROM graft_hive_nation").collect()(0).getLong(0)
    assert(back == 25)
    assert(spark.catalog.tableExists("graft_hive_nation"))
  }

  test("observe() surfaces audit metrics on a batch query (G16 analogue)") {
    val df = Tables.events(spark, sf)
      .observe("audit",
        count(lit(1)).as("n_requests"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .filter(col("event_type") =!= "nonexistent")
    df.collect()
    val metrics = df.queryExecution.observedMetrics("audit")
    assert(metrics.getAs[Long]("n_requests") == 1000L)
    assert(metrics.getAs[Double]("total_value") > 0)
  }
}
