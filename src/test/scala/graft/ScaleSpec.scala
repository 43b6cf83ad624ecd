package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._

/** Scale-path proofs: salted aggregation plan shape and bucketed
  * co-located joins (shuffle elimination). */
class ScaleSpec extends SparkSpec {

  test("salted aggregation matches the direct groupBy exactly") {
    val salted = Scale.qSaltedAgg(spark, sf)
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.sameElements(direct))
  }

  test("salted aggregation plan has two aggregation exchanges (phase 1 uniform, phase 2 tiny)") {
    val plan = Scale.qSaltedAgg(spark, sf).queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt") || plan.contains("Aggregate"))
    val physical = Scale.qSaltedAgg(spark, sf).queryExecution.executedPlan.toString
    assert(physical.contains("HashAggregate"))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — clear them or CTAS refuses
    for (t <- Seq("graft_bkt_orders", "graft_bkt_lineitem")) {
      val dir = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("graft_bkt_orders")
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("graft_bkt_lineitem")
    val j = spark.table("graft_bkt_orders")
      .join(spark.table("graft_bkt_lineitem").hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    // co-located buckets: the sort-merge join must not re-shuffle either side
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    assert(j.count() == Tables.lineitem(spark, sf).count())
  }
}
