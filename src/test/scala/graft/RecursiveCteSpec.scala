package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Spark 4 recursive-CTE surface: q_graph_reach's WITH RECURSIVE BFS
  * must agree exactly — min depth AND bounded path multiplicity — with
  * an explicit DataFrame frontier-expansion loop.
  */
class RecursiveCteSpec extends SparkSpec {

  test("recursive CTE reach equals an explicit 3-hop BFS loop (depths and path counts)") {
    val got = Dedup.qGraphReach(spark, sf).cache()
    try {
      val pairs = Dedup.qDedupLshPairs(spark, sf).select("a_id", "b_id").cache()
      val edges = pairs
        .unionByName(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
        .toDF("src", "dst").cache()
      // path-multiplicity BFS: the frontier is NOT deduplicated, so row
      // counts per doc are exactly the bounded path counts
      var frontier = edges.select(col("src").as("doc_id")).distinct()
        .filter(col("doc_id") % 20 === 0).withColumn("depth", lit(0))
      var all = frontier
      for (dep <- 1 to 3) {
        frontier = frontier.join(edges, frontier("doc_id") === edges("src"))
          .select(col("dst").as("doc_id")).withColumn("depth", lit(dep))
        all = all.unionByName(frontier)
      }
      val ref = all.groupBy("doc_id")
        .agg(min("depth").as("depth"), count(lit(1)).as("n_paths"))
      assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0,
        "recursive CTE result differs from the explicit BFS loop")
      // sanity on the shape: seeds sit at depth 0, expansion reached others
      assert(got.filter(col("depth") === 0).count() > 0)
      assert(got.filter(col("depth") > 0).count() > 0)
      pairs.unpersist(); edges.unpersist()
    } finally { got.unpersist(); CacheTracker.releaseAll() }
  }
}
