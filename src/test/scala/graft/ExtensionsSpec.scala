package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** GraftExtensions must wire the full custom surface (planner strategy +
  * codegen functions) into a session built with `withExtensions` — the
  * deployment path, equivalent to setting `spark.sql.extensions` — with
  * NO per-query register calls. */
class ExtensionsSpec extends SparkSpec {

  test("a session built with GraftExtensions resolves graft functions and plans AsOfJoin natively") {
    spark // force the shared session first so we can restore it
    val old = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // functions resolve from SQL text without any register() call
      val r = s2.sql(
        """SELECT rolling_hash('abc') AS h,
          |  cosine_sim(array(1.0d, 0d), array(1.0d, 0d)) AS c,
          |  hyperplane_codes(array(1.0d, 0d), 1, 4) AS hp,
          |  minhash_perms(array(7L)) AS mh,
          |  cdc_boundaries('abcdef') AS cb""".stripMargin).collect()(0)
      assert(r.getAs[Long]("h") == graft.functions.RollingHash.hash("abc"))
      assert(r.getAs[Double]("c") == 1.0)
      assert(r.getAs[scala.collection.Seq[Long]]("hp").length == 1)
      assert(r.getAs[scala.collection.Seq[Long]]("mh").length == 16)
      // the injected planner strategy handles the native as-of node
      // (no AsOfStrategy.register on s2)
      import s2.implicits._
      val l = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
      val rt = Seq((10L, 50L, 1L, 42L)).toDF("rk", "rt", "tie", "payload")
      val lp = l.queryExecution.analyzed
      val rp = rt.queryExecution.analyzed
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
        p.output.find(_.name == n).get
      val out = org.apache.spark.sql.graftbridge.Bridge.ofRows(s2,
        graft.plans.AsOfJoin(lp, rp, attr(lp, "k"), attr(lp, "t"),
          attr(rp, "rk"), attr(rp, "rt"), attr(rp, "tie")))
        .select(col("id"), col("payload")).collect()
      assert(out.length == 1 && out(0).getLong(1) == 42L)
    } finally {
      old.foreach { o =>
        SparkSession.setDefaultSession(o)
        SparkSession.setActiveSession(o)
      }
    }
  }
}
