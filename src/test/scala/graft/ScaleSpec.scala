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

  test("salted rate limiter (constant anonymous hot key) matches the unsalted computation") {
    val salted = Scale.qSaltedRateLimit(spark, sf).collect()
    assert(salted.length == 1) // one token — the reference's constant key
    val direct = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("c")).cast("long").as("n_events"),
        max(col("c")).as("max_calls_1h"),
        sum(when(col("c") > 10, col("c") - 10).otherwise(0L)).cast("long").as("n_denied"),
        sum(when(col("c") > 10, 1).otherwise(0)).cast("long").as("n_hot_buckets"))
      .collect()(0)
    val sr = salted(0)
    for (f <- Seq("n_buckets", "n_events", "max_calls_1h", "n_denied", "n_hot_buckets"))
      assert(sr.getAs[Long](f) == direct.getAs[Long](f), s"$f differs")
    // the phase-1 grouping must include the salt expression (uniform
    // shuffle even when one bucket is hot) — Catalyst inlines the _salt
    // alias into a grouping expression, so match the pmod(hash(...)) form
    val plan = Scale.qSaltedRateLimit(spark, sf).queryExecution.optimizedPlan.toString
    assert(plan.contains("pmod(hash("), "salt expression missing from the phase-1 aggregate")
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    // 95% of the left rows share one key — the runtime complement to the
    // STATIC salting patterns above: no query rewrite, AQE re-plans the
    // oversized shuffle partition into parallel splits.
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(200000).select(
        when(col("id") % 100 < 95, 7L).otherwise(col("id") % 1000).as("k"), col("id").as("v"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k").select(sum(col("v") + col("w")).as("s"))
      val total = j.collect()(0).getLong(0)
      assert(total > 0)
      assert(j.queryExecution.executedPlan.toString.contains("skew=true"),
        "AQE did not mark the skewed join")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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

  test("backfill via dynamic partition overwrite: one month recomputed, every other partition untouched") {
    // the 100 TB BACKFILL primitive: recomputing one bad day/month of a
    // partitioned fact must replace exactly that partition — static
    // overwrite would truncate the whole table, and append would
    // double-count. partitionOverwriteMode=dynamic scopes the overwrite
    // to the partitions present in the written data.
    val keep = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    val tmp = java.nio.file.Files.createTempDirectory("graft_backfill").toString + "/fact"
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // private copy of the month-partitioned fact (never mutate the
      // shared at-rest index: its fingerprint covers the SOURCE, not
      // index content, so an in-place edit would serve silently wrong)
      spark.read.parquet(Scale.monthPartitionedLineitem(spark, sf))
        .write.partitionBy("ship_month").parquet(tmp)
      val month = "1996-03"
      val othersBefore = spark.read.parquet(tmp)
        .filter(col("ship_month") =!= month).persist()
      val nOthers = othersBefore.count()
      val nMonth = spark.read.parquet(tmp).filter(col("ship_month") === month).count()
      assert(nMonth > 0, "backfill month empty — test corpus changed?")
      // the recompute: zero the discount for the bad month only
      spark.read.parquet(tmp).filter(col("ship_month") === month)
        .withColumn("l_discount", lit(0.0))
        .write.mode("overwrite").partitionBy("ship_month").parquet(tmp)
      val after = spark.read.parquet(tmp).persist()
      try {
        val othersAfter = after.filter(col("ship_month") =!= month)
        assert(othersAfter.exceptAll(othersBefore).isEmpty &&
          othersBefore.exceptAll(othersAfter).isEmpty,
          "untouched partitions changed under dynamic overwrite")
        val m = after.filter(col("ship_month") === month)
        assert(m.count() == nMonth, "backfilled partition lost rows")
        assert(m.filter(col("l_discount") =!= 0.0).isEmpty, "recompute not applied")
        assert(after.count() == nOthers + nMonth)
      } finally { after.unpersist(); othersBefore.unpersist(); () }
    } finally keep match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("ANALYZE TABLE feeds exact row and column stats to the optimizer's cost model") {
    // the planner-quality face of the at-rest layout: CBO join ordering
    // and broadcast decisions are only as good as catalog statistics, so
    // the warehouse tables must actually carry them after ANALYZE.
    val keep = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val t = Scale.bucketedTable(spark, sf, "orders", "o_orderkey")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_orderpriority")
      val stats = spark.table(t).queryExecution.optimizedPlan.stats
      val exact = Tables.orders(spark, sf).count()
      assert(stats.rowCount.contains(BigInt(exact)),
        s"catalog rowCount ${stats.rowCount} != exact $exact")
      assert(stats.attributeStats.nonEmpty, "column-level stats missing after ANALYZE")
      val ndv = stats.attributeStats.find(_._1.name == "o_orderkey")
        .flatMap(_._2.distinctCount)
      assert(ndv.exists(n => n.toLong >= exact * 9 / 10),
        s"o_orderkey NDV $ndv implausible for a key column of $exact rows")
    } finally keep match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("memory-constrained windowed aggregation spills to disk and stays correct") {
    // The 100 TB story must survive memory pressure, not just have the
    // right shuffle shapes: force WindowExec's row buffer (the same
    // spillable ExternalAppendOnlyUnsafeRowArray structure the as-of
    // join and SortMergeJoin use) down to a few rows so a running
    // aggregation over full partitions has to spill, and prove the
    // result is bit-identical to the unconstrained plan with nonzero
    // spill metrics captured.
    import org.apache.spark.sql.expressions.Window
    val keep = Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.windowExec.buffer.spill.threshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    val w = Window.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")
    def running = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity")).over(w).as("run_qty"),
        row_number().over(w).as("rn"))
      .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    val baseline = running.collect()
    val spilled = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "16")
      spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "128")
      val constrained = running.collect()
      assert(constrained.length == baseline.length)
      constrained.zip(baseline).foreach { case (a, b) =>
        assert(a == b, s"spilled run diverged: $a != $b") }
      var tries = 0
      while (spilled.get == 0 && tries < 40) { Thread.sleep(100); tries += 1 }
      assert(spilled.get > 0, "expected nonzero spill metrics under constrained window buffer")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      keep.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffled join") {
    // At 100 TB a selective dim filter should reach the fact scan even
    // when the dim is too big to broadcast: Spark's InjectRuntimeFilter
    // builds a bloom filter from the filtered creation side and applies
    // might_contain on the fact side. On by default but gated behind a
    // 10 GB application-side scan threshold — lower the gates to prove
    // the engine configuration exercises it, and that results match the
    // unfiltered-plan baseline.
    val keep = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join shape
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val sel = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val j = li.join(sel, col("l_orderkey") === col("o_orderkey"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n${optimized.take(900)}")
      val baseline = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == baseline, "bloom-filtered join changed the result")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skew audit: totals conserved, gini matches an exact driver-side recompute") {
    val g = Scale.qSkewAudit(spark, sf).cache()
    try {
      val row = g.collect()(0)
      val li = Tables.lineitem(spark, sf)
      assert(row.getAs[Long]("total") == li.count())
      // independent per-key recompute on the driver (key space is small)
      val counts = li.groupBy("l_suppkey").count()
        .collect().map(_.getAs[Long]("count")).sorted
      assert(row.getAs[Long]("n_keys") == counts.length)
      assert(row.getAs[Long]("max_n") == counts.last)
      val k = counts.length.toLong
      val tot = counts.sum
      val trn = counts.zipWithIndex.map { case (n, i) => 2L * (i + 1) * n }.sum
      val gini = (trn.toDouble - (k + 1).toDouble * tot) / (k.toDouble * tot)
      assert(math.abs(row.getAs[Double]("gini") - gini) < 1e-6,
        s"gini ${row.getAs[Double]("gini")} != $gini")
      assert(row.getAs[Double]("gini") >= 0 && row.getAs[Double]("gini") < 1)
      // no single-partition Window anywhere (the scale-safe rank pattern)
      assert(!g.queryExecution.executedPlan.toString.contains("Window"),
        "skew audit must not use a Window for the global rank")
    } finally { g.unpersist(); CacheTracker.releaseAll() }
  }
}
