package graft

import java.nio.file.Files

import graft.functions.Msgpack
import graft.operators.Advanced
import org.apache.spark.sql.functions._

/** Advanced-surface checks: approx-distinct error bound, as-of join
  * semantics, msgpack round-trips (the reference's wire format,
  * gateway.ts:189/317), and source/sink format round-trips. */
class AdvancedSpec extends SparkSpec {

  test("rfm segmentation: cells recompute from a driver-side quintile replay, segments consistent") {
    val got = Advanced.qRfmSegments(spark, sf).collect()
    CacheTracker.releaseAll()
    assert(got.nonEmpty)
    // driver replay: per-customer metrics, quintile bounds, scores, cells
    val rows = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.get(1) match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
          case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate.toEpochDay
          case t: java.time.LocalDateTime => t.toLocalDate.toEpochDay
        }, r.getLong(2)))
    val maxD = rows.map(_._2).max
    val cust = rows.groupBy(_._1).map { case (k, xs) =>
      (k, -(maxD - xs.map(_._2).max), xs.length.toLong, xs.map(_._3).sum)
    }.toSeq
    val n = cust.size.toLong
    def bounds(metric: ((Long, Long, Long, Long)) => Long): Seq[Long] = {
      val sorted = cust.sortBy(c => (metric(c), c._1)).map(metric)
      (1 to 4).map(k => sorted((k * n / 5 - 1).toInt))
    }
    val (rb, fb, mb) = (bounds(_._2), bounds(_._3), bounds(_._4))
    def score(v: Long, bs: Seq[Long]) = 1 + bs.count(v > _)
    val want = cust.map { c =>
      val (rs, fs, ms) = (score(c._2, rb), score(c._3, fb), score(c._4, mb))
      val seg =
        if (rs >= 4 && fs >= 4 && ms >= 4) "champion"
        else if (ms == 5) "big_spender"
        else if (fs >= 4) "loyal"
        else if (rs <= 2 && fs >= 3) "at_risk"
        else if (rs <= 2) "hibernating"
        else "regular"
      ((rs, fs, ms, seg), c._4)
    }.groupBy(_._1).map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._2).sum) }
    assert(got.map(_.getAs[Long]("n_customers")).sum == n, "cells partition the customers")
    got.foreach { r =>
      val key = (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"),
        r.getAs[Int]("m_score"), r.getAs[String]("segment"))
      val (nc, sm) = want(key)
      assert(r.getAs[Long]("n_customers") == nc, s"$key count")
      assert(r.getAs[Double]("avg_monetary") ==
        BigDecimal(sm.toDouble / nc / 100.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"$key avg")
    }
    assert(got.length == want.size)
  }

  test("jackknife: SE matches a driver-side pinned-order fold, estimates near the plain mean") {
    val r = Advanced.qJackknife(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    val cents = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(x => (x.getAs[Number](0).longValue % 32, x.getLong(1)))
    val g = cents.groupBy(_._1).map { case (b, xs) => b -> (xs.length.toLong, xs.map(_._2).sum) }
    val (n, s) = (g.values.map(_._1).sum, g.values.map(_._2).sum)
    val loo = g.toSeq.sortBy(_._1).map { case (_, (nb, sb)) => (s - sb).toDouble / (n - nb) / 100.0 }
    val meanDot = loo.foldLeft(0.0)(_ + _) / loo.length
    val jkVar = loo.map(x => (x - meanDot) * (x - meanDot)).foldLeft(0.0)(_ + _) *
      (loo.length - 1) / loo.length
    assert(row.getAs[Long]("n") == n && row.getAs[Long]("n_groups") == 32)
    assert(row.getAs[Double]("jk_mean") ==
      BigDecimal(meanDot).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getAs[Double]("jk_se") ==
      BigDecimal(math.sqrt(jkVar)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // jackknife mean of the mean statistic should sit near the plain mean
    assert(math.abs(row.getAs[Double]("jk_mean") - row.getAs[Double]("mean_price"))
      < row.getAs[Double]("jk_se"))
  }

  test("psi drift: non-negative, both arms populated, zero for identical distributions") {
    val r = Advanced.qPsiDrift(spark, sf).collect()
    assert(r.length == 5)
    r.foreach { row =>
      assert(row.getAs[Long]("n_ref_total") > 0 && row.getAs[Long]("n_cur_total") > 0)
      // every PSI term (p-q)·ln(p/q) is >= 0, so the sum must be
      assert(row.getAs[Double]("psi") >= 0.0, s"PSI negative: $row")
    }
    // degenerate check: comparing a distribution against itself gives PSI 0
    import spark.implicits._
    val same = Seq((1, 10L, 10L), (2, 20L, 20L)).toDF("bucket", "n_ref", "n_cur")
    val z = same.agg(expr(
      """aggregate(sort_array(collect_list(struct(bucket,
        | (CAST(n_ref + 1 AS DOUBLE) / 32.0 - CAST(n_cur + 1 AS DOUBLE) / 32.0)
        |  * ln((CAST(n_ref + 1 AS DOUBLE) / 32.0) / (CAST(n_cur + 1 AS DOUBLE) / 32.0)) AS term))),
        | CAST(0.0 AS DOUBLE), (a, e) -> a + e.term)""".stripMargin.replace("\n", "")).as("psi"))
      .collect()(0).getAs[Double]("psi")
    assert(z == 0.0)
  }

  test("association rules: metrics recompute from pair/singleton counts, ordering canonical") {
    val r = Advanced.qAssocRules(spark, sf).collect()
    assert(r.nonEmpty)
    // independent basket universe count for the support denominator
    val p = Tables.part(spark, sf).select(col("p_partkey"), col("p_brand"))
    val n = Tables.lineitem(spark, sf).join(p, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey").distinct().count()
    r.foreach { row =>
      val (a, b) = (row.getAs[String]("brand_a"), row.getAs[String]("brand_b"))
      assert(a < b, s"pair not canonical: $a, $b")
      val (nab, na, nb) = (row.getAs[Long]("n_ab"), row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
      assert(nab <= math.min(na, nb), "pair count exceeds a singleton count")
      assert(row.getAs[Double]("support") ==
        BigDecimal(nab.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(row.getAs[Double]("confidence") ==
        BigDecimal(nab.toDouble / na).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(row.getAs[Double]("lift") ==
        BigDecimal(nab.toDouble * n / (na.toDouble * nb))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("snapshot diff: per-status totals equal the injected mutation predicate counts") {
    val r = Advanced.qSnapshotDiff(spark, sf).collect()
    val byStatus = r.groupBy(_.getAs[String]("status"))
      .map { case (s0, rows) => s0 -> rows.map(_.getAs[Long]("n_rows")).sum }
    val keys = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getAs[Number](0).longValue)
    val removed = keys.count(_ % 13 == 5).toLong
    val added = keys.count(_ % 100 == 7).toLong
    val changed = keys.count(k => k % 10 == 3 && k % 13 != 5).toLong
    assert(byStatus("removed") == removed)
    assert(byStatus("added") == added)
    assert(byStatus("changed") == changed)
    assert(byStatus("unchanged") == keys.length - removed - changed)
  }

  test("target encoding: LOO mean recomputes from raw orders and excludes the row's own target") {
    val r = Advanced.qTargetEncode(spark, sf).collect()
    assert(r.nonEmpty)
    val raw = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect().map(x => (x.getAs[Number](0).longValue, x.getString(1), x.getLong(2)))
    val byPrio = raw.groupBy(_._2).map { case (p0, xs) =>
      p0 -> (xs.map(_._3).sum, xs.length.toLong) }
    r.foreach { row =>
      val k = row.getAs[Number]("o_orderkey").longValue
      val (sum, n) = byPrio(row.getAs[String]("o_orderpriority"))
      val own = raw.find(_._1 == k).get._3
      val want = BigDecimal((sum - own).toDouble / (n - 1) / 100.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getAs[Long]("n_g") == n)
      assert(row.getAs[Double]("loo_enc") == want, s"key $k")
    }
  }

  test("equi-depth histogram: 16 buckets within one row of equal depth, ordered disjoint ranges") {
    val r = Advanced.qEquidepthHist(spark, sf).collect().sortBy(_.getAs[Int]("bucket"))
    assert(r.length == 16)
    assert(r.map(_.getAs[Int]("bucket")).toSeq == (0 until 16))
    val sizes = r.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1, s"equi-depth violated: ${sizes.toSeq}")
    assert(sizes.sum == Tables.orders(spark, sf).count())
    r.foreach(row => assert(row.getAs[Long]("lo_cents") <= row.getAs[Long]("hi_cents")))
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents"),
        "bucket ranges overlap")
      case _ =>
    }
  }

  test("approx_count_distinct stays within the configured error of exact") {
    val r = Advanced.qApproxDistinct(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Boolean]("approx_orders_ok"), s"orders HLL error > 10%: $row")
      assert(row.getAs[Boolean]("approx_parts_ok"), s"parts HLL error > 10%: $row")
    }
    // raw error bound on the sketch itself (independent of the boolean)
    val raw = Tables.lineitem(spark, sf)
      .agg(approx_count_distinct(col("l_orderkey")).as("a"),
        countDistinct(col("l_orderkey")).as("e")).collect()(0)
    val (a, e) = (raw.getAs[Long]("a"), raw.getAs[Long]("e"))
    assert(math.abs(a - e).toDouble / e < 0.15, s"approx $a vs exact $e")
  }

  test("as-of join picks the latest order at or before the cutoff, null when none") {
    val r = Advanced.qAsofJoin(spark, sf).cache()
    // one row per event
    assert(r.count() == Tables.events(spark, sf).count())
    assert(r.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
    // every matched date respects its event's cutoff (recompute and compare)
    val ev = Tables.events(spark, sf).select(col("event_id"),
      expr("ts - make_interval(0, 0, 0, 8000 + (event_id * 13) % 6000, 0, 0, 0)").as("cutoff"))
    assert(r.join(ev, "event_id")
      .filter(col("asof_orderdate").isNotNull && col("asof_orderdate") > col("cutoff"))
      .count() == 0)
    // both matched and unmatched outcomes occur
    assert(r.filter(col("asof_orderkey").isNull).count() > 0)
    assert(r.filter(col("asof_orderkey").isNotNull).count() > 0)
  }

  test("msgpack round-trips the gateway envelope shapes") {
    val envelope = Map(
      "mod" -> "account", "fun" -> "login",
      "arg" -> Seq(1L, 2L, "three", 4.5, null, true),
      "ctx" -> Map("wxuser" -> ("x" * 28)))
    assert(Msgpack.decode(Msgpack.encode(envelope)) == envelope)
    val response = Map("sn" -> ("s" * 88), "payload" -> "compressed-bytes".getBytes("UTF-8"))
    val back = Msgpack.decode(Msgpack.encode(response)).asInstanceOf[Map[Any, Any]]
    assert(back("sn") == "s" * 88)
    assert(back("payload").asInstanceOf[Array[Byte]].sameElements("compressed-bytes".getBytes("UTF-8")))
  }

  test("msgpack handles integer width boundaries and long strings") {
    val vals = Seq(0L, 127L, 128L, -32L, -33L, 255L, 256L, 65535L, 65536L,
      -129L, 4294967296L, Long.MaxValue, Long.MinValue)
    vals.foreach(v => assert(Msgpack.decode(Msgpack.encode(v)) == v, s"for $v"))
    val long = "α" * 40000 // multibyte, str32 path
    assert(Msgpack.decode(Msgpack.encode(long)) == long)
    assert(Msgpack.decode(Msgpack.encode(Seq.fill(20)("x"))) == Seq.fill(20)("x"))
  }

  test("csv/json/orc sinks round-trip the events table") {
    val dir = Files.createTempDirectory("graft_sources").toString
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value", "props")
    val n = ev.count()
    for (fmt <- Seq("csv", "json", "orc")) {
      val path = s"$dir/$fmt"
      val w = ev.write.mode("overwrite").format(fmt)
      (if (fmt == "csv") w.option("header", "true") else w).save(path)
      val r = spark.read.format(fmt)
      val back = (if (fmt == "csv") r.option("header", "true").option("inferSchema", "true") else r).load(path)
      assert(back.count() == n, s"$fmt row count")
      assert(back.columns.sorted.sameElements(ev.columns.sorted), s"$fmt columns")
    }
    // partitioned parquet write prunes partitions on read
    ev.write.mode("overwrite").partitionBy("event_type").parquet(s"$dir/part")
    val pruned = spark.read.parquet(s"$dir/part").filter(col("event_type") === "click")
    assert(pruned.count() == ev.filter(col("event_type") === "click").count())
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"))
  }

  test("parquet sink codecs: zstd/snappy/gzip all round-trip; compression is real") {
    val dir = java.nio.file.Files.createTempDirectory("graft_codecs").toString
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    val sizes = Seq("none", "snappy", "gzip", "zstd").map { codec =>
      val path = s"$dir/$codec"
      li.write.mode("overwrite").option("compression", codec).parquet(path)
      assert(spark.read.parquet(path).count() == n, s"$codec roundtrip")
      val size = new java.io.File(path).listFiles.filter(_.getName.endsWith(".parquet"))
        .map(_.length).sum
      codec -> size
    }.toMap
    assert(sizes("zstd") < sizes("none"))
    assert(sizes("gzip") < sizes("none"))
  }

  test("hll sketches are mergeable: sharded union tracks the direct whole-column estimate") {
    // the property that makes sketch-at-rest work at 100 TB: unioning the
    // 8 per-shard sketches sees the same hash set the one-pass sketch
    // sees. The estimates are NOT bit-identical — a direct sketch answers
    // with the HIP estimator, which a union invalidates (DataSketches
    // falls back to the composite estimator) — but both sit within the
    // lgK=12 error envelope, so they agree to ~1%.
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 12))").as("direct_est"))
    val sharded = li.groupBy(col("l_returnflag"), (col("l_orderkey") % 8).as("shard"))
      .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk"))
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("union_est"))
    assert(direct.join(sharded, "l_returnflag")
      .filter(abs(col("direct_est") - col("union_est")).cast("double")
        / col("direct_est") > 0.03).count() == 0)
    // and the shipped query's error contract holds
    assert(Advanced.qHllSketchUnion(spark, sf).filter(!col("union_ok")).count() == 0)
  }

  test("event funnel: stages shrink monotonically and ordering is enforced") {
    val f = operators.EventWindows.qEventFunnel(spark, sf).orderBy("stage").collect()
    assert(f.map(_.getAs[String]("stage")).toSeq == Seq("1_view", "2_click", "3_purchase"))
    val ns = f.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), s"funnel must shrink: ${ns.toSeq}")
    assert(ns(2) > 0, "live purchase path expected in the corpus")
    assert(f.map(_.getAs[Double]("conversion")).forall(c => c > 0 && c <= 1.0))
    // ordering matters: without the ts >= previous-stage constraint the
    // click stage would count every view∩click user — the constrained
    // count must be no larger
    val ev = Tables.events(spark, sf)
    val unordered = ev.filter(col("event_type") === "view").select("user_id").distinct()
      .join(ev.filter(col("event_type") === "click").select("user_id").distinct(), "user_id")
      .count()
    assert(ns(1) <= unordered)
  }

  test("acf: pair counts are dense-calendar exact and r stays in [-1, 1]") {
    val acf = operators.EventWindows.qAcf(spark, sf).collect()
    assert(acf.nonEmpty)
    // dense synthetic calendar: every (type, lag) has n_days - lag pairs
    val nDays = Tables.events(spark, sf)
      .select(expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)")).distinct().count()
    acf.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == nDays - r.getAs[Long]("lag_d"), r.toString)
      val v = r.getAs[Double]("acf")
      if (!r.isNullAt(r.fieldIndex("acf"))) assert(math.abs(v) <= 1.0 + 1e-9, r.toString)
    }
  }

  test("cusum: replaying the recurrence on collected dailies matches exactly") {
    val got = operators.EventWindows.qCusum(spark, sf)
      .filter(col("event_type") === "click").orderBy("day_idx").collect()
    val daily = Tables.events(spark, sf).filter(col("event_type") === "click")
      .select(expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").as("d"))
      .groupBy("d").count().orderBy("d").collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("count")))
    val mu = daily.map(_._2).sum * 1000000L / daily.length
    var sp = 0L; var sn = 0L
    daily.zip(got).foreach { case ((d, n), r) =>
      sp = math.max(0L, sp + n * 1000000L - mu)
      sn = math.max(0L, sn + mu - n * 1000000L)
      assert(r.getAs[Long]("day_idx") == d && r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("cusum_pos") == sp && r.getAs[Long]("cusum_neg") == sn, r.toString)
      assert(r.getAs[Boolean]("is_alarm") == (sp > 3 * mu || sn > 3 * mu))
    }
  }

  test("mann-whitney: U from rank sums equals brute-force pair wins with half-ties") {
    val got = operators.EventWindows.qMannWhitney(spark, sf).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("u_a_x2") + r.getAs[Long]("u_b_x2")
        == 2 * r.getAs[Long]("n_a") * r.getAs[Long]("n_b"), r.toString)
      val auc = r.getAs[Double]("auc_ab")
      assert(auc >= 0.0 && auc <= 1.0)
    }
    // brute-force one type: U_a = #(a > b) + #(a == b)/2 over all cross pairs
    val vs = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(expr("CAST(user_id % 2 AS INT)").as("arm"),
        col("value").cast("decimal(18,2)").as("v")).collect()
      .map(r => (r.getInt(0), r.getDecimal(1)))
    val a = vs.filter(_._1 == 0).map(_._2); val b = vs.filter(_._1 == 1).map(_._2)
    val uX2 = a.iterator.map(x =>
      2L * b.count(y => x.compareTo(y) > 0) + b.count(y => x.compareTo(y) == 0)).sum
    val r = got.find(_.getAs[String]("event_type") == "purchase").get
    assert(r.getAs[Long]("u_a_x2") == uX2,
      s"rank-sum U ${r.getAs[Long]("u_a_x2")} != brute $uX2")
  }

  test("seq trigrams: totals reconcile and confidences partition each prefix") {
    val tri = operators.EventWindows.qSeqTrigrams(spark, sf).collect()
    // total trigram occurrences = sum over users of max(0, n_events - 2)
    val expected = Tables.events(spark, sf).groupBy("user_id").count()
      .select(sum(greatest(col("count") - 2, lit(0L)))).collect()(0).getLong(0)
    assert(tri.map(_.getAs[Long]("n_tri")).sum == expected)
    assert(tri.forall(r =>
      r.getAs[Long]("support_ppm") == r.getAs[Long]("n_tri") * 1000000L / expected))
    // per prefix: n_tri sums to n_big, floor-div confidences nearly partition 1e6
    tri.groupBy(r => (r.getAs[String]("t1"), r.getAs[String]("t2"))).foreach {
      case (_, rows) =>
        assert(rows.map(_.getAs[Long]("n_tri")).sum == rows.head.getAs[Long]("n_big"))
        val confSum = rows.map(_.getAs[Long]("conf_ppm")).sum
        assert(confSum <= 1000000L && confSum > 1000000L - rows.size, rows.head.toString)
    }
  }

  test("hits: two-round bipartite message passing matches independent recompute") {
    val got = operators.EventWindows.qHits(spark, sf).collect()
    val edges = Tables.events(spark, sf).select("user_id", "event_type").distinct()
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val a1 = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val h1 = edges.groupBy(_._1).view.mapValues(_.map(e => a1(e._2)).sum).toMap
    val a2 = edges.groupBy(_._2).view.mapValues(_.map(e => h1(e._1)).sum).toMap
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_users") == a1(et))
      assert(r.getAs[Long]("auth2") == a2(et), s"$et: $r")
      assert(r.getAs[Long]("max_hub") == edges.filter(_._2 == et).map(e => h1(e._1)).max)
    }
    val totPpm = got.map(_.getAs[Long]("auth2_ppm")).sum
    assert(totPpm <= 1000000L && totPpm > 1000000L - got.length)
  }

  test("calibration bins: partition the corpus and bound their members' scores") {
    val bins = operators.TextAnalysis.qCalibration(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == nDocs)
    bins.foreach { r =>
      val bin = r.getAs[Long]("bin_id"); val mean = r.getAs[Long]("mean_score_ppm")
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n_docs"))
      // floor(score·20/1e6) = bin ⇒ every member score (and thus the
      // bin mean) lies in [bin·50000, (bin+1)·50000)
      assert(mean >= bin * 50000 && mean < (bin + 1) * 50000, r.toString)
      val rate = r.getAs[Double]("pos_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("gini: exact match against a driver-side sorted-vector recompute") {
    val got = operators.EventWindows.qGini(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val counts = Tables.events(spark, sf).groupBy("event_type", "user_id").count()
      .collect().map(r => (r.getString(0), r.getAs[Long]("count")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    counts.foreach { case (et, xs) =>
      val n = xs.length.toLong; val s = xs.sum
      var cum = 0L; var num = 0L
      xs.foreach { x => val prev = cum; cum += x; num += prev + cum }
      val r = got(et)
      assert(r.getAs[Long]("n_users") == n && r.getAs[Long]("total_events") == s)
      assert(r.getAs[Long]("gini_num") == num, s"$et gini_num")
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"$et gini=$g")
    }
  }

  test("markov stationary: pi stays a (floor-lossy) distribution and respects the chain") {
    val got = operators.EventWindows.qMarkovStationary(spark, sf).collect()
    val k = got.length
    assert(k >= 2)
    // uniform start, and every iterate sums to 1e6 minus bounded floor loss
    assert(got.forall(_.getAs[Long]("pi0_ppm") == 1000000L / k))
    Seq("pi1_ppm", "pi2_ppm", "pi3_ppm").foreach { c =>
      val tot = got.map(_.getAs[Long](c)).sum
      // each of the k output entries floors once per step ⇒ loss < k per
      // step, compounded over ≤3 steps of ppm-scaled transition floors
      assert(tot <= 1000000L && tot > 1000000L - 3 * k * k - 3 * k, s"$c sums to $tot")
      got.foreach(r => assert(r.getAs[Long](c) >= 0))
    }
  }

  test("survival km: recurrence replay, monotone survival, shrinking risk sets") {
    val got = operators.EventWindows.qSurvivalKm(spark, sf).orderBy("dur").collect()
    assert(got.nonEmpty)
    val spans = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").as("d"))
      .groupBy("user_id").agg(min("d").as("f"), max("d").as("l")).collect()
      .map(r => (r.getAs[Long]("f"), r.getAs[Long]("l")))
    val w = spans.map(_._2).max
    val byDur = spans.groupBy { case (f, l) => l - f }
    val durs = byDur.keys.toSeq.sorted
    var risk = spans.length.toLong; var s = 1000000L
    val expect = durs.map { dur =>
      val members = byDur(dur)
      val churn = members.count(_._2 < w - 2).toLong
      s = s * (risk - churn) / risk
      val row = (dur, risk, churn, s)
      risk -= members.length
      row
    }
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (r, (dur, nRisk, churn, surv)) =>
      assert(r.getAs[Long]("dur") == dur && r.getAs[Long]("n_risk") == nRisk)
      assert(r.getAs[Long]("n_churn") == churn && r.getAs[Long]("surv_ppm") == surv, r.toString)
    }
    // survival never increases
    assert(got.map(_.getAs[Long]("surv_ppm")).toSeq.sliding(2).forall {
      case Seq(a, b) => b <= a; case _ => true
    })
  }

  test("zonemap prune: arrival order prunes nothing, time partitioning prunes almost all") {
    val rows = operators.Curation.qZonemapPrune(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val nat = rows("natural"); val tp = rows("time_part")
    // same predicate, same corpus: matching rows agree across layouts
    assert(nat.getAs[Long]("rows_match") == tp.getAs[Long]("rows_match"))
    assert(nat.getAs[Long]("rows_total") == tp.getAs[Long]("rows_total"))
    // orderkey-hashed files straddle nearly the whole date range → few
    // skips (tiny sf0.001 files can have accidental range gaps, so "no
    // pruning" is asserted as <10%, and ≥90% of rows still scanned)
    assert(nat.getAs[Long]("skip_ppm") < 100000L, nat.toString)
    assert(nat.getAs[Long]("rows_scanned") * 10 >= nat.getAs[Long]("rows_total") * 9)
    // month-partitioned files: at most 2 of ~84 files overlap one month
    assert(tp.getAs[Long]("n_files_hit") <= 2, tp.toString)
    assert(tp.getAs[Long]("skip_ppm") > 900000L, tp.toString)
    assert(tp.getAs[Long]("rows_scanned") < nat.getAs[Long]("rows_scanned") / 10)
    // amplification is exactly scanned/match in ppm
    Seq(nat, tp).foreach { r =>
      assert(r.getAs[Long]("amp_ppm") ==
        r.getAs[Long]("rows_scanned") * 1000000L / math.max(r.getAs[Long]("rows_match"), 1L))
    }
  }

  test("theil-sen: median slope from a driver-side all-pairs recompute, robust bounds") {
    val got = operators.EventWindows.qTheilSen(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").as("d"))
      .groupBy("event_type", "d").count().collect()
      .map(r => (r.getString(0), r.getAs[Long]("d"), r.getAs[Long]("count")))
      .groupBy(_._1)
    daily.foreach { case (et, rows) =>
      def fdiv(a: Long, b: Long) = { val m = ((a % b) + b) % b; (a - m) / b }
      val pts = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if pts(j)._1 > pts(i)._1
      } yield fdiv((pts(j)._2 - pts(i)._2) * 1000000L, pts(j)._1 - pts(i)._1)).sorted
      val r = got(et)
      assert(r.getAs[Long]("n_pairs") == slopes.length)
      assert(r.getAs[Long]("slope_min") == slopes.head)
      assert(r.getAs[Long]("slope_max") == slopes.last)
      assert(r.getAs[Long]("slope_med_ppm") == slopes((slopes.length + 1) / 2 - 1),
        s"$et median")
    }
  }

  test("benford: digit histogram covers 1-9 and shares reconcile exactly") {
    val got = operators.Advanced.qBenford(spark, sf).collect()
    val totals = Tables.orders(spark, sf).select("o_totalprice").collect()
      .map(r => r.getDouble(0).floor.toLong.toString.head.asDigit.toLong)
    val byDigit = totals.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.map(_.getAs[Long]("digit")).toSet == byDigit.keySet)
    got.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(d >= 1 && d <= 9)
      assert(r.getAs[Long]("n_orders") == byDigit(d))
      val exp = r.getAs[Double]("exp_benford")
      assert(math.abs(exp - math.log(1.0 + 1.0 / d) / math.log(10.0)) < 1e-6)
      assert(r.getAs[Boolean]("within_2pct") ==
        (math.abs(r.getAs[Double]("obs_frac") - exp) < 0.02))
    }
    assert(got.map(_.getAs[Long]("n_orders")).sum == totals.length)
  }

  test("mutual info: nonnegative, bounded by marginal entropies, driver recompute") {
    val r = operators.TextAnalysis.qMutualInfo(spark, sf).collect().head
    val docs = Tables.documents(spark, sf).select("lang", "source").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val n = docs.length.toDouble
    def h(m: Map[String, Int]) =
      -m.values.map(c => c / n * math.log(c / n)).sum
    val hl = h(docs.groupBy(_._1).view.mapValues(_.length).toMap)
    val hs = h(docs.groupBy(_._2).view.mapValues(_.length).toMap)
    val joint = docs.groupBy(identity).view.mapValues(_.length).toMap
    val rl = docs.groupBy(_._1).view.mapValues(_.length).toMap
    val rs = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val mi = joint.map { case ((l, s0), c) =>
      c / n * math.log(c * n / (rl(l).toDouble * rs(s0))) }.sum
    assert(r.getAs[Long]("n_docs") == docs.length)
    assert(math.abs(r.getAs[Double]("mi_nats") - mi) < 1e-4, s"mi ${r.getAs[Double]("mi_nats")} vs $mi")
    assert(math.abs(r.getAs[Double]("h_lang") - hl) < 1e-4)
    assert(math.abs(r.getAs[Double]("h_source") - hs) < 1e-4)
    // 0 <= MI <= min(H_l, H_s); NMI in [0, 1]
    assert(r.getAs[Double]("mi_nats") >= -1e-9)
    assert(r.getAs[Double]("mi_nats") <= math.min(hl, hs) + 1e-6)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= 0.0 && nmi <= 1.0 + 1e-9)
  }

  test("ndcg eval: perfect self-ranking bound, hits consistent, idcg normalization") {
    val got = operators.Similarity.qNdcgEval(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg"); val hits = r.getAs[Long]("n_hits")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, r.toString)
      assert(hits >= 0 && hits <= 10)
      // a ranking with zero true-top-10 hits has zero graded gain
      if (hits == 0) assert(ndcg == 0.0)
      // and full-hit rankings can't be worse than the worst permutation
      // of the ideal gains (0.5 is a loose floor for rel=11-rank grades)
      if (hits == 10) assert(ndcg > 0.5, r.toString)
    }
  }

  test("multimodal patches: grid geometry, letterbox bounds, fan-out count") {
    val got = operators.Multimodal.qMultimodalPatches(spark, sf).collect()
    assert(got.nonEmpty)
    val byDoc = got.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rows) =>
      val r = rows.head
      val (w, hgt) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (rw, rh) = (r.getAs[Int]("rs_w"), r.getAs[Int]("rs_h"))
      // resized fits the canvas and preserves at least one axis near 224
      assert(rw <= 224 && rh <= 224)
      assert(rw == 224 || rh == 224 || math.max(rw, rh) >= 220, r.toString)
      assert(r.getAs[Int]("pad_x") == (224 - rw) / 2)
      assert(r.getAs[Int]("pad_y") == (224 - rh) / 2)
      // scale is the min-axis ratio in ppm
      assert(r.getAs[Long]("scale_ppm") ==
        math.min(224L * 1000000 / w, 224L * 1000000 / hgt))
      val gx = math.max(rw / 16, 1); val gy = math.max(rh / 16, 1)
      assert(rows.length == gx * gy, s"fan-out ${rows.length} != $gx*$gy")
      assert(rows.map(p => (p.getAs[Int]("px"), p.getAs[Int]("py"))).toSet
        == (for (x <- 0 until gx; y <- 0 until gy) yield (x, y)).toSet)
    }
  }

  test("dedup eval: counts reconcile with the source pipelines, F1 identity holds") {
    val r = operators.Dedup.qDedupEval(spark, sf).collect().head
    val (np, nt, tp) = (r.getAs[Long]("n_pred"), r.getAs[Long]("n_truth"), r.getAs[Long]("n_tp"))
    try {
      assert(tp <= math.min(np, nt))
      // the injected exact-copy pairs are unmissable by BOTH detectors
      // (identical text → identical simhash and jaccard 1.0), and they
      // share doc_id parity so the % 2 sample keeps them together: at
      // sf0.001, 50 of the 100 exact pairs fall in the sampled half
      assert(tp >= 50, s"tp=$tp")
      // the eval's pair universes are the sampled sub-pipelines
      val sample = operators.Dedup.corpus(spark, sf).filter(col("doc_id") % 2 === 0)
      assert(np == operators.Dedup.simhashPairsFrom(sample).count())
      assert(nt == operators.Dedup.ngramJaccardFrom(sample).count())
      assert(r.getAs[Double]("f1") ==
        BigDecimal(2.0 * tp / math.max(np + nt, 1L))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    } finally graft.CacheTracker.releaseAll()
  }

  test("k-anonymity: cells partition the corpus and generalization only lowers risk") {
    val rows = operators.Curation.qKAnon(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("k")).sum == nDocs)
    // k_gen aggregates the member cells of each generalized bucket
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("gen_bucket"))).foreach { case (_, cell) =>
      val kg = cell.head.getAs[Long]("k_gen")
      assert(cell.forall(_.getAs[Long]("k_gen") == kg))
      assert(cell.map(_.getAs[Long]("k")).sum == kg)
    }
    // flags match thresholds, and generalizing never increases exposed docs
    rows.foreach { r =>
      assert(r.getAs[Boolean]("at_risk") == (r.getAs[Long]("k") < 5))
      assert(r.getAs[Boolean]("at_risk_after") == (r.getAs[Long]("k_gen") < 5))
    }
    val exposed = rows.filter(_.getAs[Boolean]("at_risk")).map(_.getAs[Long]("k")).sum
    val exposedAfter = rows.filter(_.getAs[Boolean]("at_risk_after")).map(_.getAs[Long]("k")).sum
    assert(exposedAfter <= exposed, s"$exposedAfter > $exposed")
    assert(exposed > 0, "sf0.001 corpus should have at least one small cell")
  }

  test("spearman: tie-corrected rho matches a driver-side average-rank recompute") {
    val got = operators.EventWindows.qSpearman(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("value").cast("decimal(18,2)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val act = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    ev.groupBy(_._1).foreach { case (et, rows) =>
      def avgRanks2x[T](xs: Seq[T])(implicit ord: Ordering[T]): Seq[Long] = {
        val sorted = xs.sorted
        val firstIdx = sorted.zipWithIndex.groupBy(_._1).view
          .mapValues(g => (g.map(_._2).min + 1, g.length)).toMap
        xs.map { x => val (rmin, t) = firstIdx(x); 2L * rmin + t - 1 }
      }
      val u = avgRanks2x(rows.map(_._3).toSeq)(Ordering.by((b: java.math.BigDecimal) => b))
      val w = avgRanks2x(rows.map(r => act(r._2)).toSeq)
      val n = rows.length.toDouble
      val (su, sw) = (u.sum.toDouble, w.sum.toDouble)
      val suw = u.zip(w).map { case (a, b) => a * b }.sum.toDouble
      val (suu, sww) = (u.map(x => x * x).sum.toDouble, w.map(x => x * x).sum.toDouble)
      val rho = (n * suw - su * sw) / math.sqrt((n * suu - su * su) * (n * sww - sw * sw))
      val g = got(et)
      assert(g.getAs[Long]("n") == rows.length)
      assert(math.abs(g.getAs[Double]("rho") - rho) < 1e-6, s"$et: ${g.getAs[Double]("rho")} vs $rho")
      assert(math.abs(g.getAs[Double]("rho")) <= 1.0 + 1e-9)
    }
  }

  test("funnel latency: converter count matches stage 3 and quantiles are ordered") {
    val r = operators.EventWindows.qFunnelLatency(spark, sf).collect().head
    val stage3 = operators.EventWindows.qEventFunnel(spark, sf)
      .filter(col("stage") === "3_purchase").collect().head.getAs[Long]("n_users")
    assert(r.getAs[Long]("n_converters") == stage3)
    val (p50, p90, mx) = (r.getAs[Double]("p50_total_s"),
      r.getAs[Double]("p90_total_s"), r.getAs[Long]("max_total_s"))
    assert(p50 >= 0 && p50 <= p90 && p90 <= mx.toDouble, r.toString)
    assert(r.getAs[Double]("p50_view_click_s") >= 0)
    assert(r.getAs[Double]("p50_click_buy_s") >= 0)
  }

  test("forecast backtest: APE terms replay from the Holt output, strictly out-of-sample") {
    val holt = operators.EventWindows.qHoltTrend(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_idx"),
        r.getAs[Long]("n_events"), r.getAs[Long]("forecast_next")))
    val got = operators.EventWindows.qForecastBacktest(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    holt.groupBy(_._1).foreach { case (et, rows) =>
      val sorted = rows.sortBy(_._2)
      val apes = sorted.zip(sorted.tail).map { case ((_, _, _, f), (_, _, nxt, _)) =>
        math.abs(f - nxt * 1000000L) / nxt
      }
      val r = got(et)
      assert(r.getAs[Long]("n_evals") == apes.length)
      assert(r.getAs[Long]("mape_ppm") == apes.sum / apes.length, s"$et mape")
      assert(r.getAs[Long]("max_ape_ppm") == apes.max)
    }
  }

  test("uuid() serial numbers are unique across partitions (G10 semantics)") {
    // the reference's sn is 64 random bytes (gateway.ts:313); the engine
    // uses uuid() — monotonically_increasing_id would collide across runs
    val n = 100000
    val distinct = spark.range(n).repartition(8)
      .selectExpr("uuid() AS sn").distinct().count()
    assert(distinct == n)
  }

  test("grouping sets emits exactly the three requested groupings") {
    val g = Advanced.qGroupingSets(spark, sf).cache()
    assert(g.filter(col("n_name").isNotNull && col("o_orderpriority").isNotNull).count() == 0)
    assert(g.filter(col("n_name").isNull && col("o_orderpriority").isNull).count() == 1)
  }

  test("kll merge: per-shard sketches reproduce the exact median within the rank contract") {
    val g = Advanced.qKllQuantileMerge(spark, sf).cache()
    try {
      assert(g.count() == 3)
      assert(g.filter(col("n_shards") =!= 8).count() == 0)
      assert(g.filter(!col("kll_median_ok")).count() == 0)
    } finally g.unpersist()
  }

  test("approx_top_k tracks every exact top-10 term within the Misra-Gries eps*N bound") {
    val g = Advanced.qApproxTopK(spark, sf).cache()
    try {
      assert(g.count() == 10)
      assert(g.filter(!col("tracked_ok") || !col("count_ok")).count() == 0)
    } finally g.unpersist()
  }

  test("theta set algebra: pairwise intersections within contract and bounded by set sizes") {
    val g = Advanced.qThetaSetops(spark, sf).cache()
    try {
      assert(g.count() == 3) // 3 flags -> 3 unordered pairs
      assert(g.filter(!col("inter_ok")).count() == 0)
      assert(g.filter(col("exact_inter") > least(col("exact_a"), col("exact_b"))).count() == 0)
    } finally g.unpersist()
  }

  test("SCD2 merge: one current row per key, all three merge paths live, dating consistent") {
    val m = Advanced.qScd2Merge(spark, sf).cache()
    try {
      val dim = Tables.customer(spark, sf)
      val dimN = dim.count()
      val chgN = dim.filter(col("c_custkey") % 10 === 3).count()
      val insN = dim.filter(col("c_custkey") % 100 === 7).count()
      assert(chgN > 0 && insN > 0, "derived batch must exercise update AND insert paths")
      // dimension rows + one new row per batch entry
      assert(m.count() == dimN + chgN + insN)
      // exactly one current row per key; closed rows only for changed keys
      val cur = m.filter(col("is_current"))
      assert(cur.groupBy("c_custkey").count().filter(col("count") =!= 1).count() == 0)
      assert(cur.count() == dimN + insN)
      assert(m.filter(!col("is_current")).count() == chgN)
      assert(m.filter(col("version") === 2).count() == chgN)
      // effective dating: closed rows carry valid_to, current rows never do
      assert(m.filter(!col("is_current") && col("valid_to").isNull).count() == 0)
      assert(m.filter(col("is_current") && col("valid_to").isNotNull).count() == 0)
      // a changed key's v2 row opens exactly where its v1 row closes
      val closedAt = m.filter(!col("is_current"))
        .select(col("c_custkey"), col("valid_to").as("t"))
      val openedAt = m.filter(col("version") === 2)
        .select(col("c_custkey"), col("valid_from").as("f"))
      assert(closedAt.join(openedAt, "c_custkey").filter(col("t") =!= col("f")).count() == 0)
    } finally m.unpersist()
  }

  test("incremental aggregate: combine(old, delta) equals recompute, both sides live") {
    val g = Advanced.qIncrAgg(spark, sf).cache()
    try {
      assert(g.count() == 5)
      assert(g.filter(col("n_new") > 0).count() > 0, "delta batch must be live")
      assert(g.filter(col("n_orders") > col("n_new")).count() > 0, "history must be live")
      val full = Tables.orders(spark, sf).groupBy("o_orderpriority").count()
      assert(g.join(full, "o_orderpriority")
        .filter(col("n_orders") =!= col("count")).count() == 0,
        "combined counts must equal the from-scratch aggregate")
    } finally g.unpersist()
  }

  test("interval RANGE frame equals the self-join trailing-week definition") {
    import org.apache.spark.sql.types.DecimalType
    val g = SparkEntry.queries("q_window_interval")(spark, sf).cache()
    try {
      val li = Tables.lineitem(spark, sf)
        .withColumn("ord", datediff(col("l_shipdate"), lit("1992-01-01").cast("date")))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), col("ord"), col("l_extendedprice"))
      val ref = li.as("a").join(li.as("b"),
          col("a.l_suppkey") === col("b.l_suppkey") &&
          col("b.ord") >= col("a.ord") - 6 && col("b.ord") <= col("a.ord"))
        .groupBy(col("a.l_suppkey").as("l_suppkey"), col("a.l_orderkey").as("l_orderkey"),
          col("a.l_linenumber").as("l_linenumber"), col("a.l_shipdate").as("l_shipdate"))
        .agg(sum(col("b.l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("rev_7d"),
          count(lit(1)).as("n_7d"))
      assert(g.exceptAll(ref).count() == 0 && ref.exceptAll(g).count() == 0,
        "RANGE frame result differs from the self-join definition")
    } finally g.unpersist()
  }

  test("sparse cosine: top pairs are the injected copies at cosine 1.0, ranking monotone") {
    val rows = SparkEntry.queries("q_sparse_cosine")(spark, sf).collect()
    assert(rows.length == 20)
    val cs = rows.map(_.getAs[Double]("cos_bow"))
    assert(cs.head == 1.0, "exact copies must rank first at cosine 1.0")
    assert(cs.zip(cs.tail).forall { case (x, y) => x >= y }, "ranking must be non-increasing")
    assert(cs.forall(c => c > 0 && c <= 1.0))
    assert(rows.forall(_.getAs[Long]("dot") > 0))
    CacheTracker.releaseAll()
  }

  test("exact-moment profiling matches Spark's builtin population moments") {
    val got = Advanced.qStatsMoments(spark, sf).cache()
    try {
      val ref = Tables.lineitem(spark, sf).groupBy("l_returnflag").agg(
        stddev_pop(col("l_quantity")).as("r_std"),
        skewness(col("l_quantity")).as("r_skew"),
        kurtosis(col("l_quantity")).as("r_kurt"),
        corr(col("l_quantity"), col("l_extendedprice")).as("r_corr"))
      val j = got.join(ref, "l_returnflag").collect()
      assert(j.length == 3)
      j.foreach { r =>
        assert(math.abs(r.getAs[Double]("std_qty") - r.getAs[Double]("r_std")) < 1e-4, r.toString)
        assert(math.abs(r.getAs[Double]("skew_qty") - r.getAs[Double]("r_skew")) < 1e-4, r.toString)
        assert(math.abs(r.getAs[Double]("kurt_qty") - r.getAs[Double]("r_kurt")) < 1e-4, r.toString)
        assert(math.abs(r.getAs[Double]("corr_qty_price") - r.getAs[Double]("r_corr")) < 1e-4, r.toString)
      }
    } finally got.unpersist()
  }

  test("poisson bootstrap: CI brackets the point estimate and SE shrinks on the bigger group") {
    val rows = operators.Advanced.qPoissonBootstrap(spark, sf).collect()
    assert(rows.length == 5) // one per order priority
    rows.foreach { r =>
      val (pm, se) = (r.getAs[Double]("point_mean"), r.getAs[Double]("boot_se"))
      assert(se > 0, s"degenerate SE in $r")
      assert(r.getAs[Double]("ci_lo") < pm && pm < r.getAs[Double]("ci_hi"), r.toString)
      // Poisson(1) bootstrap SE of a mean ~ sd/sqrt(n); order values have
      // sd ~ mean here, so SE far above the mean would indicate a broken fold
      assert(se < pm, s"SE implausibly large in $r")
    }
  }

  test("decile lift: deciles partition customers and cumulative lift converges to 1") {
    val rows = operators.Advanced.qDecileLift(spark, sf).collect().sortBy(_.getAs[Int]("decile"))
    CacheTracker.releaseAll()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    // over ALL deciles the cumulative rate IS the population rate
    assert(math.abs(rows.last.getAs[Double]("cum_lift") - 1.0) < 1e-9,
      s"final cum_lift ${rows.last.getAs[Double]("cum_lift")}")
  }

  test("kneser-ney: probabilities are in (0,1) and the discount shaves the head MLE") {
    val rows = operators.TextAnalysis.qKneserNey(spark, sf).collect()
    CacheTracker.releaseAll()
    assert(rows.length == 30)
    rows.foreach { r =>
      val (mle, kn) = (r.getAs[Double]("p_mle"), r.getAs[Double]("p_kn"))
      assert(mle > 0 && mle <= 1 && kn > 0 && kn < 1, r.toString)
    }
    // the single most frequent bigram: its discount loss outweighs the
    // backoff mass it gets back, so KN must sit below MLE there
    val top = rows.maxBy(_.getAs[Long]("c12"))
    assert(top.getAs[Double]("p_kn") < top.getAs[Double]("p_mle"), top.toString)
  }

  test("hll precision sweep: bound shrinks with lgK and every estimate lands inside it") {
    val rows = operators.Advanced.qHllPrecisionSweep(spark, sf).collect()
      .sortBy(_.getAs[Int]("lg_k"))
    assert(rows.map(_.getAs[Int]("lg_k")).toSeq == Seq(4, 6, 8, 10, 12))
    val bounds = rows.map(_.getAs[Double]("rse_bound"))
    assert(bounds.zip(bounds.tail).forall { case (a, b) => a > b }, "bound must shrink with m")
    assert(rows.forall(_.getAs[Boolean]("hll_ok")), "every estimate must respect 3x RSE")
    assert(rows.map(_.getAs[Long]("exact_n")).distinct.length == 1)
  }

  test("column profile: stats recompute from direct per-column aggregation") {
    val got = operators.Advanced.qColumnProfile(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(got.keySet == Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val li = Tables.lineitem(spark, sf)
    Seq("l_quantity", "l_discount").foreach { c =>
      val direct = li.agg(count(lit(1)), countDistinct(col(c)),
        min(col(c)).cast("double"), max(col(c)).cast("double")).head
      val r = got(c)
      assert(r.getAs[Long]("n_rows") == direct.getLong(0), c)
      assert(r.getAs[Long]("n_distinct") == direct.getLong(1), c)
      assert(math.abs(r.getAs[Double]("min_v") - direct.getDouble(2)) < 1e-6, c)
      assert(math.abs(r.getAs[Double]("max_v") - direct.getDouble(3)) < 1e-6, c)
      assert(r.getAs[Long]("n_null") == 0L, c)
    }
  }

  test("event gaps: calendar identity holds and observed days partition the span") {
    val rows = operators.EventWindows.qEventGaps(spark, sf).collect()
    assert(rows.length == 5) // one per event type
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days_expected") ==
        r.getAs[Long]("n_days_observed") + r.getAs[Long]("n_missing"), r.toString)
      assert(r.getAs[Long]("longest_gap") <= r.getAs[Long]("n_missing"), r.toString)
      assert(!r.getAs[java.sql.Date]("first_day").after(r.getAs[java.sql.Date]("last_day")))
    }
  }

  test("l-diversity: cell masses reconcile and flags follow the rule") {
    val g = operators.Curation.qLDiversity(spark, sf).cache()
    assert(g.agg(sum("n_rows")).head.getLong(0) == Tables.events(spark, sf).count())
    assert(g.filter(col("l_distinct") > col("n_rows") ||
      col("top_share") <= 0 || col("top_share") > 1).count() == 0)
    // the flag uses the unrounded share; compare away from the boundary
    assert(g.filter(col("l_distinct") < 3 && !col("at_risk")).count() == 0)
    assert(g.filter(col("top_share") > 0.800001 && !col("at_risk")).count() == 0)
    assert(g.filter(col("l_distinct") >= 3 && col("top_share") < 0.799999 &&
      col("at_risk")).count() == 0)
    g.unpersist()
  }

  test("t-closeness: masses reconcile, t bounded, and a driver-side exact-EMD replay matches") {
    val g = operators.Curation.qTCloseness(spark, sf).cache()
    assert(g.agg(sum("n_rows")).head.getLong(0) == Tables.events(spark, sf).count())
    assert(g.filter(col("t") < 0 || col("t") > 1).count() == 0)
    // replay the exact-integer EMD for every cell on the driver
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("day"),
        expr("from_json(props, 'k INT').k").as("sens"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val n = ev.length.toLong
    val domain = ev.map(_._3).distinct.sorted
    val m = domain.length.toLong
    val globCount = ev.groupBy(_._3).map { case (v, xs) => v -> xs.length.toLong }
    val globCum = domain.scanLeft(0L)((a, v) => a + globCount(v)).tail
    val want = ev.groupBy(e => (e._1, e._2)).map { case (cell, xs) =>
      val nr = xs.length.toLong
      val cc = xs.groupBy(_._3).map { case (v, ys) => v -> ys.length.toLong }
      val cellCum = domain.scanLeft(0L)((a, v) => a + cc.getOrElse(v, 0L)).tail
      val tNum = cellCum.zip(globCum).map { case (c1, g1) =>
        math.abs(c1 * n - g1 * nr) }.sum
      cell -> tNum.toDouble / (n.toDouble * nr * (m - 1))
    }
    val got = g.collect().map(r => (r.getString(0), r.get(1).toString) ->
      (r.getAs[Double]("t"), r.getAs[Boolean]("at_risk"))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (cell, t) =>
      assert(math.abs(got(cell)._1 - t) < 5e-7, s"$cell: ${got(cell)._1} vs $t")
      assert(got(cell)._2 == (t > 0.1), cell.toString)
    }
    g.unpersist()
  }

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("compaction plan: totals reconcile and a driver-side NFD replay matches bins per shard") {
    val g = operators.Curation.qCompactionPlan(spark, sf).cache()
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    assert(g.agg(sum("n_docs")).head.getLong(0) == docs.length)
    assert(g.agg(sum("bytes_total")).head.getLong(0) == docs.map(_._2).sum)
    assert(g.filter(col("n_bins") > col("n_frags") ||
      col("files_saved") =!= col("n_frags") - col("n_bins")).count() == 0)
    // replay the fragment model + next-fit-decreasing binning per shard
    val want = docs.map { case (id, nc) => (md5hex(id.toString), id, nc) }
      .groupBy(t => java.lang.Long.parseLong(t._1.substring(0, 4), 16) % 16)
      .map { case (sid, xs) =>
        val frags = xs.sortBy(t => (t._1, t._2)).zipWithIndex
          .groupBy(_._2 / 8).map { case (fid, ys) => (fid.toLong, ys.map(_._1._3).sum) }
          .toSeq
        val ordered = frags.sortBy { case (fid, b) => (-b, fid) }
        val cumBefore = ordered.scanLeft(0L)(_ + _._2)
        val bins = ordered.indices.map(i => cumBefore(i) / 8192L).distinct.size.toLong
        sid -> (frags.size.toLong, bins)
      }
    val got = g.collect().map(r => r.getAs[Long]("shard_id") ->
      (r.getAs[Long]("n_frags"), r.getAs[Long]("n_bins"))).toMap
    assert(got == want)
    g.unpersist()
  }

  test("dp quantile: a driver-side gumbel-max replay picks the same bucket per epsilon") {
    val g = operators.Curation.qDpQuantile(spark, sf).collect()
      .map(r => r.getAs[String]("eps_label") -> r).toMap
    assert(g.keySet == Set("e0001", "e001", "e01"))
    val docs = Tables.documents(spark, sf).select(col("n_chars")).collect()
      .map(_.getAs[Number](0).longValue)
    val n = docs.length.toLong
    val bc = docs.map(_ / 100).groupBy(identity)
      .map { case (b, xs) => (b, xs.length.toLong) }.toSeq.sortBy(_._1)
    val cum = bc.scanLeft(0L)(_ + _._2).tail
    val u = bc.map(_._1).zip(cum).map { case (b, c) => (b, -math.abs(2 * c - n)) }
    val opt = u.sortBy { case (b, s) => (-s, b) }.head._1
    for ((label, eps) <- Seq(("e0001", 0.001), ("e001", 0.01), ("e01", 0.1))) {
      val chosen = u.map { case (b, s) =>
        val hx = java.lang.Long.parseLong(md5hex(s"$b|$label").substring(0, 12), 16)
        val uu = (hx + 0.5) / 281474976710656.0
        (b, eps * s / 4.0 - math.log(-math.log(uu)))
      }.sortBy { case (b, sc) => (-sc, b) }.head._1
      assert(g(label).getAs[Long]("chosen_bucket") == chosen, label)
      assert(g(label).getAs[Long]("opt_bucket") == opt, label)
    }
  }

  test("dp topk: replays identically, converges to the true set at loose epsilon") {
    def run() = operators.Curation.qDpTopk(spark, sf).collect()
    val a = run()
    assert(a.map(_.toString).sorted.sameElements(run().map(_.toString).sorted),
      "seeded Gumbel noise must replay identically")
    val by = a.map(r => r.getAs[String]("eps_label") -> r).toMap
    assert(by.keySet == Set("e001", "e01", "e1"))
    // driver replay of the full mechanism: df from distinct (doc, word),
    // one-shot Gumbel top-10, overlap with the true top-10
    val words = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().flatMap(r => r.getString(1).split(" ", -1)
        .map(w => (r.getAs[Number](0).longValue, w))).distinct
    val dfreq = words.groupBy(_._2).map { case (w, xs) => (w, xs.length.toLong) }
    val tru = dfreq.toSeq.sortBy { case (w, c) => (-c, w) }.take(10)
    for ((label, eps) <- Seq(("e001", 0.01), ("e01", 0.1), ("e1", 1.0))) {
      val rel = dfreq.toSeq.map { case (w, c) =>
        val hx = java.lang.Long.parseLong(md5hex(s"$w|$label").substring(0, 12), 16)
        val uu = (hx + 0.5) / 281474976710656.0
        (w, c, eps * c / 20.0 - math.log(-math.log(uu)))
      }.sortBy { case (w, _, sc) => (-sc, w) }.take(10)
      val overlap = rel.count(r => tru.exists(_._1 == r._1)).toLong
      assert(by(label).getAs[Long]("n_overlap") == overlap, label)
      val ratio = rel.map(_._2).sum.toDouble / tru.map(_._2).sum
      assert(math.abs(by(label).getAs[Double]("utility_ratio") -
        math.rint(ratio * 1e6) / 1e6) < 5e-7, label)
    }
    // utility is monotone in epsilon: loose release keeps at least the
    // df mass of the tight one, and e1 should essentially nail the set
    assert(by("e1").getAs[Double]("utility_ratio") >=
      by("e001").getAs[Double]("utility_ratio"), a.mkString("; "))
    assert(by("e1").getAs[Double]("utility_ratio") > 0.9, by("e1").toString)
  }

  test("dp mean: replays identically, true means reconcile, and error decays with epsilon") {
    def run() = operators.Curation.qDpMean(spark, sf).collect()
    val a = run()
    assert(a.map(_.toString).sorted.sameElements(run().map(_.toString).sorted),
      "seeded noise must replay identically")
    // clamped true means reconcile with a driver replay, invariant across eps
    val docs = Tables.documents(spark, sf).select(col("lang"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue))
    val want = docs.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.length.toLong,
        xs.map(x => math.min(math.max(x._2, 0L), 1000L)).sum.toDouble / xs.length)
    }
    a.foreach { r =>
      val (n, tm) = want(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("true_mean") - tm) < 5e-7, r.toString)
    }
    // summed relative error decays as epsilon grows (100x b separation)
    val errByEps = a.groupBy(_.getAs[String]("eps_label"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Double]("rel_err")).sum }
    assert(errByEps("e01") > errByEps("e1") && errByEps("e1") > errByEps("e10"),
      errByEps.toString)
  }

  test("dp histogram: seeded noise replays identically and the utility curve orders by epsilon") {
    def run() = operators.Curation.qDpHistogram(spark, sf).collect()
      .map(r => r.getAs[String]("eps_label") -> r).sortBy(_._1)
    val a = run()
    assert(a.map(_._2.toString).sameElements(run().map(_._2.toString)),
      "seeded Laplace noise must be reproducible run-to-run")
    val by = a.toMap
    assert(by.keySet == Set("e01", "e1", "e10"))
    // smaller epsilon => strictly more error (the 100x b-scale separation)
    assert(by("e01").getAs[Double]("mae") > by("e1").getAs[Double]("mae"))
    assert(by("e1").getAs[Double]("mae") > by("e10").getAs[Double]("mae"))
    a.foreach { case (_, r) =>
      assert(r.getAs[Double]("max_abs_err") >= r.getAs[Double]("mae"))
      assert(r.getAs[Double]("mae") > 0 && r.getAs[Double]("rel_mae") > 0)
      assert(r.getAs[Long]("n_within_10pct") <= r.getAs[Long]("n_cells"))
    }
  }

  test("contribution cap: mass conserved, cap binds, and least(c,k) equals the rank-filter form") {
    val g = operators.EventWindows.qContributionCap(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    assert(g.agg(sum("n_raw")).head.getLong(0) == ev.count(),
      "raw totals must partition the event table")
    assert(g.filter(col("n_capped") > col("n_raw") ||
      col("n_capped") > col("n_users") * 10 ||
      col("n_clipped") > col("n_users")).count() == 0)
    // equivalence with the explicit per-user rank-and-keep form
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val ranked = ev.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .groupBy("event_type").agg(count(lit(1)).as("n_capped_rank"))
    val joined = g.join(ranked, "event_type")
    assert(joined.filter(col("n_capped") =!= col("n_capped_rank")).count() == 0)
    g.unpersist()
  }
}
