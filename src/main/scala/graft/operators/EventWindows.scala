package graft.operators

import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time window queries over `events` — the batch face of
  * `graft.streaming.StreamOps` (same builders run unchanged on streams;
  * StreamingSpec drives them through MemoryStream). Oracle equivalents
  * reconstruct Spark's epoch-aligned window bucketing in SQL.
  */
object EventWindows {

  def qWindowTumbling(s: SparkSession, d: String): DataFrame =
    StreamOps.tumblingCounts(graft.Tables.events(s, d), "6 hours", col("event_type"))

  def qWindowSliding(s: SparkSession, d: String): DataFrame =
    StreamOps.slidingCounts(graft.Tables.events(s, d), "12 hours", "6 hours", col("event_type"))

  def qWindowSession(s: SparkSession, d: String): DataFrame =
    StreamOps.sessionCounts(graft.Tables.events(s, d), "30 minutes", col("user_id"))

  /** Sequential funnel analysis (view → click → purchase): how many
    * users reach each stage IN ORDER — a later-stage event only counts
    * if it happens at or after the user's first previous-stage event.
    * The conditional-min cascade is the standard scalable form: every
    * aggregation and join keys on user_id, so the whole funnel is one
    * partitioning reused across stages (no broadcast of user-sized
    * relations, no per-user collect); stage relations shrink
    * monotonically. Output: one row per stage with reached-user counts
    * and the conversion fraction vs the previous stage (integer-count
    * division — deterministic). */
  def qEventFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val (v, c, p) = funnelStageMins(ev)
    def stage(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    val rows = stage(v, "1_view")
      .unionByName(stage(c, "2_click"))
      .unionByName(stage(p, "3_purchase"))
    import org.apache.spark.sql.expressions.Window
    rows.withColumn("prev", lag("n_users", 1).over(Window.orderBy("stage")))
      .withColumn("conversion",
        when(col("prev").isNull, 1.0)
          .when(col("prev") === 0, 0.0) // empty corpus: a zero-user stage converts nobody
          .otherwise(round(col("n_users").cast("double") / col("prev"), 6)))
      .select("stage", "n_users", "conversion")
  }

  /** The three per-user stage-min relations of the cascade. */
  private def funnelStageMins(ev: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") >= col("tv"))
      .groupBy("user_id").agg(min("ts").as("tc"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") >= col("tc"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    (v, c, p)
  }

  /** Per-user cascade relation (user_id, tv, tc, tp; null = unreached) —
    * the batch face the streaming funnel
    * ([[graft.streaming.FunnelStream]]) is spec-checked against. The
    * stage counts [[qEventFunnel]] reports are the non-null counts of
    * these columns. `ev` needs (user_id, event_type, ts). */
  def funnelUserReach(ev: DataFrame): DataFrame = {
    val (v, c, p) = funnelStageMins(ev)
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
  }

  /** Multi-touch attribution (the marketing-analytics credit-assignment
    * operator): every `purchase` is a conversion; the same user's `view`
    * and `click` events in the 24 h before it are its touchpoints. Two
    * standard models side by side — LINEAR (each of the k touches gets
    * 1/k) and POSITION-BASED (U-shaped: 40 % first touch, 40 % last,
    * the remaining 20 % split across the middle; degenerate k ≤ 2 gives
    * 100 % / 50-50) — aggregated per touch event type.
    *
    * Credits are integer PPM (1 000 000 // k etc.), so every sum is
    * order-insensitive and the fractional models stay hash-exact —
    * the same fixed-point discipline as the PageRank query; doubles
    * appear only in the final once-per-row division.
    *
    * Scale shape: the touch join keys on user_id (co-partitioned with
    * the conversion side — one shuffle), the 24 h window bounds each
    * user's touch fan-out, and the position windows partition by
    * conversion id — no global window, no broadcast of event-sized
    * relations. At 100 TB this is the standard sessionized-attribution
    * plan: everything stays keyed by user then conversion. */
  def qAttribution(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.events(s, d)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"), col("ts").as("conv_ts"))
    val touch = ev.filter(col("event_type").isin("view", "click"))
      .select(col("event_id").as("touch_id"), col("user_id"),
        col("ts").as("touch_ts"), col("event_type"))
    val j = conv.join(touch, Seq("user_id"))
      .filter(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - expr("INTERVAL 24 HOURS"))
    val wAll = Window.partitionBy("conv_id")
    val wAsc = Window.partitionBy("conv_id").orderBy(col("touch_ts"), col("touch_id"))
    val wDesc = Window.partitionBy("conv_id").orderBy(col("touch_ts").desc, col("touch_id").desc)
    j.withColumn("k", count(lit(1)).over(wAll))
      .withColumn("rn_first", row_number().over(wAsc))
      .withColumn("rn_last", row_number().over(wDesc))
      .withColumn("linear_ppm", expr("1000000 div k"))
      .withColumn("pos_ppm", expr(
        """CASE WHEN k = 1 THEN 1000000 WHEN k = 2 THEN 500000
          |     WHEN rn_first = 1 THEN 400000 WHEN rn_last = 1 THEN 400000
          |     ELSE 200000 div (k - 2) END""".stripMargin))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_touches"),
        sum("linear_ppm").as("linear_ppm"),
        sum("pos_ppm").as("pos_ppm"))
      .select(col("event_type"), col("n_touches"), col("linear_ppm"),
        round(col("linear_ppm") / 1000000.0, 6).as("linear_credit"),
        col("pos_ppm"), round(col("pos_ppm") / 1000000.0, 6).as("pos_credit"))
  }

  /** Event transition matrix (first-order Markov path analysis — the
    * "what do users do next" primitive behind funnel discovery and
    * next-action models): consecutive event pairs per user in time
    * order, counted into a from-type × to-type matrix with per-source
    * transition probabilities. lag() over the (user, ts, event_id)
    * order makes pairing deterministic under timestamp ties; counts
    * are integers and each probability is one double division per
    * output row — hash-exact.
    *
    * Scale shape: ONE shuffle (the per-user window partitioning), then
    * a |types|²-row aggregate with map-side combine; the from-type
    * marginal rides the same tiny relation. The per-user window never
    * sees another user's data, so skew is bounded by the busiest user,
    * not the event volume. */
  def qEventTransitions(s: SparkSession, d: String): DataFrame =
    transitionCounts(graft.Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))

  /** Calendar day index of an event — the ONE definition of the daily
    * bucketing every per-day series query shares with its oracle CTE
    * (`floor(epoch(ts) / 86400)`): the expression must stay
    * bit-identical across all of them, so it has one definition. */
  private def dayIdx: org.apache.spark.sql.Column =
    expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)")

  /** Per-(event_type, day) event counts — the daily series every
    * trend/control-chart/correlation query starts from. */
  private def dailyCounts(s: SparkSession, d: String, alias: String): DataFrame =
    graft.Tables.events(s, d)
      .select(col("event_type"), dayIdx.as("day_idx"))
      .groupBy("event_type", "day_idx").agg(count(lit(1)).as(alias))

  /** Consecutive (from, to) pairs per user in (ts, event_id) order —
    * the shared core of the batch matrix and the streaming twin's
    * parity spec ([[graft.streaming.TransitionStream]]). `ev` needs
    * (user_id, ts, event_id, event_type). */
  def transitionPairs(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.withColumn("next_type", lead("event_type", 1).over(w))
      .withColumn("next_id", lead("event_id", 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("next_type").as("to_type"), col("next_id").as("to_event_id"))
  }

  /** The transition matrix over [[transitionPairs]]. */
  def transitionCounts(ev: DataFrame): DataFrame = {
    val counts = transitionPairs(ev)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n_trans"))
    val fromTot = counts.groupBy("from_type").agg(sum("n_trans").as("n_from"))
    counts.join(fromTot, "from_type")
      .select(col("from_type"), col("to_type"), col("n_trans"), col("n_from"),
        expr("round(CAST(n_trans AS DOUBLE) / n_from, 6)").as("p_trans"))
  }

  /** Cohort retention matrix (the product-analytics staple): users
    * cohort by the epoch-aligned 7-day week of their FIRST signup
    * event, and each later week-offset reports how many of that cohort
    * were active (any event type). Buckets are epoch-aligned like every
    * window query in this module (floor(epoch/604800)·604800 — no
    * session-timezone or week-start dependence; DuckDB reproduces the
    * boundary bit-for-bit), offsets are exact integer week differences,
    * and the retention ratio divides two exact distinct-counts once per
    * output row.
    *
    * Scale shape: first-signup is one user-keyed aggregate; the
    * activity join is user-keyed against the (user → cohort) relation
    * (co-partitioned, no broadcast of user-sized data needed though AQE
    * may choose one); the matrix aggregate is |cohorts|·|offsets| rows.
    * The whole plan reuses the user_id partitioning — the same
    * one-partitioning discipline as the funnel. */
  def qCohortRetention(s: SparkSession, d: String): DataFrame = {
    val wk = (c: String) =>
      expr(s"timestamp_seconds(CAST(floor(unix_timestamp($c) / 604800) AS BIGINT) * 604800)")
    val ev = graft.Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("signup_ts"))
      .withColumn("cohort_week", wk("signup_ts"))
      .select("user_id", "cohort_week")
    val sizes = cohort.groupBy("cohort_week")
      .agg(countDistinct("user_id").as("cohort_size"))
    val active = ev.join(cohort, "user_id")
      .withColumn("offset_weeks", expr(
        "CAST((unix_timestamp(timestamp_seconds(CAST(floor(unix_timestamp(ts) / 604800) AS BIGINT) * 604800)) - unix_timestamp(cohort_week)) DIV 604800 AS INT)"))
      .filter(col("offset_weeks") >= 0)
      .groupBy("cohort_week", "offset_weeks")
      .agg(countDistinct("user_id").as("n_active"))
    active.join(sizes, "cohort_week")
      .select(col("cohort_week"), col("offset_weeks"), col("n_active"), col("cohort_size"),
        expr("round(CAST(n_active AS DOUBLE) / cohort_size, 6)").as("retention"))
  }

  /** Robust outlier detection per event type (Iglewicz–Hoaglin modified
    * z-score): median and MAD replace mean/stddev so a burst of extreme
    * values cannot mask itself by inflating its own threshold — the
    * data-quality gate that survives the anomalies it hunts. A value is
    * an outlier when |0.6745·(x − median)/MAD| > 3.5. Exact interpolated
    * percentiles give engine-identical medians (the parity
    * q_quantile_stats already pins); every z evaluates once per row
    * from those shared doubles, and only integer counts and max/min
    * selections aggregate across rows — no float-sum order anywhere.
    *
    * Scale shape: two type-keyed aggregates (median, then MAD over
    * deviations) + one final summary — three passes over a stream that
    * shuffles on the same low-cardinality key each time; the exact
    * median is the documented error-contract cost (swap in the KLL
    * sketch of q_kll_quantile_merge when exactness can relax). */
  def qOutlierMad(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_type"), col("value").cast("double").as("v"))
    val med = ev.groupBy("event_type").agg(expr("percentile(v, 0.5D)").as("med"))
    val dev = ev.join(med, "event_type")
    val mad = dev.groupBy("event_type").agg(expr("percentile(abs(v - med), 0.5D)").as("mad"))
    dev.join(mad, "event_type")
      .withColumn("z", expr("0.6745 * (v - med) / mad"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("round(max(med), 6)").as("median_v"),
        expr("round(max(mad), 6)").as("mad_v"),
        sum(when(expr("abs(z) > 3.5"), 1).otherwise(0)).cast("long").as("n_outliers"),
        expr("round(max(abs(z)), 6)").as("max_abs_z"))
  }

  /** Welch's two-sample t-test per event type — the A/B experiment
    * readout: arms assigned by `user_id % 2` (the deterministic hash
    * split a real assignment service would persist), metric = event
    * value. t = (m̄_a − m̄_b)/√(v_a/n_a + v_b/n_b) with the
    * Welch–Satterthwaite degrees of freedom, so unequal variances and
    * arm sizes are handled without pooling.
    *
    * Float determinism: the only cross-row aggregation is over exact
    * types — counts, and Σv / Σv² as DECIMAL (values quantized to
    * cents first, the repo's money convention, so the squares are
    * exact too). Means, variances, t and df then derive per-group
    * from those exact sums via the IDENTICAL arithmetic expression on
    * both engines (same IEEE op order), rounded to 6 dp only at the
    * edge. One conditional-aggregate pass: map-side partials, a single
    * 5-row shuffle — the same plan at any event count. */
  def qAbTtest(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_type"), (col("user_id") % 2).cast("int").as("arm"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("v2", (col("v") * col("v")).cast("decimal(38,4)"))
    ev.groupBy("event_type")
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 0, col("v")).otherwise(lit(null))).as("s_a"),
        sum(when(col("arm") === 1, col("v")).otherwise(lit(null))).as("s_b"),
        sum(when(col("arm") === 0, col("v2")).otherwise(lit(null))).as("q_a"),
        sum(when(col("arm") === 1, col("v2")).otherwise(lit(null))).as("q_b"))
      .withColumn("var_a", expr(
        "(cast(q_a as double) - cast(s_a as double) * cast(s_a as double) / n_a) / (n_a - 1)"))
      .withColumn("var_b", expr(
        "(cast(q_b as double) - cast(s_b as double) * cast(s_b as double) / n_b) / (n_b - 1)"))
      .withColumn("se2", expr("var_a / n_a + var_b / n_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        expr("round(cast(s_a as double) / n_a, 6)").as("mean_a"),
        expr("round(cast(s_b as double) / n_b, 6)").as("mean_b"),
        expr("round(var_a, 6)").as("var_a"),
        expr("round(var_b, 6)").as("var_b"),
        expr("round((cast(s_a as double) / n_a - cast(s_b as double) / n_b) / sqrt(se2), 6)")
          .as("t_stat"),
        expr("round(se2 * se2 / ((var_a / n_a) * (var_a / n_a) / (n_a - 1) + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6)")
          .as("welch_df"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per event type — the
    * distribution-level A/B readout companion to [[qAbTtest]] (same
    * `user_id % 2` arms): D = sup_x |F_a(x) − F_b(x)| over the two
    * arms' empirical CDFs of the event value.
    *
    * Distributed shape: `groupBy(event_type, value)` collapses the
    * facts to per-distinct-value arm counts (the only data-sized
    * shuffle, map-side combined). The ECDF cumulative sums then use
    * the repo's TWO-LEVEL pattern (same as the vocab rank and the
    * skyline): a per-(type, value-bucket) window for the local running
    * sum — parallel across buckets — plus a tiny bucket-total relation
    * whose offsets broadcast back. No single-partition window touches
    * anything data-sized. Float determinism: cumulative counts and
    * totals are exact integers; each |ca/ta − cb/tb| is the identical
    * double expression on both engines, and max() is order-insensitive;
    * rounded to 6 dp at the edge. */
  def qKsTest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = graft.Tables.events(s, d)
      .select(col("event_type"), (col("user_id") % 2).cast("int").as("arm"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy("event_type", "v")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"))
      .withColumn("bucket", floor(col("v") / 50).cast("int"))
    val wLocal = Window.partitionBy("event_type", "bucket").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wPrev = Window.partitionBy("event_type").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wType = Window.partitionBy("event_type")
    val offs = g.groupBy("event_type", "bucket")
      .agg(sum("na").as("ba"), sum("nb").as("bb"))
      .withColumn("oa", coalesce(sum("ba").over(wPrev), lit(0L)))
      .withColumn("ob", coalesce(sum("bb").over(wPrev), lit(0L)))
      .withColumn("ta", sum("ba").over(wType))
      .withColumn("tb", sum("bb").over(wType))
      .select("event_type", "bucket", "oa", "ob", "ta", "tb")
    g.withColumn("la", sum("na").over(wLocal))
      .withColumn("lb", sum("nb").over(wLocal))
      .join(broadcast(offs), Seq("event_type", "bucket"))
      .withColumn("diff", expr(
        "abs(cast(oa + la as double) / ta - cast(ob + lb as double) / tb)"))
      .groupBy("event_type")
      .agg(max("ta").as("n_a"), max("tb").as("n_b"),
        round(max("diff"), 6).as("ks_d"))
  }

  /** EWMA control chart over daily event volumes — the monitoring
    * operator that pages when a pipeline's input rate spikes or drops
    * (α = 0.2, integer fixed-point at 10⁶ so both engines fold the
    * recurrence bit-identically: s₀ = 10⁶·c₀, sₜ = (2·10⁶·cₜ + 8·sₜ₋₁)
    * div 10; positive operands only, so truncating and floor division
    * agree). A day is a spike when cₜ > 1.5× the PRIOR smoothed level,
    * a drop when cₜ < 0.5× it — both tested as integer cross-products.
    *
    * Scale shape: the corpus-sized work is the (type, day) count with
    * map-side combine; the sequential fold then runs per type over
    * O(calendar days) rows — bounded by the date range, not the corpus
    * — as a codegen'd HOF over the sorted per-type array, parallel
    * across types. The oracle replays the recurrence as a recursive
    * CTE. */
  def qEwmaAnomaly(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(s, d, "n_events")
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day_idx"), col("n_events")))).as("days"))
      .withColumn("tl", expr(
        """aggregate(days,
          |  struct(CAST(-1 AS BIGINT) AS prev,
          |    CAST(array() AS ARRAY<STRUCT<day_idx: BIGINT, n_events: BIGINT, prev_ewma: BIGINT, ewma: BIGINT>>) AS out),
          |  (acc, x) -> struct(
          |    CASE WHEN acc.prev < 0 THEN x.n_events * 1000000
          |         ELSE (2 * x.n_events * 1000000 + 8 * acc.prev) div 10 END AS prev,
          |    acc.out || array(struct(
          |      x.day_idx AS day_idx, x.n_events AS n_events,
          |      CASE WHEN acc.prev < 0 THEN CAST(NULL AS BIGINT) ELSE acc.prev END AS prev_ewma,
          |      CASE WHEN acc.prev < 0 THEN x.n_events * 1000000
          |           ELSE (2 * x.n_events * 1000000 + 8 * acc.prev) div 10 END AS ewma)) AS out),
          |  acc -> acc.out)""".stripMargin))
      .select(col("event_type"), explode(col("tl")).as("t"))
      .select(col("event_type"), col("t.day_idx"), col("t.n_events"),
        col("t.prev_ewma"), col("t.ewma"),
        coalesce(col("t.n_events") * 2000000L > col("t.prev_ewma") * 3, lit(false)).as("is_spike"),
        coalesce(col("t.n_events") * 2000000L < col("t.prev_ewma"), lit(false)).as("is_drop"))
  }

  /** Exact floor division as SQL text, identical in Spark and DuckDB.
    * Spark's `div` truncates toward zero while DuckDB's `//` floors, so
    * they disagree on negative operands; subtracting the POSITIVE
    * remainder (((x % d) + d) % d — `%` is truncated-mod with the
    * dividend's sign in BOTH engines) first makes the numerator exactly
    * divisible, where truncation and floor agree. */
  private def fdiv(x: String, dd: Int): String =
    s"(($x) - (((($x) % $dd) + $dd) % $dd)) div $dd"

  /** Holt's linear-trend double-exponential smoothing over daily event
    * volumes — the two-state time-series fold (level + trend) behind
    * short-horizon forecasting and trend-aware alerting; one state
    * (q_ewma_anomaly) can't see a steady ramp, the trend term can.
    * α = 0.2, β = 0.1 in integer fixed-point at 10⁶:
    * lₜ = ⌊(2·10⁶·cₜ + 8·(lₜ₋₁+bₜ₋₁)) / 10⌋, bₜ = ⌊((lₜ−lₜ₋₁) + 9·bₜ₋₁) / 10⌋.
    * The trend can go NEGATIVE, so the fold uses [[fdiv]] (exact floor
    * division) rather than the positive-only `div` the EWMA query gets
    * away with; the init flag is an explicit boolean, not a sentinel a
    * negative state could collide with.
    *
    * Scale shape: corpus-sized work is the map-side-combined
    * (type, day) count; the sequential fold runs per type over
    * O(calendar days) rows as a codegen HOF, parallel across types.
    * The oracle replays the recurrence as a recursive CTE. */
  def qHoltTrend(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(s, d, "n_events")
    val lnew = "CASE WHEN NOT acc.init THEN x.n_events * 1000000 ELSE " +
      fdiv("2 * x.n_events * 1000000 + 8 * (acc.pl + acc.pb)", 10) + " END"
    val bnew = "CASE WHEN NOT acc.init THEN CAST(0 AS BIGINT) ELSE " +
      fdiv(s"(($lnew) - acc.pl) + 9 * acc.pb", 10) + " END"
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day_idx"), col("n_events")))).as("days"))
      .withColumn("tl", expr(
        s"""aggregate(days,
           |  struct(CAST(0 AS BIGINT) AS pl, CAST(0 AS BIGINT) AS pb,
           |    false AS init,
           |    CAST(array() AS ARRAY<STRUCT<day_idx: BIGINT, n_events: BIGINT, level: BIGINT, trend: BIGINT>>) AS out),
           |  (acc, x) -> struct(
           |    ($lnew) AS pl,
           |    ($bnew) AS pb,
           |    true AS init,
           |    acc.out || array(struct(x.day_idx AS day_idx, x.n_events AS n_events,
           |      ($lnew) AS level, ($bnew) AS trend)) AS out),
           |  acc -> acc.out)""".stripMargin))
      .select(col("event_type"), explode(col("tl")).as("t"))
      .select(col("event_type"), col("t.day_idx"), col("t.n_events"),
        col("t.level"), col("t.trend"),
        (col("t.level") + col("t.trend")).as("forecast_next"))
  }

  /** Classical seasonal decomposition of daily event volume per type:
    * trend = centered 7-day moving average (a value-based RANGE frame,
    * null unless all 7 days are present), seasonal index = per
    * day-of-week mean of the detrended ratio, residual = ratio −
    * seasonal. All integer fixed-point at 10⁶ (positive operands, so
    * `div` is exact floor in both engines) — no float recurrences.
    *
    * Scale shape: corpus-sized work is the map-side-combined
    * (type, day) count; every window after that runs over O(calendar
    * days) rows partitioned by type, and the seasonal join is a
    * broadcast of type×7 rows. */
  def qSeasonalDecompose(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(s, d, "n_events")
    val w7 = Window.partitionBy("event_type").orderBy("day_idx")
      .rangeBetween(-3, 3)
    val t = daily
      .withColumn("n7", count(lit(1)).over(w7))
      .withColumn("s7", sum("n_events").over(w7))
      .withColumn("trend_scaled", when(col("n7") === 7, expr("s7 * 1000000 div 7")))
      .drop("n7", "s7")
      .withColumn("dow", expr("day_idx % 7"))
      .withColumn("ratio_scaled",
        expr("CASE WHEN trend_scaled IS NOT NULL THEN n_events * 1000000000000 div trend_scaled END"))
    val seas = t.filter(col("ratio_scaled").isNotNull)
      .groupBy("event_type", "dow")
      .agg(expr("sum(ratio_scaled) div count(1)").as("seas_scaled"))
    t.join(broadcast(seas), Seq("event_type", "dow"), "left")
      .select(col("event_type"), col("day_idx"), col("n_events"), col("dow"),
        col("trend_scaled"), col("ratio_scaled"), col("seas_scaled"),
        (col("ratio_scaled") - col("seas_scaled")).as("resid_scaled"))
  }

  /** Exact sliding-window COUNT DISTINCT — rolling 7-day active users
    * (WAU) next to daily actives (DAU), the product-analytics number a
    * naive window can't produce because DISTINCT doesn't decompose
    * over overlapping frames. The scale-safe construction: each
    * (user, day) FIRST-appearance-in-window contributes to exactly the
    * windows ending in [max(day, prev_day+7), day+6], so exploding
    * that ≤7-day range and counting per end-day is the exact WAU — a
    * per-user lag, a bounded explode, one count. No window ever sees
    * more than its own contributions; nothing is quadratic.
    *
    * Scale shape: (user, day) distinct is one shuffle; the lag window
    * partitions by user; the explode fans out ≤7×; the final count is
    * map-side-combined over O(calendar days) keys; the observed-day
    * filter broadcasts a calendar-sized list. */
  def qSlidingDistinct(s: SparkSession, d: String): DataFrame = {
    val du = graft.Tables.events(s, d)
      .select(col("user_id"), dayIdx.as("day_idx"))
      .distinct()
    val wU = Window.partitionBy("user_id").orderBy("day_idx")
    val contrib = du
      .withColumn("prev_day", lag("day_idx", 1).over(wU))
      .withColumn("lo", greatest(col("day_idx"),
        coalesce(col("prev_day") + 7, col("day_idx"))))
      .select(col("user_id"), explode(expr("sequence(lo, day_idx + 6)")).as("d"))
    val wau = contrib.groupBy("d").agg(count(lit(1)).as("n_active_7d"))
    val dau = du.groupBy("day_idx").agg(count(lit(1)).as("n_active_1d"))
    wau.join(broadcast(dau), wau("d") === dau("day_idx"))
      .select(col("day_idx"), col("n_active_7d"), col("n_active_1d"))
  }

  /** Gaps-and-islands activity streaks (the engagement metric behind
    * "7-day streak" badges and habit cohorts): each user's longest run
    * of CONSECUTIVE active days via the classic day_idx − row_number
    * island key, reduced to a distribution of best-streak lengths.
    *
    * Scale shape: one (user, day) distinct shuffle, then per-user
    * windows (bounded by a user's active days); the output aggregate
    * is O(max streak) rows. All integers — hash-exact. */
  def qStreaks(s: SparkSession, d: String): DataFrame = {
    val du = graft.Tables.events(s, d)
      .select(col("user_id"), dayIdx.as("day_idx"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day_idx")
    val streaks = du
      .withColumn("rn", row_number().over(w))
      .withColumn("island", col("day_idx") - col("rn"))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"), min("day_idx").as("start_day"))
    val wBest = Window.partitionBy("user_id").orderBy(col("len").desc, col("start_day"))
    streaks.withColumn("rk", row_number().over(wBest)).filter(col("rk") === 1)
      .groupBy(col("len").as("best_streak"))
      .agg(count(lit(1)).as("n_users"), min("user_id").as("example_user"))
  }

  /** Sample autocorrelation function of daily event volume at lags
    * 1..7 per event type — the diagnostic behind seasonality detection
    * (a weekly cycle shows as a lag-7 peak) and forecast-model order
    * selection. Pearson r over the lag-L pair set, computed from exact
    * BIGINT sums (n·Σxy − Σx·Σy over n·Σxx − (Σx)² style), with the
    * single double division + sqrt happening once per (type, lag) on
    * those exact integers — hash-stable against the oracle.
    *
    * Scale shape: the only corpus-sized work is the map-side-combined
    * (type, day) count; the lag join is an equi-join on
    * (type, day+lag) over O(types × calendar days × 7) rows. The
    * variance guard nulls r for constant series. */
  def qAcf(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(s, d, "n")
    val a = daily
      .withColumn("lag_d", explode(expr("sequence(CAST(1 AS BIGINT), CAST(7 AS BIGINT))")))
    val b = daily.select(col("event_type").as("et2"), col("day_idx").as("day2"),
      col("n").as("y"))
    a.join(b, col("et2") === col("event_type") &&
        col("day2") === col("day_idx") + col("lag_d"))
      .groupBy("event_type", "lag_d")
      .agg(count(lit(1)).as("n_pairs"),
        sum("n").as("sx"), sum("y").as("sy"),
        sum(col("n") * col("y")).as("sxy"),
        sum(col("n") * col("n")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("lag_d"), col("n_pairs"),
        (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("acf_num"),
        expr("""CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
                |THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                |  / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                |       * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6) END""".stripMargin)
          .as("acf"))
  }

  /** Two-sided CUSUM changepoint detection (Page 1954) over daily event
    * volume — the classic drift detector for pipeline-health monitoring:
    * S⁺ₜ = max(0, S⁺ₜ₋₁ + xₜ − μ), S⁻ₜ = max(0, S⁻ₜ₋₁ + μ − xₜ) against
    * the per-type mean μ, alarming when either sum exceeds 3 μ
    * (three mean-days of cumulative drift). Integer fixed-point at 10⁶
    * (counts are positive; `div` for μ is exact floor in both engines),
    * recurrence as a codegen'd HOF fold like [[qEwmaAnomaly]]; the
    * oracle replays it as a recursive CTE.
    *
    * Scale shape: corpus-sized work is the map-side-combined
    * (type, day) count; the fold runs per type over O(calendar days)
    * rows, parallel across types. */
  def qCusum(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(s, d, "n")
    val spNew = "greatest(CAST(0 AS BIGINT), acc.sp + x.n * 1000000 - mu_ppm)"
    val snNew = "greatest(CAST(0 AS BIGINT), acc.sn + mu_ppm - x.n * 1000000)"
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day_idx"), col("n")))).as("days"),
        sum("n").as("tot"), count(lit(1)).as("nd"))
      .withColumn("mu_ppm", expr("tot * 1000000 div nd"))
      .withColumn("tl", expr(
        s"""aggregate(days,
           |  struct(CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
           |    CAST(array() AS ARRAY<STRUCT<day_idx: BIGINT, n: BIGINT, sp: BIGINT, sn: BIGINT>>) AS out),
           |  (acc, x) -> struct(
           |    ($spNew) AS sp,
           |    ($snNew) AS sn,
           |    acc.out || array(struct(x.day_idx AS day_idx, x.n AS n,
           |      ($spNew) AS sp, ($snNew) AS sn)) AS out),
           |  acc -> acc.out)""".stripMargin))
      .select(col("event_type"), col("mu_ppm"), explode(col("tl")).as("t"))
      .select(col("event_type"), col("t.day_idx"), col("t.n").as("n_events"),
        col("t.sp").as("cusum_pos"), col("t.sn").as("cusum_neg"),
        (col("t.sp") > col("mu_ppm") * 3 || col("t.sn") > col("mu_ppm") * 3)
          .as("is_alarm"))
  }

  /** Mann-Whitney U rank-sum test (the nonparametric A/B companion to
    * [[qAbTtest]] — robust to the heavy-tailed metric distributions
    * where the t-test's mean is the wrong summary) between the same
    * user_id-parity arms, per event type. Tie-correct average ranks
    * stay integer by carrying 2·avg_rank = 2·rank() + ties − 1; U, the
    * rank-biserial-equivalent AUC (P(a > b) + ½P(tie), the probability
    * a random arm-A metric exceeds arm-B's), and the normal-approx z
    * are derived from those exact sums with one double expression each.
    *
    * Scale shape: one rank window per type (sort-based, spillable) over
    * the corpus, then a per-type aggregate — same shape as the KS test.
    * At 100 TB the per-type sort is the shuffle; no all-pairs anything
    * (U via rank sums, never via the n²  pair comparison). */
  def qMannWhitney(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(user_id % 2 AS INTEGER)").as("arm"),
        col("value").cast("decimal(18,2)").as("v"))
    val wr = Window.partitionBy("event_type").orderBy("v")
    val wt = Window.partitionBy("event_type", "v")
    ev.withColumn("rmin", rank().over(wr).cast("long"))
      .withColumn("ties", count(lit(1)).over(wt))
      .groupBy("event_type")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 0, col("rmin") * 2 + col("ties") - 1)
          .otherwise(0L)).as("r_a_x2"))
      // wins convention: U_a = R_a − n_a(n_a+1)/2 counts a-over-b wins
      // (+½ per tie), so AUC below is literally P(a > b) + ½P(a = b)
      .withColumn("u_a_x2", col("r_a_x2") - col("n_a") * (col("n_a") + 1))
      .withColumn("u_b_x2", lit(2) * col("n_a") * col("n_b") - col("u_a_x2"))
      .withColumn("auc_ab", expr(
        "round(CAST(u_a_x2 AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)"))
      .withColumn("z_stat", expr(
        """round((CAST(u_a_x2 AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / 2
          |  / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * (n_a + n_b + 1) / 12.0), 6)""".stripMargin))
  }

  /** Sequential pattern mining over per-user event streams: every
    * CONSECUTIVE event-type trigram (the length-3 sequences a
    * PrefixSpan run would surface first), with support against all
    * trigram occurrences and confidence against the bigram prefix —
    * the "what happens after view→click" table behind next-action
    * prediction and funnel design. Both ratios are exact integer ppm
    * (the trigram/bigram counts are BIGINTs; bigram count = window sum
    * of trigram counts over the shared prefix, so numerator and
    * denominator come from the same relation).
    *
    * Scale shape: one per-user sort window (two LEADs share it), one
    * map-side-combined count over ≤ |types|³ keys; the ppm windows run
    * on that types³-sized aggregate, not the corpus. */
  def qSeqTrigrams(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tri = graft.Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"))
      .withColumn("t2", lead("t1", 1).over(w))
      .withColumn("t3", lead("t1", 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n_tri"))
    val wBig = Window.partitionBy("t1", "t2")
    val wAll = Window.partitionBy()
    tri.withColumn("n_big", sum("n_tri").over(wBig))
      .withColumn("n_total", sum("n_tri").over(wAll))
      .select(col("t1"), col("t2"), col("t3"), col("n_tri"), col("n_big"),
        expr("n_tri * 1000000 div n_big").as("conf_ppm"),
        expr("n_tri * 1000000 div n_total").as("support_ppm"))
  }

  /** HITS hub/authority scoring (Kleinberg 1999), two message-passing
    * rounds over the user↔event-type bipartite engagement graph:
    * a₁(e) = deg(e) (hubs init 1), h₁(u) = Σ_{e∋u} a₁(e),
    * a₂(e) = Σ_{u∋e} h₁(u). An event type is "authoritative" when the
    * users it reaches are themselves broadly-engaged hubs — the same
    * two-hop credit idea PageRank applies to the near-dup graph
    * (q_graph_pagerank), here on the bipartite form. Unnormalized
    * integer scores (exact), plus each authority's ppm share.
    *
    * Scale shape: each round is one equi-join + one map-side-combined
    * aggregate keyed on user or type; the type-side relations are
    * tiny and broadcast. No normalization sqrt — shares are integer
    * ppm of the total. */
  def qHits(s: SparkSession, d: String): DataFrame = {
    val edges = graft.Tables.events(s, d)
      .select(col("user_id"), col("event_type")).distinct()
    val a1 = edges.groupBy("event_type").agg(count(lit(1)).as("n_users"))
    val h1 = edges.join(broadcast(a1), "event_type")
      .groupBy("user_id").agg(sum("n_users").as("h1"))
    // user-keyed join stays a shuffle join: the hub side scales with the
    // user population (broadcasting it would not survive 100 TB); both
    // inputs are already partitioned on user_id from the groupBy above.
    val a2 = edges.join(h1, "user_id")
      .groupBy("event_type")
      .agg(sum("h1").as("auth2"), max("h1").as("max_hub"))
    a1.join(a2, "event_type")
      .withColumn("auth2_ppm",
        expr("auth2 * 1000000 div sum(auth2) OVER ()"))
  }

  /** Gini coefficient of per-user activity concentration, per event
    * type — the inequality audit behind "is this signal driven by a few
    * power users?" (and, on a training corpus, "do a few sources
    * dominate the token count?"). Computed from the GROUPED activity
    * distribution: G = 1 − Σ nᵢ·(Sᵢ₋₁+Sᵢ) / (N·S) over distinct
    * activity levels i sorted ascending, with every sum an exact
    * BIGINT (the numerator uses Sᵢ₋₁+Sᵢ = 2Sᵢ − nᵢxᵢ so one
    * cumulative window suffices); the single double division happens
    * once per type.
    *
    * Scale shape: one per-(type, user) count shuffle over the corpus,
    * then a histogram over DISTINCT activity levels (≤ max activity —
    * hundreds, not users): the cumulative window runs on that tiny
    * grouped relation, never a global per-user sort. */
  def qGini(s: SparkSession, d: String): DataFrame = {
    val u = graft.Tables.events(s, d)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("x"))
    val h = u.groupBy("event_type", "x").agg(count(lit(1)).as("n_u"))
    val wc = Window.partitionBy("event_type").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.withColumn("s_cum", sum(col("n_u") * col("x")).over(wc))
      .groupBy("event_type")
      .agg(sum("n_u").as("n_users"),
        sum(col("n_u") * col("x")).as("total_events"),
        sum(col("n_u") * (lit(2) * col("s_cum") - col("n_u") * col("x")))
          .as("gini_num"))
      .withColumn("gini", expr(
        "round(1.0 - CAST(gini_num AS DOUBLE) / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE)), 6)"))
  }

  /** Stationary distribution of the user-journey Markov chain — three
    * power steps of πP from uniform over the [[qEventTransitions]]
    * matrix, the "where do users end up spending their sessions"
    * summary that one-step transition probabilities can't answer.
    * Row-stochastic P in integer ppm (nᵢⱼ·10⁶ div nᵢ·), each step
    * πⱼ' = (Σᵢ πᵢ·pᵢⱼ) div 10⁶ — exact integers end to end.
    *
    * Scale shape: the corpus-sized work is the per-user LEAD window +
    * the |types|² transition count; that ≤ 25-row matrix is collected
    * and the d×d iteration runs on the driver (the [[Similarity
    * .qPcaPower]] pattern — shipping a 25-row matrix through three
    * distributed joins would re-run the corpus aggregation per
    * reference). The oracle unrolls the same three steps as CTEs. */
  def qMarkovStationary(s: SparkSession, d: String): DataFrame = {
    // the pair derivation is the SHARED transitionPairs core (the same
    // (ts, event_id) ordering convention the streaming twin's parity
    // spec pins) — an inline copy here would silently keep the old
    // convention if that ordering ever changed
    val trans = transitionPairs(graft.Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (trans.map(_._1) ++ trans.map(_._2)).distinct.sorted
    val nFrom = trans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val pPpm = trans.map { case (f, t, n) => (f, t) -> n * 1000000L / nFrom(f) }.toMap
    var pi = states.map(_ => 1000000L / states.length).toArray
    val hist = Array.newBuilder[Array[Long]]
    hist += pi
    (1 to 3).foreach { _ =>
      pi = states.map(t => states.zip(pi).map { case (f, p) =>
        p * pPpm.getOrElse((f, t), 0L)
      }.sum / 1000000L).toArray
      hist += pi
    }
    val h = hist.result()
    import s.implicits._
    states.indices.map(i =>
      (states(i), h(0)(i), h(1)(i), h(2)(i), h(3)(i)))
      .toDF("event_type", "pi0_ppm", "pi1_ppm", "pi2_ppm", "pi3_ppm")
  }

  /** Kaplan-Meier survival estimate of user lifetime (first activity →
    * last activity), with right-censoring for users still active near
    * the corpus horizon — the churn-analysis estimator a naive "mean
    * lifetime" gets wrong because censored users aren't churned, just
    * unfinished. S(d) = Π_{t ≤ d} (1 − dₜ/nₜ) over the duration-grouped
    * relation (risk set nₜ = suffix count, events dₜ = churned at t),
    * in integer ppm fixed point (sₜ = sₜ₋₁·(nₜ−dₜ) div nₜ); the oracle
    * replays the recurrence as a recursive CTE.
    *
    * Scale shape: one per-user min/max shuffle over the corpus; the
    * duration histogram is calendar-bounded (≤ observation days), and
    * the sequential product folds over that tiny sorted array as a
    * codegen HOF — the same shape as [[qEwmaAnomaly]]. */
  def qSurvivalKm(s: SparkSession, d: String): DataFrame = {
    val users = graft.Tables.events(s, d)
      .select(col("user_id"),
        dayIdx.as("day_idx"))
      .groupBy("user_id")
      .agg(min("day_idx").as("first_day"), max("day_idx").as("last_day"))
    val horizon = users.agg(max("last_day").as("w_day"))
    val h = users.crossJoin(broadcast(horizon))
      .select((col("last_day") - col("first_day")).as("dur"),
        when(col("last_day") < col("w_day") - 2, 1L).otherwise(0L).as("churn"))
      .groupBy("dur")
      .agg(count(lit(1)).as("n_total"), sum("churn").as("n_churn"))
    h.groupBy()
      .agg(sort_array(collect_list(struct(col("dur"), col("n_total"), col("n_churn")))).as("ds"),
        sum("n_total").as("n_all"))
      .withColumn("tl", expr(
        """aggregate(ds,
          |  struct(CAST(1000000 AS BIGINT) AS s, CAST(0 AS BIGINT) AS seen,
          |    CAST(array() AS ARRAY<STRUCT<dur: BIGINT, n_risk: BIGINT, n_churn: BIGINT, surv_ppm: BIGINT>>) AS out),
          |  (acc, x) -> struct(
          |    acc.s * (n_all - acc.seen - x.n_churn) div (n_all - acc.seen) AS s,
          |    acc.seen + x.n_total AS seen,
          |    acc.out || array(struct(x.dur AS dur,
          |      n_all - acc.seen AS n_risk, x.n_churn AS n_churn,
          |      acc.s * (n_all - acc.seen - x.n_churn) div (n_all - acc.seen) AS surv_ppm)) AS out),
          |  acc -> acc.out)""".stripMargin))
      .select(explode(col("tl")).as("t"))
      .select(col("t.dur"), col("t.n_risk"), col("t.n_churn"), col("t.surv_ppm"))
  }

  /** Theil-Sen robust trend estimation of daily event volume — the
    * median of all pairwise slopes, the robust-regression counterpart
    * to [[qHoltTrend]]'s smoother: a single anomalous day (outage,
    * backfill spike) drags a least-squares slope but moves the slope
    * MEDIAN almost nothing. Slopes are exact integer ppm/day via the
    * positive-remainder floor division (slopes can be negative; day
    * gaps are positive), and the reported slope is the exact LOWER
    * median — no interpolation, no floats.
    *
    * Scale shape: corpus-sized work is the map-side-combined
    * (type, day) count; the pair join and median rank run over
    * O(calendar days²) rows per type — bounded by the date range, not
    * the corpus. */
  def qTheilSen(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(s, d, "n")
    val b = daily.select(col("event_type").as("et2"), col("day_idx").as("d2"),
      col("n").as("n2"))
    val slopes = daily.join(b, col("et2") === col("event_type") && col("d2") > col("day_idx"))
      .withColumn("slope_ppm", expr(
        """((n2 - n) * 1000000 - ((((n2 - n) * 1000000) % (d2 - day_idx) + (d2 - day_idx)) % (d2 - day_idx)))
          |  div (d2 - day_idx)""".stripMargin))
    val wr = Window.partitionBy("event_type").orderBy(col("slope_ppm"), col("day_idx"), col("d2"))
    slopes
      .withColumn("rn", row_number().over(wr))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        min("slope_ppm").as("slope_min"), max("slope_ppm").as("slope_max"),
        max(when(expr("rn = (cnt + 1) div 2"), col("slope_ppm"))).as("slope_med_ppm"))
  }

  /** Spearman rank correlation between an event's metric value and its
    * user's overall activity level, per event type — the monotone-
    * association companion to the Pearson-based [[qAcf]]: "do heavy
    * users report higher values?" answered without assuming linearity
    * or caring about outlier magnitudes. Tie-correct: both variables
    * carry integer 2·avg-rank (2·rank() + ties − 1), ρ is Pearson on
    * those exact rank sums — BIGINT Σu, Σv, Σuv, Σu², Σv² (Σuv ≤ 4n³,
    * safe through sf100 in int64); the n·Σ cross-products are formed
    * in DOUBLE with identical expression text in both engines.
    *
    * Scale shape: one per-user activity count (corpus shuffle on
    * user) equi-joined back onto events on the same user key; two
    * rank windows per type (sort-based, spillable); a per-type
    * aggregate. Never an all-pairs form. */
  def qSpearman(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        col("value").cast("decimal(18,2)").as("v"))
    val act = ev.groupBy("user_id").agg(count(lit(1)).as("activity"))
    val wv = Window.partitionBy("event_type").orderBy("v")
    val wvt = Window.partitionBy("event_type", "v")
    val wa = Window.partitionBy("event_type").orderBy("activity")
    val wat = Window.partitionBy("event_type", "activity")
    ev.join(act, "user_id")
      .withColumn("u", rank().over(wv).cast("long") * 2 + count(lit(1)).over(wvt) - 1)
      .withColumn("w", rank().over(wa).cast("long") * 2 + count(lit(1)).over(wat) - 1)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("u").as("su"), sum("w").as("sw"),
        sum(col("u") * col("w")).as("suw"),
        sum(col("u") * col("u")).as("suu"),
        sum(col("w") * col("w")).as("sww"))
      .select(col("event_type"), col("n"),
        expr("""CASE WHEN CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su > 0
                |  AND CAST(n AS DOUBLE) * sww - CAST(sw AS DOUBLE) * sw > 0
                |THEN round((CAST(n AS DOUBLE) * suw - CAST(su AS DOUBLE) * sw)
                |  / sqrt((CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su)
                |       * (CAST(n AS DOUBLE) * sww - CAST(sw AS DOUBLE) * sw)), 6) END""".stripMargin)
          .as("rho"))
  }

  /** Funnel conversion-latency distribution — the time dimension the
    * stage counts ([[qEventFunnel]]) flatten away: for every user who
    * completed view → click → purchase IN ORDER, the seconds spent in
    * each leg and end-to-end, summarized as exact counts plus
    * interpolated percentiles (the same percentile/quantile_cont
    * contract as q_quantile_stats). The p90 end-to-end latency is the
    * "how long does a conversion actually take" number funnel
    * optimization starts from.
    *
    * Scale shape: the conditional-min cascade is three user-keyed
    * aggregates sharing one partitioning (the funnel shape); the
    * percentile aggregate runs over converting users only. */
  def qFunnelLatency(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val (v, c, p) = funnelStageMins(ev)
    v.join(c, "user_id").join(p, "user_id")
      .select(
        (unix_timestamp(col("tc")) - unix_timestamp(col("tv"))).as("s_vc"),
        (unix_timestamp(col("tp")) - unix_timestamp(col("tc"))).as("s_cp"),
        (unix_timestamp(col("tp")) - unix_timestamp(col("tv"))).as("s_vp"))
      .agg(count(lit(1)).as("n_converters"),
        expr("percentile(s_vc, 0.5D)").as("p50_view_click_s"),
        expr("percentile(s_cp, 0.5D)").as("p50_click_buy_s"),
        expr("percentile(s_vp, 0.5D)").as("p50_total_s"),
        expr("percentile(s_vp, 0.9D)").as("p90_total_s"),
        max("s_vp").as("max_total_s"))
  }

  /** One-step-ahead backtest of the Holt forecaster ([[qHoltTrend]]) —
    * the eval that decides whether the trend model earns its keep:
    * each day's forecast (level + trend) is scored against the NEXT
    * observed day's actual volume, per type, as integer-ppm absolute
    * percentage errors (MAPE and worst case). Models that only
    * interpolate look great in-sample; this scores them strictly
    * out-of-sample, which is the honest number.
    *
    * Scale shape: adds one per-type LEAD window and a tiny aggregate
    * on top of the Holt fold's calendar-bounded output — corpus cost
    * identical to the forecaster itself. */
  def qForecastBacktest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day_idx")
    qHoltTrend(s, d)
      .withColumn("nxt", lead("n_events", 1).over(w))
      .filter(col("nxt").isNotNull)
      .withColumn("ape_ppm", expr("abs(forecast_next - nxt * 1000000) div nxt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_evals"),
        expr("sum(ape_ppm) div count(1)").as("mape_ppm"),
        max("ape_ppm").as("max_ape_ppm"))
  }

  /** Per-type OLS trend line over the daily event-count series — the
    * closed-form least-squares fit (slope, intercept, R²) every
    * monitoring stack runs next to the robust Theil–Sen line
    * ([[qTheilSen]]): OLS is the cheap, variance-weighted answer;
    * comparing the two slopes flags outlier-driven trends.
    *
    * Determinism: x is the day offset from the per-type minimum day (so
    * sums stay far from BIGINT range), all five moment sums (Σx, Σy,
    * Σxy, Σxx, Σyy) are exact integer aggregates, and slope/intercept/R²
    * each divide once at the end from integer-closed-form numerators —
    * order-insensitive, so the result hash-matches DuckDB exactly.
    *
    * Scale shape: one map-side-combined (type, day) count, one tiny
    * per-type moment aggregate. Nothing leaves the keyed partitioning;
    * series length only enters through O(days) rows per type. */
  def qLinregTrend(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(s, d, "n")
    daily
      .withColumn("min_day", min("day_idx").over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
      .select(col("event_type"), (col("day_idx") - col("min_day")).as("x"), col("n").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("k"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("k").as("n_days"),
        expr("""CASE WHEN k * sxx - sx * sx > 0
               |THEN round(CAST(k * sxy - sx * sy AS DOUBLE) / (k * sxx - sx * sx), 6) END""".stripMargin)
          .as("slope"),
        expr("""CASE WHEN k * sxx - sx * sx > 0
               |THEN round(CAST(sy * sxx - sx * sxy AS DOUBLE) / (k * sxx - sx * sx), 6) END""".stripMargin)
          .as("intercept"),
        expr("""CASE WHEN k * sxx - sx * sx > 0 AND k * syy - sy * sy > 0
               |THEN round(CAST(k * sxy - sx * sy AS DOUBLE) * (k * sxy - sx * sy)
               |  / (CAST(k * sxx - sx * sx AS DOUBLE) * (k * syy - sy * sy)), 6) END""".stripMargin)
          .as("r2"))
  }

  /** Lead–lag cross-correlation between every pair of event-type daily
    * series at lags 0-5 — the "does signups lead purchases by N days"
    * primitive behind marketing attribution and capacity forecasting.
    * Pearson r between type A's count on day t and type B's count on
    * day t+lag, over days where both series have observations (the same
    * matched-pairs convention [[qAcf]] uses within one series).
    *
    * Exact integer moment sums, one rounded division per output row —
    * hash-stable. Scale shape: the (type, day) count relation is tiny
    * (types × calendar days) regardless of event volume, so the lag
    * fan-out join is a broadcast-sized self-join; corpus-sized work is
    * only the first map-side-combined count. */
  def qCrossCorr(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(s, d, "n")
    val a = daily.select(col("event_type").as("type_a"), col("day_idx"), col("n").as("xa"))
      .withColumn("lag_d", explode(expr("sequence(CAST(0 AS BIGINT), CAST(5 AS BIGINT))")))
    val b = daily.select(col("event_type").as("type_b"), col("day_idx").as("day_b"),
      col("n").as("yb"))
    a.join(b, col("type_a") < col("type_b") &&
        col("day_b") === col("day_idx") + col("lag_d"))
      .groupBy("type_a", "type_b", "lag_d")
      .agg(count(lit(1)).as("n_pairs"),
        sum("xa").as("sx"), sum("yb").as("sy"),
        sum(col("xa") * col("yb")).as("sxy"),
        sum(col("xa") * col("xa")).as("sxx"),
        sum(col("yb") * col("yb")).as("syy"))
      .select(col("type_a"), col("type_b"), col("lag_d"), col("n_pairs"),
        expr("""CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
               |THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
               |  / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
               |       * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6) END""".stripMargin)
          .as("xcorr"))
  }

  /** Partial autocorrelation (lags 1-3) of each event type's daily
    * series via the Durbin–Levinson recursion over the lag-1..3
    * autocorrelations — the AR-order diagnostic read next to the raw ACF
    * ([[qAcf]]): a PACF that cuts off after lag p is the textbook
    * signature of an AR(p) process. The lag correlations use the same
    * matched-pairs Pearson convention as [[qAcf]] (each lag over the
    * day pairs both series observe), then
    * φ11 = r1, φ22 = (r2−r1²)/(1−r1²),
    * φ33 = (r3 − φ21·r2 − φ22·r1)/(1 − φ21·r1 − φ22·r2) with
    * φ21 = r1·(1−φ22).
    *
    * Determinism: the r's come out of exact integer moment sums through
    * one division + sqrt each — bit-identical in both engines — and the
    * recursion is a fixed dag of double ops on those values, rounded
    * once at output. Denominator guards compare the same doubles in
    * both engines, so the NULL-vs-value branch can't diverge.
    *
    * Scale shape: identical to [[qAcf]] — one map-side-combined
    * (type, day) count, a broadcast-sized lag self-join, one tiny
    * per-type aggregate, then per-row arithmetic. */
  def qPacf(s: SparkSession, d: String): DataFrame = {
    val daily = dailyCounts(s, d, "n")
    val a = daily
      .withColumn("lag_d", explode(expr("sequence(CAST(1 AS BIGINT), CAST(3 AS BIGINT))")))
    val b = daily.select(col("event_type").as("et2"), col("day_idx").as("day2"),
      col("n").as("y"))
    val rs = a.join(b, col("et2") === col("event_type") &&
        col("day2") === col("day_idx") + col("lag_d"))
      .groupBy("event_type", "lag_d")
      .agg(count(lit(1)).as("np"),
        sum("n").as("sx"), sum("y").as("sy"),
        sum(col("n") * col("y")).as("sxy"),
        sum(col("n") * col("n")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("r", expr(
        """CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
          |THEN CAST(np * sxy - sx * sy AS DOUBLE)
          |  / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
          |       * CAST(np * syy - sy * sy AS DOUBLE)) END""".stripMargin))
    rs.groupBy("event_type")
      .agg(max(when(col("lag_d") === 1, col("r"))).as("r1"),
        max(when(col("lag_d") === 2, col("r"))).as("r2"),
        max(when(col("lag_d") === 3, col("r"))).as("r3"))
      .withColumn("p22", expr(
        "CASE WHEN abs(1.0 - r1 * r1) > 1e-12 THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END"))
      .withColumn("p21", expr("r1 * (1.0 - p22)"))
      .select(col("event_type"),
        round(col("r1"), 6).as("pacf1"),
        round(col("p22"), 6).as("pacf2"),
        round(expr(
          """CASE WHEN abs(1.0 - p21 * r1 - p22 * r2) > 1e-12
            |THEN (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2) END""".stripMargin),
          6).as("pacf3"))
  }

  /** Sequential A/B monitoring (the always-valid-inference shape every
    * experimentation platform runs instead of a single end-of-test
    * t-test): purchase value split into two arms by user-id parity,
    * cumulative Welch z-statistic recomputed after EVERY day, flagged
    * against an O'Brien–Fleming-style constant boundary (|z| > 2.797,
    * the group-sequential critical value that keeps family-wise error
    * near 5% under repeated looks — a fixed 1.96 would inflate it).
    *
    * Determinism: per-day per-arm counts/sums/sum-of-squares are exact
    * integers (value fixed-pointed to cents per row before any sum),
    * cumulative sums are integer window aggregates, and each day's z is
    * one fixed dag of double ops — no float accumulation anywhere.
    *
    * Scale shape: the corpus-sized work is one map-side-combined
    * (day) aggregate; the sequential scan is a window over the
    * calendar-day relation (~O(days) rows at any corpus size). */
  def qAbSequential(s: SparkSession, d: String): DataFrame = {
    val daily = graft.Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(dayIdx.as("day_idx"),
        (col("user_id") % 2 === 0).as("arm_a"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("day_idx")
      .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("na_d"),
        sum(when(col("arm_a"), col("cents")).otherwise(0L)).as("sa_d"),
        sum(when(col("arm_a"), col("cents") * col("cents")).otherwise(0L)).as("qa_d"),
        sum(when(!col("arm_a"), 1L).otherwise(0L)).as("nb_d"),
        sum(when(!col("arm_a"), col("cents")).otherwise(0L)).as("sb_d"),
        sum(when(!col("arm_a"), col("cents") * col("cents")).otherwise(0L)).as("qb_d"))
    val w = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("na", sum("na_d").over(w)).withColumn("sa", sum("sa_d").over(w))
      .withColumn("qa", sum("qa_d").over(w))
      .withColumn("nb", sum("nb_d").over(w)).withColumn("sb", sum("sb_d").over(w))
      .withColumn("qb", sum("qb_d").over(w))
      .withColumn("z", expr(
        """CASE WHEN na > 1 AND nb > 1 THEN
          |  CASE WHEN (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1) / na
          |          + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) / nb > 0
          |  THEN round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
          |    / sqrt((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1) / na
          |         + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) / nb), 6)
          |  END END""".stripMargin))
      .select(col("day_idx"), col("na"), col("nb"),
        expr("""CASE WHEN na > 0 AND nb > 0 THEN
               |round(CAST(sa AS DOUBLE) / na / 100.0 - CAST(sb AS DOUBLE) / nb / 100.0, 6)
               |END""".stripMargin).as("mean_diff"),
        col("z"), (abs(col("z")) > 2.797).as("signif"))
  }

  /** Per-user contribution bounding — the preprocessing step every
    * differential-privacy / abuse-robust aggregation runs before
    * releasing counts (bound each user's influence so one hyperactive
    * user or bot can't dominate a statistic): cap each user's events at
    * 10 per event type and report, per type, the raw vs capped totals,
    * how many users were clipped, and the share of mass the cap removed.
    *
    * No window is needed: capping a COUNT at k is `least(c, k)` on the
    * per-(user, type) counts, so the plan is one (user_id, event_type)
    * shuffle with map-side combine followed by a type-keyed reduction —
    * strictly cheaper than the rank-and-filter form and exactly
    * integer-equal to it. */
  def qContributionCap(s: SparkSession, d: String): DataFrame = {
    graft.Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(sum("c").cast("long").as("n_raw"),
        sum(least(col("c"), lit(10L))).cast("long").as("n_capped"),
        count(lit(1)).as("n_users"),
        sum(when(col("c") > 10, 1L).otherwise(0L)).as("n_clipped"))
      .withColumn("dropped_frac",
        round((col("n_raw") - col("n_capped")).cast("double") / col("n_raw"), 6))
  }

  /** Explicit sessionization — the lag-gap form of session windows that
    * assigns a stable SESSION ID to every event (the native
    * session_window aggregate in [[qWindowSession]] gives per-session
    * aggregates but no joinable id): a session starts at any event more
    * than 30 minutes after the user's previous one, the running count
    * of session starts is the per-user session index, and each session
    * reports its event count, duration, and bounds in epoch seconds —
    * all exact integers.
    *
    * Scale shape: one user_id partitioning serves the lag, the running
    * sum, and the per-session aggregate (Spark reuses the single sort
    * within one Window stage, and the groupBy re-shuffles only the
    * session-keyed rows). */
  def qSessionize(s: SparkSession, d: String): DataFrame =
    sessionsFrom(graft.Tables.events(s, d))

  /** The lag-gap sessionizer over any (user_id, ts, event_id) relation —
    * shared with SessionStreamSpec, which proves the streaming
    * transformWithState twin emits exactly these sessions.
    *
    * Boundary convention: timestamps are floored to epoch SECONDS and a
    * successor exactly 1800 s after its predecessor stays in the SAME
    * session (`diff > 1800` starts a new one). The native
    * `session_window` is half-open at sub-second precision — an event
    * exactly gap-after is NEW there — so the two agree on integers only
    * under a 1801 s native gap; PipelineSpec's count-equality assertion
    * compares under exactly that aligned convention. */
  private[graft] def sessionsFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts").cast("long")).as("start_s"),
        max(col("ts").cast("long")).as("end_s"))
      .withColumn("duration_s", col("end_s") - col("start_s"))
  }

  /** Calendar-completeness audit — the ingestion-gap detector every
    * data-ops dashboard runs on an event feed: per event type, the
    * observed-day count against the [first, last] calendar span, the
    * total missing days, and the LONGEST consecutive outage (the lag
    * form of gaps-and-islands, on the absence side). All exact integer
    * date arithmetic.
    *
    * Scale shape: one distinct to (type, day) — map-side combined,
    * calendar-bounded output — then a per-type window over those
    * bounded day rows; the corpus is scanned once. */
  def qEventGaps(s: SparkSession, d: String): DataFrame = {
    val days = graft.Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy("event_type").orderBy("day")
    days.withColumn("prev_day", lag("day", 1).over(w))
      .withColumn("gap", when(col("prev_day").isNull, 0)
        .otherwise(datediff(col("day"), col("prev_day")) - 1))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days_observed"),
        min("day").as("first_day"), max("day").as("last_day"),
        max("gap").cast("long").as("longest_gap"),
        sum("gap").cast("long").as("n_missing"))
      .withColumn("n_days_expected",
        (datediff(col("last_day"), col("first_day")) + 1).cast("long"))
  }

  /** GRID RESAMPLE + FORWARD FILL — pandas' `resample('1h').ffill()` as a
    * distributed operator: irregular per-entity event streams become a
    * REGULAR hourly grid (every hour between the entity's first and last
    * event, gap hours included with n_events = 0) carrying the last
    * observed hourly mean forward across gaps. Every feature/monitoring
    * pipeline needs this before joining signals sampled at different
    * cadences. Scale shape: the grid is generated per entity from its
    * own (min, max) span — `explode(sequence(...))`, no cross join with
    * a global calendar — the gap join partitions by (entity, hour), and
    * the fill is one per-entity ordered window; one shuffle end to end.
    * The hourly mean is rounded BEFORE the fill so both engines
    * propagate bit-identical doubles through the window. */
  def qResampleFfill(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
      .filter(col("user_id") % 10 === 0)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
    val hourly = ev.groupBy("user_id", "hour")
      .agg(count(lit(1)).as("n"),
        round(expr("CAST(sum(v) AS DOUBLE)") / count(lit(1)), 6).as("hv"))
    val grid = ev.groupBy("user_id").agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val w = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_events"),
        last(col("hv"), ignoreNulls = true).over(w).as("v_ffill"))
  }

  /** TIME-WEIGHTED AVERAGE — the irregular-sampling companion of
    * [[qResampleFfill]] (finance TWAP / monitoring's proper mean for
    * state signals): a value observed at t holds until the NEXT
    * observation, so the honest per-entity mean weights each value by
    * its holding duration, not its sample count — a sensor that reports
    * rarely while high and often while low has a plain mean far below
    * its TWA. Exactness discipline: value in cents (×100 BIGINT),
    * duration in exact epoch micros via `lead`, products summed as
    * DECIMAL(38,0) (cents×micros reaches ~1e18 per entity — past safe
    * BIGINT headroom), ONE double division at the end. Scale shape: one
    * shuffle to (entity)-partitioned windows, then a per-entity
    * aggregate; the final relation is |entities| rows. */
  def qTimeWeightedAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    graft.Tables.events(s, d)
      .filter(col("user_id") % 10 === 0)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .withColumn("dt_us", unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .filter(col("dt_us").isNotNull) // the last observation holds for 0 time
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_held"),
        sum("dt_us").cast("long").as("held_us"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * dt_us")).as("swc"),
        sum("cents").cast("long").as("sc"))
      .select(col("user_id"), col("n_held"), col("held_us"),
        round(expr("CAST(swc AS DOUBLE) / held_us / 100.0"), 6).as("twa"),
        round(expr("CAST(sc AS DOUBLE) / n_held / 100.0"), 6).as("plain_mean"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_weighted_avg" -> (qTimeWeightedAvg _),
    "q_resample_ffill" -> (qResampleFfill _),
    "q_event_gaps" -> (qEventGaps _),
    "q_sessionize" -> (qSessionize _),
    "q_contribution_cap" -> (qContributionCap _),
    "q_ab_sequential" -> (qAbSequential _),
    "q_pacf" -> (qPacf _),
    "q_linreg_trend" -> (qLinregTrend _),
    "q_cross_corr" -> (qCrossCorr _),
    "q_funnel_latency" -> (qFunnelLatency _),
    "q_forecast_backtest" -> (qForecastBacktest _),
    "q_spearman" -> (qSpearman _),
    "q_theilsen" -> (qTheilSen _),
    "q_gini" -> (qGini _),
    "q_markov_stationary" -> (qMarkovStationary _),
    "q_survival_km" -> (qSurvivalKm _),
    "q_acf" -> (qAcf _),
    "q_cusum" -> (qCusum _),
    "q_mannwhitney" -> (qMannWhitney _),
    "q_seq_trigrams" -> (qSeqTrigrams _),
    "q_hits" -> (qHits _),
    "q_streaks" -> (qStreaks _),
    "q_sliding_distinct" -> (qSlidingDistinct _),
    "q_seasonal_decompose" -> (qSeasonalDecompose _),
    "q_holt_trend" -> (qHoltTrend _),
    "q_ewma_anomaly" -> (qEwmaAnomaly _),
    "q_ks_test" -> (qKsTest _),
    "q_ab_ttest" -> (qAbTtest _),
    "q_outlier_mad" -> (qOutlierMad _),
    "q_cohort_retention" -> (qCohortRetention _),
    "q_event_transitions" -> (qEventTransitions _),
    "q_attribution" -> (qAttribution _),
    "q_event_funnel" -> (qEventFunnel _),
    "q_window_tumbling" -> (qWindowTumbling _),
    "q_window_sliding" -> (qWindowSliding _),
    "q_window_session" -> (qWindowSession _))

  // Spark tumbling windows are epoch-aligned: start = floor(epoch/size)*size.
  private def bucketSql(sizeSec: Long) =
    s"TIMESTAMP '1970-01-01 00:00:00' + to_seconds(CAST(floor(epoch(ts) / $sizeSec) * $sizeSec AS BIGINT))"

  // The Holt double-exponential recurrence as a recursive-CTE chain —
  // shared by the forecaster oracle and its backtest oracle.
  private val holtCteSql: String =
    """daily AS (
      |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, day_idx, n_events,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day_idx) AS rn
      |  FROM daily),
      |e AS (
      |  SELECT event_type, day_idx, n_events, rn,
      |    n_events * 1000000 AS level, CAST(0 AS BIGINT) AS trend
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT s.event_type, s.day_idx, s.n_events, s.rn, s.lnew,
      |    divide(((s.lnew - s.pl) + 9 * s.pb
      |      - (((((s.lnew - s.pl) + 9 * s.pb) % 10) + 10) % 10)), 10)
      |  FROM (
      |    SELECT r.event_type, r.day_idx, r.n_events, r.rn,
      |      e.level AS pl, e.trend AS pb,
      |      divide((2 * r.n_events * 1000000 + 8 * (e.level + e.trend)
      |        - ((((2 * r.n_events * 1000000 + 8 * (e.level + e.trend)) % 10) + 10) % 10)), 10) AS lnew
      |    FROM r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1) s)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_time_weighted_avg" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE user_id % 10 = 0),
        |held AS (
        |  SELECT user_id, cents,
        |    epoch_us(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(ts) AS dt_us
        |  FROM ev),
        |h AS (SELECT * FROM held WHERE dt_us IS NOT NULL)
        |SELECT user_id,
        |  COUNT(*) AS n_held,
        |  CAST(SUM(dt_us) AS BIGINT) AS held_us,
        |  round(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * dt_us) AS DOUBLE)
        |    / CAST(SUM(dt_us) AS BIGINT) / 100.0, 6) AS twa,
        |  round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0, 6) AS plain_mean
        |FROM h GROUP BY user_id""".stripMargin,
    "q_resample_ffill" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE user_id % 10 = 0),
        |hourly AS (
        |  SELECT user_id, hour, COUNT(*) AS n,
        |    round(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS hv
        |  FROM ev GROUP BY user_id, hour),
        |span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM ev GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM span),
        |j AS (
        |  SELECT g.user_id, g.hour,
        |    CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events, h.hv,
        |    COUNT(h.hv) OVER (PARTITION BY g.user_id ORDER BY g.hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffgrp
        |  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour)
        |SELECT user_id, hour, n_events,
        |  MAX(hv) OVER (PARTITION BY user_id, ffgrp) AS v_ffill
        |FROM j""".stripMargin,
    "q_event_gaps" ->
      """WITH dys AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events),
        |l AS (SELECT event_type, day,
        |    LAG(day) OVER (PARTITION BY event_type ORDER BY day) AS prev_day
        |  FROM dys),
        |g AS (SELECT event_type, day,
        |    CASE WHEN prev_day IS NULL THEN 0
        |      ELSE divide(CAST(epoch(CAST(day AS DATE)) AS BIGINT) - CAST(epoch(CAST(prev_day AS DATE)) AS BIGINT), 86400) - 1 END AS gap
        |  FROM l)
        |SELECT event_type, COUNT(*) AS n_days_observed,
        |  MIN(day) AS first_day, MAX(day) AS last_day,
        |  CAST(MAX(gap) AS BIGINT) AS longest_gap,
        |  CAST(SUM(gap) AS BIGINT) AS n_missing,
        |  CAST(divide(CAST(epoch(CAST(MAX(day) AS DATE)) AS BIGINT) - CAST(epoch(CAST(MIN(day) AS DATE)) AS BIGINT), 86400) + 1 AS BIGINT) AS n_days_expected
        |FROM g GROUP BY 1""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |l AS (SELECT user_id, event_id, ts, es,
        |    LAG(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
        |  FROM e),
        |n AS (SELECT *, CASE WHEN prev_es IS NULL OR es - prev_es > 1800
        |    THEN 1 ELSE 0 END AS new_s FROM l),
        |si AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM n)
        |SELECT user_id, session_idx, COUNT(*) AS n_events,
        |  CAST(MIN(es) AS BIGINT) AS start_s, CAST(MAX(es) AS BIGINT) AS end_s,
        |  CAST(MAX(es) - MIN(es) AS BIGINT) AS duration_s
        |FROM si GROUP BY 1, 2""".stripMargin,
    "q_contribution_cap" ->
      """WITH uc AS (
        |  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_raw,
        |    CAST(SUM(least(c, 10)) AS BIGINT) AS n_capped,
        |    COUNT(*) AS n_users,
        |    CAST(SUM(CASE WHEN c > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        |  FROM uc GROUP BY 1)
        |SELECT event_type, n_raw, n_capped, n_users, n_clipped,
        |  round(CAST(n_raw - n_capped AS DOUBLE) / n_raw, 6) AS dropped_frac
        |FROM a""".stripMargin,
    "q_funnel_latency" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS tv FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS tc FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts >= v.tv GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS tp FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.tc GROUP BY 1),
        |lat AS (
        |  SELECT CAST(floor(epoch(tc)) - floor(epoch(tv)) AS BIGINT) AS s_vc,
        |    CAST(floor(epoch(tp)) - floor(epoch(tc)) AS BIGINT) AS s_cp,
        |    CAST(floor(epoch(tp)) - floor(epoch(tv)) AS BIGINT) AS s_vp
        |  FROM v JOIN c USING (user_id) JOIN p USING (user_id))
        |SELECT COUNT(*) AS n_converters,
        |  quantile_cont(s_vc, 0.5) AS p50_view_click_s,
        |  quantile_cont(s_cp, 0.5) AS p50_click_buy_s,
        |  quantile_cont(s_vp, 0.5) AS p50_total_s,
        |  quantile_cont(s_vp, 0.9) AS p90_total_s,
        |  CAST(MAX(s_vp) AS BIGINT) AS max_total_s
        |FROM lat""".stripMargin,
    "q_spearman" ->
      """WITH ev AS (
        |  SELECT event_type, user_id, CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events),
        |act AS (SELECT user_id, COUNT(*) AS activity FROM ev GROUP BY 1),
        |rk AS (
        |  SELECT e.event_type,
        |    CAST(RANK() OVER (PARTITION BY e.event_type ORDER BY e.v) AS BIGINT) * 2
        |      + COUNT(*) OVER (PARTITION BY e.event_type, e.v) - 1 AS u,
        |    CAST(RANK() OVER (PARTITION BY e.event_type ORDER BY a.activity) AS BIGINT) * 2
        |      + COUNT(*) OVER (PARTITION BY e.event_type, a.activity) - 1 AS w
        |  FROM ev e JOIN act a USING (user_id)),
        |g AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(u) AS BIGINT) AS su, CAST(SUM(w) AS BIGINT) AS sw,
        |    CAST(SUM(u * w) AS BIGINT) AS suw,
        |    CAST(SUM(u * u) AS BIGINT) AS suu,
        |    CAST(SUM(w * w) AS BIGINT) AS sww
        |  FROM rk GROUP BY 1)
        |SELECT event_type, n,
        |  CASE WHEN CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su > 0
        |    AND CAST(n AS DOUBLE) * sww - CAST(sw AS DOUBLE) * sw > 0
        |  THEN round((CAST(n AS DOUBLE) * suw - CAST(su AS DOUBLE) * sw)
        |    / sqrt((CAST(n AS DOUBLE) * suu - CAST(su AS DOUBLE) * su)
        |         * (CAST(n AS DOUBLE) * sww - CAST(sw AS DOUBLE) * sw)), 6) END AS rho
        |FROM g""".stripMargin,
    "q_theilsen" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type, a.day_idx, b.day_idx AS d2,
        |    CAST(divide(((b.n - a.n) * 1000000
        |      - ((((b.n - a.n) * 1000000) % (b.day_idx - a.day_idx) + (b.day_idx - a.day_idx)) % (b.day_idx - a.day_idx))), (b.day_idx - a.day_idx)) AS BIGINT) AS slope_ppm
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND b.day_idx > a.day_idx),
        |r AS (
        |  SELECT event_type, slope_ppm,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope_ppm, day_idx, d2) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM p)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(MIN(slope_ppm) AS BIGINT) AS slope_min,
        |  CAST(MAX(slope_ppm) AS BIGINT) AS slope_max,
        |  CAST(MAX(CASE WHEN rn = divide((cnt + 1), 2) THEN slope_ppm END) AS BIGINT) AS slope_med_ppm
        |FROM r GROUP BY 1""".stripMargin,
    "q_gini" ->
      """WITH u AS (
        |  SELECT event_type, user_id, COUNT(*) AS x FROM events GROUP BY 1, 2),
        |h AS (SELECT event_type, x, COUNT(*) AS n_u FROM u GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, x, n_u,
        |    SUM(n_u * x) OVER (PARTITION BY event_type ORDER BY x
        |      ROWS UNBOUNDED PRECEDING) AS s_cum
        |  FROM h)
        |SELECT event_type, CAST(SUM(n_u) AS BIGINT) AS n_users,
        |  CAST(SUM(n_u * x) AS BIGINT) AS total_events,
        |  CAST(SUM(n_u * (2 * s_cum - n_u * x)) AS BIGINT) AS gini_num,
        |  round(1.0 - CAST(SUM(n_u * (2 * s_cum - n_u * x)) AS DOUBLE)
        |    / (CAST(SUM(n_u) AS DOUBLE) * CAST(SUM(n_u * x) AS DOUBLE)), 6) AS gini
        |FROM c GROUP BY 1""".stripMargin,
    "q_markov_stationary" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |t AS (SELECT from_type, to_type, COUNT(*) AS n
        |      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM t GROUP BY 1),
        |p AS (SELECT t.from_type, t.to_type,
        |        CAST(divide(t.n * 1000000, f.n_from) AS BIGINT) AS p_ppm
        |      FROM t JOIN f USING (from_type)),
        |st AS (SELECT from_type AS event_type FROM t
        |       UNION SELECT to_type FROM t),
        |k AS (SELECT COUNT(*) AS k FROM st),
        |a0 AS (SELECT event_type, CAST(divide(1000000, k) AS BIGINT) AS pi
        |       FROM st CROSS JOIN k),
        |a1 AS (SELECT s.event_type,
        |         CAST(divide(COALESCE(SUM(a0.pi * p.p_ppm), 0), 1000000) AS BIGINT) AS pi
        |       FROM st s LEFT JOIN p ON p.to_type = s.event_type
        |       LEFT JOIN a0 ON a0.event_type = p.from_type GROUP BY 1),
        |a2 AS (SELECT s.event_type,
        |         CAST(divide(COALESCE(SUM(a1.pi * p.p_ppm), 0), 1000000) AS BIGINT) AS pi
        |       FROM st s LEFT JOIN p ON p.to_type = s.event_type
        |       LEFT JOIN a1 ON a1.event_type = p.from_type GROUP BY 1),
        |a3 AS (SELECT s.event_type,
        |         CAST(divide(COALESCE(SUM(a2.pi * p.p_ppm), 0), 1000000) AS BIGINT) AS pi
        |       FROM st s LEFT JOIN p ON p.to_type = s.event_type
        |       LEFT JOIN a2 ON a2.event_type = p.from_type GROUP BY 1)
        |SELECT s.event_type, a0.pi AS pi0_ppm, a1.pi AS pi1_ppm,
        |  a2.pi AS pi2_ppm, a3.pi AS pi3_ppm
        |FROM st s JOIN a0 USING (event_type) JOIN a1 USING (event_type)
        |  JOIN a2 USING (event_type) JOIN a3 USING (event_type)""".stripMargin,
    "q_survival_km" ->
      """WITH RECURSIVE du AS (
        |  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx
        |  FROM events),
        |us AS (SELECT user_id, MIN(day_idx) AS first_day, MAX(day_idx) AS last_day
        |       FROM du GROUP BY 1),
        |w AS (SELECT MAX(last_day) AS w_day FROM us),
        |hh AS (SELECT last_day - first_day AS dur, COUNT(*) AS n_total,
        |         CAST(SUM(CASE WHEN last_day < w_day - 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_churn
        |       FROM us CROSS JOIN w GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_total) AS BIGINT) AS n_all FROM hh),
        |r AS (SELECT dur, n_total, n_churn,
        |        ROW_NUMBER() OVER (ORDER BY dur) AS rn FROM hh),
        |e AS (
        |  SELECT r.dur, r.n_total, r.n_churn, r.rn,
        |    CAST(n_all AS BIGINT) AS n_risk,
        |    divide(1000000 * (n_all - r.n_churn), n_all) AS s,
        |    r.n_total AS seen
        |  FROM r CROSS JOIN tot WHERE rn = 1
        |  UNION ALL
        |  SELECT r.dur, r.n_total, r.n_churn, r.rn,
        |    t.n_all - e.seen AS n_risk,
        |    divide(e.s * (t.n_all - e.seen - r.n_churn), (t.n_all - e.seen)) AS s,
        |    e.seen + r.n_total AS seen
        |  FROM r JOIN e ON r.rn = e.rn + 1 CROSS JOIN tot t)
        |SELECT dur, CAST(n_risk AS BIGINT) AS n_risk, n_churn,
        |  CAST(s AS BIGINT) AS surv_ppm
        |FROM e""".stripMargin,
    "q_ab_sequential" ->
      """WITH ev AS (
        |  SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
        |    user_id % 2 = 0 AS arm_a,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |daily AS (
        |  SELECT day_idx,
        |    CAST(SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS na_d,
        |    CAST(SUM(CASE WHEN arm_a THEN cents ELSE 0 END) AS BIGINT) AS sa_d,
        |    CAST(SUM(CASE WHEN arm_a THEN cents * cents ELSE 0 END) AS BIGINT) AS qa_d,
        |    CAST(SUM(CASE WHEN arm_a THEN 0 ELSE 1 END) AS BIGINT) AS nb_d,
        |    CAST(SUM(CASE WHEN arm_a THEN 0 ELSE cents END) AS BIGINT) AS sb_d,
        |    CAST(SUM(CASE WHEN arm_a THEN 0 ELSE cents * cents END) AS BIGINT) AS qb_d
        |  FROM ev GROUP BY 1),
        |cum AS (
        |  SELECT day_idx,
        |    CAST(SUM(na_d) OVER w AS BIGINT) AS na, CAST(SUM(sa_d) OVER w AS BIGINT) AS sa,
        |    CAST(SUM(qa_d) OVER w AS BIGINT) AS qa,
        |    CAST(SUM(nb_d) OVER w AS BIGINT) AS nb, CAST(SUM(sb_d) OVER w AS BIGINT) AS sb,
        |    CAST(SUM(qb_d) OVER w AS BIGINT) AS qb
        |  FROM daily
        |  WINDOW w AS (ORDER BY day_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |zz AS (
        |  SELECT *,
        |    CASE WHEN na > 1 AND nb > 1 THEN
        |      CASE WHEN (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1) / na
        |              + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) / nb > 0
        |      THEN round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
        |        / sqrt((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / na) / (na - 1) / na
        |             + (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) / nb), 6)
        |      END END AS z
        |  FROM cum)
        |SELECT day_idx, na, nb,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |  round(CAST(sa AS DOUBLE) / na / 100.0 - CAST(sb AS DOUBLE) / nb / 100.0, 6)
        |  END AS mean_diff,
        |  z, abs(z) > 2.797 AS signif
        |FROM zz""".stripMargin,
    "q_pacf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type, l.lag_d, a.n AS x, b.n AS y
        |  FROM daily a
        |  CROSS JOIN (SELECT unnest(range(1, 4)) AS lag_d) l
        |  JOIN daily b ON b.event_type = a.event_type
        |    AND b.day_idx = a.day_idx + l.lag_d),
        |g AS (
        |  SELECT event_type, lag_d, COUNT(*) AS np,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1, 2),
        |rr AS (
        |  SELECT event_type, lag_d,
        |    CASE WHEN np * sxx - sx * sx > 0 AND np * syy - sy * sy > 0
        |    THEN CAST(np * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
        |           * CAST(np * syy - sy * sy AS DOUBLE)) END AS r
        |  FROM g),
        |pv AS (
        |  SELECT event_type,
        |    MAX(CASE WHEN lag_d = 1 THEN r END) AS r1,
        |    MAX(CASE WHEN lag_d = 2 THEN r END) AS r2,
        |    MAX(CASE WHEN lag_d = 3 THEN r END) AS r3
        |  FROM rr GROUP BY 1),
        |l2 AS (
        |  SELECT *, CASE WHEN abs(1.0 - r1 * r1) > 1e-12
        |    THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END AS p22
        |  FROM pv),
        |l3 AS (SELECT *, r1 * (1.0 - p22) AS p21 FROM l2)
        |SELECT event_type, round(r1, 6) AS pacf1, round(p22, 6) AS pacf2,
        |  round(CASE WHEN abs(1.0 - p21 * r1 - p22 * r2) > 1e-12
        |    THEN (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2) END, 6) AS pacf3
        |FROM l3""".stripMargin,
    "q_linreg_trend" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, day_idx - MIN(day_idx) OVER (PARTITION BY event_type) AS x,
        |    n AS y
        |  FROM daily),
        |g AS (
        |  SELECT event_type, COUNT(*) AS k,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM c GROUP BY 1)
        |SELECT event_type, CAST(k AS BIGINT) AS n_days,
        |  CASE WHEN k * sxx - sx * sx > 0
        |  THEN round(CAST(k * sxy - sx * sy AS DOUBLE) / (k * sxx - sx * sx), 6) END AS slope,
        |  CASE WHEN k * sxx - sx * sx > 0
        |  THEN round(CAST(sy * sxx - sx * sxy AS DOUBLE) / (k * sxx - sx * sx), 6) END AS intercept,
        |  CASE WHEN k * sxx - sx * sx > 0 AND k * syy - sy * sy > 0
        |  THEN round(CAST(k * sxy - sx * sy AS DOUBLE) * (k * sxy - sx * sy)
        |    / (CAST(k * sxx - sx * sx AS DOUBLE) * (k * syy - sy * sy)), 6) END AS r2
        |FROM g""".stripMargin,
    "q_cross_corr" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag_d,
        |    a.n AS x, b.n AS y
        |  FROM daily a
        |  CROSS JOIN (SELECT unnest(range(0, 6)) AS lag_d) l
        |  JOIN daily b ON a.event_type < b.event_type
        |    AND b.day_idx = a.day_idx + l.lag_d),
        |g AS (
        |  SELECT type_a, type_b, lag_d, COUNT(*) AS n_pairs,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1, 2, 3)
        |SELECT type_a, type_b, lag_d, n_pairs,
        |  CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
        |  THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
        |         * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6) END AS xcorr
        |FROM g""".stripMargin,
    "q_acf" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type, l.lag_d, a.n AS x, b.n AS y
        |  FROM daily a
        |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag_d) l
        |  JOIN daily b ON b.event_type = a.event_type
        |    AND b.day_idx = a.day_idx + l.lag_d),
        |g AS (
        |  SELECT event_type, lag_d, COUNT(*) AS n_pairs,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM p GROUP BY 1, 2)
        |SELECT event_type, lag_d, n_pairs,
        |  CAST(n_pairs * sxy - sx * sy AS BIGINT) AS acf_num,
        |  CASE WHEN n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
        |  THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
        |         * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6) END AS acf
        |FROM g""".stripMargin,
    "q_cusum" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(divide(SUM(n) * 1000000, COUNT(*)) AS BIGINT) AS mu_ppm
        |  FROM daily GROUP BY 1),
        |r AS (
        |  SELECT d.event_type, day_idx, n, mu_ppm,
        |    ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY day_idx) AS rn
        |  FROM daily d JOIN m USING (event_type)),
        |e AS (
        |  SELECT event_type, day_idx, n, mu_ppm, rn,
        |    GREATEST(0, n * 1000000 - mu_ppm) AS sp,
        |    GREATEST(0, mu_ppm - n * 1000000) AS sn
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.event_type, r.day_idx, r.n, r.mu_ppm, r.rn,
        |    GREATEST(0, e.sp + r.n * 1000000 - r.mu_ppm),
        |    GREATEST(0, e.sn + r.mu_ppm - r.n * 1000000)
        |  FROM r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1)
        |SELECT event_type, day_idx, n AS n_events,
        |  CAST(sp AS BIGINT) AS cusum_pos, CAST(sn AS BIGINT) AS cusum_neg,
        |  (sp > 3 * mu_ppm OR sn > 3 * mu_ppm) AS is_alarm
        |FROM e""".stripMargin,
    "q_mannwhitney" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS arm,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events),
        |rk AS (
        |  SELECT event_type, arm,
        |    CAST(RANK() OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS rmin,
        |    COUNT(*) OVER (PARTITION BY event_type, v) AS ties
        |  FROM ev),
        |g AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN arm = 0 THEN rmin * 2 + ties - 1 ELSE 0 END) AS BIGINT) AS r_a_x2
        |  FROM rk GROUP BY 1),
        |u AS (
        |  SELECT *, CAST(r_a_x2 - n_a * (n_a + 1) AS BIGINT) AS u_a_x2
        |  FROM g)
        |SELECT event_type, n_a, n_b, r_a_x2, u_a_x2,
        |  CAST(2 * n_a * n_b - u_a_x2 AS BIGINT) AS u_b_x2,
        |  round(CAST(u_a_x2 AS DOUBLE) / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS auc_ab,
        |  round((CAST(u_a_x2 AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / 2
        |    / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * (n_a + n_b + 1) / 12.0), 6) AS z_stat
        |FROM u""".stripMargin,
    "q_seq_trigrams" ->
      """WITH seq AS (
        |  SELECT event_type AS t1,
        |    LEAD(event_type, 1) OVER w AS t2,
        |    LEAD(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |tri AS (
        |  SELECT t1, t2, t3, COUNT(*) AS n_tri
        |  FROM seq WHERE t3 IS NOT NULL GROUP BY 1, 2, 3),
        |x AS (
        |  SELECT t1, t2, t3, n_tri,
        |    CAST(SUM(n_tri) OVER (PARTITION BY t1, t2) AS BIGINT) AS n_big,
        |    CAST(SUM(n_tri) OVER () AS BIGINT) AS n_total
        |  FROM tri)
        |SELECT t1, t2, t3, n_tri, n_big,
        |  CAST(divide(n_tri * 1000000, n_big) AS BIGINT) AS conf_ppm,
        |  CAST(divide(n_tri * 1000000, n_total) AS BIGINT) AS support_ppm
        |FROM x""".stripMargin,
    "q_hits" ->
      """WITH edges AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |a1 AS (
        |  SELECT event_type, COUNT(*) AS n_users FROM edges GROUP BY 1),
        |h1 AS (
        |  SELECT e.user_id, CAST(SUM(a1.n_users) AS BIGINT) AS h1
        |  FROM edges e JOIN a1 USING (event_type) GROUP BY 1),
        |a2 AS (
        |  SELECT e.event_type, CAST(SUM(h1.h1) AS BIGINT) AS auth2,
        |    CAST(MAX(h1.h1) AS BIGINT) AS max_hub
        |  FROM edges e JOIN h1 USING (user_id) GROUP BY 1)
        |SELECT a1.event_type, a1.n_users, a2.auth2, a2.max_hub,
        |  CAST(divide(auth2 * 1000000, (SUM(auth2) OVER ())) AS BIGINT) AS auth2_ppm
        |FROM a1 JOIN a2 USING (event_type)""".stripMargin,
    "q_streaks" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx
        |  FROM events),
        |r AS (
        |  SELECT user_id, day_idx,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_idx) AS rn
        |  FROM du),
        |st AS (
        |  SELECT user_id, day_idx - rn AS island, COUNT(*) AS len,
        |    MIN(day_idx) AS start_day
        |  FROM r GROUP BY 1, 2),
        |best AS (
        |  SELECT user_id, len,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY len DESC, start_day) AS rk
        |  FROM st)
        |SELECT CAST(len AS BIGINT) AS best_streak, COUNT(*) AS n_users,
        |  CAST(MIN(user_id) AS BIGINT) AS example_user
        |FROM best WHERE rk = 1 GROUP BY 1""".stripMargin,
    "q_sliding_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx
        |  FROM events),
        |days AS (SELECT DISTINCT day_idx FROM du),
        |wau AS (
        |  SELECT d.day_idx, COUNT(DISTINCT u.user_id) AS n_active_7d
        |  FROM days d JOIN du u ON u.day_idx BETWEEN d.day_idx - 6 AND d.day_idx
        |  GROUP BY 1),
        |dau AS (SELECT day_idx, COUNT(*) AS n_active_1d FROM du GROUP BY 1)
        |SELECT wau.day_idx, n_active_7d, n_active_1d
        |FROM wau JOIN dau ON wau.day_idx = dau.day_idx""".stripMargin,
    "q_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, day_idx, n_events,
        |    COUNT(*) OVER w AS n7, SUM(n_events) OVER w AS s7,
        |    day_idx % 7 AS dow
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx
        |    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |t2 AS (
        |  SELECT event_type, day_idx, n_events, dow,
        |    CASE WHEN n7 = 7 THEN CAST(divide(s7 * 1000000, 7) AS BIGINT) END AS trend_scaled
        |  FROM t),
        |t3 AS (
        |  SELECT *, CASE WHEN trend_scaled IS NOT NULL
        |    THEN CAST(divide(n_events * 1000000000000, trend_scaled) AS BIGINT) END AS ratio_scaled
        |  FROM t2),
        |seas AS (
        |  SELECT event_type, dow,
        |    CAST(divide(SUM(ratio_scaled), COUNT(*)) AS BIGINT) AS seas_scaled
        |  FROM t3 WHERE ratio_scaled IS NOT NULL GROUP BY 1, 2)
        |SELECT t3.event_type, day_idx, n_events, t3.dow,
        |  trend_scaled, ratio_scaled, seas_scaled,
        |  ratio_scaled - seas_scaled AS resid_scaled
        |FROM t3 LEFT JOIN seas
        |  ON t3.event_type = seas.event_type AND t3.dow = seas.dow""".stripMargin,
    "q_holt_trend" ->
      s"""WITH RECURSIVE $holtCteSql
         |SELECT event_type, day_idx, n_events, CAST(level AS BIGINT) AS level,
         |  CAST(trend AS BIGINT) AS trend,
         |  CAST(level + trend AS BIGINT) AS forecast_next
         |FROM e""".stripMargin,
    "q_forecast_backtest" ->
      s"""WITH RECURSIVE $holtCteSql,
         |f AS (
         |  SELECT event_type, day_idx, level + trend AS forecast_next,
         |    LEAD(n_events) OVER (PARTITION BY event_type ORDER BY day_idx) AS nxt
         |  FROM e),
         |x AS (
         |  SELECT event_type,
         |    divide(abs(forecast_next - nxt * 1000000), nxt) AS ape_ppm
         |  FROM f WHERE nxt IS NOT NULL)
         |SELECT event_type, COUNT(*) AS n_evals,
         |  CAST(divide(SUM(ape_ppm), COUNT(*)) AS BIGINT) AS mape_ppm,
         |  CAST(MAX(ape_ppm) AS BIGINT) AS max_ape_ppm
         |FROM x GROUP BY 1""".stripMargin,
    "q_ewma_anomaly" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, day_idx, n_events,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day_idx) AS rn
        |  FROM daily),
        |e AS (
        |  SELECT event_type, day_idx, n_events, rn,
        |    CAST(NULL AS BIGINT) AS prev_ewma, n_events * 1000000 AS ewma
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.event_type, r.day_idx, r.n_events, r.rn,
        |    e.ewma, divide((2 * r.n_events * 1000000 + 8 * e.ewma), 10)
        |  FROM r JOIN e ON r.event_type = e.event_type AND r.rn = e.rn + 1)
        |SELECT event_type, day_idx, n_events, prev_ewma, CAST(ewma AS BIGINT) AS ewma,
        |  coalesce(n_events * 2000000 > prev_ewma * 3, FALSE) AS is_spike,
        |  coalesce(n_events * 2000000 < prev_ewma, FALSE) AS is_drop
        |FROM e""".stripMargin,
    "q_ks_test" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS arm,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events),
        |g AS (
        |  SELECT event_type, v,
        |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb
        |  FROM ev GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, v,
        |    SUM(na) OVER (PARTITION BY event_type ORDER BY v) AS ca,
        |    SUM(nb) OVER (PARTITION BY event_type ORDER BY v) AS cb,
        |    SUM(na) OVER (PARTITION BY event_type) AS ta,
        |    SUM(nb) OVER (PARTITION BY event_type) AS tb
        |  FROM g)
        |SELECT event_type, CAST(max(ta) AS BIGINT) AS n_a, CAST(max(tb) AS BIGINT) AS n_b,
        |  round(max(abs(CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)), 6) AS ks_d
        |FROM c GROUP BY 1""".stripMargin,
    "q_ab_ttest" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(user_id % 2 AS INTEGER) AS arm,
        |    CAST(value AS DECIMAL(18,2)) AS v,
        |    CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4)) AS v2
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    SUM(CASE WHEN arm = 0 THEN v END) AS s_a,
        |    SUM(CASE WHEN arm = 1 THEN v END) AS s_b,
        |    SUM(CASE WHEN arm = 0 THEN v2 END) AS q_a,
        |    SUM(CASE WHEN arm = 1 THEN v2 END) AS q_b
        |  FROM ev GROUP BY 1),
        |v AS (
        |  SELECT event_type, n_a, n_b, s_a, s_b,
        |    (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE) / n_a) / (n_a - 1) AS var_a,
        |    (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE) / n_b) / (n_b - 1) AS var_b
        |  FROM g),
        |w AS (SELECT *, var_a / n_a + var_b / n_b AS se2 FROM v)
        |SELECT event_type, n_a, n_b,
        |  round(CAST(s_a AS DOUBLE) / n_a, 6) AS mean_a,
        |  round(CAST(s_b AS DOUBLE) / n_b, 6) AS mean_b,
        |  round(var_a, 6) AS var_a,
        |  round(var_b, 6) AS var_b,
        |  round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) / sqrt(se2), 6) AS t_stat,
        |  round(se2 * se2 / ((var_a / n_a) * (var_a / n_a) / (n_a - 1) + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6) AS welch_df
        |FROM w""".stripMargin,
    "q_outlier_mad" ->
      """WITH ev AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
        |med AS (SELECT event_type, quantile_cont(v, 0.5) AS med FROM ev GROUP BY 1),
        |dev AS (SELECT e.event_type, e.v, m.med FROM ev e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(abs(v - med), 0.5) AS mad
        |        FROM dev GROUP BY 1),
        |z AS (SELECT d.event_type, d.v, d.med, a.mad,
        |        0.6745 * (d.v - d.med) / a.mad AS z
        |      FROM dev d JOIN mad a USING (event_type))
        |SELECT event_type, COUNT(*) AS n,
        |  round(MAX(med), 6) AS median_v,
        |  round(MAX(mad), 6) AS mad_v,
        |  CAST(SUM(CASE WHEN abs(z) > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(MAX(abs(z)), 6) AS max_abs_z
        |FROM z GROUP BY 1""".stripMargin,
    "q_cohort_retention" ->
      s"""WITH cohort AS (
         |  SELECT user_id,
         |    TIMESTAMP '1970-01-01 00:00:00' + to_seconds(CAST(floor(epoch(MIN(ts)) / 604800) * 604800 AS BIGINT)) AS cohort_week
         |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
         |sizes AS (
         |  SELECT cohort_week, COUNT(DISTINCT user_id) AS cohort_size
         |  FROM cohort GROUP BY 1),
         |act AS (
         |  SELECT e.user_id, c.cohort_week,
         |    CAST(divide(CAST((CAST(floor(epoch(e.ts) / 604800) * 604800 AS BIGINT)
         |      - epoch(c.cohort_week)) AS BIGINT), 604800) AS INTEGER) AS offset_weeks
         |  FROM events e JOIN cohort c USING (user_id)),
         |m AS (
         |  SELECT cohort_week, offset_weeks, COUNT(DISTINCT user_id) AS n_active
         |  FROM act WHERE offset_weeks >= 0 GROUP BY 1, 2)
         |SELECT m.cohort_week, m.offset_weeks, m.n_active, s.cohort_size,
         |  round(CAST(m.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
         |FROM m JOIN sizes s USING (cohort_week)""".stripMargin,
    "q_event_transitions" ->
      """WITH p AS (
        |  SELECT event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n_trans
        |  FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (
        |  SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from FROM c GROUP BY 1)
        |SELECT from_type, to_type, n_trans, n_from,
        |  round(CAST(n_trans AS DOUBLE) / n_from, 6) AS p_trans
        |FROM c JOIN ft USING (from_type)""".stripMargin,
    "q_attribution" ->
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, ts AS conv_ts FROM events
        |  WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT event_id AS touch_id, user_id, ts AS touch_ts, event_type FROM events
        |  WHERE event_type IN ('view', 'click')),
        |j AS (
        |  SELECT conv_id, touch_id, touch_ts, event_type
        |  FROM conv JOIN touch USING (user_id)
        |  WHERE touch_ts < conv_ts AND touch_ts >= conv_ts - INTERVAL 24 HOUR),
        |r AS (
        |  SELECT event_type,
        |    COUNT(*) OVER (PARTITION BY conv_id) AS k,
        |    ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY touch_ts, touch_id) AS rn_first,
        |    ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY touch_ts DESC, touch_id DESC) AS rn_last
        |  FROM j),
        |c AS (
        |  SELECT event_type, divide(1000000, k) AS linear_ppm,
        |    CASE WHEN k = 1 THEN 1000000 WHEN k = 2 THEN 500000
        |         WHEN rn_first = 1 THEN 400000 WHEN rn_last = 1 THEN 400000
        |         ELSE divide(200000, (k - 2)) END AS pos_ppm
        |  FROM r)
        |SELECT event_type, COUNT(*) AS n_touches,
        |  CAST(SUM(linear_ppm) AS BIGINT) AS linear_ppm,
        |  round(CAST(CAST(SUM(linear_ppm) AS BIGINT) AS DOUBLE) / 1000000.0, 6) AS linear_credit,
        |  CAST(SUM(pos_ppm) AS BIGINT) AS pos_ppm,
        |  round(CAST(CAST(SUM(pos_ppm) AS BIGINT) AS DOUBLE) / 1000000.0, 6) AS pos_credit
        |FROM c GROUP BY 1""".stripMargin,
    "q_event_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS tv FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, MIN(e.ts) AS tc FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts >= v.tv GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, MIN(e.ts) AS tp FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.tc GROUP BY 1),
        |stages AS (
        |  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        |  UNION ALL SELECT '2_click', COUNT(*) FROM c
        |  UNION ALL SELECT '3_purchase', COUNT(*) FROM p)
        |SELECT stage, n_users,
        |  CASE WHEN LAG(n_users) OVER (ORDER BY stage) IS NULL THEN 1.0
        |       WHEN LAG(n_users) OVER (ORDER BY stage) = 0 THEN 0.0
        |       ELSE round(CAST(n_users AS DOUBLE) / LAG(n_users) OVER (ORDER BY stage), 6)
        |  END AS conversion
        |FROM stages""".stripMargin,
    "q_window_tumbling" ->
      s"""SELECT ${bucketSql(21600)} AS ws,
         |  ${bucketSql(21600)} + INTERVAL 6 HOUR AS we,
         |  event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_window_sliding" ->
      s"""WITH b AS (SELECT event_type, ${bucketSql(21600)} AS bucket FROM events),
         |x AS (SELECT event_type, ws FROM b, LATERAL unnest(list_value(bucket, bucket - INTERVAL 6 HOUR)) AS t(ws))
         |SELECT ws, ws + INTERVAL 12 HOUR AS we, event_type, COUNT(*) AS n
         |FROM x GROUP BY 1, 2, 3""".stripMargin,
    "q_window_session" ->
      """WITH o AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts FROM events),
        |m AS (SELECT user_id, ts,
        |    CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM o),
        |s AS (SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start,
        |  CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
        |  COUNT(*) AS n
        |FROM s GROUP BY user_id, sid""".stripMargin)
}
