package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming window/dedup operators, written against plain DataFrames so
  * the SAME code path serves batch tables and streaming sources — Spark's
  * `window`/`session_window` aggregations are identical in both modes.
  * Batch mode is what the DuckDB oracle checks; StreamingSpec drives the
  * same builders through MemoryStream with watermarks.
  */
object StreamOps {

  /** Tumbling event-time windows (epoch-aligned) per group key. */
  def tumblingCounts(events: DataFrame, size: String, keys: Column*): DataFrame =
    events.groupBy((window(col("ts"), size) +: keys): _*)
      .agg(count(lit(1)).as("n"), graft.dsum(col("value")).as("sum_value"))
      .select((Seq(col("window.start").as("ws"), col("window.end").as("we")) ++
        keys :+ col("n") :+ col("sum_value")): _*)

  /** Sliding event-time windows (size ≥ slide ⇒ each row in size/slide
    * windows). */
  def slidingCounts(events: DataFrame, size: String, slide: String, keys: Column*): DataFrame =
    events.groupBy((window(col("ts"), size, slide) +: keys): _*)
      .agg(count(lit(1)).as("n"))
      .select((Seq(col("window.start").as("ws"), col("window.end").as("we")) ++
        keys :+ col("n")): _*)

  /** Session windows with an inactivity gap: window.start = first event,
    * window.end = last event + gap. */
  def sessionCounts(events: DataFrame, gap: String, keys: Column*): DataFrame =
    events.groupBy((session_window(col("ts"), gap) +: keys): _*)
      .agg(count(lit(1)).as("n"))
      .select((keys :+ col("session_window.start").as("session_start") :+
        col("session_window.end").as("session_end") :+ col("n")): _*)

  /** Streaming rate limiter (G6 intended semantics): tumbling 1 s count
    * per key, rows over the cap flagged denied. */
  def rateLimitWindowed(events: DataFrame, limit: Int, keys: Column*): DataFrame =
    events.groupBy((window(col("ts"), "1 second") +: keys): _*)
      .agg(count(lit(1)).as("calls"))
      .select((Seq(col("window.start").as("ws")) ++ keys :+ col("calls") :+
        (col("calls") > limit).as("denied")): _*)

  /** Watermarked streaming dedup on a key set — exactly-once delivery of
    * the first arrival within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, delay: String, cols: String*): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(cols.head, cols.tail: _*)
}
