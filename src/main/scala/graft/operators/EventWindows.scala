package graft.operators

import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_tumbling" -> (qWindowTumbling _),
    "q_window_sliding" -> (qWindowSliding _),
    "q_window_session" -> (qWindowSession _))

  // Spark tumbling windows are epoch-aligned: start = floor(epoch/size)*size.
  private def bucketSql(sizeSec: Long) =
    s"TIMESTAMP '1970-01-01 00:00:00' + to_seconds(CAST(floor(epoch(ts) / $sizeSec) * $sizeSec AS BIGINT))"

  val oracle: Map[String, String] = Map(
    "q_window_tumbling" ->
      s"""SELECT ${bucketSql(21600)} AS ws,
         |  ${bucketSql(21600)} + INTERVAL 6 HOUR AS we,
         |  event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "q_window_sliding" ->
      s"""WITH b AS (SELECT event_type, ${bucketSql(21600)} AS bucket FROM events),
         |x AS (SELECT event_type, ws FROM b, unnest([bucket, bucket - INTERVAL 6 HOUR]) AS t(ws))
         |SELECT ws, ws + INTERVAL 12 HOUR AS we, event_type, COUNT(*) AS n
         |FROM x GROUP BY 1, 2, 3""".stripMargin,
    "q_window_session" ->
      """WITH o AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts FROM events),
        |m AS (SELECT user_id, ts,
        |    CASE WHEN pts IS NULL OR ts - pts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM o),
        |s AS (SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n
        |FROM s GROUP BY user_id, sid""".stripMargin)
}
