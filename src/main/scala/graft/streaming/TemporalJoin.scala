package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ListState}

/** Streaming temporal enrich join — the streaming face of the native
  * batch as-of join ([[graft.plans.AsOfJoin]]): each event is enriched
  * with the LATEST version of its key's dimension row at-or-before the
  * event's time. Spark has no native temporal/versioned-dim join (Flink
  * does); this builds one from `transformWithState`:
  *
  *  - both inputs arrive as one keyed stream of [[TemporalJoin.In]]
  *    rows (`kind` = "dim" carries a new dimension version, "event"
  *    asks for enrichment) — the union trick that gives a single
  *    StatefulProcessor a consistent view of both sides;
  *  - per-key state is the dimension's version history (a ListState of
  *    (version-time, value)); v1 keeps the full history — a production
  *    variant would prune versions older than the watermark minus the
  *    maximum allowed event lateness;
  *  - within a micro-batch, rows are processed in event-time order with
  *    dims before events at equal timestamps, so a batch that carries
  *    both a version and an event at t sees the new version. ACROSS
  *    batches the match is processing-order (a dim that ARRIVES after
  *    an event it should have enriched is not retroactively applied) —
  *    the semantics of Flink's processing-time temporal join, and the
  *    honest contract for an append-only output. An event with no
  *    version at-or-before its time emits a null value (left-outer).
  */
object TemporalJoin {

  case class In(key: String, kind: String, ts: Timestamp, value: String)
  case class Enriched(key: String, ts: Timestamp, value: String, matched: Boolean)

  class TemporalProcessor extends StatefulProcessor[String, In, Enriched] {

    @transient private var versions: ListState[(Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      versions = getHandle.getListState[(Long, String)]("versions",
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING), TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[In],
        timers: TimerValues): Iterator[Enriched] = {
      val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, if (r.kind == "dim") 0 else 1))
      val out = Seq.newBuilder[Enriched]
      sorted.foreach { r =>
        if (r.kind == "dim") {
          versions.appendValue((r.ts.getTime, r.value))
        } else {
          val t = r.ts.getTime
          // latest version at-or-before t; the history is small and
          // append-ordered by arrival, which within this contract is
          // also version-time order
          var best: (Long, String) = null
          val it = versions.get()
          while (it.hasNext) {
            val v = it.next()
            if (v._1 <= t && (best == null || v._1 >= best._1)) best = v
          }
          out += (if (best == null) Enriched(key, r.ts, null, matched = false)
                  else Enriched(key, r.ts, best._2, matched = true))
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Enriched] = Iterator.empty
  }

  /** Enrich the `event`-kind rows of a unioned dim/event stream with the
    * latest at-or-before dim version per key. Requires the RocksDB state
    * store (transformWithState). */
  def enrich(input: Dataset[In], watermarkDelay: String = "10 seconds"): Dataset[Enriched] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .transformWithState(new TemporalProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
