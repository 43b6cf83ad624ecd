package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of the batch CUSUM control chart
  * ([[graft.operators.EventWindows.qCusum]]): per event type, daily
  * volumes accumulate in event time and each day's two-sided CUSUM
  * update (S⁺/S⁻ against a supplied reference mean) is emitted exactly
  * once, as soon as the watermark passes the day boundary.
  *
  * The reference mean μ is an INPUT here, not derived from the stream —
  * a control chart monitors against an expectation fixed before the
  * data arrives (in batch, μ comes from the full window; a deployment
  * computes it offline and ships it with the monitor). With μ taken
  * from the same population the batch query folds, the outputs are
  * IDENTICAL — CusumStreamSpec proves row equality against qCusum on
  * the real corpus fed through a MemoryStream out of order.
  *
  * Out-of-order correctness: a day's count is only folded into the
  * recurrence once the watermark passes the END of that day — any
  * still-arriving event for it would be behind the watermark and is
  * dropped by the runtime (the same reprocessing horizon as the other
  * stream ops). Days with zero events don't exist in the batch
  * grouping either, so the fold skips them identically. State per type
  * is the open per-day count map plus the O(1) (S⁺, S⁻) cursor; an
  * event-time timer at the earliest open day boundary flushes quiet
  * types as the watermark advances.
  *
  * Scale shape: ONE shuffle on event_type into the state store
  * (RocksDB provider at cluster scale); per-day partial counts could
  * be pre-aggregated map-side upstream if types are hot — the state
  * update itself is O(open days), bounded by the watermark delay.
  */
object CusumStream {

  case class Ev(event_type: String, ts: Timestamp, event_id: Long)

  case class DayStat(event_type: String, day_idx: Long, n_events: Long,
      cusum_pos: Long, cusum_neg: Long, is_alarm: Boolean)

  private[graft] case class PendDay(day: Long, n: Long)
  private[graft] case class CusumState(sp: Long, sn: Long,
      pending: Seq[PendDay], timerTs: Long)

  private val DayMs = 86400000L

  class CusumProcessor(muPpmByType: Map[String, Long])
      extends StatefulProcessor[String, Ev, DayStat] {

    @transient private var st: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    /** Fold every pending day whose END the watermark has passed, in
      * day order, through the CUSUM recurrence. */
    private def finalizeBelow(tp: String, merged: CusumState, wm: Long): Iterator[DayStat] = {
      val mu = muPpmByType.getOrElse(tp, 0L)
      val (done, open) = merged.pending.partition(p => (p.day + 1) * DayMs <= wm)
      val out = Seq.newBuilder[DayStat]
      var sp = merged.sp; var sn = merged.sn
      done.sortBy(_.day).foreach { p =>
        sp = math.max(0L, sp + p.n * 1000000L - mu)
        sn = math.max(0L, sn + mu - p.n * 1000000L)
        out += DayStat(tp, p.day, p.n, sp, sn, sp > 3 * mu || sn > 3 * mu)
      }
      val newTimer = if (open.nonEmpty) (open.map(_.day).min + 1) * DayMs else 0L
      if (newTimer != merged.timerTs) {
        if (merged.timerTs > wm) getHandle.deleteTimer(merged.timerTs)
        if (newTimer > 0L) getHandle.registerTimer(newTimer)
      }
      st.update(CusumState(sp, sn, open, newTimer))
      out.result().iterator
    }

    override def handleInputRows(tp: String, rows: Iterator[Ev],
        timers: TimerValues): Iterator[DayStat] = {
      val prev = if (st.exists()) st.get() else CusumState(0L, 0L, Nil, 0L)
      val add = rows.foldLeft(Map.empty[Long, Long]) { (m, e) =>
        val d = math.floorDiv(e.ts.getTime, DayMs)
        m.updated(d, m.getOrElse(d, 0L) + 1L)
      }
      val mergedPending = (prev.pending.map(p => p.day -> p.n).toMap.toSeq ++ add.toSeq)
        .groupBy(_._1).map { case (d, xs) => PendDay(d, xs.map(_._2).sum) }.toSeq
      finalizeBelow(tp, prev.copy(pending = mergedPending), timers.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(tp: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[DayStat] = {
      if (!st.exists()) return Iterator.empty
      finalizeBelow(tp, st.get(), timers.getCurrentWatermarkInMs())
    }
  }

  /** events → append stream of day-finalized CUSUM updates against the
    * supplied per-type reference means (ppm fixed point). */
  def dayCusum(events: Dataset[Ev], muPpmByType: Map[String, Long],
      delay: String = "1 hour"): Dataset[DayStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(muPpmByType), TimeMode.EventTime(), OutputMode.Append())
  }
}
