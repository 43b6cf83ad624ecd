package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming twin of the batch funnel
  * ([[graft.operators.EventWindows.qEventFunnel]]): the per-user
  * conditional-min cascade view → click → purchase, kept incrementally in
  * keyed state via `transformWithState` and emitted as change-driven
  * snapshots.
  *
  * Out-of-order correctness is the interesting part. The cascade is
  * tv = min(view), tc = min(click ≥ tv), tp = min(purchase ≥ tc) over ALL
  * of a user's events, so a late-arriving EARLIER view can retroactively
  * make an already-seen click eligible. The state therefore buffers
  * candidate timestamps — but only the ones that can still matter: tv
  * only decreases as views arrive, so the click-eligible set only grows
  * downward and its min only decreases; a click above the CURRENT
  * eligible min can never become the min and is pruned (same argument one
  * stage down for purchases). State per user is tv plus those candidate
  * longs — a handful of values, not the event history.
  *
  * Scale shape: one shuffle on user_id into the state store (RocksDB at
  * cluster scale — same provider contract as [[CorrelatorV2]]); emission
  * is change-driven (a snapshot row only when the cascade advances), so
  * the output stream is bounded by funnel PROGRESS, not event volume.
  * The event-time watermark bounds how late data may arrive (the runtime
  * drops rows beyond it), giving the reprocessing horizon a hard edge.
  */
object FunnelStream {

  case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

  /** Cascade snapshot: epoch millis per reached stage, [[Unreached]]
    * (Long.MaxValue) otherwise. The sentinel keeps every column monotone
    * NON-INCREASING across a user's snapshots, so `min` over them IS the
    * final cascade — the property consumers aggregate on. */
  case class FunnelReach(user_id: Long, tv: Long, tc: Long, tp: Long)

  // private[graft], not private: a private nested class compiles to
  // private bytecode, which the generated encoder projections cannot
  // touch — state (de)serialization then silently falls back to
  // interpreted eval on every state access (observed: 33 codegen-error
  // warnings per spec run). Qualified access keeps the bytecode public.
  private[graft] case class FunnelState(tv: Long, clicks: Seq[Long], purchases: Seq[Long])

  val Unreached: Long = Long.MaxValue

  class FunnelProcessor extends StatefulProcessor[Long, FunnelEvent, FunnelReach] {

    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    /** The batch cascade evaluated over the buffered candidates. */
    private def cascade(s: FunnelState): (Long, Long, Long) = {
      val tv = s.tv
      val tc = if (tv == Unreached) Unreached
               else s.clicks.filter(_ >= tv).minOption.getOrElse(Unreached)
      val tp = if (tc == Unreached) Unreached
               else s.purchases.filter(_ >= tc).minOption.getOrElse(Unreached)
      (tv, tc, tp)
    }

    override def handleInputRows(uid: Long, rows: Iterator[FunnelEvent],
        timers: TimerValues): Iterator[FunnelReach] = {
      val prev = if (st.exists()) st.get() else FunnelState(Unreached, Nil, Nil)
      val before = cascade(prev)
      var tv = prev.tv
      val clicks = Seq.newBuilder[Long]; clicks ++= prev.clicks
      val purchases = Seq.newBuilder[Long]; purchases ++= prev.purchases
      rows.foreach { e =>
        val ms = e.ts.getTime
        e.event_type match {
          case "view"     => if (ms < tv) tv = ms
          case "click"    => clicks += ms
          case "purchase" => purchases += ms
          case _          => ()
        }
      }
      val merged = FunnelState(tv, clicks.result(), purchases.result())
      val now = cascade(merged)
      val (_, tc, tp) = now
      // Lossless prune, two rules. Above: the current eligible min stays
      // in the buffer and stays eligible as tv/tc decrease, so any
      // candidate above it can never become the min. Below the
      // WATERMARK: a candidate c < wm that is not eligible now (c < tv)
      // can only become eligible through a view <= c — which the runtime
      // would drop as late — so it is provably dead; without this rule a
      // user with clicks but never a qualifying view accumulates state
      // linear in history (the 100 TB failure mode). The eligible min
      // itself is always retained (it IS the cascade answer).
      val wm = timers.getCurrentWatermarkInMs()
      st.update(FunnelState(tv,
        merged.clicks.filter(c => (tc == Unreached || c <= tc) && (c == tc || c >= math.min(tv, wm))).distinct,
        merged.purchases.filter(p => (tp == Unreached || p <= tp) && (p == tp || p >= math.min(tc, wm))).distinct))
      if (now != before) Iterator.single(FunnelReach(uid, now._1, tc, tp))
      else Iterator.empty
    }
  }

  /** events(user_id, event_type, ts) → change-driven [[FunnelReach]]
    * snapshots; rows later than `delay` behind the watermark are dropped
    * by the runtime (the same contract as the other stream ops). */
  def funnelReach(events: Dataset[FunnelEvent], delay: String = "1 hour"): Dataset[FunnelReach] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.EventTime(), OutputMode.Append())
  }
}
