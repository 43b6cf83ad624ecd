package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import Correlator.{Correlated, GwEvent}

/** The sn correlator on Spark 4's `transformWithState` StatefulProcessor
  * API (SURVEY.md §7.3 — the Spark-4-native form of G12/G13). Same
  * semantics as [[Correlator.correlate]]: matched / timeout (30 s
  * rcvtimeo, gateway.ts:56) / unmatched-response, but with explicit
  * `ValueState` + event-time timers, which at scale run on the RocksDB
  * state store (set `spark.sql.streaming.stateStore.providerClass` to
  * RocksDBStateStoreProvider; required by this operator).
  */
object CorrelatorV2 {

  class CorrelatorProcessor(timeoutMs: Long)
      extends StatefulProcessor[String, GwEvent, Correlated] {

    @transient private var inFlight: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      inFlight = getHandle.getValueState[Long]("inFlight", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(sn: String, rows: Iterator[GwEvent],
        timers: TimerValues): Iterator[Correlated] = {
      // event-TIME order, requests first only at equal timestamps — see
      // Correlator.correlate: kind-major ordering mis-pairs a response
      // with a LATER reused-sn request arriving in the same micro-batch
      val evs = rows.toSeq.sortBy(e => (e.ts.getTime, if (e.kind == "request") 0 else 1))
      val out = Seq.newBuilder[Correlated]
      evs.foreach { e =>
        if (e.kind == "request") {
          // a re-registered sn replaces the previous request: drop the
          // old timer so it can't later fire against the new request
          if (inFlight.exists()) getHandle.deleteTimer(inFlight.get() + timeoutMs)
          inFlight.update(e.ts.getTime)
          getHandle.registerTimer(e.ts.getTime + timeoutMs)
        } else if (inFlight.exists()) {
          out += Correlated(sn, "matched", e.ts.getTime - inFlight.get())
          // delete the pending timer (derivable: request ts + timeout) —
          // without this a later reuse of the same sn would be clobbered
          // by the stale timer firing (spurious timeout + cleared state)
          getHandle.deleteTimer(inFlight.get() + timeoutMs)
          inFlight.clear()
        } else {
          out += Correlated(sn, "unmatched_response", -1L)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(sn: String, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Correlated] =
      // defense in depth: only time out if this timer belongs to the
      // CURRENT in-flight request (a stale timer for a superseded or
      // matched request must not clear live state)
      if (inFlight.exists() && info.getExpiryTimeInMs() == inFlight.get() + timeoutMs) {
        inFlight.clear()
        Iterator.single(Correlated(sn, "timeout", -1L))
      } else Iterator.empty // timer for an already-matched/superseded request
  }

  def correlate(events: Dataset[GwEvent], timeoutMs: Long = 30000L,
      watermarkDelay: String = "10 seconds"): Dataset[Correlated] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.sn)
      .transformWithState(new CorrelatorProcessor(timeoutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
