package graft

import java.sql.Timestamp

import graft.streaming.{Correlator, CorrelatorV2}
import graft.streaming.Correlator.GwEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState correlator — same decision table as CorrelatorSpec
  * but on the Spark 4 StatefulProcessor API with the RocksDB state store
  * (required by transformWithState). Separate session: the provider conf
  * must be set before the streaming query starts. */
class CorrelatorV2Spec extends AnyFunSuite {

  // Reuse the JVM-wide session; the state-store provider is a session
  // conf that only needs to be set before the streaming query STARTS
  // (a builder conf would be silently dropped if another suite created
  // the session first — getOrCreate returns the existing one).
  lazy val spark: SparkSession = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def ts(sec: Int): Timestamp = new Timestamp(1700000000000L + sec * 1000L)

  test("transformWithState correlator: matched, unmatched, and timer-expired paths") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[GwEvent]
    val q = CorrelatorV2.correlate(in.toDS(), timeoutMs = 30000L, watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName("corrv2").outputMode("append").start()
    try {
      in.addData(
        GwEvent("a", "request", ts(0)), GwEvent("b", "request", ts(1)),
        GwEvent("a", "response", ts(2)), GwEvent("orphan", "response", ts(3)))
      q.processAllAvailable()
      in.addData(GwEvent("b", "response", ts(5)))
      q.processAllAvailable()
      // advance watermark far enough to expire nothing-matched "lost"
      in.addData(GwEvent("lost", "request", ts(10)))
      q.processAllAvailable()
      in.addData(GwEvent("flush", "request", ts(120)))
      q.processAllAvailable()
      val rows = spark.table("corrv2").as[Correlator.Correlated].collect()
        .map(c => c.sn -> (c.outcome, c.latency_ms)).toMap
      assert(rows("a") == ("matched", 2000L))
      assert(rows("b") == ("matched", 4000L))
      assert(rows("orphan") == ("unmatched_response", -1L))
      assert(rows.get("lost").map(_._1).contains("timeout"))
      assert(!rows.contains("flush"))
    } finally q.stop()
  }
}
