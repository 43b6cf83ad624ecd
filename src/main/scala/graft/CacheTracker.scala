package graft

import org.apache.spark.sql.Dataset
import scala.collection.mutable.ArrayBuffer

/** Registry for persisted intermediate relations whose lifetime outlives
  * the builder function that created them.
  *
  * Query builders (e.g. LSH dedup, the curation pipeline) persist a
  * signature relation that feeds several branches of the RETURNED lazy
  * plan — they cannot unpersist before returning or the cache would be
  * dropped before first use. In a shared session (Verify/Bench run all
  * queries in one JVM) those blocks would otherwise accumulate per
  * invocation. Builders register such relations here; the harness calls
  * [[releaseAll]] once the query's result has been materialized.
  */
object CacheTracker {
  private val tracked = ArrayBuffer.empty[Dataset[_]]
  private val broadcasts = ArrayBuffer.empty[org.apache.spark.broadcast.Broadcast[_]]

  /** Register a persisted dataset for later release; returns it unchanged. */
  def track[T <: Dataset[_]](ds: T): T = synchronized { tracked += ds; ds }

  /** Register a SparkContext broadcast (e.g. a Bloom filter a UDF in the
    * returned plan captures) for destruction after materialization — the
    * same lifetime problem [[track]] solves for persisted relations. */
  def trackBroadcast[T <: org.apache.spark.broadcast.Broadcast[_]](b: T): T =
    synchronized { broadcasts += b; b }

  /** Unpersist every tracked dataset (blocking), destroy every tracked
    * broadcast, and clear the registry. Each release is individually
    * guarded: this runs from the harness's `finally` AFTER a query
    * already failed (dead executors, torn RPC), and one entry's
    * unpersist error must neither abort the whole Verify/Bench run nor
    * leave the registry holding the failing entry forever. */
  def releaseAll(): Unit = synchronized {
    def guarded(what: String)(f: => Unit): Unit =
      try f catch {
        case t: Throwable => System.err.println(s"[release] $what failed: $t")
      }
    tracked.foreach(d => guarded("unpersist")(d.unpersist(blocking = true)))
    tracked.clear()
    broadcasts.foreach(b => guarded("broadcast destroy")(b.destroy()))
    broadcasts.clear()
  }

  /** The harness's per-query release point, shared by Verify and Bench
    * so the pairing can never drift between them: builder-persisted
    * intermediates are released AND any MV rewrite rules the query
    * installed are unscoped — without the latter, every query after a
    * q_mv_* in a shared session stays a rewrite candidate and a
    * derivable aggregate would silently verify/bench as an MV scan. */
  def releaseQueryScope(spark: org.apache.spark.sql.SparkSession): Unit = {
    releaseAll()
    graft.plans.MvRewrite.uninstallAll(spark)
  }
}
