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
    * broadcast, and clear the registry. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = true))
    tracked.clear()
    broadcasts.foreach(_.destroy())
    broadcasts.clear()
  }
}
