package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.expressions.UnsafeRow

/** Access shim for [[ExternalAppendOnlyUnsafeRowArray]] — the spillable
  * row buffer SortMergeJoinExec keeps its matched-group rows in. The
  * class is `private[sql]`, so graft's AsOfJoinExec (package
  * `graft.plans`) reaches it through this thin public wrapper that lives
  * in Spark's execution package. No Spark internals are modified.
  *
  * Semantics (inherited): rows are copied on `add`; up to
  * `inMemoryRows` are held in an on-heap array, beyond that the buffer
  * moves to an `UnsafeExternalSorter` that force-spills to disk at
  * `spillRows`/`spillSize` — exactly the shape that keeps one skewed
  * key group (millions of right rows for one key) from OOMing the task.
  *
  * `get(i)` is O(1) while in memory; once spilled it re-reads the spill
  * file from the start (the same trade SortMergeJoin makes when it
  * replays its buffered matches) — the spill path pays CPU to stay
  * alive, the common path stays array-fast.
  */
class GraftSpillableRowBuffer(inMemoryRows: Int, spillRows: Int, spillSize: Long) {
  private val arr =
    new ExternalAppendOnlyUnsafeRowArray(inMemoryRows, spillSize, spillRows, spillSize)

  /** Append a row (copied internally — caller may reuse the instance). */
  def add(row: UnsafeRow): Unit = arr.add(row)
  def clear(): Unit = arr.clear()
  def length: Int = arr.length
  /** Bytes spilled to disk so far (0 while fully in memory). */
  def spilledBytes: Long = arr.spillSize

  /** Row at index `i`, or null past the end. The returned row is valid
    * only until the next call (spill readers reuse their row buffer). */
  def get(i: Int): UnsafeRow = {
    val it = arr.generateIterator(i)
    if (it.hasNext) it.next() else null
  }
}
