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
  * `get(i)` is O(1) while in memory. Once spilled, a cached FORWARD
  * cursor serves the as-of probe pattern in one sequential spill read
  * per key group: within a group the probed index is non-decreasing
  * (left rows are time-sorted, so the as-of answer index never moves
  * backwards), and the cursor only restarts — replaying the spill from
  * the start, the quadratic worst case — on a backward probe, which the
  * exec never issues. Mutations (`add`/`clear`) invalidate the cursor:
  * the underlying array rejects iterators created before a
  * modification.
  */
class GraftSpillableRowBuffer(inMemoryRows: Int, spillRows: Int, spillSize: Long) {
  private val arr =
    new ExternalAppendOnlyUnsafeRowArray(inMemoryRows, spillSize, spillRows, spillSize)
  // forward cursor: `cursor.next()` would return the row at `nextIdx`;
  // lastIdx/lastRow serve the frequent repeated-index probe (many left
  // rows sharing one as-of match) without touching the cursor
  private var cursor: Iterator[UnsafeRow] = _
  private var nextIdx: Int = 0
  private var lastIdx: Int = -1
  private var lastRow: UnsafeRow = _

  /** Append a row (copied internally — caller may reuse the instance). */
  def add(row: UnsafeRow): Unit = { arr.add(row); cursor = null; lastIdx = -1 }
  def clear(): Unit = { arr.clear(); cursor = null; lastIdx = -1 }
  def length: Int = arr.length
  /** Bytes spilled to disk so far (0 while fully in memory). */
  def spilledBytes: Long = arr.spillSize

  /** Row at index `i`, or null past the end. The returned row is valid
    * only until the next call with a DIFFERENT index (spill readers
    * reuse their row buffer; the holder is untouched between same-index
    * calls). */
  def get(i: Int): UnsafeRow = {
    if (cursor != null && i == lastIdx) return lastRow
    if (cursor == null || i < nextIdx) {
      cursor = arr.generateIterator(i)
      nextIdx = i
    } else while (nextIdx < i && cursor.hasNext) { cursor.next(); nextIdx += 1 }
    lastIdx = i
    lastRow = if (cursor.hasNext) { nextIdx += 1; cursor.next() } else null
    lastRow
  }
}
