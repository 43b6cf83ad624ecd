package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.catalyst.expressions.Ascending
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF JOIN as a first-class operator (SURVEY.md §4.3 escalation path):
  * for each left row, the single latest right row with the same key and
  * `rightTime <= leftTime`, ties on time broken by the largest
  * `rightTie`. Left rows with no match keep nulls (left-outer
  * semantics) — exactly the semantics of the composed
  * window/row_number formulation in `Advanced.qAsofJoin`, but executed
  * as one merge pass instead of join + explode + window.
  *
  * Physical strategy: both sides hash-cluster on the key (the planner
  * inserts the exchanges/sorts via requiredChildDistribution/Ordering),
  * the right side arrives sorted (key, time, tie), and a per-key binary
  * search resolves each left row — O(|L| log |R_k|) with no row
  * amplification, versus the composed form's |L|·|matches| intermediate
  * blowup. v1 restriction: key/tie must be integral and time a
  * timestamp/long (internally all read as Long).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression)
  extends BinaryNode {
  // v1 restriction asserted loudly at construction: internals read
  // key/time as Long, so only long- and timestamp-typed (both evaluate
  // to Long) columns are accepted. Int/date keys would need widening
  // casts by the caller.
  {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val ok: org.apache.spark.sql.types.DataType => Boolean =
      t => t == LongType || t == TimestampType || t == TimestampNTZType
    require(Seq(leftKey, rightKey, leftTime, rightTime, rightTie).forall(e => ok(e.dataType)),
      s"AsOfJoin v1 supports only LONG/TIMESTAMP key, time, and tie columns; got " +
        Seq(leftKey, leftTime, rightKey, rightTime, rightTie).map(_.dataType.simpleString).mkString(", "))
  }
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightSchema = right.output
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val toUnsafe = GenerateUnsafeProjection.generate(
        outAttrs.map(a => BindReferences.bindReference(a: Expression, outAttrs)))
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        rightSchema.length)
      val rBuf = rIter.buffered

      // per-key buffer of right rows (sorted by time, tie — child ordering)
      var bufKey = Long.MinValue
      var bufValid = false
      var times: Array[Long] = Array.emptyLongArray
      var rows: Array[InternalRow] = Array.empty
      val rowsTmp = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      val timesTmp = scala.collection.mutable.ArrayBuffer.empty[Long]

      def loadKey(k: Long): Unit = {
        // skip right groups below k — null-keyed right rows sort first
        // (Ascending = NULLS FIRST) and can never equi-match, so they
        // are consumed here too
        while (rBuf.hasNext && {
          val rv = rKey.eval(rBuf.head)
          rv == null || rv.asInstanceOf[Long] < k
        }) rBuf.next()
        rowsTmp.clear(); timesTmp.clear()
        while (rBuf.hasNext && {
          val rv = rKey.eval(rBuf.head)
          rv != null && rv.asInstanceOf[Long] == k
        }) {
          val r = rBuf.next().copy()
          // a null right time can never satisfy time <= cutoff (SQL
          // comparison semantics) — exclude it from the buffer
          val tv = rTime.eval(r)
          if (tv != null) { rowsTmp += r; timesTmp += tv.asInstanceOf[Long] }
        }
        times = timesTmp.toArray
        rows = rowsTmp.toArray
        bufKey = k
        bufValid = true
      }

      lIter.map { lRow =>
        val kv = lKey.eval(lRow)
        val cv = lTime.eval(lRow)
        if (kv == null || cv == null) {
          // null key or cutoff matches nothing (`=`/`<=` are null-
          // rejecting) → left-outer null right side, same as the
          // composed join+window form
          toUnsafe(joiner(lRow, nullRight))
        } else {
        val k = kv.asInstanceOf[Long]
        if (!bufValid || k != bufKey) {
          // left is sorted by key, so forward-only loading is complete
          if (bufValid && k < bufKey) throw new IllegalStateException("left not sorted by key")
          loadKey(k)
        }
        val cutoff = cv.asInstanceOf[Long]
        // binary search: last index with time <= cutoff (ties already
        // ordered by tie ascending → last one is the max tie)
        var lo = 0; var hi = times.length - 1; var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (times(mid) <= cutoff) { ans = mid; lo = mid + 1 } else hi = mid - 1
        }
        val joined =
          if (ans >= 0) joiner(lRow, rows(ans)) else joiner(lRow, nullRight)
        toUnsafe(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie) :: Nil
    case _ => Nil
  }

  /** Idempotent registration on the session's experimental strategies. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
}
