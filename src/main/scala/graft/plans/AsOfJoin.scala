package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Cast, Expression, JoinedRow, SortOrder, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, GenerateUnsafeProjection, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

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
  * blowup. Key/time/tie may be any integral, date, or timestamp type;
  * [[AsOfStrategy]] widens narrow types to LONG (order- and
  * equality-preserving), so the exec reads every value as a Java long
  * and participates in whole-stage codegen.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression)
  extends BinaryNode {
  // loud type check at construction: the exec reads key/time/tie as
  // Java longs after the strategy's widening, so only types with an
  // order-preserving embedding into LONG are accepted
  require(
    Seq(leftKey, rightKey, leftTime, rightTime, rightTie)
      .forall(e => AsOfStrategy.widenable(e.dataType)),
    s"AsOfJoin supports LONG/TIMESTAMP and widenable INT/SHORT/BYTE/DATE key, " +
      s"time, and tie columns; got " +
      Seq(leftKey, leftTime, rightKey, rightTime, rightTie).map(_.dataType.simpleString).mkString(", "))
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** DATE (internally Int days since epoch) widened to LONG days — Spark's
  * Cast forbids date→numeric, but the as-of merge only needs an order-
  * and equality-preserving LONG embedding, which day count is. */
case class DateDays(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "date_days"
  override def nullSafeEval(v: Any): Any = v.asInstanceOf[Int].toLong
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(long)($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression, rightTie: Expression)
  extends BinaryExecNode with CodegenSupport {

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

  // ---- whole-stage codegen -------------------------------------------
  // Same shape Spark's SortMergeJoinExec uses: the node is a codegen
  // root over TWO raw input iterators (inputs[0]=left, inputs[1]=right);
  // the generated loop evaluates key/cutoff inline, maintains the
  // per-key right buffer in fields, binary-searches a long[] of times,
  // and feeds unpacked column variables straight into the parent's
  // consume — no JoinedRow, no per-row UnsafeProjection.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // buffered right rows are reused across output rows of one key group
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];")
    val heldRight = ctx.addMutableState("InternalRow", "asofHeldRight")
    val bufRows = ctx.addMutableState("java.util.ArrayList<InternalRow>", "asofBufRows",
      v => s"$v = new java.util.ArrayList<InternalRow>();")
    val bufTimes = ctx.addMutableState("long[]", "asofBufTimes",
      v => s"$v = new long[16];")
    val bufLen = ctx.addMutableState("int", "asofBufLen")
    val bufKey = ctx.addMutableState("long", "asofBufKey")
    val bufValid = ctx.addMutableState("boolean", "asofBufValid")

    // -- loadKey(k): advance the right iterator to key group k, buffer
    // its rows (time-sorted by child ordering; null times excluded)
    val rrow = ctx.freshName("rrow")
    ctx.INPUT_ROW = rrow
    ctx.currentVars = null
    val rkEv = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rtEv = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val loadKey = ctx.addNewFunction("asofLoadKey",
      s"""
         |private void asofLoadKey(long k) {
         |  $bufRows.clear();
         |  $bufLen = 0;
         |  while ($heldRight != null || $rightInput.hasNext()) {
         |    InternalRow $rrow = ($heldRight != null) ? $heldRight : (InternalRow) $rightInput.next();
         |    $heldRight = null;
         |    ${rkEv.code}
         |    if (${rkEv.isNull} || ${rkEv.value} < k) continue;  // below k / null key: skip
         |    if (${rkEv.value} > k) { $heldRight = $rrow; break; } // next group: hold back
         |    ${rtEv.code}
         |    if (${rtEv.isNull}) continue;                        // null time never matches
         |    if ($bufLen == $bufTimes.length) {
         |      long[] grown = new long[$bufLen * 2];
         |      System.arraycopy($bufTimes, 0, grown, 0, $bufLen);
         |      $bufTimes = grown;
         |    }
         |    $bufTimes[$bufLen++] = ${rtEv.value};
         |    $bufRows.add($rrow.copy());
         |  }
         |  $bufKey = k;
         |  $bufValid = true;
         |}
       """.stripMargin)

    // -- main loop: one output row per left row
    val leftRow = ctx.freshName("asofLeftRow")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val lkEv = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val ltEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    // right-side columns guarded on the matched row (null when no match)
    val matched = ctx.freshName("asofMatched")
    ctx.INPUT_ROW = matched
    ctx.currentVars = null
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val ev = BoundReference(i, a.dataType, a.nullable).genCode(ctx)
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val guarded =
        code"""
           |boolean $isNull = true;
           |$jt $value = ${CodeGenerator.defaultValue(a.dataType)};
           |if ($matched != null) {
           |  ${ev.code}
           |  $isNull = ${ev.isNull};
           |  $value = ${ev.value};
           |}
         """.stripMargin
      ExprCode(guarded, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }
    val ans = ctx.freshName("asofAns")
    val lo = ctx.freshName("asofLo")
    val hi = ctx.freshName("asofHi")
    val mid = ctx.freshName("asofMid")
    val k = ctx.freshName("asofK")
    val cutoff = ctx.freshName("asofCutoff")
    // evaluateVariables emits each var's code once and blanks it so the
    // parent's consume cannot re-evaluate
    val leftVarsCode = evaluateVariables(leftVars)
    val rightVarsCode = evaluateVariables(rightVars)
    s"""
       |while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${lkEv.code}
       |  ${ltEv.code}
       |  int $ans = -1;
       |  if (!(${lkEv.isNull} || ${ltEv.isNull})) {
       |    long $k = ${lkEv.value};
       |    if (!$bufValid || $k != $bufKey) {
       |      $loadKey($k);
       |    }
       |    long $cutoff = ${ltEv.value};
       |    int $lo = 0;
       |    int $hi = $bufLen - 1;
       |    while ($lo <= $hi) {
       |      int $mid = ($lo + $hi) >>> 1;
       |      if ($bufTimes[$mid] <= $cutoff) { $ans = $mid; $lo = $mid + 1; } else { $hi = $mid - 1; }
       |    }
       |  }
       |  InternalRow $matched = ($ans >= 0) ? (InternalRow) $bufRows.get($ans) : null;
       |  $leftVarsCode
       |  $rightVarsCode
       |  ${consume(ctx, leftVars ++ rightVars).trim}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  /** Types accepted by [[AsOfJoin]]: LONG/TIMESTAMP natively, plus the
    * narrow integral types and DATE which [[widen]] embeds into LONG. */
  def widenable(t: DataType): Boolean = t match {
    case LongType | TimestampType | TimestampNTZType => true
    case IntegerType | ShortType | ByteType | DateType => true
    case _ => false
  }

  /** Order- and equality-preserving widening to a LONG-evaluating
    * expression (timestamps already evaluate to Long internally). */
  private def widen(e: Expression): Expression = e.dataType match {
    case IntegerType | ShortType | ByteType => Cast(e, LongType)
    case DateType => DateDays(e)
    case _ => e
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lt, rk, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r),
        widen(lk), widen(lt), widen(rk), widen(rt), widen(tie)) :: Nil
    case _ => Nil
  }

  /** Idempotent registration on the session's experimental strategies. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
}
