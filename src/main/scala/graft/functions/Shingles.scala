package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word 3-gram shingles from a words array in one fused pass:
  * `shingles3(words)[i] = words[i] ' ' words[i+1] ' ' words[i+2]`, and
  * the empty array for documents under 3 words (matching Spark's
  * descending `sequence(1, 0)` guard and DuckDB's `range(1, len-1)`).
  *
  * Replaces the higher-order-function formulation
  * (`transform(sequence(1, size-2), i -> concat_ws(' ', ...))`), which
  * Catalyst evaluates interpreted (HOFs are CodegenFallback) with one
  * lambda invocation and three element_at lookups per shingle. Values
  * are byte-identical — only the evaluation strategy changes — so every
  * DuckDB oracle over the shingle relation is untouched. The shingle
  * build fronts six dedup/curation queries; fusing it keeps the whole
  * scan→shingle→hash→signature pipeline inside whole-stage codegen.
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def nullSafeEval(v: Any): Any = {
    val ws = v.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < 3) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - 2)
      var i = 0
      while (i < n - 2) {
        out(i) = UTF8String.concatWs(Shingles3.SEP,
          ws.getUTF8String(i), ws.getUTF8String(i + 1), ws.getUTF8String(i + 2))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sep = ctx.addReferenceObj("shSep", Shingles3.SEP,
        classOf[UTF8String].getName)
      val arr = ctx.freshName("arr"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val u = classOf[UTF8String].getName
      s"""
         |int $n = $c.numElements();
         |$u[] $arr = new $u[$n < 3 ? 0 : $n - 2];
         |for (int $i = 0; $i < $arr.length; $i++) {
         |  $arr[$i] = $u.concatWs($sep,
         |    $c.getUTF8String($i), $c.getUTF8String($i + 1), $c.getUTF8String($i + 2));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles3 {
  private[functions] val SEP = UTF8String.fromString(" ")

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles3", exprs => Shingles3(exprs.head), "built-in")
}
