package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.util.control.NonFatal

/** Typed Catalyst decode of the gateway's msgpack request envelope
  * (G2, `gateway.ts:189`): `binary -> struct<mod, fun, arg, ctx>`.
  *
  * The idiomatic Spark form of the wire decode — the envelope surfaces
  * as a typed struct column the optimizer can prune and push through,
  * instead of the `Map[Any,Any]` a generic decode UDF returns. Stays
  * inside whole-stage codegen via a static call (the same shape Spark's
  * own non-arithmetic expressions generate).
  *
  * Null contract: undecodable bytes, trailing garbage, or a non-map
  * top-level value yield a NULL struct; a well-formed map yields a row
  * whose individual fields are NULL where absent or differently typed.
  */
case class MsgpackEnvelope(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"msgpack_envelope requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = MsgpackEnvelope.schema
  override def nullable: Boolean = true
  override def prettyName: String = "msgpack_envelope"

  override def nullSafeEval(bytes: Any): Any =
    MsgpackEnvelope.decodeRow(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.MsgpackEnvelope.decodeRow($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MsgpackEnvelope {
  val schema: StructType = StructType(Seq(
    StructField("mod", StringType),
    StructField("fun", StringType),
    StructField("arg", LongType),
    StructField("ctx", MapType(StringType, StringType))))

  /** Decode one envelope; null on malformed input (see class doc). */
  def decodeRow(bytes: Array[Byte]): InternalRow = try {
    Msgpack.decode(bytes) match {
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[Any, Any]]
        def str(k: String): UTF8String = mm.get(k) match {
          case Some(s: String) => UTF8String.fromString(s)
          case _ => null
        }
        val arg = mm.get("arg") match {
          case Some(l: Long) => java.lang.Long.valueOf(l)
          case _ => null
        }
        val ctx = mm.get("ctx") match {
          case Some(c: Map[_, _]) if c.forall { case (k, v) =>
              k.isInstanceOf[String] && v.isInstanceOf[String] } =>
            ArrayBasedMapData(
              c.keys.map(k => UTF8String.fromString(k.asInstanceOf[String])).toArray[Any],
              c.values.map(v => UTF8String.fromString(v.asInstanceOf[String])).toArray[Any])
          case _ => null
        }
        InternalRow(str("mod"), str("fun"), arg, ctx)
      case _ => null
    }
  } catch { case NonFatal(_) => null }

  /** Registers `msgpack_envelope(binary) -> struct` (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "msgpack_envelope", exprs => MsgpackEnvelope(exprs.head), "built-in")
}
