package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Production registration path for everything graft adds to a session:
  * `spark.sql.extensions=graft.GraftExtensions` (or programmatically
  * `builder.withExtensions(new GraftExtensions)`) wires in
  *
  *  - the native as-of join planner strategy ([[plans.AsOfStrategy]]) —
  *    so [[plans.AsOfJoin]] logical nodes plan without any per-query
  *    `register` call,
  *  - the [[plans.DeriveInFilters]] optimizer rule (OR-of-conjunctions
  *    → pushable IN conjuncts), and
  *  - the six codegen expressions (cosine_sim, rolling_hash,
  *    minhash_perms, hyperplane_codes, cdc_boundaries,
  *    msgpack_envelope) as session functions usable from SQL text.
  *
  * The per-object `register(spark)` helpers remain for ad-hoc sessions
  * (each query builder still calls them defensively — idempotent), but a
  * deployment sets the one config and gets the whole surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => plans.AsOfStrategy)
    e.injectOptimizerRule(_ => plans.DeriveInFilters)
    (GraftExtensions.functionBuilders ++ functions.DuckDbDialect.aliases)
      .foreach { case (name, builder) =>
        e.injectFunction((FunctionIdentifier(name),
          new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
      }
    e.injectTableFunction((FunctionIdentifier("unnest"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "unnest"),
      functions.DuckDbDialect.unnestTable))
  }
}

object GraftExtensions {
  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> name,
          "expectedNum" -> n.toString, "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** A literal-int argument (bands/bits of hyperplane_codes): validated
    * as foldable + integral at plan time so a misuse surfaces as an
    * AnalysisException, not an NPE/ClassCastException from `eval()`. */
  private def litInt(name: String, arg: String, e: Expression): Int = {
    val ok = e.foldable && (e.eval() match {
      case _: java.lang.Integer | _: java.lang.Long | _: java.lang.Short | _: java.lang.Byte => true
      case _ => false
    })
    if (!ok) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map("funcName" -> name, "paramName" -> arg, "paramType" -> "INT"))
    e.eval().asInstanceOf[Number].intValue()
  }

  val functionBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => { arity("cosine_sim", exprs, 2)
      functions.CosineSimilarity(exprs(0), exprs(1)) }),
    "rolling_hash" -> (exprs => { arity("rolling_hash", exprs, 1)
      functions.RollingHash(exprs.head) }),
    "minhash_perms" -> (exprs => { arity("minhash_perms", exprs, 1)
      functions.MinHashPerms(exprs.head) }),
    "cdc_boundaries" -> (exprs => { arity("cdc_boundaries", exprs, 1)
      functions.CdcBoundaries(exprs.head) }),
    "hyperplane_codes" -> (exprs => { arity("hyperplane_codes", exprs, 3)
      functions.HyperplaneCodes(exprs.head,
        litInt("hyperplane_codes", "bands", exprs(1)),
        litInt("hyperplane_codes", "bits", exprs(2))) }),
    "msgpack_envelope" -> (exprs => { arity("msgpack_envelope", exprs, 1)
      functions.MsgpackEnvelope(exprs.head) }),
    "shingles3" -> (exprs => { arity("shingles3", exprs, 1)
      functions.ShinglesN(exprs.head, 3) }),
    "shingles_n" -> (exprs => { arity("shingles_n", exprs, 2)
      functions.ShinglesN(exprs.head, litInt("shingles_n", "n", exprs(1))) }),
    "bigram_hits" -> (exprs => { arity("bigram_hits", exprs, 2)
      functions.BigramHits.fromExprs(exprs) }),
    "winnow_fps" -> (exprs => { arity("winnow_fps", exprs, 1)
      functions.WinnowFps(exprs.head) }))
}
