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
  *  - the five codegen expressions (cosine_sim, rolling_hash,
  *    minhash_perms, hyperplane_codes, cdc_boundaries) as session
  *    functions usable from SQL text.
  *
  * The per-object `register(spark)` helpers remain for ad-hoc sessions
  * (each query builder still calls them defensively — idempotent), but a
  * deployment sets the one config and gets the whole surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => plans.AsOfStrategy)
    e.injectOptimizerRule(_ => plans.DeriveInFilters)
    GraftExtensions.functionBuilders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
  }
}

object GraftExtensions {
  val functionBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => functions.CosineSimilarity(exprs(0), exprs(1))),
    "rolling_hash" -> (exprs => functions.RollingHash(exprs.head)),
    "minhash_perms" -> (exprs => functions.MinHashPerms(exprs.head)),
    "cdc_boundaries" -> (exprs => functions.CdcBoundaries(exprs.head)),
    "hyperplane_codes" -> (exprs => functions.HyperplaneCodes(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].intValue())))
}
