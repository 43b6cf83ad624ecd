package graft.operators

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for the 100 TB design point.
  *
  * Two-phase salted aggregation: when one group key carries a large share
  * of the rows (a hot token, a viral document), a single hash-aggregate
  * leaves one reducer with most of the data. Salting splits each key into
  * `salt` sub-keys for the partial aggregate, then combines the partials
  * — both shuffles are uniform. The result is IDENTICAL to a direct
  * groupBy (the combine is associative), which is exactly what the oracle
  * checks.
  *
  * (AQE's skew-join splitting handles the join-side analogue at runtime;
  * this is the aggregation-side pattern, useful when the skew is known.)
  */
object Scale {

  /** Two-phase count+sum aggregation salted on `spark_partition_id`-free
    * deterministic salt (hash of a second column), identical results to a
    * direct groupBy. */
  def saltedCountSum(df: DataFrame, key: Column, saltSrc: Column, value: Column,
      salt: Int = 16): DataFrame =
    df.select(key.as("k"), pmod(hash(saltSrc), lit(salt)).as("_salt"),
        value.cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
      .groupBy(col("k"), col("_salt"))                   // phase 1: uniform
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("k"))                                 // phase 2: tiny
      .agg(sum(col("pc")).cast("long").as("n"), sum(col("ps")).cast("double").as("total"))

  /** Salted aggregation over events per event_type (event_type has only 5
    * values — maximal skew for a 32-way cluster without salting). */
  def qSaltedAgg(s: SparkSession, d: String): DataFrame =
    saltedCountSum(Tables.events(s, d), col("event_type"), col("event_id"), col("value"))
      .withColumnRenamed("k", "event_type")

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_agg" -> (qSaltedAgg _))

  // The oracle is the UNSALTED aggregate — proving the two-phase plan
  // computes the same answer.
  val oracle: Map[String, String] = Map(
    "q_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type""".stripMargin)
}
