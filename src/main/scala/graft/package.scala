/** graft — a Spark-native analytics engine with the query and
  * data-processing capabilities of the reference gateway
  * (`/root/reference/src/gateway.ts`, surveyed in SURVEY.md), plus a full
  * relational surface and LLM-data-pipeline operators.
  */
package object graft {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.DecimalType

  /** Exact money sum, oracle-parity safe.
    *
    * Summing doubles is order-dependent, and Spark and the DuckDB oracle
    * need not accumulate partitions in the same order — a raw
    * `sum(double)` can hash-mismatch in the last ulp. Casting each value to
    * DECIMAL(18,2) first makes the sum exact (inputs are 2-decimal money
    * values), and the final exact-decimal → double conversion is
    * deterministic in both engines. Oracle-side equivalent:
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact decimal average → double. Oracle:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)
}
