package graft
import org.apache.spark.sql.SparkSession
/** Throwaway dev main: time named queries (noop sink) at a sf dir. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val names = args.drop(1)
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(n: String): Unit =
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    run("q1_pricing_summary") // warmup
    names.foreach { n =>
      val t0 = System.nanoTime()
      run(n)
      println(f"TIMED $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
