package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session, UTC). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // Hive catalog (north star: Spark SQL + HiveContext) — derby
      // metastore kept out of the repo tree
      .config("javax.jdo.option.ConnectionURL",
        "jdbc:derby:;databaseName=/tmp/graft_metastore;create=true")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport())
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
