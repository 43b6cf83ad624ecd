package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway A/B timing main for q_dedup_ngram_jaccard variants. */
object DevAB {
  def variantB(s: SparkSession, d: String): DataFrame = {
    val shinglesExpr =
      "transform(sequence(1, greatest(size(words) - 2, 1)), i -> concat_ws(' ', slice(words, i, 3)))"
    val sets = graft.CacheTracker.track(operators.Dedup.corpusPub(s, d)
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(shinglesExpr))
      .select(col("doc_id"), array_distinct(col("shingles")).as("sset"))
      .filter(size(col("sset")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val grams = sets.select(col("doc_id"),
        explode(col("sset")).as("gram"), size(col("sset")).as("sz"))
    // df via window on gram: one shuffle, no join-back
    val ranked = grams
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("gram"))))
    val prefix = ranked
      .filter(col("rn") <= col("sz") - expr("(sz + 1) div 2") + 1)
      .select(col("doc_id"), col("gram"), col("sz"))
    val cand = prefix.as("x")
      .join(prefix.select(col("doc_id").as("b_id"), col("gram"), col("sz").as("bsz")).as("y"),
        col("x.gram") === col("y.gram") && col("x.doc_id") < col("b_id")
          && col("bsz") <= col("x.sz") * 2 && col("x.sz") <= col("bsz") * 2)
      .select(col("x.doc_id").as("a_id"), col("b_id")).distinct()
    val sa = sets.select(col("doc_id").as("a_id"), col("sset").as("sa"))
    val sb = sets.select(col("doc_id").as("b_id"), col("sset").as("sb"))
    cand.join(sa, "a_id").join(sb, "b_id")
      .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("n_union", size(col("sa")) + size(col("sb")) - col("n_inter"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .filter(col("jaccard") >= 0.5)
      .select("a_id", "b_id", "n_inter", "n_union", "jaccard")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String, f: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f.count()
        println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        CacheTracker.releaseAll()
        System.gc()
      }
    }
    time("A(current)", operators.Dedup.qDedupNgramJaccard(spark, d))
    time("B(window-df+lenfilter)", variantB(spark, d))
    spark.stop()
  }
}
