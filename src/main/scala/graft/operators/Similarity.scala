package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `embeddings` (64-dim float vectors):
  * brute-force cosine top-k (the exactness baseline) and an LSH-bucketed
  * approximate variant (the 100 TB scale path).
  *
  * Numeric parity with the oracle: vectors are cast float→double FIRST,
  * the dot product folds left-to-right in both engines, and ordering uses
  * round(cos, 6) with a vec_id tie-break so a last-ulp disagreement can't
  * reorder neighbors.
  *
  * Scale design: the query set is small and broadcast — the candidate
  * side streams map-side (no shuffle of the big table). Top-k per query is
  * a window over (query, candidate-score) partitions. The LSH variant
  * buckets candidates by deterministic hyperplane sign bits so each query
  * only scans ~1/2^bits of the data, with multi-probe (Hamming-1) for
  * recall.
  */
object Similarity {

  /** cosine via the codegen CosineSimilarity expression (same
    * left-to-right fold order as the oracle's list_sum formulation —
    * see graft.functions.CosineSimilarity). */
  private val cosExpr = "round(cosine_sim(qe, ce), 6)"

  /** Brute-force cosine top-5 per query (every 20th vector is a query). */
  def qSimTopK(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val queries = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("qe"))
    val cands = e.select(col("vec_id").as("c_id"), col("emb").as("ce"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))
    cands.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("cos_r", expr(cosExpr))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cos_r").as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component (LCG over the
    * (plane, dim) index — integer-exact in any engine). */
  private def planeExpr(k: Int): String =
    s"aggregate(zip_with(ce, sequence(0, 63), (x, i) -> x * ((CAST((CAST(1103515245 AS BIGINT) * ($k * 131 + i) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0) - 0.5)), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"

  /** 4-bit hyperplane LSH bucket for a (double-cast) embedding column
    * named `ce`. */
  private val bucketExpr: String =
    (0 until 4).map(k => s"IF(${planeExpr(k)} >= 0, ${1 << k}, 0)").mkString(" + ")

  /** ANN via hyperplane LSH: bucket candidates once, probe the query's
    * bucket plus all Hamming-1 neighbors, cosine-rank within the probed
    * set. Rows-only (sign bits near zero are not oracle-stable);
    * SimilaritySpec checks recall vs [[qSimTopK]]. */
  def qSimAnnLsh(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
      .withColumn("bucket", expr(bucketExpr))
    val cands = e.select(col("vec_id").as("c_id"), col("ce"), col("bucket"))
    val queries = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("ce").as("qe"), col("bucket").as("qb"))
      .withColumn("probe", explode(expr("array(qb, qb ^ 1, qb ^ 2, qb ^ 4, qb ^ 8)")))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))
    cands.join(broadcast(queries), col("probe") === col("bucket") && col("q_id") =!= col("c_id"))
      .withColumn("cos_r", expr(cosExpr))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cos_r").as("cosine"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ 0.95 among LSH-cobucketed
    * pairs — the embedding analogue of MinHash-LSH dedup. Rows-only for
    * the same sign-bit reason. */
  def qSimNearDupPairs(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    // corpus embeddings are random (no natural cosine>=0.95 pairs), so
    // inject near copies (vec_id%10==0, +1_000_000, first 4 dims nudged
    // by 1e-3) — the hit path is real at every scale factor, mirroring
    // the derived text-dedup corpus
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
    val near = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(ce, (x, i) -> IF(i < 4, x + 0.001d, x))").as("ce"))
    val e = base.unionByName(near)
      .withColumn("bucket", expr(bucketExpr))
    val a = e.select(col("vec_id").as("a_id"), col("ce").as("qe"), col("bucket"))
    val b = e.select(col("vec_id").as("b_id"), col("ce"), col("bucket"))
    a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .withColumn("cosine", expr(cosExpr))
      .filter(col("cosine") >= 0.95)
      .select("a_id", "b_id", "cosine")
  }


  /** IVF (inverted-file) ANN — the other classic scale path besides
    * hyperplane LSH: a k-means coarse quantizer partitions the corpus
    * into `k` cells; a query scans only its `nprobe` nearest cells.
    *
    * The quantizer trains with deterministic seeds (the embeddings of
    * the k lowest vec_ids) and a fixed number of Lloyd iterations, all
    * as DataFrame ops: assignment is a broadcast cross-join argmin,
    * centroid update is an explode-by-dimension average (the shuffle is
    * on (cluster, dim) — 64·k cells, trivially uniform). At 100 TB the
    * train step runs on a sample; assignment stays a map-side broadcast
    * pass. Rows-only (iterative float means are not oracle-stable);
    * SimilaritySpec checks recall vs brute force.
    */
  def qSimIvf(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val k = 8
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
    // -- train: deterministic init + 2 Lloyd iterations. Each round's
    // centroids are cached (8 tiny rows) — without this every broadcast
    // re-derives the full lineage and the train cost grows per iteration.
    var centroids = e.orderBy("vec_id").limit(k)
      .select((row_number().over(Window.orderBy("vec_id")) - 1).as("cid"),
        col("ce").as("centroid"))
      .cache()
    for (_ <- 1 to 2) {
      val assigned = e.crossJoin(broadcast(centroids))
        .withColumn("sim", expr("cosine_sim(ce, centroid)"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(desc("sim"), col("cid"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("ce"))
      val next = assigned
        .select(col("cid"), posexplode(col("ce")).as(Seq("dim", "x")))
        .groupBy("cid", "dim").agg(avg(col("x")).as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), p -> p.m)").as("centroid"))
        .cache()
      next.count() // materialize before the old generation is dropped
      centroids.unpersist()
      centroids = next
    }
    // -- index: assign every vector to its cell
    val cells = e.crossJoin(broadcast(centroids))
      .withColumn("sim", expr("cosine_sim(ce, centroid)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("sim"), col("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("c_id"), col("cid"), col("ce"))
    // -- search: queries probe their nprobe=2 nearest cells
    val probes = e.filter(col("vec_id") % 20 === 0)
      .crossJoin(broadcast(centroids))
      .withColumn("sim", expr("cosine_sim(ce, centroid)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("sim"), col("cid"))))
      .filter(col("rn") <= 2)
      .select(col("vec_id").as("q_id"), col("ce").as("qe"), col("cid"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))
    cells.join(broadcast(probes), Seq("cid")).filter(col("q_id") =!= col("c_id"))
      .withColumn("cos_r", expr(cosExpr))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cos_r").as("cosine"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_topk" -> (qSimTopK _),
    "q_sim_ann_lsh" -> (qSimAnnLsh _),
    "q_sim_ivf" -> (qSimIvf _),
    "q_sim_neardup_pairs" -> (qSimNearDupPairs _))

  val oracle: Map[String, String] = Map(
    "q_sim_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe FROM e WHERE vec_id % 20 = 0),
        |c AS (SELECT vec_id AS c_id, emb AS ce FROM e),
        |scored AS (
        |  SELECT q_id, c_id,
        |    round(
        |      list_sum(list_transform(range(1, 65), i -> qe[i] * ce[i])) /
        |      (sqrt(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i]))) *
        |       sqrt(list_sum(list_transform(range(1, 65), i -> ce[i] * ce[i])))), 6) AS cos_r
        |  FROM q JOIN c ON q_id <> c_id),
        |ranked AS (
        |  SELECT q_id, c_id, cos_r,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, rank, c_id AS neighbor_id, cos_r AS cosine
        |FROM ranked WHERE rank <= 5""".stripMargin)
}
