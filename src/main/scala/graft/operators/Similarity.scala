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

  /** Hard-negative mining for contrastive/embedding training (the
    * in-batch-negatives upgrade every retrieval-model pipeline runs —
    * e.g. DPR/SimCSE style): for each anchor (every 25th vector), the
    * top-5 most-cosine-similar vectors whose LABEL differs — maximally
    * confusing negatives, far more informative than random ones. Label
    * inequality also excludes the anchor itself.
    *
    * Scale shape: the anchor set is a sampled broadcast side (the
    * qSimTopK pattern), scoring is map-side over one candidate scan,
    * and rank ≤ 5 rides WindowGroupLimit so each task ships only its
    * local top-5 per anchor. At 100 TB the brute-force scan swaps for
    * the IVF/LSH candidate generation in this module with the same
    * ranking tail. */
  def qHardNegatives(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"), col("label"))
    val anchors = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("label").as("q_label"))
    val cands = e.select(col("vec_id").as("c_id"), col("emb").as("ce"), col("label").as("neg_label"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))
    cands.join(broadcast(anchors), col("q_label") =!= col("neg_label"))
      .withColumn("cos_r", expr(cosExpr))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("q_label"), col("rank"), col("c_id"),
        col("neg_label"), col("cos_r").as("cosine"))
  }

  /** INCREMENTAL top-k similarity maintenance — the index-refresh
    * pattern (cf. the incremental top-k similarity literature, e.g.
    * EDBT'20): when a NEW batch of vectors arrives (vec_id % 10 == 0),
    * each query's fresh top-5 is the top-5 of (stored top-5 over the
    * history ∪ scores against the batch only) — correct by rank
    * monotonicity (any global top-5 member is either a history top-5
    * member or in the batch), so the refresh never rescans the indexed
    * history beyond its at-rest top-k relation. The oracle is the
    * FULL from-scratch top-5 over everything — hash equality IS the
    * incremental-correctness proof (the q_incr_agg contract, for ANN).
    * `from_batch` marks which neighbors the new data contributed.
    *
    * Scale shape: the merge input is |queries|·5 stored rows plus one
    * map-side-scored pass over the BATCH only (broadcast queries,
    * WindowGroupLimit top-5) — refresh cost ∝ batch size, not corpus
    * size. */
  def qSimTopkIncremental(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val queries = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("qe"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))
    def scored(cands: org.apache.spark.sql.DataFrame) =
      cands.join(broadcast(queries), col("q_id") =!= col("c_id"))
        .withColumn("cos_r", expr(cosExpr))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("c_id"), col("cos_r"))
    // the at-rest index state: stored top-5 over the already-indexed half
    val stored = scored(e.filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id").as("c_id"), col("emb").as("ce")))
    // refresh: score the NEW batch only, merge, re-rank the ≤10 per query
    val batchScores = scored(e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("c_id"), col("emb").as("ce")))
    stored.unionByName(batchScores)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"),
        col("cos_r").as("cosine"), (col("c_id") % 10 === 0).as("from_batch"))
  }

  /** Centroid (simplified) silhouette score per label — the clustering
    * / embedding-space quality audit (Rousseeuw 1987, the centroid
    * variant every large-scale eval uses since pairwise silhouette is
    * O(n²)): for each vector, a = distance to its OWN label centroid,
    * b = distance to the nearest OTHER centroid, s = (b − a)/max(a, b);
    * per-label mean s and the count of separated (s > 0) vectors. High
    * mean ⇒ labels form tight, separated clusters in embedding space.
    *
    * Determinism: coordinates integer-scale at 10⁷ (the q_emb_colstats
    * contract); each point-centroid distance² is the exact
    * DECIMAL(38,0) sum Σ(n·x_i − Σx_i)² divided once by n² (one
    * identical float expression), and the per-label MEAN averages the
    * 6-dp-scaled integer silhouettes — order-insensitive everywhere, no
    * float accumulation across rows.
    *
    * Scale shape: one (label, dim) aggregate builds the centroid sums
    * (|labels|·64 rows, broadcast back); scoring fans each point's dims
    * out by the constant label count and reduces per (vec, label) —
    * map-side combined, no all-pairs, no collect. Long arithmetic in
    * n·x holds to n ≈ 10¹¹ per label; swap the product to DECIMAL
    * beyond. */
  def qSilhouette(s: SparkSession, d: String): DataFrame = {
    val pts = graft.CacheTracker.track(
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .withColumn("sv", expr("CAST(round(CAST(v AS DOUBLE) * 10000000) AS BIGINT)"))
        .select("vec_id", "label", "dim", "sv")
        .persist())
    val cent = pts.groupBy(col("label").as("c"), col("dim"))
      .agg(sum("sv").cast("long").as("csum"), count(lit(1)).as("nc"))
    val dist = pts.join(broadcast(cent), "dim")
      .withColumn("t", expr("nc * sv - csum"))
      .groupBy("vec_id", "label", "c", "nc")
      .agg(sum(expr("CAST(t AS DECIMAL(38,0)) * t")).as("d2s"))
      .withColumn("dist2", expr("CAST(d2s AS DOUBLE) / nc / nc"))
    val sil = dist.groupBy("vec_id", "label")
      .agg(min(when(col("c") === col("label"), col("dist2"))).as("a2"),
        min(when(col("c") =!= col("label"), col("dist2"))).as("b2"))
      .withColumn("sil", expr(
        "CASE WHEN greatest(a2, b2) = 0 THEN 0.0 ELSE round((sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)), 6) END"))
    sil.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("CAST(round(sil * 1000000) AS BIGINT)")).cast("long").as("ssil"),
        sum(when(col("sil") > 0, 1L).otherwise(0L)).as("n_separated"))
      .select(col("label"), col("n_vecs"),
        round(col("ssil").cast("double") / col("n_vecs") / lit(1000000.0), 6).as("mean_sil"),
        col("n_separated"))
  }

  /** Max-inner-product top-5 via the norm-augmentation reduction
    * (Bachrach et al. 2014 / Neyshabur & Srebro 2015): append one
    * component s(x) = √(M² − |x|²) to every candidate (M = the max
    * candidate norm, one tiny agg) and a 0 to every query — every
    * augmented candidate then has norm exactly M, so COSINE order on
    * the augmented space IS inner-product order on the original space,
    * and any cosine index (the hyperplane-LSH / IVF machinery in this
    * module) serves MIPS unchanged. Recommendation-style retrieval
    * (user·item) is MIPS, not cosine — this is the bridge. The engine
    * literally runs the augmented-cosine path (codegen cosine_sim on
    * the 65-dim arrays); the oracle replicates the identical folds and
    * the output ALSO carries the raw inner product, exhibiting the
    * identity. Ranking ties break on the 6-dp-rounded augmented cosine
    * then c_id — deterministic in both engines. */
  def qSimMips(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    // codegen dot product (identical fold order to the HOF form — see
    // functions.DotProductD); the oracle keeps the list_transform fold
    val dotSelf = "dot_d(emb, emb)"
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val m2 = e.agg(max(expr(dotSelf)).as("m2"))
    val cands = e.crossJoin(broadcast(m2))
      .select(col("vec_id").as("c_id"), col("emb").as("cemb"),
        expr(s"concat(emb, array(sqrt(m2 - $dotSelf)))").as("ce"))
    val queries = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("qemb"),
        expr("concat(emb, array(CAST(0 AS DOUBLE)))").as("qe"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_aug"), col("c_id"))
    cands.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("cos_aug", expr("round(cosine_sim(qe, ce), 6)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .withColumn("ip", expr("round(dot_d(qemb, cemb), 6)"))
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("ip"))
  }

  /** SQ8 scalar quantization search (the faiss ScalarQuantizer family —
    * the third compression point next to PQ (q_sim_pq) and raw floats
    * (q_sim_topk)): every dimension is affinely mapped to a signed 8-bit
    * code around the per-dim midpoint, c_i = floor((v_i − mid_i)·255 /
    * (max_i − min_i) + 0.5) ∈ [−128, 128], and candidates are ranked by
    * the INTEGER code dot product — 4 bytes/dim → 1 byte/dim at rest,
    * and the scoring loop is integer multiply-adds (SIMD-friendly on
    * real hardware, order-insensitive here, which is what makes the
    * ranking hash-stable cross-engine).
    *
    * Train→broadcast-literal: the per-dim min/max "training" is ONE
    * 64-row aggregate collected and re-embedded as array literals (the
    * same pattern as the IVF centroids) — at 100 TB the stats come from
    * a sample scan and the quantize + score passes are map-side against
    * the broadcast arrays; the exact cosine is computed only for the
    * k·|queries| reported rows. Mid-centering matters: codes of
    * unsigned [0,255] would make every dot product dominated by the
    * constant offset and destroy the ranking; the spec measures
    * recall@5 vs the float baseline. */
  /** The SQ8 train→encode block shared by [[qSimSq8]] and [[qNdcgEval]]
    * (q_ann_recall_matrix composes the former): per-dim min/max stats
    * collected once and re-embedded as broadcast literals, mid-centered
    * 8-bit codes as one map-side expression. A CONSTANT dimension
    * (mx = mn — e.g. zero-padded real-world embeddings) codes to 0 in
    * both engines instead of dividing by zero (ANSI Spark would throw,
    * the DuckDB oracle would emit NULL slots); identity whenever every
    * dimension varies. One definition, because the NDCG audit is only
    * meaningful if it scores the EXACT ranking the search ships. */
  private def sq8Coded(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
    val stats = e.select(posexplode(col("ce")).as(Seq("dim", "v")))
      .groupBy("dim").agg(min("v").as("mn"), max("v").as("mx"))
      .orderBy("dim").collect()
    val mns = array(stats.map(r => lit(r.getDouble(1))): _*)
    val mxs = array(stats.map(r => lit(r.getDouble(2))): _*)
    e.withColumn("mn", mns).withColumn("mx", mxs)
      .withColumn("code", expr(
        "transform(sequence(0, 63), i -> CASE WHEN mx[i] = mn[i] THEN CAST(0 AS BIGINT) ELSE CAST(floor((ce[i] - (mn[i] + mx[i]) / 2) * 255 / (mx[i] - mn[i]) + 0.5) AS BIGINT) END)"))
      .select(col("vec_id"), col("ce"), col("code"))
  }

  def qSimSq8(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val coded = sq8Coded(s, d)
    val queries = coded.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("code").as("qc"), col("ce").as("qe"))
    val cands = coded.select(col("vec_id").as("c_id"), col("code").as("cc"), col("ce"))
    val w = Window.partitionBy("q_id").orderBy(desc("ip8"), col("c_id"))
    cands.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("ip8", expr("dot_l(qc, cc)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .withColumn("cosine", expr(cosExpr))
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"),
        col("ip8"), col("cosine"))
  }

  /** NDCG@10 retrieval-quality evaluation of the SQ8 quantized ranking
    * ([[qSimSq8]]) against the exact-cosine ranking — the graded metric
    * that recall@k can't provide: it scores WHERE the true neighbors
    * land in the approximate list, not just whether they appear.
    * Relevance is graded from the exact ranking (rel = 11 − true_rank
    * for the true top-10, else 0); DCG folds rel/log₂(pos+1) over the
    * predicted top-10 in position order (a sorted-array fold — the same
    * left-to-right double discipline as the LM cross-entropy, so the
    * sum is bit-identical cross-engine); IDCG is the perfect-list fold
    * of the same terms.
    *
    * Scale shape: identical to the SQ8 search itself (train→broadcast-
    * literal stats, map-side quantize, per-query rank windows); the
    * NDCG reduction adds one ≤10-row fold per query. At 100 TB this is
    * the eval you run on a query SAMPLE before trusting the compressed
    * index — the plan shape is sample-size, not corpus-size. */
  def qNdcgEval(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val coded = sq8Coded(s, d)
    val queries = coded.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("code").as("qc"), col("ce").as("qe"))
    val cands = coded.select(col("vec_id").as("c_id"), col("code").as("cc"), col("ce"))
    val wPred = Window.partitionBy("q_id").orderBy(desc("ip8"), col("c_id"))
    val wTrue = Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))
    cands.join(broadcast(queries), col("q_id") =!= col("c_id"))
      .withColumn("ip8", expr("dot_l(qc, cc)"))
      .withColumn("cos_r", expr(cosExpr))
      .withColumn("pred_pos", row_number().over(wPred))
      .withColumn("true_rank", row_number().over(wTrue))
      .filter(col("pred_pos") <= 10)
      .withColumn("rel", greatest(lit(0L), lit(11L) - col("true_rank")))
      .groupBy("q_id")
      .agg(sum(when(col("true_rank") <= 10, 1L).otherwise(0L)).as("n_hits"),
        sort_array(collect_list(struct(col("pred_pos").as("pos"), col("rel").as("rel")))).as("pr"))
      .withColumn("dcg", expr(
        "aggregate(pr, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x.rel AS DOUBLE) / log2(CAST(x.pos + 1 AS DOUBLE)))"))
      .withColumn("idcg", expr(
        "aggregate(sequence(1, 10), CAST(0 AS DOUBLE), (acc, g) -> acc + CAST(11 - g AS DOUBLE) / log2(CAST(g + 1 AS DOUBLE)))"))
      .select(col("q_id"), col("n_hits"),
        expr("round(dcg / idcg, 6)").as("ndcg"))
  }

  /** Deterministic hyperplane LSH codes: plane p's component i is the
    * integer-exact LCG `((1103515245·(p·131+i)+12345) mod 2^31)/2^31 −
    * 0.5`, evaluated by the fused codegen expression
    * [[graft.functions.HyperplaneCodes]] (same multiply-then-left-fold
    * double arithmetic as the DuckDB oracle's list_reduce — sign bits
    * are engine-identical, keeping the LSH queries hash-checkable). */
  private def codesExpr(bands: Int, bits: Int): String =
    s"hyperplane_codes(ce, $bands, $bits)"

  /** ANN via multi-table hyperplane LSH: 4 independent bands of
    * ADAPTIVE-width codes (the same `max(4, min(12, bitLength(n−1)−2))`
    * derivation as the near-dup pipeline, so expected bucket population
    * stays ~4 at any corpus size), each band probed at the query's own
    * code plus every Hamming-1 neighbor, cosine-ranked over the distinct
    * union of probed candidates. The multi-band union keeps recall
    * bounded as the code widens; the adaptive width keeps per-query
    * candidates ~(bands · (1+bits) · 4) — FLAT in corpus size, where the
    * round-13 fixed 4-bit single table probed 5/16 of the WHOLE corpus
    * per query, a quadratic scale path the 10×-embeddings slope audit
    * flagged at 12.4× (slope_emb.json; re-measured near-flat after this
    * change). Oracle-checked: the LCG plane coefficients are
    * integer-exact, the bit width uses the same bit-length form in SQL,
    * and the plane dot products fold left-to-right, so DuckDB reproduces
    * even the sign bits; PipelineSpec additionally checks recall vs
    * [[qSimTopK]]. */
  def qSimAnnLsh(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    graft.functions.HyperplaneCodes.register(s)
    val n = Tables.parquetRowCount(s, d, "embeddings")
    val bits = math.max(4, math.min(12, 64 - java.lang.Long.numberOfLeadingZeros(n - 1) - 2))
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
    val coded = e.select(col("vec_id"),
      posexplode(expr(codesExpr(4, bits))).as(Seq("band", "code")))
    val cands = coded.select(col("vec_id").as("c_id"), col("band"), col("code"))
    val probes = coded.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("band"), col("code").as("qc"))
      .withColumn("probe", explode(expr(
        s"concat(array(qc), transform(sequence(0, ${bits - 1}), j -> qc ^ shiftleft(CAST(1 AS BIGINT), j)))")))
      .select("q_id", "band", "probe")
    // a pair colliding in several bands/probes ranks once
    val pairs = cands.join(broadcast(probes),
        col("probe") === col("code") && cands("band") === probes("band") &&
        col("q_id") =!= col("c_id"))
      .select("q_id", "c_id").distinct()
    val qv = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("ce").as("qe"))
    val cv = e.select(col("vec_id").as("c_id"), col("ce"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))
    pairs.join(broadcast(qv), "q_id").join(cv, "c_id")
      .withColumn("cos_r", expr(cosExpr))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cos_r").as("cosine"))
  }

  /** The near-dup corpus: real embeddings plus injected near copies
    * (vec_id%10==0, +1_000_000, first 4 dims nudged by 1e-3) — corpus
    * embeddings are random so no natural cosine≥0.95 pairs exist; the
    * injected pairs make the hit path real at every scale factor,
    * mirroring the derived text-dedup corpus. */
  private def neardupCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
    val near = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(ce, (x, i) -> IF(i < 4, x + 0.001d, x))").as("ce"))
    base.unionByName(near)
  }

  /** Multi-band hyperplane codes for `ce`: `bands` independent codes of
    * `bits` sign bits each, exploded to one (band, code) row per band.
    * Code width scales with corpus size (log2(n/4)) so expected bucket
    * population stays ~4 at any scale: candidate pairs then grow
    * ~linearly with n — the property the single fixed-width bucket of
    * round 1 lacked (its within-bucket pair count was O(n²/2^bits)). */
  private def bandedCodes(corpus: DataFrame, n: Long, bands: Int): DataFrame = {
    graft.functions.HyperplaneCodes.register(corpus.sparkSession)
    // ceil(log2(n/4)) derived integer-exactly as bitLength(n-1) - 2: float
    // log could land an ulp above an exact power of two and ceil one wider
    // than the oracle's LOG2. The SQL side uses the same bit-length form.
    val bits = math.max(4, math.min(12, 64 - java.lang.Long.numberOfLeadingZeros(n - 1) - 2))
    corpus.select(col("vec_id"),
      posexplode(expr(codesExpr(bands, bits))).as(Seq("band", "code")))
  }

  /** Distinct candidate pairs from the banded equi-join (a pair that
    * collides in several bands is emitted once). Exposed for the
    * linear-growth assertion in PipelineSpec. */
  def neardupCandidates(s: SparkSession, d: String): DataFrame = {
    val corpus = neardupCorpus(s, d)
    // Corpus cardinality for the adaptive bit width WITHOUT a pre-count
    // job: footer metadata gives the base table's exact rows and the
    // injected union adds exactly one row per vec_id%10==0 — with the
    // corpus's contiguous 0..n-1 ids that is ceil(n/10) = (n+9)/10. The
    // oracle derives the same value as COUNT(*) + (COUNT(*)+9)//10 over
    // the base relation, so the bucketing stays engine-identical.
    val nBase = Tables.parquetRowCount(s, d, "embeddings")
    val coded = bandedCodes(corpus, nBase + (nBase + 9) / 10, bands = 4)
    val a = coded.select(col("vec_id").as("a_id"), col("band"), col("code"))
    val b = coded.select(col("vec_id").as("b_id"), col("band"), col("code"))
    a.join(b, Seq("band", "code")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Embedding near-duplicate pairs: cosine ≥ 0.95 among banded-LSH
    * candidate pairs — the embedding analogue of MinHash-LSH dedup.
    * Verification joins the (small) candidate set back to the vectors by
    * id — two linear shuffles — so the quadratic work is confined to
    * bounded buckets. Oracle-checked (the adaptive bit width is
    * re-derived in SQL from the corpus count); PipelineSpec asserts
    * injected-pair recall and near-linear candidate growth. */
  def qSimNearDupPairs(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val corpus = neardupCorpus(s, d)
    val va = corpus.select(col("vec_id").as("a_id"), col("ce").as("qe"))
    val vb = corpus.select(col("vec_id").as("b_id"), col("ce"))
    neardupCandidates(s, d)
      .join(va, "a_id").join(vb, "b_id")
      .withColumn("cosine", expr(cosExpr))
      .filter(col("cosine") >= 0.95)
      .select("a_id", "b_id", "cosine")
  }

  /** SemDeDup-style semantic deduplication (cluster the embedding
    * space, then prune near-identical vectors WITHIN each cluster —
    * Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication"): a vector is a semantic duplicate
    * iff a LOWER-id member of its k-means cell has rounded cosine
    * ≥ 0.95 — the embedding-space analogue of exact dedup's
    * keep-lowest-id contract (the paper ranks members by distance to
    * their centroid; min-id is the deterministic, oracle-stable
    * equivalent). Runs over the derived near-dup corpus (base ∪
    * perturbed twins) so the hit path is live at every scale factor.
    *
    * Scale shape: the quadratic comparison is confined to cells —
    * O(Σ|cell|²) — and the cell COUNT adapts to the corpus:
    * k = max(8, ⌈n/1024⌉) from parquet footer metadata (no pre-count
    * job), so expected cell population stays ~1k at any scale and the
    * pairwise work grows linearly with n. Training touches only the
    * 1/8 sample, centroids broadcast as literals, assignment is
    * map-side; the within-cell pair join is one equi-join shuffle on
    * the cell id. */
  def qSemanticDedup(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val corpus = graft.CacheTracker.track(neardupCorpus(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nBase = Tables.parquetRowCount(s, d, "embeddings")
    val n = nBase + (nBase + 9) / 10
    val k = math.max(8, ((n + 1023) / 1024).toInt)
    val cents = ivfCentroidsLit(corpus, k)
    // cells feed three branches (both pairwise sides + the final
    // disposition join) — persist so the assignment cross-join + window
    // runs once; released by the harness
    val cells = graft.CacheTracker.track(
      assignCells(corpus, cents, 1).select(col("vec_id"), col("cid"), col("ce"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = cells.select(col("cid"), col("vec_id").as("a_id"), col("ce").as("qe"))
    val b = cells.select(col("cid"), col("vec_id").as("b_id"), col("ce"))
    val dups = a.join(b, Seq("cid")).filter(col("a_id") < col("b_id"))
      .withColumn("cos_r", expr(cosExpr))
      .filter(col("cos_r") >= 0.95)
      .select(col("b_id").as("vec_id")).distinct()
    cells.select(col("vec_id"), col("cid").as("cell_id"))
      .join(dups.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        coalesce(col("dup"), lit(false)).as("is_semantic_dup"))
  }


  /** IVF (inverted-file) ANN — the other classic scale path besides
    * hyperplane LSH: a k-means coarse quantizer partitions the corpus
    * into `k` cells; a query scans only its `nprobe` nearest cells.
    *
    * The quantizer trains on a deterministic 1/8 sample (vec_id%8==0)
    * with deterministic seeds (the embeddings of the k lowest sample
    * vec_ids) and a fixed number of Lloyd iterations, all as DataFrame
    * ops: assignment is a broadcast cross-join argmin, centroid update
    * is an explode-by-dimension average (the shuffle is on
    * (cluster, dim) — 64·k cells, trivially uniform). This is the
    * 100 TB shape: training never scans the full relation; the full
    * corpus is touched only by the map-side broadcast assignment.
    *
    * Oracle-checked, which for an ITERATIVE float algorithm requires
    * engineering every step to a deterministic fold: similarities are
    * rounded to 6 dp with a cid/vec_id tie-break before any argmin, and
    * each centroid mean is a vec_id-sorted LEFT FOLD of the members'
    * components divided by the count — the same op sequence DuckDB's
    * list_reduce performs, so the two engines produce bit-identical
    * centroids at every Lloyd step (a plain avg() would depend on
    * partition merge order). PipelineSpec additionally checks recall
    * vs brute force.
    */
  /** Cosine argmin assignment of every `df` row against a broadcast
    * centroid relation, keeping each row's `n` nearest cells (rounded
    * sim + cid tie-break — deterministic across engines). */
  private[graft] def assignCells(df: DataFrame, cents: DataFrame, n: Int): DataFrame =
    df.crossJoin(broadcast(cents))
      .withColumn("sim", expr("round(cosine_sim(ce, centroid), 6)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(desc("sim"), col("cid"))))
      .filter(col("rn") <= n)

  /** Coarse k-means quantizer trained on the deterministic 1/8 sample
    * (vec_id % 8 == 0): deterministic seed (k lowest sample ids) + 2
    * Lloyd iterations with vec_id-sorted left-fold means (bit-identical
    * to the oracle's unrolled CTEs), materialized to the driver and
    * returned as a (cid, centroid) literal relation so downstream plans
    * carry no training lineage. At 100 TB training never scans the full
    * relation — the full corpus is touched only by the map-side
    * broadcast assignment. */
  private def ivfCentroidsLit(e: DataFrame, k: Int): DataFrame = {
    import e.sparkSession.implicits._
    val sample = e.filter(col("vec_id") % 8 === 0)
    // Every round's centroids are COLLECTED to the driver and re-embedded
    // as a literal relation (r17): the model is k ≤ 4096 cells × 64
    // doubles — driver-sized by definition (the final collect already
    // shipped exactly these rows), and the previous cache()/count()/
    // unpersist() round-trip per Lloyd iteration cost two extra jobs and
    // a broadcast that re-planned the cached lineage each round. With a
    // literal, each iteration is ONE aggregation job and the assignment
    // broadcast is a local-relation build. Arithmetic unchanged
    // (vec_id-sorted left-fold means — bit-identical to the oracle).
    def toLit(rows: Array[(Int, Array[Double])]): DataFrame =
      rows.toSeq.toDF("cid", "centroid")
    var centRows = sample.orderBy("vec_id").limit(k)
      .select((row_number().over(Window.orderBy("vec_id")) - 1).as("cid"),
        col("ce").as("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    for (_ <- 1 to 2) {
      centRows = assignCells(sample, toLit(centRows), 1)
        .select(col("vec_id"), col("cid"), posexplode(col("ce")).as(Seq("dim", "x")))
        .groupBy("cid", "dim")
        // vec_id-sorted left-fold mean: merge-order-independent
        .agg(expr("""aggregate(transform(array_sort(collect_list(struct(vec_id, x))), p -> p.x),
                     CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("sx"),
          count(lit(1)).as("cnt"))
        .withColumn("m", col("sx") / col("cnt"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(dim, m))), p -> p.m)").as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    }
    toLit(centRows)
  }

  def qSimIvf(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    // the corpus feeds 2 train assignments + the index pass + the probe
    // pass — persist so the parquet scan and float cast run once across
    // ALL of them (at cluster scale this is the materialized
    // sample/index relation); released by the harness via CacheTracker
    // after the query materializes (the session is shared across
    // queries — leaked blocks would accumulate)
    val e = graft.CacheTracker.track(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val centLit = ivfCentroidsLit(e, k = ivfKOf(s, d))
    // -- index: assign every vector to its cell (fresh map-side scan)
    val cells = assignCells(e, centLit, 1)
      .select(col("vec_id").as("c_id"), col("cid"), col("ce"))
    ivfSearch(cells, centLit, e.filter(col("vec_id") % 20 === 0))
  }

  /** nprobe=2 IVF top-5 search over a (c_id, cid, ce) cell-assignment
    * relation — shared by the train-inline form and the at-rest index
    * reader.
    *
    * The probed-cell set (≤ 2·|queries| values, at most the k cells after
    * distinct) is collected and pushed down as a LITERAL `cid IN (…)`
    * predicate on the cell relation BEFORE the join: against the at-rest
    * index — parquet partitioned by `cid` on disk — this lands in the
    * scan's PartitionFilters, so a search (and each streaming
    * annQuerySink tick) reads ONLY the probed cells' files instead of
    * scanning the whole index; against the train-inline cached relation
    * it is an ordinary pushed filter. Collecting the cid set is one tiny
    * extra job over the query batch (queries × k broadcast argmin) —
    * nothing corpus-sized. PlanShapeSpec asserts the PartitionFilters
    * are present on the at-rest path. */
  private[graft] def ivfSearch(cells: DataFrame, centLit: DataFrame, queries: DataFrame): DataFrame = {
    val probes = assignCells(queries, centLit, 2)
      .select(col("vec_id").as("q_id"), col("ce").as("qe"), col("cid"))
    val probedCids = probes.select(col("cid").cast("int")).distinct().collect()
      .map(_.getInt(0)).sorted.toSeq
    // the at-rest path's cid is a Hive partition column whose type comes
    // from directory inference — with inference disabled it arrives as
    // STRING, so normalize to int before keying (filter + join) on it;
    // the int-inferred layout keeps its column untouched so the probed-cid
    // predicate stays a storage-layer PartitionFilter
    val cellsTyped =
      if (cells.schema("cid").dataType == org.apache.spark.sql.types.IntegerType) cells
      else cells.withColumn("cid", col("cid").cast("int"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))
    cellsTyped.filter(col("cid").isin(probedCids.map(Int.box): _*))
      .join(broadcast(probes), Seq("cid")).filter(col("q_id") =!= col("c_id"))
      .withColumn("cos_r", expr(cosExpr))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cos_r").as("cosine"))
  }

  /** ANN RECALL MATRIX — the cross-method eval a vector-store owner
    * reads before picking an index: recall@5 of each approximate method
    * (hyperplane LSH, IVF, SQ8 scalar quantization, PQ/ADC) against the
    * brute-force cosine top-5 on the SAME query set, in one table with
    * the returned-row count (methods may return fewer than 5 when
    * probes miss). Each method keeps its own scale shape; the matrix
    * itself is four semi-join counts against the broadcast-sized truth
    * relation.
    *
    * Determinism: every method is individually hash-exact vs its
    * oracle, so the overlap counts are exact integers and the oracle is
    * literally the four method SQLs composed as CTEs. */
  def qAnnRecallMatrix(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val truth = graft.CacheTracker.track(qSimTopK(s, d)
      .select(col("q_id"), col("neighbor_id")).persist(StorageLevel.MEMORY_AND_DISK))
    val nq = truth.select("q_id").distinct().count()
    val methods: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "lsh" -> (qSimAnnLsh _), "ivf" -> (qSimIvf _),
      "sq8" -> (qSimSq8 _), "pq" -> (qSimPq _))
    methods.map { case (name, f) =>
      f(s, d).select(col("q_id"), col("neighbor_id"))
        .join(truth.withColumn("hit", lit(1)), Seq("q_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_returned"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
        // a method that returned ZERO rows gets no row here — the
        // oracle's GROUP BY method omits it, and the Spark global agg
        // would otherwise emit (name, 0, NULL) for a degenerate corpus
        .filter(col("n_returned") > 0)
        .select(lit(name).as("method"), lit(nq).as("n_queries"),
          col("n_returned"), col("n_hits"),
          round(col("n_hits").cast("double") / lit(5.0 * nq), 6).as("recall_at_5"))
    }.reduce(_ unionByName _)
  }

  /** IVF INDEX AT REST — the ANN face of the at-rest index family (next
    * to q_dedup_pairs_at_rest): a production vector store trains its
    * coarse quantizer once and persists BOTH artifacts — the tiny
    * centroid table and the full cell-assignment relation (FAISS's
    * inverted lists, here a cid-keyed parquet) — then every search
    * session loads centroids (k rows → broadcast), assigns its queries
    * to probe cells, and scans ONLY the matching index partitions.
    * This build job always rebuilds: train → write centroids parquet →
    * write assignments parquet, then answer the standard query set FROM
    * the index read back off disk. Oracle = q_sim_ivf's from-scratch
    * SQL, so the persisted-index search is proven byte-identical to the
    * train-inline form — floats and all (the parquet double round-trip
    * is exact; ranking ties break on c_id).
    *
    * Scale shape: identical to q_sim_ivf's search phase, plus two
    * writes — and the assignment relation is PARTITIONED BY cid on
    * disk (`.partitionBy("cid")`, FAISS's inverted-list files), so the
    * probed-cell predicate ivfSearch pushes down becomes a storage-layer
    * PartitionFilter: a search session — batch or a streaming
    * annQuerySink tick — opens only its probed cells' files, the
    * O(batch × probed cells) contract the at-rest design exists for.
    * PlanShapeSpec asserts the pruned scan shape. */
  def qSimIvfAtRest(s: SparkSession, d: String): DataFrame = {
    val e = buildIvfAtRest(s, d)
    val (cellsDir, centsDir) = ivfIndexDirs(s, d)
    // ---- search session: everything below reads the index from disk
    val centsAtRest = s.read.parquet(centsDir.toString)
    val cellsAtRest = s.read.parquet(cellsDir.toString)
    ivfSearch(cellsAtRest, centsAtRest, e.filter(col("vec_id") % 20 === 0))
  }

  /** The IVF index-build job (always rebuilds): train → write centroids
    * parquet → write cid-partitioned assignments parquet → GC stale
    * generations. Returns the persisted corpus relation for callers
    * that go on to search. */
  private def buildIvfAtRest(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val (cellsDir, centsDir) = ivfIndexDirs(s, d)
    val e = graft.CacheTracker.track(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val centLit = ivfCentroidsLit(e, k = ivfKOf(s, d))
    centLit.write.mode("overwrite").parquet(centsDir.toString)
    graft.AtRest.writePartitioned(assignCells(e, centLit, 1)
      .select(col("vec_id").as("c_id"), col("cid"), col("ce")), "cid", cellsDir.toString)
    graft.AtRest.gcStale(cellsDir); graft.AtRest.gcStale(centsDir)
    e
  }

  /** INCREMENTAL maintenance of the at-rest IVF index — the ANN face of
    * q_dedup_pairs_incremental, completing the vector-store lifecycle
    * (build → refresh → serve → eval): when NEW vectors arrive (the
    * deterministic vec_id%10==7 slice, the corpus' standing stand-in
    * for an ingest batch), a production store does NOT retrain or
    * re-assign — the coarse quantizer is FROZEN at build time, the
    * standing cell index stays untouched, and the refresh tick assigns
    * ONLY the arrivals against the broadcast centroids and appends
    * their cell rows as a delta generation. Search unions standing +
    * delta (both cid-partitioned on disk, both pruned by the probed-cid
    * predicate).
    *
    * The oracle is the from-scratch frozen-quantizer pipeline (train on
    * the HISTORY sample, assign the FULL corpus): hash equality proves
    * the incremental identity — frozen-quantizer delta refresh loses
    * nothing vs full re-assignment — which is exactly the claim that
    * lets a 100 TB store refresh in minutes (cost ∝ |arrivals|, one
    * map-side broadcast argmin) instead of re-clustering nightly. */
  def qSimIvfIncremental(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = graft.CacheTracker.track(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hist = e.filter(col("vec_id") % 10 =!= 7)
    val arrivals = e.filter(col("vec_id") % 10 === 7)
    // quantizer trained on the HISTORY sample only, then frozen
    val centLit = ivfCentroidsLit(hist, k = ivfKOf(s, d))
    val histDir = graft.AtRest.dir(s, d, "ivf_cells_hist", "embeddings",
      ivfIndexParams(ivfKOf(s, d)) + ",split=hist-mod10ne7")
    val deltaDir = graft.AtRest.dir(s, d, "ivf_cells_delta", "embeddings",
      ivfIndexParams(ivfKOf(s, d)) + ",split=delta-mod10eq7")
    graft.AtRest.writePartitioned(assignCells(hist, centLit, 1)
      .select(col("vec_id").as("c_id"), col("cid"), col("ce")), "cid", histDir.toString)
    // —— the refresh tick: arrivals only, cost ∝ |delta| ——
    graft.AtRest.writePartitioned(assignCells(arrivals, centLit, 1)
      .select(col("vec_id").as("c_id"), col("cid"), col("ce")), "cid", deltaDir.toString)
    graft.AtRest.gcStale(histDir); graft.AtRest.gcStale(deltaDir)
    // —— search session over standing ∪ delta, read from disk ——
    val cells = s.read.parquet(histDir.toString)
      .unionByName(s.read.parquet(deltaDir.toString))
      .select("c_id", "cid", "ce")
    ivfSearch(cells, centLit, e.filter(col("vec_id") % 20 === 0))
  }

  /** IVF nprobe COST/RECALL SWEEP — the tuning table an index owner
    * reads before fixing the serving nprobe (the IVF analogue of
    * q_lsh_band_sweep's bands×rows knee): for nprobe ∈ {1, 2, 4}, the
    * scored-candidate count (the per-query serving cost — each probe
    * scans ~1/k of the corpus, k = ivfKOf ≈ √n) against recall@5 vs the
    * brute-force cosine truth. The knee — where added probes buy
    * little recall for doubled cost — is the number production serving
    * pins.
    *
    * Scale shape: the cell index builds once (persisted across the
    * three variants), each variant is one broadcast probe join (probes
    * are query-batch-sized), and the truth set is the q_sim_topk
    * relation whose own oracle already proves it. Counts are exact
    * integers; the only float is the final recall division. */
  def qIvfProbeSweep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    graft.functions.VectorFunctions.register(s)
    val e = graft.CacheTracker.track(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val centLit = ivfCentroidsLit(e, k = ivfKOf(s, d))
    val cells = graft.CacheTracker.track(assignCells(e, centLit, 1)
      .select(col("vec_id").as("c_id"), col("cid"), col("ce"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    cells.count() // one index build shared by the three probe variants
    val queries = e.filter(col("vec_id") % 20 === 0)
    val truth = graft.CacheTracker.track(qSimTopK(s, d)
      .select(col("q_id"), col("neighbor_id")).persist(StorageLevel.MEMORY_AND_DISK))
    val nq = truth.select("q_id").distinct().count()
    Seq(1, 2, 4).map { n =>
      val probes = assignCells(queries, centLit, n)
        .select(col("vec_id").as("q_id"), col("ce").as("qe"), col("cid"))
      val scored = cells.join(broadcast(probes), Seq("cid"))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("cos_r", expr(cosExpr))
      val ranked = scored.withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("c_id").as("neighbor_id"))
      scored.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(ranked
          .join(truth.withColumn("hit", lit(1)), Seq("q_id", "neighbor_id"), "left")
          .agg(count(lit(1)).as("n_returned"),
            // coalesce: sum over ZERO returned rows is NULL, but the
            // oracle's scalar COUNT form yields 0 for the same input
            coalesce(sum(coalesce(col("hit"), lit(0))), lit(0)).cast("long").as("n_hits")))
        .select(lit(n).as("nprobe"), lit(nq).as("n_queries"), col("n_candidates"),
          col("n_returned"), col("n_hits"),
          // zero queries (empty corpus) → NULL recall, matching the
          // oracle's x/0 → NULL — ANSI would throw on the live division
          (if (nq == 0) lit(null).cast("double")
           else round(col("n_hits").cast("double") / lit(5.0 * nq), 6)).as("recall_at_5"))
    }.reduce(_ unionByName _)
  }

  /** IVF CELL-BALANCE MONITOR — the index-health face next to the drift
    * monitor: per-cell occupancy of the AT-REST cell index (a bare
    * index scan — the standing corpus is never re-assigned), with the
    * imbalance readouts an operator alerts on: occupancy share,
    * max/mean ratio, and the χ² statistic against uniform. A cell that
    * captures a disproportionate share makes every probe of it scan
    * that share of the corpus — the signal that the quantizer needs
    * retraining after distribution drift. Exact integers until the
    * final ratios. */
  def qIvfBalance(s: SparkSession, d: String): DataFrame = {
    val (cellsDir, centsDir) = ivfIndexDirs(s, d)
    if (!graft.AtRest.isBuilt(centsDir) || !graft.AtRest.isBuilt(cellsDir))
      buildIvfAtRest(s, d)
    val cells = s.read.parquet(cellsDir.toString)
    // k is the CONFIGURED cell count (the shared ivfKOf derivation the
    // quantizer was built with, which the oracle computes by the same
    // bit-length form) — not the centroid parquet's row count: a Lloyd
    // step that empties a seed cell would shrink that count and
    // silently relax the uniform baseline, when an empty cell is
    // precisely the imbalance this monitor exists to surface.
    val k = ivfKOf(s, d)
    val occ = cells.groupBy("cid").agg(count(lit(1)).as("n_vectors"))
    val tot = occ.agg(sum("n_vectors").cast("long").as("n_total"))
    occ.crossJoin(broadcast(tot))
      .select(col("cid").cast("int").as("cid"), col("n_vectors"), col("n_total"),
        round(col("n_vectors").cast("double") / col("n_total"), 6).as("share"),
        round(col("n_vectors").cast("double") * lit(k) / col("n_total"), 6).as("load_ratio"),
        round(expr(s"pow(n_vectors - CAST(n_total AS DOUBLE) / $k, 2) / (CAST(n_total AS DOUBLE) / $k)"), 6)
          .as("chi2_term"))
      .withColumn("overloaded", col("load_ratio") > 2.0)
  }

  /** MATRYOSHKA / truncated-dimension RECALL CURVE — the eval behind
    * choosing a serving dimensionality (MRL-style nested embeddings:
    * Kusupati et al. 2022 train embeddings whose PREFIXES are usable
    * vectors; a store then serves d=8/16/32 prefixes at 8/4/2× less
    * memory and bandwidth): recall@5 of cosine over the first-d prefix
    * against the full-64-dim truth, one row per d ∈ {8, 16, 32, 64}.
    * The d=64 row is the built-in self-check (the variant IS the truth
    * pipeline — recall exactly 1.0); the d=8/16/32 rows are the
    * memory-vs-recall trade the dimension decision reads.
    *
    * Scale shape: each variant is the brute-force eval shape of
    * q_sim_topk (query batch broadcast against the corpus — the
    * CORRECTNESS bar for ANN methods, not the serving path; a serving
    * deployment pairs the chosen prefix with IVF/LSH exactly as the
    * other q_sim_* faces do). Prefix slicing is map-side; counts are
    * exact integers. */
  def qMatryoshkaRecall(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    graft.functions.VectorFunctions.register(s)
    val e = graft.CacheTracker.track(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val truth = graft.CacheTracker.track(qSimTopK(s, d)
      .select(col("q_id"), col("neighbor_id")).persist(StorageLevel.MEMORY_AND_DISK))
    val nq = truth.select("q_id").distinct().count()
    Seq(8, 16, 32, 64).map { dim =>
      val sub = e.select(col("vec_id"), expr(s"slice(ce, 1, $dim)").as("ce"))
      val qs = sub.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("q_id"), col("ce").as("qe"))
      val ranked = sub.select(col("vec_id").as("c_id"), col("ce"))
        .crossJoin(broadcast(qs)).filter(col("q_id") =!= col("c_id"))
        .withColumn("cos_r", expr(cosExpr))
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("c_id").as("neighbor_id"))
      ranked.join(truth.withColumn("hit", lit(1)), Seq("q_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("n_returned"),
          // coalesce: sum over ZERO returned rows is NULL, the oracle's
          // scalar COUNT form yields 0 (identity on any real corpus)
          coalesce(sum(coalesce(col("hit"), lit(0))), lit(0)).cast("long").as("n_hits"))
        .select(lit(dim).as("dims"), lit(nq).as("n_queries"),
          col("n_returned"), col("n_hits"),
          // zero queries (empty corpus) → NULL recall, matching the
          // oracle's x/0 → NULL — ANSI would throw on the live division
          (if (nq == 0) lit(null).cast("double")
           else round(col("n_hits").cast("double") / lit(5.0 * nq), 6)).as("recall_at_5"))
    }.reduce(_ unionByName _)
  }

  /** The IVF coarse-quantizer cell count — ONE definition shared by
    * every builder (`buildIvfAtRest`, `qSimIvf`, the PQ compositions)
    * and every monitor (`qIvfBalance`'s uniform baseline), and —
    * since round 14 — ADAPTIVE in the corpus size: k = 2^⌊bitLength(n−1)/2⌋
    * ≈ √n, clamped to [8, 4096] (the driver collects k centroid rows, so
    * the cap bounds that collect; the floor keeps tiny corpora at the
    * historical k=8). A FIXED k makes every IVF search quadratic at
    * scale — candidates/query = nprobe·n/k ∝ n — which the
    * 10×-embeddings slope audit measured at 12.0× on q_sim_ivf_pq
    * (slope_emb.json) despite the family's "100 TB shape" design note;
    * with k ∝ √n the candidate work grows ∝ n^1.5 TOTAL (√n per query),
    * the standard IVF scaling. Derived integer-exactly from the parquet
    * footer count by the same bit-length form the oracles compute in
    * SQL (`LENGTH(BIN(GREATEST(1, COUNT(*)−1)))`), so both engines pick
    * the same k at every corpus size. Folded into [[ivfIndexParams]],
    * so a formula change invalidates at-rest indexes. */
  private[graft] def ivfKFor(n: Long): Int =
    1 << math.max(3, math.min(12,
      (64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))) / 2))
  private[graft] def ivfKOf(s: SparkSession, d: String): Int =
    ivfKFor(Tables.parquetRowCount(s, d, "embeddings"))

  /** Every constant the IVF index content/layout depends on — hashed
    * into the AtRest fingerprint so changing any of them (or the
    * on-disk layout) auto-invalidates the index. */
  private[graft] def ivfIndexParams(k: Int) =
    s"k=$k,lloyd=2,sample=mod8,seed=lowest-k,metric=cosine-r6,layout=partitionBy(cid)"

  /** (cells, cents) at-rest directories for the IVF index — shared with
    * the streaming serving spec so builder and server can never
    * disagree on the index location. */
  private[graft] def ivfIndexDirs(s: SparkSession, d: String): (java.io.File, java.io.File) = {
    val params = ivfIndexParams(ivfKOf(s, d))
    (graft.AtRest.dir(s, d, "ivf_cells", "embeddings", params),
     graft.AtRest.dir(s, d, "ivf_cents", "embeddings", params))
  }

  /** Product quantization (PQ) — the third classic ANN path next to
    * hyperplane LSH and IVF: 64 dims split into 8 subvectors of 8, each
    * encoded as its nearest of 16 codebook centroids (16^8 cells), and
    * query distances estimated by asymmetric distance computation (ADC):
    * sum over groups of the query-subvector→centroid distance looked up
    * by the candidate's code.
    *
    * Deterministic and oracle-checked even though the codebooks are
    * TRAINED (seeds + one Lloyd refinement per subspace on the 1/8
    * sample — [[pqCodebooksLit]]): every subdistance is a left-fold L2²
    * scaled to an exact integer (round(d·10⁶) as BIGINT), so assignment
    * argmin, the ADC sum, and the final ranking are integer comparisons,
    * and the refined codebook means use the same vec_id-sorted fold
    * contract as the IVF quantizer — bit-identical across engines with
    * no float-merge-order exposure.
    *
    * Scale shape: codebooks are tiny and broadcast; encoding is
    * map-side; the ADC distance table (queries × 8 groups × 16 cents)
    * is broadcast; the per-candidate estimate is one groupBy over
    * (query, candidate) — PQ's win at 100 TB is memory (1 byte/group
    * per vector) and cheap table-lookup distances, composed with IVF
    * cell pruning in [[qSimIvfPq]]. Exact L2² of the returned pairs
    * rides along for error inspection. */
  private val grpSlice = "slice(ce, grp * 8 + 1, 8)"

  /** Integer-exact PQ subdistance: left-fold L2² of two 8-dim slices,
    * scaled ×1e6 to BIGINT so argmin/ADC-sum/ranking are pure integer
    * comparisons (no float-merge-order exposure). */
  private def d6(a: String, b: String) =
    s"CAST(round(sqdist_d($a, $b) * 1000000, 0) AS BIGINT)"

  /** Per-subspace 8-dim subvectors of every corpus vector (8 rows/vec). */
  private def subvectors(e: DataFrame): DataFrame = e
    .select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("grp"), col("ce"))
    .select(col("vec_id"), col("grp"), expr(grpSlice).as("sub"))

  /** PQ codebooks TRAINED on the deterministic 1/8 sample: per 8-dim
    * subspace, 16 seeds (the lowest sample vec_ids' subvectors) refined
    * by one Lloyd iteration — integer-exact d6 assignment, vec_id-sorted
    * left-fold means (the same fold contract as the IVF quantizer, so
    * both engines produce bit-identical refined codebooks) — then
    * materialized to the driver as a (grp, cid, cent) literal relation.
    * Training touches only the sample; the full corpus meets the
    * codebooks in the map-side broadcast encode. */
  private def pqCodebooksLit(e: DataFrame): DataFrame = {
    val sample = e.filter(col("vec_id") % 8 === 0)
    val seeds = sample.orderBy("vec_id").limit(16)
      .select((row_number().over(Window.orderBy("vec_id")) - 1).as("cid"), col("ce"))
      .select(col("cid"), explode(sequence(lit(0), lit(7))).as("grp"), col("ce"))
      .select(col("cid"), col("grp"), expr(grpSlice).as("cent"))
    val refined = subvectors(sample).join(broadcast(seeds), "grp")
      .withColumn("dd", expr(d6("sub", "cent")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id", "grp").orderBy(col("dd"), col("cid"))))
      .filter(col("rn") === 1)
      .select(col("grp"), col("cid"), col("vec_id"), posexplode(col("sub")).as(Seq("dim", "x")))
      .groupBy("grp", "cid", "dim")
      // vec_id-sorted left-fold mean: merge-order-independent
      .agg(expr("""aggregate(transform(array_sort(collect_list(struct(vec_id, x))), p -> p.x),
                   CAST(0 AS DOUBLE), (acc, v) -> acc + v)""").as("sx"),
        count(lit(1)).as("cnt"))
      .withColumn("m", col("sx") / col("cnt"))
      .groupBy("grp", "cid")
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), p -> p.m)").as("cent"))
    val rows = refined.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    import e.sparkSession.implicits._
    rows.toSeq.toDF("grp", "cid", "cent")
  }

  /** PQ codes for every corpus vector against the broadcast codebooks:
    * map-side encode, one byte per (vector, subspace) at rest. */
  private def pqCodes(e: DataFrame, cents: DataFrame): DataFrame =
    subvectors(e).join(broadcast(cents), "grp")
      .withColumn("dd", expr(d6("sub", "cent")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id", "grp").orderBy(col("dd"), col("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("grp"), col("cid").as("code"))

  /** Per-query ADC table: query-subvector → codebook-centroid integer
    * subdistances, one row per (query, subspace, centroid) — tiny and
    * broadcast. Columns renamed q-side to keep downstream joins
    * unambiguous. */
  private def pqAdcTable(e: DataFrame, cents: DataFrame): DataFrame =
    subvectors(e.filter(col("vec_id") % 20 === 0)).join(broadcast(cents), "grp")
      .select(col("vec_id").as("qq_id"), col("grp").as("qgrp"), col("cid").as("qcid"),
        expr(d6("sub", "cent")).as("d6"))

  def qSimPq(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
    val cents = pqCodebooksLit(e)
    val codes = pqCodes(e, cents)
    val qd = pqAdcTable(e, cents)
    val est = codes.join(broadcast(qd),
        codes("grp") === col("qgrp") && codes("code") === col("qcid") &&
        codes("vec_id") =!= col("qq_id"))
      .groupBy(col("qq_id").as("q_id"), codes("vec_id").as("c_id"))
      .agg(sum(col("d6")).as("e6"))
    val ranked = est.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("e6"), col("c_id"))))
      .filter(col("rank") <= 5)
    // broadcast ONLY the query subset (vec_id % 20 — the same predicate
    // pqAdcTable selects on): ranked can only carry those q_ids, and
    // broadcasting the full corpus here would be 20× the needed bytes —
    // at scale the whole embedding table through the driver
    val qv = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("ce").as("qe"))
    val cv = e.select(col("vec_id").as("c_id"), col("ce"))
    ranked.join(broadcast(qv), "q_id").join(cv, "c_id")
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"),
        (col("e6") / 1000000.0).as("est_d2"),
        expr("round(sqdist_d(qe, ce), 6)").as("exact_d2"))
  }

  /** IVF×PQ — the production ANN composition: the corpus-adaptive
    * k-cell coarse quantizer ([[ivfKFor]], k ≈ √n) prunes the candidate
    * set to each query's nprobe=2 cells, and PQ ADC
    * ranks only within the probed cells. At 100 TB this is the shape
    * that works: coarse training and PQ training both touch only the
    * 1/8 sample, encoding and cell assignment are map-side against
    * broadcast codebooks/centroids, and the ADC join runs over the
    * pruned (query, candidate) pairs instead of the full cross product
    * (the memory story is PQ's — one byte per subspace per vector).
    * Codes are computed on the raw vectors (shared across cells);
    * [[qSimIvfPqRes]] is the residual-encoding refinement of this
    * query. Deterministic/oracle-checked end to end: rounded
    * cosine for cells/probes, integer d6 for codes/ADC, fold-exact
    * trained codebooks — the oracle unrolls both trainings as CTEs.
    *
    * Measured nprobe trade at sf0.001 (PipelineSpec sweep; recall@5 vs
    * exact L2, 60-ish queries): nprobe=2 → 3 121 candidates, recall
    * 0.160; nprobe=4 → 6 279, 0.120; nprobe=8 (all cells ≡ unpruned
    * ADC) → 12 475, 0.112. On RANDOM embeddings recall FALLS as nprobe
    * grows: distance concentration makes ADC estimates noisy, far cells
    * contribute ADC false positives that displace true neighbors, so
    * cell pruning acts as a beneficial pre-filter. The query ships
    * nprobe=2 — the best measured point AND the cheapest. On clustered
    * real-world embeddings the curve bends the usual way (higher nprobe
    * recovers neighbors that straddle cell boundaries); the sweep spec
    * records the curve so a corpus change re-measures it. */
  def qSimIvfPq(s: SparkSession, d: String): DataFrame = ivfPqSearch(s, d, nprobe = 2)

  /** IVF-pruned candidate pairs at a given `nprobe` (spec-visible so the
    * sweep can report candidate counts next to recall). Probed cells are
    * a prefix of the same distance ordering, so candidates at nprobe n
    * are a subset of candidates at n+1 — asserted in PipelineSpec. */
  private[graft] def ivfPqCandidates(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
    val coarse = ivfCentroidsLit(e, k = ivfKOf(s, d))
    val cells = assignCells(e, coarse, 1).select(col("vec_id").as("c_id"), col("cid"))
    val probes = assignCells(e.filter(col("vec_id") % 20 === 0), coarse, nprobe)
      .select(col("vec_id").as("q_id"), col("cid"))
    cells.join(broadcast(probes), Seq("cid"))
      .filter(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id")
  }

  private[graft] def ivfPqSearch(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    // persisted through both trainings AND the index/encode/probe
    // passes; released by the harness via CacheTracker
    val e = graft.CacheTracker.track(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val coarse = ivfCentroidsLit(e, k = ivfKOf(s, d))
    val pq = pqCodebooksLit(e)
    val cells = assignCells(e, coarse, 1).select(col("vec_id").as("c_id"), col("cid"))
    val probes = assignCells(e.filter(col("vec_id") % 20 === 0), coarse, nprobe)
      .select(col("vec_id").as("q_id"), col("cid"))
    val codes = pqCodes(e, pq).withColumnRenamed("vec_id", "c_id")
    val qd = pqAdcTable(e, pq)
    // IVF pruning: candidates are exactly the probed cells' members
    val cand = cells.join(broadcast(probes), Seq("cid"))
      .filter(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id")
    val est = cand.join(codes, "c_id")
      .join(broadcast(qd),
        col("q_id") === col("qq_id") && col("grp") === col("qgrp") &&
        col("code") === col("qcid"))
      .groupBy("q_id", "c_id")
      .agg(sum(col("d6")).as("e6"))
    val ranked = est.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("e6"), col("c_id"))))
      .filter(col("rank") <= 5)
    // broadcast ONLY the query subset (vec_id % 20 — the same predicate
    // pqAdcTable selects on): ranked can only carry those q_ids, and
    // broadcasting the full corpus here would be 20× the needed bytes —
    // at scale the whole embedding table through the driver
    val qv = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("ce").as("qe"))
    val cv = e.select(col("vec_id").as("c_id"), col("ce"))
    ranked.join(broadcast(qv), "q_id").join(cv, "c_id")
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"),
        (col("e6") / 1000000.0).as("est_d2"),
        expr("round(sqdist_d(qe, ce), 6)").as("exact_d2"))
  }

  /** IVF×PQ with RESIDUAL encoding — the classic refinement (Jégou et
    * al. 2011, "Product quantization for nearest neighbor search",
    * §IV): PQ quantizes the residual r = x − centroid(cell(x)) instead
    * of x itself, so the 16 codebook cells per subspace spend their
    * resolution on the within-cell spread rather than re-describing the
    * coarse structure the IVF assignment already captured. A bonus of
    * residual space: ‖(q−c) − (x−c)‖² = ‖q−x‖², so ADC estimates remain
    * direct estimates of the true distance.
    *
    * Everything stays sample-trained and broadcast: the coarse
    * quantizer is unchanged; PQ codebooks train on the SAMPLE's
    * residuals; encoding is map-side against broadcast books. The one
    * structural change is the ADC table — a query's residual differs
    * per probed cell, so the table gains a cell key and grows to
    * queries × nprobe × 8 groups × 16 centroids. Still tiny, still
    * broadcast; candidate pairs are identical to [[qSimIvfPq]] (same
    * coarse quantizer, same nprobe), only the ranking changes. */
  def qSimIvfPqRes(s: SparkSession, d: String): DataFrame = ivfPqResidualSearch(s, d, nprobe = 2)

  private[graft] def ivfPqResidualSearch(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = graft.CacheTracker.track(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val coarse = ivfCentroidsLit(e, k = ivfKOf(s, d))
    // residual relation: every vector minus its own cell's centroid —
    // the residual keeps the name `ce` so the PQ trainer/encoder apply
    // unchanged; persisted because training, encoding and the candidate
    // side all branch from it
    val resid = graft.CacheTracker.track(
      assignCells(e, coarse, 1)
        .select(col("vec_id"), col("cid"),
          expr("zip_with(ce, centroid, (x, y) -> x - y)").as("ce"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pq = pqCodebooksLit(resid.select("vec_id", "ce"))
    val codes = pqCodes(resid.select("vec_id", "ce"), pq).withColumnRenamed("vec_id", "c_id")
    val cells = resid.select(col("vec_id").as("c_id"), col("cid"))
    // queries probe their nprobe nearest cells; the query residual is
    // PER PROBED CELL (q minus that cell's centroid)
    val probes = assignCells(e.filter(col("vec_id") % 20 === 0), coarse, nprobe)
      .select(col("vec_id").as("q_id"), col("cid"),
        expr("zip_with(ce, centroid, (x, y) -> x - y)").as("qres"))
    val qsubs = probes
      .select(col("q_id"), col("cid"), explode(sequence(lit(0), lit(7))).as("grp"), col("qres"))
      .select(col("q_id"), col("cid"), col("grp"),
        expr("slice(qres, grp * 8 + 1, 8)").as("sub"))
    val qd = qsubs.join(broadcast(pq.withColumnRenamed("cid", "pcid")), "grp")
      .select(col("q_id").as("qq_id"), col("cid").as("qcell"), col("grp").as("qgrp"),
        col("pcid").as("qcid"), expr(d6("sub", "cent")).as("d6"))
    val cand = cells.join(broadcast(probes.select("q_id", "cid")), Seq("cid"))
      .filter(col("q_id") =!= col("c_id"))
    val est = cand.join(codes, "c_id")
      .join(broadcast(qd),
        col("q_id") === col("qq_id") && col("cid") === col("qcell") &&
        col("grp") === col("qgrp") && col("code") === col("qcid"))
      .groupBy("q_id", "c_id")
      .agg(sum(col("d6")).as("e6"))
    val ranked = est.withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("e6"), col("c_id"))))
      .filter(col("rank") <= 5)
    // broadcast ONLY the query subset (vec_id % 20 — the same predicate
    // pqAdcTable selects on): ranked can only carry those q_ids, and
    // broadcasting the full corpus here would be 20× the needed bytes —
    // at scale the whole embedding table through the driver
    val qv = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("ce").as("qe"))
    val cv = e.select(col("vec_id").as("c_id"), col("ce"))
    ranked.join(broadcast(qv), "q_id").join(cv, "c_id")
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"),
        (col("e6") / 1000000.0).as("est_d2"),
        expr("round(sqdist_d(qe, ce), 6)").as("exact_d2"))
  }

  /** Per-dimension embedding statistics — the data-validation /
    * feature-store audit stage (drift detection, bad-batch screening):
    * mean, stddev, min, max for each of the 64 dimensions (drift and
    * bad-batch screening over the corpus the ANN indexes serve).
    *
    * Shape: posexplode to (dim, value) then ONE groupBy(dim) with
    * map-side partial aggregation — 64 groups regardless of corpus
    * size, so the shuffle is O(partitions · 64) partials. Float
    * determinism: sums run over round(value·10^7) integers in
    * DECIMAL(38,0) (exact at any corpus size — no float-summation
    * order sensitivity, no BIGINT overflow of the squared sums);
    * mean/std derive from the exact sums with the identical expression
    * in both engines, rounded to 6 dp. */
  def qEmbColstats(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("sv", expr("CAST(round(CAST(v AS DOUBLE) * 10000000) AS BIGINT)"))
    e.groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(sv AS DECIMAL(38,0))")).as("ssum"),
        sum(expr("CAST(sv AS DECIMAL(38,0)) * sv")).as("ssq"),
        round(min(col("v").cast("double")), 6).as("min_v"),
        round(max(col("v").cast("double")), 6).as("max_v"))
      .select(col("dim"), col("n"),
        round(col("ssum").cast("double") / col("n") / lit(1e7), 6).as("mean_v"),
        round(sqrt(
          (col("ssq").cast("double") / col("n") -
            (col("ssum").cast("double") / col("n")) * (col("ssum").cast("double") / col("n")))
          ) / lit(1e7), 6).as("std_v"),
        col("min_v"), col("max_v"))
  }

  /** k-NN majority-vote label transfer — the classification pass a
    * labeled seed set gives an unlabeled corpus (quality tiers, topic
    * buckets, safety labels propagated from a small annotated sample).
    * Test vectors (vec_id%20==0) are classified by the majority label
    * of their 10 nearest train-set neighbors by cosine; ties break to
    * the smaller label. `correct` rides along for the accuracy audit.
    *
    * Scale shape: the annotated/test side is the small one — broadcast
    * it and score map-side against the corpus scan (one pass, no
    * shuffle of the big side); the rank<=10 filter is pushed below the
    * q_id exchange by WindowGroupLimit so only per-partition top-10
    * survivors shuffle; the vote is a second aggregate over k·|test|
    * rows. Determinism: cosine rounded to 6 dp with c_id tie-break
    * (the q_sim_topk contract), vote ties break on the label value. */
  def qKnnClassify(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ce"), col("label"))
    val test = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("ce").as("qe"), col("label").as("true_label"))
    val train = e.filter(col("vec_id") % 20 =!= 0)
      .select(col("vec_id").as("c_id"), col("ce"), col("label").as("pred_label"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos_r"), col("c_id"))
    val vw = Window.partitionBy("q_id").orderBy(desc("votes"), col("pred_label"))
    train.crossJoin(broadcast(test))
      .withColumn("cos_r", expr(cosExpr))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .groupBy("q_id", "true_label", "pred_label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(vw))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("true_label"), col("pred_label"), col("votes"),
        (col("pred_label") === col("true_label")).as("correct"))
  }

  /** Per-class confusion metrics for the kNN label classifier — the
    * precision/recall/F1 readout every classifier eval publishes next
    * to raw accuracy: reuses [[qKnnClassify]]'s prediction relation,
    * reduces it to the confusion cells, and derives each class's
    * metrics from the three exact integer counts (tp, predicted
    * support, true support). Classes with no predictions report
    * precision NULL rather than a fake zero (division guarded the same
    * way in both engines).
    *
    * Scale shape: everything after the classifier is label-cardinality
    * sized — two tiny keyed aggregates and one outer join. */
  def qKnnConfusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val pred = graft.CacheTracker.track(
      qKnnClassify(s, d).persist(StorageLevel.MEMORY_AND_DISK))
    val byTrue = pred.groupBy(col("true_label").as("label"))
      .agg(count(lit(1)).as("n_true"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("tp"))
    val byPred = pred.groupBy(col("pred_label").as("label"))
      .agg(count(lit(1)).as("n_pred"))
    byTrue.join(byPred, Seq("label"), "full_outer")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision", expr(
        "CASE WHEN n_pred > 0 THEN round(CAST(tp AS DOUBLE) / n_pred, 6) END"))
      .withColumn("recall", expr(
        "CASE WHEN n_true > 0 THEN round(CAST(tp AS DOUBLE) / n_true, 6) END"))
      .withColumn("f1", expr(
        "CASE WHEN n_pred + n_true > 0 THEN round(CAST(2 * tp AS DOUBLE) / (n_pred + n_true), 6) END"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    * — the diversification step between retrieval and presentation:
    * from the top-20 relevance candidates for the query vector, greedily
    * select 5 maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) with
    * λ = 0.7, so each pick is relevant AND far from what's already
    * picked. RAG context assembly and search-result diversification
    * both run exactly this loop.
    *
    * Determinism: relevance and pairwise similarities are the 6-dp
    * codegen cosine (the module contract), the MMR score rounds before
    * the argmax, ties break on c_id; the incremental max-sim uses
    * `greatest` over rounded values, so all five selections replay
    * identically in the unrolled oracle.
    *
    * Scale shape: ONE distributed job — the top-20 relevance pool by
    * TakeOrdered (the corpus never materializes) — then the greedy
    * rounds run over the COLLECTED pool in driver memory: the pool is
    * bounded to 20 rows BY CONSTRUCTION (the limit precedes the
    * collect), so the loop is ≤ 20×5 local cosines, not k extra Spark
    * jobs with k driver round-trips (the round-7 review finding). The
    * local arithmetic replays the codegen expression's left-to-right
    * fold and Spark's HALF_UP rounding exactly, so the unrolled DuckDB
    * oracle still hash-matches. */
  def qMmrDiversify(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qe"))
    val pool: Array[(Long, Seq[Double], Double)] =
      e.filter(col("vec_id") =!= 0).select(col("vec_id").as("c_id"), col("emb").as("ce"))
        .crossJoin(broadcast(q))
        .withColumn("rel", expr(cosExpr))
        .orderBy(desc("rel"), col("c_id")).limit(20)
        .select("c_id", "ce", "rel").collect()
        .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Double]](1).toSeq, r.getDouble(2)))
    // driver-side replicas of the distributed contract: the
    // CosineSimilarity left-to-right fold and Spark round()'s HALF_UP
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0; val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1 }
      val denom = math.sqrt(nx) * math.sqrt(ny)
      if (denom == 0.0) 0.0 else dot / denom
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var rem = pool.map { case (cid, ce, rel) => (cid, ce, rel, None: Option[Double]) }
    val picked = scala.collection.mutable.ArrayBuffer[(Int, Long, Double, Option[Double], Double)]()
    for (k <- 1 to 5 if rem.nonEmpty) { // guard: empty corpus has no pool
      val scored = rem.map { case (cid, ce, rel, ms) =>
        val mmr = if (k == 1) rel else r6(0.7 * rel - 0.3 * ms.get)
        (cid, ce, rel, ms, mmr)
      }
      val top = scored.minBy { case (cid, _, _, _, mmr) => (-mmr, cid) }
      picked += ((k, top._1, top._3, top._4, top._5))
      rem = rem.filter(_._1 != top._1).map { case (cid, ce, rel, ms) =>
        val sim = r6(cos(ce, top._2))
        (cid, ce, rel, Some(ms.fold(sim)(math.max(_, sim))))
      }
    }
    import s.implicits._
    picked.toSeq.toDF("sel_rank", "c_id", "rel", "maxsim", "mmr")
  }

  /** Covariance/correlation matrix of the first 8 embedding dimensions —
    * the feature-drift / redundancy audit (and the input PCA consumes).
    *
    * Scale shape: each row emits its 36 upper-triangle products map-side
    * (flatten-of-transform, codegen'd); ONE groupBy over 36 (i, j) keys
    * with map-side partial aggregation — the shuffle carries O(partitions
    * · 36) partials regardless of corpus size; per-dim moment sums are 8
    * more rows broadcast back onto the pair grid. Float determinism: all
    * sums are exact DECIMAL(38,0) over round(v·10⁶) integers (the
    * [[qEmbColstats]] contract); cov/corr derive from the exact integer
    * sums with identical expressions in both engines, rounded to 6 dp. */
  def qEmbCovariance(s: SparkSession, d: String): DataFrame = {
    val x = Tables.embeddings(s, d).withColumn("e8",
      expr("transform(slice(embedding, 1, 8), v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"))
    val pairs = x.select(explode(expr(
        "flatten(transform(sequence(0, 7), i -> transform(sequence(i, 7), " +
        "j -> struct(i AS i, j AS j, element_at(e8, i + 1) * element_at(e8, j + 1) AS p))))")).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(count(lit(1)).as("n"), sum(expr("CAST(t.p AS DECIMAL(38,0))")).as("sxy"))
    val moms = x.select(posexplode(col("e8")).as(Seq("i", "sv")))
      .groupBy("i")
      .agg(sum(expr("CAST(sv AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(sv AS DECIMAL(38,0)) * sv")).as("sxx"))
    val num = col("n") * col("sxy") - col("sx_i") * col("sx_j")
    pairs
      .join(broadcast(moms.select(col("i"), col("sx").as("sx_i"), col("sxx").as("sxx_i"))), Seq("i"))
      .join(broadcast(moms.select(col("i").as("j"), col("sx").as("sx_j"), col("sxx").as("sxx_j"))), Seq("j"))
      .select(col("i"), col("j"), col("n"),
        round(num.cast("double") / col("n") / col("n") / lit(1e12), 6).as("cov"),
        round(num.cast("double") /
          sqrt((col("n") * col("sxx_i") - col("sx_i") * col("sx_i")).cast("double")) /
          sqrt((col("n") * col("sxx_j") - col("sx_j") * col("sx_j")).cast("double")), 6).as("corr"))
  }

  /** Top principal component by POWER ITERATION over the integer co-moment
    * matrix — distributed PCA the way it actually runs at scale (and the
    * way Spark MLlib's RowMatrix does it): ONE corpus-sized pass builds
    * the d×d Gram/moment aggregate with map-side combine (44 keys — 36
    * upper-triangle products + 8 first moments fused into the same
    * shuffle), that tiny matrix is collected, and the iteration runs on
    * the driver in exact BigInt. Keeping the d²-sized iteration out of
    * the cluster removes ~12 join/agg stages whose only content was 64
    * rows — the earlier declarative-matvec form also let the scheduler
    * launch its four matvec map-stages before the shared Gram cache
    * populated, recomputing the corpus aggregation up to 4× per run
    * (benched 16.6 s → this form ~= the one Gram pass).
    *
    * Integer-exact cross-engine: matrix entries are sdiv(n·Σxy − Σx·Σy, n)
    * (sign-safe truncating division); each iterate renormalizes to
    * max|v| = 10⁶ the same way; λ is the Rayleigh quotient under the same
    * sdiv. Three iterations unrolled in the oracle CTE chain; the spec
    * replays the identical integer algorithm from the raw parquet and
    * matches EXACTLY, and asserts the Rayleigh quotient is non-decreasing
    * across iterates and bounded by the true λmax (the power-iteration
    * invariant — 3 iterations are the operator contract, not a
    * convergence claim; more rounds converge further). */
  def qPcaPower(s: SparkSession, d: String): DataFrame = {
    val x = Tables.embeddings(s, d).withColumn("e8",
      expr("transform(slice(embedding, 1, 8), v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"))
    // one fused pass: products (i, j) plus first moments tagged j = -1
    val cells = x.select(explode(expr(
        "flatten(transform(sequence(0, 7), i -> transform(sequence(i, 7), " +
        "j -> struct(i AS i, j AS j, element_at(e8, i + 1) * element_at(e8, j + 1) AS p)))) || " +
        "transform(sequence(0, 7), i -> struct(i AS i, -1 AS j, element_at(e8, i + 1) AS p))")).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(count(lit(1)).as("cnt"), sum(expr("CAST(t.p AS DECIMAL(38,0))")).as("sp"))
      .collect()
    import s.implicits._
    if (cells.isEmpty) // empty corpus: no moments, no component
      return Seq.empty[(Int, Long, Long)].toDF("i", "v", "lambda")
    val n = BigInt(cells.head.getAs[Long]("cnt"))
    def big(r: org.apache.spark.sql.Row) = BigInt(r.getDecimal(3).toBigInteger)
    val sx = Array.fill(8)(BigInt(0))
    val sxy = Array.ofDim[BigInt](8, 8)
    cells.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      if (j < 0) sx(i) = big(r) else { sxy(i)(j) = big(r); sxy(j)(i) = big(r) }
    }
    def sdiv(a: BigInt, b: BigInt): BigInt = if (a < 0) -(a.abs / b) else a / b
    val m = Array.tabulate(8, 8)((i, j) => sdiv(n * sxy(i)(j) - sx(i) * sx(j), n))
    def matvec(v: Array[BigInt]) =
      Array.tabulate(8)(i => (0 until 8).map(j => m(i)(j) * v(j)).sum)
    var v = Array.fill(8)(BigInt(1000000))
    (1 to 3).foreach { _ =>
      val w = matvec(v)
      val mx = w.map(_.abs).max
      v = w.map(x => sdiv(x * 1000000, mx))
    }
    val mv = matvec(v)
    val lambda = sdiv((0 until 8).map(i => v(i) * mv(i)).sum,
      (0 until 8).map(i => v(i) * v(i)).sum)
    (0 until 8).map(i => (i, v(i).toLong, lambda.toLong)).toDF("i", "v", "lambda")
  }

  /** Johnson–Lindenstrauss random projection 64 → 8 dims with a fixed ±1
    * sign matrix — the cheap dimensionality-reduction front end for ANN
    * prefilters and sketch storage (distances preserved in expectation up
    * to the √(d/k) scale, spec-measured). The sign matrix derives from a
    * deterministic LCG-style parity — sign(k,i) = ±1 by
    * ((1000003k + 7919i + 12345) mod 97) mod 2 — identical arithmetic in
    * both engines, no float randomness anywhere.
    *
    * Scale shape: entirely map-side — the 8×64 sign matrix inlines as
    * codegen'd literal arrays (zip_with · aggregate per output dim), the
    * scan is one pass, no shuffle at all; output is (vec_id, k, proj)
    * integers at 10⁶ scale. */
  def qEmbedProject(s: SparkSession, d: String): DataFrame = {
    val signRows = jlSigns.map(row => row.mkString("array(", ", ", ")"))
    val projs = signRows.zipWithIndex.map { case (arr, k) =>
      s"struct($k AS k, aggregate(zip_with(e, $arr, (x, s) -> x * s), CAST(0 AS BIGINT), (a, b) -> a + b) AS proj)"
    }.mkString("array(", ", ", ")")
    Tables.embeddings(s, d)
      .withColumn("e",
        expr("transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"))
      .select(col("vec_id"), explode(expr(projs)).as("t"))
      .select(col("vec_id"), col("t.k"), col("t.proj"))
  }

  /** The JL sign matrix (8×64, ±1) — shared by the query, its oracle, and
    * the spec's driver-side recompute. */
  private[graft] val jlSigns: Array[Array[Int]] =
    Array.tabulate(8, 64) { (k, i) =>
      if (((1000003 * k + 7919 * i + 12345) % 97) % 2 == 0) 1 else -1
    }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_emb_covariance" -> (qEmbCovariance _),
    "q_pca_power" -> (qPcaPower _),
    "q_embed_project" -> (qEmbedProject _),
    "q_knn_classify" -> (qKnnClassify _),
    "q_knn_confusion" -> (qKnnConfusion _),
    "q_mmr_diversify" -> (qMmrDiversify _),
    "q_emb_colstats" -> (qEmbColstats _),
    "q_semantic_dedup" -> (qSemanticDedup _),
    "q_sim_pq" -> (qSimPq _),
    "q_sim_ivf_pq" -> (qSimIvfPq _),
    "q_sim_ivf_pq_res" -> (qSimIvfPqRes _),
    "q_sim_topk" -> (qSimTopK _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_silhouette" -> (qSilhouette _),
    "q_sim_topk_incremental" -> (qSimTopkIncremental _),
    "q_sim_mips" -> (qSimMips _),
    "q_sim_sq8" -> (qSimSq8 _),
    "q_ndcg_eval" -> (qNdcgEval _),
    "q_sim_ann_lsh" -> (qSimAnnLsh _),
    "q_sim_ivf" -> (qSimIvf _),
    "q_sim_ivf_incremental" -> (qSimIvfIncremental _),
    "q_ivf_probe_sweep" -> (qIvfProbeSweep _),
    "q_ivf_balance" -> (qIvfBalance _),
    "q_matryoshka_recall" -> (qMatryoshkaRecall _),
    "q_sim_ivf_at_rest" -> (qSimIvfAtRest _),
    "q_ann_recall_matrix" -> (qAnnRecallMatrix _),
    "q_sim_neardup_pairs" -> (qSimNearDupPairs _))

  // Shared DuckDB fragments. The hyperplane coefficients are an
  // integer-exact LCG and the dot-product folds are explicit LEFT folds
  // (list_reduce with a prepended 0), mirroring Spark's aggregate()
  // exactly — the same sequence of IEEE double ops in both engines means
  // even the sign bits of near-zero plane sums agree, which is what
  // makes the LSH bucketing oracle-checkable at all.
  private val dkCos =
    """round(list_sum(list_transform(range(1, 65), i -> list_extract(qe, i) * list_extract(ce, i))) /
      |  (sqrt(list_sum(list_transform(range(1, 65), i -> list_extract(qe, i) * list_extract(qe, i)))) *
      |   sqrt(list_sum(list_transform(range(1, 65), i -> list_extract(ce, i) * list_extract(ce, i))))), 6)""".stripMargin

  /** DuckDB replay of [[qMmrDiversify]]: the greedy loop unrolls into
    * five (rescore, argmax) CTE levels — generated so the rounds can't
    * drift from the Spark loop. */
  private def mmrOracle: String = {
    val sb = new StringBuilder(
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS emb FROM embeddings),
         |qv AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
         |cv AS (SELECT vec_id AS c_id, emb AS ce FROM e WHERE vec_id <> 0),
         |cand AS (
         |  SELECT c_id, ce, $dkCos AS rel FROM cv, qv
         |  ORDER BY rel DESC, c_id LIMIT 20),
         |s1 AS (SELECT c_id, ce, rel, CAST(NULL AS DOUBLE) AS ms, rel AS mmr
         |  FROM cand ORDER BY rel DESC, c_id LIMIT 1),
         |r2 AS (SELECT c.c_id, c.ce, c.rel, ${dkCos2("c.ce", "s.ce")} AS ms
         |  FROM cand c, s1 s WHERE c.c_id <> s.c_id)""".stripMargin)
    for (k <- 2 to 5) {
      sb.append(s""",
        |s$k AS (SELECT c_id, ce, rel, ms, round(0.7 * rel - 0.3 * ms, 6) AS mmr
        |  FROM r$k ORDER BY mmr DESC, c_id LIMIT 1)""".stripMargin)
      if (k < 5) sb.append(s""",
        |r${k + 1} AS (SELECT r.c_id, r.ce, r.rel,
        |    greatest(r.ms, ${dkCos2("r.ce", "s.ce")}) AS ms
        |  FROM r$k r, s$k s WHERE r.c_id <> s.c_id)""".stripMargin)
    }
    sb.append("\n" + (1 to 5).map { k =>
      s"SELECT $k AS sel_rank, c_id, rel, ms AS maxsim, mmr FROM s$k"
    }.mkString("\nUNION ALL\n"))
    sb.toString
  }

  private def dkPlane(p: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(0, 64),
       |  i -> list_extract(ce, i + 1) * ((CAST((1103515245 * (($p) * 131 + i) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0) - 0.5))),
       |  (acc, x) -> acc + x)""".stripMargin

  /** DuckDB cosine between two named DOUBLE[] columns (same list_sum
    * formulation that hash-matches the codegen cosine_sim at 6 dp). */
  private def dkCos2(a: String, b: String): String =
    s"""round(list_sum(list_transform(range(1, 65), i -> list_extract($a, i) * list_extract($b, i))) /
       |  (sqrt(list_sum(list_transform(range(1, 65), i -> list_extract($a, i) * list_extract($a, i)))) *
       |   sqrt(list_sum(list_transform(range(1, 65), i -> list_extract($b, i) * list_extract($b, i))))), 6)""".stripMargin

  /** Seed CTEs for the VARIABLE-k coarse quantizer: `kv` derives k from
    * the corpus count by the same bit-length form as [[ivfKFor]]
    * (integer-exact in both engines, GREATEST(1,·) making the empty
    * corpus agree too), and `c0` takes the k lowest-vec_id rows of the
    * sample relation `src` as seeds — the SQL twin of
    * `sample.orderBy("vec_id").limit(k)`. */
  private def dkIvfSeeds(src: String): String =
    s"""kv AS (SELECT CAST(1 AS BIGINT) << GREATEST(3, LEAST(12,
       |    divide(CAST(LENGTH(BIN(GREATEST(1, COUNT(*) - 1))) AS INTEGER), 2))) AS k FROM e),
       |c0 AS (
       |  SELECT CAST(rn - 1 AS INTEGER) AS cid, ce AS centroid
       |  FROM (SELECT ce, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM $src)
       |  CROSS JOIN kv WHERE rn <= k)""".stripMargin

  /** One unrolled Lloyd iteration over source relation `src`: assign to
    * `prev` centroids, recompute means as vec_id-sorted left folds
    * (mirroring the Spark side exactly), yielding centroid CTE `c`. */
  private def dkLloyd(src: String, prev: String, a: String, m: String, c: String): String =
    s"""$a AS (
       |  SELECT vec_id, cid, ce FROM (
       |    SELECT $src.vec_id, $prev.cid, $src.ce,
       |      ROW_NUMBER() OVER (PARTITION BY $src.vec_id
       |        ORDER BY ${dkCos2(s"$src.ce", s"$prev.centroid")} DESC, $prev.cid) AS rn
       |    FROM $src CROSS JOIN $prev) WHERE rn = 1),
       |${a}d AS (
       |  SELECT vec_id, cid, CAST(t.j AS INTEGER) AS dim, list_extract(ce, t.j + 1) AS x
       |  FROM $a, unnest(range(0, 64)) AS t(j)),
       |$m AS (
       |  SELECT cid, dim,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(list_sort(list(list_value(CAST(vec_id AS DOUBLE), x))), p -> list_extract(p, 2))),
       |      (acc, v) -> acc + v) / COUNT(*) AS m
       |  FROM ${a}d GROUP BY cid, dim),
       |$c AS (
       |  SELECT cid, list_transform(list_sort(list(list_value(CAST(dim AS DOUBLE), m))), p -> list_extract(p, 2)) AS centroid
       |  FROM $m GROUP BY cid)""".stripMargin

  /** Integer-exact PQ subdistance in DuckDB: left-fold L2² of two 8-dim
    * slices ×1e6 as BIGINT (mirrors the Spark aggregate/zip_with fold). */
  private def dkD6(a: String, b: String): String =
    s"""CAST(round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, 9), i -> (list_extract($a, i) - list_extract($b, i)) * (list_extract($a, i) - list_extract($b, i)))),
       |  (acc, x) -> acc + x) * 1000000) AS BIGINT)""".stripMargin

  /** PQ codebook training unrolled in DuckDB (expects CTEs `e`, `grps`,
    * and the sample `sm` upstream): seed subvectors from the 16 lowest
    * sample vec_ids, one Lloyd iteration — integer-d6 assignment, then
    * vec_id-sorted left-fold means per (grp, cid, dim) — yielding the
    * refined codebook CTE `cents`. Mirrors [[pqCodebooksLit]] op for op. */
  private val dkPqTrain: String =
    s"""pseeds AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, ce
       |  FROM (SELECT vec_id, ce FROM sm ORDER BY vec_id LIMIT 16)),
       |cents0 AS (SELECT cid, grp, list_slice(ce, grp * 8 + 1, grp * 8 + 8) AS cent FROM pseeds, grps),
       |ssub AS (SELECT vec_id, grp, list_slice(ce, grp * 8 + 1, grp * 8 + 8) AS sub FROM sm, grps),
       |pa AS (
       |  SELECT vec_id, grp, cid, sub FROM (
       |    SELECT s.vec_id, s.grp, c.cid, s.sub,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.grp
       |        ORDER BY ${dkD6("s.sub", "c.cent")}, c.cid) AS rn
       |    FROM ssub s JOIN cents0 c USING (grp)) WHERE rn = 1),
       |pad AS (
       |  SELECT vec_id, grp, cid, CAST(t.j AS INTEGER) AS dim, list_extract(sub, t.j + 1) AS x
       |  FROM pa, unnest(range(0, 8)) AS t(j)),
       |pm AS (
       |  SELECT grp, cid, dim,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(list_sort(list(list_value(CAST(vec_id AS DOUBLE), x))), p -> list_extract(p, 2))),
       |      (acc, v) -> acc + v) / COUNT(*) AS m
       |  FROM pad GROUP BY grp, cid, dim),
       |cents AS (
       |  SELECT grp, cid,
       |    list_transform(list_sort(list(list_value(CAST(dim AS DOUBLE), m))), p -> list_extract(p, 2)) AS cent
       |  FROM pm GROUP BY grp, cid)""".stripMargin

  /** Shared PQ encode/ADC tail against the trained `cents` CTE: codes
    * for every vector, ADC table for the vec_id%20 queries. */
  private val dkPqEncode: String =
    s"""subs AS (
       |  SELECT vec_id, grp, list_slice(ce, grp * 8 + 1, grp * 8 + 8) AS sub FROM e, grps),
       |codes AS (
       |  SELECT vec_id, grp, cid AS code FROM (
       |    SELECT s.vec_id, s.grp, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.grp
       |        ORDER BY ${dkD6("s.sub", "c.cent")}, c.cid) AS rn
       |    FROM subs s JOIN cents c USING (grp)) WHERE rn = 1),
       |qd AS (
       |  SELECT s.vec_id AS q_id, s.grp, c.cid, ${dkD6("s.sub", "c.cent")} AS d6
       |  FROM subs s JOIN cents c USING (grp) WHERE s.vec_id % 20 = 0)""".stripMargin

  /** Shared CTE fragments for the covariance-family oracles: scaled first-8
    * dims, upper-triangle product sums, per-dim moment sums. */
  private val covSrcSql =
    """src AS (
      |  SELECT list_transform(list_slice(embedding, 1, 8),
      |    v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS e8
      |  FROM embeddings),
      |p AS (
      |  SELECT i, j, COUNT(*) AS n, SUM(list_extract(e8, i+1) * list_extract(e8, j+1)) AS sxy
      |  FROM src, unnest(range(0, 8)) t(i), unnest(range(0, 8)) u(j)
      |  WHERE j >= i GROUP BY 1, 2),
      |mo AS (
      |  SELECT i, SUM(list_extract(e8, i+1)) AS sx, SUM(list_extract(e8, i+1) * list_extract(e8, i+1)) AS sxx
      |  FROM src, unnest(range(0, 8)) t(i) GROUP BY 1)""".stripMargin

  private def pcaStepSql(k: Int): String =
    s"""w$k AS (SELECT mm.i, SUM(m * x) AS w FROM mm JOIN v${k - 1} ON mm.j = v${k - 1}.i GROUP BY 1),
       |v$k AS (SELECT i,
       |  CASE WHEN w < 0 THEN -(divide((abs(w) * 1000000), (SELECT MAX(abs(w)) FROM w$k)))
       |       ELSE divide((w * 1000000), (SELECT MAX(abs(w)) FROM w$k)) END AS x
       |  FROM w$k)""".stripMargin

  val oracle: Map[String, String] = oracleBase +
    // the at-rest index search must answer byte-identically to the
    // train-inline form — same from-scratch oracle as q_sim_ivf
    ("q_sim_ivf_at_rest" -> oracleBase("q_sim_ivf")) +
    // per-cell occupancy of the from-scratch cells relation (the Spark
    // side reads the at-rest index — same consumer contract)
    ("q_ivf_balance" -> {
      val ivfCells = oracleBase("q_sim_ivf")
        .substring(0, oracleBase("q_sim_ivf").indexOf(",\nprobes AS"))
      s"""$ivfCells,
         |occ AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_vectors FROM cells GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS n_total FROM occ)
         |SELECT CAST(cid AS INTEGER) AS cid, n_vectors, n_total,
         |  round(n_vectors / CAST(n_total AS DOUBLE), 6) AS share,
         |  round(n_vectors * k / CAST(n_total AS DOUBLE), 6) AS load_ratio,
         |  round(pow(n_vectors - CAST(n_total AS DOUBLE) / k, 2)
         |    / (CAST(n_total AS DOUBLE) / k), 6) AS chi2_term,
         |  round(n_vectors * k / CAST(n_total AS DOUBLE), 6) > 2.0 AS overloaded
         |FROM occ CROSS JOIN tot CROSS JOIN kv""".stripMargin
    }) +
    // prefix-cosine brute force per dimension, recall vs the full-dim
    // truth; d=64 is the built-in self-check (recall exactly 1.0)
    ("q_matryoshka_recall" -> {
      val o = oracleBase
      def cosN(a: String, b: String, n: Int): String =
        s"""round(list_sum(list_transform(range(1, ${n + 1}), i -> list_extract($a, i) * list_extract($b, i))) /
           |  (sqrt(list_sum(list_transform(range(1, ${n + 1}), i -> list_extract($a, i) * list_extract($a, i)))) *
           |   sqrt(list_sum(list_transform(range(1, ${n + 1}), i -> list_extract($b, i) * list_extract($b, i))))), 6)""".stripMargin
      def variant(dim: Int, t: String): String =
        s"""sc_$t AS (
           |  SELECT q.vec_id AS q_id, c.vec_id AS c_id, ${cosN("q.ce", "c.ce", dim)} AS cos_r
           |  FROM e q JOIN e c ON q.vec_id % 20 = 0 AND q.vec_id <> c.vec_id),
           |rk_$t AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id,
           |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS rank
           |  FROM sc_$t) WHERE rank <= 5),
           |res_$t AS (SELECT $dim AS dims,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM rk_$t) AS n_returned,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM rk_$t r
           |     JOIN tr ON r.q_id = tr.q_id AND r.c_id = tr.neighbor_id) AS n_hits)""".stripMargin
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
         |tr0 AS (${o("q_sim_topk")}),
         |tr AS (SELECT q_id, neighbor_id FROM tr0),
         |nq AS (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_q FROM tr),
         |${variant(8, "a")},
         |${variant(16, "b")},
         |${variant(32, "c")},
         |${variant(64, "d")}
         |SELECT CAST(dims AS INTEGER) AS dims, nq.n_q AS n_queries,
         |  n_returned, n_hits,
         |  round(CAST(n_hits AS DOUBLE) / (5.0 * nq.n_q), 6) AS recall_at_5
         |FROM (SELECT * FROM res_a UNION ALL SELECT * FROM res_b
         |      UNION ALL SELECT * FROM res_c UNION ALL SELECT * FROM res_d) u
         |CROSS JOIN nq""".stripMargin
    }) +
    // three probe widths over ONE trained index, each recall-checked
    // against the brute-force truth — the band-sweep pattern on IVF
    ("q_ivf_probe_sweep" -> {
      val o = oracleBase
      def variant(n: Int, t: String): String =
        s"""probes_$t AS (
           |  SELECT vec_id AS q_id, ce AS qe, cid FROM (
           |    SELECT e.vec_id, c2.cid, e.ce,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dkCos2("e.ce", "c2.centroid")} DESC, c2.cid) AS rn
           |    FROM e CROSS JOIN c2 WHERE e.vec_id % 20 = 0) WHERE rn <= $n),
           |scored_$t AS (
           |  SELECT q_id, c_id, ${dkCos2("qe", "ce")} AS cos_r
           |  FROM cells JOIN probes_$t USING (cid) WHERE q_id <> c_id),
           |ranked_$t AS (SELECT q_id, c_id FROM (
           |  SELECT q_id, c_id,
           |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS rank
           |  FROM scored_$t) WHERE rank <= 5),
           |res_$t AS (SELECT $n AS nprobe,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM scored_$t) AS n_candidates,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked_$t) AS n_returned,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ranked_$t r
           |     JOIN tr ON r.q_id = tr.q_id AND r.c_id = tr.neighbor_id) AS n_hits)""".stripMargin
      val ivfCells = o("q_sim_ivf")
        .substring(0, o("q_sim_ivf").indexOf(",\nprobes AS"))
      s"""$ivfCells,
         |tr AS (SELECT q_id, neighbor_id FROM (${o("q_sim_topk")})),
         |nq AS (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_q FROM tr),
         |${variant(1, "a")},
         |${variant(2, "b")},
         |${variant(4, "c")}
         |SELECT CAST(nprobe AS INTEGER) AS nprobe, nq.n_q AS n_queries,
         |  n_candidates, n_returned, n_hits,
         |  round(CAST(n_hits AS DOUBLE) / (5.0 * nq.n_q), 6) AS recall_at_5
         |FROM (SELECT * FROM res_a UNION ALL SELECT * FROM res_b
         |      UNION ALL SELECT * FROM res_c) u CROSS JOIN nq""".stripMargin
    }) +
    // each method is individually hash-exact vs its oracle, so the
    // recall matrix's oracle is literally those SQLs composed as CTEs
    ("q_ann_recall_matrix" -> {
      val o = oracleBase
      s"""WITH truth AS (${o("q_sim_topk")}),
         |m_lsh AS (${o("q_sim_ann_lsh")}),
         |m_ivf AS (${o("q_sim_ivf")}),
         |m_sq8 AS (${o("q_sim_sq8")}),
         |m_pq AS (${o("q_sim_pq")}),
         |nq AS (SELECT CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_q FROM truth),
         |u AS (
         |  SELECT 'lsh' AS method, q_id, neighbor_id FROM m_lsh
         |  UNION ALL SELECT 'ivf', q_id, neighbor_id FROM m_ivf
         |  UNION ALL SELECT 'sq8', q_id, neighbor_id FROM m_sq8
         |  UNION ALL SELECT 'pq', q_id, neighbor_id FROM m_pq),
         |h AS (SELECT method, COUNT(*) AS n_returned,
         |    CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |  FROM u LEFT JOIN (SELECT DISTINCT q_id, neighbor_id FROM truth) t
         |    ON u.q_id = t.q_id AND u.neighbor_id = t.neighbor_id
         |  GROUP BY method)
         |SELECT method, n_q AS n_queries, n_returned, n_hits,
         |  round(CAST(n_hits AS DOUBLE) / (5.0 * n_q), 6) AS recall_at_5
         |FROM h CROSS JOIN nq""".stripMargin
    })

  private def oracleBase: Map[String, String] = Map(
    "q_emb_covariance" ->
      s"""WITH $covSrcSql
         |SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j, CAST(n AS BIGINT) AS n,
         |  round(CAST(n * sxy - a.sx * b.sx AS DOUBLE) / n / n / 1e12, 6) AS cov,
         |  round(CAST(n * sxy - a.sx * b.sx AS DOUBLE) /
         |    sqrt(CAST(n * a.sxx - a.sx * a.sx AS DOUBLE)) /
         |    sqrt(CAST(n * b.sxx - b.sx * b.sx AS DOUBLE)), 6) AS corr
         |FROM p JOIN mo a ON p.i = a.i JOIN mo b ON p.j = b.i""".stripMargin,
    "q_pca_power" ->
      s"""WITH $covSrcSql,
         |tri AS (
         |  SELECT p.i, p.j, n * sxy - a.sx * b.sx AS raw, n
         |  FROM p JOIN mo a ON p.i = a.i JOIN mo b ON p.j = b.i),
         |mm AS (
         |  SELECT i, j, CASE WHEN raw < 0 THEN -(divide(abs(raw), n)) ELSE divide(raw, n) END AS m FROM tri
         |  UNION ALL
         |  SELECT j, i, CASE WHEN raw < 0 THEN -(divide(abs(raw), n)) ELSE divide(raw, n) END
         |  FROM tri WHERE i <> j),
         |v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS x FROM range(0, 8) t(i)),
         |${pcaStepSql(1)},
         |${pcaStepSql(2)},
         |${pcaStepSql(3)},
         |mv AS (SELECT mm.i, SUM(m * x) AS w FROM mm JOIN v3 ON mm.j = v3.i GROUP BY 1),
         |ray AS (SELECT SUM(v3.x * mv.w) AS num, SUM(v3.x * v3.x) AS den
         |        FROM v3 JOIN mv ON v3.i = mv.i)
         |SELECT CAST(v3.i AS INTEGER) AS i, CAST(v3.x AS BIGINT) AS v,
         |  CAST(CASE WHEN num < 0 THEN -(divide(abs(num), den)) ELSE divide(num, den) END AS BIGINT) AS lambda
         |FROM v3, ray""".stripMargin,
    "q_embed_project" ->
      """WITH src AS (
        |  SELECT vec_id, list_transform(embedding,
        |    v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS e
        |  FROM embeddings)
        |SELECT vec_id, CAST(k AS INTEGER) AS k,
        |  CAST(SUM(CASE WHEN ((1000003 * k + 7919 * i + 12345) % 97) % 2 = 0
        |           THEN list_extract(e, i+1) ELSE -list_extract(e, i+1) END) AS BIGINT) AS proj
        |FROM src, unnest(range(0, 8)) t(k), unnest(range(0, 64)) u(i)
        |GROUP BY 1, 2""".stripMargin,
    "q_emb_colstats" ->
      """WITH x AS (
        |  SELECT vec_id, CAST(t.i AS INTEGER) AS dim,
        |    CAST(list_extract(embedding, t.i + 1) AS DOUBLE) AS v
        |  FROM embeddings, LATERAL unnest(range(0, len(embedding))) AS t(i)),
        |s AS (
        |  SELECT dim, v,
        |    CAST(round(v * 10000000) AS BIGINT) AS sv
        |  FROM x),
        |g AS (
        |  SELECT dim, COUNT(*) AS n,
        |    SUM(CAST(sv AS HUGEINT)) AS ssum,
        |    SUM(CAST(sv AS HUGEINT) * sv) AS ssq,
        |    round(MIN(v), 6) AS min_v, round(MAX(v), 6) AS max_v
        |  FROM s GROUP BY 1)
        |SELECT dim, n,
        |  round(CAST(ssum AS DOUBLE) / n / 10000000.0, 6) AS mean_v,
        |  round(sqrt(CAST(ssq AS DOUBLE) / n
        |      - (CAST(ssum AS DOUBLE) / n) * (CAST(ssum AS DOUBLE) / n)) / 10000000.0, 6)
        |    AS std_v,
        |  min_v, max_v
        |FROM g""".stripMargin,
    "q_semantic_dedup" ->
      s"""WITH base AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
         |e AS (
         |  SELECT vec_id, ce FROM base
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_transform(range(1, 65), i -> CASE WHEN i <= 4 THEN list_extract(ce, i) + 0.001 ELSE list_extract(ce, i) END)
         |  FROM base WHERE vec_id % 10 = 0),
         |kk AS (
         |  SELECT greatest(8, CAST(divide((COUNT(*) + divide((COUNT(*) + 9), 10) + 1023), 1024) AS INTEGER)) AS k
         |  FROM base),
         |s AS (SELECT vec_id, ce FROM e WHERE vec_id % 8 = 0),
         |c0 AS (
         |  SELECT cid, centroid FROM (
         |    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         |      ce AS centroid FROM s), kk
         |  WHERE cid < k),
         |${dkLloyd("s", "c0", "a1", "m1", "c1")},
         |${dkLloyd("s", "c1", "a2", "m2", "c2")},
         |cells AS (
         |  SELECT vec_id, cid, ce FROM (
         |    SELECT e.vec_id, c2.cid, e.ce,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dkCos2("e.ce", "c2.centroid")} DESC, c2.cid) AS rn
         |    FROM e CROSS JOIN c2) WHERE rn = 1),
         |dups AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE ${dkCos2("a.ce", "b.ce")} >= 0.95)
         |SELECT c.vec_id, c.cid AS cell_id, (d.vec_id IS NOT NULL) AS is_semantic_dup
         |FROM cells c LEFT JOIN dups d ON c.vec_id = d.vec_id""".stripMargin,
    "q_sim_pq" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
         |grps AS (SELECT unnest(range(0, 8)) AS grp),
         |sm AS (SELECT vec_id, ce FROM e WHERE vec_id % 8 = 0),
         |$dkPqTrain,
         |$dkPqEncode,
         |est AS (
         |  SELECT qd.q_id, codes.vec_id AS c_id, SUM(qd.d6) AS e6
         |  FROM codes JOIN qd ON codes.grp = qd.grp AND codes.code = qd.cid
         |    AND codes.vec_id <> qd.q_id
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT q_id, c_id, e6,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY e6, c_id) AS INTEGER) AS rank
         |  FROM est)
         |SELECT r.q_id, r.rank, r.c_id AS neighbor_id,
         |  CAST(r.e6 AS DOUBLE) / 1000000.0 AS est_d2,
         |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> (list_extract(qv.ce, i) - list_extract(cv.ce, i)) * (list_extract(qv.ce, i) - list_extract(cv.ce, i)))),
         |    (acc, x) -> acc + x), 6) AS exact_d2
         |FROM ranked r JOIN e qv ON r.q_id = qv.vec_id JOIN e cv ON r.c_id = cv.vec_id
         |WHERE r.rank <= 5""".stripMargin,
    "q_sim_ivf_pq" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
         |grps AS (SELECT unnest(range(0, 8)) AS grp),
         |sm AS (SELECT vec_id, ce FROM e WHERE vec_id % 8 = 0),
         |${dkIvfSeeds("sm")},
         |${dkLloyd("sm", "c0", "a1", "m1", "c1")},
         |${dkLloyd("sm", "c1", "a2", "m2", "c2")},
         |$dkPqTrain,
         |$dkPqEncode,
         |cells AS (
         |  SELECT vec_id AS c_id, cid FROM (
         |    SELECT e.vec_id, c2.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dkCos2("e.ce", "c2.centroid")} DESC, c2.cid) AS rn
         |    FROM e CROSS JOIN c2) WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, cid FROM (
         |    SELECT e.vec_id, c2.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dkCos2("e.ce", "c2.centroid")} DESC, c2.cid) AS rn
         |    FROM e CROSS JOIN c2 WHERE e.vec_id % 20 = 0) WHERE rn <= 2),
         |cand AS (
         |  SELECT p.q_id, cl.c_id FROM probes p JOIN cells cl USING (cid)
         |  WHERE p.q_id <> cl.c_id),
         |est AS (
         |  SELECT cand.q_id, cand.c_id, SUM(qd.d6) AS e6
         |  FROM cand JOIN codes ON cand.c_id = codes.vec_id
         |    JOIN qd ON qd.q_id = cand.q_id AND qd.grp = codes.grp AND qd.cid = codes.code
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT q_id, c_id, e6,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY e6, c_id) AS INTEGER) AS rank
         |  FROM est)
         |SELECT r.q_id, r.rank, r.c_id AS neighbor_id,
         |  CAST(r.e6 AS DOUBLE) / 1000000.0 AS est_d2,
         |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> (list_extract(qv.ce, i) - list_extract(cv.ce, i)) * (list_extract(qv.ce, i) - list_extract(cv.ce, i)))),
         |    (acc, x) -> acc + x), 6) AS exact_d2
         |FROM ranked r JOIN e qv ON r.q_id = qv.vec_id JOIN e cv ON r.c_id = cv.vec_id
         |WHERE r.rank <= 5""".stripMargin,
    "q_sim_ivf_pq_res" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
         |grps AS (SELECT unnest(range(0, 8)) AS grp),
         |sraw AS (SELECT vec_id, ce FROM e WHERE vec_id % 8 = 0),
         |${dkIvfSeeds("sraw")},
         |${dkLloyd("sraw", "c0", "a1", "m1", "c1")},
         |${dkLloyd("sraw", "c1", "a2", "m2", "c2")},
         |cellsr AS (
         |  SELECT vec_id, cid, list_transform(range(1, 65), i -> list_extract(ce, i) - list_extract(centroid, i)) AS ce
         |  FROM (
         |    SELECT e.vec_id, c2.cid, e.ce, c2.centroid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dkCos2("e.ce", "c2.centroid")} DESC, c2.cid) AS rn
         |    FROM e CROSS JOIN c2) WHERE rn = 1),
         |sm AS (SELECT vec_id, ce FROM cellsr WHERE vec_id % 8 = 0),
         |$dkPqTrain,
         |subs AS (SELECT vec_id, grp, list_slice(ce, grp * 8 + 1, grp * 8 + 8) AS sub FROM cellsr, grps),
         |codes AS (
         |  SELECT vec_id, grp, cid AS code FROM (
         |    SELECT s.vec_id, s.grp, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.grp
         |        ORDER BY ${dkD6("s.sub", "c.cent")}, c.cid) AS rn
         |    FROM subs s JOIN cents c USING (grp)) WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, cid FROM (
         |    SELECT e.vec_id, c2.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dkCos2("e.ce", "c2.centroid")} DESC, c2.cid) AS rn
         |    FROM e CROSS JOIN c2 WHERE e.vec_id % 20 = 0) WHERE rn <= 2),
         |qres AS (
         |  SELECT p.q_id, p.cid, list_transform(range(1, 65), i -> list_extract(e.ce, i) - list_extract(c2.centroid, i)) AS qr
         |  FROM probes p JOIN e ON e.vec_id = p.q_id JOIN c2 ON c2.cid = p.cid),
         |qsubs AS (SELECT q_id, cid, grp, list_slice(qr, grp * 8 + 1, grp * 8 + 8) AS sub FROM qres, grps),
         |qd AS (
         |  SELECT q.q_id, q.cid AS qcell, q.grp, c.cid AS pcid, ${dkD6("q.sub", "c.cent")} AS d6
         |  FROM qsubs q JOIN cents c USING (grp)),
         |cand AS (
         |  SELECT p.q_id, cl.vec_id AS c_id, cid
         |  FROM probes p JOIN cellsr cl USING (cid)
         |  WHERE p.q_id <> cl.vec_id),
         |est AS (
         |  SELECT cand.q_id, cand.c_id, SUM(qd.d6) AS e6
         |  FROM cand JOIN codes ON cand.c_id = codes.vec_id
         |    JOIN qd ON qd.q_id = cand.q_id AND qd.qcell = cand.cid
         |      AND qd.grp = codes.grp AND qd.pcid = codes.code
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT q_id, c_id, e6,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY e6, c_id) AS INTEGER) AS rank
         |  FROM est)
         |SELECT r.q_id, r.rank, r.c_id AS neighbor_id,
         |  CAST(r.e6 AS DOUBLE) / 1000000.0 AS est_d2,
         |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, 65), i -> (list_extract(qv.ce, i) - list_extract(cv.ce, i)) * (list_extract(qv.ce, i) - list_extract(cv.ce, i)))),
         |    (acc, x) -> acc + x), 6) AS exact_d2
         |FROM ranked r JOIN e qv ON r.q_id = qv.vec_id JOIN e cv ON r.c_id = cv.vec_id
         |WHERE r.rank <= 5""".stripMargin,
    // frozen-quantizer identity: train on the HISTORY sample, assign the
    // FULL corpus — equals Spark's standing-index + delta-refresh union
    "q_sim_ivf_incremental" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
         |s AS (SELECT vec_id, ce FROM e WHERE vec_id % 8 = 0 AND vec_id % 10 <> 7),
         |${dkIvfSeeds("s")},
         |${dkLloyd("s", "c0", "a1", "m1", "c1")},
         |${dkLloyd("s", "c1", "a2", "m2", "c2")},
         |cells AS (
         |  SELECT vec_id AS c_id, cid, ce FROM (
         |    SELECT e.vec_id, c2.cid, e.ce,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dkCos2("e.ce", "c2.centroid")} DESC, c2.cid) AS rn
         |    FROM e CROSS JOIN c2) WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, ce AS qe, cid FROM (
         |    SELECT e.vec_id, c2.cid, e.ce,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dkCos2("e.ce", "c2.centroid")} DESC, c2.cid) AS rn
         |    FROM e CROSS JOIN c2 WHERE e.vec_id % 20 = 0) WHERE rn <= 2),
         |scored AS (
         |  SELECT q_id, c_id, ${dkCos2("qe", "ce")} AS cos_r
         |  FROM cells JOIN probes USING (cid) WHERE q_id <> c_id),
         |ranked AS (
         |  SELECT q_id, c_id, cos_r,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT q_id, rank, c_id AS neighbor_id, cos_r AS cosine
         |FROM ranked WHERE rank <= 5""".stripMargin,
    "q_sim_ivf" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
         |s AS (SELECT vec_id, ce FROM e WHERE vec_id % 8 = 0),
         |${dkIvfSeeds("s")},
         |${dkLloyd("s", "c0", "a1", "m1", "c1")},
         |${dkLloyd("s", "c1", "a2", "m2", "c2")},
         |cells AS (
         |  SELECT vec_id AS c_id, cid, ce FROM (
         |    SELECT e.vec_id, c2.cid, e.ce,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dkCos2("e.ce", "c2.centroid")} DESC, c2.cid) AS rn
         |    FROM e CROSS JOIN c2) WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS q_id, ce AS qe, cid FROM (
         |    SELECT e.vec_id, c2.cid, e.ce,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dkCos2("e.ce", "c2.centroid")} DESC, c2.cid) AS rn
         |    FROM e CROSS JOIN c2 WHERE e.vec_id % 20 = 0) WHERE rn <= 2),
         |scored AS (
         |  SELECT q_id, c_id, ${dkCos2("qe", "ce")} AS cos_r
         |  FROM cells JOIN probes USING (cid) WHERE q_id <> c_id),
         |ranked AS (
         |  SELECT q_id, c_id, cos_r,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT q_id, rank, c_id AS neighbor_id, cos_r AS cosine
         |FROM ranked WHERE rank <= 5""".stripMargin,
    "q_sim_ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
         |bv AS (SELECT GREATEST(4, LEAST(12,
         |    CAST(LENGTH(BIN(COUNT(*) - 1)) AS INTEGER) - 2)) AS bits FROM e),
         |coded AS (
         |  SELECT vec_id, band, list_sum(list_transform(range(0, bits),
         |    j -> CASE WHEN ${dkPlane("band * bits + j")} >= 0
         |         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS code
         |  FROM (SELECT vec_id, ce, unnest(list_value(0, 1, 2, 3)) AS band FROM e) CROSS JOIN bv),
         |probes AS (
         |  SELECT vec_id AS q_id, band,
         |    unnest(list_prepend(code, list_transform(range(0, bits),
         |      j -> xor(code, CAST(1 AS BIGINT) << j)))) AS probe
         |  FROM coded CROSS JOIN bv WHERE vec_id % 20 = 0),
         |cand AS (
         |  SELECT DISTINCT p.q_id, c.vec_id AS c_id
         |  FROM probes p JOIN coded c ON p.band = c.band AND p.probe = c.code AND p.q_id <> c.vec_id),
         |scored AS (
         |  SELECT q_id, c_id, ${dkCos2("qe", "ce")} AS cos_r
         |  FROM cand JOIN (SELECT vec_id, ce AS qe FROM e) qv ON q_id = qv.vec_id
         |  JOIN (SELECT vec_id, ce FROM e) cv ON c_id = cv.vec_id),
         |ranked AS (SELECT q_id, c_id, cos_r,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT q_id, rank, c_id AS neighbor_id, cos_r AS cosine
         |FROM ranked WHERE rank <= 5""".stripMargin,
    "q_sim_neardup_pairs" ->
      s"""WITH base AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
         |corpus AS (
         |  SELECT vec_id, ce FROM base
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_transform(range(1, 65), i -> CASE WHEN i <= 4 THEN list_extract(ce, i) + 0.001 ELSE list_extract(ce, i) END)
         |  FROM base WHERE vec_id % 10 = 0),
         |bv AS (SELECT GREATEST(4, LEAST(12,
         |    CAST(LENGTH(BIN(COUNT(*) + divide((COUNT(*) + 9), 10) - 1)) AS INTEGER) - 2)) AS bits
         |  FROM base),
         |coded AS (
         |  SELECT vec_id, band, list_sum(list_transform(range(0, bits),
         |    j -> CASE WHEN ${dkPlane("band * bits + j")} >= 0
         |         THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS code
         |  FROM (SELECT vec_id, ce, unnest(list_value(0, 1, 2, 3)) AS band FROM corpus) CROSS JOIN bv),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM coded a JOIN coded b ON a.band = b.band AND a.code = b.code AND a.vec_id < b.vec_id),
         |scored AS (
         |  SELECT a_id, b_id, $dkCos AS cosine
         |  FROM cand JOIN (SELECT vec_id, ce AS qe FROM corpus) va ON a_id = va.vec_id
         |  JOIN (SELECT vec_id, ce FROM corpus) vb ON b_id = vb.vec_id)
         |SELECT a_id, b_id, cosine FROM scored WHERE cosine >= 0.95""".stripMargin,
    "q_sim_mips" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS emb FROM embeddings),
        |m AS (SELECT MAX(list_sum(list_transform(range(1, 65), i -> list_extract(emb, i) * list_extract(emb, i)))) AS m2 FROM e),
        |c AS (
        |  SELECT vec_id AS c_id, emb AS cemb,
        |    list_append(emb,
        |      sqrt(m2 - list_sum(list_transform(range(1, 65), i -> list_extract(emb, i) * list_extract(emb, i))))) AS ce
        |  FROM e, m),
        |q AS (SELECT vec_id AS q_id, emb AS qemb,
        |    list_append(emb, CAST(0 AS DOUBLE)) AS qe
        |  FROM e WHERE vec_id % 20 = 0),
        |scored AS (
        |  SELECT q_id, c_id, qemb, cemb,
        |    round(
        |      list_sum(list_transform(range(1, 66), i -> list_extract(qe, i) * list_extract(ce, i))) /
        |      (sqrt(list_sum(list_transform(range(1, 66), i -> list_extract(qe, i) * list_extract(qe, i)))) *
        |       sqrt(list_sum(list_transform(range(1, 66), i -> list_extract(ce, i) * list_extract(ce, i))))), 6) AS cos_aug
        |  FROM q JOIN c ON q_id <> c_id),
        |ranked AS (
        |  SELECT q_id, c_id, qemb, cemb,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_aug DESC, c_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, rank, c_id AS neighbor_id,
        |  round(list_sum(list_transform(range(1, 65), i -> list_extract(qemb, i) * list_extract(cemb, i))), 6) AS ip
        |FROM ranked WHERE rank <= 5""".stripMargin,
    "q_ndcg_eval" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
        |dm AS (SELECT i, MIN(list_extract(ce, i)) AS mn, MAX(list_extract(ce, i)) AS mx
        |       FROM e, range(1, 65) t(i) GROUP BY i),
        |mm AS (SELECT list_transform(list_sort(list(list_value(CAST(i AS DOUBLE), mn))), pr -> list_extract(pr, 2)) AS mns, list_transform(list_sort(list(list_value(CAST(i AS DOUBLE), mx))), pr -> list_extract(pr, 2)) AS mxs FROM dm),
        |coded AS (SELECT vec_id, ce,
        |    list_transform(range(1, 65),
        |      i -> CASE WHEN list_extract(mxs, i) = list_extract(mns, i) THEN CAST(0 AS BIGINT) ELSE CAST(floor((list_extract(ce, i) - (list_extract(mns, i) + list_extract(mxs, i)) / 2) * 255 / (list_extract(mxs, i) - list_extract(mns, i)) + 0.5) AS BIGINT) END) AS code
        |  FROM e CROSS JOIN mm),
        |j AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(list_sum(list_transform(range(1, 65), i -> list_extract(q.code, i) * list_extract(c.code, i))) AS BIGINT) AS ip8,
        |    round(
        |      list_sum(list_transform(range(1, 65), i -> list_extract(q.ce, i) * list_extract(c.ce, i))) /
        |      (sqrt(list_sum(list_transform(range(1, 65), i -> list_extract(q.ce, i) * list_extract(q.ce, i)))) *
        |       sqrt(list_sum(list_transform(range(1, 65), i -> list_extract(c.ce, i) * list_extract(c.ce, i))))), 6) AS cos_r
        |  FROM coded q JOIN coded c ON q.vec_id % 20 = 0 AND q.vec_id <> c.vec_id),
        |r AS (
        |  SELECT q_id, c_id, ip8, cos_r,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ip8 DESC, c_id) AS pred_pos,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS true_rank
        |  FROM j),
        |t AS (
        |  SELECT q_id,
        |    CAST(SUM(CASE WHEN true_rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |    list_sort(list(list_value(CAST(pred_pos AS BIGINT),
        |      CAST(GREATEST(0, 11 - true_rank) AS BIGINT)))) AS pr
        |  FROM r WHERE pred_pos <= 10 GROUP BY 1)
        |SELECT q_id, n_hits,
        |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(pr, x -> CAST(list_extract(x, 2) AS DOUBLE) / log2(CAST(list_extract(x, 1) + 1 AS DOUBLE)))),
        |      (a, b) -> a + b)
        |    / list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(range(1, 11), g -> CAST(11 - g AS DOUBLE) / log2(CAST(g + 1 AS DOUBLE)))),
        |      (a, b) -> a + b), 6) AS ndcg
        |FROM t""".stripMargin,
    "q_sim_sq8" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS ce FROM embeddings),
         |dm AS (SELECT i, MIN(list_extract(ce, i)) AS mn, MAX(list_extract(ce, i)) AS mx
         |       FROM e, range(1, 65) t(i) GROUP BY i),
         |mm AS (SELECT list_transform(list_sort(list(list_value(CAST(i AS DOUBLE), mn))), pr -> list_extract(pr, 2)) AS mns, list_transform(list_sort(list(list_value(CAST(i AS DOUBLE), mx))), pr -> list_extract(pr, 2)) AS mxs FROM dm),
         |coded AS (SELECT vec_id, ce,
         |    list_transform(range(1, 65),
         |      i -> CASE WHEN list_extract(mxs, i) = list_extract(mns, i) THEN CAST(0 AS BIGINT) ELSE CAST(floor((list_extract(ce, i) - (list_extract(mns, i) + list_extract(mxs, i)) / 2) * 255 / (list_extract(mxs, i) - list_extract(mns, i)) + 0.5) AS BIGINT) END) AS code
         |  FROM e CROSS JOIN mm),
         |est AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    CAST(list_sum(list_transform(range(1, 65), i -> list_extract(q.code, i) * list_extract(c.code, i))) AS BIGINT) AS ip8,
         |    q.ce AS qe2, c.ce AS ce2
         |  FROM coded q JOIN coded c ON q.vec_id % 20 = 0 AND q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT q_id, c_id, ip8, qe2, ce2,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ip8 DESC, c_id) AS INTEGER) AS rank
         |  FROM est)
         |SELECT q_id, rank, c_id AS neighbor_id, ip8,
         |  ${dkCos2("qe2", "ce2")} AS cosine
         |FROM ranked WHERE rank <= 5""".stripMargin,
    // the FULL from-scratch recompute: equality proves the incremental
    // merge (stored top-5 ∪ batch scores) loses nothing
    "q_sim_topk_incremental" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe FROM e WHERE vec_id % 20 = 0),
        |c AS (SELECT vec_id AS c_id, emb AS ce FROM e),
        |scored AS (
        |  SELECT q_id, c_id,
        |    round(
        |      list_sum(list_transform(range(1, 65), i -> list_extract(qe, i) * list_extract(ce, i))) /
        |      (sqrt(list_sum(list_transform(range(1, 65), i -> list_extract(qe, i) * list_extract(qe, i)))) *
        |       sqrt(list_sum(list_transform(range(1, 65), i -> list_extract(ce, i) * list_extract(ce, i))))), 6) AS cos_r
        |  FROM q JOIN c ON q_id <> c_id),
        |ranked AS (
        |  SELECT q_id, c_id, cos_r,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, rank, c_id AS neighbor_id, cos_r AS cosine,
        |  c_id % 10 = 0 AS from_batch
        |FROM ranked WHERE rank <= 5""".stripMargin,
    "q_silhouette" ->
      """WITH p AS (
        |  SELECT vec_id, label, i - 1 AS dim,
        |    CAST(round(CAST(list_extract(embedding, i) AS DOUBLE) * 10000000) AS BIGINT) AS sv
        |  FROM embeddings, LATERAL unnest(range(1, 65)) AS t(i)),
        |cent AS (SELECT label AS c, dim, CAST(SUM(sv) AS BIGINT) AS csum, COUNT(*) AS nc
        |  FROM p GROUP BY 1, 2),
        |j AS (SELECT p.vec_id, p.label, c.c, c.nc, (c.nc * p.sv - c.csum) AS t
        |  FROM p JOIN cent c USING (dim)),
        |d AS (SELECT vec_id, label, c, nc, SUM(CAST(t AS DECIMAL(38,0)) * t) AS d2s
        |  FROM j GROUP BY 1, 2, 3, 4),
        |dd AS (SELECT vec_id, label, c, CAST(d2s AS DOUBLE) / nc / nc AS dist2 FROM d),
        |ab AS (SELECT vec_id, label,
        |    MIN(CASE WHEN c = label THEN dist2 END) AS a2,
        |    MIN(CASE WHEN c <> label THEN dist2 END) AS b2
        |  FROM dd GROUP BY 1, 2),
        |sl AS (SELECT vec_id, label,
        |    CASE WHEN greatest(a2, b2) = 0 THEN 0.0
        |      ELSE round((sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)), 6) END AS sil
        |  FROM ab)
        |SELECT label, COUNT(*) AS n_vecs,
        |  round(CAST(CAST(SUM(CAST(round(sil * 1000000) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |    / COUNT(*) / 1000000.0, 6) AS mean_sil,
        |  CAST(SUM(CASE WHEN sil > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_separated
        |FROM sl GROUP BY 1""".stripMargin,
    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS emb, label FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe, label AS q_label FROM e WHERE vec_id % 25 = 0),
        |c AS (SELECT vec_id AS c_id, emb AS ce, label AS neg_label FROM e),
        |scored AS (
        |  SELECT q_id, q_label, c_id, neg_label,
        |    round(
        |      list_sum(list_transform(range(1, 65), i -> list_extract(qe, i) * list_extract(ce, i))) /
        |      (sqrt(list_sum(list_transform(range(1, 65), i -> list_extract(qe, i) * list_extract(qe, i)))) *
        |       sqrt(list_sum(list_transform(range(1, 65), i -> list_extract(ce, i) * list_extract(ce, i))))), 6) AS cos_r
        |  FROM q JOIN c ON q_label <> neg_label),
        |ranked AS (
        |  SELECT q_id, q_label, c_id, neg_label, cos_r,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, q_label, rank, c_id, neg_label, cos_r AS cosine
        |FROM ranked WHERE rank <= 5""".stripMargin,
    "q_sim_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS emb FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe FROM e WHERE vec_id % 20 = 0),
        |c AS (SELECT vec_id AS c_id, emb AS ce FROM e),
        |scored AS (
        |  SELECT q_id, c_id,
        |    round(
        |      list_sum(list_transform(range(1, 65), i -> list_extract(qe, i) * list_extract(ce, i))) /
        |      (sqrt(list_sum(list_transform(range(1, 65), i -> list_extract(qe, i) * list_extract(qe, i)))) *
        |       sqrt(list_sum(list_transform(range(1, 65), i -> list_extract(ce, i) * list_extract(ce, i))))), 6) AS cos_r
        |  FROM q JOIN c ON q_id <> c_id),
        |ranked AS (
        |  SELECT q_id, c_id, cos_r,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, rank, c_id AS neighbor_id, cos_r AS cosine
        |FROM ranked WHERE rank <= 5""".stripMargin,
    "q_mmr_diversify" -> mmrOracle,
    "q_knn_classify" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS emb, label FROM embeddings),
         |q AS (SELECT vec_id AS q_id, emb AS qe, label AS true_label FROM e WHERE vec_id % 20 = 0),
         |c AS (SELECT vec_id AS c_id, emb AS ce, label AS pred_label FROM e WHERE vec_id % 20 <> 0),
         |scored AS (
         |  SELECT q_id, true_label, c_id, pred_label, $dkCos AS cos_r
         |  FROM q CROSS JOIN c),
         |ranked AS (
         |  SELECT q_id, true_label, c_id, pred_label, cos_r,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS rank
         |  FROM scored),
         |votes AS (
         |  SELECT q_id, true_label, pred_label, COUNT(*) AS votes
         |  FROM ranked WHERE rank <= 10 GROUP BY 1, 2, 3),
         |best AS (
         |  SELECT q_id, true_label, pred_label, votes,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY votes DESC, pred_label) AS vr
         |  FROM votes)
         |SELECT q_id, true_label, pred_label, votes, pred_label = true_label AS correct
         |FROM best WHERE vr = 1""".stripMargin,
    "q_knn_confusion" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, tav -> CAST(tav AS DOUBLE)) AS emb, label FROM embeddings),
         |q AS (SELECT vec_id AS q_id, emb AS qe, label AS true_label FROM e WHERE vec_id % 20 = 0),
         |c AS (SELECT vec_id AS c_id, emb AS ce, label AS pred_label FROM e WHERE vec_id % 20 <> 0),
         |scored AS (
         |  SELECT q_id, true_label, c_id, pred_label, $dkCos AS cos_r
         |  FROM q CROSS JOIN c),
         |ranked AS (
         |  SELECT q_id, true_label, c_id, pred_label, cos_r,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_r DESC, c_id) AS rank
         |  FROM scored),
         |votes AS (
         |  SELECT q_id, true_label, pred_label, COUNT(*) AS votes
         |  FROM ranked WHERE rank <= 10 GROUP BY 1, 2, 3),
         |best AS (
         |  SELECT q_id, true_label, pred_label, votes,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY votes DESC, pred_label) AS vr
         |  FROM votes),
         |p AS (SELECT q_id, true_label, pred_label,
         |    pred_label = true_label AS correct FROM best WHERE vr = 1),
         |bt AS (SELECT true_label AS label, COUNT(*) AS n_true,
         |    CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS tp
         |  FROM p GROUP BY 1),
         |bp AS (SELECT pred_label AS label, COUNT(*) AS n_pred FROM p GROUP BY 1),
         |j AS (
         |  SELECT COALESCE(bt.label, bp.label) AS label,
         |    COALESCE(n_true, 0) AS n_true, COALESCE(n_pred, 0) AS n_pred,
         |    COALESCE(tp, 0) AS tp
         |  FROM bt FULL OUTER JOIN bp ON bt.label = bp.label)
         |SELECT label, n_true, n_pred, tp,
         |  CASE WHEN n_pred > 0 THEN round(CAST(tp AS DOUBLE) / n_pred, 6) END AS precision,
         |  CASE WHEN n_true > 0 THEN round(CAST(tp AS DOUBLE) / n_true, 6) END AS recall,
         |  CASE WHEN n_pred + n_true > 0 THEN round(CAST(2 * tp AS DOUBLE) / (n_pred + n_true), 6) END AS f1
         |FROM j""".stripMargin)
}
