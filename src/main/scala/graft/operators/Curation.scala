package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline — the 100 TB use case
  * the individual operators exist for, composed into one dataflow:
  *
  *   raw corpus → quality gate → language gate → exact dedup →
  *   MinHash-LSH near-dup removal → surviving-corpus stats
  *
  * run over the derived corpus with injected exact/near duplicates (see
  * [[Dedup.corpus]]) so every stage removes real rows. The output is
  * the funnel: row counts after each stage plus the surviving token
  * mass — the numbers a data-curation run reports.
  *
  * Determinism/oracle notes: the quality and language gates use
  * integer-exact comparisons (2·stopwords ≤ words; en-marker count > 0),
  * exact dedup keeps min doc_id per md5, and near-dup removal drops the
  * HIGHER id of each verified LSH pair computed AMONG the survivors of
  * the earlier stages — all reproduced verbatim in the DuckDB oracle
  * (shared SQL fragments with the Dedup/TextAnalysis oracles).
  *
  * Scale shape: gates are map-side; exact dedup is one hash shuffle;
  * LSH is the banded equi-join (never all-pairs); the funnel aggregates
  * are single-row.
  */
object Curation {

  /** Map-side quality + language gates over a (doc_id, text) relation —
    * pure per-row expressions, so the SAME builder runs in a batch scan
    * or a structured stream (StreamingSpec proves the latter). */
  private[graft] def gateFlags(docs: DataFrame): DataFrame = {
    val stopList = TextAnalysis.inList(TextAnalysis.stopEn)
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_words", size(col("words")))
      .withColumn("n_stop", expr(s"size(filter(words, w -> w IN $stopList))"))
      // quality: long enough and not stopword-soup (integer-exact)
      .withColumn("pass_quality", col("n_words") >= 20 && col("n_stop") * 2 <= col("n_words"))
      // language: english markers present
      .withColumn("pass_lang", col("n_stop") > 0)
  }

  def qCurationPipeline(s: SparkSession, d: String): DataFrame = {
    val flagged = gateFlags(Dedup.corpus(s, d))
    val s1 = flagged.filter(col("pass_quality") && col("pass_lang"))
    // exact dedup among survivors: keep the lowest doc_id per content hash.
    // s2 (the gated, exact-deduped corpus) feeds THREE downstream branches
    // — the signature build, the a2 count, and the a3 survivor aggregate —
    // so it is persisted; without the cache each branch re-runs the gate +
    // window-dedup lineage, i.e. two redundant passes over the gated
    // corpus at 100 TB. Released by the harness via CacheTracker once the
    // funnel row materializes.
    val s2 = graft.CacheTracker.track(
      s1.withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
        .filter(col("doc_id") === col("keep_id"))
        .select(col("doc_id"), col("text"), col("n_words"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // near-dup removal among the exact-deduped survivors: verified LSH
    // pairs (jaccard >= 0.5) drop their higher id
    // persisted cache outlives the builder — released via CacheTracker
    // by the harness once the funnel row materializes
    val sigs = graft.CacheTracker.track(Dedup.withSignature(s2)
      .select(col("doc_id"), col("sig"), array_distinct(col("shingles")).as("sset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // banding + candidate join + exact-Jaccard verify are the SHARED
    // Dedup pipeline tail (band geometry and threshold are tracked in
    // Dedup.LshIndexParams for index invalidation — a hand-copied
    // variant here would have to be mirrored on every tuning change or
    // the funnel would silently drop a different pair set)
    val drops = Dedup.lshPairsFrom(sigs).select(col("b_id")).distinct()
    val s3 = s2.join(drops, col("doc_id") === col("b_id"), "left_anti")
    // the funnel
    val a1 = flagged.agg(
      count(lit(1)).as("n_total"),
      sum(when(col("pass_quality"), 1).otherwise(0)).cast("long").as("n_quality"),
      sum(when(col("pass_quality") && col("pass_lang"), 1).otherwise(0)).cast("long").as("n_lang"))
    val a2 = s2.agg(count(lit(1)).as("n_exact"))
    val a3 = s3.agg(count(lit(1)).as("n_final"),
      sum(col("n_words")).cast("long").as("final_ws_tokens"))
    a1.crossJoin(a2).crossJoin(a3)
  }

  /** Quality-weighted deterministic downsampling — the corpus-balancing
    * step after gating: high-quality docs kept at ~90%, the rest at
    * ~10%, selected by an md5 bucket of doc_id (NOT rand(): every
    * engine, run, and partitioning keeps the SAME docs — reproducible
    * training sets). Map-side gate + map-side keep decision + one tiny
    * grouped aggregate. */
  /** Easy-to-hard curriculum schedule over LM difficulty: every document
    * is scored by the char-gram cross-entropy of [[TextAnalysis
    * .qLmPerplexity]] (low xent = predictable = easy), split into four
    * curriculum stages at the xent quartiles, and each stage reports its
    * doc count, gram budget, and difficulty band — the schedule a
    * curriculum-learning pretraining run feeds its sampler.
    *
    * Stage boundaries use the range-partitioned boundary-extraction
    * idiom (zipWithIndex over (xent, doc_id) order — no global sort
    * window); per-stage spreads are min/max, which are order-insensitive
    * doubles, so the output hash-matches without a sorted fold.
    *
    * Scale shape: the perplexity scorer's own broadcast-model plan, one
    * boundary pass, then a map-side stage assignment into a 4-row
    * aggregate. */
  def qCurriculumSchedule(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // scores come off the at-rest LM index (built once per corpus
    // fingerprint) — the curriculum planner never re-trains the LM; the
    // oracle stays the from-scratch pipeline, proving the index path
    val px = graft.CacheTracker.track(
      TextAnalysis.lmXentAtRest(s, d).select(col("doc_id"), col("n_grams"), col("xent"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = px.count()
    val targets = (1 to 3).map(k => k * n / 4 - 1).toSet
    val bs = px.repartitionByRange(s.sessionState.conf.numShufflePartitions,
        col("xent").asc, col("doc_id").asc)
      .sortWithinPartitions(col("xent").asc, col("doc_id").asc)
      .select(col("xent")).as[Double].rdd
      .zipWithIndex()
      .filter { case (_, i) => targets.contains(i) }
      .map(_._1).collect().sorted.toSeq
    val stage = bs.foldLeft(lit(1)) { (acc, b) =>
      acc + when(col("xent") > lit(b), 1).otherwise(0) }
    px.withColumn("stage", stage.cast("int"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_grams").cast("long").as("n_grams_total"),
        min("xent").as("xent_min"), max("xent").as("xent_max"))
  }

  def qWeightedSample(s: SparkSession, d: String): DataFrame = {
    val bucket = // 16-bit md5 bucket of the doc id, uniform on [0, 65536)
      expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)")
    gateFlags(Tables.documents(s, d).select(col("doc_id"), col("text")))
      .withColumn("keep_rate",
        when(col("pass_quality") && col("pass_lang"), 58982L).otherwise(6554L))
      .withColumn("kept", bucket < col("keep_rate"))
      .groupBy("pass_quality", "pass_lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1).otherwise(0)).cast("long").as("n_kept"),
        sum(when(col("kept"), col("n_words")).otherwise(0)).cast("long").as("kept_words"))
  }

  /** Temperature-based mixture resampling (the multilingual-pretraining
    * α-sampling of XLM-R/mT5, α = 0.5): rebalance per-source shares
    * toward p^α by DOWNSAMPLING — keep rate r_s = √(n_min/n_s), the
    * α = 0.5 closed form where the smallest source keeps everything and
    * larger sources shed proportionally more. The per-doc keep decision
    * is the deterministic md5-bucket coin of qWeightedSample (never
    * rand(): same kept set on every engine/run/partitioning).
    *
    * Scale shape: one tiny groupBy for source counts, the rate table
    * (|sources| rows) broadcasts, and the keep pass is map-side — the
    * corpus is scanned twice and shuffled never (the final audit
    * aggregate is |sources| rows). */
  def qMixTemperature(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
    val rates = counts
      .withColumn("n_min", min(col("n_src")).over(Window.partitionBy(lit(1))))
      .withColumn("keep_rate", round(sqrt(col("n_min").cast("double") / col("n_src")), 6))
      .withColumn("thresh", expr("CAST(round(keep_rate * 65536) AS BIGINT)"))
      .select("source", "keep_rate", "thresh")
    val bucket = // 16-bit md5 bucket of the doc id, uniform on [0, 65536)
      expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)")
    docs.join(broadcast(rates), "source")
      .withColumn("kept", bucket < col("thresh"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), max(col("keep_rate")).as("keep_rate"),
        sum(when(col("kept"), 1).otherwise(0)).cast("long").as("n_kept"))
  }

  /** Greedy sequence packing for pretraining batches: documents
    * concatenate in doc_id order within each source shard and split
    * into fixed 2048-token context windows; a document is attributed to
    * the window its first token lands in. The per-window stats audit
    * packing efficiency (docs per window, fill).
    *
    * Scale shape: ONE window function partitioned by shard — packing is
    * per-shard by construction, so there is never a global sort; at
    * 100 TB the shard key is the file/source partition the data already
    * lives in. */
  def qSeqPack(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .withColumn("n_tok", size(split(col("text"), " ")))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin_id", expr("(cum - n_tok) div 2048"))
      .groupBy("source", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").cast("long").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  /** Stratified train/validation/test split — the held-out-set stage:
    * within every language stratum, docs land in train/val/test at
    * 80/10/10 by the same deterministic md5 coin as the samplers (a doc
    * NEVER migrates between splits when the corpus grows — adding data
    * never contaminates yesterday's test set, which a rank-based exact
    * split cannot promise). Map-side assignment + one tiny grouped
    * audit; the per-stratum totals ride a window over the |lang×split|
    * aggregate, not the corpus. */
  /** The hash-coin split assignment (md5 bucket % 100 → 80/10/10) — the
    * ONE definition shared by the split producer ([[qSplitStratified]])
    * and its audits ([[qSplitLeakage]], [[qSplitRepair]]): hand-copied
    * thresholds would let the audits silently measure a different split
    * than the one actually shipped. */
  private def splitOf: org.apache.spark.sql.Column = {
    val bucket =
      expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % 100")
    when(bucket < 80, "train").when(bucket < 90, "validation").otherwise("test")
  }

  def qSplitStratified(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .withColumn("split", splitOf)
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("lang_total", sum("n_docs").over(Window.partitionBy("lang")))
      .select(col("lang"), col("split"), col("n_docs"), col("lang_total"),
        round(col("n_docs").cast("double") / col("lang_total"), 6).as("frac"))
  }

  /** Deterministic training-shard layout — the final write stage of the
    * pipeline: every doc is assigned to one of 16 shards by an md5
    * bucket and ordered WITHIN its shard by the full md5 (a
    * reproducible global shuffle of the training order, computed
    * without any global sort: the only exchange is the shard-keyed
    * partitioning and each shard orders independently — at 100 TB this
    * is repartition(shard) + sortWithinPartitions, embarrassingly
    * parallel across shards). */
  def qShardLayout(s: SparkSession, d: String): DataFrame = {
    val wdw = Window.partitionBy("shard_id").orderBy(col("h"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("shard_id", expr("CAST(conv(substring(h, 1, 4), 16, 10) AS BIGINT) % 16"))
      .withColumn("pos", row_number().over(wdw))
      .select("doc_id", "shard_id", "pos")
  }

  /** Z-order (Morton) layout — the multi-dimensional clustering pass a
    * lakehouse `OPTIMIZE ZORDER BY (size, lang)` runs before writing
    * files: two 8-bit keys (a coarse document-size bucket and an md5
    * bucket of lang) bit-interleave into one 16-bit Morton code, and
    * `repartitionByRange(z)` + `sortWithinPartitions(z)` makes every
    * output file a contiguous Morton RANGE — i.e. clustered in BOTH
    * dimensions at once, so parquet min/max footer stats prune scans
    * filtered on either column (not just the leading sort key, the
    * failure mode of lexicographic layout). The interleave itself is a
    * pure built-in-function fold (codegen'd; no UDF). The audit groups
    * by the 256 top-level Morton cells and shows each cell is tight in
    * both dimensions; ZorderSpec proves the written layout has
    * non-overlapping per-partition z ranges. */
  def qZorderLayout(s: SparkSession, d: String): DataFrame = {
    val z = zorderCode(s, d)
    z.groupBy(col("zcell"))
      .agg(count(lit(1)).as("n_docs"),
        min("z").cast("long").as("z_min"), max("z").cast("long").as("z_max"),
        min("xb").cast("long").as("x_min"), max("xb").cast("long").as("x_max"),
        min("yb").cast("long").as("y_min"), max("yb").cast("long").as("y_max"),
        countDistinct("lang").as("n_langs"))
  }

  /** doc_id + the two 8-bit layout keys + the interleaved Morton code;
    * the writer path ZorderSpec exercises is
    * `zorderCode(...).repartitionByRange(col("z")).sortWithinPartitions("z")`. */
  private[graft] def zorderCode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("xb", least(floor(col("n_chars") / 64), lit(255)).cast("long"))
      .withColumn("yb", expr("CAST(conv(substring(md5(lang), 1, 2), 16, 10) AS BIGINT)"))
      .withColumn("z", expr(
        """aggregate(sequence(0, 7), CAST(0 AS BIGINT),
          |  (acc, i) -> acc + shiftleft(shiftright(xb, i) & 1, 2 * i)
          |                 + shiftleft(shiftright(yb, i) & 1, 2 * i + 1))""".stripMargin))
      .withColumn("zcell", (col("z") / 256).cast("long"))
      .select("doc_id", "lang", "xb", "yb", "z", "zcell")

  /** k-anonymity audit over quasi-identifiers (lang, source, coarse
    * length bucket) — the release-safety check that complements the
    * direct-identifier PII scrub (q_pii_scrub): a document whose
    * quasi-identifier cell has k < 5 peers is re-identifiable by
    * intersection even with PII removed. Reports each cell's k, its
    * risk flag, and the k after one generalization step (length bucket
    * coarsened 4×) — the ladder a disclosure-control pipeline climbs
    * until every cell clears the threshold.
    *
    * Scale shape: one map-side-combined aggregate over the corpus to
    * cell granularity; the generalized k is a window SUM over the
    * tiny cell relation (cells ≤ langs·sources·buckets), no second
    * corpus pass. All integers — hash-exact. */
  def qKAnon(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 200").as("len_bucket"))
      .agg(count(lit(1)).as("k"))
    val wGen = Window.partitionBy(col("lang"), col("source"),
      expr("len_bucket div 4"))
    cells
      .withColumn("gen_bucket", expr("len_bucket div 4"))
      .withColumn("k_gen", sum("k").over(wGen))
      .select(col("lang"), col("source"), col("len_bucket"), col("k"),
        (col("k") < 5).as("at_risk"),
        col("gen_bucket"), col("k_gen"),
        (col("k_gen") < 5).as("at_risk_after"))
  }

  /** Train/validation/test LEAKAGE audit — the reason q_split_stratified
    * splits by a content-independent coin still isn't enough: two
    * NEAR-DUPLICATE documents can land in different splits, and a test
    * answer the model saw in train is contamination (the
    * split-boundary face of q_decontaminate). Composes the split
    * assignment with the LSH near-dup pair pipeline over the raw
    * document table and reports the pair count per (split, split) cell
    * — off-diagonal cells ARE the leaks — plus each cell's share of
    * all near-dup pairs.
    *
    * Scale shape: the pair side is the banded LSH join (never
    * all-pairs); the split coin is map-side md5; the matrix is a ≤9-cell
    * aggregate. */
  def qSplitLeakage(s: SparkSession, d: String): DataFrame = {
    // pair side: the AT-REST index restricted to real doc ids (the
    // restriction identity documented at Dedup.realPairsAtRest) — a
    // bare parquet scan instead of re-running signature+banding+verify
    val pairs = Dedup.realPairsAtRest(s, d)
    val split = Tables.documents(s, d).select(col("doc_id"), splitOf.as("split"))
    val cells = pairs
      .join(split.select(col("doc_id").as("a_id"), col("split").as("sp_a")), "a_id")
      .join(split.select(col("doc_id").as("b_id"), col("split").as("sp_b")), "b_id")
      .select(least(col("sp_a"), col("sp_b")).as("split_a"),
        greatest(col("sp_a"), col("sp_b")).as("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
    cells
      .withColumn("n_total", sum("n_pairs").over(Window.partitionBy(lit(1))))
      .select(col("split_a"), col("split_b"), col("n_pairs"),
        (col("split_a") =!= col("split_b")).as("is_leak"),
        round(col("n_pairs").cast("double") / col("n_total"), 6).as("pair_share"))
  }

  /** LEAK-FREE SPLIT REPAIR — the execute-and-prove fix for what
    * q_split_leakage only *measures*: near-dup pairs straddling
    * train/validation/test leak evaluation signal, and the standard
    * remedy is CLUSTER-LEVEL assignment — every near-dup cluster moves
    * wholesale to one split (here: the original split of the cluster's
    * canonical min-id member — deterministic, and biased toward train
    * only as much as the hash assignment was). Unclustered documents
    * keep their hash split. The output is the per-split audit (before /
    * after counts, docs moved in/out) plus the PROOF column: post-repair
    * cross-split pair count — structurally zero, because every pair is
    * intra-cluster by the definition of connectivity, and clusters are
    * split-atomic after repair.
    *
    * Scale shape: the pair stage is a bare scan of the at-rest pair
    * index (restricted to real ids — Dedup.realPairsAtRest's
    * restriction identity), clustering is the O(log²n)-round CC already
    * used by the dedup family, and the repair itself is two doc-keyed
    * joins + split-keyed aggregates — no step is quadratic and nothing
    * beyond cluster labels is ever driver-side. */
  def qSplitRepair(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val pairs = Dedup.realPairsAtRest(s, d)
    val labels = Dedup.clustersFromPairs(pairs).select("doc_id", "cluster_id")
    val orig = Tables.documents(s, d).select(col("doc_id"), splitOf.as("split"))
    // canonical split: the cluster label IS its min member's doc_id
    val canon = labels.filter(col("doc_id") === col("cluster_id"))
      .join(orig, "doc_id")
      .select(col("cluster_id"), col("split").as("cluster_split"))
    val repaired = graft.CacheTracker.track(orig
      .join(labels, Seq("doc_id"), "left")
      .join(canon, Seq("cluster_id"), "left")
      .select(col("doc_id"), col("split").as("old_split"),
        coalesce(col("cluster_split"), col("split")).as("new_split"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    repaired.count() // one materialization before the 4-way audit fan-out
    val leaks = pairs
      .join(repaired.select(col("doc_id").as("a_id"), col("new_split").as("na")), "a_id")
      .join(repaired.select(col("doc_id").as("b_id"), col("new_split").as("nb")), "b_id")
      .filter(col("na") =!= col("nb"))
      .agg(count(lit(1)).as("leaks_after"))
    val bef = repaired.groupBy(col("old_split").as("split"))
      .agg(count(lit(1)).as("n_before"),
        sum(when(col("old_split") =!= col("new_split"), 1).otherwise(0))
          .cast("long").as("n_moved_out"))
    val aft = repaired.groupBy(col("new_split").as("split"))
      .agg(count(lit(1)).as("n_after"),
        sum(when(col("old_split") =!= col("new_split"), 1).otherwise(0))
          .cast("long").as("n_moved_in"))
    bef.join(aft, "split").crossJoin(broadcast(leaks))
      .select(col("split"), col("n_before"), col("n_after"),
        col("n_moved_in"), col("n_moved_out"), col("leaks_after"))
  }

  /** Per-source DATASET CARD — the datasheet a curation run publishes
    * (Gebru et al.'s "Datasheets for Datasets", operationalized): for
    * every source, size (docs/tokens/mean length), exact-duplicate
    * rate, Gopher quality pass rate, and language mix (count + Shannon
    * entropy of the lang distribution) — one relation summarizing
    * everything downstream consumers need before mixing the source in.
    *
    * Determinism: all rates are ratios of exact integers; the lang
    * entropy folds over the lang-sorted count list (the q_text_entropy
    * sorted-fold contract) and rounds at 6 dp.
    *
    * Scale shape: one persisted map-side base projection feeds four
    * source-keyed aggregates (core counts, (source, hash) dup cells,
    * (source, lang) mix cells, quality flags); every post-base relation
    * is source- or cell-bounded. */
  def qDatasetCard(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val base = graft.CacheTracker.track(
      Tables.documents(s, d).select(col("doc_id"), col("source"), col("lang"),
        md5(col("text")).as("h"), size(split(col("text"), " ")).cast("long").as("w"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val core = base.groupBy("source").agg(count(lit(1)).as("n_docs"),
      sum("w").cast("long").as("n_tokens"))
    val dups = base.groupBy("source", "h").agg(count(lit(1)).as("c"))
      .groupBy("source").agg(sum(expr("c - 1")).cast("long").as("n_dup_docs"))
    val langs = base.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      .groupBy("source").agg(count(lit(1)).as("n_langs"),
        sum("c").cast("long").as("nl"),
        sort_array(collect_list(struct(col("lang"), col("c")))).as("ls"))
      .select(col("source"), col("n_langs"),
        round(expr(
          """aggregate(ls, CAST(0 AS DOUBLE),
            | (a, x) -> a - (x.c / CAST(nl AS DOUBLE)) * ln(x.c / CAST(nl AS DOUBLE)))"""
            .stripMargin.replace("\n", "")), 6).as("lang_entropy"))
    val quality = TextAnalysis.qGopherQuality(s, d).select(col("doc_id"), col("pass_all"))
      .join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(sum(when(col("pass_all"), 1L).otherwise(0L)).as("n_pass"))
    core.join(dups, "source").join(langs, "source").join(quality, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_docs"), 6).as("mean_tokens"),
        col("n_dup_docs"),
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6).as("dup_rate"),
        col("n_pass"),
        round(col("n_pass").cast("double") / col("n_docs"), 6).as("quality_rate"),
        col("n_langs"), col("lang_entropy"))
  }

  /** l-diversity audit — the disclosure-control check one rung above
    * [[qKAnon]] (Machanavajjhala et al. 2007): a quasi-identifier cell
    * can pass k-anonymity yet still leak if (almost) every member
    * shares one SENSITIVE value. Over events, QI = (event_type, day)
    * and the sensitive attribute is the `props.k` payload: per cell,
    * the distinct sensitive count l, the modal value's share, and the
    * at-risk flag (l < 3 or one value covering > 80%).
    *
    * Scale shape: one (cell, sensitive) map-side-combined aggregate,
    * then a cell-keyed reduction — the modal share is a MAX over the
    * per-value counts, no window, no second corpus pass. Exact
    * integers plus one final division. */
  def qLDiversity(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("from_json(props, 'k INT').k").as("sens"))
      .groupBy("event_type", "day", "sens").agg(count(lit(1)).as("c"))
      .groupBy("event_type", "day")
      .agg(sum("c").cast("long").as("n_rows"),
        count(lit(1)).as("l_distinct"),
        max("c").cast("long").as("top_count"))
      .select(col("event_type"), col("day"), col("n_rows"), col("l_distinct"),
        round(col("top_count").cast("double") / col("n_rows"), 6).as("top_share"),
        (col("l_distinct") < 3 ||
          col("top_count").cast("double") / col("n_rows") > 0.8).as("at_risk"))
  }

  /** t-closeness audit — the third rung of the disclosure-control
    * ladder after [[qKAnon]] and [[qLDiversity]] (Li et al., ICDE
    * 2007): a cell can be k-anonymous AND l-diverse yet still leak if
    * its sensitive-value DISTRIBUTION differs sharply from the
    * global one (e.g. "all values present but 90% mass on one"). Over
    * the same QI = (event_type, day) and ordered sensitive attribute
    * `props.k`, t is the earth-mover's distance between the cell's
    * distribution and the corpus-global one under the ordered-domain
    * ground metric: t = Σᵢ |cumP_cell(i) − cumP_global(i)| / (m−1).
    *
    * The EMD is computed in EXACT integer arithmetic — each term is
    * |cum_c·N − cum_g·n| over BIGINT cumulative counts (order-
    * independent, overflow-safe to ~3e9 rows; DECIMAL(38,0) beyond),
    * with ONE double division at the end — so the result is hash-exact
    * by construction, not by summation-order luck. The final domain
    * position contributes exactly 0 (both CDFs reach 1), so the sum
    * runs over the whole domain and divides by m−1.
    *
    * Scale shape: one map-side-combined (cell, value) aggregate is the
    * only corpus pass; the domain expansion is cells × m (tiny — both
    * sides are post-aggregate relations), and the cumulative window
    * partitions by cell over m rows. */
  def qTCloseness(s: SparkSession, d: String): DataFrame = {
    val sv = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("from_json(props, 'k INT').k").as("sens"))
    val vc = sv.groupBy("event_type", "day", "sens")
      .agg(count(lit(1)).cast("long").as("c"))
    val glob = sv.groupBy("sens").agg(count(lit(1)).cast("long").as("g"))
    val tot = sv.agg(count(lit(1)).cast("long").as("n_total"),
      countDistinct("sens").cast("long").as("m"))
    val cells = sv.groupBy("event_type", "day")
      .agg(count(lit(1)).cast("long").as("n_rows"))
    val w = Window.partitionBy("event_type", "day").orderBy("sens")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.crossJoin(broadcast(glob))
      .join(vc, Seq("event_type", "day", "sens"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("cum_c", sum("c").over(w))
      .withColumn("cum_g", sum("g").over(w))
      .withColumn("term", abs(col("cum_c") * col("n_total") - col("cum_g") * col("n_rows")))
      .groupBy("event_type", "day")
      .agg(first("n_rows").as("n_rows"),
        sum("term").as("t_num"),
        first(col("n_total") * col("n_rows") * (col("m") - 1)).as("t_den"))
      // nullif: m = 1 (a single distinct sensitive value — legitimate
      // for a perfectly concentrated attribute) zeroes t_den; ANSI
      // Spark would throw where the DuckDB oracle yields NULL t /
      // NULL at_risk. Identity whenever m ≥ 2.
      .select(col("event_type"), col("day"), col("n_rows"),
        round(expr("CAST(t_num AS DOUBLE) / nullif(t_den, 0)"), 6).as("t"),
        (expr("CAST(t_num AS DOUBLE) / nullif(t_den, 0)") > 0.1).as("at_risk"))
  }

  /** Differentially-private histogram release eval — the privacy
    * ladder's RELEASE face (after scrub → k-anon → l-diversity →
    * t-closeness tells you what's risky, this is how a protected
    * aggregate actually ships): per (lang, source) document counts
    * with Laplace(1/ε) noise via the inverse-CDF transform
    * noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|), swept over
    * ε ∈ {0.1, 1, 10} and reduced to the utility-vs-privacy curve a
    * release pipeline pins its ε from: per ε the mean/max absolute
    * error, error relative to the mean cell, and how many cells stay
    * within ±10% of truth.
    *
    * The noise is SEEDED — u derives from md5(lang|source|ε-label)
    * (48 bits, offset by ½ so u ∈ (0,1) strictly, never 0.5 exactly)
    * — so the release is reproducible and the oracle computes the
    * identical reals; determinism is what makes a DP release
    * auditable (and testable) without storing the noise.
    *
    * Scale shape: one map-side-combined aggregate to cell granularity;
    * the ε sweep explodes the tiny cell relation 3× and reduces to 3
    * rows. Noise generation is pure per-row expression — codegen'd,
    * no UDF, no shuffle beyond the cell aggregate. */
  def qDpHistogram(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).cast("long").as("true_n"))
    val eps = s.createDataFrame(Seq(("e01", 0.1), ("e1", 1.0), ("e10", 10.0)))
      .toDF("eps_label", "eps")
    cells.crossJoin(broadcast(eps))
      .withColumn("u",
        (expr("CAST(conv(substring(md5(concat_ws('|', lang, source, eps_label)), 1, 12), 16, 10) AS BIGINT)")
          + lit(0.5)) / lit(281474976710656.0))
      .withColumn("noise",
        -(lit(1.0) / col("eps")) * signum(col("u") - 0.5) *
          log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)))
      .groupBy("eps_label")
      .agg(first("eps").as("eps"),
        count(lit(1)).as("n_cells"),
        avg(abs(col("noise"))).as("mae_raw"),
        max(abs(col("noise"))).as("max_err_raw"),
        avg("true_n").as("mean_cell_raw"),
        sum(when(abs(col("noise")) <= lit(0.1) * col("true_n"), 1L)
          .otherwise(0L)).as("n_within_10pct"))
      .select(col("eps_label"), col("eps"), col("n_cells"),
        round(col("mae_raw"), 6).as("mae"),
        round(col("max_err_raw"), 6).as("max_abs_err"),
        round(col("mae_raw") / col("mean_cell_raw"), 6).as("rel_mae"),
        col("n_within_10pct"))
  }

  /** Small-files compaction PLANNER — the `OPTIMIZE`-style planning
    * face whose execute face is [[graft.AtRest.compact]] (spec-proven
    * byte-identical) and whose streaming-tick variant is
    * [[graft.AtRest.compactTicks]]: model the ingest layout as one
    * fragment per 8-document micro-batch within each of the 16
    * md5-hash shards (the [[qShardLayout]] layout), then bin-pack each
    * shard's fragments next-fit-decreasing into 8 KiB target files —
    * fragments ordered by size descending, cumulative-summed, binned
    * by `cum_before div target` (the window-expressible form of NFD;
    * a straddling fragment may overfill a bin, which is why fill_ratio
    * can exceed 1). Output per shard: fragment/doc/byte totals, bins
    * after, files saved, and the target-fill ratio — the numbers that
    * justify (or veto) paying for the rewrite.
    *
    * Scale shape: fragment stats are one map-side-combined aggregate
    * per shard partition; both windows partition BY SHARD (never
    * global), so the plan parallelizes across shards exactly like the
    * compaction it schedules. All integers until the final ratio. */
  def qCompactionPlan(s: SparkSession, d: String): DataFrame = {
    val target = 8192L
    val h = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      .withColumn("hh", md5(col("doc_id").cast("string")))
      .withColumn("shard_id", expr("CAST(conv(substring(hh, 1, 4), 16, 10) AS BIGINT) % 16"))
    val wp = Window.partitionBy("shard_id").orderBy(col("hh"), col("doc_id"))
    val frags = h.withColumn("pos", row_number().over(wp))
      .groupBy(col("shard_id"), expr("(pos - 1) div 8").as("frag_id"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_chars").cast("long").as("bytes"))
    val wf = Window.partitionBy("shard_id")
      .orderBy(col("bytes").desc, col("frag_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    frags
      .withColumn("cum_before", coalesce(sum("bytes").over(wf), lit(0L)))
      .withColumn("bin_id", expr(s"cum_before div $target"))
      .groupBy("shard_id")
      .agg(count(lit(1)).cast("long").as("n_frags"),
        sum("n_docs").cast("long").as("n_docs"),
        sum("bytes").cast("long").as("bytes_total"),
        countDistinct("bin_id").cast("long").as("n_bins"))
      .select(col("shard_id"), col("n_frags"), col("n_docs"),
        col("bytes_total"), col("n_bins"),
        (col("n_frags") - col("n_bins")).as("files_saved"),
        round(col("bytes_total").cast("double") / (col("n_bins") * target), 6)
          .as("fill_ratio"))
  }

  /** DP mean with BOUNDED CONTRIBUTION — the numeric-aggregate release
    * completing the mechanism trio ([[qDpHistogram]] counts,
    * [[qDpQuantile]] ranks, this means): per-language mean document
    * length where each document's contribution is clamped to
    * [0, 1000] (the sensitivity bound a DP release must enforce
    * BEFORE aggregation — see also q_contribution_cap for the
    * event-side face), released as noisy_sum/noisy_count with
    * independent seeded Laplace draws of scale 1000/ε and 1/ε, swept
    * over ε ∈ {0.1, 1, 10}. Per (ε, lang): the true clamped mean, the
    * DP mean, and the relative error — the per-cell utility table
    * that, unlike [[qDpHistogram]]'s aggregate curve, shows HOW the
    * error concentrates on small groups (b/n·mean dominates where n
    * is small: the reason DP releases suppress rare cells).
    *
    * Scale shape: one map-side-combined clamped aggregate to language
    * granularity; noise and the ε sweep are pure expressions over the
    * tiny cell relation. */
  def qDpMean(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(least(greatest(col("n_chars"), lit(0)), lit(1000)).cast("long"))
          .cast("long").as("sum_clamped"))
    val eps = s.createDataFrame(Seq(("e01", 0.1), ("e1", 1.0), ("e10", 10.0)))
      .toDF("eps_label", "eps")
    def lap(seedSuffix: String, scale: org.apache.spark.sql.Column) = {
      val u = (expr(s"CAST(conv(substring(md5(concat_ws('|', lang, eps_label, '$seedSuffix')), 1, 12), 16, 10) AS BIGINT)")
        + lit(0.5)) / lit(281474976710656.0)
      -scale * signum(u - 0.5) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    }
    cells.crossJoin(broadcast(eps))
      .withColumn("noisy_sum", col("sum_clamped") + lap("sum", lit(1000.0) / col("eps")))
      .withColumn("noisy_n", greatest(col("n") + lap("cnt", lit(1.0) / col("eps")), lit(1.0)))
      .withColumn("true_mean_raw", col("sum_clamped").cast("double") / col("n"))
      .withColumn("dp_mean_raw", col("noisy_sum") / col("noisy_n"))
      .select(col("eps_label"), col("eps"), col("lang"), col("n"),
        round(col("true_mean_raw"), 6).as("true_mean"),
        round(col("dp_mean_raw"), 6).as("dp_mean"),
        round(abs(col("dp_mean_raw") - col("true_mean_raw")) / col("true_mean_raw"), 6)
          .as("rel_err"))
  }

  /** DP median via the EXPONENTIAL MECHANISM — the second release
    * mechanism next to [[qDpHistogram]]'s Laplace (McSherry & Talwar
    * 2007): for the document-length distribution (100-char buckets),
    * each candidate bucket v scores u(v) = −|2·cum≤(v) − n| (twice the
    * rank distance from the median, an integer with sensitivity 2),
    * and the released bucket is sampled ∝ exp(ε·u/4) — realized
    * deterministically by the Gumbel-max trick with seeded noise
    * G = −ln(−ln(u)), u from md5(bucket|ε-label). Swept over
    * ε ∈ {0.001, 0.01, 0.1} (rank utilities grow with n, so the
    * noise-dominated regime sits at much smaller ε than the
    * histogram's — accuracy-for-free at large n is exactly the DP
    * promise) and reduced to the accuracy curve: the chosen
    * bucket vs the utility-OPTIMAL bucket (argmax u — the value the
    * mechanism converges to as ε→∞, which can differ from the
    * first-cum≥n/2 CDF median when a bucket just below it sits closer
    * to rank n/2) and the bucket error — tight ε lands exact, loose ε
    * wanders.
    *
    * Scale shape: one corpus pass to ~n_chars/100 bucket counts; the
    * cumulative window, scoring, and argmax all run on the tiny
    * bucket×ε relation. The only doubles are the Gumbel scores; every
    * released value is an integer. */
  def qDpQuantile(s: SparkSession, d: String): DataFrame = {
    val bc = Tables.documents(s, d)
      .groupBy(expr("n_chars div 100").as("bucket"))
      .agg(count(lit(1)).cast("long").as("c"))
    val wc = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bc.withColumn("cumle", sum("c").over(wc))
      .crossJoin(broadcast(bc.agg(sum("c").cast("long").as("n"))))
      .withColumn("u_score", -abs(lit(2) * col("cumle") - col("n")))
    val eps = s.createDataFrame(Seq(("e0001", 0.001), ("e001", 0.01), ("e01", 0.1)))
      .toDF("eps_label", "eps")
    val scored = cum.crossJoin(broadcast(eps))
      .withColumn("uu",
        (expr("CAST(conv(substring(md5(concat_ws('|', CAST(bucket AS STRING), eps_label)), 1, 12), 16, 10) AS BIGINT)")
          + lit(0.5)) / lit(281474976710656.0))
      .withColumn("score",
        col("eps") * col("u_score") / lit(4.0) - log(-log(col("uu"))))
    val wPick = Window.partitionBy("eps_label")
      .orderBy(col("score").desc, col("bucket"))
    val wOpt = Window.orderBy(col("u_score").desc, col("bucket"))
    val opt = cum.withColumn("ork", row_number().over(wOpt))
      .filter(col("ork") === 1)
      .select(col("bucket").cast("long").as("opt_bucket"))
    scored.withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .crossJoin(broadcast(opt))
      .groupBy("eps_label")
      .agg(first("eps").as("eps"),
        first(col("bucket").cast("long")).as("chosen_bucket"),
        first("opt_bucket").as("opt_bucket"),
        first(abs(col("bucket").cast("long") - col("opt_bucket")))
          .as("bucket_err"))
  }

  /** DP TOP-K heavy hitters via one-shot Gumbel noise — the set-valued
    * release completing the mechanism family ([[qDpHistogram]] counts,
    * [[qDpQuantile]] ranks, [[qDpMean]] means, this SETS): release the
    * k=10 highest-document-frequency words under ε-DP by adding
    * independent Gumbel noise to each word's utility and taking the
    * top k — Durfee & Rogers (NeurIPS 2019) prove this one-shot draw
    * is identical in distribution to k rounds of exponential-mechanism
    * peeling, turning a k-pass mechanism into ONE vocabulary pass.
    * Utility = doc frequency (distinct docs containing the word, so a
    * single document moves any count by ≤1: sensitivity 1); noisy
    * score = ε·df/(2k) + G with seeded G = −ln(−ln(u)),
    * u from md5(word|ε-label) (reproducible ⇒ auditable, same
    * discipline as the other three releases). Swept over
    * ε ∈ {0.01, 0.1, 1}, reduced to the utility curve: released∩true
    * overlap, recall, and the df-mass ratio of released vs true top-k
    * — at tight ε the mechanism trades true heavy hitters for noise
    * picks, and the mass ratio shows how much frequency the release
    * actually surrenders.
    *
    * Scale shape: one corpus pass to distinct (doc, word) then a
    * map-side-combined count to the vocab-sized df relation; the true
    * top-k is TakeOrderedAndProject (partial per-partition top-k, no
    * global sort) and the per-ε release filters `row_number ≤ k`
    * directly so WindowGroupLimit keeps the per-group selection
    * partial too. Noise is a pure codegen'd expression — no UDF; the
    * only broadcast is the 3-row ε relation and the 1-row truth mass. */
  def qDpTopk(s: SparkSession, d: String): DataFrame = {
    val k = 10
    // persisted: the vocab-sized df relation has a corpus-sized
    // lineage (explode + distinct) and three consumers (the ε-swept
    // release, the true top-k, the truth mass) — without the cache the
    // dominant stage runs three times
    val dfreq = graft.CacheTracker.track(Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .distinct()
      .groupBy("word").agg(count(lit(1)).cast("long").as("df"))
      .persist())
    val truth = dfreq.orderBy(col("df").desc, col("word")).limit(k)
    val truthMass = truth.agg(sum("df").cast("long").as("df_true_sum"))
    val eps = s.createDataFrame(Seq(("e001", 0.01), ("e01", 0.1), ("e1", 1.0)))
      .toDF("eps_label", "eps")
    val scored = dfreq.crossJoin(broadcast(eps))
      .withColumn("u",
        (expr("CAST(conv(substring(md5(concat_ws('|', word, eps_label)), 1, 12), 16, 10) AS BIGINT)")
          + lit(0.5)) / lit(281474976710656.0))
      .withColumn("score",
        col("eps") * col("df") / lit(2.0 * k) - log(-log(col("u"))))
    val wPick = Window.partitionBy("eps_label")
      .orderBy(col("score").desc, col("word"))
    scored.withColumn("rk", row_number().over(wPick))
      .filter(col("rk") <= k)
      .join(truth.select(col("word"), lit(1L).as("hit")), Seq("word"), "left")
      .groupBy("eps_label")
      .agg(first("eps").as("eps"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_overlap"),
        sum("df").cast("long").as("df_rel_sum"))
      .crossJoin(broadcast(truthMass))
      .select(col("eps_label"), col("eps"), lit(k.toLong).as("k"),
        col("n_overlap"),
        round(col("n_overlap").cast("double") / lit(k.toDouble), 6).as("recall"),
        round(col("df_rel_sum").cast("double") / col("df_true_sum"), 6)
          .as("utility_ratio"))
  }

  /** Zone-map pruning audit — the scan-economics number behind layout
    * decisions ([[qZorderLayout]] exists to improve it): simulate two
    * file layouts of lineitem (natural = orderkey-hashed files, i.e.
    * arrival order; time_part = month-partitioned files) and measure,
    * for a one-month predicate, how many files the min/max footer
    * stats let a reader SKIP and the resulting read amplification
    * (rows scanned per matching row). Arrival-ordered files have
    * near-full date ranges so nothing prunes; the time-partitioned
    * layout scans ~1 file. This is the audit you run before paying for
    * a 100 TB rewrite — it predicts the benefit from metadata alone.
    *
    * Scale shape: two map-side-combined aggregates over the fact scan
    * (≤ 84 file keys each); everything after is per-file arithmetic.
    * All counts exact BIGINTs; ratios integer ppm. */
  def qZonemapPrune(s: SparkSession, d: String): DataFrame = {
    val lo = "TIMESTAMP '1995-03-01 00:00:00'"
    val hi = "TIMESTAMP '1995-04-01 00:00:00'"
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    def audit(layout: String, fileId: org.apache.spark.sql.Column): DataFrame =
      li.groupBy(fileId.as("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min("l_shipdate").as("d_min"), max("l_shipdate").as("d_max"),
          sum(expr(s"CASE WHEN l_shipdate >= $lo AND l_shipdate < $hi THEN 1 ELSE 0 END"))
            .as("n_match"))
        .withColumn("hit", expr(s"d_min < $hi AND d_max >= $lo"))
        .groupBy()
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_files_hit"),
          sum("n_rows").as("rows_total"),
          sum(when(col("hit"), col("n_rows")).otherwise(0L)).as("rows_scanned"),
          sum("n_match").as("rows_match"))
        .select(lit(layout).as("layout"), col("n_files"), col("n_files_hit"),
          col("rows_total"), col("rows_scanned"), col("rows_match"),
          expr("(n_files - n_files_hit) * 1000000 div n_files").as("skip_ppm"),
          expr("rows_scanned * 1000000 div greatest(rows_match, 1)").as("amp_ppm"))
    audit("natural", pmod(col("l_orderkey"), lit(64)))
      .unionByName(audit("time_part",
        (year(col("l_shipdate")) - 1992) * 12 + month(col("l_shipdate")) - 1))
  }

  /** Exact-k per-stratum deterministic sample — the reservoir-sampling
    * counterpart to [[qWeightedSample]]'s Bernoulli coin: rank docs
    * within each lang by an md5 hash of doc_id (a fixed random-but-
    * reproducible permutation) and keep the first k=20, which is exactly
    * a seeded uniform sample without replacement. Scale shape: the
    * rank-filter is recognized by Spark's WindowGroupLimit optimization
    * (plan-asserted in PlanShapeSpec), so each map task keeps only its
    * local top-k per group BEFORE the shuffle — the exchange carries
    * O(k × strata × tasks) rows, not the corpus. `kept_id_sum` is an
    * order-insensitive checksum pinning WHICH docs were kept. */
  def qReservoirSample(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 20)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
        max("rk").cast("long").as("max_rank"),
        sum("doc_id").cast("long").as("kept_id_sum"),
        max("h").as("max_hash"))
  }

  /** Token-budget mixture planning (the Pile/Dolma-style mixing step
    * BEFORE any resampling runs): given a total token budget B (here
    * 2× the corpus so upsampling is live) and target weights (uniform
    * across languages), compute each source's planned token allocation
    * under a max-epochs cap — desired_i = B/n, capped at 4 epochs of
    * the source's own tokens, with the over-cap surplus redistributed
    * to uncapped sources in ONE pass proportional to their size (the
    * single-pass approximation of iterative water-filling; a second
    * pass would converge further but the plan's residual error is
    * reported, not hidden). The output IS the plan: per-language
    * epochs/repeat factors a sampler (q_weighted_sample's md5 coin)
    * executes map-side.
    *
    * Every allocation step is INTEGER token arithmetic (floor division
    * like the PageRank fixed-point) — exact, order-insensitive,
    * hash-stable; doubles appear only in the final epochs column. Scale
    * shape: one tiny per-language aggregate (map-side combined), then
    * two broadcast-sized cross joins of the |langs|-row plan relation —
    * the corpus is scanned once regardless of corpus size. */
  def qMixBudget(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
    val tots = tok.agg(count(lit(1)).as("n_langs"),
      sum("n_tokens").cast("long").as("tot_tokens"))
    val base = tok.crossJoin(broadcast(tots))
      .withColumn("budget", expr("2 * tot_tokens"))
      .withColumn("desired", expr("budget div n_langs"))
      .withColumn("capped", expr("desired > 4 * n_tokens"))
      .withColumn("assigned", expr("least(desired, 4 * n_tokens)"))
    val spare = base.agg(
      sum("assigned").cast("long").as("assigned_tot"),
      sum(when(!col("capped"), col("n_tokens")).otherwise(0L)).cast("long").as("open_tokens"))
    base.crossJoin(broadcast(spare))
      .withColumn("extra", expr(
        "CASE WHEN capped OR open_tokens = 0 THEN CAST(0 AS BIGINT) " +
        "ELSE (budget - assigned_tot) * n_tokens div open_tokens END"))
      .withColumn("planned_tokens", expr("assigned + extra"))
      .withColumn("epochs", expr("round(CAST(planned_tokens AS DOUBLE) / n_tokens, 6)"))
      .select(col("lang"), col("n_tokens"), col("desired"), col("capped"),
        col("planned_tokens"), col("epochs"))
  }

  /** Cross-source contamination matrix — the provenance audit run before
    * mixing corpora: for every source pair, how many distinct 10-token
    * spans they share, plus per-source span vocabularies and the span
    * Jaccard. Exact-text overlap is usually zero across crawls; span
    * granularity (same unit as [[Dedup]]'s C4 span dedup) surfaces the
    * real contamination (boilerplate, syndication, cross-posting).
    *
    * Scale shape: spans extract map-side; `distinct` on (span-hash,
    * source) is the one corpus-sized shuffle; the pair join is keyed on
    * span hash and its fan-out per hash is bounded by #sources (not
    * corpus size); per-source totals are a tiny aggregate broadcast
    * back onto the ≤ sources² pair rows. Never all-pairs on documents. */
  def qSourceOverlap(s: SparkSession, d: String): DataFrame = {
    val sp = Tables.documents(s, d)
      .withColumn("words", split(col("text"), " "))
      .select(col("source"), posexplode(expr(
        "transform(sequence(0, (size(words) + 9) div 10 - 1), " +
        "i -> array_join(slice(words, i * 10 + 1, 10), ' '))"))
        .as(Seq("span_idx", "span")))
      .select(col("source"), md5(col("span")).as("h"))
      .distinct()
    val totals = sp.groupBy("source").agg(count(lit(1)).as("n_spans"))
    val pairs = sp.as("x")
      .join(sp.withColumnRenamed("source", "source_b").as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("source_b"))
      .groupBy(col("x.source").as("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(totals.withColumnRenamed("source", "source_a")
        .withColumnRenamed("n_spans", "n_a")), Seq("source_a"))
      .join(broadcast(totals.withColumnRenamed("source", "source_b")
        .withColumnRenamed("n_spans", "n_b")), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
  }

  /** Quantile normalization of document-length distributions across
    * sources — the distribution-alignment step run before mixing corpora
    * whose length profiles differ (each source's vigintile is mapped onto
    * the GLOBAL distribution's same vigintile; `shift` is the correction
    * the mapping applies at that bucket's floor).
    *
    * Deterministic by construction: buckets come from exact integer rank
    * arithmetic ((rk−1)·20 div n) over the strict (n_chars, doc_id)
    * order, and bucket floors are integer mins — no float percentiles.
    *
    * Scale shape: the GLOBAL rank uses the range-partition + zipWithIndex
    * pattern (q_vocab_encode / q_skew_audit — no single-partition
    * Window); the per-source ranks are ordinary partitioned windows,
    * parallel across sources (caveat: a source owning most of the corpus
    * concentrates its window — salt or pre-aggregate per length if a
    * single source dominates at scale); the 20-row global reference
    * broadcasts onto the ≤ sources×20 bucket rows. */
  def qQuantileNorm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
    val nAll = docs.count() // partition-size pass; zipWithIndex needs it anyway
    val g = docs
      .repartitionByRange(s.sessionState.conf.numShufflePartitions,
        col("n_chars").asc, col("doc_id").asc)
      .sortWithinPartitions(col("n_chars").asc, col("doc_id").asc)
      .select(col("n_chars")).as[Long].rdd
      .zipWithIndex()
      .toDF("n_chars", "g0")
      .withColumn("gb", expr(s"CAST(g0 * 20 div CAST($nAll AS BIGINT) AS INT)"))
    val ref = g.groupBy("gb").agg(min("n_chars").cast("long").as("ref_lo"))
    val w = Window.partitionBy("source").orderBy(col("n_chars"), col("doc_id"))
    val sb = docs.withColumn("rk", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("bucket", expr("CAST((rk - 1) * 20 div n_src AS INT)"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), min("n_chars").cast("long").as("src_lo"))
    sb.join(broadcast(ref), sb("bucket") === ref("gb"))
      .select(col("source"), col("bucket"), col("n_docs"), col("src_lo"), col("ref_lo"),
        (col("ref_lo") - col("src_lo")).as("shift"))
  }

  /** Length-bucketed batching plan (the dynamic-batching step a
    * training dataloader runs: pad each document up to the next
    * 64-token boundary, then report per-bucket document count, token
    * mass, padding waste, and how many 8192-token batches the bucket
    * fills). Padding waste is THE number this operator exists for —
    * it is what length-bucketing minimizes vs. naive global padding.
    *
    * Scale shape: token count and bucket assignment are map-side
    * (one codegen'd split+size per doc); the aggregate is a
    * map-side-combined groupBy over O(max_len/64) keys. No joins, no
    * windows — a single pass at any corpus size. */
  def qLengthBuckets(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(expr("CAST(size(split(text, ' ')) AS BIGINT)").as("tok"))
      .withColumn("bucket_len", expr("((tok + 63) div 64) * 64"))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("sum_tokens"))
      .withColumn("padding", col("bucket_len") * col("n_docs") - col("sum_tokens"))
      .withColumn("waste_pct", round(col("padding").cast("double") /
        (col("bucket_len") * col("n_docs")), 6))
      .withColumn("n_batches", expr("(bucket_len * n_docs + 8191) div 8192"))
      .select("bucket_len", "n_docs", "sum_tokens", "padding", "waste_pct", "n_batches")
  }

  /** Neyman-optimal stratified sample allocation (survey-sampling
    * theory applied to corpus sampling: allocate a 10,000-row budget
    * across strata ∝ N_h·S_h, so high-variance strata get more
    * samples — minimum-variance for a fixed budget). The float
    * std-devs are quantized to integer weights (⌊N_h·S_h·1000⌋) so
    * all CROSS-strata arithmetic (shares, largest-remainder rounding)
    * is exact integer math — no order-dependent float sums; the
    * budget is hit exactly via largest-remainder.
    *
    * Scale shape: one conditional-aggregation pass with map-side
    * combine folds each stratum to (n, Σx, Σx²) — DECIMAL(38,0) for
    * the squares so the fold is overflow-proof; everything after runs
    * on 5 rows (the tiny global window is post-aggregate). */
  def qNeymanAlloc(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderpriority"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
    val g = o.groupBy("o_orderpriority").agg(
      count(lit(1)).as("n_h"),
      sum("c").as("s1"),
      sum(expr("CAST(c * c AS DECIMAL(38,0))")).as("s2"))
      // nullif guards: a single-row stratum zeroes (n_h - 1) and an
      // all-degenerate corpus zeroes sum_w — ANSI Spark would throw
      // DIVIDE_BY_ZERO where the DuckDB oracle propagates NULL (both
      // engines then carry the identical NULL chain through wt → base
      // → alloc, desc ordering putting NULLs last in both). Identity
      // on any stratum with ≥ 2 rows and any nonzero weight total.
      .withColumn("s_h", expr(
        """sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_h)
          | / nullif(n_h - 1, 0)) / 100.0""".stripMargin.replace("\n", "")))
      .withColumn("w", expr("CAST(floor(n_h * s_h * 1000.0) AS BIGINT)"))
    val wTot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.orderBy(expr("(w * 10000) % nullif(sum_w, 0)").desc, col("o_orderpriority"))
    g.withColumn("sum_w", sum("w").over(wTot))
      .withColumn("base", expr("(w * 10000) div nullif(sum_w, 0)"))
      .withColumn("deficit", lit(10000L) - sum("base").over(wTot))
      .withColumn("rk", row_number().over(wRank))
      .select(col("o_orderpriority"), col("n_h"), round(col("s_h"), 6).as("s_h"),
        (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L)).as("alloc"))
  }

  /** DSIR-style data selection via importance resampling (Xie et al.,
    * NeurIPS 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every RAW document by how much more likely its
    * hashed-unigram bag is under the TARGET distribution (here the
    * src0/src1 slice standing in for a quality seed set) than under the
    * raw pool's own distribution, and keep the top scorers. Features are
    * words hashed into 1024 buckets (the paper's hashed n-gram trick —
    * no vocabulary ever materializes); both distributions are
    * Laplace-smoothed bucket categoricals; the per-document log
    * importance weight is Σ_b n_b·(ln p_t[b] − ln p_q[b]).
    *
    * Determinism: the per-bucket log-ratio is computed ONCE and
    * immediately fixed-pointed (floor(lr·10⁹) as BIGINT), so every
    * per-document weight is an exact integer sum — identical in any
    * accumulation order on any engine. Floats exist only inside the
    * ≤1024-row ratio table (identical ln inputs both sides — the
    * q_text_bm25 libm contract) and the final rounded readout; the
    * top-100 selection orders by the exact integer with doc_id
    * tiebreak.
    *
    * Scale shape: token explode → two 1024-group bucket counts
    * (map-side combined); the ratio table broadcasts back onto
    * per-(doc, bucket) counts; per-doc weights are one integer-sum
    * groupBy; selection is TakeOrdered. The target side is a tiny seed
    * set, the raw side streams — nothing quadratic, nothing
    * driver-side, at any corpus size. */
  def qDsirResample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), split(lower(col("text")), " ").as("words"))
    val isTarget = col("source").isin("src0", "src1")
    // persisted: four consumers (totals, the two bucket counts, the
    // per-doc counts) would otherwise each re-run the corpus-sized
    // explode+md5 lineage — the qTokenJsDrift pattern
    val toks = graft.CacheTracker.track(docs
      .select(col("doc_id"), isTarget.as("is_t"), explode(col("words")).as("w"))
      .withColumn("b", expr("CAST(conv(substring(md5(w), 1, 6), 16, 10) AS BIGINT) % 1024"))
      .select("doc_id", "is_t", "b")
      .persist())
    val totals = toks.agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("tt"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("tq"))
    val tCounts = toks.filter(col("is_t")).groupBy("b").agg(count(lit(1)).as("nt"))
    val qCounts = toks.filter(!col("is_t")).groupBy("b").agg(count(lit(1)).as("nq"))
    // raw-side buckets are the only keys a raw document can hit, so the
    // ratio table needs exactly the nq ≥ 1 buckets (nt fills with 0)
    val lr = qCounts.join(tCounts, Seq("b"), "left").crossJoin(broadcast(totals))
      .withColumn("lr_fp", expr(
        """CAST(floor((ln((coalesce(nt, CAST(0 AS BIGINT)) + 1) / CAST(tt + 1024 AS DOUBLE))
          | - ln((nq + 1) / CAST(tq + 1024 AS DOUBLE))) * 1e9) AS BIGINT)""".stripMargin
          .replace("\n", "")))
      .select("b", "lr_fp")
    val perDoc = toks.filter(!col("is_t")).groupBy("doc_id", "b").agg(count(lit(1)).as("nb"))
      .join(broadcast(lr), "b")
      .groupBy("doc_id").agg(sum(col("nb") * col("lr_fp")).as("w_fp"))
    docs.filter(!isTarget)
      .select(col("doc_id"), col("source"), size(col("words")).as("n_tokens"))
      .join(perDoc, "doc_id")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("w_fp"),
        round(col("w_fp") / lit(1e9), 6).as("log_weight"))
      .orderBy(col("w_fp").desc, col("doc_id"))
      .limit(100)
  }

  /** Filter-ensemble REJECTION ATTRIBUTION — the ablation table every
    * published curation pipeline (C4, Gopher, FineWeb) reports before
    * anyone trusts a gate stack: for each quality rule, how many
    * documents fail it at all (n_fail), how many ONLY it catches
    * (n_unique_fail — the rule's irreplaceable contribution), and how
    * many it removes in the fixed waterfall order after earlier rules
    * already removed theirs (n_cum_removed — what the rule costs in the
    * deployed pipeline). Rules are integer-exact restatements of the
    * engine's own gates: document size (n_words ≥ 20), language
    * (English stopwords present), stopword soup (2·stop ≤ words),
    * Gopher mean-word-length bounds (3 ≤ mean ≤ 10 as cross-multiplied
    * integers), and Gopher top-2-gram repetition (mode·5 ≤ total).
    *
    * Scale shape: every flag is map-side HOF arithmetic (the 2-gram
    * mode via a per-doc O(n log n) sorted run-length fold — no explode,
    * no shuffle); the whole readout is ONE aggregate row unpivoted to 5
    * rule rows with `stack`. */
  def qFilterAttribution(s: SparkSession, d: String): DataFrame = {
    val stopList = TextAnalysis.inList(TextAnalysis.stopEn)
    val g2 = "IF(size(words) >= 2, transform(sequence(1, size(words) - 1), " +
      "i -> concat_ws(' ', element_at(words, i), element_at(words, i + 1))), " +
      "CAST(array() AS ARRAY<STRING>))"
    val flags = Tables.documents(s, d)
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_words", size(col("words")))
      .withColumn("n_charsw", expr("aggregate(transform(words, x -> length(x)), 0, (a, x) -> a + x)"))
      .withColumn("n_stop", expr(s"size(filter(words, w -> w IN $stopList))"))
      .withColumn("g2", expr(g2))
      // per-doc 2-gram mode as a sorted run-length fold (r17, guide §4):
      // the previous distinct×filter HOF was O(n²) string comparisons per
      // document; sorting once and tracking the longest equal-run is
      // O(n log n) with the identical result (max run length in sorted
      // order IS the max multiplicity; empty g2 folds to 0, matching the
      // old coalesce(array_max(...), 0))
      .withColumn("max2", expr(
        """aggregate(sort_array(g2),
          |  named_struct('p', CAST(NULL AS STRING), 'c', 0, 'b', 0),
          |  (acc, x) -> named_struct(
          |    'p', x,
          |    'c', IF(acc.p IS NOT NULL AND x = acc.p, acc.c + 1, 1),
          |    'b', greatest(acc.b, IF(acc.p IS NOT NULL AND x = acc.p, acc.c + 1, 1))),
          |  acc -> acc.b)""".stripMargin))
      .withColumn("tot2", size(col("g2")))
      .select(
        (col("n_words") < 20).as("f_size"),
        (col("n_stop") === 0).as("f_lang"),
        (col("n_stop") * 2 > col("n_words")).as("f_soup"),
        (col("n_charsw") < col("n_words") * 3 || col("n_charsw") > col("n_words") * 10)
          .as("f_wlen"),
        (col("max2") * 5 > col("tot2")).as("f_rep"))
    def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    flags.agg(
        count(lit(1)).as("n_total"),
        cnt(col("f_size")).as("fail_size"),
        cnt(col("f_lang")).as("fail_lang"),
        cnt(col("f_soup")).as("fail_soup"),
        cnt(col("f_wlen")).as("fail_wlen"),
        cnt(col("f_rep")).as("fail_rep"),
        cnt(col("f_size") && !col("f_lang") && !col("f_soup") && !col("f_wlen") && !col("f_rep")).as("uniq_size"),
        cnt(col("f_lang") && !col("f_size") && !col("f_soup") && !col("f_wlen") && !col("f_rep")).as("uniq_lang"),
        cnt(col("f_soup") && !col("f_size") && !col("f_lang") && !col("f_wlen") && !col("f_rep")).as("uniq_soup"),
        cnt(col("f_wlen") && !col("f_size") && !col("f_lang") && !col("f_soup") && !col("f_rep")).as("uniq_wlen"),
        cnt(col("f_rep") && !col("f_size") && !col("f_lang") && !col("f_soup") && !col("f_wlen")).as("uniq_rep"),
        cnt(col("f_size")).as("cum_size"),
        cnt(col("f_lang") && !col("f_size")).as("cum_lang"),
        cnt(col("f_soup") && !col("f_size") && !col("f_lang")).as("cum_soup"),
        cnt(col("f_wlen") && !col("f_size") && !col("f_lang") && !col("f_soup")).as("cum_wlen"),
        cnt(col("f_rep") && !col("f_size") && !col("f_lang") && !col("f_soup") && !col("f_wlen")).as("cum_rep"))
      .select(col("n_total"), expr(
        """stack(5,
          |  'size', fail_size, uniq_size, cum_size,
          |  'lang', fail_lang, uniq_lang, cum_lang,
          |  'stop_soup', fail_soup, uniq_soup, cum_soup,
          |  'word_len', fail_wlen, uniq_wlen, cum_wlen,
          |  'repetition', fail_rep, uniq_rep, cum_rep)
          |  AS (rule, n_fail, n_unique_fail, n_cum_removed)""".stripMargin))
      .select("rule", "n_total", "n_fail", "n_unique_fail", "n_cum_removed")
  }

  /** GREEDY QUALITY-RANKED mixture fill — the knapsack face of mixture
    * planning (complementing q_mix_budget's equal-share epoch-capped
    * plan and q_mix_temperature's α-resampling): rank sources by their
    * quality-gate pass rate, then fill a 40%-of-corpus token budget
    * best-first, each source capped at half the budget (the diversity
    * cap that stops one pristine source from becoming the whole mix).
    * The greedy fill needs NO iteration: with per-source caps, the
    * running take is min(budget, running-cap), so each source's take is
    * the difference of two window cumsums — one |sources|-row sorted
    * window, closed form.
    *
    * All integer arithmetic (pass rates as ppm, floor-div budgets) —
    * hash-exact. Scale shape: one gate pass (map-side HOFs), one
    * per-source aggregate, one bounded |sources|-row window. */
  def qMixGreedyQuality(s: SparkSession, d: String): DataFrame = {
    val flags = gateFlags(
      Tables.documents(s, d).select(col("doc_id"), col("source"), col("text")))
    val per = flags.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pass_quality") && col("pass_lang"), 1L).otherwise(0L)).as("n_pass"),
        sum(col("n_words").cast("long")).as("avail_tokens"))
      .withColumn("quality_ppm", expr("n_pass * 1000000 div n_docs"))
    val tot = per.agg(sum("avail_tokens").cast("long").as("tot_tokens"))
    val w = Window.orderBy(col("quality_ppm").desc, col("source"))
    per.crossJoin(broadcast(tot))
      .withColumn("budget", expr("tot_tokens * 2 div 5"))
      .withColumn("cap_tokens", least(col("avail_tokens"), expr("budget div 2")))
      .withColumn("rank", row_number().over(w))
      .withColumn("cumcap", sum("cap_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("taken_tokens",
        expr("least(budget, cumcap) - least(budget, cumcap - cap_tokens)"))
      .select(col("rank"), col("source"), col("quality_ppm"), col("n_docs"),
        col("avail_tokens"), col("cap_tokens"), col("taken_tokens"),
        (col("taken_tokens") < col("cap_tokens")).as("budget_bound"))
  }

  /** QUALITY × DUPLICATION contingency — does failing the quality gate
    * correlate with being a near-duplicate? The 2×2 readout (with
    * per-cell χ² contributions, the q_chi2_contingency formula) that
    * decides whether dedup and quality filtering are redundant or
    * complementary stages — if low-quality docs were mostly dups, one
    * stage could absorb the other; if independent, both earn their
    * scan. Duplicate membership is read off the AT-REST pair index
    * (never recomputed); the gate is the standing integer-exact
    * stopword rule.
    *
    * Scale shape: one distinct over the pair endpoints, one left join
    * onto the gated corpus, a 4-cell aggregate with broadcast
    * marginals. */
  def qQualityDupContingency(s: SparkSession, d: String): DataFrame = {
    val p = Dedup.pairsAtRest(s, d)
    val dupIds = p.select(col("a_id").as("doc_id"))
      .unionByName(p.select(col("b_id").as("doc_id"))).distinct()
    val base = graft.CacheTracker.track(gateFlags(Dedup.corpus(s, d))
      .select(col("doc_id"), (col("pass_quality") && col("pass_lang")).as("pass"))
      .join(dupIds.withColumn("dup", lit(true)), Seq("doc_id"), "left")
      .select(col("pass"), coalesce(col("dup"), lit(false)).as("is_dup"))
      .persist())
    val cells = base.groupBy("is_dup", "pass").agg(count(lit(1)).as("n_obs"))
    val rowTot = base.groupBy("is_dup").agg(count(lit(1)).as("n_dup_margin"))
    val colTot = base.groupBy("pass").agg(count(lit(1)).as("n_pass_margin"))
    val tot = base.agg(count(lit(1)).as("n_total"))
    cells.join(broadcast(rowTot), "is_dup").join(broadcast(colTot), "pass")
      .crossJoin(broadcast(tot))
      .select(col("is_dup"), col("pass"), col("n_obs"),
        col("n_dup_margin"), col("n_pass_margin"),
        expr("round(CAST(n_dup_margin * n_pass_margin AS DOUBLE) / n_total, 6)")
          .as("expected"),
        expr("round(CAST(n_obs * n_total - n_dup_margin * n_pass_margin AS DOUBLE)" +
          " * CAST(n_obs * n_total - n_dup_margin * n_pass_margin AS DOUBLE)" +
          " / (CAST(n_total AS DOUBLE) * n_dup_margin * n_pass_margin), 6)").as("contrib"))
  }

  /** URL CANONICALIZATION dedup — the first stage of every web-crawl
    * pipeline: the same page arrives under scheme/case/tracking-param/
    * fragment variants, and canonicalizing before fetch/dedup is what
    * keeps a 100 TB crawl from storing the same page five times. The
    * corpus has no URL column, so the raw URLs are DERIVED
    * deterministically from (source, doc_id) — two variants per third
    * document (mixed-case www host + utm_* tracking params + fragment vs
    * a clean http form) that must collapse to ONE canonical URL.
    * Canonicalization: drop fragment, drop scheme, lowercase host, strip
    * `www.`, drop `utm_*`/`fbclid`/`gclid` tracking params, sort the
    * surviving params. Pure per-row string/HOF work (codegen, no
    * shuffle) followed by one groupBy on the canonical key — the same
    * plan shape as exact dedup, and the oracle proves both engines agree
    * on every canonical form. */
  def qUrlCanonical(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.documents(s, d).select(expr(
        "concat('https://WWW.Crawl-', source, '.Example.COM/doc/', doc_id, " +
        "'?utm_source=rss&ref=', doc_id % 7, '&utm_medium=feed#sec-', doc_id % 3)")
        .as("raw_url"))
      .unionByName(Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
        .select(expr(
          "concat('http://crawl-', source, '.example.com/doc/', doc_id, '?ref=', doc_id % 7)")
          .as("raw_url")))
    raw
      .withColumn("nosch", expr(
        "regexp_replace(split_part(raw_url, '#', 1), '^https?://', '')"))
      .withColumn("host", expr("split_part(nosch, '/', 1)"))
      .withColumn("rest", expr("substring(nosch, length(host) + 1)"))
      .withColumn("path", expr("split_part(rest, '?', 1)"))
      .withColumn("query", expr(
        "CASE WHEN instr(rest, '?') > 0 THEN substring(rest, instr(rest, '?') + 1) ELSE '' END"))
      .withColumn("all_params", expr("filter(split(query, '&'), p -> p != '')"))
      .withColumn("kept", expr(
        "filter(all_params, p -> NOT (startswith(p, 'utm_') OR startswith(p, 'fbclid=') OR startswith(p, 'gclid=')))"))
      .withColumn("canonical_url", expr(
        "concat(regexp_replace(lower(host), '^www\\\\.', ''), path, " +
        "CASE WHEN size(kept) > 0 THEN concat('?', array_join(array_sort(kept), '&')) ELSE '' END)"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).cast("long").as("n_raw"),
        min(col("raw_url")).as("keep_url"),
        sum(expr("size(all_params) - size(kept)")).cast("long").as("n_tracking_dropped"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_url_canonical" -> (qUrlCanonical _),
    "q_quality_dup_contingency" -> (qQualityDupContingency _),
    "q_mix_greedy_quality" -> (qMixGreedyQuality _),
    "q_filter_attribution" -> (qFilterAttribution _),
    "q_dsir_resample" -> (qDsirResample _),
    "q_length_buckets" -> (qLengthBuckets _),
    "q_neyman_alloc" -> (qNeymanAlloc _),
    "q_quantile_norm" -> (qQuantileNorm _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_mix_budget" -> (qMixBudget _),
    "q_zorder_layout" -> (qZorderLayout _),
    "q_zonemap_prune" -> (qZonemapPrune _),
    "q_k_anon" -> (qKAnon _),
    "q_ldiversity" -> (qLDiversity _),
    "q_t_closeness" -> (qTCloseness _),
    "q_dp_histogram" -> (qDpHistogram _),
    "q_dp_quantile" -> (qDpQuantile _),
    "q_dp_mean" -> (qDpMean _),
    "q_dp_topk" -> (qDpTopk _),
    "q_compaction_plan" -> (qCompactionPlan _),
    "q_dataset_card" -> (qDatasetCard _),
    "q_split_leakage" -> (qSplitLeakage _),
    "q_split_repair" -> (qSplitRepair _),
    "q_reservoir_sample" -> (qReservoirSample _),
    "q_split_stratified" -> (qSplitStratified _),
    "q_shard_layout" -> (qShardLayout _),
    "q_mix_temperature" -> (qMixTemperature _),
    "q_seq_pack" -> (qSeqPack _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_curriculum_schedule" -> (qCurriculumSchedule _),
    "q_curation_pipeline" -> (qCurationPipeline _))

  val oracle: Map[String, String] = Map(
    "q_url_canonical" ->
      """WITH raw AS (
        |  SELECT concat('https://WWW.Crawl-', source, '.Example.COM/doc/', doc_id,
        |    '?utm_source=rss&ref=', doc_id % 7, '&utm_medium=feed#sec-', doc_id % 3) AS raw_url
        |  FROM documents
        |  UNION ALL
        |  SELECT concat('http://crawl-', source, '.example.com/doc/', doc_id,
        |    '?ref=', doc_id % 7) AS raw_url
        |  FROM documents WHERE doc_id % 3 = 0),
        |p1 AS (
        |  SELECT raw_url,
        |    regexp_replace(split_part(raw_url, '#', 1), '^https?://', '') AS nosch
        |  FROM raw),
        |p2 AS (
        |  SELECT raw_url, nosch, split_part(nosch, '/', 1) AS host,
        |    substring(nosch, length(split_part(nosch, '/', 1)) + 1) AS rest
        |  FROM p1),
        |p3 AS (
        |  SELECT raw_url, host, split_part(rest, '?', 1) AS path,
        |    CASE WHEN instr(rest, '?') > 0 THEN substring(rest, instr(rest, '?') + 1)
        |      ELSE '' END AS query
        |  FROM p2),
        |p4 AS (
        |  SELECT raw_url, host, path,
        |    list_filter(string_split(query, '&'), p -> p != '') AS all_params
        |  FROM p3),
        |p5 AS (
        |  SELECT raw_url, host, path, all_params,
        |    list_filter(all_params, p -> NOT (starts_with(p, 'utm_')
        |      OR starts_with(p, 'fbclid=') OR starts_with(p, 'gclid='))) AS kept
        |  FROM p4),
        |c AS (
        |  SELECT raw_url,
        |    concat(regexp_replace(lower(host), '^www[.]', ''), path,
        |      CASE WHEN len(kept) > 0
        |        THEN concat('?', array_to_string(list_sort(kept), '&')) ELSE '' END)
        |      AS canonical_url,
        |    len(all_params) - len(kept) AS dropped
        |  FROM p5)
        |SELECT canonical_url, COUNT(*) AS n_raw, MIN(raw_url) AS keep_url,
        |  CAST(SUM(dropped) AS BIGINT) AS n_tracking_dropped
        |FROM c GROUP BY canonical_url""".stripMargin,
    "q_quality_dup_contingency" -> {
      val stopList = TextAnalysis.inList(TextAnalysis.stopEn)
      s"""WITH ${Dedup.lshJChain},
         |pairs AS (
         |  SELECT a_id, b_id FROM j WHERE CAST(n_inter AS DOUBLE) / n_union >= 0.5),
         |dup AS (SELECT DISTINCT doc_id FROM (
         |  SELECT a_id AS doc_id FROM pairs UNION ALL SELECT b_id FROM pairs)),
         |cw AS (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
         |flags AS (SELECT cw.doc_id,
         |    (len(words) >= 20
         |      AND len(list_filter(words, x -> x IN $stopList)) * 2 <= len(words)
         |      AND len(list_filter(words, x -> x IN $stopList)) > 0) AS pass
         |  FROM cw),
         |base AS (SELECT pass, (d.doc_id IS NOT NULL) AS is_dup
         |  FROM flags f LEFT JOIN dup d ON d.doc_id = f.doc_id),
         |cells AS (SELECT is_dup, pass, COUNT(*) AS n_obs FROM base GROUP BY 1, 2),
         |rt AS (SELECT is_dup, COUNT(*) AS n_dup_margin FROM base GROUP BY 1),
         |ct AS (SELECT pass, COUNT(*) AS n_pass_margin FROM base GROUP BY 1),
         |tt AS (SELECT COUNT(*) AS n_total FROM base)
         |SELECT is_dup, pass, n_obs, n_dup_margin, n_pass_margin,
         |  round(CAST(n_dup_margin * n_pass_margin AS DOUBLE) / n_total, 6) AS expected,
         |  round(CAST(n_obs * n_total - n_dup_margin * n_pass_margin AS DOUBLE)
         |    * CAST(n_obs * n_total - n_dup_margin * n_pass_margin AS DOUBLE)
         |    / (CAST(n_total AS DOUBLE) * n_dup_margin * n_pass_margin), 6) AS contrib
         |FROM cells JOIN rt USING (is_dup) JOIN ct USING (pass) CROSS JOIN tt""".stripMargin
    },
    "q_mix_greedy_quality" -> {
      val stopList = TextAnalysis.inList(TextAnalysis.stopEn)
      s"""WITH w AS (SELECT source, string_split(text, ' ') AS words FROM documents),
         |f AS (SELECT source, len(words) AS n_words,
         |    len(list_filter(words, x -> x IN $stopList)) AS n_stop FROM w),
         |per AS (SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(CASE WHEN n_words >= 20 AND n_stop * 2 <= n_words AND n_stop > 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |    CAST(SUM(n_words) AS BIGINT) AS avail_tokens
         |  FROM f GROUP BY 1),
         |q AS (SELECT *, divide(n_pass * 1000000, n_docs) AS quality_ppm FROM per),
         |t AS (SELECT CAST(SUM(avail_tokens) AS BIGINT) AS tot_tokens FROM q),
         |r AS (SELECT q.*, divide(tot_tokens * 2, 5) AS budget,
         |    LEAST(avail_tokens, divide((divide(tot_tokens * 2, 5)), 2)) AS cap_tokens,
         |    CAST(ROW_NUMBER() OVER (ORDER BY quality_ppm DESC, source) AS INTEGER) AS rank,
         |    CAST(SUM(LEAST(avail_tokens, divide((divide(tot_tokens * 2, 5)), 2)))
         |      OVER (ORDER BY quality_ppm DESC, source
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumcap
         |  FROM q CROSS JOIN t)
         |SELECT rank, source, quality_ppm, n_docs, avail_tokens, cap_tokens,
         |  LEAST(budget, cumcap) - LEAST(budget, cumcap - cap_tokens) AS taken_tokens,
         |  (LEAST(budget, cumcap) - LEAST(budget, cumcap - cap_tokens)) < cap_tokens
         |    AS budget_bound
         |FROM r""".stripMargin
    },
    "q_filter_attribution" -> {
      val stopList = TextAnalysis.inList(TextAnalysis.stopEn)
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |f0 AS (SELECT doc_id, words, len(words) AS n_words,
         |    list_sum(list_transform(words, x -> length(x))) AS n_charsw,
         |    len(list_filter(words, x -> x IN $stopList)) AS n_stop,
         |    CASE WHEN len(words) >= 2
         |      THEN list_transform(range(1, len(words)), i -> list_extract(words, i) || ' ' || list_extract(words, i + 1))
         |      ELSE list_transform(list_value(), tav -> CAST(tav AS STRING)) END AS g2
         |  FROM w),
         |f1 AS (SELECT *, COALESCE(list_max(list_transform(list_distinct(g2),
         |      t -> len(list_filter(g2, x -> x = t)))), 0) AS max2, len(g2) AS tot2
         |  FROM f0),
         |fl AS (SELECT n_words < 20 AS f_size, n_stop = 0 AS f_lang,
         |    n_stop * 2 > n_words AS f_soup,
         |    (n_charsw < n_words * 3 OR n_charsw > n_words * 10) AS f_wlen,
         |    max2 * 5 > tot2 AS f_rep
         |  FROM f1),
         |a AS (SELECT COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN f_size THEN 1 ELSE 0 END) AS BIGINT) AS fail_size,
         |  CAST(SUM(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT) AS fail_lang,
         |  CAST(SUM(CASE WHEN f_soup THEN 1 ELSE 0 END) AS BIGINT) AS fail_soup,
         |  CAST(SUM(CASE WHEN f_wlen THEN 1 ELSE 0 END) AS BIGINT) AS fail_wlen,
         |  CAST(SUM(CASE WHEN f_rep THEN 1 ELSE 0 END) AS BIGINT) AS fail_rep,
         |  CAST(SUM(CASE WHEN f_size AND NOT f_lang AND NOT f_soup AND NOT f_wlen AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS uniq_size,
         |  CAST(SUM(CASE WHEN f_lang AND NOT f_size AND NOT f_soup AND NOT f_wlen AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS uniq_lang,
         |  CAST(SUM(CASE WHEN f_soup AND NOT f_size AND NOT f_lang AND NOT f_wlen AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS uniq_soup,
         |  CAST(SUM(CASE WHEN f_wlen AND NOT f_size AND NOT f_lang AND NOT f_soup AND NOT f_rep THEN 1 ELSE 0 END) AS BIGINT) AS uniq_wlen,
         |  CAST(SUM(CASE WHEN f_rep AND NOT f_size AND NOT f_lang AND NOT f_soup AND NOT f_wlen THEN 1 ELSE 0 END) AS BIGINT) AS uniq_rep,
         |  CAST(SUM(CASE WHEN f_size THEN 1 ELSE 0 END) AS BIGINT) AS cum_size,
         |  CAST(SUM(CASE WHEN f_lang AND NOT f_size THEN 1 ELSE 0 END) AS BIGINT) AS cum_lang,
         |  CAST(SUM(CASE WHEN f_soup AND NOT f_size AND NOT f_lang THEN 1 ELSE 0 END) AS BIGINT) AS cum_soup,
         |  CAST(SUM(CASE WHEN f_wlen AND NOT f_size AND NOT f_lang AND NOT f_soup THEN 1 ELSE 0 END) AS BIGINT) AS cum_wlen,
         |  CAST(SUM(CASE WHEN f_rep AND NOT f_size AND NOT f_lang AND NOT f_soup AND NOT f_wlen THEN 1 ELSE 0 END) AS BIGINT) AS cum_rep
         |  FROM fl)
         |SELECT 'size' AS rule, n_total, fail_size AS n_fail, uniq_size AS n_unique_fail, cum_size AS n_cum_removed FROM a
         |UNION ALL SELECT 'lang', n_total, fail_lang, uniq_lang, cum_lang FROM a
         |UNION ALL SELECT 'stop_soup', n_total, fail_soup, uniq_soup, cum_soup FROM a
         |UNION ALL SELECT 'word_len', n_total, fail_wlen, uniq_wlen, cum_wlen FROM a
         |UNION ALL SELECT 'repetition', n_total, fail_rep, uniq_rep, cum_rep FROM a""".stripMargin
    },
    "q_dsir_resample" ->
      """WITH t AS (SELECT doc_id, source, string_split(lower(text), ' ') AS words
        |  FROM documents),
        |tok AS (SELECT doc_id, source IN ('src0', 'src1') AS is_t,
        |    list_sum(list_transform(range(1, 7), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(u.w), 1, 6), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 6 - hxi) AS BIGINT))) % 1024 AS b
        |  FROM t, LATERAL unnest(words) AS u(w)),
        |tot AS (SELECT CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS tt,
        |    CAST(SUM(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS tq FROM tok),
        |tc AS (SELECT b, COUNT(*) AS nt FROM tok WHERE is_t GROUP BY 1),
        |qc AS (SELECT b, COUNT(*) AS nq FROM tok WHERE NOT is_t GROUP BY 1),
        |lr AS (SELECT qc.b,
        |    CAST(floor((ln((COALESCE(nt, 0) + 1) / CAST(tt + 1024 AS DOUBLE))
        |      - ln((nq + 1) / CAST(tq + 1024 AS DOUBLE))) * 1e9) AS BIGINT) AS lr_fp
        |  FROM qc LEFT JOIN tc USING (b) CROSS JOIN tot),
        |pd AS (SELECT doc_id, b, COUNT(*) AS nb FROM tok WHERE NOT is_t GROUP BY 1, 2),
        |w AS (SELECT doc_id, CAST(SUM(nb * lr_fp) AS BIGINT) AS w_fp
        |  FROM pd JOIN lr USING (b) GROUP BY 1),
        |raw AS (SELECT doc_id, source, CAST(len(words) AS INTEGER) AS n_tokens
        |  FROM t WHERE source NOT IN ('src0', 'src1'))
        |SELECT r.doc_id, r.source, r.n_tokens, w_fp,
        |  round(CAST(w_fp AS DOUBLE) / 1e9, 6) AS log_weight
        |FROM raw r JOIN w USING (doc_id)
        |ORDER BY w_fp DESC, doc_id LIMIT 100""".stripMargin,
    "q_curriculum_schedule" ->
      s"""WITH px AS (${TextAnalysis.oracle("q_lm_perplexity")}),
         |t AS (SELECT COUNT(*) AS n FROM px),
         |r AS (SELECT xent, ROW_NUMBER() OVER (ORDER BY xent, doc_id) AS rn FROM px),
         |b AS (SELECT xent AS bx FROM r
         |  WHERE rn IN (SELECT divide((k * n), 4) FROM t, LATERAL unnest(list_value(1, 2, 3)) AS u(k))),
         |sc AS (SELECT p.*,
         |    CAST(1 + (SELECT COUNT(*) FROM b WHERE p.xent > b.bx) AS INTEGER) AS stage
         |  FROM px p)
         |SELECT stage, COUNT(*) AS n_docs,
         |  CAST(SUM(n_grams) AS BIGINT) AS n_grams_total,
         |  MIN(xent) AS xent_min, MAX(xent) AS xent_max
         |FROM sc GROUP BY 1""".stripMargin,
    // the leakage pair chain + recursive CC + cluster-atomic reassign;
    // the leaks_after column is the proof the repair worked
    "q_split_repair" ->
      s"""WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |sh AS (SELECT doc_id, ${Dedup.shinglesSql} AS shingles FROM w),
         |hs AS (SELECT doc_id, shingles, ${Dedup.hashesSql} AS hashes FROM sh),
         |sg AS (SELECT doc_id, ${Dedup.sigSql} AS sig, list_distinct(shingles) AS sset
         |  FROM hs WHERE len(hashes) >= 1),
         |bands AS (
         |  SELECT doc_id, b AS band_idx,
         |    array_to_string(list_slice(sig, b*4+1, b*4+4), '-') AS band_hash
         |  FROM sg, LATERAL unnest(range(0, 4)) AS t(b)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM bands x JOIN bands y
         |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |j AS (
         |  SELECT a_id, b_id,
         |    len(list_distinct(list_intersect(sa.sset, sb.sset))) AS n_inter,
         |    len(sa.sset) + len(sb.sset) - len(list_distinct(list_intersect(sa.sset, sb.sset))) AS n_union
         |  FROM cand JOIN sg sa ON cand.a_id = sa.doc_id JOIN sg sb ON cand.b_id = sb.doc_id),
         |pairs AS (SELECT a_id, b_id FROM j WHERE CAST(n_inter AS DOUBLE) / n_union >= 0.5),
         |sp AS (SELECT doc_id,
         |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'validation' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |      list_sum(list_transform(range(1, 5), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(CAST(doc_id AS STRING)), 1, 4), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 4 - hxi) AS BIGINT))) % 100 AS b
         |    FROM documents)),
         |edges AS (
         |  SELECT a_id, b_id FROM pairs UNION ALL SELECT b_id AS a_id, a_id AS b_id FROM pairs),
         |${Dedup.ccLabelsSql},
         |canon AS (SELECT l.cluster_id, sp.split AS cluster_split
         |  FROM labels l JOIN sp ON sp.doc_id = l.id WHERE l.id = l.cluster_id),
         |rep AS (SELECT sp.doc_id, sp.split AS old_split,
         |    COALESCE(c.cluster_split, sp.split) AS new_split
         |  FROM sp LEFT JOIN labels l ON l.id = sp.doc_id
         |  LEFT JOIN canon c ON c.cluster_id = l.cluster_id),
         |lk AS (SELECT CAST(COUNT(*) AS BIGINT) AS leaks_after FROM pairs p
         |  JOIN rep a ON a.doc_id = p.a_id JOIN rep b ON b.doc_id = p.b_id
         |  WHERE a.new_split <> b.new_split),
         |bef AS (SELECT old_split AS split, CAST(COUNT(*) AS BIGINT) AS n_before,
         |    CAST(SUM(CASE WHEN old_split <> new_split THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_out
         |  FROM rep GROUP BY 1),
         |aft AS (SELECT new_split AS split, CAST(COUNT(*) AS BIGINT) AS n_after,
         |    CAST(SUM(CASE WHEN old_split <> new_split THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_in
         |  FROM rep GROUP BY 1)
         |SELECT split, n_before, n_after, n_moved_in, n_moved_out, leaks_after
         |FROM bef JOIN aft USING (split) CROSS JOIN lk""".stripMargin,
    "q_split_leakage" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |sh AS (SELECT doc_id, ${Dedup.shinglesSql} AS shingles FROM w),
         |hs AS (SELECT doc_id, shingles, ${Dedup.hashesSql} AS hashes FROM sh),
         |sg AS (SELECT doc_id, ${Dedup.sigSql} AS sig, list_distinct(shingles) AS sset
         |  FROM hs WHERE len(hashes) >= 1),
         |bands AS (
         |  SELECT doc_id, b AS band_idx,
         |    array_to_string(list_slice(sig, b*4+1, b*4+4), '-') AS band_hash
         |  FROM sg, LATERAL unnest(range(0, 4)) AS t(b)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM bands x JOIN bands y
         |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |j AS (
         |  SELECT a_id, b_id,
         |    len(list_distinct(list_intersect(sa.sset, sb.sset))) AS n_inter,
         |    len(sa.sset) + len(sb.sset) - len(list_distinct(list_intersect(sa.sset, sb.sset))) AS n_union
         |  FROM cand JOIN sg sa ON cand.a_id = sa.doc_id JOIN sg sb ON cand.b_id = sb.doc_id),
         |pairs AS (SELECT a_id, b_id FROM j WHERE CAST(n_inter AS DOUBLE) / n_union >= 0.5),
         |sp AS (SELECT doc_id,
         |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'validation' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |      list_sum(list_transform(range(1, 5), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(CAST(doc_id AS STRING)), 1, 4), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 4 - hxi) AS BIGINT))) % 100 AS b
         |    FROM documents)),
         |cells AS (SELECT least(a.split, b.split) AS split_a,
         |    greatest(a.split, b.split) AS split_b, COUNT(*) AS n_pairs
         |  FROM pairs p JOIN sp a ON a.doc_id = p.a_id JOIN sp b ON b.doc_id = p.b_id
         |  GROUP BY 1, 2),
         |t AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_total FROM cells)
         |SELECT split_a, split_b, n_pairs, split_a <> split_b AS is_leak,
         |  round(CAST(n_pairs AS DOUBLE) / n_total, 6) AS pair_share
         |FROM cells CROSS JOIN t""".stripMargin,
    "q_dataset_card" ->
      """WITH base AS (
        |  SELECT doc_id, source, lang, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w
        |  FROM documents),
        |core AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(w) AS BIGINT) AS n_tokens
        |  FROM base GROUP BY 1),
        |dups AS (SELECT source, CAST(SUM(c - 1) AS BIGINT) AS n_dup_docs
        |  FROM (SELECT source, h, COUNT(*) AS c FROM base GROUP BY 1, 2) GROUP BY 1),
        |lc AS (SELECT source, lang, COUNT(*) AS c FROM base GROUP BY 1, 2),
        |langs AS (SELECT source, COUNT(*) AS n_langs, CAST(SUM(c) AS BIGINT) AS nl,
        |    list_sort(list(list_value(lang, CAST(c AS STRING)))) AS ls
        |  FROM lc GROUP BY 1),
        |le AS (SELECT source, n_langs,
        |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(ls, x -> (CAST(list_extract(x, 2) AS DOUBLE) / CAST(nl AS DOUBLE)) * ln(CAST(list_extract(x, 2) AS DOUBLE) / CAST(nl AS DOUBLE)))),
        |      (a, b) -> a - b), 6) AS lang_entropy
        |  FROM langs),
        |wd AS (SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
        |gb AS (SELECT doc_id, source, len(words) AS n_words,
        |    CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words) AS mwl
        |  FROM wd),
        |g2 AS (SELECT doc_id, unnest(CASE WHEN len(words) < 2 THEN list_value()
        |    ELSE list_transform(range(1, len(words)), i -> list_extract(words, i) || ' ' || list_extract(words, i+1)) END) AS g
        |  FROM wd),
        |gc AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
        |rep AS (SELECT doc_id, MAX(c) AS max2, SUM(c) AS tot2 FROM gc GROUP BY 1),
        |q AS (SELECT b.source,
        |    CAST(SUM(CASE WHEN (b.mwl >= 3 AND b.mwl <= 10)
        |      AND (CAST(max2 AS DOUBLE) / tot2 <= 0.2) AND (b.n_words >= 20)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |  FROM gb b JOIN rep USING (doc_id) GROUP BY 1)
        |SELECT core.source, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / n_docs, 6) AS mean_tokens,
        |  n_dup_docs, round(CAST(n_dup_docs AS DOUBLE) / n_docs, 6) AS dup_rate,
        |  n_pass, round(CAST(n_pass AS DOUBLE) / n_docs, 6) AS quality_rate,
        |  n_langs, lang_entropy
        |FROM core JOIN dups ON dups.source = core.source
        |JOIN le ON le.source = core.source
        |JOIN q ON q.source = core.source""".stripMargin,
    "q_ldiversity" ->
      """WITH s AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(json_extract(props, '$.k') AS INTEGER) AS sens
        |  FROM events),
        |vc AS (SELECT event_type, day, sens, COUNT(*) AS c FROM s GROUP BY 1, 2, 3),
        |cell AS (SELECT event_type, day, CAST(SUM(c) AS BIGINT) AS n_rows,
        |    COUNT(*) AS l_distinct, CAST(MAX(c) AS BIGINT) AS top_count
        |  FROM vc GROUP BY 1, 2)
        |SELECT event_type, day, n_rows, l_distinct,
        |  round(CAST(top_count AS DOUBLE) / n_rows, 6) AS top_share,
        |  (l_distinct < 3 OR CAST(top_count AS DOUBLE) / n_rows > 0.8) AS at_risk
        |FROM cell""".stripMargin,
    "q_compaction_plan" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars, md5(CAST(doc_id AS STRING)) AS hh,
        |    CAST(list_sum(list_transform(range(1, 5), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(CAST(doc_id AS STRING)), 1, 4), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 4 - hxi) AS BIGINT))) % 16 AS BIGINT) AS shard_id
        |  FROM documents),
        |p AS (
        |  SELECT shard_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY hh, doc_id) AS pos
        |  FROM h),
        |f AS (
        |  SELECT shard_id, divide((pos - 1), 8) AS frag_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS bytes
        |  FROM p GROUP BY 1, 2),
        |b AS (
        |  SELECT shard_id, n_docs, bytes,
        |    divide(COALESCE(CAST(SUM(bytes) OVER (PARTITION BY shard_id
        |      ORDER BY bytes DESC, frag_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0), 8192) AS bin_id
        |  FROM f),
        |a AS (
        |  SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_frags,
        |    CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |    CAST(SUM(bytes) AS BIGINT) AS bytes_total,
        |    CAST(COUNT(DISTINCT bin_id) AS BIGINT) AS n_bins
        |  FROM b GROUP BY 1)
        |SELECT shard_id, n_frags, n_docs, bytes_total, n_bins,
        |  n_frags - n_bins AS files_saved,
        |  round(CAST(bytes_total AS DOUBLE) / (n_bins * 8192), 6) AS fill_ratio
        |FROM a""".stripMargin,
    "q_dp_mean" ->
      """WITH cells AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(least(greatest(n_chars, 0), 1000)) AS BIGINT) AS sum_clamped
        |  FROM documents GROUP BY 1),
        |eps AS (SELECT eps_label, CAST(eps AS DOUBLE) AS eps
        |  FROM (VALUES ('e01', 0.1), ('e1', 1.0), ('e10', 10.0)) AS t(eps_label, eps)),
        |nz AS (
        |  SELECT eps_label, eps, lang, n, sum_clamped,
        |    (list_sum(list_transform(range(1, 13), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(lang || '|' || eps_label || '|' || 'sum'),
        |       1, 12), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 12 - hxi) AS BIGINT))) + 0.5) / 281474976710656.0 AS us,
        |    (list_sum(list_transform(range(1, 13), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(lang || '|' || eps_label || '|' || 'cnt'),
        |       1, 12), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 12 - hxi) AS BIGINT))) + 0.5) / 281474976710656.0 AS uc
        |  FROM cells CROSS JOIN eps),
        |n2 AS (
        |  SELECT eps_label, eps, lang, n, sum_clamped,
        |    sum_clamped + (-(1000.0 / eps) * sign(us - 0.5)
        |      * ln(1 - 2 * abs(us - 0.5))) AS noisy_sum,
        |    greatest(n + (-(1.0 / eps) * sign(uc - 0.5)
        |      * ln(1 - 2 * abs(uc - 0.5))), 1.0) AS noisy_n
        |  FROM nz),
        |m AS (
        |  SELECT eps_label, eps, lang, n,
        |    CAST(sum_clamped AS DOUBLE) / n AS true_mean_raw,
        |    noisy_sum / noisy_n AS dp_mean_raw
        |  FROM n2)
        |SELECT eps_label, eps, lang, n,
        |  round(true_mean_raw, 6) AS true_mean,
        |  round(dp_mean_raw, 6) AS dp_mean,
        |  round(abs(dp_mean_raw - true_mean_raw) / true_mean_raw, 6) AS rel_err
        |FROM m""".stripMargin,
    "q_dp_quantile" ->
      """WITH bc AS (
        |  SELECT divide(n_chars, 100) AS bucket, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |cum AS (
        |  SELECT bucket, c,
        |    CAST(SUM(c) OVER (ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumle,
        |    (SELECT CAST(SUM(c) AS BIGINT) FROM bc) AS n
        |  FROM bc),
        |us AS (SELECT bucket, cumle, n, -abs(2 * cumle - n) AS u_score FROM cum),
        |eps AS (SELECT eps_label, CAST(eps AS DOUBLE) AS eps
        |  FROM (VALUES ('e0001', 0.001), ('e001', 0.01), ('e01', 0.1)) AS t(eps_label, eps)),
        |sc AS (
        |  SELECT eps_label, eps, bucket, u_score,
        |    eps * u_score / 4.0 - ln(-ln(
        |      (list_sum(list_transform(range(1, 13), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(CAST(bucket AS STRING) || '|' || eps_label),
        |         1, 12), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 12 - hxi) AS BIGINT))) + 0.5) / 281474976710656.0)) AS score
        |  FROM us CROSS JOIN eps),
        |pick AS (
        |  SELECT eps_label, eps, bucket,
        |    ROW_NUMBER() OVER (PARTITION BY eps_label
        |      ORDER BY score DESC, bucket) AS rk
        |  FROM sc),
        |med AS (
        |  SELECT CAST(bucket AS BIGINT) AS opt_bucket
        |  FROM us ORDER BY u_score DESC, bucket LIMIT 1)
        |SELECT eps_label, eps, CAST(bucket AS BIGINT) AS chosen_bucket,
        |  opt_bucket,
        |  abs(CAST(bucket AS BIGINT) - opt_bucket) AS bucket_err
        |FROM pick CROSS JOIN med WHERE rk = 1""".stripMargin,
    "q_dp_topk" ->
      """WITH w AS (
        |  SELECT DISTINCT doc_id, word FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)),
        |dfreq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM w GROUP BY 1),
        |tru AS (SELECT word, df FROM dfreq ORDER BY df DESC, word LIMIT 10),
        |ts AS (SELECT CAST(SUM(df) AS BIGINT) AS df_true_sum FROM tru),
        |eps AS (SELECT eps_label, CAST(eps AS DOUBLE) AS eps
        |  FROM (VALUES ('e001', 0.01), ('e01', 0.1), ('e1', 1.0)) AS t(eps_label, eps)),
        |sc AS (
        |  SELECT eps_label, eps, word, df,
        |    eps * df / 20.0 - ln(-ln(
        |      (list_sum(list_transform(range(1, 13), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(word || '|' || eps_label), 1, 12), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 12 - hxi) AS BIGINT)))
        |        + 0.5) / 281474976710656.0)) AS score
        |  FROM dfreq CROSS JOIN eps),
        |rel AS (
        |  SELECT eps_label, eps, word, df,
        |    ROW_NUMBER() OVER (PARTITION BY eps_label ORDER BY score DESC, word) AS rk
        |  FROM sc),
        |agg AS (
        |  SELECT eps_label, MAX(eps) AS eps,
        |    CAST(SUM(CASE WHEN tru.word IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        |    CAST(SUM(rel.df) AS BIGINT) AS df_rel_sum
        |  FROM rel LEFT JOIN tru ON rel.word = tru.word
        |  WHERE rk <= 10 GROUP BY 1)
        |SELECT eps_label, eps, CAST(10 AS BIGINT) AS k, n_overlap,
        |  round(CAST(n_overlap AS DOUBLE) / 10.0, 6) AS recall,
        |  round(CAST(df_rel_sum AS DOUBLE) / df_true_sum, 6) AS utility_ratio
        |FROM agg CROSS JOIN ts""".stripMargin,
    "q_t_closeness" ->
      """WITH s AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(json_extract(props, '$.k') AS INTEGER) AS sens
        |  FROM events),
        |vc AS (SELECT event_type, day, sens, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM s GROUP BY 1, 2, 3),
        |gdist AS (SELECT sens, CAST(COUNT(*) AS BIGINT) AS g FROM s GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
        |    CAST(COUNT(DISTINCT sens) AS BIGINT) AS m FROM s),
        |cells AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM s GROUP BY 1, 2),
        |ex AS (
        |  SELECT ce.event_type, ce.day, ce.n_rows, gl.sens, gl.g,
        |    COALESCE(vc.c, 0) AS c
        |  FROM cells ce CROSS JOIN gdist gl
        |  LEFT JOIN vc ON vc.event_type = ce.event_type
        |    AND vc.day = ce.day AND vc.sens = gl.sens),
        |cum AS (
        |  SELECT event_type, day, n_rows, sens,
        |    CAST(SUM(c) OVER w AS BIGINT) AS cum_c,
        |    CAST(SUM(g) OVER w AS BIGINT) AS cum_g
        |  FROM ex
        |  WINDOW w AS (PARTITION BY event_type, day ORDER BY sens
        |    ROWS UNBOUNDED PRECEDING)),
        |agg AS (
        |  SELECT event_type, day, n_rows,
        |    CAST(SUM(abs(cum_c * (SELECT n_total FROM tot)
        |      - cum_g * n_rows)) AS BIGINT) AS t_num
        |  FROM cum GROUP BY 1, 2, 3)
        |SELECT event_type, day, n_rows,
        |  round(CAST(t_num AS DOUBLE) / (n_rows * (SELECT n_total FROM tot)
        |    * ((SELECT m FROM tot) - 1)), 6) AS t,
        |  (CAST(t_num AS DOUBLE) / (n_rows * (SELECT n_total FROM tot)
        |    * ((SELECT m FROM tot) - 1)) > 0.1) AS at_risk
        |FROM agg""".stripMargin,
    "q_dp_histogram" ->
      """WITH h AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS true_n
        |  FROM documents GROUP BY 1, 2),
        |eps AS (SELECT eps_label, CAST(eps AS DOUBLE) AS eps
        |  FROM (VALUES ('e01', 0.1), ('e1', 1.0), ('e10', 10.0)) AS t(eps_label, eps)),
        |nz AS (
        |  SELECT eps_label, eps, true_n,
        |    (list_sum(list_transform(range(1, 13), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(lang || '|' || source || '|' || eps_label),
        |       1, 12), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 12 - hxi) AS BIGINT))) + 0.5) / 281474976710656.0 AS u
        |  FROM h CROSS JOIN eps),
        |n2 AS (
        |  SELECT eps_label, eps, true_n,
        |    -(1.0 / eps) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)) AS noise
        |  FROM nz),
        |a AS (
        |  SELECT eps_label, MAX(eps) AS eps, CAST(COUNT(*) AS BIGINT) AS n_cells,
        |    AVG(abs(noise)) AS mae_raw, MAX(abs(noise)) AS max_err_raw,
        |    AVG(true_n) AS mean_cell_raw,
        |    CAST(SUM(CASE WHEN abs(noise) <= CAST(0.1 AS DOUBLE) * true_n
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_within_10pct
        |  FROM n2 GROUP BY 1)
        |SELECT eps_label, eps, n_cells, round(mae_raw, 6) AS mae,
        |  round(max_err_raw, 6) AS max_abs_err,
        |  round(mae_raw / mean_cell_raw, 6) AS rel_mae, n_within_10pct
        |FROM a""".stripMargin,
    "q_k_anon" ->
      """WITH cells AS (
        |  SELECT lang, source, divide(n_chars, 200) AS len_bucket, COUNT(*) AS k
        |  FROM documents GROUP BY 1, 2, 3),
        |g AS (
        |  SELECT lang, source, len_bucket, k,
        |    divide(len_bucket, 4) AS gen_bucket,
        |    CAST(SUM(k) OVER (PARTITION BY lang, source, divide(len_bucket, 4)) AS BIGINT) AS k_gen
        |  FROM cells)
        |SELECT lang, source, CAST(len_bucket AS BIGINT) AS len_bucket,
        |  k, (k < 5) AS at_risk,
        |  CAST(gen_bucket AS BIGINT) AS gen_bucket, k_gen,
        |  (k_gen < 5) AS at_risk_after
        |FROM g""".stripMargin,
    "q_zonemap_prune" ->
      """WITH f1 AS (
        |  SELECT l_orderkey % 64 AS file_id, COUNT(*) AS n_rows,
        |    MIN(l_shipdate) AS d_min, MAX(l_shipdate) AS d_max,
        |    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1995-03-01 00:00:00'
        |             AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
        |             THEN 1 ELSE 0 END) AS n_match
        |  FROM lineitem GROUP BY 1),
        |f2 AS (
        |  SELECT (year(l_shipdate) - 1992) * 12 + month(l_shipdate) - 1 AS file_id,
        |    COUNT(*) AS n_rows,
        |    MIN(l_shipdate) AS d_min, MAX(l_shipdate) AS d_max,
        |    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1995-03-01 00:00:00'
        |             AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
        |             THEN 1 ELSE 0 END) AS n_match
        |  FROM lineitem GROUP BY 1),
        |a1 AS (
        |  SELECT 'natural' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
        |    CAST(SUM(CASE WHEN d_min < TIMESTAMP '1995-04-01 00:00:00'
        |               AND d_max >= TIMESTAMP '1995-03-01 00:00:00'
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_files_hit,
        |    CAST(SUM(n_rows) AS BIGINT) AS rows_total,
        |    CAST(SUM(CASE WHEN d_min < TIMESTAMP '1995-04-01 00:00:00'
        |               AND d_max >= TIMESTAMP '1995-03-01 00:00:00'
        |             THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
        |    CAST(SUM(n_match) AS BIGINT) AS rows_match
        |  FROM f1),
        |a2 AS (
        |  SELECT 'time_part' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
        |    CAST(SUM(CASE WHEN d_min < TIMESTAMP '1995-04-01 00:00:00'
        |               AND d_max >= TIMESTAMP '1995-03-01 00:00:00'
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_files_hit,
        |    CAST(SUM(n_rows) AS BIGINT) AS rows_total,
        |    CAST(SUM(CASE WHEN d_min < TIMESTAMP '1995-04-01 00:00:00'
        |               AND d_max >= TIMESTAMP '1995-03-01 00:00:00'
        |             THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
        |    CAST(SUM(n_match) AS BIGINT) AS rows_match
        |  FROM f2),
        |u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
        |SELECT layout, n_files, n_files_hit, rows_total, rows_scanned, rows_match,
        |  CAST(divide((n_files - n_files_hit) * 1000000, n_files) AS BIGINT) AS skip_ppm,
        |  CAST(divide(rows_scanned * 1000000, GREATEST(rows_match, 1)) AS BIGINT) AS amp_ppm
        |FROM u""".stripMargin,
    "q_length_buckets" ->
      """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |b AS (SELECT (divide((tok + 63), 64)) * 64 AS bucket_len, tok FROM t),
        |g AS (SELECT bucket_len, COUNT(*) AS n_docs,
        |    CAST(SUM(tok) AS BIGINT) AS sum_tokens
        |  FROM b GROUP BY 1)
        |SELECT CAST(bucket_len AS BIGINT) AS bucket_len, n_docs, sum_tokens,
        |  CAST(bucket_len * n_docs - sum_tokens AS BIGINT) AS padding,
        |  round(CAST(bucket_len * n_docs - sum_tokens AS DOUBLE)
        |    / (bucket_len * n_docs), 6) AS waste_pct,
        |  CAST(divide((bucket_len * n_docs + 8191), 8192) AS BIGINT) AS n_batches
        |FROM g""".stripMargin,
    "q_neyman_alloc" ->
      """WITH o AS (SELECT o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |g AS (SELECT o_orderpriority, COUNT(*) AS n_h,
        |    CAST(SUM(c) AS BIGINT) AS s1, SUM(c * c) AS s2
        |  FROM o GROUP BY 1),
        |h AS (SELECT o_orderpriority, n_h,
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_h)
        |      / (n_h - 1)) / 100.0 AS s_h
        |  FROM g),
        |w AS (SELECT *, CAST(floor(n_h * s_h * 1000.0) AS BIGINT) AS wt FROM h),
        |t AS (SELECT *, CAST(SUM(wt) OVER () AS BIGINT) AS sum_w FROM w),
        |b AS (SELECT *, CAST(divide((wt * 10000), sum_w) AS BIGINT) AS base,
        |    (wt * 10000) % sum_w AS rem FROM t),
        |r AS (SELECT *, CAST(10000 - SUM(base) OVER () AS BIGINT) AS deficit,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, o_orderpriority) AS rk FROM b)
        |SELECT o_orderpriority, n_h, round(s_h, 6) AS s_h,
        |  CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r""".stripMargin,
    "q_quantile_norm" ->
      """WITH d AS (SELECT source, n_chars, doc_id FROM documents),
        |t AS (SELECT COUNT(*) AS n_all FROM d),
        |g AS (
        |  SELECT n_chars,
        |    divide((ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1) * 20, (SELECT n_all FROM t)) AS gb
        |  FROM d),
        |ref AS (SELECT gb, CAST(MIN(n_chars) AS BIGINT) AS ref_lo FROM g GROUP BY 1),
        |r AS (
        |  SELECT source, n_chars,
        |    divide((ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) - 1) * 20, (COUNT(*) OVER (PARTITION BY source))) AS b
        |  FROM d),
        |sb AS (
        |  SELECT source, b, COUNT(*) AS n_docs, CAST(MIN(n_chars) AS BIGINT) AS src_lo
        |  FROM r GROUP BY 1, 2)
        |SELECT source, CAST(b AS INTEGER) AS bucket, n_docs, src_lo, ref_lo,
        |  ref_lo - src_lo AS shift
        |FROM sb JOIN ref ON sb.b = ref.gb""".stripMargin,
    "q_source_overlap" ->
      """WITH w AS (SELECT source, string_split(text, ' ') AS words FROM documents),
        |sp AS (
        |  SELECT DISTINCT source,
        |    md5(array_to_string(list_slice(words, i*10+1, i*10+10), ' ')) AS h
        |  FROM w, LATERAL unnest(range(0, divide((len(words) + 9), 10))) AS t(i)),
        |tot AS (SELECT source, COUNT(*) AS n_spans FROM sp GROUP BY 1),
        |p AS (
        |  SELECT x.source AS source_a, y.source AS source_b, COUNT(*) AS n_shared
        |  FROM sp x JOIN sp y ON x.h = y.h AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_shared, a.n_spans AS n_a, b.n_spans AS n_b,
        |  round(CAST(n_shared AS DOUBLE) / (a.n_spans + b.n_spans - n_shared), 6) AS jaccard
        |FROM p JOIN tot a ON p.source_a = a.source JOIN tot b ON p.source_b = b.source""".stripMargin,
    "q_mix_budget" ->
      """WITH tok AS (
        |  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |tots AS (
        |  SELECT COUNT(*) AS n_langs, CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens
        |  FROM tok),
        |base AS (
        |  SELECT lang, n_tokens, 2 * tot_tokens AS budget,
        |    divide((2 * tot_tokens), n_langs) AS desired,
        |    (divide((2 * tot_tokens), n_langs)) > 4 * n_tokens AS capped,
        |    least(divide((2 * tot_tokens), n_langs), 4 * n_tokens) AS assigned
        |  FROM tok CROSS JOIN tots),
        |spare AS (
        |  SELECT CAST(SUM(assigned) AS BIGINT) AS assigned_tot,
        |    CAST(SUM(CASE WHEN NOT capped THEN n_tokens ELSE 0 END) AS BIGINT) AS open_tokens
        |  FROM base)
        |SELECT lang, n_tokens, desired, capped,
        |  assigned + (CASE WHEN capped OR open_tokens = 0 THEN 0
        |    ELSE divide((budget - assigned_tot) * n_tokens, open_tokens) END) AS planned_tokens,
        |  round(CAST(assigned + (CASE WHEN capped OR open_tokens = 0 THEN 0
        |    ELSE divide((budget - assigned_tot) * n_tokens, open_tokens) END) AS DOUBLE) / n_tokens, 6) AS epochs
        |FROM base CROSS JOIN spare""".stripMargin,
    "q_zorder_layout" ->
      """WITH k AS (
        |  SELECT doc_id, lang,
        |    least(CAST(floor(n_chars / 64) AS BIGINT), 255) AS xb,
        |    list_sum(list_transform(range(1, 3), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(lang), 1, 2), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 2 - hxi) AS BIGINT))) AS yb
        |  FROM documents),
        |z AS (
        |  SELECT doc_id, lang, xb, yb,
        |    CAST(list_sum(list_transform(range(0, 8),
        |      i -> (((xb >> i) & 1) << (2 * i)) + (((yb >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS z
        |  FROM k)
        |SELECT CAST(divide(z, 256) AS BIGINT) AS zcell, COUNT(*) AS n_docs,
        |  CAST(MIN(z) AS BIGINT) AS z_min, CAST(MAX(z) AS BIGINT) AS z_max,
        |  CAST(MIN(xb) AS BIGINT) AS x_min, CAST(MAX(xb) AS BIGINT) AS x_max,
        |  CAST(MIN(yb) AS BIGINT) AS y_min, CAST(MAX(yb) AS BIGINT) AS y_max,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM z GROUP BY 1""".stripMargin,
    "q_reservoir_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang, md5(CAST(doc_id AS STRING)) AS h FROM documents),
        |r AS (
        |  SELECT doc_id, lang, h,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
        |  FROM h)
        |SELECT lang, COUNT(*) AS n_kept,
        |  CAST(MAX(rk) AS BIGINT) AS max_rank,
        |  CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
        |  MAX(h) AS max_hash
        |FROM r WHERE rk <= 20 GROUP BY 1""".stripMargin,
    "q_split_stratified" ->
      """WITH a AS (
        |  SELECT lang,
        |    CASE WHEN list_sum(list_transform(range(1, 5), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(CAST(doc_id AS STRING)), 1, 4), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 4 - hxi) AS BIGINT))) % 100 < 80
        |         THEN 'train'
        |         WHEN list_sum(list_transform(range(1, 5), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(CAST(doc_id AS STRING)), 1, 4), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 4 - hxi) AS BIGINT))) % 100 < 90
        |         THEN 'validation'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |g AS (SELECT lang, split, COUNT(*) AS n_docs FROM a GROUP BY 1, 2)
        |SELECT lang, split, n_docs,
        |  CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_total,
        |  round(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY lang), 6) AS frac
        |FROM g""".stripMargin,
    "q_shard_layout" ->
      """WITH h AS (
        |  SELECT doc_id, md5(CAST(doc_id AS STRING)) AS h,
        |    CAST(list_sum(list_transform(range(1, 5), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(CAST(doc_id AS STRING)), 1, 4), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 4 - hxi) AS BIGINT))) % 16 AS BIGINT) AS shard_id
        |  FROM documents)
        |SELECT doc_id, shard_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY h, doc_id) AS INTEGER) AS pos
        |FROM h""".stripMargin,
    "q_mix_temperature" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1),
        |r AS (
        |  SELECT source,
        |    round(sqrt(CAST((SELECT MIN(n_src) FROM c) AS DOUBLE) / n_src), 6) AS keep_rate
        |  FROM c),
        |k AS (
        |  SELECT d.source, r.keep_rate,
        |    (list_sum(list_transform(range(1, 5), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(CAST(d.doc_id AS STRING)), 1, 4), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 4 - hxi) AS BIGINT)))
        |      < CAST(round(r.keep_rate * 65536) AS BIGINT)) AS kept
        |  FROM documents d JOIN r USING (source))
        |SELECT source, COUNT(*) AS n_docs, MAX(keep_rate) AS keep_rate,
        |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM k GROUP BY 1""".stripMargin,
    "q_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT source, CAST(divide((cum - n_tok), 2048) AS BIGINT) AS bin_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q_weighted_sample" -> {
      val stopList = TextAnalysis.inList(TextAnalysis.stopEn)
      s"""WITH g AS (
         |  SELECT doc_id,
         |    CAST(len(words) AS INTEGER) AS n_words,
         |    (len(words) >= 20 AND len(list_filter(words, w -> w IN $stopList)) * 2 <= len(words)) AS pass_quality,
         |    (len(list_filter(words, w -> w IN $stopList)) > 0) AS pass_lang
         |  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
         |k AS (
         |  SELECT *,
         |    (list_sum(list_transform(range(1, 5), hxi -> CAST(instr('0123456789abcdef', substring(substring(md5(CAST(doc_id AS STRING)), 1, 4), CAST(hxi AS INT), 1)) - 1 AS BIGINT) * CAST(pow(16, 4 - hxi) AS BIGINT)))
         |      < CASE WHEN pass_quality AND pass_lang THEN 58982 ELSE 6554 END) AS kept
         |  FROM g)
         |SELECT pass_quality, pass_lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN kept THEN n_words ELSE 0 END) AS BIGINT) AS kept_words
         |FROM k GROUP BY 1, 2""".stripMargin
    },
    "q_curation_pipeline" -> {
      val stopList = TextAnalysis.inList(TextAnalysis.stopEn)
      s"""WITH ${Dedup.corpusSql},
         |flagged AS (
         |  SELECT doc_id, text, words,
         |    CAST(len(words) AS INTEGER) AS n_words,
         |    CAST(len(list_filter(words, w -> w IN $stopList)) AS INTEGER) AS n_stop
         |  FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM corpus)),
         |gated AS (
         |  SELECT *,
         |    (n_words >= 20 AND n_stop * 2 <= n_words) AS pass_quality,
         |    (n_stop > 0) AS pass_lang
         |  FROM flagged),
         |s1 AS (SELECT * FROM gated WHERE pass_quality AND pass_lang),
         |s2 AS (
         |  SELECT doc_id, text, words, n_words FROM (
         |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM s1)
         |  WHERE doc_id = keep_id),
         |sh AS (SELECT doc_id, n_words, ${Dedup.shinglesSql} AS shingles FROM s2),
         |hs AS (SELECT doc_id, n_words, shingles, ${Dedup.hashesSql} AS hashes FROM sh),
         |sg AS (SELECT doc_id, n_words, ${Dedup.sigSql} AS sig,
         |    list_distinct(shingles) AS sset FROM hs),
         |bands AS (
         |  SELECT doc_id, b AS band_idx,
         |    array_to_string(list_slice(sig, b*4+1, b*4+4), '-') AS band_hash
         |  FROM sg, LATERAL unnest(range(0, 4)) AS t(b)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM bands x JOIN bands y
         |    ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
         |drops AS (
         |  SELECT DISTINCT b_id FROM (
         |    SELECT a_id, b_id,
         |      CAST(len(list_distinct(list_intersect(sa.sset, sb.sset))) AS DOUBLE) /
         |        (len(sa.sset) + len(sb.sset)
         |         - len(list_distinct(list_intersect(sa.sset, sb.sset)))) AS jaccard
         |    FROM cand JOIN sg sa ON cand.a_id = sa.doc_id JOIN sg sb ON cand.b_id = sb.doc_id)
         |  WHERE jaccard >= 0.5),
         |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT b_id FROM drops)),
         |a1 AS (
         |  SELECT COUNT(*) AS n_total,
         |    CAST(SUM(CASE WHEN pass_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |    CAST(SUM(CASE WHEN pass_quality AND pass_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang
         |  FROM gated),
         |a2 AS (SELECT COUNT(*) AS n_exact FROM s2),
         |a3 AS (SELECT COUNT(*) AS n_final,
         |    CAST(SUM(n_words) AS BIGINT) AS final_ws_tokens FROM s3)
         |SELECT n_total, n_quality, n_lang, n_exact, n_final, final_ws_tokens
         |FROM a1, a2, a3""".stripMargin
    })
}
