package graft

/** The FULL SQL surface through Spark's frontend (r14 verdict item 4):
  * every one of the ~291 oracle SQL strings — the ANSI text DuckDB
  * executes as the correctness oracle — is swept through `spark.sql`
  * against the Hive-catalog tables WITH the graft DuckDB-dialect alias
  * layer installed ([[functions.DuckDbDialect]] — the same surface a
  * production session gets from GraftExtensions), and the outcome is
  * pinned three ways with ZERO silent skips:
  *
  *   - **identical**: strict driver-style canon (columns sorted by
  *     name, rows sorted, 12-significant-digit floats) equals the
  *     DataFrame form's — the query is fully catalog-servable.
  *   - **value-equal, type differs** ([[knownTypeDiff]]): every value
  *     numerically equal but a column is typed differently by the SQL
  *     frontend than by the DataFrame form (e.g. DECIMAL where the
  *     DataFrame casts to DOUBLE). Catalog users get correct values
  *     with a different declared type; each row names the construct.
  *   - **incompatible** ([[knownIncompatible]]): the text uses a
  *     DuckDB-ism Spark's parser/analyzer rejects (or evaluates to
  *     different values). Each row names the exact construct, so the
  *     matrix documents precisely which oracle strings are
  *     DuckDB-dialect rather than portable ANSI.
  *
  * The matrix is SELF-VERIFYING in both directions: an undocumented
  * divergence fails the spec, and a documented one that stops
  * diverging (e.g. a Spark upgrade adds the function) also fails, so
  * the committed lists can never go stale. A machine-readable copy is
  * written to `target/sql_compat.json` for the round record.
  */
class SqlCompatSpec extends SparkSpec {

  /** Oracle strings that are DuckDB dialect, not portable ANSI — the
    * construct each one needs is named. These queries' CORRECTNESS is
    * still driver-verified (Spark DataFrame vs DuckDB); this matrix is
    * only about whether the SAME TEXT runs on Spark's SQL frontend. */
  // GENERATED-MATRIX-BEGIN (regenerated from target/sql_compat.json)
  private val knownIncompatible: Map[String, String] = Map(
    "q_active_learning" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_ann_recall_matrix" -> "DuckDB list literal/index/slice `[...]`",
    "q_array_map_ops" -> "DuckDB list literal/index/slice `[...]`",
    "q_aspect_buckets" -> "DuckDB `//` integer-division operator",
    "q_attribution" -> "DuckDB `//` integer-division operator",
    "q_benford" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_bleu_pairs" -> "DuckDB list literal/index/slice `[...]`",
    "q_bpe_encode" -> "WITH ... AS MATERIALIZED hint",
    "q_bpe_merges" -> "WITH ... AS MATERIALIZED hint",
    "q_calibration" -> "DuckDB list literal/index/slice `[...]`",
    "q_cms_heavy_hitters" -> "DuckDB `//` integer-division operator",
    "q_cohort_retention" -> "DuckDB `//` integer-division operator",
    "q_compaction_plan" -> "DuckDB `//` integer-division operator",
    "q_cross_source_dup" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_curation_pipeline" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_curriculum_schedule" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_cusum" -> "DuckDB `//` integer-division operator",
    "q_dataset_card" -> "DuckDB struct literal `{...}`",
    "q_decile_lift" -> "DuckDB `//` integer-division operator",
    "q_decontaminate" -> "DuckDB list literal/index/slice `[...]`",
    "q_decontaminate_bloom" -> "DuckDB list literal/index/slice `[...]`",
    "q_dedup_canonical" -> "UNION (distinct) inside WITH RECURSIVE (Spark 4 supports UNION ALL only)",
    "q_dedup_cc_incremental" -> "UNION (distinct) inside WITH RECURSIVE (Spark 4 supports UNION ALL only)",
    "q_dedup_cc_largestar" -> "UNION (distinct) inside WITH RECURSIVE (Spark 4 supports UNION ALL only)",
    "q_dedup_cdc_chunks" -> "DuckDB list literal/index/slice `[...]`",
    "q_dedup_cluster_eval" -> "DuckDB `//` integer-division operator",
    "q_dedup_clusters" -> "UNION (distinct) inside WITH RECURSIVE (Spark 4 supports UNION ALL only)",
    "q_dedup_containment" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_dedup_eval" -> "DuckDB list literal/index/slice `[...]`",
    "q_dedup_explain" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_dedup_incremental" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_dedup_lsh_pairs" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_dedup_minhash_sig" -> "1-based list indexing `l[i]` (Spark arrays are 0-based; ANSI throws at the bound)",
    "q_dedup_ngram_jaccard" -> "1-based list indexing `l[i]` (Spark arrays are 0-based; ANSI throws at the bound)",
    "q_dedup_pairs_at_rest" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_dedup_pairs_incremental" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_dedup_simhash_pairs" -> "DuckDB list literal/index/slice `[...]`",
    "q_dedup_span" -> "DuckDB `//` integer-division operator",
    "q_dedup_substr" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_dedup_threshold_sweep" -> "DuckDB list literal/index/slice `[...]`",
    "q_dedup_winnow" -> "DuckDB list literal/index/slice `[...]`",
    "q_det_sample" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_doc_chunks" -> "DuckDB `//` integer-division operator",
    "q_doc_fingerprint" -> "1-based list indexing `l[i]` (Spark arrays are 0-based; ANSI throws at the bound)",
    "q_dp_histogram" -> "hex-string cast CAST('0x...' AS BIGINT) (DuckDB parses hex digits; Spark ANSI rejects)",
    "q_dp_mean" -> "hex-string cast CAST('0x...' AS BIGINT) (DuckDB parses hex digits; Spark ANSI rejects)",
    "q_dp_quantile" -> "DuckDB `//` integer-division operator",
    "q_dp_topk" -> "hex-string cast CAST('0x...' AS BIGINT) (DuckDB parses hex digits; Spark ANSI rejects)",
    "q_dpp_prune" -> "DuckDB function `strftime` (Spark: date_format with % patterns)",
    "q_dsir_resample" -> "correlated FROM-clause unnest/alias scope DuckDB resolves without LATERAL",
    "q_eb_shrinkage" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_edit_distance" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_emb_colstats" -> "HUGEINT data type",
    "q_emb_covariance" -> "DuckDB list literal/index/slice `[...]`",
    "q_embed_project" -> "1-based list indexing `l[i]` (Spark arrays are 0-based; ANSI throws at the bound)",
    "q_equidepth_hist" -> "DuckDB `//` integer-division operator",
    "q_event_gaps" -> "quoted datediff unit literal ('day' — Spark's parser wants an unquoted DAY identifier, pre-registry)",
    "q_ewma_anomaly" -> "DuckDB `//` integer-division operator",
    "q_explode_words" -> "DuckDB struct literal `{...}`",
    "q_feature_hash" -> "hex-string cast CAST('0x...' AS BIGINT) (DuckDB parses hex digits; Spark ANSI rejects)",
    "q_filter_attribution" -> "DuckDB list literal/index/slice `[...]`",
    "q_forecast_backtest" -> "DuckDB `//` integer-division operator",
    "q_fuzzy_match" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_gopher_quality" -> "DuckDB list literal/index/slice `[...]`",
    "q_graph_jaccard" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_graph_kcore" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_graph_pagerank" -> "DuckDB `//` integer-division operator",
    "q_graph_reach" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_graph_triangles" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_gw_auth_dispatch" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_gw_compress_decision" -> "backslash escapes in single-quoted literals: Spark reads '\\bdeflate\\b' with \\b as BACKSPACE chars, DuckDB keeps backslashes literal (escapedStringLiterals flips this globally)",
    "q_gw_pipeline" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_gw_route" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_hard_negatives" -> "DuckDB list literal/index/slice `[...]`",
    "q_heaps_law" -> "DuckDB `//` integer-division operator",
    "q_hill_tail" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_hits" -> "DuckDB `//` integer-division operator",
    "q_hll_precision_sweep" -> "DuckDB list literal/index/slice `[...]`",
    "q_holt_trend" -> "DuckDB `//` integer-division operator",
    "q_ivf_balance" -> "DuckDB list literal/index/slice `[...]`",
    "q_ivf_probe_sweep" -> "DuckDB list literal/index/slice `[...]`",
    "q_jackknife" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_join_size_sketch" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_k_anon" -> "DuckDB `//` integer-division operator",
    "q_kneser_ney" -> "correlated FROM-clause unnest/alias scope DuckDB resolves without LATERAL",
    "q_knn_classify" -> "DuckDB list literal/index/slice `[...]`",
    "q_knn_confusion" -> "DuckDB list literal/index/slice `[...]`",
    "q_label_noise" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_length_buckets" -> "DuckDB `//` integer-division operator",
    "q_lm_perplexity" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_lsh_band_sweep" -> "DuckDB `//` integer-division operator",
    "q_markov_stationary" -> "DuckDB `//` integer-division operator",
    "q_matryoshka_recall" -> "DuckDB list literal/index/slice `[...]`",
    "q_minhash_bbit" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_minhash_estimate" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_minhash_union" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_mix_budget" -> "DuckDB `//` integer-division operator",
    "q_mix_greedy_quality" -> "DuckDB `//` integer-division operator",
    "q_mix_temperature" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_mmr_diversify" -> "DuckDB list literal/index/slice `[...]`",
    "q_multimodal_audio" -> "DuckDB `//` integer-division operator",
    "q_multimodal_frames" -> "DuckDB `//` integer-division operator",
    "q_multimodal_patches" -> "DuckDB `//` integer-division operator",
    "q_multimodal_phash" -> "DuckDB `//` integer-division operator",
    "q_multimodal_phash_eval" -> "DuckDB `//` integer-division operator",
    "q_mutual_info" -> "DuckDB named-argument syntax `k := v` (struct_pack)",
    "q_naive_bayes" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_ndcg_eval" -> "DuckDB list literal/index/slice `[...]`",
    "q_negative_sampling" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_neyman_alloc" -> "DuckDB `//` integer-division operator",
    "q_ngram_novelty" -> "correlated FROM-clause unnest/alias scope DuckDB resolves without LATERAL",
    "q_pca_power" -> "DuckDB list literal/index/slice `[...]`",
    "q_phrase_search" -> "DuckDB function `generate_subscripts` (Spark: explode(sequence) form)",
    "q_pii_scrub" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_pivot_segments" -> "double-quoted string literal (Spark parses as identifier)",
    "q_poisson_bootstrap" -> "DuckDB `//` integer-division operator",
    "q_psi_drift" -> "DuckDB `//` integer-division operator",
    "q_quality_classifier" -> "DuckDB list literal/index/slice `[...]`",
    "q_quality_dup_contingency" -> "DuckDB list slice `l[a:b]` (Spark parses the colon form as a variant path)",
    "q_quantile_norm" -> "DuckDB `//` integer-division operator",
    "q_repetition_loops" -> "correlated FROM-clause unnest/alias scope DuckDB resolves without LATERAL",
    "q_resample_ffill" -> "IGNORE NULLS placement DuckDB accepts in that window form",
    "q_reservoir_sample" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_rfm_segments" -> "DuckDB `//` integer-division operator",
    "q_rolling_fingerprint" -> "HUGEINT data type",
    "q_rrf_fusion" -> "DuckDB list literal/index/slice `[...]`",
    "q_seasonal_decompose" -> "DuckDB `//` integer-division operator",
    "q_secret_scan" -> "DuckDB named-argument syntax `k := v` (struct_pack)",
    "q_semantic_dedup" -> "DuckDB list literal/index/slice `[...]`",
    "q_seq_pack" -> "DuckDB `//` integer-division operator",
    "q_seq_trigrams" -> "DuckDB `//` integer-division operator",
    "q_shard_layout" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_silhouette" -> "1-based list indexing `l[i]` (Spark arrays are 0-based; ANSI throws at the bound)",
    "q_sim_ann_lsh" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_ivf" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_ivf_at_rest" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_ivf_incremental" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_ivf_pq" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_ivf_pq_res" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_mips" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_neardup_pairs" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_pq" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_sq8" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_topk" -> "DuckDB list literal/index/slice `[...]`",
    "q_sim_topk_incremental" -> "DuckDB list literal/index/slice `[...]`",
    "q_source_overlap" -> "DuckDB `//` integer-division operator",
    "q_split_leakage" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_split_repair" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_split_stratified" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_string_ops" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_survival_km" -> "DuckDB `//` integer-division operator",
    "q_takedown_closure" -> "UNION (distinct) inside WITH RECURSIVE (Spark 4 supports UNION ALL only)",
    "q_takedown_purge" -> "UNION (distinct) inside WITH RECURSIVE (Spark 4 supports UNION ALL only)",
    "q_text_entropy" -> "DuckDB function `list_prepend` (Spark: concat(array(x), l))",
    "q_text_readability" -> "regexp_extract group index past the pattern's group count (DuckDB returns empty string)",
    "q_theilsen" -> "DuckDB `//` integer-division operator",
    "q_token_count" -> "regexp_extract group index past the pattern's group count (DuckDB returns empty string)",
    "q_token_js_drift" -> "correlated FROM-clause unnest/alias scope DuckDB resolves without LATERAL",
    "q_token_pmi" -> "1-based list indexing `l[i]` (Spark arrays are 0-based; ANSI throws at the bound)",
    "q_tokenizer_fertility" -> "regexp_extract group index past the pattern's group count (DuckDB returns empty string)",
    "q_video_dedup" -> "DuckDB `//` integer-division operator",
    "q_vocab_coverage" -> "DuckDB list literal/index/slice `[...]`",
    "q_vocab_encode" -> "ORDER BY inside an aggregate call (DuckDB list(x ORDER BY y))",
    "q_weighted_sample" -> "bare VARCHAR cast (DuckDB allows; Spark wants STRING/VARCHAR(n))",
    "q_wilson_rank" -> "DuckDB list literal/index/slice `[...]`",
    "q_window_interval" -> "quoted datediff unit literal ('day' — Spark's parser wants an unquoted DAY identifier, pre-registry)",
    "q_window_sliding" -> "DuckDB list literal/index/slice `[...]`",
    "q_winsorize" -> "DuckDB `//` integer-division operator",
    "q_zipf_fit" -> "DuckDB struct literal `{...}`",
    "q_zonemap_prune" -> "DuckDB `//` integer-division operator",
    "q_zorder_layout" -> "DuckDB `//` integer-division operator")

  /** Value-equal but differently typed through the SQL frontend. */
  private val knownTypeDiff: Map[String, String] = Map(
    "q_window_session" -> "window bounds typed TIMESTAMP by the SQL frontend vs TIMESTAMP_NTZ by the DataFrame form (values equal)")

  // GENERATED-MATRIX-END

  private def firstLine(s: String): String =
    Option(s).flatMap(_.linesIterator.find(_.trim.nonEmpty))
      .getOrElse("<no message>").trim.take(160)

  test("all oracle SQL via spark.sql: identical, value-equal-typed, or documented — zero silent skips") {
    CatalogFixture.registerCatalogTables(spark, sf)
    // the production catalog session carries the DuckDB-dialect aliases
    // via GraftExtensions; ad-hoc sessions get them from register() —
    // the sweep measures THAT surface (SURVEY round-15 addendum)
    functions.DuckDbDialect.register(spark)
    spark.sql(s"USE ${CatalogFixture.db}")
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    val outcomes = scala.collection.mutable.LinkedHashMap.empty[String, String]
    try {
      val names = SparkEntry.oracleSql.keys.toSeq.sorted
      assert(names.nonEmpty && names.size == SparkEntry.queries.size,
        s"oracleSql (${names.size}) and queries (${SparkEntry.queries.size}) drifted")
      names.foreach { name =>
        val sql = SparkEntry.oracleSql(name)
        // Right(true)=strict identical, Right(false)=loose-equal only,
        // Left(reason)=error or value divergence
        val outcome: Either[String, Boolean] =
          try {
            val viaSql = spark.sql(sql)
            val viaDf = SparkEntry.queries(name)(spark, sf)
            if (CatalogFixture.canon(viaSql) == CatalogFixture.canon(viaDf)) Right(true)
            else if (CatalogFixture.canonLoose(viaSql) == CatalogFixture.canonLoose(viaDf)) Right(false)
            else {
              val a = CatalogFixture.canonLoose(viaSql); val b = CatalogFixture.canonLoose(viaDf)
              Left(s"value divergence: sql ${a.size} rows vs df ${b.size}; first diff " +
                a.zipAll(b, "<missing>", "<missing>").find { case (x, y) => x != y }
                  .map { case (x, y) => s"[$x] vs [$y]" }.getOrElse("<none>"))
            }
          } catch {
            case t: Throwable => Left(s"${t.getClass.getSimpleName}: ${firstLine(t.getMessage)}")
          } finally CacheTracker.releaseQueryScope(spark)

        outcome match {
          case Right(true) =>
            outcomes(name) = "identical"
            if (knownIncompatible.contains(name))
              problems += s"$name: listed incompatible (${knownIncompatible(name)}) but ran identical — remove the stale entry"
            if (knownTypeDiff.contains(name))
              problems += s"$name: listed type-diff (${knownTypeDiff(name)}) but ran strictly identical — remove the stale entry"
          case Right(false) =>
            outcomes(name) = "type-differs"
            if (!knownTypeDiff.contains(name))
              problems += s"$name: value-equal but typed differently and NOT documented in knownTypeDiff"
            if (knownIncompatible.contains(name))
              problems += s"$name: listed incompatible but is value-equal (type diff only) — move to knownTypeDiff"
          case Left(reason) =>
            outcomes(name) = s"incompatible: $reason"
            if (!knownIncompatible.contains(name))
              problems += s"$name: UNDOCUMENTED incompatibility — $reason"
        }
      }
      val nIdent = outcomes.valuesIterator.count(_ == "identical")
      val nType = outcomes.valuesIterator.count(_ == "type-differs")
      val nInc = outcomes.size - nIdent - nType
      // round record (machine-readable; the committed matrix lives in
      // the two maps above)
      val j = outcomes.map { case (k, v) =>
        "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }.mkString("{", ",", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get("target/sql_compat.json"),
        (s"""{"identical":$nIdent,"type_differs":$nType,"incompatible":$nInc,"queries":$j}""" + "\n")
          .getBytes("UTF-8"))
      info(s"${outcomes.size} oracle SQL texts: $nIdent identical, $nType value-equal/type-differs, $nInc incompatible (documented)")
      assert(problems.isEmpty, s"${problems.size} matrix drift(s):\n${problems.mkString("\n")}")
    } finally spark.sql("USE default")
  }
}
