package graft

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Behavioral checks for the LLM-pipeline operators (dedup, similarity,
  * text analysis, multimodal) beyond the SQL-oracle hash equality. */
class PipelineSpec extends SparkSpec {

  test("exact dedup finds every injected duplicate and keeps the lowest id") {
    val g = Dedup.qDedupExact(spark, sf).cache()
    // sf0.001: 500 docs, doc_id%5==0 → 100 injected exact-copy groups
    assert(g.count() == 100)
    assert(g.filter(col("n_copies") =!= 2).count() == 0)
    assert(g.filter(col("keep_id") >= 1000000L).count() == 0)
  }

  test("minhash LSH recovers exact dups at jaccard 1.0 and near dups above 0.5") {
    val pairs = Dedup.qDedupLshPairs(spark, sf).cache()
    val exact = pairs.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 1000000L)
    assert(exact.count() == 100)
    assert(exact.filter(col("jaccard") =!= 1.0).count() == 0)
    // near dups: appended tail → high but <1 jaccard; LSH must catch most
    val near = pairs.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 2000000L)
    assert(near.count() >= 60) // 72 injected at sf0.001; banding may miss a few
    assert(near.filter(col("jaccard") >= 1.0 || col("jaccard") < 0.5).count() == 0)
  }

  test("pairs at rest: build-once parquet round-trip equals the fresh pipeline exactly") {
    val atRest = Dedup.qDedupPairsAtRest(spark, sf) // force rebuild + read back
    val fresh = Dedup.qDedupLshPairs(spark, sf) // deliberately index-free
    try {
      assert(atRest.exceptAll(fresh).isEmpty, "at-rest rows missing from fresh")
      assert(fresh.exceptAll(atRest).isEmpty, "fresh rows missing from at-rest")
    } finally CacheTracker.releaseAll()
    // the signature index one layer down round-trips identically too
    val sigsAtRest = Dedup.sigsAtRest(spark, sf)
      .select(col("doc_id"), expr("cast(sig as array<string>)").as("s"), array_sort(col("sset")).as("ss"))
    val sigsFresh = Dedup.withSignature(Dedup.corpus(spark, sf))
      .select(col("doc_id"), expr("cast(sig as array<string>)").as("s"),
        array_sort(array_distinct(col("shingles"))).as("ss"))
    assert(sigsAtRest.exceptAll(sigsFresh).isEmpty, "at-rest sigs missing from fresh")
    assert(sigsFresh.exceptAll(sigsAtRest).isEmpty, "fresh sigs missing from at-rest")
  }

  test("graph jaccard hub cap: capped ⊆ uncapped with smaller counts, full degrees, binds on a hub") {
    // hub 0 — degree 10, above the test cap of 5 — plus one genuine
    // low-degree shared neighbor (200) between nodes 1 and 2
    val pairs = spark.createDataFrame(
      (1 to 10).map(i => (0L, i.toLong)) ++ Seq((200L, 1L), (200L, 2L)))
      .toDF("a_id", "b_id")
    val capped =
      try Dedup.neighborJaccardFrom(pairs, 5).collect()
      finally CacheTracker.releaseAll()
    val uncapped =
      try Dedup.neighborJaccardFrom(pairs, Int.MaxValue).collect()
      finally CacheTracker.releaseAll()
    // the cap BINDS: every wedge through the degree-10 hub as CENTER is
    // dropped — the C(10,2) spoke pairs vanish and (1,2) loses its hub
    // wedge — while the hub may still appear as an ENDPOINT via
    // low-degree centers (0–1–200 / 0–2–200 give the (0,200) row; a hub
    // cap bounds wedge enumeration cost, it does not erase the node)
    assert(capped.length == 2)
    val keyed = capped.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val row = keyed((1L, 2L))
    assert(row.getLong(2) == 1L, "hub wedge must be dropped from (1,2)")
    // degrees stay FULL degrees (nodes 1 and 2 each touch hub + 200)
    assert(row.getLong(3) == 2L && row.getLong(4) == 2L)
    assert(keyed((0L, 200L)).getLong(2) == 2L)
    // containment: capped pair keys ⊆ uncapped, with n_shared ≤ uncapped's
    val un = uncapped.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(capped.forall(r => un.get((r.getLong(0), r.getLong(1))).exists(_ >= r.getLong(2))))
    // and the uncapped form did count the hub wedge for (1, 2)
    assert(un((1L, 2L)) == 2L)
  }

  test("ngram-jaccard prefix filter is lossless: equals brute-force all-pairs") {
    val got = Dedup.qDedupNgramJaccard(spark, sf)
      .select("a_id", "b_id", "jaccard").cache()
    // brute force: all pairs of non-empty gram sets, exact Jaccard >= 0.5
    // (shingled with the INDEPENDENT interpreted HOF form, so this also
    // cross-checks the codegen shingles3 the production path uses)
    val sets = Dedup.corpus(spark, sf)
      .withColumn("words", split(col("text"), " "))
      .withColumn("sset", array_distinct(expr(Dedup.shinglesHofExpr)))
      .filter(size(col("sset")) > 0)
      .select(col("doc_id"), col("sset"))
    val brute = sets.select(col("doc_id").as("a_id"), col("sset").as("sa"))
      .crossJoin(sets.select(col("doc_id").as("b_id"), col("sset").as("sb")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("n_inter")))
      .filter(col("jaccard") >= 0.5)
      .select("a_id", "b_id", "jaccard")
    assert(got.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(got).count() == 0)
    // and it is a superset of what banded LSH finds (LSH may miss pairs;
    // the exact join must not)
    val lsh = Dedup.qDedupLshPairs(spark, sf).select("a_id", "b_id")
    assert(lsh.exceptAll(got.select("a_id", "b_id")).count() == 0)
    // the length-ratio bound is a pure pruning step: candidates with the
    // filter ⊆ candidates without, and never below the true pair count
    // (losslessness of the pruned set is covered by the equality above)
    val setsP = sets.persist()
    val nWith = Dedup.ngramCandidates(setsP, lengthFilter = true).count()
    val nWithout = Dedup.ngramCandidates(setsP, lengthFilter = false).count()
    setsP.unpersist()
    assert(nWith <= nWithout, s"length filter grew candidates: $nWith > $nWithout")
    assert(nWith >= got.count())
    CacheTracker.releaseAll()
  }

  test("codegen shingles3 is byte-identical to the interpreted HOF form, edges included") {
    graft.functions.Shingles3.register(spark)
    val w = Dedup.corpus(spark, sf).withColumn("words", split(col("text"), " "))
    assert(w.filter(expr(Dedup.shinglesExpr) =!= expr(Dedup.shinglesHofExpr)).count() == 0)
    // short-doc edges: 0/1/2 words → empty, exactly 3 → one shingle
    import spark.implicits._
    val edge = Seq("", "a", "a b", "a b c", "a b c d").toDF("text")
      .withColumn("words", split(col("text"), " "))
      .select(expr(Dedup.shinglesExpr).as("got"), expr(Dedup.shinglesHofExpr).as("want"))
    assert(edge.filter(col("got") =!= col("want")).count() == 0)
    assert(edge.select(max(size(col("got")))).head().getInt(0) == 2)
    // the generalized widths match their HOF twins too (gopher 2-grams,
    // decontamination 5-grams)
    def hof(n: Int) =
      s"IF(size(words) < $n, CAST(array() AS ARRAY<STRING>), transform(sequence(1, size(words) - ${n - 1}), i -> concat_ws(' ', slice(words, i, $n))))"
    Seq(1, 2, 5).foreach { n =>
      assert(w.filter(expr(s"shingles_n(words, $n)") =!= expr(hof(n))).count() == 0, s"n=$n")
    }
  }

  test("bigram_hits byte scan matches the HOF bigram filter, multibyte text included") {
    graft.functions.BigramHits.register(spark)
    val profile = Seq("th", "he", "in", "er", "an")
    val hof = s"""size(filter(transform(sequence(1, length(text) - 1),
      i -> substring(text, i, 2)), b -> b IN ('th','he','in','er','an')))"""
    val fused = s"bigram_hits(text, '${profile.mkString(",")}')"
    val corpus = Tables.documents(spark, sf).select("text")
    assert(corpus.filter(expr(fused) =!= expr(hof)).count() == 0)
    // multibyte codepoints between/around ASCII pairs must not shift counts
    import spark.implicits._
    val edge = Seq("the", "Überther", "théth", "tüh", "日本thes", "", "t").toDF("text")
    assert(edge.filter(length(col("text")) >= 2)
      .filter(expr(fused) =!= expr(hof)).count() == 0)
    assert(edge.filter(col("text") === "the").select(expr(fused)).head().getInt(0) == 2)
  }

  test("incremental dedup: exact copies drop exactly, near copies drop via LSH, originals keep") {
    val inc = Dedup.qDedupIncremental(spark, sf).cache()
    try {
      // every incoming injected EXACT copy has its original in history
      // ((1M+v)%3==0 ⇒ v%3==2 ⇒ v in history) → dropped_exact, always
      val exactCopies = inc.filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
      assert(exactCopies.count() > 0)
      assert(exactCopies.filter(col("status") =!= "dropped_exact").count() == 0)
      // incoming NEAR copies (tail-appended, original in history): never
      // exact-dropped; LSH banding must catch most
      val nearCopies = inc.filter(col("doc_id") >= 2000000L)
      assert(nearCopies.count() > 0)
      assert(nearCopies.filter(col("status") === "dropped_exact").count() == 0)
      val nNear = nearCopies.count()
      val caught = nearCopies.filter(col("status") === "dropped_near").count()
      assert(caught >= (nNear * 0.8).toLong, s"LSH caught $caught of $nNear near copies")
      // originals are never exact-dropped (their texts are unique), and
      // any near-drop of an original must correspond to a GENUINE
      // J >= 0.5 partnership the all-pairs LSH relation also knows about
      // (the word-soup corpus has real similar pairs beyond the injected)
      val clean = inc.filter(col("doc_id") < 1000000L &&
        col("doc_id") % 5 =!= 0 && col("doc_id") % 7 =!= 0).cache()
      assert(clean.filter(col("status") === "dropped_exact").count() == 0)
      val pairs = Dedup.qDedupLshPairs(spark, sf)
        .select(explode(array(col("a_id"), col("b_id"))).as("doc_id")).distinct()
      val unexplained = clean.filter(col("status") === "dropped_near")
        .join(pairs, Seq("doc_id"), "left_anti").count()
      clean.unpersist()
      assert(unexplained == 0, s"$unexplained near-drops without an LSH-known partner")
    } finally { inc.unpersist(); CacheTracker.releaseAll() }
  }

  test("count-min sketch: one-sided error on every reported term") {
    val out = TextAnalysis.qCmsHeavyHitters(spark, sf).cache()
    try {
      assert(out.count() == 20)
      // the CMS theorem: an estimate can only overcount, never undercount
      assert(out.filter(!col("never_under")).count() == 0)
      assert(out.filter(col("overcount") < 0).count() == 0)
    } finally out.unpersist() // shared session: PlanShapeSpec reads this plan
  }

  test("simhash: identical docs share a fingerprint; fingerprints are 16 bits") {
    val sh = Dedup.qDedupSimhash(spark, sf).cache()
    assert(sh.filter(length(col("simhash16")) =!= 16).count() == 0)
    assert(sh.filter(!col("simhash16").rlike("^[01]{16}$")).count() == 0)
    // every injected exact dup (doc_id%5==0) shares its original's bucket
    val orig = sh.filter(col("doc_id") < 1000000 && col("doc_id") % 5 === 0)
      .select(col("doc_id").as("o_id"), col("simhash16").as("o_fp"))
    val dup = sh.filter(col("doc_id") >= 1000000 && col("doc_id") < 2000000)
      .select((col("doc_id") - 1000000L).as("o_id"), col("simhash16").as("d_fp"))
    assert(orig.join(dup, "o_id").filter(col("o_fp") =!= col("d_fp")).count() == 0)
  }

  test("simhash pairs: banded join finds EXACTLY the brute-force hamming<=3 set (pigeonhole)") {
    val got = Dedup.qDedupSimhashPairs(spark, sf).cache()
    try {
      // exact copies (doc_id%5 twins) differ in zero bits → every such
      // pair must be present with hamming 0
      val nCopies = Tables.documents(spark, sf)
        .filter(col("doc_id") % 5 === 0).count()
      val exact = got.filter(col("a_id") + 1000000L === col("b_id") && col("hamming") === 0)
      assert(exact.count() == nCopies, s"missing exact-copy pairs: ${exact.count()} != $nCopies")
      // completeness + soundness: the banded candidate set cannot miss a
      // hamming<=3 pair (4 bands, <=3 differing bits → >=1 untouched
      // band), so the result must EQUAL the all-pairs reference
      val e = Dedup.corpus(spark, sf)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .withColumn("h", md5(col("w")))
      val aggCols = (1 to 64).map(j => sum(when(
        expr(if (j % 2 == 1) s"(substring(h, ${(j + 1) / 2}, 1) >= '8')"
             else s"(substring(h, ${(j + 1) / 2}, 1) IN ('2','3','6','7','a','b','e','f'))"), 1)
        .otherwise(0)).as(s"c$j"))
      val bitCols = (1 to 64).map(j =>
        when(lit(2) * col(s"c$j") > col("n"), "1").otherwise("0"))
      val fp = e.groupBy("doc_id").agg(count(lit(1)).as("n"), aggCols: _*)
        .select(col("doc_id"), concat(bitCols: _*).as("sig")).cache()
      val ref = fp.select(col("doc_id").as("a_id"), col("sig").as("sa"))
        .join(fp.select(col("doc_id").as("b_id"), col("sig").as("sb")),
          col("a_id") < col("b_id"))
        .withColumn("hamming",
          expr("size(filter(sequence(1, 64), j -> substring(sa, j, 1) <> substring(sb, j, 1)))"))
        .filter(col("hamming") <= 3)
        .select("a_id", "b_id", "hamming")
      assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0,
        "banded result differs from the brute-force hamming<=3 pair set")
      fp.unpersist()
    } finally { got.unpersist(); CacheTracker.releaseAll() }
  }

  test("quality classifier: shuffle-free plan, sigmoid-consistent, mean-pooled bound") {
    val qc = TextAnalysis.qQualityClassifier(spark, sf).cache()
    try {
      assert(qc.count() == 500)
      // pure map-side inference: any Exchange would mean a needless shuffle
      assert(!qc.queryExecution.executedPlan.toString.contains("Exchange"),
        "classifier inference must be shuffle-free")
      // the sigmoid gate and the sign gate must agree (sigmoid(0) = 0.5)
      assert(qc.filter((col("prob") > 0.5) =!= col("pass_quality")).count() == 0)
      assert(qc.filter(col("prob") < 0 || col("prob") > 1).count() == 0)
      // mean pooling: |score| <= max|weight| / SCALE = 500001/1000003 < 0.51
      assert(qc.filter(abs(col("score")) > 0.51).count() == 0)
      // features counted = unigrams + adjacent bigrams
      val one = qc.join(
        Tables.documents(spark, sf).select(col("doc_id"),
          (size(split(col("text"), " ")) * 2 - 1).as("expect")), "doc_id")
      assert(one.filter(col("n_feat") =!= col("expect")).count() == 0)
    } finally qc.unpersist()
  }

  test("SQ8: signed 8-bit codes, 5 neighbors per query, recall vs float baseline") {
    val sq = Similarity.qSimSq8(spark, sf).cache()
    try {
      val perQ = sq.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5).count() == 0)
      // codes live in the signed-byte range (mid-centered affine map)
      val e = Tables.embeddings(spark, sf)
        .selectExpr("cast(embedding as array<double>) as ce")
      val stats = e.select(posexplode(col("ce")).as(Seq("dim", "v")))
        .groupBy("dim").agg(min("v").as("mn"), max("v").as("mx")).orderBy("dim").collect()
      val mns = array(stats.map(r => lit(r.getDouble(1))): _*)
      val mxs = array(stats.map(r => lit(r.getDouble(2))): _*)
      val bad = e.withColumn("mn", mns).withColumn("mx", mxs)
        .withColumn("code", expr(
          "transform(sequence(0, 63), i -> CAST(floor((ce[i] - (mn[i] + mx[i]) / 2) * 255 / (mx[i] - mn[i]) + 0.5) AS BIGINT))"))
        .filter(expr("exists(code, x -> x < -128 OR x > 128)"))
      assert(bad.count() == 0, "SQ8 codes must stay within the signed-byte range")
      // recall floor vs the float cosine top-5 (random 64-dim embeddings:
      // norms concentrate, so the centered integer dot product tracks
      // cosine order well — measured at sf0.001, floored conservatively)
      val bf = Similarity.qSimTopK(spark, sf).select("q_id", "neighbor_id")
      val hit = bf.join(sq.select("q_id", "neighbor_id"), Seq("q_id", "neighbor_id"), "left_semi").count()
      val nBf = bf.count()
      assert(nBf > 0)
      assert(hit.toDouble / nBf >= 0.3, s"SQ8 recall ${hit.toDouble / nBf} too low")
    } finally sq.unpersist()
  }

  test("IVF ANN reaches reasonable recall vs brute-force top-5") {
    val bf = Similarity.qSimTopK(spark, sf).select("q_id", "neighbor_id")
    val ivf = Similarity.qSimIvf(spark, sf).select("q_id", "neighbor_id")
    val nBf = bf.count()
    val hit = bf.join(ivf, Seq("q_id", "neighbor_id"), "left_semi").count()
    assert(nBf > 0)
    assert(hit.toDouble / nBf >= 0.2, s"IVF recall ${hit.toDouble / nBf} too low")
  }

  test("ANN LSH reaches reasonable recall vs brute-force top-5") {
    val bf = Similarity.qSimTopK(spark, sf).select("q_id", "neighbor_id")
    val ann = Similarity.qSimAnnLsh(spark, sf).select("q_id", "neighbor_id")
    val nBf = bf.count()
    val hit = bf.join(ann, Seq("q_id", "neighbor_id"), "left_semi").count()
    assert(nBf > 0)
    assert(hit.toDouble / nBf >= 0.25, s"recall ${hit.toDouble / nBf} too low")
  }

  test("PQ ADC: 5 ranked neighbors per query, exact distance rides along, recall positive") {
    val pq = Similarity.qSimPq(spark, sf).cache()
    val perQ = pq.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5).count() == 0)
    assert(pq.filter(col("est_d2") < 0 || col("exact_d2") < 0).count() == 0)
    // recall floor vs exact L2 top-5: random near-orthogonal embeddings
    // are PQ's worst case (distance concentration), so the bound is low
    // but must stay positive — observed 0.112 at sf0.001 with trained
    // (Lloyd-refined) 16-centroid codebooks
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as ce")
    val q = e.filter(col("vec_id") % 20 === 0).select(col("vec_id").as("q_id"), col("ce").as("qe"))
    val d2 = expr("""aggregate(zip_with(qe, ce, (x, y) -> (x - y) * (x - y)),
                     CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("d2"), col("vec_id"))
    val bf = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("d2", d2).withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select(col("q_id"), col("vec_id").as("neighbor_id"))
    val hit = bf.join(pq.select("q_id", "neighbor_id"), Seq("q_id", "neighbor_id"), "left_semi").count()
    assert(hit.toDouble / bf.count() >= 0.06, s"PQ recall ${hit.toDouble / bf.count()} too low")
  }

  test("IVF×PQ: 5 ranked neighbors per query; recall and PQ-agreement floors hold") {
    val ip = Similarity.qSimIvfPq(spark, sf).cache()
    val perQ = ip.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5).count() == 0)
    assert(ip.filter(col("est_d2") < 0 || col("exact_d2") < 0).count() == 0)
    // recall vs exact L2 top-5 (random embeddings = PQ's worst case;
    // observed 0.160 at sf0.001 with trained codebooks + nprobe=2)
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as ce")
    val q = e.filter(col("vec_id") % 20 === 0).select(col("vec_id").as("q_id"), col("ce").as("qe"))
    val d2 = expr("""aggregate(zip_with(qe, ce, (x, y) -> (x - y) * (x - y)),
                     CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("d2"), col("vec_id"))
    val bf = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("d2", d2).withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select(col("q_id"), col("vec_id").as("neighbor_id")).cache()
    val nBf = bf.count()
    val hit = bf.join(ip.select("q_id", "neighbor_id"), Seq("q_id", "neighbor_id"), "left_semi").count()
    assert(hit.toDouble / nBf >= 0.06, s"IVF×PQ recall ${hit.toDouble / nBf} too low")
    // cell pruning must broadly agree with the unpruned ADC ranking
    // (observed 0.408 overlap at sf0.001 — pruning keeps ~2/8 of cells)
    val pq = Similarity.qSimPq(spark, sf).select("q_id", "neighbor_id").cache()
    val ov = pq.join(ip.select("q_id", "neighbor_id"), Seq("q_id", "neighbor_id"), "left_semi").count()
    assert(ov.toDouble / pq.count() >= 0.2,
      s"IVF×PQ diverged from the full ADC ranking (overlap ${ov.toDouble / pq.count()})")
  }

  test("IVF×PQ nprobe sweep: candidates nest and grow; shipped nprobe=2 floors the measured recall") {
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as ce")
    val q = e.filter(col("vec_id") % 20 === 0).select(col("vec_id").as("q_id"), col("ce").as("qe"))
    val d2 = expr("""aggregate(zip_with(qe, ce, (x, y) -> (x - y) * (x - y)),
                     CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
      .orderBy(col("d2"), col("vec_id"))
    val bf = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("d2", d2).withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select(col("q_id"), col("vec_id").as("neighbor_id")).cache()
    val nBf = bf.count()
    val sweep = Seq(2, 4, 8).map { np =>
      val cand = Similarity.ivfPqCandidates(spark, sf, np).cache()
      val nCand = cand.count()
      val res = Similarity.ivfPqSearch(spark, sf, np).select("q_id", "neighbor_id")
      val hit = bf.join(res, Seq("q_id", "neighbor_id"), "left_semi").count()
      val recall = hit.toDouble / nBf
      info(f"nprobe=$np: candidates=$nCand recall@5=$recall%.3f")
      CacheTracker.releaseAll()
      (np, cand, nCand, recall)
    }
    // probed cells are a prefix of one distance ordering → candidate
    // sets NEST (each tier is a superset of the previous)
    sweep.sliding(2).foreach { case Seq((_, c1, n1, _), (_, c2, n2, _)) =>
      assert(n1 < n2, s"candidates must grow with nprobe: $n1 !< $n2")
      assert(c1.exceptAll(c2).count() == 0, "lower-nprobe candidates must nest in higher")
    }
    sweep.foreach(_._2.unpersist())
    // shipped nprobe=2 floor (measured 0.160 at sf0.001; random-data
    // distance concentration means HIGHER nprobe does not help here —
    // see qSimIvfPq doc)
    assert(sweep.head._4 >= 0.06, s"nprobe=2 recall ${sweep.head._4} below floor")
    bf.unpersist()
  }

  test("IVF×PQ residual encoding: well-formed top-5; recall at nprobe=2 >= raw-code recall") {
    val res = Similarity.qSimIvfPqRes(spark, sf).cache()
    try {
      val perQ = res.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5).count() == 0)
      assert(res.filter(col("est_d2") < 0 || col("exact_d2") < 0).count() == 0)
      val e = Tables.embeddings(spark, sf)
        .selectExpr("vec_id", "cast(embedding as array<double>) as ce")
      val q = e.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("q_id"), col("ce").as("qe"))
      val d2 = expr("""aggregate(zip_with(qe, ce, (x, y) -> (x - y) * (x - y)),
                       CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
        .orderBy(col("d2"), col("vec_id"))
      val bf = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
        .withColumn("d2", d2).withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5).select(col("q_id"), col("vec_id").as("neighbor_id")).cache()
      val nBf = bf.count()
      val hitRes = bf.join(res.select("q_id", "neighbor_id"),
        Seq("q_id", "neighbor_id"), "left_semi").count()
      val raw = Similarity.qSimIvfPq(spark, sf).select("q_id", "neighbor_id")
      val hitRaw = bf.join(raw, Seq("q_id", "neighbor_id"), "left_semi").count()
      info(f"recall@5 nprobe=2: raw=${hitRaw.toDouble / nBf}%.3f residual=${hitRes.toDouble / nBf}%.3f")
      // On RANDOM embeddings the residual-vs-raw ordering is NOT
      // theoretically fixed: Jégou et al. 2011 §IV's residual advantage
      // assumes clustered data whose coarse structure wastes codebook
      // resolution; random vectors have no such structure, so the two
      // rankings trade places with the quantizer's cell count (k=8
      // measured a 0.160/0.160 tie, the corpus-adaptive k=16 measures
      // raw 0.208 vs residual 0.160). Assert a BAND instead of an
      // ordering: residual must stay within 0.05 absolute recall of
      // raw (the measured gap is 0.048, and both pipelines are fully
      // deterministic — fixed corpus, mod-8 sample, lowest-k seeding —
      // so the margin is stable, r14 ADVICE tightened it from 0.1),
      // AND clear an absolute floor so a residual path that collapses
      // toward zero fails even if raw collapses with it. The ordering
      // claim lives with the clustered-data caveat here rather than in
      // a brittle assert.
      assert(hitRes >= hitRaw - (nBf + 19) / 20,
        s"residual recall $hitRes/$nBf fell >0.05 below raw-code recall $hitRaw/$nBf")
      assert(hitRes * 10 >= nBf,
        s"residual recall $hitRes/$nBf fell below the 0.10 working-index floor")
      bf.unpersist()
    } finally { res.unpersist(); CacheTracker.releaseAll() }
  }

  test("semantic dedup: flagged set is exactly the co-clustered injected twins; base stays clean") {
    val sd = Similarity.qSemanticDedup(spark, sf).cache()
    try {
      val flagged = sd.filter(col("is_semantic_dup"))
      // base vectors are never flagged: their twins carry HIGHER ids and
      // random 64-dim cosines never reach 0.95 (~7 sigma)
      assert(flagged.filter(col("vec_id") < 1000000L).count() == 0)
      // every injected twin that lands in its original's cell is flagged;
      // the tiny perturbation can straddle a cell boundary, so allow a
      // small miss margin
      val nTwin = Tables.embeddings(spark, sf).filter(col("vec_id") % 10 === 0).count()
      val hit = flagged.filter(col("vec_id") >= 1000000L).count()
      assert(hit >= (nTwin * 0.9).toLong, s"flagged $hit of $nTwin injected twins")
      // one row per corpus vector, cell ids within range
      assert(sd.count() == Tables.embeddings(spark, sf).count() + nTwin)
      assert(sd.filter(col("cell_id") < 0 || col("cell_id") >= 8).count() == 0)
    } finally { sd.unpersist(); CacheTracker.releaseAll() }
  }

  test("embedding near-dup pairs: every injected near copy is recovered at cosine >= 0.95") {
    val pairs = Similarity.qSimNearDupPairs(spark, sf).cache()
    val injected = pairs.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 1000000L)
    val nInjected = Tables.embeddings(spark, sf).filter(col("vec_id") % 10 === 0).count()
    // LSH co-bucketing can miss a near copy that straddles a hyperplane
    assert(injected.count() >= (nInjected * 0.8).toLong,
      s"found ${injected.count()} of $nInjected injected near-dups")
    assert(pairs.filter(col("cosine") < 0.95).count() == 0)
  }

  test("near-dup LSH candidate pairs grow ~linearly with corpus size (banded codes)") {
    // 10x the corpus (sf0.01 -> sf0.1) must grow the candidate set far
    // below quadratically (100x): the code width adapts (log2(n/4)) so
    // bucket population stays bounded. Allow 3x the linear ratio for
    // ceil-granularity in the bit count.
    val c1 = Similarity.neardupCandidates(spark, "/root/testdata/sf0.01").count()
    val c2 = Similarity.neardupCandidates(spark, "/root/testdata/sf0.1").count()
    assert(c1 > 0 && c2 > 0)
    val growth = c2.toDouble / c1
    assert(growth <= 30.0, s"candidates grew ${growth}x for 10x data — not near-linear")
  }

  test("brute-force top-k: 5 ranked neighbors per query, cosine in [-1,1] descending") {
    val tk = Similarity.qSimTopK(spark, sf).cache()
    val perQ = tk.groupBy("q_id").agg(count(lit(1)).as("n"),
      max(col("cosine")).as("mx"), min(col("cosine")).as("mn"))
    assert(perQ.filter(col("n") =!= 5).count() == 0)
    assert(tk.filter(col("cosine") > 1.0 || col("cosine") < -1.0).count() == 0)
    // rank 1 has the max cosine within each query group
    val r1 = tk.filter(col("rank") === 1).select(col("q_id"), col("cosine").as("c1"))
    assert(perQ.join(r1, "q_id").filter(col("c1") =!= col("mx")).count() == 0)
  }

  test("rolling-hash expression matches the reference implementation (codegen path)") {
    import graft.functions.RollingHash
    val rows = graft.operators.TextAnalysis.qRollingFingerprint(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
      .select("doc_id", "fp_rolling", "text").collect()
    assert(rows.length == 500)
    rows.take(50).foreach { r =>
      assert(r.getAs[Long]("fp_rolling") == RollingHash.hash(r.getAs[String]("text")))
      // definitional cross-check: the split-modular arithmetic really is
      // Σ b·257^i mod 2^61-1 (BigInt reference)
      assert(r.getAs[Long]("fp_rolling") == RollingHash.hashBig(r.getAs[String]("text")))
    }
    // shard bound
    val shards = graft.operators.TextAnalysis.qRollingFingerprint(spark, sf)
    assert(shards.filter(col("shard") < 0 || col("shard") >= 1024).count() == 0)
  }

  test("CDC chunking: chunks reassemble exactly; boundaries stable under a prefix edit") {
    import graft.functions.CdcBoundaries
    val texts = Tables.documents(spark, sf).select("text").limit(50)
      .collect().map(_.getString(0))
    texts.foreach { t =>
      val bs = CdcBoundaries.boundaries(t)
      // reassembly: boundaries tile the string
      assert(bs.last == t.length)
      val chunks = (Array(0) ++ bs).sliding(2).map { case Array(a, b) => t.substring(a, b) }.toSeq
      assert(chunks.mkString == t)
      // size bounds (last chunk may be short)
      chunks.dropRight(1).foreach(c =>
        assert(c.length >= CdcBoundaries.MinChunk && c.length <= CdcBoundaries.MaxChunk))
    }
    // edit stability: prepend an edit, most chunk hashes survive
    val t = texts.maxBy(_.length)
    def hashes(x: String) = {
      val bs = CdcBoundaries.boundaries(x)
      (Array(0) ++ bs).sliding(2).map { case Array(a, b) => x.substring(a, b).hashCode }.toSet
    }
    val orig = hashes(t)
    val edited = hashes("EDITED PREFIX INSERTED HERE " + t)
    val survived = orig.intersect(edited).size.toDouble / orig.size
    assert(survived >= 0.5, s"only ${(survived * 100).round}% of chunks survived a prefix edit")
  }

  test("CDC chunk dedup: injected exact copies share every chunk hash (n_docs >= 2 groups exist)") {
    val g = Dedup.qDedupCdcChunks(spark, sf).cache()
    assert(g.filter(col("n_docs") >= 2).count() > 0)
    assert(g.filter(col("chunk_len") > graft.functions.CdcBoundaries.MaxChunk).count() == 0)
  }

  test("text stats: ratios bounded, quality in [0,1], counts positive") {
    val st = TextAnalysis.qTextStats(spark, sf).cache()
    assert(st.count() == 500)
    assert(st.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    assert(st.filter(col("distinct_ratio") <= 0 || col("distinct_ratio") > 1).count() == 0)
    assert(st.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
    assert(st.filter(col("n_words") < 10).count() == 0) // corpus min is 10
  }

  test("langid classifies the all-English corpus as en whenever markers present") {
    val li = TextAnalysis.qTextLangid(spark, sf)
    assert(li.filter(col("score_en") > 0 && col("pred_lang") =!= "en").count() == 0)
  }

  test("token counts: regex tokens ≥ whitespace tokens; chars/token > 0") {
    val tc = TextAnalysis.qTokenCount(spark, sf)
    assert(tc.filter(col("re_tokens") < col("ws_tokens")).count() == 0)
    assert(tc.filter(col("chars_per_token") <= 0).count() == 0)
  }

  test("multimodal: real ImageIO round-trip — decoded dims and diagonal pixels match closed form") {
    val m = Multimodal.qMultimodalMeta(spark, sf).cache()
    assert(m.count() == 500)
    assert(m.filter(col("width") < 16 || col("width") >= 64).count() == 0)
    assert(m.filter(col("height") < 16 || col("height") >= 48).count() == 0)
    assert(m.filter(!col("format").isin("png", "bmp", "webp")).count() == 0)
    // png/bmp rows went through javax.imageio and carry a pixel checksum;
    // webp rows went through the documented stub with a NULL checksum
    assert(m.filter(col("decoder") === "imageio" && col("doc_id") % 3 === 2).count() == 0)
    assert(m.filter(col("decoder") === "stub" && col("doc_id") % 3 =!= 2).count() == 0)
    assert(m.filter(col("decoder") === "stub" && col("diag_checksum").isNotNull).count() == 0)
    assert(m.filter(col("decoder") === "imageio" && col("diag_checksum").isNull).count() == 0)
    // the decoded-pixel checksum equals the synthesis closed form — the
    // codec reproduced actual pixel bytes, not just header dimensions
    val expected = expr(
      "aggregate(sequence(0, least(width, height) - 1), CAST(0 AS BIGINT), " +
        "(acc, i) -> acc + (doc_id * 31 + i * 20) % 256)")
    assert(m.filter(col("decoder") === "imageio")
      .filter(col("diag_checksum") =!= expected).count() == 0)
    m.unpersist()
  }

  test("multimodal frames: one row per sampled frame, offsets stride 100") {
    val f = Multimodal.qMultimodalFrames(spark, sf).cache()
    assert(f.filter(col("frame_offset") =!= col("frame_idx") * 100).count() == 0)
    val perDoc = f.groupBy("doc_id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
    assert(perDoc.filter(col("n") =!= col("mx") + 1).count() == 0)
  }

  test("dedup clusters: canonical = component min; every exact-dup pair co-clustered") {
    val cl = Dedup.qDedupClusters(spark, sf).cache()
    // canonical id is a member of its own cluster (labels reached fixpoint)
    val byCluster = cl.groupBy("cluster_id").agg(min("doc_id").as("min_id"))
    assert(byCluster.filter(col("cluster_id") =!= col("min_id")).count() == 0)
    assert(cl.filter(col("cluster_size") < 2).count() == 0)
    // every injected exact copy (doc_id%5==0 -> +1_000_000) lands in the
    // same cluster as its original
    val orig = cl.filter(col("doc_id") < 1000000 && col("doc_id") % 5 === 0)
      .select(col("doc_id").as("o_id"), col("cluster_id").as("o_cl"))
    val dup = cl.filter(col("doc_id") >= 1000000 && col("doc_id") < 2000000)
      .select((col("doc_id") - 1000000L).as("o_id"), col("cluster_id").as("d_cl"))
    assert(dup.count() == 100) // all sf0.001 exact copies are clustered
    assert(orig.join(dup, "o_id").filter(col("o_cl") =!= col("d_cl")).count() == 0)
    CacheTracker.releaseAll()
  }

  test("clusters from a supplied pairs relation match the standalone composition") {
    // a pipeline that already materialized the verified pairs passes them
    // straight to clustering — no LSH re-run; result must be identical
    val pairs = Dedup.qDedupLshPairs(spark, sf).select("a_id", "b_id").cache()
    try {
      pairs.count() // materialize so clustering never touches the LSH lineage
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val supplied = rows(Dedup.clustersFromPairs(pairs))
      CacheTracker.releaseAll()
      val standalone = rows(Dedup.qDedupClusters(spark, sf))
      assert(supplied.nonEmpty && supplied == standalone)
    } finally { pairs.unpersist(); CacheTracker.releaseAll() }
  }

  test("decontamination flags every eval-span source doc; gopher rules are sane") {
    val c = TextAnalysis.qDecontaminate(spark, sf).cache()
    // each doc_id%50==0 doc donated words 4..28 as an eval item — its
    // 5-grams are in the benchmark by construction, so it must be flagged
    val sources = Tables.documents(spark, sf).filter(col("doc_id") % 50 === 0).count()
    assert(c.filter(col("doc_id") % 50 === 0).count() == sources)
    assert(c.filter(col("contamination") <= 0 || col("contamination") > 1).count() == 0)
    assert(c.filter(col("n_overlap") > col("n_grams")).count() == 0)
    val g = TextAnalysis.qGopherQuality(spark, sf).cache()
    assert(g.count() == 500) // one row per doc
    assert(g.filter(col("top_2gram_ratio") <= 0 || col("top_2gram_ratio") > 1).count() == 0)
    assert(g.filter(col("pass_all") =!=
      (col("pass_word_len") && col("pass_repetition") && col("pass_size"))).count() == 0)
    assert(g.filter(col("pass_all")).count() > 0) // corpus docs mostly pass
  }

  test("doc chunks: windows tile every word exactly; interior chunks are full-width") {
    import org.apache.spark.sql.expressions.Window
    val ch = TextAnalysis.qDocChunks(spark, sf)
      .withColumn("mx", max("chunk_id").over(Window.partitionBy("doc_id"))).cache()
    try {
      // the final window ends exactly at the document's last word
      val last = ch.filter(col("chunk_id") === col("mx"))
      assert(last.filter(col("chunk_id") * 48 + col("chunk_tokens") =!= col("n_words")).count() == 0)
      // every interior window is the full 64 tokens
      assert(ch.filter(col("chunk_id") =!= col("mx"))
        .filter(col("chunk_tokens") =!= 64).count() == 0)
      // docs within one window produce exactly one chunk
      assert(ch.filter(col("n_words") <= 64 && col("mx") =!= 0).count() == 0)
    } finally ch.unpersist()
  }

  test("pii scrub redacts every injected contact; mix rates and packing bins hold their contracts") {
    import graft.operators.Curation
    // pii: every 9th doc got the synthetic contact line — all three
    // pattern families must be redacted and counted
    val pii = TextAnalysis.qPiiScrub(spark, sf).cache()
    val injected = pii.filter(col("doc_id") % 9 === 0)
    assert(injected.filter(col("n_redactions") < 3).count() == 0)
    assert(injected.filter(!col("clean_text").contains("<EMAIL>") ||
      !col("clean_text").contains("<PHONE>") || !col("clean_text").contains("<IP>")).count() == 0)
    assert(pii.filter(col("clean_text").rlike("@")).count() == 0)
    pii.unpersist()
    // mix: rates in (0,1], the smallest source keeps everything, kept <= docs
    val mix = Curation.qMixTemperature(spark, sf).cache()
    assert(mix.filter(col("keep_rate") <= 0 || col("keep_rate") > 1).count() == 0)
    assert(mix.orderBy(col("n_docs")).limit(1).filter(col("keep_rate") =!= 1.0).count() == 0)
    assert(mix.filter(col("n_kept") > col("n_docs")).count() == 0)
    mix.unpersist()
    // pack: token totals are conserved and every shard's packing starts at bin 0
    val pack = Curation.qSeqPack(spark, sf).cache()
    val total = Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(pack.agg(sum("n_tokens")).head().getLong(0) == total)
    assert(pack.groupBy("source").agg(min("bin_id").as("b0"))
      .filter(col("b0") =!= 0L).count() == 0)
    pack.unpersist()
  }

  test("span dedup: exact copies vanish entirely; untouched docs reassemble verbatim") {
    val g = Dedup.qDedupSpan(spark, sf).cache()
    try {
      // the 100 injected exact copies duplicate every span → all dropped
      val copies = g.filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
      assert(copies.count() == 100)
      assert(copies.filter(col("dup_fraction") =!= 1.0 || col("clean_text") =!= "").count() == 0)
      assert(g.filter(col("dup_fraction") < 0 || col("dup_fraction") > 1).count() == 0)
      // any doc with zero duplicated spans must reassemble to its exact text
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      val intact = g.filter(col("n_dup_spans") === 0).join(docs, "doc_id")
      assert(intact.count() > 100) // the corpus genuinely contains such docs
      assert(intact.filter(col("clean_text") =!= col("text")).count() == 0)
    } finally g.unpersist()
  }

  test("winnow_fps codegen is identical to the interpreted HOF form, edges included") {
    graft.functions.Shingles3.register(spark)
    graft.functions.WinnowFps.register(spark)
    val h = Dedup.corpus(spark, sf)
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(Dedup.shinglesExpr))
      .withColumn("hashes", expr(Dedup.baseHashExpr))
      .filter(size(col("hashes")) >= 1)
    assert(h.filter(expr("winnow_fps(hashes)") =!= expr(Dedup.winnowHofExpr)).count() == 0)
    // edges: arrays shorter than the window (1..3 hashes) take the
    // whole-array min; empty arrays yield empty fingerprint sets
    import spark.implicits._
    val edge = Seq(Seq.empty[Long], Seq(5L), Seq(9L, 2L), Seq(3L, 1L, 2L), Seq(4L, 3L, 2L, 1L, 9L))
      .toDF("hashes")
    assert(edge.filter(size(col("hashes")) >= 1)
      .filter(expr("winnow_fps(hashes)") =!= expr(Dedup.winnowHofExpr)).count() == 0)
    assert(edge.filter(size(col("hashes")) === 0)
      .select(size(expr("winnow_fps(hashes)"))).head().getInt(0) == 0)
  }

  test("winnowing recovers every injected duplicate pair; overlap and ids are well-formed") {
    val pairs = Dedup.qDedupWinnow(spark, sf).cache()
    try {
      val exact = pairs.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 1000000L)
      assert(exact.count() == 100)
      assert(exact.filter(col("overlap") =!= 1.0).count() == 0)
      // near copies: the appended tail adds few shingles; winnow still links all 72
      assert(pairs.filter(col("a_id") < 1000000L &&
        col("b_id") === col("a_id") + 2000000L).count() == 72)
      assert(pairs.filter(col("a_id") >= col("b_id")).count() == 0)
      assert(pairs.filter(col("overlap") <= 0 || col("overlap") > 1.0).count() == 0)
      assert(pairs.filter(col("shared_fps") > least(col("a_fps"), col("b_fps"))).count() == 0)
    } finally pairs.unpersist()
  }

  test("entropy: bounded by ln(n_distinct), normalized to [0,1], all docs scored") {
    val g = TextAnalysis.qTextEntropy(spark, sf).cache()
    try {
      assert(g.count() == 500)
      assert(g.filter(col("entropy") < -1e-9).count() == 0)
      assert(g.filter(col("entropy") > log(col("n_distinct")) + 1e-6).count() == 0)
      assert(g.filter(col("norm_entropy") < 0 || col("norm_entropy") > 1.000001).count() == 0)
      // docs repeat words (n_distinct < n_words), so entropy is strictly interior
      assert(g.filter(col("norm_entropy") > 0 && col("norm_entropy") < 1).count() > 0)
    } finally g.unpersist()
  }

  test("split is stratified and leak-free; shard layout is a dense permutation") {
    import graft.operators.Curation
    val sp = Curation.qSplitStratified(spark, sf).cache()
    try {
      // every stratum sums to 1 and no split is empty corpus-wide
      assert(sp.groupBy("lang").agg(sum("frac").as("s"))
        .filter(abs(col("s") - 1.0) > 1e-6).count() == 0)
      assert(sp.groupBy("split").count().count() == 3)
      // the md5 coin tracks 80/10/10 corpus-wide (tolerance: 500 docs)
      val train = sp.filter(col("split") === "train").agg(sum("n_docs")).head().getLong(0)
      assert(train > 350 && train < 450, s"train split off: $train/500")
    } finally sp.unpersist()
    val sh = Curation.qShardLayout(spark, sf).cache()
    try {
      assert(sh.count() == 500)
      assert(sh.select("doc_id").distinct().count() == 500)
      // positions within each shard are exactly 1..n (dense, no gaps)
      assert(sh.groupBy("shard_id")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1).count() == 0)
    } finally sh.unpersist()
  }

  test("pagerank over the near-dup graph: bounded, deterministic across runs, clique-uniform mass") {
    val g = Dedup.qGraphPagerank(spark, sf).cache()
    try {
      // every vertex keeps at least the teleport mass and at most total mass
      assert(g.filter(col("pr3_scaled") < 150000000000L).count() == 0)
      val n = g.count()
      assert(n > 0)
      assert(g.filter(col("pr3_scaled") > lit(1000000000000L) * n).count() == 0)
      // integer fixed-point: a second run is bit-identical (no float drift)
      val again = Dedup.qGraphPagerank(spark, sf)
      assert(g.join(again.withColumnRenamed("pr3_scaled", "pr_b"), Seq("doc_id"))
        .filter(col("pr3_scaled") =!= col("pr_b")).count() == 0)
      // every near-dup component is a regular clique (pair / triangle /
      // 4- and 6-clique), so the uniform mass 1e12 is the fixed point of the
      // update; the only deviation is pr//deg truncation, a few units at
      // most. Pairs (deg 1, pr//1 exact) hold the initial mass exactly.
      assert(g.filter(col("deg") === 1)
        .filter(col("pr3_scaled") =!= 1000000000000L).count() == 0)
      assert(g.filter(col("pr3_scaled") < 1000000000000L - 10L).count() == 0)
    } finally g.unpersist()
  }

  test("vocab encoding: ids dense from 1, sequences position-exact, totals conserved") {
    val g = TextAnalysis.qVocabEncode(spark, sf).cache()
    try {
      assert(g.count() == 500)
      // every doc's encoded sequence has exactly n_tokens ids
      assert(g.filter(size(split(col("token_ids"), " ")) =!= col("n_tokens")).count() == 0)
      // id space is dense from 1: some doc uses rank 1, and no id exceeds
      // the distinct word-type count of the corpus
      assert(g.agg(min("top_rank_used")).head().getInt(0) == 1)
      val vTypes = Tables.documents(spark, sf)
        .select(explode(split(col("text"), " ")).as("w")).distinct().count()
      val maxId = g.select(max(expr(
        "array_max(transform(split(token_ids, ' '), x -> cast(x as int)))"))).head().getInt(0)
      assert(maxId == vTypes, s"max id $maxId != $vTypes word types")
      // total encoded tokens == total corpus words
      val totalWords = Tables.documents(spark, sf)
        .select(sum(size(split(col("text"), " ")))).head().getLong(0)
      assert(g.agg(sum("n_tokens")).head().getLong(0) == totalWords)
    } finally g.unpersist()
  }

  test("mips: augmented-cosine ranking equals brute-force inner-product top-5") {
    // the norm-augmentation identity, checked extensionally: the engine
    // ranks by cosine over 65-dim augmented vectors; brute force ranks
    // by raw inner product — same neighbors, same order
    val g = Similarity.qSimMips(spark, sf).cache()
    try {
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val q = e.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("q_id"), col("emb").as("qe2"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("q_id").orderBy(desc("ip2"), col("c_id"))
      val brute = e.select(col("vec_id").as("c_id"), col("emb").as("ce2"))
        .join(q, col("q_id") =!= col("c_id"))
        .withColumn("ip2", expr(
          "round(aggregate(zip_with(qe2, ce2, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, x) -> a + x), 6)"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("ip2").as("ip"))
      assert(g.count() > 0 && g.count() % 5 == 0)
      assert(g.exceptAll(brute).count() == 0)
      assert(brute.exceptAll(g).count() == 0)
    } finally g.unpersist()
  }

  test("embedding column stats: 64 dims, exact counts, bounds ordered, std positive") {
    val g = Similarity.qEmbColstats(spark, sf).cache()
    try {
      assert(g.count() == 64)
      val n = Tables.embeddings(spark, sf).count()
      assert(g.filter(col("n") =!= n).count() == 0)
      assert(g.filter(col("min_v") > col("mean_v") || col("mean_v") > col("max_v")).count() == 0)
      assert(g.filter(col("std_v") <= 0 || col("std_v").isNull).count() == 0)
    } finally g.unpersist()
  }

  test("normalized dedup finds every injected case variant raw hashing cannot") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val nVariants = docs.filter(col("doc_id") % 11 === 0).count()
    val g = Dedup.qDedupNormalized(spark, sf).cache()
    try {
      // every injected variant (id >= 3000000, never the min keeper) is a
      // beyond-keeper member of some group
      val extraMembers = g.agg(sum(col("n_copies") - 1)).head().getLong(0)
      assert(extraMembers >= nVariants)
      // raw md5 can't pair upper(text)||'  ' with text — the variant pairs
      // exist ONLY under normalization
      assert(g.filter(col("n_variants") >= 2).count() >= 1)
      val raw = docs.unionByName(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(upper(col("text")), lit("  ")).as("text")))
        .groupBy(md5(col("text"))).count().filter(col("count") > 1)
        .agg(coalesce(sum(col("count") - 1), lit(0L))).head().getLong(0)
      assert(extraMembers - raw >= nVariants)
    } finally g.unpersist()
  }

  test("containment flags the tail-append pairs at 1.0 where jaccard under-scores them") {
    val g = Dedup.qDedupContainment(spark, sf).cache()
    try {
      // injected tail-appends: original a fully contained in a+2000000
      val tails = g.filter(col("b_id") === col("a_id") + 2000000L).cache()
      assert(tails.count() >= 60) // 72 injected at sf0.001; banding may miss a few
      assert(tails.filter(col("cont_a_in_b") < 1.0).count() == 0)
      assert(tails.filter(col("jaccard") >= 1.0).count() == 0)
      tails.unpersist()
      // exact copies contain each other both ways (a_id < 1000000 keeps
      // out the copy-vs-extension pairs of %35 docs, which also differ
      // by exactly 1000000)
      val copies = g.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 1000000L)
      assert(copies.filter(col("cont_a_in_b") =!= 1.0 || col("cont_b_in_a") =!= 1.0).count() == 0)
    } finally g.unpersist()
  }

  test("bloom-gated decontamination is byte-identical to the exact pipeline") {
    // the Bloom prefilter admits ~1% false positives; the confirm join
    // must remove every one of them, leaving the ungated result exactly
    val exact = TextAnalysis.qDecontaminate(spark, sf).collect().toSet
    val gated = TextAnalysis.qDecontaminateBloom(spark, sf).collect().toSet
    assert(exact.nonEmpty)
    assert(gated == exact)
  }

  test("lm cross-entropy obeys the information bounds of an MLE trigram model") {
    val g = TextAnalysis.qLmPerplexity(spark, sf).cache()
    try {
      // every scored gram has c >= 1, so 0 < xent <= ln(n_total); the
      // upper bound is hit only by a singleton gram, the lower only if
      // one gram were the whole corpus
      val nTotal = Tables.documents(spark, sf)
        .filter(length(col("text")) >= 3)
        .select(sum(length(col("text")) - 2)).head().getLong(0)
      val lnTotal = math.log(nTotal.toDouble)
      assert(g.filter(col("xent") <= 0 || col("xent") > lnTotal).count() == 0)
      assert(g.filter(col("ppl_bucket") =!= floor(col("xent")).cast("long")).count() == 0)
      assert(g.filter(col("quality_pass") =!= (col("xent") < 8.0)).count() == 0)
    } finally g.unpersist()
  }

  test("zorder cells are tight in BOTH dimensions (16x16 Morton tiles)") {
    // zcell keeps the top 4 bits of each interleaved key, so every cell
    // must span at most a 16-wide range in x AND in y — clustering on
    // both columns at once, which lexicographic (x, y) sorting cannot give
    val g = operators.Curation.qZorderLayout(spark, sf).cache()
    try {
      assert(g.count() >= 1)
      assert(g.filter(col("x_max") - col("x_min") > 15).count() == 0)
      assert(g.filter(col("y_max") - col("y_min") > 15).count() == 0)
    } finally g.unpersist()
  }

  test("zorder writer layout: per-partition z ranges do not overlap") {
    // the OPTIMIZE ZORDER file layout: range-partition + local sort on z
    // means each output file owns a contiguous, disjoint Morton range,
    // so parquet min/max stats prune on either source column
    val parts = operators.Curation.zorderCode(spark, sf)
      .repartitionByRange(4, col("z")).sortWithinPartitions("z")
      .select("z").rdd
      .mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        if (zs.isEmpty) Iterator.empty else Iterator((zs.min, zs.max, zs == zs.sorted))
      }.collect().sortBy(_._1)
    assert(parts.nonEmpty)
    assert(parts.forall(_._3), "z not sorted within a partition")
    parts.sliding(2).foreach {
      case Array((_, aMax, _), (bMin, _, _)) => assert(aMax <= bMin, "overlapping z ranges")
      case _ =>
    }
  }

  test("reservoir sample keeps exactly min(k, stratum size) docs with the k smallest hashes") {
    val g = operators.Curation.qReservoirSample(spark, sf).cache()
    try {
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("h"))
        .cache()
      val langCounts = docs.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = g.collect().map(r => r.getString(0) -> r).toMap
      assert(got.keySet == langCounts.keySet)
      for ((lang, n) <- langCounts) {
        val k = math.min(20L, n)
        assert(got(lang).getAs[Long]("n_kept") == k)
        // membership: the kept set IS the k hash-smallest — checksum matches
        val expect = docs.filter(col("lang") === lang).collect()
          .sortBy(r => (r.getString(2), r.getLong(0))).take(k.toInt)
        assert(got(lang).getAs[Long]("kept_id_sum") == expect.map(_.getLong(0)).sum)
        assert(got(lang).getAs[String]("max_hash") == expect.map(_.getString(2)).max)
      }
      docs.unpersist()
    } finally g.unpersist()
  }

  test("triangles: brute-force parity, handshake identity, clustering bounded") {
    val tri = Dedup.qGraphTriangles(spark, sf).cache()
    try {
      assert(tri.filter(col("clustering") < 0 || col("clustering") > 1).count() == 0)
      // brute force: pairs carry a < b, so the (a,b)(b,c)(a,c) triple join
      // enumerates each triangle {a<b<c} exactly once
      val pairs = Dedup.qDedupLshPairs(spark, sf).select(col("a_id"), col("b_id")).cache()
      val p1 = pairs.select(col("a_id").as("x"), col("b_id").as("y"))
      val bf = p1.as("ab").join(p1.as("bc"), col("ab.y") === col("bc.x"))
        .join(p1.as("ac"), col("ac.x") === col("ab.x") && col("ac.y") === col("bc.y"))
      val nBf = bf.count()
      assert(nBf > 0, "corpus must contain triangles (injected dup families)")
      // handshake: per-vertex triangle counts sum to 3x the triangle count
      val tot = tri.agg(sum("n_tri")).collect()(0).getLong(0)
      assert(tot == 3 * nBf, s"per-vertex sum $tot != 3 * $nBf")
      pairs.unpersist()
    } finally { tri.unpersist(); CacheTracker.releaseAll() }
  }

  test("attribution: both touch types credited, per-model mass conserved to floor loss") {
    val at = operators.EventWindows.qAttribution(spark, sf).cache()
    try {
      assert(at.count() == 2, "view and click must both attract credit")
      // conservation: every converting purchase hands out <= 1,000,000 ppm
      // per model, and at least 1,000,000 - k (integer floor loss)
      val ev = Tables.events(spark, sf)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id"), col("ts").as("conv_ts"))
      val touch = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts").as("touch_ts"))
      val perConv = conv.join(touch, Seq("user_id"))
        .filter(col("touch_ts") < col("conv_ts") &&
          col("touch_ts") >= col("conv_ts") - expr("INTERVAL 24 HOURS"))
        .groupBy("conv_id").agg(count(lit(1)).as("k"))
      val nConv = perConv.count()
      val maxK = perConv.agg(max("k")).collect()(0).getLong(0)
      assert(nConv > 0)
      for (c <- Seq("linear_ppm", "pos_ppm")) {
        val got = at.agg(sum(c)).collect()(0).getLong(0)
        assert(got <= nConv * 1000000L, s"$c over-credits: $got")
        assert(got >= nConv * (1000000L - maxK), s"$c floor loss too large: $got")
      }
    } finally at.unpersist()
  }

  test("mix budget: plan within budget, caps bind at 4 epochs, surplus redistributed") {
    val mb = operators.Curation.qMixBudget(spark, sf).cache()
    try {
      val rows = mb.collect()
      assert(rows.length >= 2)
      val budget = 2 * rows.map(_.getAs[Long]("n_tokens")).sum
      val planned = rows.map(_.getAs[Long]("planned_tokens")).sum
      assert(planned <= budget, s"planned $planned exceeds budget $budget")
      val (capped, open) = rows.partition(_.getAs[Boolean]("capped"))
      // capped sources sit exactly at the 4-epoch ceiling
      capped.foreach(r => assert(r.getAs[Double]("epochs") == 4.0, r.toString))
      // uncapped sources absorb the surplus: at least their uniform share,
      // and the single redistribution pass leaves only floor residue
      open.foreach(r =>
        assert(r.getAs[Long]("planned_tokens") >= r.getAs[Long]("desired"), r.toString))
      if (open.nonEmpty)
        assert(budget - planned <= open.length, s"residue ${budget - planned} > ${open.length}")
    } finally mb.unpersist()
  }

  test("chi2 contingency: marginals consistent, contributions match a double-math reference") {
    val g = TextAnalysis.qChi2Contingency(spark, sf).cache()
    try {
      // cell counts roll up to the lang marginal the row carries
      val roll = g.groupBy("lang", "n_lang").agg(sum("n_obs").as("s"))
      assert(roll.filter(col("s") =!= col("n_lang")).count() == 0)
      // per-cell contribution equals the textbook (O-E)^2/E within rounding
      val n = Tables.documents(spark, sf).count().toDouble
      val rows = g.collect()
      rows.foreach { r =>
        val e = r.getAs[Long]("n_lang").toDouble * r.getAs[Long]("n_src") / n
        val o = r.getAs[Long]("n_obs").toDouble
        assert(math.abs(r.getAs[Double]("expected") - e) < 1e-4, r.toString)
        assert(math.abs(r.getAs[Double]("contrib") - (o - e) * (o - e) / e) < 1e-4, r.toString)
      }
    } finally g.unpersist()
  }

  test("event transitions: per-source probabilities sum to one, pair count conserved") {
    val g = operators.EventWindows.qEventTransitions(spark, sf).cache()
    try {
      // sum of p_trans per from_type ~ 1 (each term rounded at 6 dp)
      val sums = g.groupBy("from_type").agg(sum("p_trans").as("p"), sum("n_trans").as("nt"),
        max("n_from").as("nf")).collect()
      assert(sums.nonEmpty)
      sums.foreach { r =>
        assert(math.abs(r.getAs[Double]("p") - 1.0) < 1e-4, r.toString)
        assert(r.getAs[Long]("nt") == r.getAs[Long]("nf"), r.toString)
      }
      // every user with k events contributes exactly k-1 transitions
      val ev = Tables.events(spark, sf)
      val expect = ev.count() - ev.select("user_id").distinct().count()
      val got = g.agg(sum("n_trans")).collect()(0).getLong(0)
      assert(got == expect, s"transitions $got != events - users $expect")
    } finally g.unpersist()
  }

  test("cohort retention: week-0 is full, counts bounded by cohort size, users conserved") {
    val g = operators.EventWindows.qCohortRetention(spark, sf).cache()
    try {
      assert(g.count() > 0)
      // a cohort member's signup is itself week-0 activity -> retention 1.0
      val w0 = g.filter(col("offset_weeks") === 0)
      assert(w0.count() > 0)
      assert(w0.filter(col("n_active") =!= col("cohort_size")).count() == 0,
        "week-0 activity must include every cohort member")
      assert(g.filter(col("n_active") > col("cohort_size")).count() == 0)
      assert(g.filter(col("retention") < 0 || col("retention") > 1).count() == 0)
      // cohort sizes partition the signup-user population
      val signups = Tables.events(spark, sf)
        .filter(col("event_type") === "signup").select("user_id").distinct().count()
      val sumSizes = g.select("cohort_week", "cohort_size").distinct()
        .agg(sum("cohort_size")).collect()(0).getLong(0)
      assert(sumSizes == signups, s"cohort sizes $sumSizes != signup users $signups")
    } finally g.unpersist()
  }

  test("fuzzy match: exact copies at distance 0, tail-append near-dups confirmed") {
    val fm = Dedup.qFuzzyMatch(spark, sf).cache()
    try {
      val exact = fm.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 1000000L)
      assert(exact.count() == 100)
      assert(exact.filter(col("lev_dist") =!= 0 || col("sim_ratio") =!= 1.0).count() == 0)
      val near = fm.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 2000000L)
      assert(near.count() >= 60)
      assert(near.filter(!col("confirmed")).count() == 0,
        "appended-tail near-dups share the prefix and must confirm")
    } finally { fm.unpersist(); CacheTracker.releaseAll() }
  }

  test("knn classification equals an independent brute-force majority vote") {
    val got = Similarity.qKnnClassify(spark, sf).cache()
    assert(got.count() == 25) // one verdict per test vector (vec_id%20==0)
    // brute force in plain Scala: double cosine, Spark's HALF_UP 6-dp
    // rounding, (cos desc, id) then (votes desc, label) tie-breaks
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]) = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      r6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val train = all.filter(_._1 % 20 != 0)
    val expected = all.filter(_._1 % 20 == 0).map { case (qid, qv, _) =>
      val top10 = train.map(t => (cos(qv, t._2), t._1, t._3))
        .sortBy { case (c, id, _) => (-c, id) }.take(10)
      val (lbl, votes) = top10.groupBy(_._3).view.mapValues(_.length)
        .toSeq.sortBy { case (l, n) => (-n, l) }.head
      qid -> (lbl, votes.toLong)
    }.toMap
    got.collect().foreach { r =>
      val (lbl, votes) = expected(r.getLong(0))
      assert(r.getInt(2) == lbl && r.getLong(3) == votes, s"q_id ${r.getLong(0)}")
      assert(r.getBoolean(4) == (r.getInt(2) == r.getInt(1)))
    }
  }

  test("rrf fusion: scores recompute from ranks, both arms represented") {
    val rows = TextAnalysis.qRrfFusion(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val rs = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rd = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(rs.nonEmpty || rd.nonEmpty) // full-outer keeps one-arm docs only
      assert((rs.toSeq ++ rd.toSeq).forall(x => x >= 1 && x <= 50))
      val want = rs.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rd.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - want) < 1e-6, s"doc ${r.getLong(0)}")
    }
    // descending output, and a doc present in BOTH arms must outrank a
    // doc of equal best-arm rank present in one (the fusion property)
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.exists(r => !r.isNullAt(1) && !r.isNullAt(2)) ||
      scores.head <= 1.0 / 61 + 1e-9)
  }

  test("token pmi: counts are floored, formula recomputes, collocations positive") {
    val rows = TextAnalysis.qTokenPmi(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val nTokens = Tables.documents(spark, sf)
      .select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    rows.foreach { r =>
      val (cPair, cw1, cw2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cPair >= 3 && cw1 >= cPair && cw2 >= cPair)
      val want = math.log(cPair.toDouble * nTokens / (cw1.toDouble * cw2))
      assert(math.abs(r.getDouble(5) - want) < 1e-5)
    }
    // top collocation is a genuinely associated pair, not independence noise
    assert(rows.head.getDouble(5) > 0)
  }

  test("skyline: output is exactly the non-dominated set of orders") {
    val sky = operators.Advanced.qSkyline(spark, sf).collect()
      .map(r => r.getAs[Number]("o_orderkey").longValue).toSet
    val all = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate").cast("string").as("d"))
      .collect()
      .map(r => (r.getAs[Number]("o_orderkey").longValue,
        r.getAs[Double]("o_totalprice"), r.getAs[String]("d")))
    // ISO timestamp strings order identically to the timestamps themselves
    def dominates(a: (Double, String), b: (Double, String)): Boolean =
      a._1 >= b._1 && a._2 <= b._2 && (a._1 > b._1 || a._2 < b._2)
    // brute-force reference: quadratic dominance scan on the driver
    val expected = all.filter { case (_, p, d) =>
      !all.exists { case (_, p2, d2) => dominates((p2, d2), (p, d)) }
    }.map(_._1).toSet
    assert(sky == expected, s"skyline ${sky.size} rows vs expected ${expected.size}")
    assert(sky.nonEmpty && sky.size < all.length / 10, "skyline must prune aggressively")
  }

  test("ks test: statistic matches a driver-side ECDF scan, bounded in [0,1]") {
    val got = operators.EventWindows.qKsTest(spark, sf).collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), (col("user_id") % 2).cast("int").as("arm"),
        col("value").cast("decimal(18,2)").cast("double").as("v")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val a = ev.collect { case (`et`, 0, v) => v }.sorted
      val b = ev.collect { case (`et`, 1, v) => v }.sorted
      assert(r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length, et)
      val xs = (a ++ b).distinct
      val d = xs.map(x => math.abs(
        a.count(_ <= x).toDouble / a.length - b.count(_ <= x).toDouble / b.length)).max
      assert(math.abs(r.getAs[Double]("ks_d") - d) < 1e-5, s"$et ks_d")
      assert(r.getAs[Double]("ks_d") >= 0 && r.getAs[Double]("ks_d") <= 1, et)
    }
  }

  test("phrase search: matches a direct sliding-window scan of every document") {
    val g = TextAnalysis.qPhraseSearch(spark, sf).cache()
    try {
      assert(g.count() > 0)
      // independent recomputation: slide a window over the raw words array
      val docs = Tables.documents(spark, sf).withColumn("words", split(col("text"), " "))
      Seq(("table scan", "table", "scan"), ("hash join", "hash", "join")).foreach {
        case (ph, w0, w1) =>
          val want = docs.select(col("doc_id"), expr(
            s"filter(sequence(0, size(words) - 2), i -> words[i] = '$w0' AND words[i + 1] = '$w1')")
            .as("hits"))
            .filter(size(col("hits")) > 0)
            .select(col("doc_id"), size(col("hits")).cast("long").as("n_occ"),
              expr("hits[0] + 1").cast("long").as("first_pos"))
          val got = g.filter(col("phrase") === ph).drop("phrase")
          assert(got.count() == want.count(), s"$ph doc count")
          assert(got.except(want).count() == 0 && want.except(got).count() == 0, ph)
      }
      // no phrase hit can start after the last possible window
      assert(g.filter(col("first_pos") < 1).count() == 0)
    } finally g.unpersist()
  }

  test("ab t-test: arms partition events, Welch stat recomputes from raw data") {
    val g = operators.EventWindows.qAbTtest(spark, sf).collect()
    assert(g.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), (col("user_id") % 2).cast("int").as("arm"),
        col("value").cast("decimal(18,2)").cast("double").as("v"))
      .cache()
    try {
      g.foreach { r =>
        val et = r.getAs[String]("event_type")
        val Array(na, nb) = Array(0, 1).map(a =>
          ev.filter(col("event_type") === et && col("arm") === a).count())
        assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb, r.toString)
        // recompute mean/var per arm with plain double aggregates
        val stats = Array(0, 1).map { a =>
          val rows = ev.filter(col("event_type") === et && col("arm") === a)
            .agg(avg("v"), variance("v")).collect()(0)
          (rows.getDouble(0), rows.getDouble(1))
        }
        assert(math.abs(r.getAs[Double]("mean_a") - stats(0)._1) < 1e-4, r.toString)
        assert(math.abs(r.getAs[Double]("mean_b") - stats(1)._1) < 1e-4, r.toString)
        assert(math.abs(r.getAs[Double]("var_a") - stats(0)._2) < 1e-3, r.toString)
        assert(math.abs(r.getAs[Double]("var_b") - stats(1)._2) < 1e-3, r.toString)
        val se2 = stats(0)._2 / na + stats(1)._2 / nb
        val t = (stats(0)._1 - stats(1)._1) / math.sqrt(se2)
        assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-3, r.toString)
        // Welch df bounded by min(n)-1 below and n_a+n_b-2 above
        val df = r.getAs[Double]("welch_df")
        assert(df >= math.min(na, nb) - 1 - 1e-6 && df <= na + nb - 2 + 1e-6, r.toString)
      }
    } finally ev.unpersist()
  }

  test("dq audit: all constraints pass on the clean corpus, and a corrupted corpus fails exactly the injected ones") {
    val clean = operators.Advanced.qDqAudit(spark, sf).collect()
    assert(clean.length == 9)
    assert(clean.forall(_.getAs[Boolean]("pass")), clean.mkString(";"))
    assert(clean.forall(r => r.getAs[Long]("num") >= 0 &&
      r.getAs[Long]("den") > 0), "num/den sanity")
    // negative control: corrupt copies in a temp dir — null custkeys, a
    // duplicated orderkey, an out-of-range quantity, an orphan order
    val dir = java.nio.file.Files.createTempDirectory("graft_dq").toString
    val o = Tables.orders(spark, sf)
    o.withColumn("o_custkey",
        when(col("o_orderkey") % 100 === 0, lit(null)).otherwise(col("o_custkey") + 100000))
      .unionAll(o.limit(1))
      .write.parquet(s"$dir/orders.parquet")
    Tables.lineitem(spark, sf)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 97 === 0, lit(99.0)).otherwise(col("l_quantity")))
      .write.parquet(s"$dir/lineitem.parquet")
    Tables.customer(spark, sf).write.parquet(s"$dir/customer.parquet")
    Tables.documents(spark, sf)
      .withColumn("text", when(col("doc_id") === 0, lit("")).otherwise(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val bad = operators.Advanced.qDqAudit(spark, dir).collect()
      .map(r => r.getAs[String]("constraint") -> r.getAs[Boolean]("pass")).toMap
    val expectFail = Set("orders.o_custkey_complete", "orders.o_orderkey_unique",
      "orders.o_custkey_referential", "lineitem.l_quantity_range",
      "documents.text_nonempty")
    expectFail.foreach(c => assert(!bad(c), s"$c should fail on corrupted data"))
    (bad.keySet -- expectFail).foreach(c => assert(bad(c), s"$c should still pass"))
  }

  test("source overlap: shared-span counts bounded by both vocabularies and jaccard exact") {
    val rows = operators.Curation.qSourceOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sh, na, nb) = (r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"), r.toString)
      assert(sh >= 1 && sh <= math.min(na, nb), r.toString)
      val j = sh.toDouble / (na + nb - sh)
      assert(math.abs(r.getAs[Double]("jaccard") - j) < 1e-6, r.toString)
    }
    // the pair relation is strictly upper-triangular: no (b, a) twin ever
    val keys = rows.map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")))
    assert(keys.distinct.length == keys.length)
  }

  test("embedding covariance: integer-exact cov/corr track Spark's builtin covar_pop/corr") {
    val rows = Similarity.qEmbCovariance(spark, sf).collect()
    assert(rows.length == 36)
    val base = Tables.embeddings(spark, sf).selectExpr(
      (0 until 8).map(i => s"CAST(element_at(embedding, ${i + 1}) AS DOUBLE) AS d$i"): _*)
    rows.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      val ref = base.agg(covar_pop(col(s"d$i"), col(s"d$j")), corr(col(s"d$i"), col(s"d$j")))
        .collect()(0)
      assert(math.abs(r.getAs[Double]("cov") - ref.getDouble(0)) < 1e-4, s"cov($i,$j)")
      assert(math.abs(r.getAs[Double]("corr") - ref.getDouble(1)) < 1e-3, s"corr($i,$j)")
    }
    // diagonal corr is exactly 1
    rows.filter(r => r.getAs[Int]("i") == r.getAs[Int]("j"))
      .foreach(r => assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-9))
  }

  test("pca power iteration: distributed integer result equals an exact BigInt replay; Rayleigh monotone and bounded") {
    val out = Similarity.qPcaPower(spark, sf).collect()
      .map(r => r.getAs[Int]("i") -> (r.getAs[Long]("v"), r.getAs[Long]("lambda"))).toMap
    assert(out.size == 8)
    // exact BigInt replay of the whole pipeline from the raw parquet
    val vecs = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).take(8).map(v => BigInt(math.round(v.toDouble * 1e6))).toArray)
    val n = BigInt(vecs.length)
    def sdiv(a: BigInt, b: BigInt): BigInt = if (a < 0) -(a.abs / b) else a / b
    val sx = Array.tabulate(8)(i => vecs.map(_(i)).sum)
    val m = Array.tabulate(8, 8) { (i, j) =>
      sdiv(n * vecs.map(v => v(i) * v(j)).sum - sx(i) * sx(j), n)
    }
    var v = Array.fill(8)(BigInt(1000000))
    def matvec(x: Array[BigInt]) = Array.tabulate(8)(i => (0 until 8).map(j => m(i)(j) * x(j)).sum)
    var rays = Vector.empty[Double]
    (1 to 3).foreach { _ =>
      val w = matvec(v)
      val mx = w.map(_.abs).max
      v = w.map(x => sdiv(x * 1000000, mx))
      val mv = matvec(v)
      rays :+= (0 until 8).map(i => (v(i) * mv(i)).toDouble).sum /
        (0 until 8).map(i => (v(i) * v(i)).toDouble).sum
    }
    val mv = matvec(v)
    val lam = sdiv((0 until 8).map(i => v(i) * mv(i)).sum, (0 until 8).map(i => v(i) * v(i)).sum)
    (0 until 8).foreach(i => assert(out(i)._1 == v(i).toLong, s"component $i"))
    assert(out(0)._2 == lam.toLong)
    // power-iteration invariant: Rayleigh non-decreasing (tiny integer-
    // truncation slack), and never exceeds the true dominant eigenvalue
    // (Rayleigh bound), approximated here by 60 double iterations
    assert(rays.sliding(2).forall { case Seq(a, b) => b >= a * (1 - 1e-9) }, rays.toString)
    var u = Array.fill(8)(1.0)
    (1 to 60).foreach { _ =>
      val w = Array.tabulate(8)(i => (0 until 8).map(j => m(i)(j).toDouble * u(j)).sum)
      val mx = w.map(math.abs).max
      u = w.map(_ / mx)
    }
    val lamMax = (0 until 8).map(i =>
      u(i) * (0 until 8).map(j => m(i)(j).toDouble * u(j)).sum).sum /
      u.map(x => x * x).sum
    assert(rays.last <= lamMax * (1 + 1e-6), s"${rays.last} vs $lamMax")
  }

  test("JL projection: exact sign-matrix recompute and median distance preservation") {
    val out = Similarity.qEmbedProject(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("k")) -> r.getAs[Long]("proj")).toMap
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.round(v.toDouble * 1e6)).toArray).toMap
    assert(out.size == vecs.size * 8)
    // exact: every projection equals the driver-side sign-matrix product
    vecs.foreach { case (id, e) =>
      (0 until 8).foreach { k =>
        val expect = (0 until 64).map(i => Similarity.jlSigns(k)(i) * e(i)).sum
        assert(out((id, k)) == expect, s"vec $id dim $k")
      }
    }
    // JL contract: squared distances preserved in the median (k=8 is noisy
    // per-pair; the median over sampled pairs must sit near 1)
    val ids = vecs.keys.toArray.sorted
    val rnd = new scala.util.Random(7)
    val ratios = (1 to 80).flatMap { _ =>
      val (a, b) = (ids(rnd.nextInt(ids.length)), ids(rnd.nextInt(ids.length)))
      if (a == b) None else {
        val d2 = (0 until 64).map(i => math.pow((vecs(a)(i) - vecs(b)(i)).toDouble, 2)).sum
        val p2 = (0 until 8).map(k => math.pow((out((a, k)) - out((b, k))).toDouble, 2)).sum / 8
        Some(p2 / d2)
      }
    }.sorted
    val median = ratios(ratios.length / 2)
    assert(median > 0.4 && median < 2.5, s"median distortion $median")
  }

  test("ewma anomaly: recurrence matches a driver-side integer fold, flags consistent") {
    val got = operators.EventWindows.qEwmaAnomaly(spark, sf).collect()
    assert(got.nonEmpty)
    // independent recomputation: daily counts then the fixed-point fold
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").as("day_idx"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((et, d), xs) => (et, d, xs.length.toLong) }
      .toSeq.groupBy(_._1)
    val want = daily.flatMap { case (et, rows) =>
      val sorted = rows.sortBy(_._2)
      var prev = -1L
      sorted.map { case (_, d, c) =>
        val pe = if (prev < 0) None else Some(prev)
        val e = if (prev < 0) c * 1000000L else (2 * c * 1000000L + 8 * prev) / 10
        prev = e
        (et, d) -> (c, pe, e)
      }
    }
    got.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("day_idx"))
      val (c, pe, e) = want(key)
      assert(r.getAs[Long]("n_events") == c, s"$key n_events")
      assert(Option(r.getAs[java.lang.Long]("prev_ewma")).map(_.toLong) == pe, s"$key prev_ewma")
      assert(r.getAs[Long]("ewma") == e, s"$key ewma")
      // flag semantics: spike iff c > 1.5×prev level, drop iff c < 0.5×it
      assert(r.getAs[Boolean]("is_spike") == pe.exists(p => c * 2000000L > p * 3), s"$key spike")
      assert(r.getAs[Boolean]("is_drop") == pe.exists(p => c * 2000000L < p), s"$key drop")
    }
    assert(got.length == want.size)
  }

  test("quantile norm: buckets and shifts match a driver-side rank scan") {
    val got = operators.Curation.qQuantileNorm(spark, sf).collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getAs[Number]("doc_id").longValue, r.getString(1),
        r.getAs[Number]("n_chars").longValue))
    val nAll = docs.length.toLong
    // global vigintile floors over the strict (n_chars, doc_id) order
    val refLo = docs.map(d => (d._3, d._1)).sorted.zipWithIndex
      .groupBy { case (_, i) => i * 20 / nAll }
      .map { case (gb, xs) => gb.toInt -> xs.map(_._1._1).min }
    // per-source buckets from the per-source rank
    val want = docs.groupBy(_._2).flatMap { case (src, rows) =>
      rows.map(d => (d._3, d._1)).sorted.zipWithIndex
        .groupBy { case (_, rk) => (rk.toLong * 20 / rows.length).toInt }
        .map { case (b, xs) =>
          (src, b) -> (xs.length.toLong, xs.map(_._1._1).min) }
    }
    got.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[Int]("bucket"))
      val (nDocs, srcLo) = want(key)
      assert(r.getAs[Long]("n_docs") == nDocs, s"$key n_docs")
      assert(r.getAs[Long]("src_lo") == srcLo, s"$key src_lo")
      assert(r.getAs[Long]("ref_lo") == refLo(key._2), s"$key ref_lo")
      assert(r.getAs[Long]("shift") == refLo(key._2) - srcLo, s"$key shift")
    }
    assert(got.length == want.size)
  }

  test("length buckets: 64-aligned, padding bounded per doc, batch count exact ceil") {
    val r = operators.Curation.qLengthBuckets(spark, sf).collect()
    assert(r.nonEmpty)
    var docs = 0L
    r.foreach { row =>
      val (bl, n, st, pad, nb) = (row.getAs[Long]("bucket_len"), row.getAs[Long]("n_docs"),
        row.getAs[Long]("sum_tokens"), row.getAs[Long]("padding"), row.getAs[Long]("n_batches"))
      assert(bl % 64 == 0 && bl > 0)
      assert(pad == bl * n - st)
      assert(pad >= 0 && pad < 64 * n, "per-doc padding must be < 64 by construction")
      assert(nb == (bl * n + 8191) / 8192)
      docs += n
    }
    assert(docs == Tables.documents(spark, sf).count())
  }

  test("neyman allocation: budget hit exactly, std-devs match driver recompute") {
    val r = operators.Curation.qNeymanAlloc(spark, sf).collect()
    assert(r.length == 5)
    assert(r.map(_.getAs[Long]("alloc")).sum == 10000L)
    val raw = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val want = raw.groupBy(_._1).map { case (p, xs) =>
      val n = xs.length
      val s1 = xs.map(x => BigInt(x._2)).sum
      val s2 = xs.map(x => BigInt(x._2) * BigInt(x._2)).sum
      val sd = math.sqrt((s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1)) / 100.0
      p -> (n.toLong, sd)
    }
    r.foreach { row =>
      val (n, sd) = want(row.getAs[String]("o_orderpriority"))
      assert(row.getAs[Long]("n_h") == n)
      assert(row.getAs[Double]("s_h") ==
        BigDecimal(sd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(row.getAs[Long]("alloc") > 0)
    }
  }

  test("holt trend: two-state recurrence equals an exact BigInt floor-division replay") {
    val got = operators.EventWindows.qHoltTrend(spark, sf).collect()
    assert(got.nonEmpty)
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").as("day_idx"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((et, d), xs) => (et, d, xs.length.toLong) }
      .toSeq.groupBy(_._1)
    val want = daily.flatMap { case (et, rows) =>
      var l, b = 0L; var init = false
      rows.sortBy(_._2).map { case (_, d, c) =>
        if (!init) { l = c * 1000000L; b = 0L; init = true }
        else {
          val ln = Math.floorDiv(2 * c * 1000000L + 8 * (l + b), 10L)
          b = Math.floorDiv((ln - l) + 9 * b, 10L)
          l = ln
        }
        (et, d) -> (c, l, b)
      }
    }
    got.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("day_idx"))
      val (c, l, b) = want(key)
      assert(r.getAs[Long]("n_events") == c, s"$key n_events")
      assert(r.getAs[Long]("level") == l, s"$key level")
      assert(r.getAs[Long]("trend") == b, s"$key trend")
      assert(r.getAs[Long]("forecast_next") == l + b, s"$key forecast")
    }
    assert(got.length == want.size)
  }

  test("bpe merges: driver replay of the greedy training loop reproduces rules and token counts") {
    val got = TextAnalysis.qBpeMerges(spark, sf).collect().sortBy(_.getAs[Int]("step"))
    assert(got.length == 5)
    // replay: tokenize the sample, then 5 rounds of count→argmax→fold
    var docs = Tables.documents(spark, sf).filter(col("doc_id") % 20 === 0)
      .select("text").collect().map(_.getString(0).split(" ", -1).toVector)
    for (row <- got) {
      val pairCounts = docs.flatMap(t => t.zip(t.drop(1)))
        .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      val ((l, r), n) = pairCounts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
      assert(row.getAs[String]("left_tok") == l, s"step ${row.getAs[Int]("step")} left")
      assert(row.getAs[String]("right_tok") == r, s"step ${row.getAs[Int]("step")} right")
      assert(row.getAs[Long]("n_pair") == n, s"step ${row.getAs[Int]("step")} count")
      docs = docs.map(_.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r)
          acc.init :+ (l + "\u0001" + r)
        else acc :+ x
      })
      assert(row.getAs[Long]("sample_tokens_after") == docs.map(_.size.toLong).sum,
        s"step ${row.getAs[Int]("step")} tokens")
    }
    // each merge strictly shrinks the sample token count
    got.map(_.getAs[Long]("sample_tokens_after")).sliding(2).foreach {
      case Array(a, b) => assert(b < a, "merges must shrink the corpus")
      case _ =>
    }
  }

  test("seasonal decompose: trend only on full 7-day windows, residual = ratio - seasonal") {
    val got = operators.EventWindows.qSeasonalDecompose(spark, sf).collect()
    assert(got.nonEmpty)
    val byType = got.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rows) =>
      val days = rows.map(_.getAs[Long]("day_idx")).toSet
      rows.foreach { r =>
        val d = r.getAs[Long]("day_idx")
        val full = (-3L to 3L).forall(off => days.contains(d + off))
        assert((r.getAs[Any]("trend_scaled") != null) == full,
          s"trend presence wrong at day $d (full window: $full)")
        if (r.getAs[Any]("trend_scaled") != null) {
          val c = r.getAs[Long]("n_events")
          val t = r.getAs[Long]("trend_scaled")
          assert(r.getAs[Long]("ratio_scaled") == c * 1000000000000L / t)
          assert(r.getAs[Long]("resid_scaled") ==
            r.getAs[Long]("ratio_scaled") - r.getAs[Long]("seas_scaled"))
        }
        assert(r.getAs[Long]("dow") == java.lang.Math.floorMod(d, 7L))
      }
      // seasonal indices hover around the 10^6 fixed-point unit
      val seas = rows.map(_.getAs[Long]("seas_scaled")).distinct
      assert(seas.forall(v => v > 200000L && v < 5000000L),
        s"seasonal indices implausible: ${seas.toSeq}")
    }
  }

  test("sliding distinct: rolling 7-day actives match a brute-force window scan") {
    val got = operators.EventWindows.qSlidingDistinct(spark, sf).collect()
    assert(got.nonEmpty)
    val du = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").as("day_idx"))
      .distinct().collect()
      .map(r => (r.getAs[Number]("user_id").longValue, r.getAs[Long]("day_idx")))
    val days = du.map(_._2).distinct
    assert(got.length == days.length, "one row per observed day")
    got.foreach { r =>
      val d = r.getAs[Long]("day_idx")
      val wau = du.filter(x => x._2 >= d - 6 && x._2 <= d).map(_._1).distinct.length.toLong
      val dau = du.filter(_._2 == d).map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("n_active_7d") == wau, s"day $d wau")
      assert(r.getAs[Long]("n_active_1d") == dau, s"day $d dau")
      assert(wau >= dau, "a 7-day window can't have fewer actives than its last day")
    }
  }

  test("graph jaccard: neighbor overlap recomputes from the LSH edge set, bounds hold") {
    val got = Dedup.qGraphJaccard(spark, sf).collect()
    CacheTracker.releaseAll()
    assert(got.nonEmpty)
    val pairs = Dedup.qDedupLshPairs(spark, sf).select("a_id", "b_id").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    CacheTracker.releaseAll()
    val nbrs = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).toSet }
    got.foreach { r =>
      val (a, b) = (r.getAs[Number]("a_id").longValue, r.getAs[Number]("b_id").longValue)
      assert(a < b, "pairs must be canonical")
      val (na, nb) = (nbrs(a), nbrs(b))
      val inter = (na & nb).size.toLong
      assert(r.getAs[Long]("n_shared") == inter, s"($a,$b) shared")
      assert(r.getAs[Long]("deg_a") == na.size.toLong && r.getAs[Long]("deg_b") == nb.size.toLong)
      val j = BigDecimal(inter.toDouble / (na.size + nb.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("nbr_jaccard") == j, s"($a,$b) jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("readability: counts and grade recompute driver-side; min-1 floors hold") {
    val got = TextAnalysis.qTextReadability(spark, sf).collect()
    assert(got.length == Tables.documents(spark, sf).count())
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val vowels = "[aeiouy]+".r
    got.foreach { r =>
      val text = texts(r.getAs[Number]("doc_id").longValue)
      val words = text.split(" ", -1)
      val nw = words.length.toLong
      val ns = math.max(text.count(c => c == '.' || c == '!' || c == '?').toLong, 1L)
      val syl = words.map(w => math.max(vowels.findAllIn(w).size.toLong, 1L)).sum
      assert(r.getAs[Long]("n_words") == nw)
      assert(r.getAs[Long]("n_sentences") == ns)
      assert(r.getAs[Long]("n_syllables") == syl)
      val fk = 0.39 * (nw.toDouble / ns) + 11.8 * (syl.toDouble / nw) - 15.59
      assert(r.getAs[Double]("fk_grade") ==
        BigDecimal(fk).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("streaks: longest consecutive-day runs match a driver-side scan") {
    val got = operators.EventWindows.qStreaks(spark, sf).collect()
    assert(got.nonEmpty)
    val du = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").as("day_idx"))
      .distinct().collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Long](1)))
    val best = du.groupBy(_._1).map { case (u, xs) =>
      val days = xs.map(_._2).sorted
      var (bestLen, cur) = (1L, 1L)
      for (i <- 1 until days.length) {
        cur = if (days(i) == days(i - 1) + 1) cur + 1 else 1L
        bestLen = math.max(bestLen, cur)
      }
      u -> bestLen
    }
    val want = best.groupBy(_._2).map { case (len, xs) =>
      len -> (xs.size.toLong, xs.keys.min) }
    got.foreach { r =>
      val (nu, ex) = want(r.getAs[Long]("best_streak"))
      assert(r.getAs[Long]("n_users") == nu, s"streak ${r.getAs[Long]("best_streak")}")
      assert(r.getAs[Long]("example_user") == ex)
    }
    assert(got.length == want.size)
    assert(got.map(_.getAs[Long]("n_users")).sum == best.size)
  }

  test("winsorize: exact bounded-domain percentiles, clamped mean between raw extremes") {
    val got = operators.Advanced.qWinsorize(spark, sf).collect()
    assert(got.nonEmpty)
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), expr("CAST(l_quantity AS BIGINT)").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    got.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val qs = raw.filter(_._1 == flag).map(_._2).sorted
      val n = qs.length.toLong
      def pct(k: Long) = qs(((k * n + 99) / 100 - 1).toInt)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("p10") == pct(10), s"$flag p10")
      assert(r.getAs[Long]("p90") == pct(90), s"$flag p90")
      val (p10, p90) = (pct(10), pct(90))
      val ws = qs.map(v => math.min(math.max(v, p10), p90)).sum
      assert(r.getAs[Double]("wins_mean") ==
        BigDecimal(ws.toDouble / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Double]("raw_mean") ==
        BigDecimal(qs.sum.toDouble / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("dedup canonical: exactly one longest-survivor per cluster, verdicts consistent") {
    val got = Dedup.qDedupCanonical(spark, sf).collect()
    CacheTracker.releaseAll()
    assert(got.nonEmpty)
    val byCluster = got.groupBy(_.getAs[Number]("cluster_id").longValue)
    byCluster.foreach { case (cid, rows) =>
      val keeps = rows.filter(_.getAs[Boolean]("keep"))
      assert(keeps.length == 1, s"cluster $cid must keep exactly one doc")
      assert(rows.length.toLong == rows.head.getAs[Long]("cluster_size"))
      // the keeper is the longest copy, doc_id tie-break
      val bestKey = rows.map(r =>
        (-r.getAs[Long]("n_chars"), r.getAs[Number]("doc_id").longValue)).min
      val keeper = keeps.head
      assert((-keeper.getAs[Long]("n_chars"),
        keeper.getAs[Number]("doc_id").longValue) == bestKey, s"cluster $cid keeper")
    }
  }

  test("k-core peeling: round-1 removals are exactly the degree<2 vertices, and rounds nest") {
    val g = Dedup.qGraphKcore(spark, sf).cache()
    val rows = g.collect()
    CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    // peeled in round 1 ⇔ initial degree < 2 (later rounds depend on the
    // induced subgraph, checked via monotonicity below)
    rows.foreach { r =>
      val (d0, pr) = (r.getAs[Long]("deg0"), r.getAs[Int]("peeled_round"))
      assert((pr == 1) == (d0 < 2), s"doc ${r.get(0)}: deg0=$d0 peeled=$pr")
      if (pr != 0) assert(r.getAs[Long]("core_deg") == 0L)
    }
    // survivors are a subset of each round's alive set: counts decrease
    val byRound = rows.groupBy(_.getAs[Int]("peeled_round")).view.mapValues(_.length)
    val survivors = byRound.getOrElse(0, 0)
    assert(survivors > 0, "the exact-copy cliques must survive 2-core peeling")
  }

  test("naive bayes scores every held-out doc once and predicts a trained class") {
    // NOTE: the synthetic corpus draws every language's text from the
    // same vocabulary (verified: per-lang top words are identical), so
    // label ACCURACY is chance here by design — the oracle hash equality
    // covers numeric correctness; this spec checks the contract.
    val g = TextAnalysis.qNaiveBayes(spark, sf).cache()
    val rows = g.collect()
    CacheTracker.releaseAll()
    val nTest = Tables.documents(spark, sf).filter(col("doc_id") % 2 === 1).count()
    assert(rows.length.toLong == nTest, "one prediction per held-out doc")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    val classes = Set("en", "de", "fr", "es", "zh")
    rows.foreach { r =>
      assert(classes(r.getAs[String]("pred_lang")))
      val sc = r.getAs[Double]("logscore")
      assert(!sc.isNaN && !sc.isInfinite && sc < 0, s"logscore $sc")
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[String]("pred_lang") == r.getAs[String]("lang")))
    }
  }

  test("aspect buckets partition the image set and never produce negative padding") {
    val g = Multimodal.qAspectBuckets(spark, sf).cache()
    val totalAssigned = g.agg(sum("n_images")).head.getLong(0)
    val nImages = Tables.documents(spark, sf).filter(col("doc_id") % 3 === 0).count()
    assert(totalAssigned == nImages, "every image lands in exactly one bucket")
    assert(g.filter(col("pad_px") < 0 || col("pad_frac") < 0 || col("pad_frac") >= 1).count() == 0)
    g.unpersist()
  }

  test("BLEU-2 pair audit: exact copies score 1.0, tail-append near-dups strictly between 0 and 1") {
    val g = Dedup.qBleuPairs(spark, sf).cache()
    val exact = g.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 1000000L)
    assert(exact.count() == 100)
    assert(exact.filter(col("bleu2") =!= 1.0 || col("p1") =!= 1.0 || col("p2") =!= 1.0).count() == 0)
    val near = g.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 2000000L).cache()
    assert(near.count() >= 60) // LSH recall bound, as in the jaccard spec
    assert(near.filter(col("bleu2") <= 0.0 || col("bleu2") >= 1.0).count() == 0)
    // tail-append makes the CANDIDATE the longer side: no brevity penalty,
    // the loss is purely clipped-precision (m1 < len_b)
    assert(near.filter(col("len_b") <= col("len_a")).count() == 0)
    assert(near.filter(col("m1") >= col("len_b")).count() == 0)
    near.unpersist(); g.unpersist()
  }

  test("Zipf fit matches a driver-side OLS replay and slopes downward") {
    val r = TextAnalysis.qZipfFit(spark, sf).head()
    // the synthetic corpus has a 31-type vocabulary at every sf, so the
    // top-200 cap is not binding and the fit covers the whole vocab
    assert(r.getAs[Long]("n_fit") == math.min(200L, r.getAs[Long]("n_types")))
    val slope = r.getAs[Double]("slope")
    assert(slope < 0, s"rank-frequency slope must be negative, got $slope")
    assert(r.getAs[Double]("zipf_alpha") == -slope)
    // replay: same top-200, same 6-dp-rounded ln points, driver-side OLS
    val pts = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(200)
      .collect().zipWithIndex.map { case (row, i) =>
        val x = BigDecimal(math.log(i + 1.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val y = BigDecimal(math.log(row.getAs[Long]("freq").toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (x, y)
      }
    val n = pts.length.toDouble
    var sx = 0.0; var sy = 0.0; var sxx = 0.0; var sxy = 0.0
    pts.foreach { case (x, y) => sx += x; sy += y; sxx += x * x; sxy += x * y }
    val expSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(pts.length == r.getAs[Long]("n_fit"))
    assert(math.abs(slope - expSlope) < 1e-6, s"$slope vs replay $expSlope")
  }

  test("lexical diversity: counts nest, ratios bounded, token mass conserved") {
    val g = TextAnalysis.qLexicalDiversity(spark, sf).cache()
    assert(g.filter(col("n_hapax") > col("n_types") || col("n_types") > col("n_tokens")).count() == 0)
    assert(g.filter(col("ttr") <= 0 || col("ttr") > 1 ||
      col("hapax_frac") < 0 || col("hapax_frac") > 1 || col("yule_k") < 0).count() == 0)
    val massOut = g.agg(sum("n_tokens")).head.getLong(0)
    val massIn = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n")).agg(sum("n")).head.getLong(0)
    assert(massOut == massIn, "per-source token totals must sum to the corpus total")
    g.unpersist()
  }

  test("hard negatives: 5 per anchor, labels differ, and the set matches brute force") {
    val g = Similarity.qHardNegatives(spark, sf).cache()
    val perAnchor = g.groupBy("q_id").count()
    assert(perAnchor.filter(col("count") =!= 5).count() == 0)
    assert(g.filter(col("q_label") === col("neg_label")).count() == 0)
    assert(g.filter(col("cosine") < -1.0 || col("cosine") > 1.0).count() == 0)
    // brute force replay over the full cross join (500 vectors at sf0.001)
    graft.functions.VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"), col("label"))
    val a = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("qe"), col("label").as("q_label"))
    val c = e.select(col("vec_id").as("c_id"), col("emb").as("ce"), col("label").as("neg_label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_r").desc, col("c_id"))
    val brute = c.join(a, col("q_label") =!= col("neg_label"))
      .withColumn("cos_r", expr("round(cosine_sim(qe, ce), 6)"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("q_id", "rank", "c_id")
    assert(g.select("q_id", "rank", "c_id").exceptAll(brute).count() == 0)
    assert(brute.exceptAll(g.select("q_id", "rank", "c_id")).count() == 0)
    g.unpersist()
  }

  test("b-bit minhash: low-bit matches dominate full matches, exact copies estimate 1.0") {
    val g = Dedup.qMinhashBbit(spark, sf).cache()
    // a full 32-bit slot match is also a 2-bit match, never the reverse
    assert(g.filter(col("n_match_2bit") < col("n_match")).count() == 0)
    val exact = g.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 1000000L)
    assert(exact.count() == 100)
    assert(exact.filter(col("est_bbit") =!= 1.0 || col("est_full") =!= 1.0).count() == 0)
    // the correction maps n2 = 4 (pure-chance agreement) to 0, n2 = 16 to 1
    assert(g.filter(col("est_bbit") > 1.0).count() == 0)
    g.unpersist()
  }

  test("label-noise joint: per-class fractions sum to 1 and diagonal cells are not flagged") {
    val g = TextAnalysis.qLabelNoise(spark, sf).cache()
    CacheTracker.releaseAll()
    assert(g.filter(col("suspected_noise") === (col("lang") === col("pred_lang"))).count() == 0)
    val byLang = g.groupBy("lang")
      .agg(sum("n_docs").as("s"), max("n_given").as("ng"), sum("cell_frac").as("fs"))
      .collect()
    byLang.foreach { r =>
      assert(r.getAs[Long]("s") == r.getAs[Long]("ng"), r.toString)
      assert(math.abs(r.getAs[Double]("fs") - 1.0) < 1e-4, r.toString)
    }
    g.unpersist()
  }

  test("wilson ranking: lower bound never exceeds the point rate and ranks are a permutation") {
    val rows = TextAnalysis.qWilsonRank(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, lo) = (r.getAs[Double]("p_hat"), r.getAs[Double]("wilson_lo"))
      assert(lo <= p && lo >= 0 && p <= 1, r.toString)
    }
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
    // the bound must order by evidence, not raw rate: ranks follow wilson_lo desc
    val sorted = rows.sortBy(r => (-r.getAs[Double]("wilson_lo"), r.getAs[String]("source")))
    assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
  }

  test("BPE encode: out-of-sample compression is real and bounded by the raw token count") {
    val g = TextAnalysis.qBpeEncode(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).filter(col("doc_id") % 20 === 1).count()
    assert(g.count() == nDocs, "one row per held-out document")
    assert(g.filter(col("n_bpe") > col("n_raw") || col("n_bpe") < 1).count() == 0)
    assert(g.filter(col("n_merged") =!= col("n_raw") - col("n_bpe")).count() == 0)
    assert(g.filter(col("compression") > 1.0 || col("compression") <= 0.0).count() == 0)
    // the trained rules must actually fire on the held-out slice
    assert(g.agg(sum("n_merged")).head.getLong(0) > 0, "no merge applied out-of-sample")
    g.unpersist()
  }

  test("sessionization: session count matches the native session_window and indexes are contiguous") {
    val g = operators.EventWindows.qSessionize(spark, sf).cache()
    // Same convention on both sides of the equality: qSessionize floors
    // timestamps to epoch seconds and keeps a gap of EXACTLY 1800 s in
    // the same session (diff > 1800 starts a new one), while the native
    // session_window is half-open at sub-second precision (an event
    // exactly gap after its predecessor is NEW). Feeding session_window
    // floored-second timestamps with a 1801 s gap makes the two rules
    // identical on integers (new ⟺ diff ≥ 1801 ⟺ diff > 1800), so the
    // count equality holds for ANY fixture, not just gap-free ones.
    val flooredEvents = Tables.events(spark, sf)
      .withColumn("ts", timestamp_seconds(col("ts").cast("long")))
    assert(g.count() ==
      streaming.StreamOps.sessionCounts(flooredEvents, "1801 seconds", col("user_id")).count())
    assert(g.agg(sum("n_events")).head.getLong(0) == Tables.events(spark, sf).count())
    assert(g.filter(col("duration_s") < 0).count() == 0)
    val idx = g.groupBy("user_id")
      .agg(min("session_idx").as("lo"), max("session_idx").as("hi"), count(lit(1)).as("n"))
    assert(idx.filter(col("lo") =!= 1L || col("hi") =!= col("n")).count() == 0,
      "per-user session indexes must be contiguous from 1")
    g.unpersist()
  }

  test("perceptual hash: every injected copy and in-place perturbation is found, nothing else") {
    val g = Multimodal.qMultimodalPhash(spark, sf).cache()
    CacheTracker.releaseAll()
    // expectations derive from the GUARDED media corpus (payloads under
    // 64 bytes are dropped before fingerprinting — see qMultimodalPhash)
    val docs = Tables.documents(spark, sf).filter(length(col("text")) >= 64)
    val nExact = docs.filter(col("doc_id") % 5 === 0).count()
    val nPert = docs.filter(col("doc_id") % 7 === 0).count()
    val exact = g.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 1000000L)
    assert(exact.count() == nExact)
    assert(exact.filter(col("hamming") =!= 0).count() == 0, "byte-exact copies must collide fully")
    val pert = g.filter(col("a_id") < 1000000L && col("b_id") === col("a_id") + 2000000L)
    assert(pert.count() == nPert, "a same-length single-byte edit flips at most 2 grid cells")
    assert(pert.filter(col("hamming") > 2).count() == 0)
    // no false positives: pairs of two ORIGINAL docs would be chance 64-bit collisions
    assert(g.filter(col("a_id") < 1000000L && col("b_id") < 1000000L).count() == 0)
    g.unpersist()
  }

  test("silhouette: one row per label, scores bounded, vector mass conserved") {
    val rows = Similarity.qSilhouette(spark, sf).collect()
    CacheTracker.releaseAll()
    val nLabels = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(rows.length == nLabels)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_sil")
      assert(m >= -1.0 && m <= 1.0, r.toString)
      assert(r.getAs[Long]("n_separated") <= r.getAs[Long]("n_vecs"), r.toString)
    }
  }

  test("vocab coverage: monotone in budget, saturates at the full vocabulary") {
    val rows = TextAnalysis.qVocabCoverage(spark, sf).collect().sortBy(_.getAs[Int]("k"))
    CacheTracker.releaseAll()
    val nTypes = rows.head.getAs[Long]("n_types")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_in_vocab") == math.min(r.getAs[Int]("k").toLong, nTypes), r.toString)
      assert(r.getAs[Long]("covered") <= r.getAs[Long]("n_tokens"), r.toString)
    }
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage must be monotone")
    assert(cov.last == 1.0, "a budget beyond the vocabulary must cover every token")
    assert(cov.head > 0.0)
  }

  test("minhash union sketch: slot mins recompute from the distinct shingle universe") {
    val g = Dedup.qMinhashUnion(spark, sf).cache()
    CacheTracker.releaseAll()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(g.count() == nSources * (nSources - 1) / 2, "one row per source pair")
    assert(g.filter(col("jaccard") < 0 || col("jaccard") > 1 ||
      col("est_jaccard") < 0 || col("est_jaccard") > 1).count() == 0)
    assert(g.filter(col("n_inter") > col("n_union")).count() == 0)
    // 3-sigma contract: rare violations allowed, systematic failure is not
    val okFrac = g.filter(col("within_bound")).count().toDouble / g.count()
    assert(okFrac >= 0.9, s"bound held on only $okFrac of pairs")
    g.unpersist()
    // mergeability identity: the per-source slot min computed from the
    // DISTINCT shingle universe (independent interpreted-HOF shingling)
    // equals the min over the per-document signature slots
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("words", split(col("text"), " "))
      .withColumn("sset", array_distinct(expr(Dedup.shinglesHofExpr)))
      .filter(size(col("sset")) > 0)
    val fromUniverse = docs
      .select(col("source"), explode(col("sset")).as("sh")).distinct()
      .withColumn("h", expr("CAST(conv(substring(md5(sh), 1, 7), 16, 10) AS BIGINT)"))
      .select(col("source"), posexplode(expr(
        "transform(sequence(0, 15), k -> ((2654435761 + 40503 * k) * h + 2654435769 * k + 97) % 2147483647)"))
        .as(Seq("k", "v")))
      .groupBy("source", "k").agg(min("v").as("uv"))
    val fromDocs = Dedup.withSignature(docs.select(col("doc_id"), col("source"), col("text")))
      .filter(size(col("hashes")) >= 1)
      .select(col("source"), posexplode(col("sig")).as(Seq("k", "v")))
      .groupBy("source", "k").agg(min("v").as("dv"))
    assert(fromUniverse.join(fromDocs, Seq("source", "k"))
      .filter(col("uv") =!= col("dv")).count() == 0,
      "union-of-mins must equal min-over-universe in every slot")
  }

  test("join-size sketch: the inner product never underestimates and exact matches the real join") {
    val r = operators.Scale.qJoinSizeSketch(spark, sf).head()
    assert(r.getAs[Boolean]("never_under"))
    assert(r.getAs[Double]("ratio") >= 1.0)
    val ev = Tables.events(spark, sf).select(col("user_id"))
    val od = Tables.orders(spark, sf).select(col("o_custkey"))
    val trueSize = ev.join(od, col("user_id") === col("o_custkey")).count()
    assert(r.getAs[Long]("exact_size") == trueSize, "sum of count products must equal the join size")
    assert(r.getAs[Long]("cms_est") == r.getAs[Long]("exact_size") + r.getAs[Long]("overcount"))
  }

  test("cluster eval: high family recall, consistent F1, nothing counted twice") {
    val r = Dedup.qDedupClusterEval(spark, sf).head()
    CacheTracker.releaseAll()
    val (tp, pred, truth) = (r.getAs[Long]("tp"),
      r.getAs[Long]("pred_pairs"), r.getAs[Long]("true_pairs"))
    assert(tp <= pred && tp <= truth)
    assert(r.getAs[Double]("pair_recall") >= 0.9, "LSH must recover nearly every injected family pair")
    val f1 = 2.0 * tp / (pred + truth)
    assert(math.abs(r.getAs[Double]("pair_f1") - f1) < 1e-5)
  }

  test("threshold sweep: monotone in the cutoff, exact copies never lost, counts partition") {
    val rows = Dedup.qDedupThresholdSweep(spark, sf).collect()
      .sortBy(_.getAs[Double]("threshold"))
    CacheTracker.releaseAll()
    assert(rows.map(_.getAs[Double]("threshold")).toSeq == Seq(0.3, 0.5, 0.7, 0.9))
    rows.foreach { r =>
      assert(r.getAs[Double]("exact_recall") == 1.0, "exact copies sit at jaccard 1.0")
      assert(r.getAs[Long]("n_pairs") ==
        r.getAs[Long]("n_exact") + r.getAs[Long]("n_near") + r.getAs[Long]("n_natural"))
    }
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b }, "pair counts must shrink")
    val nearRec = rows.map(_.getAs[Double]("near_recall"))
    assert(nearRec.zip(nearRec.tail).forall { case (a, b) => a >= b })
    assert(nearRec.head > nearRec.last, "a higher bar must shed tail-append near-dups")
  }

  test("incremental top-k: the stored-index + batch merge equals a from-scratch recompute") {
    val g = Similarity.qSimTopkIncremental(spark, sf).cache()
    assert(g.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
    // the merge must equal brute force over everything (rank monotonicity)
    graft.functions.VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos_r").desc, col("c_id"))
    val full = e.select(col("vec_id").as("c_id"), col("emb").as("ce"))
      .join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos_r", expr("round(cosine_sim(qe, ce), 6)"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("q_id", "rank", "c_id")
    assert(g.select(col("q_id"), col("rank"), col("neighbor_id").as("c_id"))
      .exceptAll(full).count() == 0)
    assert(full.exceptAll(g.select(col("q_id"), col("rank"),
      col("neighbor_id").as("c_id"))).count() == 0)
    // the new batch must actually contribute neighbors (live refresh path)
    assert(g.filter(col("from_batch")).count() > 0)
    g.unpersist()
  }

  test("large-star/small-star CC equals label propagation exactly, including on a long path") {
    // on the real near-dup graph
    val star = Dedup.qDedupCcLargestar(spark, sf)
      .select("doc_id", "cluster_id", "cluster_size").cache()
    val prop = Dedup.qDedupClusters(spark, sf)
      .select("doc_id", "cluster_id", "cluster_size").cache()
    assert(star.exceptAll(prop).count() == 0 && prop.exceptAll(star).count() == 0)
    star.unpersist(); prop.unpersist(); CacheTracker.releaseAll()
    // and on a HIGH-DIAMETER graph (a 60-node path), the regime the star
    // algorithm exists for: both algorithms find one component with min 0
    import spark.implicits._
    val path = (0L until 59L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    Seq(Dedup.largestarFromPairs(path), Dedup.clustersFromPairs(path)).foreach { df =>
      val got = df.select("doc_id", "cluster_id", "cluster_size").cache()
      assert(got.filter(col("cluster_id") =!= 0L || col("cluster_size") =!= 60L).count() == 0)
      assert(got.count() == 60)
      got.unpersist(); CacheTracker.releaseAll()
    }
  }

  test("tokenizer fertility: parities average to 1 under token weighting") {
    val rows = TextAnalysis.qTokenizerFertility(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("fertility") > 0, r.toString)
      assert(r.getAs[Double]("parity") > 0, r.toString)
    }
    // token-weighted mean of language fertilities IS the corpus fertility
    val wParity = rows.map(r => r.getAs[Long]("n_words").toDouble * r.getAs[Double]("parity")).sum /
      rows.map(_.getAs[Long]("n_words").toDouble).sum
    assert(math.abs(wParity - 1.0) < 1e-4, s"weighted parity $wParity")
  }

  test("dataset card: per-source facts reconcile with direct recomputation") {
    val cards = operators.Curation.qDatasetCard(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    CacheTracker.releaseAll()
    val docs = Tables.documents(spark, sf)
    assert(cards.values.map(_.getAs[Long]("n_docs")).sum == docs.count())
    cards.values.foreach { r =>
      assert(r.getAs[Double]("dup_rate") >= 0 && r.getAs[Double]("dup_rate") < 1, r.toString)
      assert(r.getAs[Double]("quality_rate") >= 0 && r.getAs[Double]("quality_rate") <= 1)
      assert(r.getAs[Double]("lang_entropy") >= 0 &&
        r.getAs[Double]("lang_entropy") <= math.log(r.getAs[Long]("n_langs").toDouble) + 1e-6)
    }
    // spot-recompute one source's token total directly
    val src = cards.keys.head
    val direct = docs.filter(col("source") === src)
      .select(size(split(col("text"), " ")).cast("long").as("w")).agg(sum("w")).head.getLong(0)
    assert(cards(src).getAs[Long]("n_tokens") == direct)
  }

  test("split leakage: cells partition the near-dup pairs and flags mark the off-diagonal") {
    val rows = operators.Curation.qSplitLeakage(spark, sf).collect()
    CacheTracker.releaseAll()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_leak") ==
        (r.getAs[String]("split_a") != r.getAs[String]("split_b")), r.toString)
      assert(r.getAs[String]("split_a") <= r.getAs[String]("split_b"), "cells must normalize")
    }
    assert(math.abs(rows.map(_.getAs[Double]("pair_share")).sum - 1.0) < 1e-4)
    // the cells must partition the document near-dup pair set exactly
    val sigs = Dedup.withSignature(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .filter(size(col("hashes")) >= 1)
      .select(col("doc_id"), col("sig"), array_distinct(col("shingles")).as("sset"))
    val nPairs = Dedup.bandedCandidates(sigs)
      .join(sigs.select(col("doc_id").as("a_id"), col("sset").as("sa")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sset").as("sb")), "b_id")
      .withColumn("n_inter", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("n_inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("n_inter")) >= 0.5)
      .count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nPairs)
  }

  test("incremental CC: star edges plus the new-edge delta equal the full-graph clustering") {
    val inc = Dedup.qDedupCcIncremental(spark, sf)
      .select("doc_id", "cluster_id", "cluster_size").cache()
    val full = Dedup.qDedupClusters(spark, sf)
      .select("doc_id", "cluster_id", "cluster_size").cache()
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0)
    // the delta path must be live: new arrivals actually join old clusters
    assert(inc.filter(col("doc_id") >= 2000000L && col("cluster_id") < 2000000L).count() > 0)
    inc.unpersist(); full.unpersist(); CacheTracker.releaseAll()
  }

  test("video dedup: exact re-uploads score 1.0; single-frame re-encodes score (n-1)/n") {
    val rows = operators.Multimodal.qVideoDedup(spark, sf).collect()
    CacheTracker.releaseAll()
    val exact = rows.filter(r =>
      r.getLong(0) < 1000000L && r.getLong(1) == r.getLong(0) + 1000000L)
    assert(exact.nonEmpty, "injected exact re-uploads must be detected")
    assert(exact.forall(_.getAs[Double]("frame_sim") == 1.0),
      "a byte-exact re-upload matches every aligned frame")
    val reenc = rows.filter(r =>
      r.getLong(0) < 1000000L && r.getLong(1) == r.getLong(0) + 2000000L)
    assert(reenc.nonEmpty, "injected single-byte re-encodes must be detected")
    assert(reenc.forall(r =>
      r.getAs[Long]("n_match") == r.getAs[Int]("n_frames_a") - 1L &&
      r.getAs[Int]("n_frames_a") >= 3),
      "a re-encode differs in exactly the perturbed frame and passes only with >= 3 frames")
  }

  test("dedup explain: every indexed pair traces to >= 1 band collision; estimate error bounded") {
    val rows = Dedup.qDedupExplain(spark, sf).collect()
    CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    // provenance invariant: a pair can only enter the index through a
    // full-band signature collision
    assert(rows.forall(_.getAs[Int]("n_band_hits") >= 1),
      "indexed pair with zero band collisions — candidate provenance broken")
    // the 16-slot estimator is coarse (granularity 1/16) but must stay
    // within the binomial envelope around the exact jaccard
    assert(rows.forall(r => math.abs(r.getAs[Double]("est_error")) <= 0.5))
  }

  test("builder persists are fully released by CacheTracker (no leaked blocks)") {
    // the three cache-carrying queries in one shared session, harness-style
    CacheTracker.releaseAll() // clean slate (other suites share the session)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Seq(Dedup.qDedupLshPairs(spark, sf),
        operators.Curation.qCurationPipeline(spark, sf),
        Similarity.qSimIvf(spark, sf)).foreach { df =>
      df.write.format("noop").mode("overwrite").save()
      CacheTracker.releaseAll()
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }
}
