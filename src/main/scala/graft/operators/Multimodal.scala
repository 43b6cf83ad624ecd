package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque `binary` payloads
  * with typed metadata, decoded per-partition in batches.
  *
  * The container has no image/audio libraries, so the decode step is a
  * clearly-marked deterministic STUB (`FakeDecoder`) — but the Spark-side
  * plumbing is real: BinaryType columns, a typed `Dataset.mapPartitions`
  * decode (the Scala analogue of a Pandas-UDF batch loop — one decoder
  * instance per partition, streaming iterator, no per-row setup), and
  * frame sampling via a generator. Swapping `FakeDecoder` for a real
  * codec keeps every signature and the physical plan unchanged.
  *
  * The stub's outputs are pure functions of payload length and doc_id, so
  * the whole pipeline remains oracle-checkable.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Int, format: String,
      width: Int, height: Int, n_frames: Int)

  /** STUB decoder — deterministic fake standing in for libjpeg/ffmpeg.
    * Real implementation would parse the payload header; the formulas
    * below are mirrored in the SQL oracle. */
  object FakeDecoder {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val len = payload.length
      val fmt = (docId % 3) match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "webp"
      }
      MediaMeta(docId, len, fmt,
        width = 16 + (len * 7) % 624,
        height = 16 + (len * 13) % 464,
        n_frames = 1 + math.min(len / 100, 4))
    }
  }

  /** Batch metadata extraction: binary payload column → typed decode via
    * mapPartitions (decoder initialized once per partition, rows stream
    * through — the batch shape a real codec needs). */
  def qMultimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (e.g. native handle)
      rows.map(r => FakeDecoder.decode(r.doc_id, r.payload))
    }.toDF()
  }

  /** Frame sampling for "video" payloads (doc_id % 4 == 0): one row per
    * sampled frame with its offset and content hash — generator
    * (posexplode) over the frame index sequence, map-side only. */
  def qMultimodalFrames(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 4 === 0)
      .withColumn("byte_len", octet_length(col("text")))
      .withColumn("n_frames", lit(1) + least(floor(col("byte_len") / 100), lit(4)).cast("int"))
      .select(col("doc_id"), col("text"), col("n_frames"),
        posexplode(expr("sequence(0, n_frames - 1)")).as(Seq("pos", "frame_idx")))
      .select(
        col("doc_id"),
        col("frame_idx").cast("int").as("frame_idx"),
        (col("frame_idx") * 100).cast("int").as("frame_offset"),
        expr("md5(substring(text, frame_idx * 100 + 1, 100))").as("frame_hash"))

  /** Audio-style payloads (doc_id % 3 == 1): stub-decoded sample-rate /
    * duration metadata plus fixed-stride chunk sampling — the same
    * generator pattern as video frames, over a second modality. */
  def qMultimodalAudio(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 1)
      .withColumn("byte_len", octet_length(col("text")))
      .withColumn("sample_rate", when(col("doc_id") % 2 === 0, 16000).otherwise(44100))
      .withColumn("duration_ms", (col("byte_len") * 4).cast("int"))
      .withColumn("n_chunks", lit(1) + least(floor(col("duration_ms") / 500), lit(7)).cast("int"))
      .select(col("doc_id"), col("sample_rate"), col("duration_ms"), col("text"), col("n_chunks"),
        posexplode(expr("sequence(0, n_chunks - 1)")).as(Seq("p", "chunk_idx")))
      .select(
        col("doc_id"), col("sample_rate"), col("duration_ms"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        (col("chunk_idx") * 500).cast("int").as("chunk_start_ms"),
        expr("md5(substring(text, chunk_idx * 50 + 1, 50))").as("chunk_hash"))

  /** ViT-style preprocessing plan for "image" payloads (doc_id % 3 == 0,
    * the stub decoder's png branch): aspect-preserving resize into a
    * 224×224 canvas (integer ppm scale factor, centered letterbox
    * padding — the plan a real `torchvision.Resize+CenterCrop` executes)
    * followed by the 16×16 patch-grid explode, one row per patch with a
    * content-derived hash standing in for patch pixels. This is the
    * fan-out stage that feeds a vision-encoder batch; swapping the stub
    * hash for a real pixel slice keeps the schema, partitioning, and
    * ~196× generator fan-out identical.
    *
    * Scale shape: map-side only — metadata arithmetic plus one
    * generator explode per image; no shuffle at any scale (the
    * downstream encoder repartitions by its own batch size). */
  def qMultimodalPatches(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0)
      .withColumn("byte_len", octet_length(col("text")))
      .withColumn("width", (lit(16) + (col("byte_len") * 7) % 624).cast("int"))
      .withColumn("height", (lit(16) + (col("byte_len") * 13) % 464).cast("int"))
      .withColumn("scale_ppm", least(
        expr("CAST(224 * 1000000 div width AS BIGINT)"),
        expr("CAST(224 * 1000000 div height AS BIGINT)")))
      .withColumn("rs_w", expr("CAST(width * scale_ppm div 1000000 AS INT)"))
      .withColumn("rs_h", expr("CAST(height * scale_ppm div 1000000 AS INT)"))
      .withColumn("pad_x", expr("CAST((224 - rs_w) div 2 AS INT)"))
      .withColumn("pad_y", expr("CAST((224 - rs_h) div 2 AS INT)"))
      // at least one patch per axis: extreme aspect ratios can letterbox
      // a side below 16px, and a real preprocessor still emits the
      // padded patch (also keeps the generator's sequence() ascending)
      .withColumn("gx", expr("greatest(CAST(rs_w div 16 AS INT), 1)"))
      .withColumn("gy", expr("greatest(CAST(rs_h div 16 AS INT), 1)"))
      .select(col("doc_id"), col("width"), col("height"), col("scale_ppm"),
        col("rs_w"), col("rs_h"), col("pad_x"), col("pad_y"), col("text"),
        explode(expr(
          """flatten(transform(sequence(0, gy - 1), py ->
            |  transform(sequence(0, gx - 1), px ->
            |    struct(px AS px, py AS py, py * gx + px AS pidx))))""".stripMargin)).as("t"))
      .select(col("doc_id"), col("width"), col("height"), col("scale_ppm"),
        col("rs_w"), col("rs_h"), col("pad_x"), col("pad_y"),
        col("t.px"), col("t.py"),
        expr("md5(substring(text, t.pidx * 29 + 1, 29))").as("patch_hash"))

  /** Aspect-ratio bucketing for image-batch packing (the SDXL/NovelAI
    * bucketing scheme from the public diffusion-training literature):
    * each image is assigned to the bucket whose aspect ratio is nearest
    * its own, then resized (aspect-preserving, integer ppm scale) to fit
    * the bucket canvas; batches are formed within a bucket so padding is
    * minimal. Reports per-bucket volume and padding waste — the numbers
    * a batching planner reads to choose bucket boundaries.
    *
    * All-integer arithmetic: ratios in parts-per-million, nearest bucket
    * by |ratio_ppm − bucket_ppm| with the lower bucket index winning
    * ties — no float anywhere until the final rounded waste fraction.
    *
    * Scale shape: the bucket table is a 7-row literal joined as a
    * broadcast cross-join; assignment is map-side arithmetic + a window
    * argmin per image over 7 candidates; the only shuffle is the final
    * per-bucket aggregate (7 groups, map-side combined). */
  def qAspectBuckets(s: SparkSession, d: String): DataFrame = {
    // (bucket_id, bw, bh) — canvas sizes with ~equal pixel budget
    val buckets = Seq((0, 128, 512), (1, 160, 384), (2, 192, 320), (3, 256, 256),
      (4, 320, 192), (5, 384, 160), (6, 512, 128))
    val bdf = s.createDataFrame(buckets).toDF("bucket_id", "bw", "bh")
    val imgs = Tables.documents(s, d)
      .filter(col("doc_id") % 3 === 0)
      .withColumn("byte_len", octet_length(col("text")))
      .withColumn("width", (lit(16) + (col("byte_len") * 7) % 624).cast("int"))
      .withColumn("height", (lit(16) + (col("byte_len") * 13) % 464).cast("int"))
      .withColumn("ratio_ppm", expr("CAST(width AS BIGINT) * 1000000 div height"))
      .select("doc_id", "width", "height", "ratio_ppm")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(abs(col("ratio_ppm") - col("bucket_ppm")), col("bucket_id"))
    imgs.crossJoin(broadcast(bdf
        .withColumn("bucket_ppm", expr("CAST(bw AS BIGINT) * 1000000 div bh"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .withColumn("scale_ppm", least(
        expr("CAST(bw AS BIGINT) * 1000000 div width"),
        expr("CAST(bh AS BIGINT) * 1000000 div height")))
      .withColumn("rs_w", expr("CAST(width * scale_ppm div 1000000 AS INT)"))
      .withColumn("rs_h", expr("CAST(height * scale_ppm div 1000000 AS INT)"))
      .groupBy("bucket_id", "bw", "bh")
      .agg(count(lit(1)).as("n_images"),
        sum(expr("CAST(bw AS BIGINT) * bh - CAST(rs_w AS BIGINT) * rs_h")).cast("long")
          .as("pad_px"),
        sum(expr("CAST(bw AS BIGINT) * bh")).cast("long").as("canvas_px"))
      .select(col("bucket_id"), col("bw"), col("bh"), col("n_images"), col("pad_px"),
        round(col("pad_px").cast("double") / col("canvas_px"), 6).as("pad_frac"))
  }

  /** Perceptual-hash near-duplicate detection over media payloads — the
    * image-dedup step (pHash/dHash family) a multimodal curation
    * pipeline runs where text dedup runs MinHash: the payload is
    * "resized" onto a fixed 64-cell grid (cell w = the
    * length-proportional byte window [w·L/64, (w+1)·L/64) — the
    * stand-in for "mean luminance of grid cell w" while the container
    * has no image codec; a real decoded-pixel dHash keeps everything
    * downstream unchanged), each cell contributes one parity bit, and
    * the 64-bit fingerprints go through the exact banded Hamming join
    * of q_dedup_simhash_pairs: 4 × 16-bit bands, pigeonhole-exact
    * recall at hamming ≤ 3. The resize is what keeps every band
    * content-bearing for any payload size — FIXED windows would leave
    * trailing cells empty on short payloads, collapsing one band into
    * a corpus-wide bucket (the quadratic failure this design rejects).
    * The injected near-dup path is an IN-PLACE single-byte perturbation
    * (doc_id % 7, +2000000): same length ⇒ same grid ⇒ only the cell
    * covering the touched byte can flip — the local-pixel-edit case
    * perceptual hashing exists to catch; byte-exact copies (doc_id % 5,
    * +1000000) collide in every band.
    *
    * Scale shape: fingerprinting is one map-side pass (64 windowed
    * hashes per payload); candidates come from the 4-band equi-join
    * (never all-pairs); the verify is 4 xor+popcounts per pair. */
  def qMultimodalPhash(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val media = docs
      .unionByName(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(substring(col("text"), 1, 10), lit("#"),
            expr("substring(text, 12, 1000000)")).as("text")))
    def bandExpr(b: Int): String = (1 to 16).map { i =>
      val j = 16 * b + i
      val pos = s"((${j - 1} * length(text)) div 64) + 1"
      val width = "(length(text) + 63) div 64"
      s"(CASE WHEN CAST(conv(substring(md5(substring(text, $pos, $width)), 1, 1), 16, 10) AS INT) % 2 = 1 THEN CAST(${1L << (16 - i)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    val sigs = graft.CacheTracker.track(
      media
        .select(col("doc_id") +: (0 to 3).map(b => expr(bandExpr(b)).as(s"b$b")): _*)
        .persist(StorageLevel.MEMORY_AND_DISK))
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 to 3).map(b => col(s"b$b")): _*)).as(Seq("band", "bits")))
    val cand = banded.select(col("doc_id").as("a_id"), col("band"), col("bits"))
      .join(banded.select(col("doc_id").as("b_id"), col("band"), col("bits")), Seq("band", "bits"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val sa = sigs.select(col("doc_id").as("a_id") +: (0 to 3).map(b => col(s"b$b").as(s"a$b")): _*)
    val sb = sigs.select(col("doc_id").as("b_id") +: (0 to 3).map(b => col(s"b$b").as(s"bb$b")): _*)
    cand.join(sa, "a_id").join(sb, "b_id")
      .withColumn("hamming",
        (0 to 3).map(b => bit_count(col(s"a$b").bitwiseXOR(col(s"bb$b")))).reduce(_ + _).cast("int"))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_phash" -> (qMultimodalPhash _),
    "q_aspect_buckets" -> (qAspectBuckets _),
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_patches" -> (qMultimodalPatches _),
    "q_multimodal_audio" -> (qMultimodalAudio _))

  val oracle: Map[String, String] = Map(
    "q_multimodal_phash" -> {
      def bandSql(b: Int): String = (1 to 16).map { i =>
        val j = 16 * b + i
        val pos = s"((${j - 1} * length(text)) // 64) + 1"
        val width = "(length(text) + 63) // 64"
        s"(CASE WHEN CAST('0x' || substring(md5(substring(text, $pos, $width)), 1, 1) AS BIGINT) % 2 = 1 THEN ${1L << (16 - i)} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH media AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL SELECT doc_id + 2000000,
         |    substring(text, 1, 10) || '#' || substring(text, 12, 1000000)
         |  FROM documents WHERE doc_id % 7 = 0),
         |fp AS (SELECT doc_id, ${bandSql(0)} AS b0, ${bandSql(1)} AS b1,
         |    ${bandSql(2)} AS b2, ${bandSql(3)} AS b3 FROM media),
         |bands AS (SELECT doc_id, b,
         |    CASE b WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS bits
         |  FROM fp, unnest(range(0, 4)) AS t(b)),
         |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM bands x JOIN bands y
         |    ON x.b = y.b AND x.bits = y.bits AND x.doc_id < y.doc_id),
         |h AS (SELECT a_id, b_id,
         |    CAST(bit_count(xor(fa.b0, fb.b0)) + bit_count(xor(fa.b1, fb.b1))
         |      + bit_count(xor(fa.b2, fb.b2)) + bit_count(xor(fa.b3, fb.b3)) AS INTEGER) AS hamming
         |  FROM cand JOIN fp fa ON fa.doc_id = cand.a_id JOIN fp fb ON fb.doc_id = cand.b_id)
         |SELECT a_id, b_id, hamming FROM h WHERE hamming <= 3""".stripMargin
    },
    "q_aspect_buckets" ->
      """WITH img AS (
        |  SELECT doc_id, octet_length(encode(text)) AS byte_len FROM documents
        |  WHERE doc_id % 3 = 0),
        |wh AS (
        |  SELECT doc_id,
        |    CAST(16 + (byte_len * 7) % 624 AS INTEGER) AS width,
        |    CAST(16 + (byte_len * 13) % 464 AS INTEGER) AS height
        |  FROM img),
        |r AS (SELECT *, CAST(width AS BIGINT) * 1000000 // height AS ratio_ppm FROM wh),
        |bk AS (SELECT * FROM (VALUES (0, 128, 512), (1, 160, 384), (2, 192, 320),
        |    (3, 256, 256), (4, 320, 192), (5, 384, 160), (6, 512, 128))
        |  AS t(bucket_id, bw, bh)),
        |cand AS (
        |  SELECT r.*, bk.bucket_id, bk.bw, bk.bh,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY abs(ratio_ppm - CAST(bw AS BIGINT) * 1000000 // bh), bucket_id) AS rn
        |  FROM r CROSS JOIN bk),
        |asn AS (
        |  SELECT *, LEAST(CAST(bw AS BIGINT) * 1000000 // width,
        |                  CAST(bh AS BIGINT) * 1000000 // height) AS scale_ppm
        |  FROM cand WHERE rn = 1),
        |rs AS (
        |  SELECT *, CAST(width * scale_ppm // 1000000 AS INTEGER) AS rs_w,
        |    CAST(height * scale_ppm // 1000000 AS INTEGER) AS rs_h
        |  FROM asn)
        |SELECT bucket_id, bw, bh, COUNT(*) AS n_images,
        |  CAST(SUM(CAST(bw AS BIGINT) * bh - CAST(rs_w AS BIGINT) * rs_h) AS BIGINT) AS pad_px,
        |  round(CAST(SUM(CAST(bw AS BIGINT) * bh - CAST(rs_w AS BIGINT) * rs_h) AS DOUBLE)
        |    / SUM(CAST(bw AS BIGINT) * bh), 6) AS pad_frac
        |FROM rs GROUP BY 1, 2, 3""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpeg'
        |       ELSE 'webp' END AS format,
        |  CAST(16 + (octet_length(encode(text)) * 7) % 624 AS INTEGER) AS width,
        |  CAST(16 + (octet_length(encode(text)) * 13) % 464 AS INTEGER) AS height,
        |  CAST(1 + least(octet_length(encode(text)) // 100, 4) AS INTEGER) AS n_frames
        |FROM documents""".stripMargin,
    "q_multimodal_patches" ->
      """WITH m AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS byte_len
        |  FROM documents WHERE doc_id % 3 = 0),
        |g AS (
        |  SELECT doc_id, text,
        |    CAST(16 + (byte_len * 7) % 624 AS INTEGER) AS width,
        |    CAST(16 + (byte_len * 13) % 464 AS INTEGER) AS height
        |  FROM m),
        |sc AS (
        |  SELECT *, CAST(LEAST(224 * 1000000 // width, 224 * 1000000 // height) AS BIGINT) AS scale_ppm
        |  FROM g),
        |rs AS (
        |  SELECT *, CAST(width * scale_ppm // 1000000 AS INTEGER) AS rs_w,
        |    CAST(height * scale_ppm // 1000000 AS INTEGER) AS rs_h
        |  FROM sc),
        |grid AS (
        |  SELECT *, CAST((224 - rs_w) // 2 AS INTEGER) AS pad_x,
        |    CAST((224 - rs_h) // 2 AS INTEGER) AS pad_y,
        |    GREATEST(rs_w // 16, 1) AS gx, GREATEST(rs_h // 16, 1) AS gy
        |  FROM rs)
        |SELECT doc_id, width, height, scale_ppm, rs_w, rs_h, pad_x, pad_y,
        |  CAST(px AS INTEGER) AS px, CAST(py AS INTEGER) AS py,
        |  md5(substring(text, CAST((py * gx + px) * 29 + 1 AS INTEGER), 29)) AS patch_hash
        |FROM grid, unnest(range(0, gy)) AS ty(py), unnest(range(0, gx)) AS tx(px)""".stripMargin,
    "q_multimodal_audio" ->
      """WITH a AS (
        |  SELECT doc_id, text,
        |    CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 44100 END AS sample_rate,
        |    CAST(octet_length(encode(text)) * 4 AS INTEGER) AS duration_ms
        |  FROM documents WHERE doc_id % 3 = 1),
        |c AS (SELECT a.*, 1 + least(duration_ms // 500, 7) AS n_chunks FROM a)
        |SELECT doc_id, sample_rate, duration_ms,
        |  CAST(i AS INTEGER) AS chunk_idx, CAST(i * 500 AS INTEGER) AS chunk_start_ms,
        |  md5(substring(text, CAST(i * 50 + 1 AS INTEGER), 50)) AS chunk_hash
        |FROM c, unnest(range(0, n_chunks)) AS t(i)""".stripMargin,
    "q_multimodal_frames" ->
      """WITH v AS (
        |  SELECT doc_id, text,
        |    1 + least(octet_length(encode(text)) // 100, 4) AS n_frames
        |  FROM documents WHERE doc_id % 4 = 0)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx, CAST(i * 100 AS INTEGER) AS frame_offset,
        |  md5(substring(text, CAST(i * 100 + 1 AS INTEGER), 100)) AS frame_hash
        |FROM v, unnest(range(0, n_frames)) AS t(i)""".stripMargin)
}
