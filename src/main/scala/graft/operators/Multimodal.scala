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

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_aspect_buckets" -> (qAspectBuckets _),
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_patches" -> (qMultimodalPatches _),
    "q_multimodal_audio" -> (qMultimodalAudio _))

  val oracle: Map[String, String] = Map(
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
