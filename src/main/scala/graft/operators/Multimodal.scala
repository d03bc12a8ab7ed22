package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * frame-sample run as batch functions over the binary column.
  *
  * The image/audio codec libraries are not in this container, so the decode
  * step is STUBBED with a deterministic fake (clearly marked below). The
  * Spark-side plumbing — schema, binary handling, partitioning, batch
  * shape — is real and oracle-tested: payload bytes come from the
  * documents' text (deterministic), so both engines see identical binaries.
  *
  * Scale notes: binary payloads stay columnar (parquet binary) end-to-end;
  * per-record work is a narrow map (no shuffle); at 100 TB the only knob is
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory.
  */
object Multimodal {

  /** Synthesize the media table: payload = utf-8 bytes of text, modality
    * round-robined, metadata struct carried alongside.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")))
      .withColumn("content", encode(col("text"), "UTF-8"))
      .withColumn("meta", struct(
        col("source").as("origin"),
        col("n_chars").as("declared_bytes"),
        col("lang").as("tag")))

  /** ??? STUB — real implementation decodes the codec (JPEG/FLAC/H.264)
    * via a Pandas-UDF/mapInPandas worker in the full deployment. Here the
    * "decoded features" are deterministic functions of the raw bytes so the
    * plumbing is verifiable: byte length, a content digest, and a fake
    * width/height derived from the payload.
    */
  def decodeStub(media: DataFrame): DataFrame =
    media
      .withColumn("byte_len", octet_length(col("content")).cast("long"))
      .withColumn("digest", md5(col("content")))
      .withColumn("fake_width", (col("byte_len") % 640 + 1).cast("int"))
      .withColumn("fake_height", (col("byte_len") % 480 + 1).cast("int"))

  /** Frame sampling: every k-th byte-window of the payload surfaced as a
    * hex "frame" — the binary-slicing shape video pipelines need. Real
    * frames would come from the stubbed decoder.
    */
  def frameSample(media: DataFrame, frames: Int = 4, frameBytes: Int = 8): DataFrame =
    media
      .withColumn("hex", hex(col("content")))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame", // substring beyond the payload yields '' → filtered
        substring(col("hex"), col("frame_idx") * (frameBytes * 2) + 1, lit(frameBytes * 2)))
      .filter(length(col("frame")) > 0)
      .select(col("doc_id"), col("media_type"), col("frame_idx").cast("long").as("frame_idx"), col("frame"))

  def q34MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decodeStub(mediaTable(spark, dir))
      .select(col("doc_id"), col("media_type"), col("byte_len"), col("digest"),
        col("fake_width"), col("fake_height"), col("meta.origin").as("origin"))
      .orderBy(col("doc_id"))

  def q35FrameSample(spark: SparkSession, dir: String): DataFrame =
    frameSample(mediaTable(spark, dir)).orderBy(col("doc_id"), col("frame_idx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_multimodal_meta" -> (q34MultimodalMeta _),
    "q35_frame_sample" -> (q35FrameSample _)
  )

  val oracles: Map[String, String] = Map(
    "q34_multimodal_meta" ->
      """SELECT doc_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS digest,
        |  CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS fake_width,
        |  CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS fake_height,
        |  source AS origin
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q35_frame_sample" ->
      """WITH h AS (SELECT doc_id,
        |    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |    hex(encode(text)) AS hx FROM documents),
        |f AS (SELECT doc_id, media_type, unnest([0, 1, 2, 3]) AS frame_idx, hx FROM h)
        |SELECT doc_id, media_type, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  substring(hx, frame_idx * 16 + 1, 16) AS frame
        |FROM f WHERE len(substring(hx, frame_idx * 16 + 1, 16)) > 0
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
