package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * frame-sample run as batch functions over the binary column.
  *
  * The IMAGE modality decodes for real via in-JVM `javax.imageio`
  * ([[decodeImages]] / `q43_image_decode`). Audio/video codec libraries are
  * not in this container, so their decode step is STUBBED with a
  * deterministic fake (clearly marked below). The Spark-side plumbing —
  * schema, binary handling, partitioning, batch shape — is real and
  * oracle-tested: stub payload bytes come from the documents' text
  * (deterministic), so both engines see identical binaries.
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

  /** ??? STUB (audio/video only — images decode for real in
    * [[decodeImages]]) — the full deployment decodes FLAC/H.264 via a
    * codec-equipped worker. Here the "decoded features" are deterministic
    * functions of the raw bytes so the plumbing is verifiable: byte
    * length, a content digest, and a fake width/height derived from the
    * payload.
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

  /** REAL image decode, no stub: the image modality runs through
    * `javax.imageio` (in the JVM, zero external codec deps). Payloads are
    * genuine JPEGs synthesized deterministically per doc_id (solid-color
    * `BufferedImage` → JPEG bytes), then decoded back to width / height /
    * mean 8-bit luma. Audio/video remain behind the [[decodeStub]] until a
    * codec library exists in the deployment image.
    *
    * Scale shape: encode and decode are both narrow `mapPartitions` over
    * the binary column — no shuffle, no driver involvement; identical to
    * how a Pandas-UDF decode fans out on a cluster.
    */
  def jpegTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id")
      .repartition(spark.sparkContext.defaultParallelism) // single-file input
      .as[Long]
      .mapPartitions(_.map { id =>
        (id, Multimodal.syntheticJpeg(id))
      })
      .toDF("doc_id", "content")
  }

  /** ImageIO defaults to a file-backed stream cache — a temp file per
    * encode/decode, which serializes 32 concurrent tasks on tmpdir I/O.
    * In-memory streams only; executed once per executor JVM.
    */
  private lazy val imageIoNoCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic JPEG payload for a doc id (encoder is the JVM's own). */
  def syntheticJpeg(id: Long): Array[Byte] = {
    imageIoNoCache
    val w = 16 + (id % 8).toInt
    val h = 16 + (id % 5).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(
      ((id * 37) % 256).toInt, ((id * 57) % 256).toInt, ((id * 77) % 256).toInt))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Decode a binary column of JPEGs: (doc_id, width, height, mean_luma).
    * Undecodable payloads surface as (-1, -1, -1.0) instead of failing the
    * partition — one bad blob must not kill a 100 TB scan.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        imageIoNoCache
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Throwable => null }
        if (img == null) (id, -1, -1, -1.0)
        else {
          var sum = 0.0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          (id, img.getWidth, img.getHeight, sum / (img.getWidth * img.getHeight))
        }
      })
      .toDF("doc_id", "width", "height", "mean_luma")
  }

  /** Driver rows-only check (JPEG decode is not SQL-expressible in the
    * oracle); the golden decode values live in `MultimodalSpec`.
    */
  def q43ImageDecode(spark: SparkSession, dir: String): DataFrame =
    decodeImages(spark, jpegTable(spark, dir))
      .select(col("doc_id"), col("width"), col("height"),
        round(col("mean_luma"), 0).as("mean_luma_r"))
      .orderBy(col("doc_id"))

  def q34MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decodeStub(mediaTable(spark, dir))
      .select(col("doc_id"), col("media_type"), col("byte_len"), col("digest"),
        col("fake_width"), col("fake_height"), col("meta.origin").as("origin"))
      .orderBy(col("doc_id"))

  def q35FrameSample(spark: SparkSession, dir: String): DataFrame =
    frameSample(mediaTable(spark, dir)).orderBy(col("doc_id"), col("frame_idx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_multimodal_meta" -> (q34MultimodalMeta _),
    "q35_frame_sample" -> (q35FrameSample _),
    "q43_image_decode" -> (q43ImageDecode _)
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
