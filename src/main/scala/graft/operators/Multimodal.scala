package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * frame-sample run as batch functions over the binary column.
  *
  * ALL THREE modalities decode for real in the JVM, zero external codec
  * deps: IMAGE via `javax.imageio` ([[decodeImages]] / `q43_image_decode`),
  * AUDIO via `javax.sound.sampled` WAV/PCM ([[decodeWavScalar]] /
  * `q47_audio_decode`), and VIDEO via a RIFF/AVI container parser over
  * MJPEG streams ([[decodeAviScalar]] / `q71_video_decode`) — frame
  * payloads are genuine JPEGs, so the per-frame pixel decode is the same
  * `javax.imageio` path as the image modality. An H.264 deployment swaps
  * [[decodeAviScalar]]'s frame step for a codec-equipped worker; the
  * container walk, batch shape, and Spark-side plumbing are identical.
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

  /** Metadata-only pass for [[q34MultimodalMeta]]: byte length, content
    * digest, and payload-derived placeholder dimensions — the cheap
    * manifest row a pipeline records per blob BEFORE any real decode runs
    * (the real decodes are [[decodeImages]], [[decodeWavScalar]], and
    * [[decodeAviScalar]]).
    */
  def decodeStub(media: DataFrame): DataFrame =
    media
      .withColumn("byte_len", octet_length(col("content")).cast("long"))
      .withColumn("digest", md5(col("content")))
      .withColumn("fake_width", (col("byte_len") % 640 + 1).cast("int"))
      .withColumn("fake_height", (col("byte_len") % 480 + 1).cast("int"))

  /** Frame sampling: every k-th byte-window of the payload surfaced as a
    * hex "frame" — the binary-slicing shape video pipelines need. Real
    * frames come from [[decodeAviScalar]]'s container walk (q71).
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
    * mean 8-bit luma. Audio decodes via the JDK sound stack (q47), video
    * via the RIFF/AVI walk (q71).
    *
    * Scale shape: encode and decode are both narrow `mapPartitions` over
    * the binary column — no shuffle, no driver involvement; identical to
    * how a Pandas-UDF decode fans out on a cluster.
    */
  /** The media_* artifacts' content depends on the SYNTHESIZER code
    * (syntheticJpeg / syntheticWav / syntheticMjpegAvi), not only on the
    * fingerprinted documents.parquet input — ArtifactStore can't see code.
    * Bump THIS constant with any encoder change, or the store serves
    * stale blobs to the live-decode queries (ADVICE r13). It feeds the
    * version slot of all three cached() calls below.
    */
  private val MediaEncoderRev = 1

  def jpegTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // persisted media store, same rationale as [[aviTable]]
    Tables.spread(graft.ArtifactStore.cached(spark, "media_jpeg", MediaEncoderRev,
      Seq(s"$dir/documents.parquet")) {
      Tables.spread(Tables.documents(spark, dir)
          .select($"doc_id")) // parallelism restore, gated on split count
        .as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticJpeg(id))
        })
        .toDF("doc_id", "content")
    })
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

  /** Scalar JPEG decode: (width, height, mean 8-bit luma), or
    * (-1, -1, -1.0) for an undecodable payload. Shared by the distributed
    * decode and the oracle golden-value generator.
    */
  def decodeJpegScalar(bytes: Array[Byte]): (Int, Int, Double) = {
    imageIoNoCache
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Throwable => null }
    if (img == null) (-1, -1, -1.0)
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
      (img.getWidth, img.getHeight, sum / (img.getWidth * img.getHeight))
    }
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
        val (w, h, luma) = decodeJpegScalar(bytes)
        (id, w, h, luma)
      })
      .toDF("doc_id", "width", "height", "mean_luma")
  }

  /** Oracled since round 4: the decode state (w, h, rgb) is periodic in
    * doc_id with period lcm(8, 5, 256) = 1280, so the DuckDB oracle joins
    * documents against a 1280-row golden VALUES table on `doc_id % 1280`
    * (works at every SF). Independent anchoring lives in `MultimodalSpec`
    * (geometry exact, luma within JPEG quantization error of the encoded
    * color).
    */
  def q43ImageDecode(spark: SparkSession, dir: String): DataFrame =
    decodeImages(spark, jpegTable(spark, dir))
      .select(col("doc_id"), col("width"), col("height"),
        round(col("mean_luma"), 0).as("mean_luma_r"))
      .transform(Relational.presentRanged(_, col("doc_id")))

  // ---- audio modality (REAL decode via javax.sound.sampled — WAV/PCM) ----

  /** The JDK WAV codec providers, resolved ONCE per JVM: every
    * `AudioSystem.write` / `getAudioInputStream` call goes through a
    * SYNCHRONIZED provider-registry lookup (`JDK13Services.getProviders`),
    * which serializes 32 concurrent decode tasks on one lock — measured
    * NEGATIVE scaling (q47 slower at 32 threads than at 4). Calling the
    * `javax.sound.sampled.spi` providers directly keeps the identical
    * codec with zero shared state per record.
    */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAVE writer provider"))
  }

  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val all = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader]).iterator().asScala.toList
    // probe-order: the reader that actually parses a WAV goes FIRST. The
    // JDK list also contains SoftMidiAudioFileReader, whose REJECTION path
    // runs a synchronized MidiSystem registry lookup per call — with it
    // ahead of the WAV reader, 32 decode threads serialize on that lock
    // (measured slower than single-threaded)
    val probe = syntheticWav(0L)
    val (hit, miss) = all.partition { r =>
      try { r.getAudioFileFormat(new java.io.ByteArrayInputStream(probe)); true }
      catch { case _: Throwable => false }
    }
    hit ++ miss
  }

  /** Deterministic WAV payload per doc id: 16-bit little-endian mono PCM,
    * a pure sine whose rate / length / frequency / amplitude all derive
    * from the id (StrictMath, so samples are bit-identical on every JVM);
    * framed by the JDK's own WAV writer. The audio sibling of
    * [[syntheticJpeg]].
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val sr = 8000 + (id % 4).toInt * 4000
    val n = 400 + (id % 7).toInt * 100
    val f = 200.0 + (id % 11).toInt * 50.0
    val amp = 8000.0 + (id % 5).toInt * 1000.0
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = math.round(amp * StrictMath.sin(2 * math.Pi * f * i / sr)).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Scalar WAV decode through the JDK sound stack: container is parsed by
    * `AudioSystem` (format + frame count), samples stream out as PCM, and
    * the features are (sample_rate, channels, n_frames, rms) with rms the
    * root-mean-square of the raw 16-bit samples rounded to 3dp (Spark
    * `round` semantics: BigDecimal HALF_UP). Sum of squared 16-bit samples
    * stays exact in double far beyond any realistic clip length (2^53 ≈
    * 8e15 vs 2^30 per sample-square), so the value is engine-independent.
    * Undecodable payloads degrade to (-1, -1, -1, -1.0).
    */
  def decodeWavScalar(bytes: Array[Byte]): (Int, Int, Long, Double) =
    try {
      // the same first-provider-that-parses loop AudioSystem runs, minus
      // its synchronized registry lookup per call
      val ais = audioReaders.iterator.flatMap { r =>
        try Some(r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
      }.nextOption().getOrElse(
        throw new javax.sound.sampled.UnsupportedAudioFileException("no provider"))
      val fmt = ais.getFormat
      // the RMS loop below reconstructs 16-bit little-endian signed PCM;
      // any other parsed format (8-bit, float, big-endian, unsigned) would
      // make rms deterministic-but-meaningless, so degrade to the sentinel
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return (-1, -1, -1L, -1.0)
      val nFrames = ais.getFrameLength
      val data = ais.readAllBytes()
      val n = data.length / 2
      var sumSq = 0.0
      var i = 0
      while (i < n) {
        val s = ((data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)).toShort.toDouble
        sumSq += s * s
        i += 1
      }
      val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
      (fmt.getSampleRate.toInt, fmt.getChannels, nFrames,
        java.math.BigDecimal.valueOf(rms)
          .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue())
    } catch { case _: Throwable => (-1, -1, -1L, -1.0) }

  /** The WAV table: one synthesized payload per document, encoded in
    * executors (narrow mapPartitions — the same fan-out shape as
    * [[jpegTable]]).
    */
  def wavTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // persisted media store, same rationale as [[aviTable]]
    Tables.spread(graft.ArtifactStore.cached(spark, "media_wav", MediaEncoderRev,
      Seq(s"$dir/documents.parquet")) {
      Tables.spread(Tables.documents(spark, dir)
          .select(col("doc_id"))) // parallelism restore, gated on split count
        .as[Long]
        .mapPartitions(_.map(id => (id, syntheticWav(id))))
        .toDF("doc_id", "content")
    })
  }

  /** q47 — REAL audio decode, no stub: every document's WAV payload parsed
    * and feature-extracted via `javax.sound.sampled` in a narrow map; the
    * decode state is periodic in doc_id with period lcm(4, 7, 11, 5) =
    * 1540, so the oracle joins a 1540-row golden VALUES table on
    * `doc_id % 1540`. Video decodes for real too — see [[q71VideoDecode]].
    */
  def q47AudioDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    wavTable(spark, dir)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (sr, ch, nf, rms) = decodeWavScalar(bytes)
        (id, sr, ch, nf, rms)
      })
      .toDF("doc_id", "sample_rate", "channels", "n_frames", "rms_r")
      .transform(Relational.presentRanged(_, col("doc_id")))
  }

  // ---- video modality (REAL container decode: RIFF/AVI over MJPEG) ----

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** One MJPEG frame: a solid-color JPEG whose color derives from
    * (id, frame index) — the video sibling of [[syntheticJpeg]].
    */
  private def jpegFrame(id: Long, k: Int, w: Int, h: Int): Array[Byte] = {
    imageIoNoCache
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(
      ((id * 37 + k * 11) % 256).toInt,
      ((id * 57 + k * 13) % 256).toInt,
      ((id * 77 + k * 17) % 256).toInt))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Deterministic MJPEG-in-AVI payload per doc id: a REAL RIFF/AVI
    * container (hdrl with avih + one 'vids'/'MJPG' stream, movi with one
    * '00dc' chunk per JPEG frame) that any AVI demuxer can open. Frame
    * count, frame rate, geometry, and per-frame colors all derive from the
    * id; every field is periodic in id with period lcm(8,5,5,3,256) =
    * 3840, which the golden-VALUES oracle exploits.
    */
  def syntheticMjpegAvi(id: Long): Array[Byte] = {
    val nf = 2 + (id % 5).toInt
    val fps = 10 + (id % 3).toInt * 5
    val w = 16 + (id % 8).toInt
    val h = 16 + (id % 5).toInt
    val frames = (0 until nf).map(k => jpegFrame(id, k, w, h))
    val maxFrame = frames.map(_.length).max
    def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(id4) ++ le32(body.length) ++ body ++ pad
    }
    def list(type4: String, body: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(body.length + 4) ++ fcc(type4) ++ body
    val avih = chunk("avih",
      le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(nf) ++ le32(0) ++ le32(1) ++ le32(maxFrame) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(nf) ++
        le32(maxFrame) ++ le32(-1) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        fcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi
    fcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Scalar AVI/MJPEG decode — a real RIFF walk, no codec libs: verify the
    * RIFF/'AVI ' magic, read fps (rate/scale) from the 'strh' stream
    * header, collect the 'NNdc' frame chunks from the 'movi' list, pixel-
    * decode the FIRST frame through `javax.imageio` for geometry + mean
    * luma (same path as [[decodeJpegScalar]]), and digest every frame
    * payload (md5 over their concatenation). Returns (n_frames, fps,
    * width, height, first_luma, frames_digest); any malformed payload
    * degrades to the (-1, -1, -1, -1, -1.0, "") sentinel instead of
    * failing the partition.
    */
  def decodeAviScalar(bytes: Array[Byte]): (Int, Int, Int, Int, Double, String) = {
    val bad = (-1, -1, -1, -1, -1.0, "")
    def u32(p: Int): Int =
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
        ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
    def tag(p: Int): String = new String(bytes, p, 4, "US-ASCII")
    try {
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ") return bad
      var fps = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (off, len)
      def walk(from: Int, until: Int): Unit = {
        var p = from
        while (p + 8 <= until) {
          val id = tag(p); val sz = u32(p + 4)
          if (id == "LIST") walk(p + 12, p + 8 + sz)
          else if (id == "strh" && tag(p + 8) == "vids") {
            val scale = u32(p + 8 + 20); val rate = u32(p + 8 + 24)
            if (scale > 0) fps = rate / scale
          } else if (id.endsWith("dc")) frames += ((p + 8, sz))
          p += 8 + sz + (sz % 2) // chunks are even-aligned
        }
      }
      walk(12, 8 + u32(4))
      if (frames.isEmpty) return bad
      val md = java.security.MessageDigest.getInstance("MD5")
      frames.foreach { case (off, len) => md.update(bytes, off, len) }
      val digest = md.digest().map("%02x".format(_)).mkString
      val first = java.util.Arrays.copyOfRange(bytes, frames.head._1,
        frames.head._1 + frames.head._2)
      val (w, h, luma) = decodeJpegScalar(first)
      (frames.length, fps, w, h, luma, digest)
    } catch { case _: Throwable => bad }
  }

  /** The AVI table: one synthesized MJPEG container per document, encoded
    * in executors (narrow mapPartitions — the [[jpegTable]] fan-out
    * shape), persisted once per dataset state as a binary-column media
    * store. A deployment's videos live in a table/object store already;
    * re-running the JPEG ENCODER per query (~3 frames/doc, the most
    * expensive step of the whole pipeline and pure harness scaffolding)
    * measured corpus synthesis, not the decode operator under test.
    * The decode stays fully live, per document, on every run. The read
    * re-spreads (gated): the blobs pack into few 128 MB scan splits,
    * and decode is CPU-bound — fan-out matters more than the one narrow
    * exchange of the binary column.
    */
  def aviTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.spread(graft.ArtifactStore.cached(spark, "media_avi", MediaEncoderRev,
      Seq(s"$dir/documents.parquet")) {
      Tables.spread(Tables.documents(spark, dir)
          .select(col("doc_id"))) // parallelism restore, gated on split count
        .as[Long]
        .mapPartitions(_.map(id => (id, syntheticMjpegAvi(id))))
        .toDF("doc_id", "content")
    })
  }

  /** q71 — REAL video decode, no stub: every document's AVI payload
    * demuxed by the RIFF walk and its first frame pixel-decoded, in one
    * narrow map. Decode state is periodic in doc_id with period 3840, so
    * the oracle joins a golden VALUES table on `doc_id % 3840` — the q43/
    * q47 construction.
    */
  def q71VideoDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    aviTable(spark, dir)
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (nf, fps, w, h, luma, digest) = decodeAviScalar(bytes)
        val lumaR = if (luma < 0) -1.0
          else java.math.BigDecimal.valueOf(luma)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        (id, nf, fps, w, h, lumaR, digest)
      })
      .toDF("doc_id", "n_frames", "fps", "width", "height", "first_luma_r", "frames_digest")
      .transform(Relational.presentRanged(_, col("doc_id")))
  }

  def q34MultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decodeStub(mediaTable(spark, dir))
      .select(col("doc_id"), col("media_type"), col("byte_len"), col("digest"),
        col("fake_width"), col("fake_height"), col("meta.origin").as("origin"))
      .transform(Relational.presentRanged(_, col("doc_id")))

  def q35FrameSample(spark: SparkSession, dir: String): DataFrame =
    frameSample(mediaTable(spark, dir))
      .transform(Relational.presentRanged(_, col("doc_id"), col("frame_idx")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_multimodal_meta" -> (q34MultimodalMeta _),
    "q35_frame_sample" -> (q35FrameSample _),
    "q43_image_decode" -> (q43ImageDecode _),
    "q47_audio_decode" -> (q47AudioDecode _),
    "q71_video_decode" -> (q71VideoDecode _)
  )

  /** Emit a double so DuckDB parses it DIRECTLY as DOUBLE (an exponent
    * forces the double parser; a plain decimal literal would go through
    * DECIMAL and can land 1 ulp off Java's value). `Double.toString` is the
    * shortest round-tripping representation, and both Java's and DuckDB's
    * parsers are correctly-rounded, so the bits match exactly.
    */
  private def dlit(v: Double): String = {
    val s = v.toString
    if (s.contains("E") || s.contains("e")) s else s + "E0"
  }

  /** Golden VALUES oracle for q43: one row per residue of the periodic
    * decode state, computed by the SAME in-JVM encode/decode the query
    * distributes (the spec independently anchors geometry and luma). Lazy:
    * ~1.3k JPEG round trips, paid once when the oracle map is first read.
    */
  private lazy val q43OracleSql: String = {
    val rows = (0 until 1280).map { k =>
      val (w, h, luma) = decodeJpegScalar(syntheticJpeg(k.toLong))
      val lumaR = java.math.BigDecimal.valueOf(luma)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      if (k == 0)
        s"(CAST($k AS BIGINT), CAST($w AS INTEGER), CAST($h AS INTEGER), CAST(${dlit(lumaR)} AS DOUBLE))"
      else s"($k, $w, $h, ${dlit(lumaR)})"
    }
    s"""SELECT d.doc_id, v.width, v.height, v.mean_luma_r
       |FROM documents d JOIN (VALUES ${rows.mkString(",\n")})
       |  AS v(k, width, height, mean_luma_r) ON v.k = d.doc_id % 1280
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Golden VALUES oracle for q71, same construction (period 3840): each
    * residue's row is produced by the SAME in-JVM AVI encode + RIFF/MJPEG
    * decode the query distributes. Lazy: ~15k JPEG round trips, paid once
    * when the oracle map is first read.
    */
  private lazy val q71OracleSql: String = {
    val rows = (0 until 3840).map { k =>
      val (nf, fps, w, h, luma, digest) = decodeAviScalar(syntheticMjpegAvi(k.toLong))
      val lumaR = java.math.BigDecimal.valueOf(luma)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      if (k == 0)
        s"(CAST($k AS BIGINT), CAST($nf AS INTEGER), CAST($fps AS INTEGER), " +
          s"CAST($w AS INTEGER), CAST($h AS INTEGER), CAST(${dlit(lumaR)} AS DOUBLE), '$digest')"
      else s"($k, $nf, $fps, $w, $h, ${dlit(lumaR)}, '$digest')"
    }
    s"""SELECT d.doc_id, v.n_frames, v.fps, v.width, v.height, v.first_luma_r, v.frames_digest
       |FROM documents d JOIN (VALUES ${rows.mkString(",\n")})
       |  AS v(k, n_frames, fps, width, height, first_luma_r, frames_digest)
       |  ON v.k = d.doc_id % 3840
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Golden VALUES oracle for q47, same construction (period 1540). */
  private lazy val q47OracleSql: String = {
    val rows = (0 until 1540).map { k =>
      val (sr, ch, nf, rms) = decodeWavScalar(syntheticWav(k.toLong))
      if (k == 0)
        s"(CAST($k AS BIGINT), CAST($sr AS INTEGER), CAST($ch AS INTEGER), CAST($nf AS BIGINT), CAST(${dlit(rms)} AS DOUBLE))"
      else s"($k, $sr, $ch, $nf, ${dlit(rms)})"
    }
    s"""SELECT d.doc_id, v.sample_rate, v.channels, v.n_frames, v.rms_r
       |FROM documents d JOIN (VALUES ${rows.mkString(",\n")})
       |  AS v(k, sample_rate, channels, n_frames, rms_r) ON v.k = d.doc_id % 1540
       |ORDER BY d.doc_id""".stripMargin
  }

  lazy val oracles: Map[String, String] = Map(
    "q43_image_decode" -> q43OracleSql,
    "q47_audio_decode" -> q47OracleSql,
    "q71_video_decode" -> q71OracleSql,
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
