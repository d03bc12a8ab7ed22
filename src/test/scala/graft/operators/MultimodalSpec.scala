package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The real image-decode path: JPEG bytes synthesized per doc id decode
  * back (via javax.imageio, in executors) to the exact geometry and to a
  * mean luma within JPEG quantization error of the encoded solid color.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  val dir = "/root/testdata/sf0.001"

  test("decode recovers geometry exactly and solid-color luma within JPEG error") {
    import spark.implicits._
    val decoded = Multimodal.decodeImages(spark, Multimodal.jpegTable(spark, dir))
      .as[(Long, Int, Int, Double)].collect().toSeq
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, w, h, luma) =>
      assert(w == 16 + (id % 8).toInt, s"width for $id")
      assert(h == 16 + (id % 5).toInt, s"height for $id")
      val expected = 0.299 * ((id * 37) % 256) + 0.587 * ((id * 57) % 256) +
        0.114 * ((id * 77) % 256)
      // JPEG is lossy but a solid color survives quantization almost
      // exactly; 3 luma steps is far beyond observed error
      assert(math.abs(luma - expected) <= 3.0, s"luma for $id: $luma vs $expected")
    }
  }

  test("WAV decode recovers format exactly and sine RMS within 1% of A/sqrt(2)") {
    import spark.implicits._
    val decoded = Multimodal.q47AudioDecode(spark, dir)
      .as[(Long, Int, Int, Long, Double)].collect().toSeq
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, sr, ch, nf, rms) =>
      assert(sr == 8000 + (id % 4).toInt * 4000, s"sample_rate for $id")
      assert(ch == 1, s"channels for $id")
      assert(nf == 400 + (id % 7) * 100, s"n_frames for $id")
      // a pure sine's RMS is amplitude/sqrt(2); quantization to 16-bit and
      // partial final periods keep the sampled value within ~1%
      val expected = (8000.0 + (id % 5).toInt * 1000.0) / math.sqrt(2.0)
      assert(math.abs(rms - expected) / expected <= 0.01, s"rms for $id: $rms vs $expected")
    }
  }

  test("a corrupt WAV payload degrades to a sentinel row, not a task failure") {
    val (sr, ch, nf, rms) = Multimodal.decodeWavScalar(Array[Byte](9, 9, 9))
    assert((sr, ch, nf, rms) == ((-1, -1, -1L, -1.0)))
  }

  test("a parseable-but-not-16-bit-LE WAV degrades to the sentinel, not a bogus RMS") {
    // valid 8-bit unsigned PCM WAV: AudioSystem parses it fine, but the RMS
    // loop assumes 16-bit LE signed — the guard must return the sentinel
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val samples = Array.tabulate[Byte](800)(i => ((i % 200) + 28).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val out = Multimodal.decodeWavScalar(bos.toByteArray)
    assert(out == ((-1, -1, -1L, -1.0)), s"8-bit WAV produced $out")
  }

  test("a corrupt payload degrades to a sentinel row, not a task failure") {
    import spark.implicits._
    val bad = Seq((1L, Array[Byte](1, 2, 3)), (2L, Multimodal.syntheticJpeg(2L)))
      .toDF("doc_id", "content")
    val out = Multimodal.decodeImages(spark, bad)
      .as[(Long, Int, Int, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, -1, -1, -1.0)))
    assert(out(1)._2 == 18 && out(1)._3 == 18) // 16 + 2%8, 16 + 2%5
  }

  test("AVI/MJPEG: container round-trips through the RIFF walk with real frame decode") {
    for (id <- Seq(0L, 5L, 17L, 123L, 3839L)) {
      val (nf, fps, w, h, luma, digest) = Multimodal.decodeAviScalar(
        Multimodal.syntheticMjpegAvi(id))
      assert(nf == 2 + (id % 5).toInt, s"n_frames for $id")
      assert(fps == 10 + (id % 3).toInt * 5, s"fps for $id")
      assert(w == 16 + (id % 8).toInt && h == 16 + (id % 5).toInt,
        s"decoded first-frame geometry for $id")
      assert(luma >= 0.0 && luma <= 255.0, s"luma for $id")
      assert(digest.length == 32, s"digest for $id")
      // the first frame is a REAL JPEG: its solid color's luma must match
      // the encoded color within JPEG quantization error
      val expected = 0.299 * ((id * 37) % 256) + 0.587 * ((id * 57) % 256) +
        0.114 * ((id * 77) % 256)
      assert(math.abs(luma - expected) <= 3.5, s"luma for $id: $luma vs $expected")
    }
  }

  test("AVI decode state is periodic with period 3840 (the oracle contract)") {
    for (id <- Seq(1L, 42L, 1000L)) {
      val a = Multimodal.decodeAviScalar(Multimodal.syntheticMjpegAvi(id))
      val b = Multimodal.decodeAviScalar(Multimodal.syntheticMjpegAvi(id + 3840L))
      assert(a == b, s"period violated at $id")
    }
  }

  test("a corrupt AVI payload degrades to a sentinel row, not a task failure") {
    val bad = (-1, -1, -1, -1, -1.0, "")
    assert(Multimodal.decodeAviScalar(Array[Byte](9, 9, 9)) == bad)
    // right magic, truncated body
    val truncated = Multimodal.syntheticMjpegAvi(7L).take(40)
    assert(Multimodal.decodeAviScalar(truncated) == bad)
    // a WAV is RIFF but not AVI
    assert(Multimodal.decodeAviScalar(Multimodal.syntheticWav(3L)) == bad)
  }
}
