package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZorderOps

/** Z-order layout (q98 family): bit-exactness of the magic-mask spread
  * against a naive interleave, and the MEASURED layout claim — a
  * z-ordered write keeps per-file min/max tight on BOTH dimensions,
  * where a single-column sort leaves the other dimension's per-file
  * range at ~the global range (no skipping possible).
  */
class ZorderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  test("spread16/zorder2 equal the naive bit-by-bit interleave") {
    def naive(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val keys = Seq(0L, 1L, 2L, 15L, 255L, 256L, 4095L, 65535L, 65536L + 7L, 123456789L)
    for (x <- keys; y <- keys)
      assert(ZorderOps.zorder2(x, y) == naive(x & 0xffffL, y & 0xffffL), s"($x, $y)")
  }

  test("zorder2 is monotone in each key within a fixed high-bit cell") {
    // within one 16x16 cell, raising either coordinate raises the zval
    for (base <- Seq(0L, 16L, 4096L); dx <- 0L until 4L; dy <- 0L until 4L) {
      val z0 = ZorderOps.zorder2(base + dx, base + dy)
      assert(ZorderOps.zorder2(base + dx + 1, base + dy) > z0)
      assert(ZorderOps.zorder2(base + dx, base + dy + 1) > z0)
    }
  }

  test("z-ordered files keep BOTH key ranges tight; a single-dim sort does not") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_partkey", $"l_suppkey")
    val numFiles = 8
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val sdir = java.nio.file.Files.createTempDirectory("singlesort").toString
    ScaleOps.zorderWrite(li, "l_partkey", "l_suppkey", zdir, numFiles)
    li.repartitionByRange(numFiles, $"l_partkey")
      .sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(sdir)

    def fileRanges(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min($"l_partkey"), max($"l_partkey"),
              min($"l_suppkey"), max($"l_suppkey")).collect()(0)
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }

    val global = li.agg(
      max($"l_partkey") - min($"l_partkey"),
      max($"l_suppkey") - min($"l_suppkey")).collect()(0)
    val (pGlobal, sGlobal) = (global.getLong(0).toDouble, global.getLong(1).toDouble)

    def meanWidths(rs: Seq[(Long, Long, Long, Long)]): (Double, Double) = (
      rs.map { case (a, b, _, _) => (b - a).toDouble }.sum / rs.size,
      rs.map { case (_, _, c, d) => (d - c).toDouble }.sum / rs.size)

    val (zp, zs) = meanWidths(fileRanges(zdir))
    val (sp, ss) = meanWidths(fileRanges(sdir))
    // single-dim sort: partkey tight, suppkey ~global (useless for skipping)
    assert(sp / pGlobal <= 0.35, s"sorted layout partkey width $sp vs $pGlobal")
    assert(ss / sGlobal >= 0.9, s"sorted layout suppkey should be ~global: $ss vs $sGlobal")
    // z-order: BOTH dimensions well below global
    assert(zp / pGlobal <= 0.6, s"z layout partkey width $zp vs $pGlobal")
    assert(zs / sGlobal <= 0.6, s"z layout suppkey width $zs vs $sGlobal")
  }

  test("q98: every z-cell covers a rectangle no wider than ~1/16 of each key's range") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val g = li.agg(
      max($"l_partkey") - min($"l_partkey"),
      max($"l_suppkey") - min($"l_suppkey")).collect()(0)
    val (pBound, sBound) = (g.getLong(0) / 16 + 1, g.getLong(1) / 16 + 1)
    val rows = ScaleOps.q98Zorder(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("pmax") - r.getAs[Long]("pmin") <= pBound)
      assert(r.getAs[Long]("smax") - r.getAs[Long]("smin") <= sBound)
    }
  }
}
