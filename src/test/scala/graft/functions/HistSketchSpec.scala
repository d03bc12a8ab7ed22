package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fixed-grid histogram sketch family (q100): the value-space
  * quantile guarantee, bit-equal merges under any partitioning/split,
  * the persistable sketch-table round trip, streaming groupBy legality,
  * SQL registration, and the geometry-mismatch guard.
  */
class HistSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private def sketchOf(vals: Iterable[Double], lo: Double = 0.0,
      hi: Double = 512.0, buckets: Int = 4096): HistBuffer = {
    val b = new HistBuffer(lo, hi, buckets)
    vals.foreach(b.add)
    b
  }

  test("quantile estimates land within one bucket width of the exact order statistic") {
    val vals = (0 until 10000).map(i => (i * i % 4999).toDouble / 10.0) // skewed, in range
    val sorted = vals.sorted
    val sk = sketchOf(vals).serialize()
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = HistBuffer.quantile(sk, q)
      val r = q * (vals.size - 1)
      val (i0, frac) = (r.toInt, r - r.toInt)
      val exact = (1 - frac) * sorted(i0) + frac * sorted(math.min(i0 + 1, vals.size - 1))
      assert(math.abs(est - exact) <= 0.125 + 1e-9, s"q=$q est=$est exact=$exact")
    }
  }

  test("out-of-range values clamp to edge cells; empty sketch estimates NaN") {
    val sk = sketchOf(Seq(-5.0, 1000.0, 1.0)).serialize()
    val b = HistBuffer.deserialize(sk)
    assert(b.counts(0) == 1L && b.counts(4095) == 1L && b.counts.sum == 3L)
    assert(HistBuffer.quantile(sketchOf(Nil).serialize(), 0.5).isNaN)
  }

  test("merge is exact vector addition: splits/order/partitioning land on the same bytes") {
    val vals = (0 until 8000).map(i => (i % 477).toDouble)
    val direct = sketchOf(vals).serialize().toSeq
    for (cut <- Seq(1, 4000, 7999)) {
      val (l, r) = vals.splitAt(cut)
      val bl = sketchOf(l); bl.mergeIn(sketchOf(r))
      assert(bl.serialize().toSeq == direct, s"cut=$cut")
    }
    import spark.implicits._
    val df = vals.zipWithIndex.map { case (v, i) => ("g" + (i % 2), v) }.toDF("g", "v")
    val perPart = for (parts <- Seq(1, 4, 13)) yield
      df.repartition(parts).groupBy($"g")
        .agg(HistSketch.histSketch($"v", 0.0, 512.0, 4096).as("sk"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    assert(perPart.distinct.size == 1)
  }

  test("persisted per-day sketch table merges bit-equal to the one-shot sketch") {
    import spark.implicits._
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("hist_sketches").toString
    graft.operators.ScaleOps.buildValueHists(events).write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir).groupBy($"event_type")
      .agg(HistSketch.histMerge($"sketch").as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    val direct = events.groupBy($"event_type")
      .agg(HistSketch.histSketch($"value", 0.0, 512.0, 4096).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    assert(merged == direct)
  }

  test("geometry mismatch raises instead of silently blending grids") {
    import spark.implicits._
    val a = sketchOf(Seq(1.0)).serialize()
    val b = sketchOf(Seq(1.0), hi = 256.0).serialize()
    val ex = intercept[Exception] {
      Seq(a, b).toDF("sk").agg(HistSketch.histMerge($"sk")).collect()
    }
    assert(ex.getMessage.contains("mixed geometries") ||
      Option(ex.getCause).exists(_.getMessage.contains("mixed geometries")))
  }

  test("streaming groupBy accepts the sketch; state merges across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(String, Double)]
    val q = src.toDS().toDF("g", "v").groupBy($"g")
      .agg(HistSketch.histSketch($"v", 0.0, 512.0, 4096).as("sk"))
      .select($"g", HistSketch.histQuantile($"sk", 0.5).as("med"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("hist_stream").start()
    try {
      src.addData((0 until 500).map(i => ("a", i.toDouble / 2)): _*)
      q.processAllAvailable()
      src.addData((0 until 500).map(i => ("a", 250.0 + i.toDouble / 2)): _*)
      q.processAllAvailable()
      val med = spark.sql("SELECT med FROM hist_stream").collect()(0).getDouble(0)
      // 1000 values spread over [0, 500): true median ~249.75
      assert(math.abs(med - 249.75) <= 0.5, s"streamed med=$med")
    } finally q.stop()
  }

  test("SQL registration: hist_sketch / hist_merge / hist_quantile compose in spark.sql") {
    GraftFunctions.register(spark)
    spark.range(1000).selectExpr("id % 2 AS g", "CAST(id AS DOUBLE) / 2 AS v")
      .createOrReplaceTempView("hist_sql_in")
    val rows = spark.sql(
      """SELECT hist_quantile(hist_merge(sk), 0.5) AS med FROM (
        |  SELECT g, hist_sketch(v, 0.0, 512.0, 4096) AS sk FROM hist_sql_in GROUP BY g
        |)""".stripMargin).collect()
    assert(math.abs(rows(0).getDouble(0) - 249.75) <= 0.5)
  }

  test("q100 contract holds at sf0.001") {
    val rows = graft.operators.ScaleOps.q100HistSketch(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok"), s"p50 broke for ${r.getAs[String]("event_type")}")
      assert(r.getAs[Boolean]("p90_ok"))
      assert(r.getAs[Boolean]("merge_ok"))
    }
  }
}
