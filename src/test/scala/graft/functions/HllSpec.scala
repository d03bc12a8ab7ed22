package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HLL sketch family (q93): estimator accuracy across regimes, the
  * max-merge determinism argument (bit-equal registers under any
  * partitioning / duplication / split), the persistable sketch-table
  * round trip, streaming groupBy legality, the partial/final plan
  * split, and the SQL registration path.
  */
class HllSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private def sketchOf(items: Iterable[Long], p: Int = Hll.defaultP): HllBuffer = {
    val b = new HllBuffer(p)
    items.foreach(i => b.addHash(HllBuffer.hashAny(java.lang.Long.valueOf(i))))
    b
  }

  test("estimator lands within 3 sigma across cardinality regimes") {
    // p=12: sigma = 1.04/sqrt(4096) = 1.625%; allow 3 sigma = 4.9%
    // (n=100 lives in the linear-counting test below — at that occupancy
    // the error is register-collision noise, not the HLL sigma)
    for (n <- Seq(2000L, 50000L, 400000L)) {
      val est = HllBuffer.estimate(sketchOf(0L until n map (_ * 7919L)).serialize())
      val err = math.abs(est - n).toDouble / n
      assert(err <= 0.049, s"n=$n est=$est err=$err")
    }
  }

  test("small-range linear counting is near-exact far below m") {
    for (n <- Seq(1L, 10L, 200L)) {
      val est = HllBuffer.estimate(sketchOf(0L until n).serialize())
      assert(math.abs(est - n) <= math.max(1L, n / 50), s"n=$n est=$est")
    }
    // structured stride keys: ±8% absolute at n=100 (collision noise)
    val est100 = HllBuffer.estimate(sketchOf(0L until 100L map (_ * 7919L)).serialize())
    assert(math.abs(est100 - 100L) <= 8, s"n=100 est=$est100")
  }

  test("registers are a function of the input SET: splits, order, duplication") {
    val items = (0L until 10000L).map(i => i * 31L)
    val direct = sketchOf(items).serialize().toSeq
    for (cut <- Seq(1, 5000, 9999)) {
      val (l, r) = items.splitAt(cut)
      val bl = sketchOf(l); val br = sketchOf(r)
      bl.mergeIn(br)
      assert(bl.serialize().toSeq == direct, s"cut=$cut diverged")
    }
    // reversed, fully duplicated stream lands on the same bytes
    assert(sketchOf(items.reverse ++ items).serialize().toSeq == direct)
    // serde round trip is exact
    assert(HllBuffer.deserialize(sketchOf(items).serialize()).serialize().toSeq == direct)
  }

  test("aggregate emits bit-identical sketches under any partitioning") {
    import spark.implicits._
    val df = (0 until 5000).map(i => ("g" + (i % 3), (i % 1500).toLong)).toDF("g", "u")
    val sketches = for (parts <- Seq(1, 4, 13)) yield
      df.repartition(parts).groupBy($"g").agg(Hll.hllSketch($"u").as("sk"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk").toSeq).toMap
    assert(sketches.distinct.size == 1, "partitioning changed sketch bytes")
  }

  test("persisted sketch table merges to the one-shot sketch (parquet round trip)") {
    import spark.implicits._
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("hll_sketches").toString
    graft.operators.ScaleOps.buildUserSketches(events)
      .write.mode("overwrite").parquet(dir)
    val fromDisk = graft.operators.ScaleOps.sketchRollup(spark.read.parquet(dir))
      .select($"event_type", $"sketch", $"est_users")
      .collect().map(r => r.getString(0) -> ((r.getAs[Array[Byte]](1).toSeq, r.getLong(2)))).toMap
    val oneShot = events.groupBy($"event_type")
      .agg(Hll.hllSketch($"user_id").as("sk"))
      .select($"event_type", $"sk", Hll.hllEst($"sk").as("est"))
      .collect().map(r => r.getString(0) -> ((r.getAs[Array[Byte]](1).toSeq, r.getLong(2)))).toMap
    assert(fromDisk == oneShot)
    // and the estimates are honest: within 5% of the exact distinct count
    val exact = events.groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    oneShot.foreach { case (k, (_, est)) =>
      assert(math.abs(est - exact(k)).toDouble / exact(k) <= 0.05, s"$k est=$est exact=${exact(k)}")
    }
  }

  test("streaming groupBy accepts the sketch aggregate; state merges across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(String, Long)]
    val q = src.toDS().toDF("g", "u").groupBy($"g")
      .agg(Hll.hllSketch($"u").as("sk"))
      .select($"g", Hll.hllEst($"sk").as("est"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("hll_stream").start()
    try {
      src.addData((0 until 300).map(i => ("a", (i % 120).toLong)): _*)
      q.processAllAvailable()
      src.addData((0 until 300).map(i => ("a", (100 + i % 80).toLong)): _*)
      q.processAllAvailable()
      val est = spark.sql("SELECT est FROM hll_stream").collect()(0).getLong(0)
      // distinct across both batches = 180; linear-counting regime is near-exact
      assert(math.abs(est - 180L) <= 4, s"streamed est=$est")
    } finally q.stop()
  }

  test("SQL registration: hll_sketch / hll_merge / hll_est compose in spark.sql") {
    GraftFunctions.register(spark)
    spark.range(4000).selectExpr("id % 4 AS g", "id % 700 AS u")
      .createOrReplaceTempView("hll_sql_in")
    val rows = spark.sql(
      """SELECT hll_est(hll_merge(sk)) AS est FROM (
        |  SELECT g, hll_sketch(u, 12) AS sk FROM hll_sql_in GROUP BY g
        |)""".stripMargin).collect()
    assert(math.abs(rows(0).getLong(0) - 700L) <= 14, s"sql est=${rows(0).getLong(0)}")
  }

  test("plan: partial_hll_sketch below the exchange, final above — 4 KB per group per task on the wire") {
    import spark.implicits._
    val df = (0 until 1000).map(i => ("g" + (i % 3), i.toLong)).toDF("g", "u")
      .repartition(4).groupBy($"g").agg(Hll.hllSketch($"u").as("sk"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("partial_hll_sketch"), s"no map-side partial:\n$p")
    assert("(?<!partial_)hll_sketch".r.findAllIn(p).nonEmpty, s"no final agg:\n$p")
  }

  test("q93 contract holds at sf0.001") {
    val rows = graft.operators.ScaleOps.q93HllSketch(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("est_ok"), s"est_ok broke for ${r.getAs[String]("event_type")}")
      assert(r.getAs[Boolean]("merge_ok"), s"merge_ok broke for ${r.getAs[String]("event_type")}")
    }
  }
}
