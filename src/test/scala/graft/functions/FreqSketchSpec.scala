package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries heavy-hitters aggregate (q86 family): the
  * Mergeable-Summaries guarantees on adversarial streams and under
  * arbitrary partitioning, the partial/final plan split, streaming
  * groupBy legality, and the sf0.001 contract.
  */
class FreqSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  /** Replays the MG guarantees against plain-Scala exact counts. */
  private def checkContract(items: Seq[String], k: Int, sketch: Map[String, Long]): Unit = {
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = items.size.toLong / (k + 1)
    assert(sketch.size <= k, s"${sketch.size} slots for k=$k")
    exact.foreach { case (item, cnt) =>
      if (cnt > bound)
        assert(sketch.contains(item), s"heavy '$item' (cnt=$cnt > $bound) missing")
    }
    sketch.foreach { case (item, est) =>
      val cnt = exact.getOrElse(item, 0L)
      assert(est <= cnt, s"'$item' overcounted: est=$est > exact=$cnt")
      assert(cnt - est <= bound, s"'$item' undercount ${cnt - est} > $bound")
    }
  }

  test("weighted insert over a count table honors the guarantees") {
    // same adversarial stream, PRE-AGGREGATED to (item, cnt) and fed via
    // addW in a hostile order (heavy items last, after the buffer is full
    // of noise) — the mergeable-summaries budget must still hold
    val heavy = Seq.fill(400)("the") ++ Seq.fill(300)("of") ++ Seq.fill(200)("and")
    val noise = (0 until 2000).map(i => s"w$i")
    val stream = heavy ++ noise
    val counts = stream.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(_._2) // ascending: all the noise first, heavy items last
    val b = new MgBuffer(8)
    counts.foreach { case (item, c) => b.addW(item, c) }
    checkContract(stream, 8, b.sorted.toMap)
    assert(b.sorted.toMap.contains("the"), "heaviest item must survive")
  }

  test("buffer honors the guarantees on an adversarial Zipf-plus-noise stream") {
    // 3 genuinely heavy items drowned in 2000 distinct one-off items —
    // the stream that forces constant decrement churn in a 8-slot buffer
    val heavy = Seq.fill(400)("the") ++ Seq.fill(300)("of") ++ Seq.fill(200)("and")
    val noise = (0 until 2000).map(i => s"w$i")
    // deterministic interleave (no RNG: reproducible)
    val stream = (heavy ++ noise).sortBy(s => (s.hashCode * 2654435761L) & 0xffffffffL)
    val b = new MgBuffer(8)
    stream.foreach(b.add)
    checkContract(stream, 8, b.sorted.toMap)
  }

  test("merge keeps the guarantees across arbitrary split points and orders") {
    val stream = (0 until 3000).map { i =>
      if (i % 3 == 0) "alpha" else if (i % 7 == 0) "beta" else s"tail${i % 211}"
    }
    for (cut <- Seq(1, 500, 1500, 2999); k <- Seq(4, 16, 64)) {
      val (l, r) = stream.splitAt(cut)
      val bl = new MgBuffer(k); l.foreach(bl.add)
      val br = new MgBuffer(k); r.foreach(br.add)
      bl.mergeIn(br)
      checkContract(stream, k, bl.sorted.toMap)
      // serde round-trip preserves state exactly
      val rt = MgBuffer.deserialize(bl.serialize())
      assert(rt.sorted.toSeq == bl.sorted.toSeq)
    }
  }

  test("the aggregate's contract is partition-invariant even though slot residue is not") {
    import spark.implicits._
    val rows = (0 until 5000).map { i =>
      ("g", if (i % 5 == 0) "heavy1" else if (i % 11 == 0) "heavy2" else s"t${i % 401}")
    }
    val exact = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bound = rows.size.toLong / 33
    for (parts <- Seq(1, 4, 13)) {
      val sk = rows.toDF("g", "item").repartition(parts)
        .groupBy($"g").agg(FreqSketch.mgSketch($"item", 32).as("sk"))
        .select(explode($"sk").as("it"))
        .select($"it.item", $"it.est").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (item, cnt) =>
        if (cnt > bound) assert(sk.contains(item), s"parts=$parts missing heavy $item")
      }
      sk.foreach { case (item, est) =>
        val cnt = exact.getOrElse(item, 0L)
        assert(est <= cnt && cnt - est <= bound, s"parts=$parts item=$item")
      }
    }
  }

  test("plan: partial_mg_sketch below the exchange, final above — O(k·groups) on the wire") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (s"g${i % 3}", s"w${i % 50}"))
      .toDF("g", "item").repartition(4)
      .groupBy($"g").agg(FreqSketch.mgSketch($"item", 16).as("sk"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("partial_mg_sketch"), s"no map-side partial:\n$p")
    assert("(?<!partial_)mg_sketch".r.findAllIn(p).nonEmpty, s"no final agg:\n$p")
  }

  test("streaming groupBy accepts the aggregate — state merged across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(String, String)]
    val q = src.toDS().toDF("g", "item").groupBy($"g")
      .agg(FreqSketch.mgSketch($"item", 4).as("sk"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("mg_stream").start()
    try {
      src.addData(Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")): _*)
      q.processAllAvailable()
      src.addData(Seq.fill(25)(("a", "x")) ++ Seq.fill(5)(("a", "z")): _*)
      q.processAllAvailable()
      val sk = spark.sql("SELECT sk FROM mg_stream").collect()(0)
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // 70 items total, k=4 → bound 14; x (exact 55) must survive both
      // batches with est within the bound
      assert(sk.contains("x"))
      assert(sk("x") <= 55L && 55L - sk("x") <= 14L)
    } finally q.stop()
  }

  test("q86 contract holds at sf0.001") {
    val rows = graft.operators.TextOps.q86HeavyHitters(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("recall_ok"), s"recall broke for ${r.getAs[String]("lang")}")
      assert(r.getAs[Boolean]("underest_ok"))
      assert(r.getAs[Boolean]("err_ok"))
    }
  }
}
