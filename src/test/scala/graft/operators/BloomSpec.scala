package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The broadcast Bloom decontamination gate (q85 family): build-side
  * bitset algebra, the filter's no-false-negative guarantee, the measured
  * false-positive rate, the scan-side (shuffle-free) probe plan, and the
  * streaming twin's agreement with the batch gate.
  */
class BloomSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val dir = "/root/testdata/sf0.001"

  /** A tiny corpus with controlled overlap: doc 10 IS the "benchmark"
    * text, doc 11 shares half of it, doc 12 is disjoint.
    */
  private def handDocs: DataFrame = {
    import spark.implicits._
    val bench = (1 to 40).map(i => s"b$i").mkString(" ")
    val half = ((1 to 20).map(i => s"b$i") ++ (1 to 20).map(i => s"x$i")).mkString(" ")
    val clean = (1 to 40).map(i => s"c$i").mkString(" ")
    Seq((10L, bench), (11L, half), (12L, clean)).toDF("doc_id", "text")
  }

  private def benchBits: DataFrame = {
    import spark.implicits._
    TrainPrep.bloomBuild(
      handDocs.filter($"doc_id" === 10L)
        .select(explode(graft.functions.ShingleFunctions
          .shingleHashes(split($"text", " "))).as("sh_h")))
  }

  test("no false negatives: a doc that IS the benchmark text has every shingle flagged") {
    import spark.implicits._
    val gated = TrainPrep.bloomGate(handDocs, benchBits, tau = 0.5)
      .orderBy($"doc_id").collect()
    assert(gated.length == 3)
    val Array(d10, d11, d12) = gated
    // d10: identical text → every one of its shingles is in the filter
    assert(d10.getAs[Long]("n_bloom") == d10.getAs[Long]("n_shingles"))
    assert(!d10.getAs[Boolean]("keep"))
    // d11: the first 18 3-grams (b1..b20 run) are shared; flags must cover
    // at least those (no false negative can reduce the count)
    assert(d11.getAs[Long]("n_bloom") >= 18L)
    // d12: fully disjoint → only false positives can flag, and at this
    // load (≈150 grams in 2^21 bits) the expected fp count is ≈ 0
    assert(d12.getAs[Long]("n_bloom") == 0L)
    assert(d12.getAs[Boolean]("keep"))
  }

  test("false-positive rate stays under the geometry's promise on 50k disjoint grams") {
    import spark.implicits._
    // probe 50k single-token-run docs that share nothing with the build
    val probes = (0 until 500).map { d =>
      (1000L + d, (0 until 100).map(i => s"p${d}_$i").mkString(" "))
    }.toDF("doc_id", "text")
    val gated = TrainPrep.bloomGate(probes, benchBits, tau = 0.5)
    val agg = gated.agg(
      sum($"n_bloom").as("fp"), sum($"n_shingles").as("n")).head()
    val fpRate = agg.getLong(0).toDouble / agg.getLong(1)
    assert(fpRate <= 0.001, s"fp rate $fpRate on a nearly-empty filter")
  }

  test("bitset build is partition-invariant (OR is associative+commutative+idempotent)") {
    import spark.implicits._
    val hashes = (1 to 5000).map(i => i * 2654435761L % (1L << 60)).toDF("sh_h")
    val one = TrainPrep.bloomBuild(hashes.repartition(1)).head().getSeq[Long](0)
    val many = TrainPrep.bloomBuild(hashes.repartition(8)).head().getSeq[Long](0)
    // duplicated input changes nothing either
    val dup = TrainPrep.bloomBuild(hashes.union(hashes).repartition(5))
      .head().getSeq[Long](0)
    assert(one == many && one == dup)
    assert(one.length == TrainPrep.bloomBits / 64)
  }

  test("the probe side of the gate plan has no shuffle — the corpus never moves") {
    val plan = TrainPrep.bloomGate(handDocs, benchBits, tau = 0.5)
      .queryExecution.executedPlan.toString
    // exactly ONE exchange in the whole plan: the bitset aggregation's
    // partial→final single-partition hop on the (tiny) build side; the
    // corpus side is scan → broadcast-join → project → filter
    val exchanges = "(?<!Broadcast)(?<!Reused)Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected only the build-side agg exchange:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"bitset must arrive by broadcast:\n$plan")
  }

  test("q85 contract holds at sf0.001: bloom superset of exact, fp rate bounded") {
    val rows = TrainPrep.q85BloomDecontam(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("superset_ok")))
    assert(rows.forall(_.getAs[Boolean]("fp_rate_ok")))
  }

  test("geometry is a lever: a deliberately overloaded filter still has NO false negatives") {
    import spark.implicits._
    // 1024 bits x 3 probes for ~150 grams — load far past the production
    // geometry. False positives are allowed to rise (that is the trade
    // the numBits knob buys back); false negatives must stay impossible.
    val grams = handDocs.filter($"doc_id" === 10L)
      .select(explode(graft.functions.ShingleFunctions
        .shingleHashes(split($"text", " "))).as("sh_h"))
    val tiny = TrainPrep.bloomBuild(grams, numBits = 1024, numHashes = 3)
    val gated = TrainPrep.bloomGate(handDocs, tiny, tau = 0.5,
      numBits = 1024, numHashes = 3)
      .orderBy($"doc_id").collect()
    val d10 = gated(0)
    assert(d10.getAs[Long]("n_bloom") == d10.getAs[Long]("n_shingles"),
      "overloading the filter produced a false negative")
  }

  test("the bitset is a persistable index artifact: parquet round-trip gates identically") {
    // the buildBandIndex/buildPassageIndex deployment pattern: build the
    // filter once (nightly, from the benchmark suite), park it as a tiny
    // parquet artifact, and let every ingest job — batch or the streaming
    // gate — read it back; no special save/load API is needed because the
    // bitset is an ordinary single-row DataFrame
    import spark.implicits._
    val path = "target/bloom_index"
    benchBits.write.mode("overwrite").parquet(path)
    val reloaded = spark.read.parquet(path)
    val a = TrainPrep.bloomGate(handDocs, benchBits, tau = 0.5)
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val b = TrainPrep.bloomGate(handDocs, reloaded, tau = 0.5)
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("streaming bloom gate == batch gate on full replay (stream-static broadcast)") {
    import spark.implicits._
    val stage = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_bloom"))
    handDocs.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val schema = spark.read.parquet(stage.toString).schema
    val stream = spark.readStream.schema(schema).parquet(stage.toString)
    val q = graft.streaming.EventStream.bloomGateStream(stream, benchBits, tau = 0.5)
      .writeStream.outputMode("append").format("memory").queryName("bloomgate").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM bloomgate").orderBy($"doc_id").collect()
      val batch = TrainPrep.bloomGate(handDocs, benchBits, tau = 0.5)
        .orderBy($"doc_id").collect()
      assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("bloomPrunedJoin == plain join, and the probe prunes BEFORE the join exchange") {
    import spark.implicits._
    val urgent = graft.Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    val fact = graft.Tables.lineitem(spark, dir)
    val pruned = ScaleOps.bloomPrunedJoin(fact, "l_orderkey", urgent, "o_orderkey")
      .select($"l_orderkey", $"l_linenumber")
    val plain = fact.join(urgent, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_linenumber")
    val a = pruned.orderBy($"l_orderkey", $"l_linenumber").collect().map(_.toSeq).toSeq
    val b = plain.orderBy($"l_orderkey", $"l_linenumber").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
    // the bitset really prunes: surviving fact rows ≈ matching rows
    // (+ fp sliver), far below the full table
    val total = fact.count()
    val survivors = fact
      .crossJoin(broadcast(urgent
        .select(explode(graft.functions.BloomFunctions
          .bloomPositions($"o_orderkey", 1 << 21, 5)).as("pos"))
        .agg(graft.functions.Bitset.bitsetOr($"pos", 1 << 21).as("bits"))))
      .filter(graft.functions.BloomFunctions
        .bloomContains($"bits", $"l_orderkey", 1 << 21, 5))
      .count()
    val matching = a.size.toLong
    assert(survivors >= matching, "bloom dropped a true match (false negative!)")
    assert(survivors <= matching + (total - matching) / 10,
      s"bloom pruned too little: $survivors of $total for $matching matches")
  }

  test("q94 plan: the bloom_contains filter sits on the scan side, below the join") {
    val df = ScaleOps.q94BloomJoin(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("bloom_contains"), s"probe filter missing:\n$p")
    val probeIdx = p.indexOf("bloom_contains")
    val joinIdx = p.indexOf("Join")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "probe filter should appear BELOW (after, in tree print order) the join")
  }
}
