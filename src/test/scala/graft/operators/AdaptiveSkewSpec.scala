package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import AdaptiveSkew._
import AdaptiveSkew.JoinSpelling._

/** Pins the adaptive skew chooser (VERDICT r15 #1): the [[AdaptiveSkew
  * .decide]] boundary as a pure function, the stats probe, and — the
  * contract that lets the chooser exist at all — row-identical results
  * from every spelling it can pick.
  */
class AdaptiveSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  val dir = "/root/testdata/sf0.001"

  // policy: 10 MB broadcast budget, 32-way parallelism, default row
  // estimate (96 B) and hot share (0.25)
  private val policy = SkewPolicy(
    broadcastBytesLimit = 10L * 1024 * 1024, parallelism = 32)

  test("decide: a dim inside the broadcast budget always broadcasts") {
    // 100k rows × 96 B ≈ 9.2 MB ≤ 10 MB — even with a 100%-hot fact
    assert(decide(SkewStats(100000, 10000000, 10000000), policy) == Broadcast)
    // exact boundary is still broadcast (≤, matching the planner's)
    val atLimit = policy.broadcastBytesLimit / policy.dimRowBytes
    assert(decide(SkewStats(atLimit, 1000, 1000), policy) == Broadcast)
    assert(decide(SkewStats(atLimit + 1, 0, 0), policy) != Broadcast)
  }

  test("decide: broadcast disabled (-1, Spark's sentinel) never broadcasts") {
    val p = policy.copy(broadcastBytesLimit = -1L)
    assert(decide(SkewStats(1, 100, 1), p) == Plain)
  }

  test("decide: big dim + uniform keys is a plain shuffled hash join") {
    // hottest key owns 1% of a 32-task fact: below hotShare AND below
    // one task's fair share
    assert(decide(SkewStats(1000000, 3200000, 32000), policy) == Plain)
  }

  test("decide: big dim + hot key salts, salt count sized from the stats") {
    // hot key owns 80% of 3.2 M rows = 2.56 M; fair share 100 k/task →
    // ceil(25.6) = 26 reducers' worth of salt
    assert(decide(SkewStats(1000000, 3200000, 2560000), policy) == Salted(26))
  }

  test("decide: salt count clamps to [2, maxSalts]") {
    // whole 32 M-row fact on one key at parallelism 1000 → raw 1000
    // (fair share 65,536 via the minTaskRows floor, not 32,000), capped
    val pWide = policy.copy(parallelism = 1000)
    assert(decide(SkewStats(1000000, 32000000, 32000000), pWide) == Salted(64))
    // hot by share (60%) but barely past one task's fair share → floor 2
    val pNarrow = policy.copy(parallelism = 2)
    assert(decide(SkewStats(1000000, 200000, 120000), pNarrow) == Salted(2))
  }

  test("decide: a hot key below one task's fair share stays plain") {
    // 90% share but the whole fact is 20 rows: the "hot" key is
    // sub-second work (< minTaskRows) — salting pays the replicated-dim
    // exchange for nothing
    assert(decide(SkewStats(1000000, 20, 18), policy) == Plain)
    // 60% share of a 100 k fact: far above hotShare, and above the
    // divided fair share (3,125), but below the 65,536-row floor — the
    // whole key is sub-second work, stay plain
    assert(decide(SkewStats(1000000, 100000, 60000), policy) == Plain)
    // degenerate empty fact
    assert(decide(SkewStats(1000000, 0, 0), policy) == Plain)
  }

  test("statsFromDim: one aggregate over the dim yields (dim, fact, hottest)") {
    import spark.implicits._
    val dim = Seq((1L, 5L), (2L, 80L), (3L, 15L)).toDF("user_id", "user_total")
    assert(statsFromDim(dim, "user_total") == SkewStats(3, 100, 80))
    assert(statsFromDim(dim.filter($"user_id" < 0), "user_total") ==
      SkewStats(0, 0, 0))
  }

  test("all three spellings are row-identical on the hot-key demo corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = ScaleOps.skewedDemoEvents(spark, dir)
    val dim = events.groupBy($"user_id").agg(count(lit(1)).as("user_total"))
    val out = Seq(Broadcast, Plain, Salted(5)).map { sp =>
      userDimJoinAgg(spark, events, dim, sp)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(out(0).nonEmpty)
    assert(out(0) == out(1), "broadcast vs plain differ")
    assert(out(0) == out(2), "broadcast vs salted differ (two-phase sum not bit-equal)")
  }

  test("q166 adaptive: the live-session decision at test scale is broadcast") {
    val df = ScaleOps.q166SkewJoinAdaptive(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("BroadcastHashJoin"), s"dim not broadcast:\n$p")
    assert(!p.contains("salt"), s"broadcastable dim was salted:\n$p")
    // and it matches the pinned plain twin row-for-row (the oracle-hash
    // contract, asserted engine-side too)
    val a = df.collect().map(_.toString).sorted.toSeq
    val b = ScaleOps.q165SkewJoinPlain(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
