package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skewed-key stress fixture (VERDICT r8 #7): one synthetic hot user
  * holds 10% of all events — the "one celebrity account" shape that
  * breaks per-key operators whose state or fan-out grows with key size.
  *
  * For each per-user operator under test the spec pins, on the SAME
  * corpus with only the key distribution changed:
  *  - completion + result invariants on the skewed corpus (a quadratic
  *    per-key blow-up would time out or overflow long before these);
  *  - bit-equal results when the window buffers are forced to SPILL
  *    (in-memory threshold 32 rows, far below the hot key's 30k) — the
  *    proof that a hot key exceeding executor memory degrades to disk,
  *    never to OOM or a wrong answer;
  *  - bounded hot-task blow-up: the slowest task on the skewed corpus
  *    stays within a small multiple of the uniform corpus' slowest task
  *    (linear per-key work; a quadratic operator fails this by orders
  *    of magnitude).
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val nEvents = 200000
  private val types = Seq("view", "click", "cart", "purchase", "refund")

  /** Synthesize an events corpus with the testdata schema (ts already in
    * the epoch-nanos-long contract). `hotShare` of rows map to user 1;
    * the rest spread over 2000 users. Deterministic (seedless integer
    * mixing), so both corpora are stable across runs.
    */
  private def corpus(hotShare: Double): DataFrame = {
    import spark.implicits._
    val hotEvery = math.max(1, (1 / hotShare).toInt)
    spark.range(nEvents).select(
      $"id".as("event_id"),
      (lit(1600000000L) * 1000000000L + $"id" * 1000000000L).as("ts"),
      when($"id" % hotEvery === 0, 1L)
        .otherwise(pmod(hash($"id"), lit(2000)).cast("long") + 2L).as("user_id"),
      element_at(typedLit(types), (pmod(hash($"id" * 7), lit(types.size)) + 1)
        .cast("int")).as("event_type"),
      (pmod(hash($"id" * 13), lit(10000)).cast("double") / 100.0).as("value"),
      lit("{}").as("props"))
  }

  private def writeCorpus(name: String, hotShare: Double): String = {
    val dir = Files.createTempDirectory(s"skew_$name").toFile.getAbsolutePath
    corpus(hotShare).repartition(4).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val skewDir = writeCorpus("hot", 0.10)
  private lazy val unifDir = writeCorpus("unif", 1.0 / nEvents) // user 1 ~1 row

  private val ops: Seq[(String, String => DataFrame)] = Seq(
    "q129_transitions" -> (d => ScaleOps.q129Transitions(spark, d)),
    "q130_top_paths" -> (d => ScaleOps.q130TopPaths(spark, d)),
    "q96_gaps_islands" -> (d => ScaleOps.q96GapsIslands(spark, d)),
    "q57_funnel" -> (d => ScaleOps.q57Funnel(spark, d)),
    "q125_resample_ffill" -> (d => ScaleOps.q125ResampleFfill(spark, d)))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  for ((name, op) <- ops) {
    test(s"$name: hot key spills, never OOMs or drifts") {
      val plain = rows(op(skewDir))
      assert(plain.nonEmpty)
      val confs = Seq(
        "spark.sql.windowExecBufferInMemoryThreshold" -> "32",
        "spark.sql.windowExecBufferSpillThreshold" -> "64",
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "32")
      val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val spilled = rows(op(skewDir))
        assert(spilled == plain,
          s"$name result changed when the hot key was forced to spill")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    test(s"$name: hot-task CPU stays a small multiple of uniform") {
      // gate on task CPU, not wall clock: wall-clock max-task times on a
      // shared CI host fold in GC pauses and noisy neighbors, flaking the
      // bound even when the operator under test is linear; executorCpuTime
      // charges only the work the operator actually did
      def maxTaskCpuMs(d: String): Long =
        graft.tools.ShuffleMeter.measure(spark) {
          op(d).write.format("noop").mode("overwrite").save()
        }.maxTaskCpuMs
      maxTaskCpuMs(skewDir) // warm (JIT, page cache) — uncharged
      maxTaskCpuMs(unifDir)
      val skew = maxTaskCpuMs(skewDir)
      val unif = maxTaskCpuMs(unifDir)
      // linear per-key work: 10% of rows on one key can at most ~double a
      // 4-partition task; 8x + 300ms absorbs JIT variance while a
      // quadratic per-key operator overshoots by orders of magnitude
      assert(skew <= unif * 8 + 300,
        s"$name skewed max task cpu ${skew}ms vs uniform ${unif}ms")
    }
  }
}
