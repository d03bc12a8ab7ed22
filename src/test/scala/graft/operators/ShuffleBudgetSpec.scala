package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exchange-volume regression gate (VERDICT r8 #6): PlanSpec pins plan
  * SHAPES, this pins the BYTES. Each pinned query's total shuffle-write
  * volume at sf0.01 must stay within +25% of the value measured when
  * the plan was last reviewed (`graft.tools.ShuffleProbe`, 2026-08).
  * A refactor that silently adds an exchange, drops a broadcast, or
  * widens shuffled rows (a lost projection) fails here long before a
  * benchmark — or a cluster bill — notices. Budgets are raw listener
  * bytes (default shuffle compression), deterministic for a fixed plan
  * and corpus.
  */
class ShuffleBudgetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val dir = "/root/testdata/sf0.01"

  // measured write bytes at sf0.01 (8 threads/partitions), ShuffleProbe:
  private val budgets: Seq[(String, Long)] = Seq(
    "q28_minhash_pairs" -> 137381L,
    "q48_neardup_clusters" -> 303268L,
    "q54_corpus_pipeline" -> 489549L,
    "q56_quality_survivor" -> 311792L,
    "q74_corpus_pipeline_v2" -> 640750L,
    "q77_dup_substrings" -> 2125625L,
    "q78_exact_substr_rewrite" -> 955692L,
    "q125_resample_ffill" -> 970632L,
    "q127_market_basket" -> 1750942L,
    "q135_fuzzy_join" -> 101849L,
    "q136_pagerank" -> 1749436L,
    "q139_weighted_median" -> 683316L,
    "q145_assoc_rules" -> 1756067L,
    "q153_revenue_bridge" -> 82037L)

  for ((name, budget) <- budgets) {
    test(s"$name: shuffle volume within +25% of the reviewed plan's bytes") {
      val fn = graft.SparkEntry.queries(name)
      val stats = graft.tools.ShuffleMeter.measure(spark) {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
      val cap = (budget * 1.25).toLong
      assert(stats.writeBytes <= cap,
        s"$name shuffled ${stats.writeBytes} bytes, reviewed budget $budget (+25% cap $cap) — " +
          "an exchange grew; re-review the plan before re-pinning")
    }
  }
}
