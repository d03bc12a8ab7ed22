package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Results must not depend on how the data is partitioned — the property
  * that lets the same code run on 4 local threads or 1000 executors.
  * Each representative query runs under two deliberately awkward shuffle
  * partition counts (3 and 17: non-divisible, non-power-of-two, different
  * hash boundary layouts) and must produce identical row multisets.
  *
  * Queries whose SEMANTICS are partition-independent by construction
  * (hash gates, aggregate-rejoin argmins, exact percentiles, fixed-point
  * CC) are exactly the ones oracled against DuckDB — this spec pins the
  * same property without an oracle in the loop, so a future operator
  * that sneaks in a first()/monotonically_increasing_id()-style
  * order-dependence fails here even at sf0.001.
  */
class PartitionInvarianceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val dir = "/root/testdata/sf0.001"

  private val probes: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
    "q25_exact_dedup" -> (() => Dedup.q25ExactDedup(spark, dir)),
    "q48_neardup_clusters" -> (() => Dedup.q48NeardupClusters(spark, dir)),
    "q53_tfidf" -> (() => TrainPrep.q53Tfidf(spark, dir)),
    "q60_unigram_lm" -> (() => TextOps.q60UnigramLm(spark, dir)),
    "q62_semdedup" -> (() => Similarity.q62Semdedup(spark, dir)),
    "q72_passage_dedup" -> (() => Dedup.q72PassageDedup(spark, dir)),
    "q73_dsir_sample" -> (() => TrainPrep.q73DsirSample(spark, dir)),
    "q74_corpus_pipeline_v2" -> (() => TrainPrep.q74CorpusPipelineV2(spark, dir)),
    // round-8: the bloom contract (bitset OR + broadcast probe), the MG
    // contract (slot residue varies, the EMITTED booleans/counts must
    // not), and A-ES selection (hash-u + total-order key)
    "q85_bloom_decontam" -> (() => TrainPrep.q85BloomDecontam(spark, dir)),
    "q86_heavy_hitters" -> (() => TextOps.q86HeavyHitters(spark, dir)),
    "q87_weighted_sample" -> (() => TrainPrep.q87WeightedSample(spark, dir)),
    // round-8 second half: the sketch contracts (HLL max-merge, grid
    // histogram vector-add — the emitted bools AND the underlying bytes
    // must not move with partitioning), BM25's integer-sum scores, and
    // the ntile global ranking
    "q93_hll_sketch" -> (() => ScaleOps.q93HllSketch(spark, dir)),
    "q100_hist_sketch" -> (() => ScaleOps.q100HistSketch(spark, dir)),
    "q95_bm25" -> (() => TextOps.q95Bm25(spark, dir)),
    "q102_ntile_hist" -> (() => ScaleOps.q102NtileHist(spark, dir)),
    // round-9: CM grid vector-add, KMV bottom-k set, grid-sketch MAD
    // gate, and bounded-heap stratified selection — all must emit the
    // same rows whatever the exchange layout
    "q118_cm_freq" -> (() => TextOps.q118CmFreq(spark, dir)),
    "q119_kmv_overlap" -> (() => ScaleOps.q119KmvOverlap(spark, dir)),
    "q120_mad_sketch" -> (() => ScaleOps.q120MadSketch(spark, dir)),
    "q121_stratified_sample" -> (() => TrainPrep.q121StratifiedSample(spark, dir))
  )

  private def runAt(parts: Int, fn: () => org.apache.spark.sql.DataFrame): Seq[String] = {
    // AQE off: its partition coalescing would converge the 3- and 17-
    // partition runs to near-identical physical layouts at sf0.001,
    // hollowing out the property this spec exists to pin
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try fn().collect().map(_.toString).sorted.toSeq
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  for ((name, fn) <- probes)
    test(s"$name: identical results at 3 and 17 shuffle partitions") {
      val a = runAt(3, fn)
      val b = runAt(17, fn)
      assert(a.nonEmpty, s"$name returned no rows at sf0.001")
      assert(a == b, s"$name diverges across partition layouts")
    }
}
