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
    // re-pinned round 11: the cleaned corpus (shared passage-dedup
    // frame) and the rebuilt-text DSIR score table are cached stages, so
    // steady state shuffles only the rebuild join, threshold broadcast,
    // selection semi join, and pack window rows
    "q74_corpus_pipeline_v2" -> 16107L,
    // re-pinned round 10 (twice): two-long window fingerprints, then the
    // (fp, doc) window table and the q78 first-occurrence table moved
    // into frameCached indexes — steady state shuffles only the per-doc
    // rollup (q77) / span assembly (q78), never the fingerprint stream
    "q77_dup_substrings" -> 46265L,
    "q78_exact_substr_rewrite" -> 216639L,
    // re-pinned round 17: the r16 in-row gap explode (lead(hb) spans
    // carry fill values) deleted the grid aggregate + left join + running
    // last_value window — bytes dropped 970632 → 389764 (the under-half
    // tightness assert fired; plan reviewed, 8→6 Exchange per
    // plans/r16/q125_*)
    "q125_resample_ffill" -> 389764L,
    // Basket family (q127/q136/q145) re-pinned twice in round 10. First:
    // the collect_set basket build (ObjectHashAggregate — non-codegen,
    // boxed sets, sort-based fallback at scale; 73 task-cpu-s at sf1p)
    // was replaced by a ranked co-partitioned self-join — bytes-vs-CPU
    // trade reviewed and ACCEPTED. Second: exchange-reuse sharing broke
    // at the deployment broadcast threshold (the pipeline re-executed
    // per branch at sf1p), so the item/ranked/item-count streams moved
    // into eagerly-persisted frameCached caches; STEADY-STATE bytes are
    // now just the support-floored pair exchange (the one shuffle that
    // must exist in distributed pair counting). The warm pass above is
    // what makes these pins measure steady state.
    "q127_market_basket" -> 1179068L,
    "q135_fuzzy_join" -> 101849L,
    // re-pinned round 11: the cached v-partitioned edge list (r10 final
    // commit) made power iterations exchange-free — steady state shuffles
    // only the tiny rank/deg rollups that feed each iteration's broadcast
    "q136_pagerank" -> 12731L,
    // re-pinned round 11 (twice): first the native weighted_median
    // aggregate replaced the window pair (847268 — the one raw-row
    // repartition), then the part-grain fact projection moved that
    // exchange into the once-per-dataset fact_by_part cache build —
    // steady state shuffled only the per-part result structs into the
    // final sort, and in round 12 THAT exchange went too: fact_by_part
    // is RANGE(p)-clustered, so the aggregate fuses in-stage and the
    // presentation sort is in-partition on the cache's own layout.
    // Steady state is now exchange-FREE. q147/q152 pinned below ride
    // the same cache discipline.
    "q139_weighted_median" -> 0L,
    "q147_abc_class" -> 62017L,
    // q152 steady state = the (priority, lat_days) grid collapse: the
    // grid is CALENDAR-bounded (priorities × latency-day span, 19.5k at
    // sf0.01 and saturating there), so the partial-agg exchange is
    // grid×tasks, never line-grain — the line-grain join lives in the
    // ship_latency_facts cache build
    "q152_ship_latency" -> 747768L,
    "q145_assoc_rules" -> 1179068L,
    // re-pinned round 10: the part-clustered bridge projection absorbs
    // the fact exchange into a once-per-dataset cache build; steady
    // state shuffles only the brand rollup
    "q153_revenue_bridge" -> 16725L,
    // pinned round 13 (re-pinned on the okey-clustered fact view): the
    // bloom-literal filter and the (flag, okey) cell aggregate fuse
    // in-stage on factByOrder's partitioning, so steady state shuffles
    // ONLY the urgent-key artifact projection into the shuffle-hash semi
    // (plus the |flags|-row partials)
    "q94_bloom_join" -> 20428L,
    // pinned round 13 (re-pinned on the clustered views): uniqueness =
    // catalog row-count/NDV constants, the orders pass is exchange-free,
    // and the lineitem cells meet the co-partitioned orders view with no
    // exchange on either side — steady state shuffles only final 1-row
    // partials
    // re-pinned round 17 (bisected to r16's final-sort sweep 891997e):
    // the 7-row orderBy(check_name) — a range exchange whose sampling
    // pass re-ran the whole pipeline — became presentSorted =
    // repartition(1): same 7 rows, but the round-robin single-partition
    // exchange serializes them ~320 bytes heavier than the old range
    // rows. Not a scale regression (bytes stay O(checks), the sampling
    // re-execution is gone); the over-cap assert fired on the format
    // change, not on a grown exchange.
    "q109_quality_checks" -> 889L,
    // pinned round 13: the fact-fact join rides the co-partitioned views
    // (zero exchange); steady state shuffles customer-join + rollup
    // partials only
    "q6_join_dims" -> 3649L,
    // pinned round 13: conditional-aggregate pivot fused on the view's
    // clustering; the only exchange is the in-partition presentation sort
    "q20_wide_materials" -> 0L,
    // pinned round 17 after the r16 restructures (VERDICT r16 #1): q52's
    // in-row shingle hashing (Window 6→0) and q111's conditional
    // half-means (16→8 Exchange, centroid self-join gone)
    "q52_contamination" -> 91022L,
    "q111_embedding_drift" -> 337648L)

  for ((name, budget) <- budgets) {
    test(s"$name: shuffle volume within +25% of the reviewed plan's bytes") {
      val fn = graft.SparkEntry.queries(name)
      // warm once so queries with build-once/probe-many caches
      // (frameCached / ArtifactStore) measure their STEADY-STATE bytes —
      // the regression-relevant number, independent of test order; plain
      // queries shuffle identical bytes warm or cold
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val stats = graft.tools.ShuffleMeter.measure(spark) {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
      val cap = (budget * 1.25).toLong
      assert(stats.writeBytes <= cap,
        s"$name shuffled ${stats.writeBytes} bytes, reviewed budget $budget (+25% cap $cap) — " +
          "an exchange grew; re-review the plan before re-pinning")
      assert(stats.writeBytes * 2 >= budget,
        s"$name shuffled ${stats.writeBytes} bytes, under HALF the reviewed budget $budget — " +
          "the plan improved; re-pin so the gate stays tight")
    }
  }
}
