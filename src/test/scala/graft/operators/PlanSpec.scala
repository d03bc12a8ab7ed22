package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression tests: the physical plans the optimizer picks
  * must keep the properties that make these queries scale — filters and
  * projections reaching the parquet scan, small dimensions broadcast,
  * window/agg stages whole-stage-codegen'd, no cartesian products.
  * If a refactor silently degrades a plan (e.g. a filter stops pushing
  * down), these assertions catch it before a benchmark does.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q2: filter and projection reach the parquet scan") {
    val p = plan(Relational.q2TopK(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), Not(EqualTo(o_orderstatus,F))]"),
      s"filter not pushed:\n$p")
    // only the 4 needed columns are read, not the 6-column table
    assert(p.contains("ReadSchema") &&
      !p.contains("o_orderdate") && !p.contains("o_custkey"), s"columns not pruned:\n$p")
  }

  test("q6: dimension tables join via broadcast, no cartesian product") {
    val p = plan(Relational.q6JoinDims(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
  }

  test("q1: aggregation is map-side partial and codegen'd") {
    val df = Relational.q1Agg(spark, dir)
    df.collect() // execute THIS plan so AQE finalizes and codegen ids materialize
    val p = plan(df)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("codegen id"), s"no codegen span:\n$p")
  }

  test("q8: anti join stays a join, not a filter-after-collect") {
    val p = plan(Relational.q8Anti(spark, dir))
    assert(p.contains("LeftAnti"), p)
  }

  test("q27: native signature expression participates in codegen") {
    val df = Dedup.q27MinhashSig(spark, dir)
    df.collect() // execute THIS plan so AQE finalizes and codegen ids materialize
    val p = plan(df)
    assert(p.contains("minhash_sig"), s"native expression absent:\n$p")
    assert(p.contains("codegen id"), s"no codegen span:\n$p")
  }

  test("q30: corpus side is not shuffled — the query set broadcasts") {
    val p = plan(Similarity.q30CosineTopK(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$p")
    // the prefilter ranking window must rank narrow (qid, vid, fsim) rows,
    // not rows still carrying the 64-float arrays (same pressure-cliff
    // argument as q32)
    val lines = p.linesIterator.toVector
    val wIdx = lines.indexWhere(l => l.contains("row_number") && l.contains("fsim"))
    assert(wIdx > 0, s"no fsim ranking window found:\n$p")
    val inputLine = lines.take(wIdx).reverse.find(_.trim.startsWith("Input"))
    assert(inputLine.exists(!_.contains("embedding")),
      s"prefilter window still carries embedding arrays ($inputLine):\n$p")
  }

  test("q26/q28: the shingle/signature pipeline runs ONCE (no self-join double evaluation)") {
    // the hot stage starts at the shingle explode (Generate posexplode);
    // the round-1 self-join shape instantiated the whole pipeline once per
    // join side. Since round 4 the shingle/signature work is IN-ROW
    // (native shingle_hashes / minhash_sig) — the plans must contain the
    // native expression and NO word-explode at all (a posexplode over
    // split(...) means the pipeline regressed to the shuffled shape)
    def wordExplodes(p: String): Int =
      p.linesIterator.count(l => l.contains("Generate posexplode") && l.contains("split"))
    val p26 = Dedup.q26ShingleJaccard(spark, dir).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    val p28 = Dedup.q28MinhashPairs(spark, dir).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    assert(wordExplodes(p26) == 0, s"q26 explodes words (in-row shingling regressed):\n$p26")
    assert(wordExplodes(p28) == 0, s"q28 explodes words (in-row shingling regressed):\n$p28")
    assert(p26.contains("shingle_hashes"), s"q26 missing native shingle_hashes:\n$p26")
    assert(p28.contains("minhash_sig"), s"q28 missing native minhash_sig:\n$p28")
    // q40's signature build is in-row since round 4 (ddot against
    // hyperplane literals): the plan must contain NO embedding posexplode
    // at all — candidates expand from posting lists, not a sig self-join
    val p40 = Similarity.q40LshAnn(spark, dir).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    val n40 = p40.linesIterator.count(l =>
      l.contains("Generate posexplode") && l.contains("embedding"))
    assert(n40 == 0, s"q40 explodes embedding elements $n40× (sig build regressed to the join formulation)")
  }

  test("q43: image encode/decode fans out — no single-partition mapPartitions") {
    // (the final orderBy may AQE-coalesce to 1; the decode stage itself
    // must run parallel)
    assert(Multimodal.jpegTable(spark, dir).rdd.getNumPartitions > 1,
      "decode stage runs on a single partition")
  }

  test("chess explodes carry explicit ordinals (posexplode, not row order)") {
    val p = plan(ChessQueries.qc40Moves(spark, dir))
    assert(p.toLowerCase.contains("generate"), p)
    assert(p.contains("pos"), p)
  }

  test("q37: chooser picks broadcast at test scale — no salt, no fact shuffle on the key") {
    // the per-user dim fits the session's broadcast threshold, so the
    // adaptive spelling must plan a broadcast probe (Spark's first line
    // of skew defense), not the former pinned ×8 salt
    val p = plan(ScaleOps.q37DimJoinAdaptive(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
    assert(!p.contains("salt"), s"salt column present — chooser salted a broadcastable dim:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dim not broadcast:\n$p")
  }

  test("q32: centroids broadcast; the assignment window ranks narrow rows") {
    // q32's end plan now PROBES a persisted ArtifactStore index; the
    // build-plan properties are asserted on the builder itself
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = graft.Tables.spread(graft.Tables.embeddings(spark, dir))
      .select($"vec_id", $"embedding",
        expr("aggregate(embedding, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))").as("nn"))
    val centroids = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("cid"), $"embedding".as("ce"), $"nn".as("cn"))
    val p = plan(Similarity.buildIvfIndex(emb, centroids))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"centroid set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
    // the prefilter window must rank (vec_id, cid, fcsim) rows, not rows
    // still carrying the 64-float embedding arrays: find the ranking
    // operator's detail block and check its Input row list is narrow
    val lines = p.linesIterator.toVector
    val wIdx = lines.indexWhere(l => l.contains("row_number") && l.contains("fcsim"))
    assert(wIdx > 0, s"no fcsim ranking window found:\n$p")
    val inputLine = lines.take(wIdx).reverse.find(_.trim.startsWith("Input"))
    assert(inputLine.exists(!_.contains("embedding")),
      s"assignment window still carries embedding arrays ($inputLine):\n$p")
    // and the probe-side plan reads the persisted index, never the builder
    val probe = plan(Similarity.q32IvfAnn(spark, dir))
    assert(!probe.contains("fcsim"),
      s"q32 still rebuilds the IVF index inline instead of probing the artifact:\n$probe")
  }

  test("q40: signature pass is shuffle-free (hyperplanes are in-row literals)") {
    val p = plan(Similarity.q40LshAnn(spark, dir))
    // the signature build must contribute no join and no aggregate — the
    // native ddot_native calls against hyperplane literals are the whole
    // pass; the only wide ops left belong to bucketing + rerank
    assert(p.contains("ddot_native") || p.contains("fdot_native"),
      s"native dot product absent from signature pass:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
  }

  test("q59/q60: repetition is shuffle-free; the q60 token stream is doc_id-keyed") {
    // q59: the native repetition_stats expression does the whole job in-row
    // — no hash exchange anywhere (only the repartition + result sort)
    val p59 = plan(TextOps.q59Repetition(spark, dir))
    assert(p59.contains("repetition_stats"), s"native expression absent:\n$p59")
    assert(!p59.linesIterator.exists(_.contains("hashpartitioning(")),
      s"unexpected shuffle in the in-row plan:\n$p59")
    // q60: tokens collapse to tf rows on the doc_id exchange; only tf rows
    // may shuffle again (by word for the corpus-count window) — nothing is
    // ever round-robin'd or collapsed to one partition besides the scalar
    // token total
    val p60 = plan(TextOps.q60UnigramLm(spark, dir))
    val hp60 = p60.linesIterator.filter(_.contains("hashpartitioning(")).toSeq
    assert(hp60.nonEmpty &&
      hp60.forall(l => l.contains("doc_id") || l.contains("word")),
      s"unexpected exchange keys:\n$p60")
    // q60's only round-robin would be of exploded tokens — its input
    // repartition is BY doc_id; q59's round-robin is the raw-document
    // parallelism restore, upstream of the in-row pass, and is fine
    assert(!p60.contains("RoundRobinPartitioning"),
      s"round-robin of the token stream:\n$p60")
    for (p <- Seq(p59, p60))
      assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
  }

  test("q53/q60: no window partitioned by a raw token column; raw shuffle reused") {
    // a Window over `word` materializes every row of a Zipf-head token in
    // one task — corpus counts must be groupBy(word) aggregates (map-side
    // combine) joined back, with the raw-document shuffle shared via
    // ReuseExchange (visible only in the AQE-finalized plan → collect first)
    for ((name, df) <- Seq(
        "q53" -> TrainPrep.q53Tfidf(spark, dir),
        "q60" -> TextOps.q60UnigramLm(spark, dir))) {
      df.collect()
      val p = plan(df)
      assert(!p.contains("windowspecdefinition(word"),
        s"$name windows over the token column:\n$p")
      // q53's tf table is a frameCached word-partitioned index (both
      // branches read the cache); q60 (r12) probes the text_index
      // artifact — cf rides the postings, so the plan must contain NO
      // tokenize (explode) and no raw-document branch at all
      if (name == "q53")
        assert(p.contains("InMemoryTableScan"),
          s"$name no longer reads the cached tf index:\n$p")
      else {
        assert(!p.contains("explode"),
          s"$name re-tokenizes instead of probing the text index:\n$p")
        assert(p.contains("Scan parquet"),
          s"$name does not scan the persisted index artifact:\n$p")
      }
    }
  }

  test("q61: pair roles broadcast into the single shingle-set pass") {
    val p = plan(Dedup.q61Containment(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"roles did not broadcast:\n$p")
    // exactly one shingle_hashes pass over the corpus — the pair sides are
    // reunited from roles, not by instantiating the doc pipeline per side
    val passes = p.linesIterator.count(_.contains("shingle_hashes"))
    assert(passes <= 2, s"shingle pipeline instantiated $passes times:\n$p") // project + scan lines
    assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
  }

  test("q62: centroids broadcast; no global pair join outside the cells") {
    val p = plan(Similarity.q62Semdedup(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"centroid set did not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
  }

  test("q63: corpus keep-filter is a broadcast join — the documents never shuffle") {
    val p = plan(TrainPrep.q63DomainMix(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"thresholds did not broadcast:\n$p")
    // the only hash exchanges belong to the tiny strata rollup, never keyed
    // on doc_id
    assert(!p.contains("hashpartitioning(doc_id"),
      s"corpus shuffled on doc_id:\n$p")
  }

  test("q67/q68/q69: manifest join keys on doc_id; classifier weights ride in-plan") {
    // q67: the diff is a doc_id-keyed join of two manifest projections
    val p67 = plan(TrainPrep.q67SnapshotDiff(spark, dir))
    assert(p67.contains("FullOuter"), s"diff lost its full-outer join:\n$p67")
    assert(!p67.contains("CartesianProduct"), s"cartesian product present:\n$p67")
    // q68: one fingerprint window + rollup — exchanges key on fp or the
    // domain columns only
    val p68 = plan(TrainPrep.q68CorpusHealth(spark, dir))
    val hp68 = p68.linesIterator.filter(_.contains("hashpartitioning(")).toSeq
    assert(hp68.nonEmpty && hp68.forall(l => l.contains("fp") || l.contains("lang")),
      s"unexpected exchange keys:\n$p68")
    // q69: no join anywhere — the weight vector is an in-plan literal,
    // and the token stream shuffles on doc_id only
    val p69 = plan(TextOps.q69HashClassifier(spark, dir))
    assert(!p69.contains("Join"), s"classifier should be join-free:\n$p69")
    val hp69 = p69.linesIterator.filter(_.contains("hashpartitioning(")).toSeq
    assert(hp69.nonEmpty && hp69.forall(_.contains("doc_id")),
      s"token stream not doc_id-partitioned:\n$p69")
  }

  test("q48/q56: no window partitioned by the cluster key (mega-component safety)") {
    // cluster_size / survivor selection must be map-side-combining
    // aggregates joined back — a window over rep_doc_id/cluster_id puts a
    // degenerate half-corpus component into one task
    val p48 = plan(Dedup.q48NeardupClusters(spark, dir))
    assert(!p48.contains("windowspecdefinition(rep_doc_id") &&
      !p48.contains("windowspecdefinition(label"),
      s"q48 windows over the cluster key:\n$p48")
    val p56 = plan(TrainPrep.q56QualitySurvivor(spark, dir))
    assert(!p56.contains("windowspecdefinition(cluster_id"),
      s"q56 windows over the cluster key:\n$p56")
  }

  test("spread: round-robin parallelism restore is skipped for multi-split inputs") {
    // single parquet file → fan out to the core count (the local test
    // shape); an input that already scans wide must NOT get the extra
    // exchange (the production shape — 100 TB arrives in thousands of
    // splits)
    val single = graft.Tables.documents(spark, dir)
    val pSingle = plan(graft.Tables.spread(single))
    assert(pSingle.contains("RoundRobinPartitioning"),
      s"single-split input must fan out:\n$pSingle")
    val multiPath = "target/planspec_multisplit"
    graft.Tables.documents(spark, dir).repartition(16)
      .write.mode("overwrite").parquet(multiPath)
    val multi = spark.read.parquet(multiPath)
    assert(multi.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
    val pMulti = plan(graft.Tables.spread(multi))
    assert(!pMulti.contains("RoundRobinPartitioning"),
      s"multi-split input still round-robins:\n$pMulti")
    // keyed sibling: the corpus pipelines' doc_id clustering obeys the
    // same gate — single-file local input hash-clusters on the key,
    // a production-shaped wide input skips the full-corpus shuffle
    val pKeySingle = plan(graft.Tables.spreadBy(single, "doc_id"))
    assert(pKeySingle.contains("hashpartitioning(doc_id"),
      s"single-split input must hash-cluster on the key:\n$pKeySingle")
    val pKeyMulti = plan(graft.Tables.spreadBy(multi, "doc_id"))
    assert(!pKeyMulti.contains("hashpartitioning(doc_id"),
      s"wide input still pays the keyed corpus shuffle:\n$pKeyMulti")
    // and the gated pipelines keep identical results either way
    val viaSingle = TrainPrep.q53Tfidf(spark, dir).collect().map(_.toString).sorted.toSeq
    val multiDir = "target/planspec_multisplit_dir"
    for (t <- Seq("documents")) spark.read.parquet(s"$dir/$t.parquet")
      .repartition(16).write.mode("overwrite").parquet(s"$multiDir/$t.parquet")
    val viaMulti = TrainPrep.q53Tfidf(spark, multiDir).collect().map(_.toString).sorted.toSeq
    assert(viaSingle == viaMulti, "q53 diverges when the keyed spread is skipped")
  }

  test("dsirSample: scale default thresholds via mergeable sketch, exact only for the oracle pin") {
    val docs = graft.Tables.documents(spark, dir)
    // production default: the per-language cutoff is a mergeable
    // approx_percentile sketch — no aggregate buffers a full stratum
    val p = plan(TrainPrep.dsirSample(docs))
    assert(p.contains("approx_percentile"), s"sketch aggregate absent:\n$p")
    assert(!p.replace("approx_percentile", "").contains("percentile("),
      s"exact percentile (full-stratum buffer) in the scale path:\n$p")
    // oracle mode keeps the exact interpolated percentile
    val pe = plan(TrainPrep.dsirSample(docs, exactThreshold = true))
    assert(pe.replace("approx_percentile", "").contains("percentile("),
      s"oracle pin lost the exact percentile:\n$pe")
  }

  test("q64: gate joins the bucket index on fixed-width band keys") {
    // the index side is now the persisted ArtifactStore parquet: a small
    // index BROADCASTS to the batch's band rows (the ideal probe plan —
    // the batch side never shuffles); a large one falls back to a
    // band-keyed shuffle join. Either way the join is equi-keyed, never
    // a cartesian.
    val p = plan(Dedup.q64DedupGate(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.linesIterator.exists(l =>
      l.contains("hashpartitioning(band") || l.contains("hashpartitioning(r0")),
      s"bucket join neither broadcast nor keyed on band columns:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
  }

  test("q121: stratified selection is a bounded-heap aggregate — no Window, no per-stratum sort") {
    val p = plan(TrainPrep.q121StratifiedSample(spark, dir))
    assert(!p.contains("Window"), s"selection regressed to a window sort:\n$p")
    assert(p.contains("bounded_top_k"), s"bounded top-k aggregate absent:\n$p")
    // the only Sort is the final display orderBy, above the aggregate
    assert(p.linesIterator.count(_.trim.startsWith("Sort ")) <= 1,
      s"extra sort below the selection:\n$p")
  }

  test("q120: the gate is one joinless events pass — cutoffs are baked-in literals") {
    // r13: the four cutoff statistics are scalarCached constants, so the
    // steady-state plan must contain NO join at all (the former pin
    // asserted the cutoff join was at least broadcast; now it is gone)
    // and no stratum-sized exchange of raw values — the only exchange
    // is the per-type gate rollup
    val p = plan(ScaleOps.q120MadSketch(spark, dir))
    assert(!p.contains("Join"), s"a join crept back into the gate pass:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
  }

  test("q126: corpus totals reuse the aggregated streams' exchanges (two explodes, not four)") {
    // reuse is visible only in the AQE-finalized plan → collect first
    // (the q53/q60 convention)
    val df = TextOps.q126PmiCollocations(spark, dir)
    df.collect()
    val p = plan(df)
    // the token/bigram totals must NOT re-explode the corpus: the t/b
    // scalars consume the ucnt/pcntAll shuffles through ReusedExchange —
    // count in the FINAL AQE plan only (the formatted string repeats
    // every node in its "== Initial Plan ==" section)
    val fin = p.split("== Initial Plan ==")(0)
    assert(fin.contains("ReusedExchange"), s"totals re-explode the corpus:\n$fin")
    assert(fin.linesIterator.count(_.contains(" Generate ")) <= 2,
      s"more than two corpus explodes:\n$fin")
  }

  test("q127: codegen pair self-join — fact scanned once via checkpoint, no object agg, no cartesian") {
    val df = ScaleOps.q127MarketBasket(spark, dir)
    df.collect()
    val p = plan(df)
    // every consumer branch (pair fan-out ×2, item counts ×2, order
    // count) reads the MATERIALIZED item/ranked caches (frameCached) —
    // exchange reuse broke the moment one branch crossed the broadcast
    // threshold (the scan→distinct→rank pipeline re-executed 4× at
    // sf1p); the cache is the sharing that survives strategy changes
    assert(p.contains("InMemoryTableScan"),
      s"the basket family no longer reads the materialized caches:\n$p")
    // the pair self-join runs on the cache's hash(ok) partitioning and
    // (ok, pk) ordering: a merge join with NO consumer-added ok exchange
    // (the only hashpartitioning(ok...) line allowed is the
    // REPARTITION_BY_COL inside the printed cache definition) and no
    // fact-sized broadcast
    // formatted node detail blocks: "(n) NodeName\nLeft keys [1]: ..."
    val blocks = p.split("\n\n")
    assert(blocks.exists(b =>
        b.contains("SortMergeJoin") && b.contains("Left keys [1]: [ok#")),
      s"the pair self-join is not the zero-exchange merge join:\n$p")
    // no ok-keyed broadcast join anywhere — that would be a fact-sized
    // broadcast side of the pair self-join
    assert(!blocks.exists(b =>
        b.contains("BroadcastHashJoin") && b.contains("keys [1]: [ok#")),
      s"a fact-sized side of the pair self-join is broadcast:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("hashpartitioning(ok") &&
          l.contains("ENSURE_REQUIREMENTS")),
      s"a consumer re-shuffles the cached stream on ok:\n$p")
    // the basket family must stay whole-stage codegen: the former
    // collect_set build planned as ObjectHashAggregate (boxed per-group
    // sets + sort-based fallback at scale)
    assert(!p.contains("ObjectHashAggregate"), s"object agg crept back:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian present:\n$p")
  }

  test("q128: the fusion never shuffles the corpus — candidates broadcast to the quality scan") {
    val p = plan(TextOps.q128RrfFusion(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"candidate join not broadcast:\n$p")
  }

  test("q119: sketches and exact audit ride one hash-keyed aggregate, no join between corpora") {
    val df = ScaleOps.q119KmvOverlap(spark, dir)
    val p = plan(df)
    // the overlap answer involves NO join at all: one groupBy(h) pass
    // then a single global aggregate
    assert(!p.contains("Join"), s"a join crept into the sketch-overlap plan:\n$p")
  }

  test("q93/q117/q36: no Expand — countDistinct never rides beside a sketch aggregate") {
    // the round-11 pathology: a distinct aggregate BESIDE an imperative
    // sketch plans through Expand with the sketch partial evaluated per
    // (group, user) pair — one 4 KB register array per distinct user.
    // The pre-distinct spelling must keep Expand out of all three plans.
    for (q <- Seq(ScaleOps.q93HllSketch _, ScaleOps.q117IncrAgg _,
        ScaleOps.q36ApproxDistinct _)) {
      val p = plan(q(spark, dir))
      assert(!p.contains("Expand"),
        s"mixed-distinct Expand machinery crept back:\n$p")
    }
  }

  test("q139: one native weighted_median aggregate — no window pair, no object-agg fallback trigger") {
    val p = plan(ScaleOps.q139WeightedMedian(spark, dir))
    assert(p.contains("weighted_median"), s"native aggregate missing:\n$p")
    assert(!p.contains("Window"), s"the window pair crept back:\n$p")
  }

  test("q147: ONE WindowExec computes cum and total; no second revenue subtree") {
    val p = plan(ScaleOps.q147AbcClass(spark, dir))
    val windows = p.linesIterator.count(_.trim.startsWith("Window"))
    assert(windows <= 2, // formatted mode lists the operator + its detail section
      s"the brand total must ride the same WindowExec as the cumulative:\n$p")
    // the revenue aggregate reads the persisted part_rev artifact, so no
    // lineitem scan appears anywhere in the steady-state plan
    assert(!p.contains("lineitem"), s"a fact scan crept into the ride:\n$p")
  }

  test("q152: the order join lives in the cached view build as shuffle-hash, never broadcast") {
    val p = ScaleOps.q152ShipLatency(spark, dir).queryExecution.executedPlan.toString
    // the InMemoryRelation subtree records the build plan: the orderkey
    // equi-join must be shuffle-hash (a broadcast side would grow with
    // the fact table — the q9 anti-pattern this round removed)
    assert(p.contains("ShuffledHashJoin"), s"build join is not shuffle-hash:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"a corpus-sized broadcast crept back:\n$p")
  }

  test("similarity probes: the corpus embedding table is never the broadcast build side") {
    // regression pin for the round-11 fix: an un-hinted candidate ⋈ corpus
    // join broadcast the whole embedding projection (driver-side build
    // growing with the corpus). Every BroadcastExchange subtree that
    // touches the embeddings table must carry the query-side vec_id
    // pushdown; the full-corpus scan stays outside broadcast subtrees.
    for (q <- Seq(Similarity.q30CosineTopK _, Similarity.q40LshAnn _,
        Similarity.q32IvfAnn _)) {
      val p = q(spark, dir).queryExecution.executedPlan.toString
      val segs = p.split("BroadcastExchange").drop(1)
      segs.foreach { seg =>
        // within a broadcast subtree, an embeddings FileScan is legal only
        // for the filtered query rows (pushdown visible in the scan)
        val upToNextExchange = seg.split("Exchange hashpartitioning").head
        if (upToNextExchange.contains("embeddings") ||
            upToNextExchange.contains("embedding#")) {
          assert(upToNextExchange.contains("LessThan(vec_id") ||
            upToNextExchange.contains("vec_id#") && upToNextExchange.contains("< 10"),
            s"a corpus-sized embedding relation is broadcast:\n$p")
        }
      }
    }
  }
}
