package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q48 near-dup cluster resolution: connected components over the LSH pair
  * graph, and the scale shape of the per-iteration step (frontier messages
  * only; edges read from cache, never recomputed).
  */
class DedupClusterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private def edges(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("u", "v")
  }

  test("q61 shuffle-join fallback (broadcast thresholds off) matches the default AQE path") {
    // with all broadcast thresholds disabled the roles join must run as a
    // doc_id shuffle join — the shape a too-large pair list gets at scale
    // when AQE's measured size exceeds the threshold — with results
    // identical to the default path (where AQE may broadcast)
    val dir = "/root/testdata/sf0.001"
    val viaDefault = Dedup.q61Containment(spark, dir).collect()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Dedup.q61Containment(spark, dir)
      // no broadcast HINT may survive on any join — the plan is un-hinted
      // and the broadcast-or-shuffle choice belongs to AQE at runtime
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val hinted = df.queryExecution.optimizedPlan.collect {
        case j: Join if j.hint.leftHint.nonEmpty || j.hint.rightHint.nonEmpty => j
      }
      assert(hinted.isEmpty, s"reunitePairs hints a join side: $hinted")
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.linesIterator.exists(l => l.contains("hashpartitioning(doc_id")),
        s"roles join did not shuffle on doc_id:\n$p")
      val viaShuffle = df.collect()
      assert(viaShuffle.map(_.toString).sorted.toSeq ==
        viaDefault.map(_.toString).sorted.toSeq,
        "shuffle-join fallback diverges from the default path")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("q61/q66 compose lazily: construction executes no computation job") {
    val dir = "/root/testdata/sf0.001"
    val sc = spark.sparkContext
    // job groups are thread-local, so jobs triggered DURING construction
    // (the round-6 eager size gate's localCheckpoint+count) would land in
    // the construct group; the action group is the async-delivery control.
    // A bare spark.read.parquet itself submits one single-stage footer
    // job per path, so "lazy" here means: nothing beyond those scans —
    // no multi-stage job (the eager count over the band pipeline had
    // several shuffle stages) may run before the first action.
    sc.setJobGroup("construct-probe", "q61/q66 plan construction")
    val df61 = Dedup.q61Containment(spark, dir)
    val df66 = Dedup.q66SketchCalibration(spark, dir)
    sc.clearJobGroup()
    sc.setJobGroup("action-probe", "first action")
    assert(df61.collect().nonEmpty && df66.collect().nonEmpty)
    sc.clearJobGroup()
    val tracker = sc.statusTracker
    val deadline = System.currentTimeMillis + 10000
    while (tracker.getJobIdsForGroup("action-probe").isEmpty &&
        System.currentTimeMillis < deadline)
      Thread.sleep(50)
    assert(tracker.getJobIdsForGroup("action-probe").nonEmpty,
      "status tracker never saw the action's jobs (probe broken)")
    val constructJobs = tracker.getJobIdsForGroup("construct-probe")
    val multiStage = constructJobs.flatMap(id => tracker.getJobInfo(id))
      .filter(_.stageIds.length > 1)
    assert(multiStage.isEmpty,
      s"constructing q61/q66 executed a multi-stage job (eager-gate regression): " +
        s"${multiStage.map(j => s"job ${j.jobId()} stages ${j.stageIds.mkString(",")}").mkString("; ")}")
    assert(constructJobs.length <= 4,
      s"construction submitted ${constructJobs.length} jobs — more than the input footer scans")
  }

  test("degenerate corpus: one bucket holding 50% of docs completes with correct sizes") {
    import spark.implicits._
    // 100 docs; docs 0..49 share ONE bucket (the pathological mega-bucket
    // a duplicated-content crawl produces), the rest are singletons
    val bands = ((0L until 50L).map(d => ("hot", 0L, 0L, d)) ++
      (50L until 100L).map(d => (s"b$d", d, d, d)))
      .toDF("band", "r0", "r1", "doc_id")
    val cc = Dedup.membershipComponents(bands, Seq("band", "r0", "r1"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 50L).forall(cc(_) == 0L), "mega-bucket not fully merged")
    // singleton-bucket docs either label themselves or are absent (q48
    // coalesces absent nodes to their own id)
    assert((50L until 100L).forall(d => cc.getOrElse(d, d) == d),
      "singletons mislabeled")
    // the q48 size aggregation over these labels: groupBy combines
    // map-side, so the mega-cluster collapses to one row per map
    // partition before the shuffle
    val labeled = (0L until 100L).map(d => (d, if (d < 50) 0L else d))
      .toDF("doc_id", "rep_doc_id")
    val sizes = labeled.groupBy($"rep_doc_id").agg(count(lit(1)).as("cluster_size"))
    val out = labeled.join(sizes, Seq("rep_doc_id")).collect()
    assert(out.length == 100 &&
      out.forall(r => r.getLong(2) == (if (r.getLong(0) == 0L) 50L else 1L)))
  }

  test("q64 == gateAgainst(parquet round-trip of buildBandIndex)") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val idx = Dedup.buildBandIndex(docs.filter(col("doc_id") % 3 =!= 0))
    val path = "target/band_index_rt"
    idx.write.mode("overwrite").parquet(path)
    val viaIndex = Dedup
      .gateAgainst(spark.read.parquet(path), docs.filter(col("doc_id") % 3 === 0))
      .orderBy("doc_id").collect()
    val inline = Dedup.q64DedupGate(spark, dir).collect()
    assert(viaIndex.map(_.toString).toSeq == inline.map(_.toString).toSeq,
      "persisted-index gate diverges from the inline q64")
    assert(inline.nonEmpty)
  }

  test("gateAgainst admits signature-less (<3 token) batch docs explicitly") {
    import spark.implicits._
    val ref = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val batch = Seq(
      (2L, "tiny doc"), // <3 tokens → no shingles, no bands
      (3L, "alpha beta gamma delta epsilon"), // exact near-dup of ref
      (4L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val out = Dedup.gateAgainst(Dedup.buildBandIndex(ref), batch)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(2L) == ((0L, true)), "signature-less doc must be admitted with 0 hot bands")
    assert(out(3L)._1 > 0L && !out(3L)._2, "near-dup of the reference must be held back")
    assert(out(4L) == ((0L, true)), "novel doc must be admitted")
  }

  test("two components and an isolated pair resolve to min-id labels") {
    val cc = Dedup.connectedComponents(edges(1L -> 2L, 2L -> 3L, 10L -> 11L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a 20-node chain converges to one component (diameter > 1 iteration)") {
    val chain = edges((0L until 19L).map(i => i -> (i + 1)): _*)
    val cc = Dedup.connectedComponents(chain).collect()
    assert(cc.length == 20 && cc.forall(_.getLong(1) == 0L))
  }

  test("ccStep shuffles only narrow label rows and never recomputes the edge pipeline") {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val sym = edges(1L -> 2L, 2L -> 3L).repartition($"u")
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    val labels = sym.select($"u".as("node")).distinct().withColumn("label", $"node")
    val step = Dedup.ccStep(sym, labels, labels)
    assert(step.columns.toSeq == Seq("node", "label", "_moved"),
      "iteration state is not the narrow (node, label, moved) shape")
    val p = step.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(p.contains("InMemoryTableScan"), s"edges not read from cache:\n$p")
    assert(!p.contains("Generate"), s"iteration recomputes an explode pipeline:\n$p")
    sym.unpersist()
  }

  test("membership components == edge components on the expanded pair graph") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // 120 nodes scattered over 40 buckets, multi-membership, some isolated
    val m = (0 until 250).map { _ =>
      (s"b${rng.nextInt(40)}", rng.nextInt(120).toLong)
    }.distinct.toDF("bucket", "node")
    val viaMembership = Dedup.membershipComponents(m, Seq("bucket"), "node")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expand the same connectivity as pairs and run the edge formulation
    val pairs = m.as("x").join(m.as("y"), "bucket")
      .select($"x.node".as("u"), $"y.node".as("v"))
      .filter($"u" < $"v").distinct()
    val viaEdges = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaMembership == viaEdges)
  }

  test("membership components: all-singleton buckets produce no labels (everyone is a singleton)") {
    import spark.implicits._
    val m = (0L until 10L).map(i => (s"solo$i", i)).toDF("bucket", "node")
    assert(Dedup.membershipComponents(m, Seq("bucket"), "node").isEmpty)
  }

  test("membership components: a 20-bucket chain converges (diameter > 1 iteration)") {
    import spark.implicits._
    // node i shares bucket i with node i+1 → one 21-node chain
    val m = (0L until 20L).flatMap(i => Seq((s"c$i", i), (s"c$i", i + 1)))
      .toDF("bucket", "node")
    val cc = Dedup.membershipComponents(m, Seq("bucket"), "node").collect()
    assert(cc.length == 21 && cc.forall(_.getLong(1) == 0L))
  }

  test("q48 is consistent with the q28 pair graph and q25-style survivor semantics") {
    val dir = "/root/testdata/sf0.001"
    val q48 = Dedup.q48NeardupClusters(spark, dir)
    val docs = graft.Tables.documents(spark, dir).count()
    val rows = q48.collect()
    assert(rows.length == docs, "q48 must cover every document")
    val rep = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep.forall { case (d, r) => r <= d }, "rep must be the component minimum")
    // both endpoints of every candidate pair land in the same cluster
    val pairs = Dedup.q28MinhashPairs(spark, dir).collect()
    assert(pairs.forall(p => rep(p.getLong(0)) == rep(p.getLong(1))),
      "a q28 pair straddles two q48 clusters")
    // cluster_size is the rep's member count
    val sizes = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(rows.forall(r => r.getLong(2) == sizes(r.getLong(1))))
  }

  test("q64 gate verdicts replay from the q27 signatures; q28 pairs imply rejection") {
    val dir = "/root/testdata/sf0.001"
    val sigs = Dedup.q27MinhashSig(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getLong(i)))
    val bandsOf = sigs.map { case (id, h) =>
      id -> (0 until 4).map(b => (b, h(2 * b), h(2 * b + 1))).toSet
    }.toMap
    val refBuckets = bandsOf.collect { case (id, bs) if id % 3 != 0 => bs }
      .flatten.toSet
    val out = Dedup.q64DedupGate(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // one verdict per batch doc that HAS a signature
    assert(out.keySet == bandsOf.keySet.filter(_ % 3 == 0))
    out.foreach { case (id, (hot, admitted)) =>
      val expectHot = bandsOf(id).count(refBuckets.contains).toLong
      assert(hot == expectHot && admitted == (expectHot == 0L), s"doc $id")
    }
    // consistency with the pair graph: a batch doc paired with a ref doc
    // in q28 shares a band bucket with it, so the gate must reject it
    Dedup.q28MinhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .foreach { case (a, b) =>
        if (a % 3 == 0 && b % 3 != 0) assert(!out(a)._2, s"pair ($a,$b)")
        if (b % 3 == 0 && a % 3 != 0) assert(!out(b)._2, s"pair ($a,$b)")
      }
  }

  test("q66 estimate replays from the q27 signatures; exact side agrees with q61") {
    val dir = "/root/testdata/sf0.001"
    val sigs = Dedup.q27MinhashSig(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    val q61 = Dedup.q61Containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val out = Dedup.q66SketchCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == q61.keySet, "q66 must cover the q28 candidate set exactly")
    out.foreach { case ((a, b), (est, jac, err)) =>
      val expEst = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 8.0
      assert(est == expEst, s"pair ($a,$b) estimate")
      val (nA, nB, inter) = q61((a, b))
      val expJac = inter.toDouble / (nA + nB - inter)
      assert(math.abs(jac - expJac) < 1e-6, s"pair ($a,$b) exact jaccard")
      assert(math.abs(err - math.abs(est - jac)) < 1e-6, s"pair ($a,$b) error")
    }
  }

  test("q61 rows are exactly the q28 pairs; containment matches a raw-text shingle replay") {
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.q61Containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    val pairs = Dedup.q28MinhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.keySet == pairs, "q61 must cover the q28 candidate set exactly")
    // distinct word-3-gram sets straight from the raw text (no hashing):
    // the 60-bit hash is collision-free on this corpus, so set sizes and
    // intersections must agree with the hashed formulation
    val sh = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map { r =>
        val w = r.getString(1).split(" ", -1)
        r.getLong(0) -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
    out.foreach { case ((a, b), (nA, nB, inter, cA, cB)) =>
      val (sa, sb) = (sh(a), sh(b))
      val i = sa.intersect(sb).size.toLong
      assert(nA == sa.size && nB == sb.size && inter == i, s"pair ($a,$b)")
      assert(math.abs(cA - i.toDouble / sa.size) < 1e-6, s"containment_a ($a,$b)")
      assert(math.abs(cB - i.toDouble / sb.size) < 1e-6, s"containment_b ($a,$b)")
    }
  }

  test("q99: distances equal a plain-Scala Levenshtein over the 120-char prefixes") {
    val dir = "/root/testdata/sf0.001"
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val prefixes = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).take(120)).toMap
    val out = Dedup.q99EditVerify(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val expected = lev(prefixes(a), prefixes(b)).toLong
      assert(r.getLong(2) == expected, s"pair ($a,$b)")
      assert(r.getLong(3) == math.max(prefixes(a).length, prefixes(b).length).toLong)
      assert(r.getBoolean(5) == (r.getDouble(4) <= 0.3))
    }
  }
}
