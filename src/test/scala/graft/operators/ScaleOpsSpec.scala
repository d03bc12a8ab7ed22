package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-corpus semantics for the events-analytics additions (q96
  * gaps-and-islands, q97 cohort retention): the DuckDB gate proves
  * engine parity on the synthetic corpus; these prove the operators do
  * the right thing on data where the interesting structure (broken
  * runs, decaying cohorts) is planted and known.
  */
class ScaleOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val H = 3600000000000L // one hour in nanos
  private val W = 604800000000000L // one week in nanos

  /** Events staged through a temp dir so the operator runs its real read
    * path (`Tables.events` normalizes ts at the boundary).
    */
  private def stage(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scaleops_events").toString
    rows.toDF("event_id", "tsn", "user_id", "event_type", "value", "props")
      .select($"event_id", timestamp_micros(expr("tsn div 1000")).as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q96: runs split exactly at type changes; island stats match the plant") {
    // user 1: view view view | click | view view  → islands 3,1,2
    // user 2: click | view | click                → islands 1,1,1
    val rows = Seq(
      (1L, 1L * H, 1L, "view", 1.0, ""), (2L, 2L * H, 1L, "view", 1.0, ""),
      (3L, 3L * H, 1L, "view", 1.0, ""), (4L, 4L * H, 1L, "click", 1.0, ""),
      (5L, 5L * H, 1L, "view", 1.0, ""), (6L, 6L * H, 1L, "view", 1.0, ""),
      (7L, 1L * H, 2L, "click", 1.0, ""), (8L, 2L * H, 2L, "view", 1.0, ""),
      (9L, 3L * H, 2L, "click", 1.0, ""))
    val out = ScaleOps.q96GapsIslands(spark, stage(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    val us = 3600000000L // hour in micros
    assert(out == Map(
      (1L, 1L) -> (("view", 1 * us, 3 * us, 3)),
      (1L, 2L) -> (("click", 4 * us, 4 * us, 1)),
      (1L, 3L) -> (("view", 5 * us, 6 * us, 2)),
      (2L, 1L) -> (("click", 1 * us, 1 * us, 1)),
      (2L, 2L) -> (("view", 2 * us, 2 * us, 1)),
      (2L, 3L) -> (("click", 3 * us, 3 * us, 1))))
  }

  test("q96: a gapless same-type stream is ONE island regardless of time gaps") {
    val rows = (0 until 5).map(i =>
      ((i + 1).toLong, i.toLong * 50 * H, 7L, "view", 1.0, ""))
    val out = ScaleOps.q96GapsIslands(spark, stage(rows)).collect()
    assert(out.length == 1 && out(0).getInt(5) == 5)
  }

  test("q97: cohorts decay exactly as planted") {
    // cohort week 0: users 1,2,3 — u1 active weeks 0,1,2; u2 weeks 0,1; u3 week 0
    // cohort week 1: user 4 — active weeks 1,3
    def ev(id: Long, week: Long, user: Long) = (id, week * W + H, user, "view", 1.0, "")
    val rows = Seq(
      ev(1, 0, 1), ev(2, 1, 1), ev(3, 2, 1),
      ev(4, 0, 2), ev(5, 1, 2),
      ev(6, 0, 3),
      ev(7, 1, 4), ev(8, 3, 4))
    val out = ScaleOps.q97Retention(spark, stage(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 3L, (0L, 1L) -> 2L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("q109: clean corpus passes every constraint; planted violations are counted") {
    import spark.implicits._
    val clean = ScaleOps.q109QualityChecks(spark, "/root/testdata/sf0.001").collect()
    assert(clean.length == 7)
    // the synthetic generator does NOT enforce lineitem's compound key —
    // the suite correctly reports that violation; every expectation below
    // is recomputed directly so the spec asserts FACTS, not hopes
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val expectedDups = li.count() -
      li.select($"l_orderkey", $"l_linenumber").distinct().count()
    val byName = clean.map(r =>
      r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(byName("lineitem.(l_orderkey,l_linenumber) unique") ==
      ((expectedDups, expectedDups == 0L)))
    byName.filterKeys(_ != "lineitem.(l_orderkey,l_linenumber) unique").foreach {
      case (name, (m, passed)) => assert(m == 0L && passed, s"$name: $m")
    }
    // planted: two negative-value events in an otherwise clean copy
    val dir = stage(Seq(
      (1L, 1L * H, 1L, "view", -1.0, ""),
      (2L, 2L * H, 1L, "view", -2.5, ""),
      (3L, 3L * H, 2L, "view", 4.0, "")))
    // copy the relational tables the other checks need
    for (t <- Seq("orders", "lineitem", "customer")) {
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val planted = ScaleOps.q109QualityChecks(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(planted("events.value positive") == ((2L, false)))
    assert(planted("orders.o_orderkey unique")._2)
  }

  test("q110: identical halves score ~0 PSI; a shifted half drifts") {
    import spark.implicits._
    // 400 events: first half values 0..99, second half identical → psi ~ 0
    val same = (0 until 400).map(i =>
      ((i + 1).toLong, i.toLong * H, 1L, "view", (i % 100).toDouble, ""))
    val psiSame = ScaleOps.q110PsiDrift(spark, stage(same)).collect()
    assert(psiSame.forall(r => !r.getAs[Boolean]("drifted") && r.getAs[Double]("psi") < 0.05),
      psiSame.mkString(","))
    // second half shifted +200 → every current row lands in the top bin
    val drift = (0 until 400).map { i =>
      val v = if (i < 200) (i % 100).toDouble else (i % 100).toDouble + 200.0
      ((i + 1).toLong, i.toLong * H, 1L, "view", v, "")
    }
    val psiDrift = ScaleOps.q110PsiDrift(spark, stage(drift)).collect()
    assert(psiDrift.forall(r => r.getAs[Boolean]("drifted") && r.getAs[Double]("psi") > 1.0),
      psiDrift.mkString(","))
  }

  test("q116: KS statistic equals a plain-Scala ECDF replay; planted shift rejects") {
    import spark.implicits._
    // identical halves → D ~ 0 (tiny sampling noise), no rejection
    val same = (0 until 400).map(i =>
      ((i + 1).toLong, i.toLong * H, 1L, "view", (i % 100).toDouble, ""))
    val outSame = ScaleOps.q116KsTest(spark, stage(same)).collect()
    assert(outSame.forall(r => !r.getAs[Boolean]("drifted")), outSame.mkString(","))
    // +50 shift in the second half → D = 0.5, far past the 95% bound
    val drift = (0 until 400).map { i =>
      val v = if (i < 200) (i % 100).toDouble else (i % 100).toDouble + 50.0
      ((i + 1).toLong, i.toLong * H, 1L, "view", v, "")
    }
    val outDrift = ScaleOps.q116KsTest(spark, stage(drift)).collect()
    assert(outDrift.forall(r => r.getAs[Boolean]("drifted")), outDrift.mkString(","))
    // exact replay of D on the drifted corpus
    val (ref, cur) = ((0 until 200).map(i => (i % 100).toDouble),
      (200 until 400).map(i => (i % 100).toDouble + 50.0))
    val pooled = (ref ++ cur).distinct.sorted
    val dExact = pooled.map { v =>
      math.abs(ref.count(_ <= v).toDouble / ref.size -
        cur.count(_ <= v).toDouble / cur.size)
    }.max
    assert(math.abs(outDrift(0).getAs[Double]("d_stat") - dExact) <= 1e-6)
  }

  test("publishPartition: a failing audit never touches the live data") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("wap").toString + "/part"
    val v1 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    assert(ScaleOps.publishPartition(v1, path)(_ => true))
    assert(spark.read.parquet(path).count() == 2)
    // bad batch: audit rejects → v1 stays live, staging left for inspection
    val v2 = Seq((3L, -1.0)).toDF("k", "v")
    assert(!ScaleOps.publishPartition(v2, path) { staged =>
      staged.filter($"v" <= 0).isEmpty
    })
    assert(spark.read.parquet(path).count() == 2, "failed audit replaced live data!")
    assert(new java.io.File(path + ".staging").exists, "staging evidence discarded")
    // good batch publishes over v1 and cleans up
    val v3 = Seq((4L, 1.0), (5L, 2.0), (6L, 3.0)).toDF("k", "v")
    assert(ScaleOps.publishPartition(v3, path)(_ => true))
    assert(spark.read.parquet(path).count() == 3)
    assert(!new java.io.File(path + ".old").exists)
  }

  test("applyChangeSet: insert/update/delete/passthrough and stray ops, all pinned") {
    import spark.implicits._
    val snapshot = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (2L, "U", "b2", 25.0),  // update
      (3L, "D", "", 0.0),     // delete
      (9L, "I", "new9", 9.0), // insert
      (7L, "U", "ghost", 0.0) // stray update on a missing key → ignored
    ).toDF("k", "op", "name", "bal")
    val out = Relational.applyChangeSet(snapshot, changes, "k")
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (9L, "new9", 9.0)))
  }

  test("q96 plan: one exchange serves both windows and the island aggregate") {
    val df = ScaleOps.q96GapsIslands(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 user_id exchange, got $exchanges:\n$p")
  }

  test("q129: transitions follow each user's event-time order and never cross users") {
    // user 1: view→click→click→purchase; user 2: view→view
    // transitions: (view,click) (click,click) (click,purchase) (view,view)
    // user 2's last event must NOT chain into user 1's stream
    val rows = Seq(
      (1L, 1L * H, 1L, "view", 1.0, ""), (2L, 2L * H, 1L, "click", 1.0, ""),
      (3L, 3L * H, 1L, "click", 1.0, ""), (4L, 4L * H, 1L, "purchase", 1.0, ""),
      (5L, 1L * H, 2L, "view", 1.0, ""), (6L, 9L * H, 2L, "view", 1.0, ""))
    val out = ScaleOps.q129Transitions(spark, stage(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out == Map(
      ("view", "click") -> ((1L, 2L, 0.5)),
      ("view", "view") -> ((1L, 2L, 0.5)),
      ("click", "click") -> ((1L, 2L, 0.5)),
      ("click", "purchase") -> ((1L, 2L, 0.5))))
  }

  test("q131: window factorization equals the sequential CUSUM recursion; planted shift alarms") {
    // stable first half (2/hour), shifted second half (6/hour): the
    // cumulative-sum/cumulative-min spelling must equal the textbook
    // sequential recursion S_i = max(0, S_{i-1} + (x_i - mu)), and the
    // alarm must fire only after the level shift
    val rows = (0 until 48).flatMap { h =>
      val n = if (h < 24) 2 else 6
      (0 until n).map(i => (h.toLong * 100 + i, h.toLong * H + i, 1L, "view", 1.0, ""))
    }
    val out = ScaleOps.q131Cusum(spark, stage(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    // plain-Scala sequential replay on the same hourly series
    val xs = (0 until 48).map(h => if (h < 24) 2L else 6L)
    val refXs = xs.take(24) // is_ref: hour < (0 + 47 + 1)/2 = 24
    val mu = refXs.sum.toDouble / refXs.size
    var s = 0.0
    val want = xs.map { x => s = math.max(0.0, s + (x - mu)); s }
    out.sortBy(_._1._2).zip(want).foreach { case (((_, _), (_, got, _)), expect) =>
      assert(math.abs(got - expect) < 1e-5, s"cusum $got vs sequential $expect")
    }
    // variance of the stable half is 0 -> threshold 0: every positive
    // excursion alarms, and the first 24 stable hours never do
    assert(out.filter(_._1._2 < 24).forall(!_._2._3))
    assert(out.filter(_._1._2 >= 24).forall(_._2._3))
  }

  test("q133: the hour-of-day profile absorbs the diurnal cycle; only the spike flags") {
    // 6 days of a clean diurnal pattern (count = 1 + hod % 3), except ONE
    // spiked hour (day 3, hod 5: 30 events instead of 3). The profile
    // must rate every clean hour normal — including other hod=5 hours —
    // and flag exactly the spike
    val rows = (0 until 144).flatMap { h =>
      val hod = h % 24
      val n = if (h == 3 * 24 + 5) 30 else 1 + hod % 3
      (0 until n).map(i => (h.toLong * 1000 + i, h.toLong * H + i, 1L, "view", 1.0, ""))
    }
    val out = ScaleOps.q133Seasonal(spark, stage(rows)).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6))).toMap
    assert(out.size == 144)
    val anomalies = out.filter(_._2._5).keySet
    assert(anomalies == Set(3L * 24 + 5), s"flagged: $anomalies")
    // the spike's bin: mean of (3,3,3,30,3,3) = 7.5, residual 22.5
    val (hod, x, expected, residual, _) = out(3L * 24 + 5)
    assert((hod, x, expected, residual) == ((5L, 30L, 7.5, 22.5)))
    // a clean sibling in the same bin sits below its mean, unflagged
    assert(out(5L)._4 == -4.5 && !out(5L)._5)
  }

  test("q134: planted linear trends recover exactly; noise degrades R², not the slope sign") {
    // type A: y = 10 + 3t for t=0..9 (exact fit); type B: flat 7/day
    // (slope 0, vy=0 → R² pinned 1); type C: 20 − 2t with one ±4
    // symmetric-noise pair at t=4/5 (slope preserved, R² < 1)
    val D = 86400000000000L
    def burst(ty: String, day: Int, n: Int, base: Long) =
      (0 until n).map(i => (base + day.toLong * 1000 + i, day.toLong * D + i, 1L, ty, 1.0, ""))
    val rows =
      (0 until 10).flatMap(t => burst("a", t, 10 + 3 * t, 0)) ++
      (0 until 10).flatMap(t => burst("b", t, 7, 1000000)) ++
      (0 until 10).flatMap { t =>
        val noise = if (t == 4) 4 else if (t == 5) -4 else 0
        burst("c", t, 20 - 2 * t + noise, 2000000)
      }
    val out = ScaleOps.q134TrendSlopes(spark, stage(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out("a") == ((10L, 3.0, 10.0, 1.0)))
    assert(out("b") == ((10L, 0.0, 7.0, 1.0)))
    val (nc, slopeC, _, r2c) = out("c")
    assert(nc == 10L && math.abs(slopeC - (-2.0)) < 0.1 && slopeC < 0)
    assert(r2c < 1.0 && r2c > 0.9, s"r2=$r2c")
  }

  test("q135: fuzzy join equals a plain-Scala trigram replay on hand-named entities") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scaleops_fuzzy").toString
    val customers = Seq((1L, "Acme Corp"), (2L, "Acme Inc"), (3L, "Zeta LLC"))
    val suppliers = Seq((10L, "ACME CORPORATION"), (11L, "Beta GmbH"))
    customers.toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    suppliers.toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val out = ScaleOps.q135FuzzyJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // plain-Scala replay of the whole contract (every gram is rare here)
    def grams(n: String) = n.toLowerCase.sliding(3).toSeq.distinct
    val expected = (for {
      (cid, cn) <- customers; (sid, sn) <- suppliers
      cg = grams(cn); sg = grams(sn)
      inter = cg.count(sg.contains)
      if inter > 0
      jm = math.round(inter.toDouble * 1e6 / (cg.size + sg.size - inter))
      if jm >= ScaleOps.fuzzyTauMicro
    } yield (cid, sid) -> ((inter.toLong, cg.size.toLong, sg.size.toLong, jm / 1e6))).toMap
    assert(out == expected)
    // the intended match survived, case-insensitively; non-matches did not
    assert(out.contains((1L, 10L)) && !out.contains((3L, 11L)), out.keySet)
  }

  test("q136: pagerank equals a plain-Scala pico power iteration; the hub outranks leaves") {
    import spark.implicits._
    // star graph through co-orders: hub part 1 co-ordered with each leaf
    // 2..5 twice (support floor), plus one leaf-leaf pair (4,5) twice
    val rows = (for {
      (leaf, o) <- Seq((2L, 0L), (3L, 10L), (4L, 20L), (5L, 30L))
      rep <- 0 to 1
    } yield Seq((o + rep, 1L), (o + rep, leaf))).flatten ++
      Seq((100L, 4L), (100L, 5L), (101L, 4L), (101L, 5L))
    val dir = java.nio.file.Files.createTempDirectory("scaleops_pr").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ScaleOps.q136PageRank(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // plain-Scala replay with the same pico-fixed arithmetic
    val pairs = Map((1L, 2L) -> 2L, (1L, 3L) -> 2L, (1L, 4L) -> 2L,
      (1L, 5L) -> 2L, (4L, 5L) -> 2L)
    val edges = pairs.toSeq.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = deg.keySet.toSeq.sorted
    var r = nodes.map(_ -> math.round(1e12 / nodes.size)).toMap
    for (_ <- 1 to ScaleOps.prIters) {
      val sc = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _, w) => math.round(r(u).toDouble * w / deg(u)) }.sum).toMap
      r = nodes.map(u => u -> (math.round((1 - ScaleOps.prDamping) * 1e12 / nodes.size)
        + math.round(ScaleOps.prDamping * sc.getOrElse(u, 0L).toDouble))).toMap
    }
    assert(out == r.map { case (u, p) => u -> ((nodes.size.toLong, p / 1e12)) })
    // the hub dominates every leaf
    assert(Seq(2L, 3L, 4L, 5L).forall(l => out(1L)._2 > out(l)._2))
  }

  test("q137: a 7-day-old event scores exactly half of a fresh one (half-life pin)") {
    // user 1: value 10 at the corpus max ts (age 0 → weight 1.0);
    // user 2: value 10 exactly 7 days earlier (one half-life → 0.5)
    val D = 24L * H
    val rows = Seq(
      (1L, 7L * D, 1L, "view", 10.0, ""),
      (2L, 0L, 2L, "view", 10.0, ""))
    val out = ScaleOps.q137DecayScore(spark, stage(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map(1L -> ((1L, 10.0)), 2L -> ((1L, 5.0))))
  }

  test("q138: skyline equals a plain-Scala O(n²) dominance replay; equal twins both survive") {
    import spark.implicits._
    // (price, size): 1 (10,5) and 2 (10,5) equal twins — both survive;
    // 3 (10,9) dominated same-price; 4 (20,3) survives (smaller size);
    // 5 (20,4) dominated by 4; 6 (30,3) dominated by 4 (price>, size=);
    // 7 (5,50) survives (cheapest)
    val parts = Seq((1L, 10.0, 5), (2L, 10.0, 5), (3L, 10.0, 9),
      (4L, 20.0, 3), (5L, 20.0, 4), (6L, 30.0, 3), (7L, 5.0, 50))
    val dir = java.nio.file.Files.createTempDirectory("scaleops_sky").toString
    parts.toDF("p_partkey", "p_retailprice", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = ScaleOps.q138Skyline(spark, dir).collect().map(_.getLong(0)).toSet
    val expected = parts.filter { case (k, p, s) =>
      !parts.exists { case (k2, p2, s2) =>
        k2 != k && p2 <= p && s2 <= s && (p2 < p || s2 < s) }
    }.map(_._1).toSet
    assert(out == expected && out == Set(1L, 2L, 4L, 7L))
  }

  test("q139: the weighted median follows quantity, not row count") {
    import spark.implicits._
    // part 1: price 1 carries 10 units, price 100 carries 1 → the
    // quantity-weighted median is 1 (a row median would say 50.5);
    // part 2: three unit rows at 1/2/100 → median 2
    val rows = Seq(
      (1L, 1.0, 10.0), (1L, 100.0, 1.0),
      (2L, 1.0, 1.0), (2L, 2.0, 1.0), (2L, 100.0, 1.0))
    val dir = java.nio.file.Files.createTempDirectory("scaleops_wm").toString
    rows.toDF("l_partkey", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ScaleOps.q139WeightedMedian(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out == Map(1L -> ((1.0, 11.0, 2L)), 2L -> ((2.0, 3.0, 3L))))
  }

  test("q140: a planted arm-aligned conversion split is significant; an A/A split is not") {
    import spark.implicits._
    // arm assignment in the spec replays the operator's own hash rule
    def arm(uid: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$uid".getBytes("UTF-8"))
      (Integer.parseInt(f"${d(0) & 0xff}%02x".substring(0, 1), 16) % 2)
    }
    val uids = (1L to 400L)
    // planted effect: arm-0 users purchase, arm-1 users only view
    val biased = uids.map(u =>
      (u, u * H, u, if (arm(u) == 0) "purchase" else "view", 1.0, ""))
    val b = ScaleOps.q140AbTest(spark, stage(biased)).collect().head
    assert(b.getLong(1) == b.getLong(0) && b.getLong(3) == 0L) // k0==n0, k1==0
    assert(b.getBoolean(5), s"planted split not significant: $b")
    // A/A: everyone purchases → degenerate pool, z pinned 0, no verdict
    val aa = uids.map(u => (u, u * H, u, "purchase", 1.0, ""))
    val a = ScaleOps.q140AbTest(spark, stage(aa)).collect().head
    assert(a.getDouble(4) == 0.0 && !a.getBoolean(5))
  }

  test("q141: a monotone series maxes S and trends; an all-tied series zeroes the variance") {
    val D = 24L * H
    // type "up": y = 2 + t over 12 days (strictly increasing: S = 66,
    // every pairwise slope exactly 1); type "flat": constant 3/day —
    // all y tied, tie-corrected variance collapses to 0, z pinned 0
    val rows =
      (0 until 12).flatMap(t => (0 until 2 + t).map(i =>
        (t.toLong * 100 + i, t.toLong * D + i, 1L, "up", 1.0, ""))) ++
      (0 until 12).flatMap(t => (0 until 3).map(i =>
        (10000 + t.toLong * 100 + i, t.toLong * D + i, 1L, "flat", 1.0, "")))
    val out = ScaleOps.q141MannKendall(spark, stage(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5), r.getDouble(6))).toMap
    val (nUp, sUp, npUp, zUp, trUp, slUp) = out("up")
    assert((nUp, sUp, npUp, slUp) == ((12L, 66L, 66L, 1.0)))
    assert(trUp && zUp > 1.96, s"z=$zUp")
    val (nF, sF, npF, zF, trF, _) = out("flat")
    assert((nF, sF, npF, zF, trF) == ((12L, 0L, 66L, 0.0, false)))
  }

  test("q142: perfectly aligned, inverted, and constant series pin r = 1 / −1 / undefined") {
    val D = 24L * H
    // over 10 days: "a" counts 1+t, "b" counts 2(1+t) (r = 1 exactly),
    // "c" counts 11−t (r = −1 vs a), "d" constant 4 (undefined, pinned 0)
    def series(ty: String, base: Long, f: Int => Int) =
      (0 until 10).flatMap(t => (0 until f(t)).map(i =>
        (base + t * 1000 + i, t.toLong * D + i, 1L, ty, 1.0, "")))
    val rows = series("a", 0, t => 1 + t) ++ series("b", 100000, t => 2 * (1 + t)) ++
      series("c", 200000, t => 11 - t) ++ series("d", 300000, _ => 4)
    val out = ScaleOps.q142Correlation(spark, stage(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(("a", "b")) == ((10L, 1.0, true)))
    assert(out(("a", "c")) == ((10L, -1.0, true)))
    assert(out(("a", "d")) == ((10L, 0.0, false)))
    assert(out(("b", "c")) == ((10L, -1.0, true)))
    assert(out.size == 6)
  }

  test("q144: gini is 0 for perfect equality and approaches (n−1)/n for total concentration") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scaleops_gini").toString
    // nation 1: four customers, equal revenue → G = 0
    // nation 2: four customers, ONE carries everything → G = (n−1)/n = 0.75
    val orders = Seq(
      (1L, 100.0), (2L, 100.0), (3L, 100.0), (4L, 100.0),
      (11L, 0.0), (12L, 0.0), (13L, 0.0), (14L, 400.0))
      .zipWithIndex.map { case ((c, v), i) => (i.toLong, c, v) }
    orders.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1),
      (11L, 2), (12L, 2), (13L, 2), (14L, 2))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = ScaleOps.q144Gini(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1) == ((4L, 400.0, 0.0)))
    assert(out(2) == ((4L, 400.0, 0.75)))
  }

  test("q143: benford digit extraction is exact on integer cents; uniform digits deviate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scaleops_benford").toString
    // 900 orders with UNIFORM first digits (100 each of 1xx..9xx) — a
    // distribution Benford flags; digit extraction must bucket exactly
    val orders = (0 until 900).map { i =>
      val d = 1 + i % 9
      (i.toLong, 1L, d * 100.0 + (i % 100) * 0.37)
    }
    orders.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = ScaleOps.q143Benford(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getBoolean(6))).toMap
    assert((1 to 9).forall(d => out(d)._1 == 100L))
    assert(out.values.forall(_._2), "uniform digits must deviate from Benford")
  }

  test("q146: a planted 2-day lead is recovered as best_lag = 2 with r = 1") {
    val D = 24L * H
    // "a" pulses on days {2, 5, 11}; "b" repeats the exact pulse two
    // days LATER ({4, 7, 13}) — a leads b by 2: at lag +2 the aligned
    // series are identical (r = 1); background 1/day keeps both series
    // defined on every day 0..14
    def pulse(ty: String, base: Long, days: Set[Int]) =
      (0 until 15).flatMap { t =>
        val n = if (days(t)) 5 else 1
        (0 until n).map(i => (base + t * 100 + i, t.toLong * D + i, 1L, ty, 1.0, ""))
      }
    val rows = pulse("a", 0, Set(2, 5, 11)) ++ pulse("b", 100000, Set(4, 7, 13))
    val out = ScaleOps.q146LeadLag(spark, stage(rows)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (lag, n, r) = out(("a", "b"))
    assert(lag == 2L && r == 1.0, s"lag=$lag r=$r n=$n")
  }

  test("q147: the planted head part is A, the boundary-straddler stays in the head") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scaleops_abc").toString
    // one brand, revenues 70 / 15 / 10 / 5: part 1 covers 70% (A), part
    // 2 STRADDLES the 80% line (starts at 70% < 80% → A by the
    // first-to-cross convention), part 3 starts at 85% < 95% → B,
    // part 4 starts at 95% → C
    Seq((1L, 10L, 70.0), (2L, 20L, 15.0), (3L, 30L, 10.0), (4L, 40L, 5.0))
      .flatMap { case (lk, pk, v) => Seq((lk, pk, v, 1.0)) }
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, "BrandX"), (20L, "BrandX"), (30L, "BrandX"), (40L, "BrandX"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = ScaleOps.q147AbcClass(spark, dir).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("A") == ((2L, 85.0, 0.85)))
    assert(out("B") == ((1L, 10.0, 0.1)))
    assert(out("C") == ((1L, 5.0, 0.05)))
  }

  test("q148: week-1 users are all new; a week-2 returner and a fresh joiner split correctly") {
    val Wk = 7L * 24 * H
    // users 1,2 active week 0; user 1 returns week 1 alongside new user 3
    val rows = Seq(
      (1L, 1L * H, 1L, "view", 1.0, ""), (2L, 2L * H, 2L, "view", 1.0, ""),
      (3L, Wk + H, 1L, "view", 1.0, ""), (4L, Wk + 2 * H, 3L, "view", 1.0, ""),
      (5L, Wk + 3 * H, 1L, "click", 1.0, "")) // same-week repeat, still ONE active row
    val out = ScaleOps.q148NewReturning(spark, stage(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((2L, 0L, 2L)))
    assert(out(1L) == ((1L, 1L, 2L)))
  }

  test("q149: stage medians equal the planted per-user deltas") {
    // three converting users with view→click of 10/20/30s (median 20,
    // p90 30) and one click→purchase of 100s; a user with click BEFORE
    // view contributes nothing
    val rows = Seq(
      (1L, 0L, 1L, "view", 1.0, ""), (2L, 10L * 1000000000L, 1L, "click", 1.0, ""),
      (3L, 0L, 2L, "view", 1.0, ""), (4L, 20L * 1000000000L, 2L, "click", 1.0, ""),
      (5L, 0L, 3L, "view", 1.0, ""), (6L, 30L * 1000000000L, 3L, "click", 1.0, ""),
      (7L, 130L * 1000000000L, 3L, "purchase", 1.0, ""),
      (8L, 50L * 1000000000L, 4L, "click", 1.0, ""), (9L, 60L * 1000000000L, 4L, "view", 1.0, ""))
    val out = ScaleOps.q149StageLatency(spark, stage(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("1_view_to_click") == ((3L, 20L, 30L)))
    assert(out("2_click_to_purchase") == ((1L, 100L, 100L)))
  }

  test("q150: five planted users land in five distinct quintiles; the whale is 555") {
    val D = 24L * H
    // user k (1..5): last active day k (5 = most recent), k events of
    // value 10k each — user 5 is best on all three axes
    val rows = (1 to 5).flatMap { k =>
      (0 until k).map(i =>
        ((k * 100 + i).toLong, k.toLong * D + i, k.toLong, "view", 10.0 * k, ""))
    }
    val out = ScaleOps.q150Rfm(spark, stage(rows)).collect()
      .map(r => r.getLong(0) -> (r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7)))
      .toMap
    assert(out(5L) == ((5, 5, 5, "555")))
    assert(out(1L) == ((1, 1, 1, "111")))
    // one user per quintile on every axis
    assert(out.values.map(_._1).toSeq.sorted == (1 to 5))
    assert(out.values.map(_._2).toSeq.sorted == (1 to 5))
    assert(out.values.map(_._3).toSeq.sorted == (1 to 5))
  }

  test("q151: a planted post-cut lift on the treated series is isolated; placebo stays 0") {
    val D = 24L * H
    // 12 days (cut = day 6, placebo cut = day 3): views flat 10/day the
    // whole time; purchases 4/day pre, 9/day post → DiD = +5, and both
    // series are flat WITHIN the pre period → placebo = 0
    val rows = (0 until 12).flatMap { t =>
      val np = if (t < 6) 4 else 9
      (0 until 10).map(i => (t.toLong * 1000 + i, t.toLong * D + i, 1L, "view", 1.0, "")) ++
        (0 until np).map(i => (t.toLong * 1000 + 500 + i, t.toLong * D + i, 1L, "purchase", 1.0, ""))
    }
    val out = ScaleOps.q151DiffInDiff(spark, stage(rows)).collect().head
    assert((out.getDouble(0), out.getDouble(1), out.getDouble(2), out.getDouble(3)) ==
      ((4.0, 9.0, 10.0, 10.0)))
    assert(out.getDouble(4) == 5.0 && out.getDouble(5) == 0.0)
  }

  test("q152: latency percentiles equal the planted per-line ship delays") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scaleops_ship").toString
    val day0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def plusDays(d: Int) = new java.sql.Timestamp(day0.getTime + d * 86400000L)
    // URGENT: lines ship +1/+2/+10 days (median 2, p90 10); LOW: +30
    Seq((1L, 1, plusDays(1)), (1L, 2, plusDays(2)), (1L, 3, plusDays(10)),
      (2L, 1, plusDays(30)))
      .toDF("l_orderkey", "l_linenumber", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "1-URGENT", day0), (2L, "5-LOW", day0))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = ScaleOps.q152ShipLatency(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out("1-URGENT") == ((3L, 2L, 10L, 10L)))
    assert(out("5-LOW") == ((1L, 30L, 30L, 30L)))
  }

  test("q153: pure volume and pure price moves decompose exactly; the identity has no residual") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("scaleops_bridge").toString
    val h1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val h2 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    // part 10: same unit price 5.0, quantity 10 → 16 (pure volume +30)
    // part 20: same quantity 10, unit price 3.0 → 4.0 (pure price +10)
    val lines = Seq(
      (1L, 10L, 10.0, 50.0), (2L, 10L, 16.0, 80.0),
      (3L, 20L, 10.0, 30.0), (4L, 20L, 10.0, 40.0))
    lines.toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, h1), (2L, h2), (3L, h1), (4L, h2))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, "BrandV"), (20L, "BrandP")).toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = ScaleOps.q153RevenueBridge(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out("BrandV") == ((30.0, 0.0, 30.0, 0L, 10L)))
    assert(out("BrandP") == ((0.0, 10.0, 10.0, 0L, 20L)))
  }

  test("q130: paths are event-time ordered, capped at pathLen, counted per user") {
    // user 1: view>click>view (3 events); user 2: same path; user 3:
    // seven views → path capped to the first pathLen (5); user 4: click
    val rows = Seq(
      (1L, 1L * H, 1L, "view", 1.0, ""), (2L, 2L * H, 1L, "click", 1.0, ""),
      (3L, 3L * H, 1L, "view", 1.0, ""),
      (4L, 5L * H, 2L, "view", 1.0, ""), (5L, 6L * H, 2L, "click", 1.0, ""),
      (6L, 7L * H, 2L, "view", 1.0, "")) ++
      (1 to 7).map(i => (10L + i, i.toLong * H, 3L, "view", 1.0, "")) :+
      (20L, 1L * H, 4L, "click", 1.0, "")
    val out = ScaleOps.q130TopPaths(spark, stage(rows)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "view>click>view" -> 2L,
      "view>view>view>view>view" -> 1L,
      "click" -> 1L))
  }

  test("q127: pairs/lift equal a plain-Scala basket replay; the cap binds deterministically") {
    import spark.implicits._
    // planted baskets: (2,3) co-ordered in three orders (one with a
    // duplicate lineitem for the same part — distinct must collapse it);
    // order 4 is a singleton; orders 10/11 are identical 70-part hot
    // baskets, so the 64-part cap BINDS and truncates the same sorted
    // prefix in both — every surviving hot pair must come from parts
    // 100..163 only
    val hot = (100L to 169L)
    val rows =
      Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L),
        (3L, 2L), (3L, 3L), (3L, 4L), (4L, 5L)) ++
        hot.map(p => (10L, p)) ++ hot.map(p => (11L, p))
    val dir = java.nio.file.Files.createTempDirectory("scaleops_lineitem").toString
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = ScaleOps.q127MarketBasket(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    // plain-Scala replay of the full contract, cap included
    val op = rows.distinct
    val nOrders = op.map(_._1).distinct.size.toLong
    val ic = op.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pc = op.groupBy(_._1).values.toSeq
      .map(_.map(_._2).distinct.sorted.take(ScaleOps.basketCap))
      .flatMap(ps => for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= ScaleOps.basketMinSupport).toMap
    val expected = pc.map { case ((a, b), nab) =>
      val micro = math.round(nab.toDouble * nOrders * 1e6 / (ic(a).toDouble * ic(b)))
      (a, b) -> (nab, ic(a), ic(b), nOrders, micro / 1e6)
    }
    val wantPage = expected.toSeq
      .sortBy { case ((a, b), (nab, _, _, _, _)) => (-nab, a, b) }
      .take(ScaleOps.basketTopK)
    assert(out.toSeq.map(_._1) == wantPage.map(_._1))
    out.foreach { case (pair, got) => assert(got == expected(pair), s"$pair") }
    // the planted anchor survived the page: (2,3) in 3 of the 6 orders,
    // lift = 3·6/(3·3) = 2.0
    assert(expected((2L, 3L)) == ((3L, 3L, 3L, 6L, 2.0)))
    // cap truncation is real: no surviving pair touches the dropped tail
    assert(out.map(_._1).forall { case (a, b) => a < 164L && b < 164L })
    assert(expected.keys.count { case (a, _) => a >= 100L } == 64 * 63 / 2)
  }
}
