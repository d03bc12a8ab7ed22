package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The build-once/probe-many IVF contract: an index persisted to parquet
  * and read back must probe to exactly the same top-k as the end-to-end
  * q32 pipeline (which builds the index inline).
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  val dir = "/root/testdata/sf0.001"

  test("persisted IVF index probes identically to the inline q32 pipeline") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"vec_id", $"embedding",
        graft.functions.DotProduct.ddot($"embedding", $"embedding").as("nn"))
    val centroids = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("cid"), $"embedding".as("ce"), $"nn".as("cn"))

    val indexPath = java.nio.file.Files.createTempDirectory("ivf").toString + "/index"
    Similarity.buildIvfIndex(emb, centroids).write.parquet(indexPath)
    val reloaded = spark.read.parquet(indexPath)

    val probed = Similarity.probeIvf(reloaded, emb, $"vec_id" < 10, k = 5)
      .collect().map(_.toSeq).toSeq
    val direct = Similarity.q32IvfAnn(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(probed == direct)
    assert(probed.nonEmpty)

    // the index is compact: ≤ 2 rows per vector, no arrays
    assert(reloaded.columns.toSeq == Seq("vec_id", "cid", "crnk"))
    val perVec = reloaded.groupBy($"vec_id").count()
      .agg(max($"count")).collect().head.getLong(0)
    assert(perVec <= 2)
  }

  test("persisted LSH signatures probe identically to the inline q40 pipeline") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"vec_id", $"embedding",
        graft.functions.DotProduct.ddot($"embedding", $"embedding").as("nn"))

    val sigPath = java.nio.file.Files.createTempDirectory("lsh").toString + "/sigs"
    Similarity.buildLshSignatures(emb, bands = 2, bits = 6, dim = 64)
      .write.parquet(sigPath)
    val reloaded = spark.read.parquet(sigPath)
    assert(reloaded.columns.toSeq == Seq("vec_id", "band", "bucket"))

    val probed = Similarity.probeLsh(reloaded, emb, _ < 10, k = 5)
      .collect().map(_.toSeq).toSeq
    val direct = Similarity.q40LshAnn(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(probed == direct)
    assert(probed.nonEmpty)
  }

  test("rerank candidate-volume gate: shuffle fallback returns identical top-k (ADVICE r11)") {
    import spark.implicits._
    // default path (candidates broadcast) vs forced fallback (limit 0 →
    // every probe joins candidates by shuffle hash): rows must be
    // identical — the gate is purely physical, protecting the driver
    // from skew-grown candidate lists, never a semantics change
    val viaBroadcast = Similarity.q40LshAnn(spark, dir).collect().map(_.toSeq).toSeq
    spark.conf.set("graft.rerank.broadcastCandLimit", "0")
    try {
      val q40 = Similarity.q40LshAnn(spark, dir)
      val viaShuffle = q40.collect().map(_.toSeq).toSeq
      assert(viaShuffle == viaBroadcast && viaShuffle.nonEmpty)
      // and the fallback plan really did drop the candidate broadcast:
      // no BroadcastExchange feeds the candidate (qid, vid) join — the
      // only broadcasts left are the query-bounded qsigs/qemb/topPre sides
      val planStr = q40.queryExecution.executedPlan.toString
      assert(planStr.contains("ShuffledHashJoin"),
        "forced fallback must plan the candidate join as shuffle-hash")
      val ivfA = Similarity.q32IvfAnn(spark, dir).collect().map(_.toSeq).toSeq
      spark.conf.unset("graft.rerank.broadcastCandLimit")
      val ivfB = Similarity.q32IvfAnn(spark, dir).collect().map(_.toSeq).toSeq
      assert(ivfA == ivfB && ivfA.nonEmpty)
    } finally spark.conf.unset("graft.rerank.broadcastCandLimit")
  }

  test("int8 quantization: codes bounded, dequantization error within half a step") {
    import spark.implicits._
    val rows = Similarity.q55Int8Quant(spark, dir)
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, q) => q >= -127 && q <= 127 })
    // reconstruct x̂ = q/scale and compare against the original elements:
    // symmetric quantization guarantees |x − x̂| ≤ 0.5/scale
    val orig = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", posexplode($"embedding").as(Seq("pos0", "x")))
      .collect().map(r => (r.getLong(0), r.getInt(1) + 1L) -> r.getFloat(2)).toMap
    rows.foreach { case (vid, pos, scale, q) =>
      val x = orig((vid, pos)).toDouble
      if (scale > 0)
        assert(math.abs(x - q / scale) <= 0.5 / scale + 1e-12,
          s"vec $vid pos $pos: $x vs ${q / scale}")
      else assert(q == 0)
    }
  }

  test("q65: recall replays from the q30/q40 outputs; values are fifths in [0,1]") {
    val exact = Similarity.q30CosineTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))) // (qid, vid)
    val approx = Similarity.q40LshAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val out = Similarity.q65AnnRecall(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == exact.map(_._1).toSet, "one row per probe query")
    exact.groupBy(_._1).foreach { case (qid, top) =>
      val hits = top.count(approx.contains).toLong
      assert(out(qid) == ((hits, hits / 5.0)), s"query $qid")
    }
    assert(out.values.forall { case (h, r) => h >= 0 && h <= 5 && r == h / 5.0 })
  }

  test("q62: verdicts match a plain-Scala within-cell cosine replay") {
    import spark.implicits._
    val out = Similarity.q62Semdedup(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // one verdict per corpus vector
    assert(out.map(_._1).toSet == emb.keySet)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // assignment: the chosen seed minimizes distance (double replay, with
    // slack for the 6dp rounding of the exact-decimal plan)
    val seeds = out.map(_._1).filter(_ < Similarity.kmeansK)
    out.foreach { case (vid, cid, _) =>
      def d2(s: Long) = {
        val (v, c) = (emb(vid), emb(s))
        v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
      }
      assert(d2(cid) <= seeds.map(d2).min + 1e-5, s"vec $vid assigned to non-nearest $cid")
    }
    // duplicate verdicts: a dup has a smaller-id cellmate above the bar,
    // a survivor has none (pairs within 1e-5 of the bar are skipped — the
    // exact-decimal 6dp plan owns those edges, the DuckDB gate checks them)
    val cells = out.groupBy(_._2)
    out.foreach { case (vid, cid, isDup) =>
      val sims = cells(cid).filter(_._1 < vid)
        .map(m => cos(emb(m._1), emb(vid)))
      val clearAbove = sims.exists(_ >= Similarity.semdedupTau + 1e-5)
      val clearBelow = sims.forall(_ < Similarity.semdedupTau - 1e-5)
      if (clearAbove) assert(isDup, s"vec $vid should be a dup")
      else if (clearBelow) assert(!isDup, s"vec $vid should survive")
    }
    assert(out.exists(_._3) && out.exists(!_._3), "both verdicts should occur")
  }
  test("semdedup k-lever: single-cell equals brute force; oracle k unchanged; more cells never add dups") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding",
        graft.functions.DotProduct.ddot($"embedding", $"embedding").as("nn"))
    // k = 1: one cell holds the whole corpus, so the cell blocking is a
    // no-op and the flags must equal the brute-force definition — a doc is
    // a dup iff ANY other doc pairs with it at sim >= tau with the doc on
    // the higher-vec_id side of the pair
    val one = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("cid"), $"embedding".as("ce"), $"nn".as("cn"))
    val got = Similarity.semdedup(emb, one, Similarity.semdedupTau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var d = BigDecimal(0); var na = BigDecimal(0); var nb = BigDecimal(0)
      var i = 0
      while (i < a.length) {
        d += BigDecimal(a(i).toDouble) * BigDecimal(b(i).toDouble)
        na += BigDecimal(a(i).toDouble) * BigDecimal(a(i).toDouble)
        nb += BigDecimal(b(i).toDouble) * BigDecimal(b(i).toDouble)
        i += 1
      }
      val num = d.toDouble
      BigDecimal(num / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val brute = (for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
      if sim(vecs(i)._2, vecs(j)._2) >= Similarity.semdedupTau
    } yield vecs(j)._1).toSet
    assert(got.size == vecs.length)
    assert(got.filter(_._2).keySet == brute, "k=1 semdedup != brute force")

    // the oracled q62 path is byte-identical to semdedup with the pinned seeds
    val c0 = emb.filter($"vec_id" < Similarity.kmeansK)
      .select($"vec_id".as("cid"), $"embedding".as("ce"), $"nn".as("cn"))
    val viaSurface = Similarity.semdedup(emb, c0, Similarity.semdedupTau)
      .collect().map(_.toString).sorted.toSeq
    val viaQ62 = Similarity.q62Semdedup(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(viaSurface == viaQ62)

    // scaling k up can only SHRINK the dup set (pairs only form within a
    // cell) — the recall-for-work trade the scaladoc documents
    val many = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("cid"), $"embedding".as("ce"), $"nn".as("cn"))
    val gotMany = Similarity.semdedup(emb, many, Similarity.semdedupTau)
      .collect().filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(gotMany.subsetOf(got.filter(_._2).keySet),
      "denser centroid grid added dups that the single cell did not have")
  }

  test("q89: sparse projection preserves pairwise distances (JL), native dot in plan") {
    import spark.implicits._
    val df = Similarity.q89RandomProjection(spark, dir)
    val proj = df.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2))).toMap
    val orig = graft.Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(proj.values.forall(_.length == Similarity.rpDims))
    // E[‖Px‖²] = (rpDims/3)·‖x‖² for Achlioptas ±1/0 entries (Var = 1/3):
    // pairwise squared-distance ratios must concentrate around 8/3
    val ids = orig.keys.toSeq.sorted.take(60)
    val ratios = for {
      a <- ids; b <- ids if a < b
      d2o = orig(a).zip(orig(b)).map { case (x, y) => (x - y) * (x - y) }.sum
      if d2o > 1e-12
      d2p = proj(a).zip(proj(b)).map { case (x, y) => (x - y) * (x - y) }.sum
    } yield d2p / d2o
    val expected = Similarity.rpDims / 3.0
    val sorted = ratios.sorted
    val median = sorted(sorted.length / 2)
    assert(math.abs(median / expected - 1.0) < 0.4,
      s"median distance ratio $median vs expected $expected")
    val within = ratios.count(r => r > expected * 0.3 && r < expected * 2.0)
    assert(within.toDouble / ratios.length > 0.7,
      s"only $within/${ratios.length} pairs inside the JL band")
    // the projection is the native decimal-exact dot, broadcast matrix
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("ddot_native"), s"projection not the native dot:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"sign matrix must broadcast:\n$p")
  }

  test("q90: projected coarse stage recalls most of the exact top-5; heap agg in plan") {
    import spark.implicits._
    val approx = Similarity.q90ProjAnn(spark, dir)
    val got = approx.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val exact = Similarity.q30CosineTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    // calibration: the synthetic embeddings are isotropic noise — true
    // top-5 neighbors sit in a near-tie band, the JL worst case (no
    // cluster structure for the projection to preserve). Measured here:
    // 26% recall@5 through the 8-dim coarse stage at m=50, vs 12% for
    // the q65-measured LSH index on the SAME corpus — the projection
    // stage doubles the in-repo coarse baseline. Pin a floor between
    // the two; real clustered embeddings sit far above both.
    val hits = exact.map { case (q, ex) => got(q).intersect(ex).size }.sum
    val total = exact.values.map(_.size).sum
    assert(hits.toDouble / total >= 0.2,
      s"recall@5 collapsed: $hits/$total through the coarse stage")
    // candidate selection is the bounded heap, not a corpus window (the
    // ONLY window allowed is the m-row-per-query rerank)
    val p = approx.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("partial_bounded_top_k"), s"coarse stage not the heap agg:\n$p")
  }

  test("q111: identical halves cos=1; a flipped half reads as drift") {
    import spark.implicits._
    def stage(rows: Seq[(Long, Seq[Float], Int)]): String = {
      val d = java.nio.file.Files.createTempDirectory("drift_emb").toString
      rows.toDF("vec_id", "embedding", "label")
        .select($"vec_id", $"embedding".cast("array<float>"), $"label".cast("int"))
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d
    }
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(8)(j => ((i % 7) + j).toFloat / 10f), 1)
    }
    // duplicate each vector at id*2 (even) and id*2+1 (odd): the two
    // parity halves are identical by construction
    val mirrored = base.flatMap { case (id, e, l) =>
      Seq((id * 2, e, l), (id * 2 + 1, e, l))
    }
    val outSame = Similarity.q111EmbeddingDrift(spark, stage(mirrored)).collect()
    assert(outSame.forall(r => r.getDouble(1) == 1.0 && r.getBoolean(2)),
      outSame.mkString(","))
    // odd half negated: centroids anti-parallel, cosine -1 → not stable
    val flipped = base.flatMap { case (id, e, l) =>
      Seq((id * 2, e, l), (id * 2 + 1, e.map(-_), l))
    }
    val outFlip = Similarity.q111EmbeddingDrift(spark, stage(flipped)).collect()
    assert(outFlip.forall(r => r.getDouble(1) <= -0.99 && !r.getBoolean(2)),
      outFlip.mkString(","))
  }

  test("q132: silhouette clusters mirror the q58 assignment; scores live in [-1, 1]") {
    val sil = Similarity.q132Silhouette(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val assigned = Similarity.q58Kmeans(spark, dir).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
    // per-cluster membership counts equal the assignment's exactly, every
    // populated cluster is scored, and the statistic respects its bounds
    assert(sil.view.mapValues(_._1).toMap == assigned)
    assert(sil.values.forall { case (_, s) => s >= -1.0 && s <= 1.0 })
    assert(sil.nonEmpty && sil.values.map(_._1).sum == assigned.values.sum)
  }
}
