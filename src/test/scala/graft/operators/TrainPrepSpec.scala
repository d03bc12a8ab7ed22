package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the training-prep family (exactness vs DuckDB is the
  * driver gate; these pin the semantic contracts that survive any
  * refactor of the plan shapes).
  */
class TrainPrepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val dir = "/root/testdata/sf0.01"

  test("q49: sample is deterministic, every kept row's bucket is under its stratum rate") {
    val a = TrainPrep.q49HashSample(spark, dir).collect().map(_.toSeq).toSeq
    val b = TrainPrep.q49HashSample(spark, dir).collect().map(_.toSeq).toSeq
    assert(a == b, "hash sample must be reproducible run-to-run")
    assert(a.nonEmpty)
    a.foreach { r =>
      val (lang, bucket) = (r(1).asInstanceOf[String], r(3).asInstanceOf[Long])
      val rate = if (lang == "en") 20 else 10
      assert(bucket >= 0 && bucket < rate, s"bucket $bucket outside stratum rate $rate")
    }
  }

  test("q50: concat-then-split packing — offsets bounded, bins reconstructible from cumsum") {
    val rows = TrainPrep.q50SeqPack(spark, dir)
      .select("lang", "source", "doc_id", "n_tokens", "bin_id", "bin_offset")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, _, _, off) =>
      off >= 0 && off < TrainPrep.packBudget }, "bin_offset outside [0, budget)")
    // replay the convention per stratum in plain Scala
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, g) =>
      var cum = 0L
      g.sortBy(_._3).foreach { case (_, _, id, toks, bin, off) =>
        assert(bin == cum / TrainPrep.packBudget, s"bin for doc $id")
        assert(off == cum % TrainPrep.packBudget, s"offset for doc $id")
        cum += toks
      }
    }
  }

  test("q51: exactly one planted email and phone per doc, both redacted") {
    import spark.implicits._
    val out = TrainPrep.q51PiiScrub(spark, dir)
      .as[(Long, Int, Int, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, ne, np, clean) =>
      assert(ne == 1 && np == 1, s"doc $id counted ($ne, $np)")
      assert(clean.contains("<EMAIL>") && clean.contains("<PHONE>"), s"doc $id")
      assert(!clean.contains("@example.com") && !clean.contains("call 555-"), s"doc $id")
    }
  }

  test("q52: contamination is in (0, 1], benchmark docs never appear") {
    import spark.implicits._
    val out = TrainPrep.q52Contamination(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, shared, frac) =>
      assert(id % 97 != 0, s"benchmark doc $id leaked into corpus output")
      assert(shared >= 1, s"doc $id emitted with zero shared shingles")
      assert(frac > 0.0 && frac <= 1.0, s"doc $id contamination $frac")
    }
  }

  test("q54: pipeline output is exactly survivors minus benchmark/contaminated, repacked") {
    import spark.implicits._
    val out = TrainPrep.q54CorpusPipeline(spark, dir)
      .select("doc_id", "n_tokens", "bin_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val outIds = out.map(_._1).toSet
    // no benchmark docs
    assert(outIds.forall(_ % 97 != 0))
    // no non-representative cluster members (q48 is the per-doc source of truth)
    val nonReps = Dedup.q48NeardupClusters(spark, dir).collect()
      .filter(r => r.getLong(0) != r.getLong(1)).map(_.getLong(0)).toSet
    assert(outIds.intersect(nonReps).isEmpty, "a non-survivor leaked into the packed corpus")
    // no heavily contaminated docs
    val heavy = TrainPrep.q52Contamination(spark, dir)
      .filter(col("contamination") >= 0.5).collect().map(_.getLong(0)).toSet
    assert(outIds.intersect(heavy).isEmpty, "a contaminated doc leaked into the packed corpus")
    // the packing convention holds on the FILTERED stream (offsets bounded)
    assert(out.forall { case (_, _, off) => off >= 0 && off < TrainPrep.packBudget })
  }

  test("q56: one survivor per q48 cluster, and it is the max-quality member") {
    import spark.implicits._
    val q48 = Dedup.q48NeardupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val quality = TextOps.q22Quality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val out = TrainPrep.q56QualitySurvivor(spark, dir)
      .as[(Long, Long, Double, Long)].collect()
    // same cluster vocabulary and sizes as q48
    val q48Clusters = q48.map(t => t._2 -> t._3).toMap
    assert(out.map(_._1).toSet == q48Clusters.keySet)
    out.foreach { case (cid, _, _, size) => assert(size == q48Clusters(cid)) }
    // survivor maximizes (quality, then min doc_id) within its cluster
    val members = q48.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    out.foreach { case (cid, survivor, sq, _) =>
      val best = members(cid).map(d => (-quality(d), d)).min
      assert(survivor == best._2 && sq == quality(survivor),
        s"cluster $cid picked $survivor, expected ${best._2}")
    }
  }

  test("q63: deterministic, temperature favors small strata, budget is half the tokens") {
    val a = TrainPrep.q63DomainMix(spark, dir).collect().map(_.toSeq).toSeq
    val b = TrainPrep.q63DomainMix(spark, dir).collect().map(_.toSeq).toSeq
    assert(a == b, "domain mix must be reproducible run-to-run")
    assert(a.nonEmpty)
    // per-stratum thresholds from the output; token counts from the table
    val thresh = a.map(r => (r(1), r(2)) -> r(3).asInstanceOf[Long]).toMap
    val toks = graft.Tables.documents(spark, dir)
      .select(col("lang"), col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().groupBy(r => (r.get(0), r.get(1)))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    // √-temperature: a smaller stratum never gets a lower rate
    for (sa <- thresh.keys; sb <- thresh.keys)
      if (toks(sa) < toks(sb))
        assert(thresh(sa) >= thresh(sb), s"stratum $sa (smaller) below $sb")
    // expected kept tokens ≈ half the corpus; the rate cap at 1 and the
    // floor can only UNDERSHOOT (a stratum whose uncapped rate exceeds 1
    // donates its surplus to nobody), so the bound below is cap-aware
    val total = toks.values.sum.toDouble
    val expected = thresh.map { case (s, t) => toks(s) * (t / 1e6) }.sum
    val cappedLoss = thresh.collect { case (s, t) if t == 1000000L =>
      val w = math.sqrt(toks(s).toDouble)
      val wtot = toks.keys.map(k => math.sqrt(toks(k).toDouble)).sum
      0.5 * total * (w / wtot) - toks(s)
    }.filter(_ > 0).sum
    assert(expected <= 0.5 * total + 1e-6 &&
      expected >= 0.49 * total - cappedLoss - 1e-6,
      s"budget drifted: $expected of $total (capped loss $cappedLoss)")
  }

  test("q67: statuses replay from the snapshot membership arithmetic") {
    import spark.implicits._
    val ids = graft.Tables.documents(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val out = TrainPrep.q67SnapshotDiff(spark, dir)
      .as[(Long, String)].collect().toMap
    val expected = ids.flatMap { id =>
      val inOld = id % 5 != 0
      val inNew = id % 7 != 0
      val status =
        if (!inOld && !inNew) None
        else if (!inOld) Some("added")
        else if (!inNew) Some("removed")
        else if (id % 11 == 0) Some("changed") // the planted revision
        else Some("unchanged")
      status.map(id -> _)
    }.toMap
    assert(out == expected)
    // all four statuses occur on this corpus
    assert(out.values.toSet == Set("added", "removed", "changed", "unchanged"))
  }

  test("q68: health rollup replays from q22 quality + fingerprint counts") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "lang", "source",
        "size(split(text, ' ')) AS n_toks",
        "md5(lower(trim(regexp_replace(text, '\\\\s+', ' ')))) AS fp")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3).toLong, r.getString(4)))
    val quality = TextOps.q22Quality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val fpCounts = docs.groupBy(_._5).view.mapValues(_.length).toMap
    val out = TrainPrep.q68CorpusHealth(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val expected = docs.groupBy(d => (d._2, d._3)).map { case (k, g) =>
      val microSum = g.map(d => math.round(quality(d._1) * 1e6)).sum
      k -> (g.length.toLong, g.map(_._4).sum,
        g.map(_._4).sum.toDouble / g.length,
        microSum.toDouble / (g.length * 1e6),
        g.count(d => fpCounts(d._5) > 1).toDouble / g.length)
    }
    assert(out == expected)
    // this synthetic corpus has no exact dups (q25 = one cluster per doc),
    // so the replay above pins dup_frac = 0 everywhere; the planted test
    // below exercises the >0 path
    assert(out.values.forall(_._5 == 0.0))
  }

  test("q68 dup_frac counts planted duplicates (whitespace-normalized, cross-domain)") {
    import spark.implicits._
    val body = Seq.fill(30)("the and of to a value table").mkString(" ")
    val docs = Seq(
      // two byte-identical docs in domain (en, web) + one cross-domain
      // copy differing only in whitespace/case → ALL THREE are q25 dups
      (1L, "en", "web", body, 300L),
      (2L, "en", "web", body, 300L),
      (3L, "de", "web", "  " + body.toUpperCase + "  ", 300L),
      // uniques
      (4L, "en", "web", body + " unique tail four", 300L),
      (5L, "de", "web", body + " unique tail five", 300L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
    val out = TrainPrep.corpusHealth(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(6))).toMap
    assert(out(("en", "web")) == ((3L, 2.0 / 3)), "two of three en docs are dups")
    assert(out(("de", "web")) == ((2L, 0.5)), "the normalized cross-domain copy is a dup")
  }

  test("q70: exact 90/5/5 proportions per stratum; deterministic; total coverage") {
    import spark.implicits._
    val a = TrainPrep.q70Split(spark, dir).collect().map(_.toSeq).toSeq
    val b = TrainPrep.q70Split(spark, dir).collect().map(_.toSeq).toSeq
    assert(a == b, "split must be reproducible run-to-run")
    val rows = a.map(r => (r(0).asInstanceOf[Long], r(1), r(2), r(3).asInstanceOf[String]))
    // every document appears exactly once
    val all = graft.Tables.documents(spark, dir).select("doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == all && rows.size == all.size)
    // EXACT floor-based proportions within each stratum
    rows.groupBy(r => (r._2, r._3)).foreach { case (k, g) =>
      val n = g.size.toLong
      val byS = g.groupBy(_._4).view.mapValues(_.size.toLong).toMap
      assert(byS.getOrElse("train", 0L) == n * 9 / 10, s"stratum $k train")
      assert(byS.getOrElse("val", 0L) == n * 19 / 20 - n * 9 / 10, s"stratum $k val")
      assert(byS.getOrElse("test", 0L) == n - n * 19 / 20, s"stratum $k test")
    }
    assert(rows.exists(_._4 == "val") && rows.exists(_._4 == "test"))
  }

  test("q73: top decile per language selected; target slice outscores the pool; window-free plan") {
    import spark.implicits._
    val df = TrainPrep.q73DsirSample(spark, dir)
    val out = df.as[(Long, String, Long, Double, Boolean)].collect()
    assert(out.length == 500)
    // selection is the >= 0.9-percentile gate: ~10% per language, with
    // slack only for ties at the cutoff
    out.groupBy(_._2).foreach { case (lang, g) =>
      val sel = g.count(_._5)
      val want = math.ceil(g.length * 0.1).toInt
      assert(sel >= want && sel <= want + math.max(2, g.length / 20),
        s"$lang: $sel selected of ${g.length}")
      // every selected doc outscores every unselected one (threshold gate)
      val minSel = g.filter(_._5).map(_._4).min
      val maxUnsel = g.filterNot(_._5).map(_._4).max
      assert(minSel >= maxUnsel || math.abs(minSel - maxUnsel) < 1e-9,
        s"$lang: selection is not a score threshold")
    }
    // the importance construction must favor the target domain: src0 docs
    // score higher on average than the rest of the pool
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val (t, p) = out.partition(r => src(r._1) == "src0")
    assert(t.map(_._4).sum / t.length > p.map(_._4).sum / p.length,
      "target-domain docs do not outscore the raw pool")
    // no window anywhere: thresholds are aggregates joined back
    import org.apache.spark.sql.catalyst.plans.logical.Window
    assert(df.queryExecution.optimizedPlan.collect { case w: Window => w }.isEmpty,
      "q73 must not use a window (Zipf word key / lang skew)")
  }

  test("q74: composed pipeline equals its stages run separately; pack invariants hold") {
    import spark.implicits._
    val out = TrainPrep.q74CorpusPipelineV2(spark, dir)
      .as[(Long, String, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // pack invariants: offsets stay inside the budget, bins non-negative
    out.foreach { case (id, _, _, n, bin, off) =>
      assert(bin >= 0 && off >= 0 && off < TrainPrep.packBudget, s"doc $id")
      assert(n > 0, s"doc $id packed with no tokens")
    }
    // stage-by-stage replay through the public surfaces must select the
    // same documents with the same rebuilt token counts
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rebuilt = docs.select($"doc_id", $"lang", $"source")
      .join(Dedup.passageDedupFrame(docs).filter($"n_kept" > 0)
        .select($"doc_id", $"clean_text".as("text")), Seq("doc_id"))
    val picked = TrainPrep.dsirSample(rebuilt, exactThreshold = true) // q74's oracle-pinned mode
      .filter($"selected")
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    assert(out.map(_._1).toSet == picked.keySet, "composed selection diverges")
    out.foreach { case (id, _, _, n, _, _) =>
      assert(picked(id) == n, s"doc $id token count diverges from the rebuilt text")
    }
    // plan hygiene: no cartesian product anywhere in the composition
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val plan = TrainPrep.q74CorpusPipelineV2(spark, dir).queryExecution.optimizedPlan
    assert(plan.collect { case j: Join if j.condition.isEmpty => j }
      .forall(_.children.exists(_.stats.sizeInBytes < 1000000)),
      "cartesian join without a tiny side (the scalar-totals crossJoin is the only allowed shape)")
  }

  test("q82: selection equals an independent Scala replay; budgets never exceeded; kept bins are a prefix") {
    import spark.implicits._
    val got = TrainPrep.q82QuotaSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // independent replay of the whole contract in plain Scala
    val raw = graft.Tables.documents(spark, dir)
      .selectExpr("doc_id", "lang", "source",
        "CAST(size(split(text, ' ')) AS LONG) AS n_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    def binOf(id: Long): Long =
      graft.functions.PortableHash60.hash(s"quota:$id".getBytes("UTF-8")) %
        TrainPrep.QuotaBins
    val byStratum = raw.groupBy(r => (r._2, r._3))
    val toks = byStratum.view.mapValues(_.map(_._4).sum).toMap
    // mirror the DECIMAL(28,14) pin of √toks (HALF_UP on shortest repr)
    val w = toks.view.mapValues(t =>
      BigDecimal(math.sqrt(t.toDouble)).setScale(14, BigDecimal.RoundingMode.HALF_UP)).toMap
    val wtot = w.values.foldLeft(BigDecimal(0))(_ + _)
    val tokstot = toks.values.sum.toDouble
    val expected = byStratum.iterator.flatMap { case (k, docs) =>
      val budget = math.min(toks(k),
        math.floor(0.4 * tokstot * (w(k).toDouble / wtot.toDouble)).toLong)
      val binToks = docs.groupBy(d => binOf(d._1)).view.mapValues(_.map(_._4).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val keptBins = binToks.takeWhile { case (_, t) => cum += t; cum <= budget }
        .map(_._1).toSet
      docs.filter(d => keptBins.contains(binOf(d._1))).map(_._1)
    }.toSet
    assert(got.map(_._1).toSet == expected, "kept doc set diverges from the Scala replay")
    // budget invariant + prefix property, checked on the OPERATOR output
    got.groupBy(r => (r._2, r._3)).foreach { case (k, kept) =>
      val budget = math.min(toks(k),
        math.floor(0.4 * tokstot * (w(k).toDouble / wtot.toDouble)).toLong)
      assert(kept.map(_._4).sum <= budget, s"budget exceeded for stratum $k")
      val keptBins = kept.map(_._5).toSet
      val allBins = byStratum(k).map(d => binOf(d._1)).distinct.sorted
      val prefix = allBins.takeWhile(keptBins.contains).toSet
      assert(keptBins == prefix, s"kept bins not a hash-order prefix for stratum $k")
    }
  }

  test("q82 plan: cumsum window runs over the bin AGGREGATE, never raw documents") {
    val df = TrainPrep.q82QuotaSelect(spark, dir)
    df.collect() // AQE-finalize
    val p = df.queryExecution.executedPlan.toString
    // the window's sort/partition keys must be the bin-aggregate triple —
    // a windowspecdefinition mentioning doc-level columns would mean the
    // per-stratum row window (the q53 scale-killer) came back
    assert(p.contains("windowspecdefinition"), s"no window in plan:\n$p")
    assert(!p.contains("windowspecdefinition(doc_id"),
      s"window partitioned by doc-level rows:\n$p")
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.forall(l => l.contains("lang") && l.contains("bin")),
      s"window keys are not (lang, source)/bin:\n$winLines")
    assert(!p.contains("CartesianProduct") ||
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.isEmpty => j
      }.forall(_.children.exists(_.stats.sizeInBytes < 1000000)),
      "cartesian join without a tiny side (scalar-totals crossJoin is the only allowed shape)")
  }

  test("q87: exactly n per stratum, deterministic, selected keys dominate the rejected") {
    import spark.implicits._
    val out = TrainPrep.q87WeightedSample(spark, dir).collect()
    val perLang = out.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    perLang.foreach { case (lang, n) =>
      assert(n == TrainPrep.wrsN, s"$lang got $n winners")
    }
    // re-run is bit-identical (hash-derived u, no RNG state)
    val again = TrainPrep.q87WeightedSample(spark, dir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // the A-ES invariant: within a stratum, every selected key ≥ every
    // rejected key (the sample IS the top-n by key)
    val all = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        round(TextOps.qualityScoreExpr($"text", $"n_chars") + lit(0.1), 6).as("w6"))
      .withColumn("u",
        ((Dedup.portableHash(concat(lit("wrs:"), $"doc_id".cast("string")))
          % 1000000L).cast("double") + 0.5) / 1e6)
      .withColumn("key_micro", round(log($"u") / $"w6" * 1e6).cast("long"))
      .select($"doc_id", $"lang", $"key_micro").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val chosen = out.map(r => r.getAs[Long]("doc_id")).toSet
    all.groupBy(_._2).foreach { case (lang, g) =>
      val minSel = g.filter(x => chosen(x._1)).map(_._3).min
      val maxRej = g.filterNot(x => chosen(x._1)).map(_._3).maxOption.getOrElse(Long.MinValue)
      assert(minSel >= maxRej, s"$lang: rejected key $maxRej beats selected $minSel")
    }
  }

  test("q87: inclusion tracks weight (A-ES on a two-tier synthetic corpus)") {
    import spark.implicits._
    // 1000 docs, one stratum; even ids weight 1.1, odd ids weight 0.1 —
    // the heavy tier must dominate a 100-doc sample (E[heavy] ≈ 92)
    val docs = (0 until 1000).map { i =>
      val w = if (i % 2 == 0) 1.1 else 0.1
      (i.toLong, w)
    }.toDF("doc_id", "w6")
    val scored = docs
      .withColumn("u",
        ((Dedup.portableHash(concat(lit("wrs:"), $"doc_id".cast("string")))
          % 1000000L).cast("double") + 0.5) / 1e6)
      .withColumn("key_micro", round(log($"u") / $"w6" * 1e6).cast("long"))
    val top = scored.orderBy($"key_micro".desc, $"doc_id").limit(100).collect()
    val heavy = top.count(_.getAs[Long]("doc_id") % 2 == 0)
    assert(heavy >= 80, s"only $heavy/100 winners from the 11x-weight tier")
  }

  test("q87 plan: selection is the bounded-heap aggregate, not a corpus window") {
    val df = TrainPrep.q87WeightedSample(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("partial_bounded_top_k"), s"no map-side bounded top-k:\n$p")
    assert(!p.contains("Window"), s"selection fell back to a corpus window:\n$p")
  }

  test("q88: chunk geometry — coverage, overlap, degenerate single-chunk docs") {
    import spark.implicits._
    val text300 = (0 until 300).map(i => s"t$i").mkString(" ")
    val short = "a b c"
    val docs = Seq((1L, "en", text300, text300.length.toLong),
      (2L, "en", short, short.length.toLong))
      .toDF("doc_id", "lang", "text", "n_chars")
    docs.createOrReplaceTempView("chunk_docs_fixture")
    val toks = text300.split(" ")
    val out = TrainPrep.q88ChunkDocs(spark, dir) // exercise the real table too
    assert(out.limit(1).count() == 1)
    // hand fixture through the same column pipeline
    val chunks = docs.select($"doc_id", $"lang", split($"text", " ").as("toks"))
      .withColumn("n_tokens", size($"toks").cast("long"))
      .select($"doc_id", $"toks", $"n_tokens",
        explode(sequence(lit(0), ($"n_tokens" - 1).cast("int"), lit(TrainPrep.chunkStride)))
          .as("start_tok"))
      .select($"doc_id", $"start_tok",
        least(lit(TrainPrep.chunkTokens.toLong), $"n_tokens" - $"start_tok").as("n_tok"),
        array_join(slice($"toks", $"start_tok" + 1, lit(TrainPrep.chunkTokens)), " ")
          .as("chunk_text"))
      .collect()
    val d1 = chunks.filter(_.getLong(0) == 1L).sortBy(_.getAs[Int]("start_tok"))
    assert(d1.map(_.getAs[Int]("start_tok")).toSeq == Seq(0, 96, 192, 288))
    assert(d1.map(_.getAs[Long]("n_tok")).toSeq == Seq(128L, 128L, 108L, 12L))
    // overlap: each chunk's text is exactly the token slice it claims
    d1.foreach { r =>
      val s = r.getAs[Int]("start_tok")
      val n = r.getAs[Long]("n_tok").toInt
      assert(r.getAs[String]("chunk_text") == toks.slice(s, s + n).mkString(" "))
    }
    // coverage: stride-prefixes concatenated reproduce the document
    val rebuilt = d1.map { r =>
      val s = r.getAs[Int]("start_tok")
      val n = r.getAs[Long]("n_tok").toInt
      toks.slice(s, math.min(s + TrainPrep.chunkStride, s + n))
    }.reduce(_ ++ _)
    assert(rebuilt.toSeq == toks.toSeq)
    val d2 = chunks.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getAs[String]("chunk_text") == short)
  }

  test("q88 plan: chunking is in-row — no hash exchange, no window") {
    val df = TrainPrep.q88ChunkDocs(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the only exchange allowed is the presentation sort's range partitioning
    assert(!p.contains("hashpartitioning"), s"chunking shuffled on a key:\n$p")
    assert(!p.contains("Window"), s"chunking used a window:\n$p")
  }

  test("q91: cross-document boilerplate chunks dedup to their first occurrence") {
    import spark.implicits._
    // doc 1: 224 unique tokens; doc 2 OPENS with doc 1's tokens 96..224
    // (a shared 128-token boilerplate block at different offsets), then
    // diverges — document-grain dedup sees two distinct docs, chunk-grain
    // dedup must collapse the shared window
    val a = (0 until 224).map(i => s"a$i")
    val b = a.slice(96, 224) ++ (0 until 96).map(i => s"b$i")
    val docs = Seq((1L, "en", a.mkString(" ")), (2L, "en", b.mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val chunks = TrainPrep.chunkCore(
      docs.select($"doc_id", $"lang", split($"text", " ").as("toks")))
      .withColumn("fp", md5($"chunk_text"))
      .groupBy($"fp")
      .agg(min(struct($"doc_id", $"chunk_id")).as("first"), count(lit(1)).as("n_copies"))
      .select($"first.doc_id", $"first.chunk_id", $"n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1 chunk 1 = tokens 96..224 == doc 2 chunk 0 → survivor is
    // (1, 1) with 2 copies; doc 2 keeps no chunk 0 of its own
    assert(chunks((1L, 1L)) == 2L, s"shared block not collapsed: $chunks")
    assert(!chunks.contains((2L, 0L)), s"duplicate survived: $chunks")
    // everything else is unique
    assert(chunks.filterNot(_._1 == (1L, 1L)).values.forall(_ == 1L))
  }

  test("q92: chunk-index parquet round-trip gates identically to the inline build") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val inline = TrainPrep.buildChunkIndex(docs.filter($"doc_id" % 3 =!= 0))
    val path = "target/chunk_index"
    inline.write.mode("overwrite").parquet(path)
    val a = TrainPrep.q92ChunkGate(spark, dir).collect().map(_.toSeq).toSeq
    val b = TrainPrep.gateChunksCore(
      spark.read.parquet(path), docs.filter($"doc_id" % 3 === 0))
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
    // every batch doc gets a verdict (chunking always yields ≥ 1 chunk)
    val batchIds = docs.filter($"doc_id" % 3 === 0).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a.map(_.head.asInstanceOf[Long]).toSet == batchIds)
  }

  test("q53: at most 3 terms per doc, ranks dense from 1, scores non-increasing") {
    import spark.implicits._
    val out = TrainPrep.q53Tfidf(spark, dir)
      .as[(Long, String, Double, Int)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (id, g) =>
      val sorted = g.sortBy(_._4)
      assert(sorted.length <= 3 && sorted.map(_._4).toSeq == (1 to sorted.length),
        s"ranks for doc $id")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }, s"scores not non-increasing for doc $id")
    }
  }

  test("q107: v3 pipeline invariants — gate respected, chunks distinct, packing contiguous") {
    import spark.implicits._
    val out = TrainPrep.q107CorpusPipelineV3(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    // (1) every surviving chunk's document passed the q22 gate
    val keep = TextOps.q22Quality(spark, dir).filter($"keep")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall { case (d, _, _, _, _, _) => keep(d) }, "gated doc leaked through")
    // (2) surviving chunks are texturally distinct (replay the window text)
    val toks = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val texts = out.map { case (d, c, _, _, _, _) =>
      toks(d).slice((c * TrainPrep.chunkStride).toInt,
        (c * TrainPrep.chunkStride).toInt + TrainPrep.chunkTokens).mkString(" ")
    }
    assert(texts.distinct.length == texts.length, "duplicate chunk text survived")
    // (3) packing: per lang, offsets follow the running token sum and stay in budget
    out.groupBy(_._3).foreach { case (lang, g) =>
      val ordered = g.sortBy { case (d, c, _, _, _, _) => (d, c) }
      var off = 0L
      ordered.foreach { case (d, c, _, nTok, binId, binOff) =>
        assert(binId == off / TrainPrep.packBudget && binOff == off % TrainPrep.packBudget,
          s"pack drift at ($d,$c) in $lang")
        assert(binOff >= 0 && binOff < TrainPrep.packBudget)
        off += nTok
      }
    }
  }
}
