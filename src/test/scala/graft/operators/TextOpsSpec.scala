package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side replays of the round-5 text-analysis additions: the DuckDB
  * hash gate proves engine parity; these prove the SEMANTICS by recomputing
  * the metrics from the raw text in plain Scala.
  */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val dir = "/root/testdata/sf0.001"

  /** Spark's round(col, s): decimal expansion of the double's shortest
    * string, HALF_UP.
    */
  private def r(x: Double, s: Int): Double =
    JBigDecimal.valueOf(x).setScale(s, RoundingMode.HALF_UP).doubleValue()

  private lazy val texts: Map[Long, Array[String]] =
    graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(row => row.getLong(0) -> row.getString(1).split(" ", -1)).toMap

  test("q59: metrics equal a plain-Scala sliding-window replay") {
    val out = TextOps.q59Repetition(spark, dir).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getDouble(2), row.getDouble(3))).toMap
    val expected = texts.collect { case (id, toks) if toks.length >= 2 =>
      val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      val total = grams.size.toDouble
      id -> (grams.size.toLong,
        r(1.0 - counts.size / total, 6), r(counts.values.max / total, 6))
    }
    assert(out == expected)
  }

  test("q69: logits equal a plain-Scala feature-hash replay; verdicts follow the sigmoid") {
    def h(s: String): Long =
      graft.functions.PortableHash60.hash(s.getBytes("UTF-8"))
    val weights = (0 until TextOps.hashBuckets).map(k => h(s"qw$k") % 2001 - 1000)
    val out = TextOps.q69HashClassifier(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out.keySet == texts.keySet)
    texts.foreach { case (id, toks) =>
      val acc = toks.map(t => weights((h(t) % TextOps.hashBuckets).toInt)).sum
      val logit = acc.toDouble / (toks.length.toDouble * 1000.0)
      val (n, gotLogit, score, keep) = out(id)
      assert(n == toks.length.toLong && gotLogit == logit, s"doc $id logit")
      assert(math.abs(score - 1.0 / (1.0 + math.exp(-logit))) < 1e-6, s"doc $id score")
      assert(keep == (score >= 0.5), s"doc $id keep")
    }
    // the deterministic weights actually separate: both verdicts occur
    assert(out.values.exists(_._4) && out.values.exists(!_._4))
  }

  test("q60: log-prob equals a plain-Scala corpus-MLE replay; common beats rare") {
    val corpusCw: Map[String, Long] =
      texts.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = corpusCw.values.sum.toDouble
    val out = TextOps.q60UnigramLm(spark, dir).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getDouble(2))).toMap
    val expected = texts.map { case (id, toks) =>
      val microSum = toks.groupBy(identity).map { case (w, ts) =>
        val tf = ts.size.toLong
        JBigDecimal.valueOf(tf * math.log(corpusCw(w) / nTotal) * 1e6)
          .setScale(0, RoundingMode.HALF_UP).longValue()
      }.sum
      id -> (toks.length.toLong, microSum.toDouble / (toks.length.toDouble * 1e6))
    }
    assert(out == expected)
    // the score orders documents by how typical their tokens are
    val maxCw = corpusCw.values.max.toDouble
    val minCw = corpusCw.values.min.toDouble
    out.values.foreach { case (_, lp) =>
      assert(lp <= math.log(maxCw / nTotal) + 1e-6 &&
        lp >= math.log(minCw / nTotal) - 1e-6)
    }
  }

  test("q95: BM25 scores equal a plain-Scala replay of the exact-rational spelling") {
    import spark.implicits._
    val out = TextOps.q95Bm25(spark, dir).collect()
      .map(row => (row.getLong(0), row.getLong(1)) -> (row.getDouble(2), row.getInt(3))).toMap
    // plain-Scala replay, same arithmetic: micro-fixed idf, exact-rational
    // tf norm, integer sums
    val tf = texts.map { case (id, toks) =>
      id -> toks.groupBy(identity).map { case (w, ts) => w -> ts.size.toLong }
    }
    val dlen = tf.map { case (id, m) => id -> m.values.sum }
    val nDocs = dlen.size.toLong
    val lTotal = dlen.values.sum
    val expected = TextOps.bm25Queries.flatMap { case (qid, qtext) =>
      val terms = qtext.split(" ").toSeq
      val idfMicro = terms.map { t =>
        val df = tf.count(_._2.contains(t)).toLong
        t -> JBigDecimal.valueOf(
          math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
          .setScale(0, RoundingMode.HALF_UP).longValue()
      }.toMap
      val scores = tf.toSeq.flatMap { case (id, m) =>
        val sMicro = terms.flatMap { t =>
          m.get(t).map { f =>
            val num = (22L * f * lTotal).toDouble
            val den = (10L * lTotal * f + 3L * lTotal + 9L * dlen(id) * nDocs).toDouble
            JBigDecimal.valueOf(idfMicro(t) * num / den)
              .setScale(0, RoundingMode.HALF_UP).longValue()
          }
        }.sum
        if (sMicro != 0L || terms.exists(m.contains)) Some(id -> sMicro) else None
      }
      scores.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex.map {
        case ((id, s), i) => (qid, id) -> (s.toDouble / 1e6, i + 1)
      }
    }.toMap
    assert(out == expected)
    // ranks dense, scores non-increasing within each query
    TextOps.bm25Queries.foreach { case (qid, _) =>
      val rows = out.collect { case ((q, _), (s, rk)) if q == qid => (rk, s) }.toSeq.sorted
      assert(rows.map(_._1) == (1 to rows.size))
      assert(rows.map(_._2).reverse == rows.map(_._2).sorted)
    }
  }

  test("q105: the parquet-persisted text index retrieves score-identical to the from-text path") {
    import spark.implicits._
    val idxDir = java.nio.file.Files.createTempDirectory("text_index").toString
    TextOps.buildTextIndex(graft.Tables.documents(spark, dir))
      .write.mode("overwrite").parquet(idxDir)
    val fromDisk = TextOps.bm25FromIndex(
        spark.read.parquet(idxDir), TextOps.bm25Queries.toDF("qid", "qtext"))
      .orderBy($"qid", $"rk").collect().map(_.toSeq).toSeq
    val fromText = TextOps.q95Bm25(spark, dir).collect().map(_.toSeq).toSeq
    assert(fromDisk == fromText && fromDisk.nonEmpty)
  }

  test("q128: fusion equals an RRF replay over the q95 candidates and q22 prior") {
    val bm = TextOps.q95Bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    val quality = TextOps.q22Quality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val expected = bm.groupBy(_._1._1).flatMap { case (qid, cands) =>
      val qrk = cands.keys.toSeq.map(_._2)
        .sortBy(d => (-quality(d), d)).zipWithIndex
        .map { case (d, i) => d -> (i + 1) }.toMap
      val fused = cands.map { case ((_, d), brk) =>
        d -> (brk, qrk(d),
          math.round(1e6 / (brk + TextOps.rrfK)) + math.round(1e6 / (qrk(d) + TextOps.rrfK)))
      }
      val frk = fused.toSeq.sortBy { case (d, (_, _, m)) => (-m, d) }.zipWithIndex
        .map { case ((d, _), i) => d -> (i + 1) }.toMap
      fused.map { case (d, (brk, qr, m)) => (qid, d) -> (brk, qr, m / 1e6, frk(d)) }
    }
    val out = TextOps.q128RrfFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getDouble(4), r.getInt(5))).toMap
    assert(out == expected && out.nonEmpty)
  }

  test("q126: PMI equals a plain-Scala bigram replay; ranking is the declared total order") {
    val out = TextOps.q126PmiCollocations(spark, dir).collect()
      .map(row => (row.getString(0), row.getString(1)) ->
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getDouble(5)))
    // plain-Scala replay of the whole statistic from the raw text
    val uni = texts.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = texts.values.map(_.length.toLong).sum
    val bgAll = texts.values.toSeq.flatMap(ws => ws.zip(ws.drop(1)))
    val b = bgAll.size.toLong
    val pc = bgAll.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= TextOps.pmiMinSupport).toMap
    val expected = pc.map { case ((w1, w2), nxy) =>
      val micro = math.round(math.log(
        (nxy.toDouble * t * t) / (b.toDouble * uni(w1) * uni(w2))) * 1e6)
      (w1, w2) -> (nxy, uni(w1), uni(w2), micro)
    }
    out.foreach { case (pair, (nxy, nx, ny, pmi)) =>
      val (enxy, enx, eny, emicro) = expected(pair)
      assert((nxy, nx, ny) == (enxy, enx, eny), s"counts for $pair")
      assert(pmi == emicro / 1e6, s"pmi for $pair")
    }
    // the emitted page is exactly the top-k of the replay's total order
    val want = expected.toSeq
      .sortBy { case ((w1, w2), (_, _, _, m)) => (-m, w1, w2) }
      .take(TextOps.pmiTopK).map(_._1)
    assert(out.map(_._1).toSeq == want)
  }
}
