package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q72 passage-level exact dedup: the CCNet/C4 line-dedup move on 16-token
  * passages — the globally-first occurrence of each passage survives,
  * documents are rebuilt in passage order, and the plan stays window-free
  * (first-occurrence is a groupBy(fp) min, not a window over a
  * content-derived key).
  */
class PassageDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  // doc 0: 3 passages (two full + ragged tail), all novel
  // doc 1: first passage repeats doc 0's p0; novel ragged tail
  // doc 2: exact copy of doc 0 — every passage already seen
  // doc 3: the same 16-token passage twice — within-doc repeat
  private lazy val corpusDir: String = {
    import spark.implicits._
    val d0 = toks("a", 35)
    val d1 = toks("a", 16) + " " + toks("b", 5)
    val d2 = d0
    val d3 = toks("c", 16) + " " + toks("c", 16)
    val dir = Files.createTempDirectory("passage_docs").toString
    Seq((0L, d0, "en", "s0"), (1L, d1, "en", "s0"),
        (2L, d2, "en", "s0"), (3L, d3, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("global first occurrence survives; documents rebuild in passage order") {
    val rows = Dedup.q72PassageDedup(spark, corpusDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rows(0L) == ((3L, 3L, toks("a", 35))))
    assert(rows(1L) == ((2L, 1L, toks("b", 5))))
    assert(rows(2L) == ((3L, 0L, "")))
    assert(rows(3L) == ((2L, 1L, toks("c", 16))))
  }

  test("every distinct passage is kept exactly once across the corpus") {
    val out = Dedup.q72PassageDedup(spark, corpusDir).collect()
    val totalKept = out.map(_.getLong(2)).sum
    val totalPassages = out.map(_.getLong(1)).sum
    // distinct passages in the corpus: d0 p0/p1/tail, d1 tail, d3 p0
    assert(totalKept == 5L)
    assert(totalPassages == 10L)
  }

  test("passages partition the token stream: full reassembly equals the original text") {
    import spark.implicits._
    // random corpora: tokens of varied length incl. the 16-boundary edges;
    // concatenating ALL passages in order must reproduce every document
    val rnd = new scala.util.Random(7)
    val docs = (0 until 64).map { id =>
      val n = Seq(1, 15, 16, 17, 31, 32, 33, rnd.nextInt(120) + 1)(id % 8)
      (id.toLong, (0 until n).map(i => s"t${rnd.nextInt(9)}_$i").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val rebuilt = Dedup.passages(df)
      .groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.sort_array(
            org.apache.spark.sql.functions.collect_list(
              org.apache.spark.sql.functions.struct($"pidx", $"ptext"))),
          s => s.getField("ptext"))).as("rebuilt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text) => assert(rebuilt(id) == text, s"doc $id") }
  }

  test("q76 gate: persisted index probes like inline; self-index rejects all; empty index admits all") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
    // round trip: the index written to parquet and reloaded gates identically
    val inline = Dedup.gatePassages(Dedup.buildPassageIndex(docs), docs)
      .collect().map(_.toString).sorted.toSeq
    val path = java.nio.file.Files.createTempDirectory("pidx").toString + "/index"
    Dedup.buildPassageIndex(docs).write.parquet(path)
    val reloaded = Dedup.gatePassages(spark.read.parquet(path), docs)
      .collect().map(_.toString).sorted.toSeq
    assert(inline == reloaded)
    // self-index: every passage is a duplicate, nothing is admitted
    Dedup.gatePassages(Dedup.buildPassageIndex(docs), docs).collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2) && !r.getBoolean(3), r.toString)
    }
    // empty index: zero duplicates, everything is admitted
    val empty = Dedup.buildPassageIndex(docs.filter($"doc_id" < 0))
    Dedup.gatePassages(empty, docs).collect().foreach { r =>
      assert(r.getLong(2) == 0L && r.getBoolean(3), r.toString)
    }
  }

  test("q77: overlapping windows catch whole-copy, shifted-prefix, within-doc and sub-window cases") {
    import spark.implicits._
    val d0 = toks("a", 35)                       // 20 windows, all duplicated by d2
    val d1 = toks("a", 16) + " " + toks("b", 5)  // 6 windows, only w0 (= d0's w0) duplicated
    val d2 = d0                                   // exact copy
    val d3 = toks("c", 16) + " " + toks("c", 16) // within-doc repeats only: NOT cross-doc dups
    val d4 = toks("d", 7)                        // shorter than one window: 0 windows
    val dir = java.nio.file.Files.createTempDirectory("dupsub_docs").toString
    Seq((0L, d0), (1L, d1), (2L, d2), (3L, d3), (4L, d4))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.q77DupSubstrings(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(0L) == ((20L, 20L, 1.0)))
    assert(rows(1L) == ((6L, 1L, 0.166667)))
    assert(rows(2L) == ((20L, 20L, 1.0)))
    assert(rows(3L) == ((17L, 0L, 0.0)))
    assert(rows(4L) == ((0L, 0L, 0.0)))
  }

  test("q78: duplicated spans cut at any alignment; the shifted copy q72 misses is caught") {
    import spark.implicits._
    val W = Dedup.PassageTokens
    val base = toks("x", 40)
    val docs = Seq(
      0L -> base,                           // first occurrence — survives whole
      1L -> (toks("j", 5) + " " + base),    // SHIFTED copy behind a junk prefix
      2L -> base,                           // exact whole-document copy
      3L -> (toks("y", 20) + " " + toks("y", 20)), // within-doc repeat
      4L -> toks("s", 7))                   // shorter than one window
    // brute-force reference of the policy: window fp = the window text
    // itself; first occurrence by (doc_id, widx); kept windows merge into
    // contiguous spans; the rebuild concatenates span texts
    val wins = for {
      (id, text) <- docs; t = text.split(" "); i <- 0 to t.length - W
    } yield (t.slice(i, i + W).mkString(" "), id, i)
    val firsts = wins.groupBy(_._1).map { case (fp, ws) =>
      fp -> ws.map(w => (w._2, w._3)).min }
    val expected = docs.map { case (id, text) =>
      val t = text.split(" ")
      if (t.length < W) id -> ((t.length.toLong, t.length.toLong, 1L, text))
      else {
        val keptStarts = (0 to t.length - W)
          .filter(i => firsts(t.slice(i, i + W).mkString(" ")) == ((id, i)))
        val spans = keptStarts.foldLeft(Vector.empty[(Int, Int)]) { case (acc, s) =>
          if (acc.nonEmpty && s <= acc.last._2 + 1) acc.init :+ ((acc.last._1, s + W - 1))
          else acc :+ ((s, s + W - 1))
        }
        val clean = spans.map { case (lo, hi) => t.slice(lo, hi + 1).mkString(" ") }.mkString(" ")
        id -> ((t.length.toLong, spans.map(sp => (sp._2 - sp._1 + 1).toLong).sum,
          spans.length.toLong, clean))
      }
    }.toMap
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.exactSubstrRewriteFrame(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got == expected)
    // the cases that matter: the shifted copy loses its duplicated core
    // (only the junk prefix + straddle fringe survives) ...
    assert(got(1L)._2 < got(1L)._1 && got(1L)._4.startsWith("j0"),
      s"shifted copy not cut: ${got(1L)}")
    // ... while q72's aligned passages see nothing to remove there
    val q72 = Dedup.passageDedupFrame(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(q72(1L)._1 == q72(1L)._2, "q72 unexpectedly cut the shifted copy")
    // the exact whole-copy keeps nothing; the original keeps everything
    assert(got(2L) == ((40L, 0L, 0L, "")))
    assert(got(0L) == ((40L, 40L, 1L, base)))
  }

  test("plan: window-free, no cartesian; first-occurrence shuffles on fp") {
    val df = Dedup.q72PassageDedup(spark, corpusDir)
    val plan = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window, Join}
    assert(plan.collect { case w: Window => w }.isEmpty,
      "passage dedup must not window over a content-derived key")
    assert(plan.collect {
      case j: Join if j.condition.isEmpty => j
    }.isEmpty, "no cartesian product")
    val physical = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(physical.contains("hashpartitioning(fp"),
      s"first-occurrence aggregate should shuffle on fp:\n$physical")
    // q78: same discipline — the span merge is an in-row fold, never a
    // window over the content-derived fp key; no cartesian anywhere
    val df78 = Dedup.q78ExactSubstrRewrite(spark, corpusDir)
    val plan78 = df78.queryExecution.optimizedPlan
    assert(plan78.collect { case w: Window => w }.isEmpty,
      "q78 must not window over a content-derived key")
    assert(plan78.collect {
      case j: Join if j.condition.isEmpty => j
    }.isEmpty, "q78: no cartesian product")
    val phys78 = df78.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(phys78.contains("hashpartitioning(fp"),
      s"q78 first-occurrence aggregate should shuffle on fp:\n$phys78")
    // the kept windows are the per-fp minima themselves — no probe join
    // back to the window stream, so the single codegen'd window explode
    // (one Generate over the index range, fingerprint as a top-level
    // projection) is instantiated ONCE — inside the first-occurrence
    // index cache build; the steady-state plan reads the cache and
    // never re-fingerprints. Counted over EXECUTED (codegen-id-stamped)
    // nodes: the formatted string also prints each cached AQE region's
    // "== Initial Plan ==" duplicates, which carry no codegen id.
    val nGenerate = phys78.linesIterator
      .count(_.trim.matches("\\(\\d+\\) Generate \\[codegen id.*"))
    assert(nGenerate == 1,
      s"window explode instantiated more than once ($nGenerate Generate nodes):\n$phys78")
  }
}
