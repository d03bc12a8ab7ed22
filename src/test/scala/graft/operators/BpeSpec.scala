package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning (TrainPrep.bpeLearn): agreement with an in-memory
  * reference implementation on the classic corpus, greedy-merge edge
  * cases (overlapping pairs), partition invariance, and determinism on
  * the real corpus.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  /** Reference BPE: word-count table, greedy left-to-right merge, argmax
    * by (count desc, left asc, right asc).
    */
  private def refBpe(words: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
    var tbl: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) => w.split("").filter(_.nonEmpty).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) rank = n + 1
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, c))
        tbl = tbl.map { case (syms, cnt) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (acc.nonEmpty && acc.last == l && x == r) acc(acc.length - 1) = l + r
            else acc += x
          }
          acc.toVector -> cnt
        }
        rank += 1
      }
    }
    out.toSeq
  }

  private def learn(text: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    TrainPrep.bpeLearn(text.toDF("text"), n).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
  }

  test("classic corpus: merges equal the reference implementation") {
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest widest",
      "widest widest")
    val words = docs.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    assert(learn(docs, 6) == refBpe(words, 6))
  }

  test("overlapping-pair greedy merge: 'aaaa' merges left-to-right non-overlapping") {
    // pair (a,a) on "aaaa": greedy gives [aa, aa]; next round learns (aa,aa)
    val got = learn(Seq("aaaa aaaa aaaa"), 2)
    assert(got(0)._2 == "a" && got(0)._3 == "a")
    assert(got(1) == ((2, "aa", "aa", got(1)._4)))
  }

  test("batched round-trips: disjoint top pairs land in ONE batch, reference-equal") {
    // four frequent pairs over disjoint alphabets with strictly separated
    // counts — the acceptance proof admits all four in a single driver
    // round-trip, and the result must still equal the sequential reference
    val docs = Seq(
      Seq.fill(40)("xy").mkString(" "),
      Seq.fill(30)("qr").mkString(" "),
      Seq.fill(20)("mn").mkString(" "),
      Seq.fill(10)("uv").mkString(" "))
    val words = docs.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    assert(learn(docs, 4) == refBpe(words, 4))
    // the prefix-acceptance rule itself: all four are provably independent
    val top = Seq(("x", "y", 40L), ("q", "r", 30L), ("m", "n", 20L), ("u", "v", 10L))
    assert(TrainPrep.bpeAcceptPrefix(top, 4) == top)
    // overlapping runner-up ends the batch at one: merging (e,s) rewrites
    // (s,t) occurrences, so (s,t) may not ride along
    val clash = Seq(("e", "s", 9L), ("s", "t", 9L), ("l", "o", 7L))
    assert(TrainPrep.bpeAcceptPrefix(clash, 3) == clash.take(1))
    // cross-batch minting collision: a candidate whose merged symbol
    // string-equals a symbol minted in an EARLIER batch (here "xy",
    // re-minted via a different split) may not ride in a batch — its
    // created occurrences merge into an existing pair's count, breaking
    // the created-pair dominance bound. Mid-batch: stop before it.
    assert(TrainPrep.bpeAcceptPrefix(top, 4, minted = Set("mn")) == top.take(2))
    // at the head: the argmax itself is still correct alone, but nothing
    // may be batched behind it
    assert(TrainPrep.bpeAcceptPrefix(top, 4, minted = Set("xy")) == top.take(1))
  }

  test("partition-invariant and deterministic on the real corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").select($"text")
    val a = TrainPrep.bpeLearn(docs, 5).collect().toSeq
    val b = TrainPrep.bpeLearn(docs.repartition(7), 5).collect().toSeq
    assert(a == b)
    assert(a.length == 5 && a.map(_.getLong(3)).forall(_ > 0))
  }
}
