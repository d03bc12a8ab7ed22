package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The hot-bucket contract of [[Dedup.boundedPairs]]: a pathologically hot
  * key (here one key holding thousands of values, the "all rights reserved"
  * shingle of a 100 TB corpus) must flow through bounded-size rows — no
  * single giant posting-list array — while the emitted pair set stays
  * EXACTLY the all-pairs set, and sub-cap groups degenerate to the legacy
  * single-collect shape.
  */
class BoundedPairsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private def df(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("hot key: every materialized posting-list row is bounded by cap") {
    val hot = df((0L until 5000L).map(v => ("hot", v)) ++ Seq(("cold", 1L), ("cold", 2L)))
    val cap = 100
    val lists = Dedup.chunkedPostingLists(hot, Seq("k"), "v", cap)
      .select(col("k"), size(col("_vs")).as("sz"), col("_nch"))
      .collect()
    assert(lists.nonEmpty)
    assert(lists.forall(_.getAs[Int]("sz") <= cap),
      s"unbounded posting row: ${lists.map(_.getAs[Int]("sz")).max} > $cap")
    val hotChunks = lists.filter(_.getAs[String]("k") == "hot")
    assert(hotChunks.length == 50 && hotChunks.forall(_.getAs[Int]("_nch") == 50))
  }

  test("hot key: chunked expansion still emits exactly the all-pairs set") {
    // 401 values with cap 25 → 17 chunks, one ragged: C(401,2) = 80200 pairs
    val n = 401L
    val hot = df((0L until n).map(v => ("hot", v)))
    val pairs = Dedup.boundedPairs(hot, Seq("k"), "v", cap = 25)
    val got = pairs.select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == (n * (n - 1) / 2).toInt)
    assert(got.distinct.length == got.length, "duplicate pairs emitted")
    assert(got.forall { case (a, b) => a < b }, "unordered pair emitted")
  }

  test("multi-key data: capped output equals the uncapped output exactly") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 400).map { i => (s"k${rng.nextInt(7)}", i.toLong) }
    val data = df(rows)
    def collected(cap: Int) =
      Dedup.boundedPairs(data, Seq("k"), "v", cap)
        .select(col("k"), col("a"), col("b")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // cap larger than any group → legacy single-collect path; tiny cap →
    // every group chunked; the pair sets must be identical
    assert(collected(1000) == collected(5))
  }

  test("validate mode: duplicate values within a key group raise, distinct pass unchanged") {
    val dup = df(Seq(("k", 1L), ("k", 2L), ("k", 2L)))
    val ex = intercept[Exception] {
      Dedup.boundedPairs(dup, Seq("k"), "v", cap = 25, validate = true).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("boundedPairs precondition")), ex.toString)
    val ok = df((0L until 40L).map(v => ("k", v)))
    def rows(validate: Boolean) =
      Dedup.boundedPairs(ok, Seq("k"), "v", cap = 25, validate = validate)
        .select(col("k"), col("a"), col("b")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rows(true) == rows(false))
  }

  test("q26 stop-shingle cap: huge maxDf is a no-op, maxDf=0 drops everything") {
    val dir = "/root/testdata/sf0.001"
    val base = Dedup.shingleJaccardPairs(spark, dir, 0.5, None).collect().map(_.toSeq).toSeq
    val wide = Dedup.shingleJaccardPairs(spark, dir, 0.5, Some(1000000)).collect().map(_.toSeq).toSeq
    assert(base == wide, "an un-triggered df cap changed q26 output")
    assert(Dedup.shingleJaccardPairs(spark, dir, 0.5, Some(0)).count() == 0)
  }
}
