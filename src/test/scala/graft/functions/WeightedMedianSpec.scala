package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native weighted_median aggregate to the window formulation it
  * replaced (q139's former spelling): per group, min price whose
  * cumulative weight (price asc) clears half the total — on a generated
  * corpus large enough to force partial/final buffer serialization,
  * merges across partitions, map growth past the initial capacity, and
  * duplicate prices split across partitions.
  */
class WeightedMedianSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.ui.enabled", "false")
    // force the OBJECT-HASH partial path (the production config); the
    // sort-based fallback is exercised separately below
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 20).toString)
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private def corpus = {
    import spark.implicits._
    // 50k rows, 400 groups, prices drawn from a 97-value grid so groups
    // carry duplicate prices contributed by DIFFERENT partitions
    spark.range(50000).repartition(11).select(
      pmod(hash($"id"), lit(400)).cast("long").as("p"),
      (pmod(hash($"id" * 31), lit(97)).cast("double") + 1.0).as("price"),
      (pmod(hash($"id" * 17), lit(50)).cast("long") + 1L).as("w"))
  }

  private def viaAgg = {
    import spark.implicits._
    corpus.groupBy($"p")
      .agg(WeightedMedian.weightedMedian($"price", $"w").as("wm"))
      .select($"p", $"wm.w_median", $"wm.total", $"wm.n_prices".cast("long"))
  }

  private def viaWindow = {
    import spark.implicits._
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"p").orderBy($"price")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy($"p")
    corpus
      .groupBy($"p", $"price").agg(sum($"w").as("q"))
      .withColumn("cum", sum($"q").over(wCum))
      .withColumn("t", sum($"q").over(wAll))
      .withColumn("np", count(lit(1)).over(wAll))
      .filter($"cum" * 2 >= $"t")
      .groupBy($"p")
      .agg(min($"price").as("w_median"), max($"t").as("total"),
        max($"np").as("n_prices"))
      .select($"p", $"w_median", $"total", $"n_prices")
  }

  test("weighted_median equals the cumulative-window formulation") {
    val a = viaAgg.collect().map(_.toString).sorted.toSeq
    val w = viaWindow.collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == w)
  }

  test("sort-based fallback (threshold below group count) is bit-identical") {
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "16")
    try {
      val a = viaAgg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 20).toString)
      val b = viaAgg.collect().map(_.toString).sorted.toSeq
      assert(a == b, "fallback path drifted from the hash path")
    } finally spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (1 << 20).toString)
  }

  test("-0.0 and 0.0 are ONE price key (ADVICE r11 canonicalization)") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0.0, 3L), (1L, -0.0, 4L), (1L, 5.0, 1L),
      (2L, -0.0, 2L))
      .toDF("p", "price", "w")
      // spread across partitions so ±0.0 rows meet only in merge()
      .repartition(4)
      .groupBy($"p")
      .agg(WeightedMedian.weightedMedian($"price", $"w").as("wm"))
      .select($"p", $"wm.w_median", $"wm.total", $"wm.n_prices")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getInt(3)))).toMap
    // group 1: ±0.0 collapse to one key of weight 7 (median, and n=2 not 3)
    assert(rows(1L) == ((0.0, 8L, 2)))
    assert(java.lang.Double.doubleToLongBits(rows(1L)._1) == 0L,
      "median of a -0.0-containing group must surface canonical +0.0")
    assert(rows(2L) == ((0.0, 2L, 1)))
  }

  test("null inputs are ignored; an all-null group is NULL") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double], Option[Long])](
      (1L, Some(10.0), Some(5L)), (1L, None, Some(9L)), (1L, Some(20.0), None),
      (2L, None, None))
      .toDF("p", "price", "w")
      .groupBy($"p")
      .agg(WeightedMedian.weightedMedian($"price", $"w").as("wm"))
      .select($"p", $"wm.w_median", $"wm.total", $"wm.n_prices")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else (r.getDouble(1), r.getLong(2), r.getInt(3)))).toMap
    assert(df(1L) == ((10.0, 5L, 1)))
    assert(df(2L) == null)
  }
}
