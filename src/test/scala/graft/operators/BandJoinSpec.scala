package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q81 keyless time-band join: the bucketed plan must reproduce the naive
  * non-equi join's pair set exactly (each pair meets in exactly one epoch
  * combination), with no nested-loop/cartesian operator in the plan.
  */
class BandJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val dir = "/root/testdata/sf0.001"

  test("q81 equals the naive |Δt| ≤ δ join, brute-forced in plain Scala") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .selectExpr("ts div 1000 AS c_us", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val purchases = ev.filter($"event_type" === "purchase")
      .selectExpr("event_id", "ts div 1000 AS p_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clicks.nonEmpty && purchases.nonEmpty)
    // mirror the operator's DECIMAL(18,2) value quantization (Spark's
    // double→decimal cast is HALF_UP on the shortest decimal repr, which
    // scala.BigDecimal(Double) reproduces)
    val expected = purchases.map { case (id, p) =>
      val near = clicks.filter(c => math.abs(c._1 - p) <= ScaleOps.BandUs)
      val v = near.map(c => BigDecimal(c._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _)
      id -> ((near.length.toLong, v.toDouble))
    }.toMap
    val got = ScaleOps.q81BandJoin(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet,
      "every purchase must appear exactly once (zero-match rows included)")
    got.foreach { case (id, (n, v)) =>
      assert(n == expected(id)._1, s"pair count for purchase $id")
      assert(math.abs(v - expected(id)._2) < 1e-9, s"value sum for purchase $id")
    }
    assert(got.values.exists(_._1 > 0), "fixture produced no nearby pairs")
    assert(got.values.exists(_._1 == 0),
      "fixture has no zero-match purchase — left-join path untested")
  }

  test("q81 plan: equi-join on epoch, no nested-loop or cartesian operator") {
    val df = ScaleOps.q81BandJoin(spark, dir)
    df.collect() // AQE-finalize
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"band predicate fell back to a nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product present:\n$p")
  }
}
