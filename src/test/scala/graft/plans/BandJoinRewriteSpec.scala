package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The naive-band-join optimizer rule: fires on the quadratic shape,
  * preserves semantics row-for-row, and leaves already-scalable joins
  * alone.
  */
class BandJoinRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val dir = "/root/testdata/sf0.001"

  /** The session is SHARED across suites in this JVM — scope the rule to
    * each test so other suites plan with stock Catalyst.
    */
  private def withRule[A](f: => A): A =
    try { BandJoinRewrite.install(spark); f }
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BandJoinRewrite)
    }

  private def purchases: DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, dir).filter($"event_type" === "purchase")
      .select($"event_id", expr("ts div 1000").as("p_us"))
  }
  private def clicks: DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, dir).filter($"event_type" === "click")
      .select(expr("ts div 1000").as("c_us"), $"value")
  }

  test("naive |a-b| <= δ join is rewritten: no nested loop, pairs identical to stock Catalyst") {
    import spark.implicits._
    val bandUs = graft.operators.ScaleOps.BandUs
    def naive = purchases.join(clicks, abs($"p_us" - $"c_us") <= lit(bandUs))
    val stock = naive.collect().map(_.toSeq).toSet // BNLJ, rule not installed
    val (rewritten, plan) = withRule {
      val df = naive
      val rows = df.collect().map(_.toSeq).toSet
      (rows, df.queryExecution.executedPlan.toString)
    }
    assert(rewritten == stock, "rewrite changed the pair set")
    assert(rewritten.nonEmpty, "fixture produced no band pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire — nested loop survived:\n$plan")
    assert(plan.contains("graft_band_epoch"), s"epoch key missing from plan:\n$plan")
    // and without the rule the same query IS the quadratic plan
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), "stock plan unexpectedly not a BNLJ")
  }

  test("δ on the other side of >= and swapped operand order still fire") {
    import spark.implicits._
    val bandUs = graft.operators.ScaleOps.BandUs
    withRule {
      val df = purchases.join(clicks, lit(bandUs) >= abs($"c_us" - $"p_us"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), s"swapped form not rewritten:\n$p")
    }
  }

  test("a join that already has a cross-side equality is left alone") {
    import spark.implicits._
    val l = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_id", expr("ts div 1000").as("p_us"))
    val r = graft.Tables.events(spark, dir)
      .select($"user_id".as("uid"), expr("ts div 1000").as("c_us"))
    withRule {
      val df = l.join(r, $"user_id" === $"uid" &&
        abs($"p_us" - $"c_us") <= lit(60000000L))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("graft_band_epoch"),
        s"rule fired despite an existing equality key:\n$p")
    }
  }

  test("non-positive δ and non-long operands are left alone") {
    import spark.implicits._
    withRule {
      val df = purchases.join(clicks, abs($"p_us" - $"c_us") <= lit(-5L))
      assert(df.count() == 0L) // vacuous band, but must not crash or rewrite
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("graft_band_epoch"), s"rewrote a non-positive band:\n$p")
      val dbl = purchases.withColumn("pd", $"p_us".cast("double"))
        .join(clicks.withColumn("cd", $"c_us".cast("double")),
          abs(col("pd") - col("cd")) <= lit(1e6))
      dbl.collect()
      assert(!dbl.queryExecution.executedPlan.toString.contains("graft_band_epoch"),
        "rewrote a double-typed band (epoch floor semantics unproven there)")
    }
  }
}
