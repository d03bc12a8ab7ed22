package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.FunctionBridge

/** The library's native expressions surfaced as SQL functions, two ways:
  *
  *  - [[GraftFunctions.register]] on a live session (tests, notebooks):
  *    `spark.sql("SELECT portable_hash60(text), ddot(e1, e2) ...")`
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build time
  *    (cluster deployments) — same function list via
  *    `SparkSessionExtensions.injectFunction`.
  */
object GraftFunctions {

  /** Static parameters (k, bit counts) arrive as SQL literals; anything
    * non-foldable is a caller error worth a clear message.
    */
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def numLit(e: Expression, fn: String, arg: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toDouble
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: java.math.BigDecimal, _) =>
      v.doubleValue()
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.sql.types.Decimal, _) =>
      v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a numeric literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "portable_hash60" -> (es => PortableHash60(es.head)),
    "ddot" -> (es => DotProduct(es(0), es(1), exact = true)),
    "fdot" -> (es => DotProduct(es(0), es(1), exact = false)),
    // aggregates: the registry hands the analyzer the raw AggregateFunction
    // and it wraps the AggregateExpression itself (built-in agg pattern)
    "bounded_top_k" -> (es =>
      TopKAgg(es(0), es(1), intLit(es(2), "bounded_top_k", "k"))),
    "mg_sketch" -> (es =>
      MgSketchAgg(es(0), intLit(es(1), "mg_sketch", "k"))),
    "bitset_or" -> (es =>
      BitsetOrAgg(es(0), intLit(es(1), "bitset_or", "numBits"))),
    "hll_sketch" -> (es =>
      HllSketchAgg(es(0), intLit(es(1), "hll_sketch", "p"))),
    "hll_merge" -> (es => HllMergeAgg(es.head)),
    "hll_est" -> (es => HllEstimate(es.head)),
    "hist_sketch" -> (es => HistSketchAgg(es(0),
      numLit(es(1), "hist_sketch", "lo"), numLit(es(2), "hist_sketch", "hi"),
      intLit(es(3), "hist_sketch", "buckets"))),
    "hist_merge" -> (es => HistMergeAgg(es.head)),
    "hist_quantile" -> (es => HistQuantile(es(0),
      numLit(es(1), "hist_quantile", "q"))),
    "cm_sketch" -> (es => CmSketchAgg(es(0),
      intLit(es(1), "cm_sketch", "depth"), intLit(es(2), "cm_sketch", "width"))),
    "cm_merge" -> (es => CmMergeAgg(es.head)),
    "cm_query" -> (es => CmQuery(es(0), es(1))),
    "kmv_sketch" -> (es =>
      KmvAgg(es(0), intLit(es(1), "kmv_sketch", "k"))),
    "bloom_positions" -> (es => BloomPositions(es(0),
      intLit(es(1), "bloom_positions", "numBits"),
      intLit(es(2), "bloom_positions", "numHashes"))),
    "bloom_count" -> (es => BloomCount(es(0), es(1),
      intLit(es(2), "bloom_count", "numBits"),
      intLit(es(3), "bloom_count", "numHashes"))),
    "bloom_contains" -> (es => BloomContains(es(0), es(1),
      intLit(es(2), "bloom_contains", "numBits"),
      intLit(es(3), "bloom_contains", "numHashes"))),
    "zorder2" -> (es => Zorder2(es(0), es(1))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      FunctionBridge.register(spark, name, builder)
    }
}
