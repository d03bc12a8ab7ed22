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

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "portable_hash60" -> (es => PortableHash60(es.head)),
    "ddot" -> (es => DotProduct(es(0), es(1), exact = true)),
    "fdot" -> (es => DotProduct(es(0), es(1), exact = false)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      FunctionBridge.register(spark, name, builder)
    }
}
