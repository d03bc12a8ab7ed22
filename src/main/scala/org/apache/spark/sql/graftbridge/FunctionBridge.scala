package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 keeps `sessionState` (and with it the function registry)
  * `private[sql]`; this bridge exposes exactly the one call needed to
  * register a custom Expression as a SQL-callable temp function on a live
  * session (the imperative twin of `SparkSessionExtensions.injectFunction`,
  * which only applies at session build time).
  */
object FunctionBridge {
  def register(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
