package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Core relational operators (SURVEY.md §2.2/§2.3/§2.5) expressed over the
  * driver's synthetic tables.
  *
  * Determinism notes for the DuckDB oracle: floating-point SUM/AVG are
  * order-dependent, and Spark's partial-aggregation order differs from
  * DuckDB's sequential scan. Every money/quantity aggregate therefore runs
  * over `DECIMAL(18,2)` (exact, associative) and casts the final result to
  * double, which is bit-identical in both engines.
  */
object Relational {

  /** Exact decimal sum of a double column, surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Pricing-summary aggregate (reference A2/A5-style multi-stat groupBy;
    * shape of TPC-H Q1). Map-side partial aggregation keeps the shuffle to
    * |groups| rows per partition — scales to any input size.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 4)))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
}
