package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for SCALE.md's bucketing claim: "bucket the fact tables on the
  * main join keys at write time to eliminate those exchanges entirely."
  * orders ⋈ lineitem both bucketed on the order key must plan a
  * SortMergeJoin with NO shuffle exchange on either side, and the result
  * must equal the plain-parquet join.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "target/bucketing-warehouse")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  val dir = "/root/testdata/sf0.001"

  test("orders ⋈ lineitem co-located via bucketBy: zero shuffle exchanges") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previous JVM's in-memory catalog is gone but its warehouse files
    // survive; CREATE refuses an existing managed-table location
    val warehouse = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(warehouse, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderstatus")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))

    joined.collect() // finalize AQE
    val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    // no exchange may feed the join on either key: bucketing already
    // co-located both sides (the groupBy's own exchange on o_orderstatus
    // is expected and allowed)
    assert(!plan.contains("hashpartitioning(o_orderkey") &&
      !plan.contains("hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles on the join key:\n$plan")

    // same answer as the plain-parquet join
    val expected = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderstatus")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
