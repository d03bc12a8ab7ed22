package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch natives (q118 family): the no-undercount guarantee,
  * exactness when the grid is collision-free, bit-equal merge across any
  * partitioning/grouping, and the SQL registration path.
  */
class CountMinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  /** items: "w<i>" occurring i times, i = 1..32 — 528 rows, known counts. */
  private def items: DataFrame = {
    import spark.implicits._
    (1 to 32).flatMap(i => Seq.fill(i)(s"w$i")).toDF("item")
      .withColumn("h", PortableHash60.portableHash60($"item"))
  }

  test("never undercounts, and is exact when 32 items spread over width 4096") {
    import spark.implicits._
    val sk = items.agg(CountMin.cmSketch($"h", 4, 4096).as("sk"))
    val est = items.distinct()
      .crossJoin(sk)
      .select($"item", CountMin.cmQuery($"sk", $"h").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 32).foreach { i =>
      assert(est(s"w$i") >= i.toLong, s"undercount on w$i")
      // 32 items in a 4×4096 grid: the chance ALL 4 rows collide for any
      // item is vanishing; with fixed hashes this is a deterministic fact
      assert(est(s"w$i") == i.toLong, s"collision inflated w$i: ${est(s"w$i")}")
    }
  }

  test("unknown items estimate 0 on a collision-free grid") {
    import spark.implicits._
    val sk = items.agg(CountMin.cmSketch($"h", 4, 4096).as("sk"))
    val miss = Seq("absent1", "absent2").toDF("item")
      .withColumn("h", PortableHash60.portableHash60($"item"))
      .crossJoin(sk)
      .select(CountMin.cmQuery($"sk", $"h").as("est"))
      .collect().map(_.getLong(0))
    assert(miss.forall(_ == 0L))
  }

  test("weighted insert over a count table is bit-equal to the row-wise build") {
    import spark.implicits._
    val direct = items.coalesce(1)
      .agg(CountMin.cmSketch($"h", 4, 1024)).collect()(0).getAs[Array[Byte]](0)
    val counted = items.groupBy($"item")
      .agg(first($"h").as("h"), count(lit(1)).as("cnt"))
      .repartition(5)
      .agg(CountMin.cmSketchW($"h", $"cnt", 4, 1024))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, counted),
      "cm_sketch_w over (item, cnt) must equal cm_sketch over the stream")
  }

  test("merge of partial sketches is bit-equal to the direct build, any partitioning") {
    import spark.implicits._
    val direct = items.coalesce(1)
      .agg(CountMin.cmSketch($"h", 4, 1024)).collect()(0).getAs[Array[Byte]](0)
    val spread = items.repartition(7)
      .agg(CountMin.cmSketch($"h", 4, 1024)).collect()(0).getAs[Array[Byte]](0)
    val merged = items.withColumn("part", $"h" % 5)
      .groupBy($"part").agg(CountMin.cmSketch($"h", 4, 1024).as("p"))
      .agg(CountMin.cmMerge($"p")).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, spread))
    assert(java.util.Arrays.equals(direct, merged))
  }

  test("persisted partials re-merge to the direct bytes (parquet round trip)") {
    import spark.implicits._
    items.withColumn("part", $"h" % 3)
      .groupBy($"part").agg(CountMin.cmSketch($"h", 4, 1024).as("p"))
      .write.mode("overwrite").parquet("target/cm_rt")
    val direct = items
      .agg(CountMin.cmSketch($"h", 4, 1024)).collect()(0).getAs[Array[Byte]](0)
    val reloaded = spark.read.parquet("target/cm_rt")
      .agg(CountMin.cmMerge($"p")).collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, reloaded))
  }

  test("SQL registration: cm_sketch / cm_merge / cm_query") {
    GraftFunctions.register(spark)
    items.createOrReplaceTempView("cm_items")
    val row = spark.sql(
      """SELECT cm_query(cm_sketch(h, 4, 4096), portable_hash60('w32')) AS est
        |FROM cm_items""".stripMargin).collect()(0)
    assert(row.getLong(0) == 32L)
  }
}
