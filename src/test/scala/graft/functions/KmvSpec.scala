package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV bottom-k distinct sketch (q119 family): the bottom-k set is exact
  * and deterministic, invariant to partitioning, composes under the
  * array-built-in union identity, and its θ estimator lands within the
  * k-governed error band.
  */
class KmvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private def hashes(prefix: String, n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => s"$prefix$i").toDF("item")
      .withColumn("h", PortableHash60.portableHash60($"item"))
  }

  test("bottom-k is exactly the k smallest distinct hashes, duplicates ignored") {
    import spark.implicits._
    val df = hashes("it", 500).union(hashes("it", 500)) // every item twice
    val got = df.agg(Kmv.kmvSketch($"h", 32)).collect()(0)
      .getSeq[Long](0)
    val expect = df.select($"h").distinct().collect().map(_.getLong(0))
      .sorted.take(32).toSeq
    assert(got == expect)
  }

  test("short input: the sketch IS the exact distinct set, ascending") {
    import spark.implicits._
    val got = hashes("s", 10).agg(Kmv.kmvSketch($"h", 64)).collect()(0).getSeq[Long](0)
    assert(got.length == 10 && got == got.sorted)
  }

  test("partition-invariant: 1 vs 7 partitions emit the identical array") {
    import spark.implicits._
    val df = hashes("p", 2000)
    val a = df.coalesce(1).agg(Kmv.kmvSketch($"h", 128)).collect()(0).getSeq[Long](0)
    val b = df.repartition(7).agg(Kmv.kmvSketch($"h", 128)).collect()(0).getSeq[Long](0)
    assert(a == b)
  }

  test("union identity: bottom-k of two sketches' union == sketch of the union") {
    import spark.implicits._
    val a = hashes("a", 3000)
    val b = hashes("b", 3000)
    val skA = a.agg(Kmv.kmvSketch($"h", 64)).collect()(0).getSeq[Long](0)
    val skB = b.agg(Kmv.kmvSketch($"h", 64)).collect()(0).getSeq[Long](0)
    val skU = a.union(b).agg(Kmv.kmvSketch($"h", 64)).collect()(0).getSeq[Long](0)
    val fromParts = (skA ++ skB).distinct.sorted.take(64)
    assert(fromParts == skU)
  }

  test("θ estimator within the k error band (k=256 → ~6% σ; assert 20%)") {
    import spark.implicits._
    val n = 5000
    val k = 256
    val sk = hashes("e", n).agg(Kmv.kmvSketch($"h", k)).collect()(0).getSeq[Long](0)
    assert(sk.length == k)
    val theta = sk.last.toDouble
    val est = (k - 1).toDouble * math.pow(2.0, 60) / theta
    assert(math.abs(est - n) / n <= 0.20, s"est=$est exact=$n")
  }

  test("persisted snapshot sketches compose after a parquet round trip") {
    import spark.implicits._
    val a = hashes("ra", 2000)
    val b = hashes("rb", 2000)
    a.agg(Kmv.kmvSketch($"h", 64).as("sk")).withColumn("snap", lit("a"))
      .union(b.agg(Kmv.kmvSketch($"h", 64).as("sk")).withColumn("snap", lit("b")))
      .write.mode("overwrite").parquet("target/kmv_rt")
    val re = spark.read.parquet("target/kmv_rt")
      .orderBy("snap").collect().map(_.getSeq[Long](0))
    val skU = a.union(b).agg(Kmv.kmvSketch($"h", 64)).collect()(0).getSeq[Long](0)
    assert((re(0) ++ re(1)).distinct.sorted.take(64) == skU)
  }

  test("SQL registration: kmv_sketch") {
    GraftFunctions.register(spark)
    hashes("q", 100).createOrReplaceTempView("kmv_items")
    val got = spark.sql("SELECT size(kmv_sketch(h, 16)) FROM kmv_items")
      .collect()(0).getInt(0)
    assert(got == 16)
  }
}
