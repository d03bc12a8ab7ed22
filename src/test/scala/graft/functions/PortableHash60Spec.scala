package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The native expression must be bit-identical to the built-in
  * `conv(substring(md5(s), 1, 15), 16, 10)` formulation the oracle uses,
  * in both codegen and interpreted paths.
  */
class PortableHash60Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  test("matches the conv(substring(md5)) formulation on varied inputs") {
    import spark.implicits._
    val samples = (Seq("", "a", "the quick brown fox", "über ¢hars 中文",
      "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0") ++
      (0 until 500).map(i => s"shingle $i token ${i * 7}")).toDF("s")
    val both = samples.select(
      PortableHash60.portableHash60($"s").as("native"),
      conv(substring(md5($"s"), 1, 15), 16, 10).cast(LongType).as("builtin"))
    assert(both.filter($"native" =!= $"builtin").count() == 0)
    // values are 60-bit non-negative
    assert(both.filter($"native" < 0 || $"native" > (1L << 60)).count() == 0)
  }

  test("null propagates (NullIntolerant)") {
    import spark.implicits._
    val df = Seq(Some("x"), None).toDF("s")
    val out = df.select(PortableHash60.portableHash60($"s")).collect()
    assert(out.count(_.isNullAt(0)) == 1)
  }
}
