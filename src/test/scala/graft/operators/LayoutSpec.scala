package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for SCALE.md's partitioned-layout claim: "at 100 TB add
  * partitioned layout (date/region) so partition pruning removes whole
  * files before IO; the query code does not change." A documents corpus
  * written `partitionBy(lang)` and filtered on lang must plan with the
  * partition filter in PartitionFilters (pruned BEFORE the scan), read
  * only that partition's files, and return the identical rows the
  * unpartitioned layout returns.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  val dir = "/root/testdata/sf0.001"
  val layout = "target/layout_docs"

  test("partitionBy(lang) layout: filter prunes partitions before IO, rows identical") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.write.mode("overwrite").partitionBy("lang").parquet(layout)

    val q = spark.read.parquet(layout).filter($"lang" === "en")
      .select($"doc_id", $"lang", $"n_chars")
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      plan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("lang")),
      s"lang filter did not reach PartitionFilters:\n$plan")

    // only the en partition's files are planned for IO
    val files = q.queryExecution.executedPlan.collectLeaves().flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
      case _ => Array.empty[String]
    }
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"scan planned non-pruned files: ${files.filterNot(_.contains("lang=en")).take(3)}")

    // identical rows to the unpartitioned layout
    val got = q.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val want = docs.filter($"lang" === "en")
      .select($"doc_id", $"lang", $"n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }
}
