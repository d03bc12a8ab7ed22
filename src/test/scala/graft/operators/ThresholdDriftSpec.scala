package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bench-vs-verify drift canary (VERDICT r10 #8): Bench and Verify run
  * with a 64 MB `autoBroadcastJoinThreshold` (Sessions.clusterBuilder's
  * deployment value); the ScalaTest sessions and any ad-hoc session
  * default to 10 MB. Round 10 caught q9's left-semi silently broadcasting
  * all 6M lineitem keys only because the two configs planned DIFFERENT
  * joins — this spec pins the property that protects against the next
  * such divergence: a broadcast-threshold-sensitive query must return
  * IDENTICAL rows whichever physical join the threshold picks. Runs the
  * proven-sensitive case (q9) plus the two queries this round re-planned
  * away from threshold dependence (q152's shuffle-hash hint, q147's
  * artifact ride), at both thresholds in one session.
  */
class ThresholdDriftSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private val dir = "/root/testdata/sf0.01"
  private val sensitive = Seq("q9_semi", "q152_ship_latency", "q147_abc_class")

  for (name <- sensitive) {
    test(s"$name: identical rows at 10 MB and 64 MB broadcast thresholds") {
      val fn = graft.SparkEntry.queries(name)
      def rowsAt(threshold: Long): Seq[String] = {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
        try fn(spark, dir).collect().map(_.toString).sorted.toSeq
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          (10L * 1024 * 1024).toString)
      }
      val small = rowsAt(10L * 1024 * 1024)
      val large = rowsAt(64L * 1024 * 1024)
      assert(small.nonEmpty && small == large,
        s"$name drifted between broadcast thresholds — the benched plan " +
          "is not the verified plan")
    }
  }
}
