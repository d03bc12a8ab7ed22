package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cluster builder is config-as-code for SCALE.md's deployment
  * claims — pin the knobs so a refactor can't silently drop one, and
  * prove a session built from it still runs this library's plans.
  *
  * Test etiquette: suites in this JVM share one SparkContext through
  * getOrCreate, so this spec must NOT stop the session, and it restores
  * every runtime conf it touches (static confs like the Kryo serializer
  * only apply to a fresh context — asserted only in that case).
  */
class SessionsSpec extends AnyFunSuite {

  test("clusterBuilder carries the documented scale knobs and runs a real query") {
    val fresh = org.apache.spark.sql.SparkSession.getActiveSession.isEmpty &&
      org.apache.spark.sql.SparkSession.getDefaultSession.isEmpty
    val watched = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.files.maxPartitionBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val spark = Sessions.clusterBuilder(shufflePartitions = 8)
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val prior = watched.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      val c = spark.conf
      assert(c.get("spark.sql.shuffle.partitions") == "8")
      assert(c.get("spark.sql.adaptive.enabled") == "true")
      assert(c.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(c.get("spark.sql.files.maxPartitionBytes") == (128L * 1024 * 1024).toString)
      assert(c.get("spark.sql.autoBroadcastJoinThreshold") == (64L * 1024 * 1024).toString)
      assert(c.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
      if (fresh)
        assert(spark.sparkContext.getConf.get("spark.serializer")
          .endsWith("KryoSerializer"))
      val rows = graft.operators.Relational
        .q1Agg(spark, "/root/testdata/sf0.001").collect()
      assert(rows.nonEmpty)
    } finally {
      // leave the shared session running with its previous runtime confs
      prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
