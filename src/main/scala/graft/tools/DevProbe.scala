package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc forked experiment runner (dev-only): times named query variants
  * under the exact Bench session config, min-of-N warm, so plan
  * experiments never run inside sbt's small unforked JVM.
  *
  * Usage: runMain graft.tools.DevProbe <sfDir> <n> <name>[,<name>...]
  * where each name is a key of [[graft.SparkEntry.queries]] or a
  * `conf:k=v` directive applied before subsequent names.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // this VM's kernel serializes the mmap/munmap churn of NIO
      // transferTo shuffle-file merges (mmap_lock + TLB-shootdown storms:
      // 27 of 31 task threads stuck in FileChannelImpl.map0/unmap0 while
      // the box sat 97% idle); plain stream copy avoids mmap entirely
      .config("spark.file.transferTo", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach {
      case conf if conf.startsWith("conf:") =>
        val Array(k, v) = conf.stripPrefix("conf:").split("=", 2)
        spark.conf.set(k, v)
        println(s"[devprobe] set $k=$v")
      case name =>
        val fn = graft.SparkEntry.queries(name)
        force(fn(spark, sfDir)) // warm
        val best = (1 to n).map(_ => force(fn(spark, sfDir))).min
        println(f"[devprobe] $name%-28s min-of-$n $best%8.3f s")
    }
    spark.stop()
  }
}
