package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Diagnostic for `Bench`'s `overhead_per_query` constant: measures the
  * trivial one-row noop-sink plan at increasing session age (fresh →
  * after each full suite pass) to separate a REAL per-query harness cost
  * from session-state accumulation (listener backlog, codegen cache,
  * GC pressure) that only the late measurement point would see.
  *
  * Usage: `runMain graft.tools.OverheadProbe [sfDir]` (default sf0.01).
  */
object OverheadProbe {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def trivialSec(spark: SparkSession, reps: Int = 5): Double = {
    val t0 = System.nanoTime()
    (0 until reps).foreach(_ => force(spark.range(1).toDF("x")))
    (System.nanoTime() - t0) / (reps * 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JIT/codegen warm-up for the trivial plan itself, uncharged
    trivialSec(spark, 3)
    println(f"[probe] fresh session:        ${trivialSec(spark)}%.4f s")
    (1 to 3).foreach { i =>
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try force(fn(spark, sfDir)) catch { case _: Throwable => () }
      }
      println(f"[probe] after suite pass $i:  ${trivialSec(spark)}%.4f s")
    }
    System.gc()
    println(f"[probe] after explicit GC:    ${trivialSec(spark)}%.4f s")
    spark.stop()
  }
}
