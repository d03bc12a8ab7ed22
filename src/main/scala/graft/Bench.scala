package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** Forces computation of EVERY output column: the noop sink consumes all
    * rows in full. `count()` let Catalyst prune projection-only queries to
    * a row count, understating real work.
    */
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up: run the whole suite once at the smallest scale factor so
    // session init, codegen compilation, and JIT are not charged to the
    // measured queries (same plans, tiny data); fall back to a single scan
    // if no sibling sf0.001 exists
    val warmDir = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    if (warmDir.isDirectory && warmDir.getPath != sfDir) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try force(fn(spark, warmDir.getPath)) catch { case _: Throwable => () }
      }
    }
    // touch every measured input once: footer reads + OS page cache, so the
    // first query over each table isn't charged the cold IO (the DuckDB
    // baseline runs against the same warmed files)
    Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { force(fn(spark, sfDir)) } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // measured per-query harness constant: a trivial one-row plan through
    // the same noop sink — scheduling + planning + sink overhead that every
    // query pays regardless of its actual work
    val overhead = {
      val t0 = System.nanoTime()
      (0 until 5).foreach(_ => force(spark.range(1).toDF("x")))
      (System.nanoTime() - t0) / 5e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"overhead_per_query":$overhead,"sf":"$sfDir"}""")
    spark.stop()
  }
}
