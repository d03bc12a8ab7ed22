package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the AQE-final executed plan of one registered query (exact
  * prefix match), with the same session config the bench measures.
  * Usage: `runMain graft.tools.ExplainQ q127 [sfDir]`.
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.drop(1).headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (name, fn) = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.startsWith(args.head)).get
    val df = fn(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val body =
      if (args.contains("--formatted"))
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      else df.queryExecution.executedPlan.toString
    val text = s"=== $name (AQE final) ===\n$body"
    // --out <path>: write the plan to a file unmangled (sbt's forked-run
    // logger prefixes every stdout line, which corrupts committed plan
    // artifacts under plans/)
    args.sliding(2).collectFirst { case Array("--out", p) => p } match {
      case Some(p) =>
        val f = java.nio.file.Paths.get(p)
        Option(f.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(f, text + "\n")
        println(s"[explainq] wrote $p")
      case None => println(text)
    }
    spark.stop()
  }
}
