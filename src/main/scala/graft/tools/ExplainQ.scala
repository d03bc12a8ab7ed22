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
    // --all <outDir>: one session, every declared query — execute through
    // the noop sink and write each AQE-final formatted plan to
    // <outDir>/<name>.txt (the §1 "plan shape per query" evidence without
    // paying a JVM start per query)
    if (args.head == "--all") {
      val outDir = java.nio.file.Paths.get(args(1))
      // in --all mode args(1) is the OUTPUT dir; the data dir is args(2)
      // or the env/default (the generic sfDir parse above misreads it)
      val allSf = args.drop(2).headOption
        .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
        .getOrElse("/root/testdata/sf0.01")
      java.nio.file.Files.createDirectories(outDir)
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val df = fn(spark, allSf)
          df.write.format("noop").mode("overwrite").save()
          java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"),
            s"=== $name (AQE final) ===\n" + df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) + "\n")
        } catch {
          case e: Throwable => println(s"[explainq] $name failed: ${e.getMessage}")
        }
      }
      println(s"[explainq] wrote ${graft.SparkEntry.queries.size} plans to $outDir")
      spark.stop()
      return
    }
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
