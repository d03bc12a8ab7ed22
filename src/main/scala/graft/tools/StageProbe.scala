package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage breakdown for ONE query: stage name, task count, total
  * executor run time, shuffle bytes — to find which stage of a weak
  * query actually burns the time.
  * Usage: `runMain graft.tools.StageProbe q95` (exact prefix).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      // mirror graft.Bench's session exactly — profiling a different join
      // strategy than the bench measures answers the wrong question
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("q95")
    val (qname, fn) = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.startsWith(name)).get
    def force(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    force() // warm
    val rows = ArrayBuffer.empty[(Int, String, Int, Long, Long, Long)]
    // stage → owning job's description (SQL stages all share the useless
    // CompletableFuture call-site name; the setJobDescription labels the
    // operators set — guide §1.5 — are the only readable attribution)
    val stageJob = scala.collection.concurrent.TrieMap.empty[Int, String]
    val l = new SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        j.stageIds.foreach(sid => stageJob.putIfAbsent(sid, desc))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val label = stageJob.getOrElse(i.stageId, "")
        val nm = if (label.nonEmpty) label.take(60)
          else i.name.takeWhile(_ != '\n').take(60)
        rows += ((i.stageId, nm, i.numTasks,
          m.executorRunTime, m.shuffleWriteMetrics.bytesWritten,
          m.executorDeserializeTime))
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    force()
    org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
    println(f"[stage] $qname total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    rows.sortBy(_._1).foreach { case (id, nm, nt, rt, sw, dt) =>
      println(f"[stage] #$id%-4d tasks=$nt%4d run_ms=$rt%8d deser_ms=$dt%7d shw=$sw%10d  $nm")
    }
    spark.stop()
  }
}
