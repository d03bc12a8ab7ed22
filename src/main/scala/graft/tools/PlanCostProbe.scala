package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Decomposes a weak query's wall time into ANALYSIS+PLANNING (driver,
  * before the first job), EXECUTION (jobs/stages/tasks), and counts the
  * jobs and stages — to see whether the sf0.1 constant is plan-side or
  * barrier-side. Usage: `runMain graft.tools.PlanCostProbe [names]`.
  */
object PlanCostProbe {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wanted = args.headOption
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q127", "q139", "q153", "q145", "q112", "q106", "q95", "q1_"))
    val queries = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.startsWith) }

    val jobs = new AtomicLong; val stages = new AtomicLong; val taskSum = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskSum.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
    })

    // warm both plans and data
    queries.foreach { case (_, fn) => try force(fn(spark, sfDir)) catch { case _: Throwable => () } }

    println(f"${"query"}%-26s${"build+plan_s"}%14s${"exec_s"}%10s${"jobs"}%6s${"stages"}%8s${"task_cpu_s"}%12s")
    queries.foreach { case (name, fn) =>
      // best of 2 full measurements to shed transient noise
      val meas = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force analysis + optimization + physical planning
        val t1 = System.nanoTime()
        jobs.set(0); stages.set(0); taskSum.set(0)
        force(df)
        org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, jobs.get, stages.get, taskSum.get / 1e3)
      }.minBy(m => m._1 + m._2)
      println(f"$name%-26s${meas._1}%14.3f${meas._2}%10.3f${meas._3}%6d${meas._4}%8d${meas._5}%12.2f")
    }
    spark.stop()
  }
}
