package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Exchange-volume meter: runs a body under a [[SparkListener]] and
  * returns the total shuffle bytes written and read by its tasks.
  *
  * This is what turns "the plan you'd want at 100×" into a REGRESSION
  * GATE instead of narrative: `ShuffleBudgetSpec` pins each heavy
  * query's shuffle volume at a fixed scale factor, so a refactor that
  * silently adds an exchange (or widens one — a dropped projection, a
  * lost broadcast) fails a test long before a benchmark or a cluster
  * bill notices. PlanSpec pins plan SHAPES; this pins the BYTES.
  */
object ShuffleMeter {

  final case class Stats(writeBytes: Long, readBytes: Long, tasks: Long,
      maxTaskPeakMem: Long, maxTaskMs: Long, maxTaskCpuMs: Long)

  private def maxUpdate(a: AtomicLong, v: Long): Unit = {
    var cur = a.get
    while (v > cur && !a.compareAndSet(cur, v)) cur = a.get
  }

  def measure(spark: SparkSession)(body: => Unit): Stats = {
    val w = new AtomicLong; val r = new AtomicLong; val n = new AtomicLong
    val pk = new AtomicLong; val ms = new AtomicLong; val cpu = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          w.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          r.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          n.incrementAndGet()
          maxUpdate(pk, m.peakExecutionMemory)
          maxUpdate(ms, m.executorRunTime)
          maxUpdate(cpu, m.executorCpuTime / 1000000L)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    Stats(w.get, r.get, n.get, pk.get, ms.get, cpu.get)
  }
}

/** Prints per-query shuffle-write/read bytes (the budget source for
  * `ShuffleBudgetSpec`). Usage:
  * `runMain graft.tools.ShuffleProbe [q54,q56,...]`;
  * env SPARK_GRAFT_SF_DIR (default sf0.01).
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = args.headOption.map(_.split(",").map(_.trim).toSet)
    val queries = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.forall(_.exists(p => n.startsWith(p))) }
    queries.foreach { case (name, fn) =>
      try {
        val s = ShuffleMeter.measure(spark) {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        println(f"[shuffle] $name%-28s write=${s.writeBytes}%12d read=${s.readBytes}%12d tasks=${s.tasks}%6d")
      } catch { case e: Throwable =>
        println(s"[shuffle] $name FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
