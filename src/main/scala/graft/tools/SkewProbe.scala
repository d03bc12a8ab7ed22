package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Relational, ScaleOps}

/** The paired skew measurement behind the q165/q166 twins (VERDICT r13
  * #4): salted vs unsalted on a genuinely HOT key, under the join
  * strategy a 100 TB deployment actually has.
  *
  * Why the suite pair alone can't show the benefit: at test scale the
  * per-user dimension fits the 64 MB broadcast threshold, so the plain
  * spelling never shuffles the fact side — broadcast probe + map-side
  * partial aggregation absorb the hot key entirely (that finding is
  * itself part of the scale story: broadcast + partial agg are Spark's
  * FIRST line of skew defense, and salting only matters once the
  * dimension outgrows broadcast). This probe pins `shuffle_hash` on the
  * dimension side — the plan shape of a billions-of-users dimension that
  * cannot broadcast — and measures five spellings of the identical
  * aggregate (row-identical by the q165/q166 oracle hash):
  *
  *   broadcast      — the shipped q165 plan (baseline, skew absorbed)
  *   straggler      — shuffle join + agg on the raw hot key: ONE reducer
  *                    owns 80% of the corpus end-to-end
  *   salt_1level    — the former q37 pinned spelling: the JOIN spreads
  *                    over salts, but
  *                    the single-level aggregate re-concentrates the hot
  *                    key on one reducer
  *   salt_2phase    — the former q166 pinned spelling (now
  *                    AdaptiveSkew's Salted arm): partial agg per (user, salt)
  *                    fuses with the join stage; only |users|×salts
  *                    partial rows reach the final merge
  *   adaptive       — AdaptiveSkew.decide under this regime (broadcast
  *                    disabled): stats-sized salt count, expected to
  *                    at-or-beat salt_2phase
  *
  * AQE's skew-join split cannot rescue the straggler: the aggregate
  * consumes the join's hash partitioning, so splitting the skewed
  * partition would violate the downstream distribution requirement —
  * exactly the manual salt's remit.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.SkewProbe
  * Prints one JSON line {"broadcast":s,"straggler":s,...} (min of 2).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1p")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.file.transferTo", "false") // see Bench.scala
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val salts = 8
    def events = ScaleOps.skewedDemoEvents(spark, sfDir)
    def userDim = events.groupBy($"user_id").agg(count(lit(1)).as("user_total"))
    def finish(joined: DataFrame): DataFrame = joined
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        first($"user_total").as("user_total"),
        Relational.dsum($"value").as("total_value"))

    val plans: Seq[(String, () => DataFrame)] = Seq(
      "broadcast" -> (() => finish(events.join(userDim, Seq("user_id")))),
      "straggler" -> (() =>
        finish(events.join(userDim.hint("shuffle_hash"), Seq("user_id")))),
      "salt_1level" -> (() => {
        val se = events.withColumn("salt", pmod($"event_id", lit(salts)).cast("int"))
        val sd = userDim.crossJoin(
          spark.range(salts).select($"id".cast("int").as("salt")))
        finish(se.join(sd.hint("shuffle_hash"), Seq("user_id", "salt")))
      }),
      "salt_2phase" -> (() => {
        val se = events.withColumn("salt", pmod($"event_id", lit(salts)).cast("int"))
        val sd = userDim.crossJoin(
          spark.range(salts).select($"id".cast("int").as("salt")))
        val d = graft.functions.DecScaledLong.decScaledLong($"value", 2)
        se.join(sd.hint("shuffle_hash"), Seq("user_id", "salt"))
          .groupBy($"user_id", $"salt")
          .agg(count(lit(1)).as("n_p"), first($"user_total").as("ut_p"),
            sum(d).as("v_p"))
          .groupBy($"user_id")
          .agg(sum($"n_p").as("n_events"), first($"ut_p").as("user_total"),
            (sum($"v_p").cast("double") / 100).as("total_value"))
      }),
      // the CHOOSER under this probe's emulated regime (dim too big to
      // broadcast): decision made once, plan-time, from the same stats
      // every row sees; the timed body is the chosen spelling over the
      // same recomputed dim as every other row, so the comparison is
      // execution-vs-execution. Expected: Salted(ceil(hotShare×cpus)),
      // at-or-beating salt_2phase (same shape, stats-sized salt count).
      "adaptive" -> (() => {
        import graft.operators.AdaptiveSkew
        val policy = AdaptiveSkew.SkewPolicy(
          broadcastBytesLimit = -1L, parallelism = cpus.toInt)
        val spelling = AdaptiveSkew.decide(
          AdaptiveSkew.statsFromDim(userDim, "user_total"), policy)
        System.err.println(s"[skewprobe] adaptive chose: $spelling")
        AdaptiveSkew.userDimJoinAgg(spark, events, userDim, spelling)
      }))

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Wall-clock alone under-reports the straggler on this box: at ≤10 M
    // events the per-variant fixed cost (corpus scan + dim aggregate,
    // parallel over all 32 threads) dominates, so the hot reducer's
    // serial tail hides inside it. The MAX TASK DURATION is the number
    // that scales as hot-rows/1 for the straggler but hot-rows/salts for
    // the salted spellings — i.e. the single-thread wall a 1000-executor
    // cluster cannot parallelize away. Collected per variant via a
    // listener; task-end events are async, so a short drain sleep bounds
    // the undercount (reps take seconds; the bus drains in ms).
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val d = te.taskInfo.duration
          var cur = maxTask.get
          while (d > cur && !maxTask.compareAndSet(cur, d)) cur = maxTask.get
        }
      })
    // warm: page cache + codegen for every variant once
    plans.foreach { case (_, f) => force(f()) }
    val times = plans.map { case (name, f) =>
      maxTask.set(0)
      val reps = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        force(f())
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(300) // drain the listener bus before reading maxTask
      name -> (reps.min, maxTask.get / 1e3)
    }
    val line = times.map { case (k, (v, _)) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",", ",") +
      times.map { case (k, (_, mt)) => s""""$k":${f"$mt%.3f"}""" }
        .mkString(""""max_task":{""", ",", "}") +
      s""","sf":"$sfDir","salts":$salts}"""
    val rawOut = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    rawOut.println("\n" + line)
    spark.stop()
  }
}
