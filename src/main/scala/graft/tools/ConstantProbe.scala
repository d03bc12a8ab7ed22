package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only A/B probe for the fixed per-plan constant that dominates the
  * sf0.1 bench gap (VERDICT r8: 29 queries >2x DuckDB on pure overhead —
  * no scan, shuffle, or operator in those plans explains the seconds).
  *
  * Times a representative slice of the weak list under runtime-settable
  * config variants (AQE on/off, post-shuffle coalescing aggressiveness,
  * broadcast threshold) in ONE session so JIT/codegen warmth is shared
  * and the delta is attributable to the config alone.
  *
  * Usage: `runMain graft.tools.ConstantProbe [q127,q139,...]`
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object ConstantProbe {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // context-level (non-runtime-settable) confs for this whole probe run,
    // e.g. SPARK_GRAFT_CONF="spark.shuffle.compress=false;spark.foo=1"
    val extra = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2)).collect { case Array(k, v) => k -> v }
    val builder = SparkSession.builder()
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
    extra.foreach { case (k, v) => builder.config(k, v) }
    if (extra.nonEmpty) println(s"[probe] extra conf: ${extra.mkString(", ")}")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wanted: Seq[String] = args.headOption
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q127_market_basket", "q139_weighted_median",
        "q153_revenue_bridge", "q145_assoc_rules", "q112", "q106", "q95",
        "q77", "q56"))
    val queries = graft.SparkEntry.queries.toSeq
      .filter { case (n, _) => wanted.exists(w => n == w || n.startsWith(w + "_") || n.startsWith(w)) }
      .sortBy(_._1)
    println(s"[probe] queries: ${queries.map(_._1).mkString(", ")}")

    // each variant: (label, set, unset) using runtime confs only
    val variantFilter = sys.env.get("SPARK_GRAFT_VARIANTS")
      .map(_.split(",").map(_.trim).toSet)
    val variants: Seq[(String, Map[String, String])] = Seq(
      "baseline" -> Map.empty[String, String],
      "aqe_off" -> Map("spark.sql.adaptive.enabled" -> "false"),
      "coalesce_1" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256m"),
      "bcast_64m" -> Map(
        "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString),
      "combo" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256m",
        "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString),
      "combo_aqe_off" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString)
    ).filter { case (l, _) => variantFilter.forall(_.contains(l)) }

    // global warm-up (JIT + page cache) on baseline conf
    queries.foreach { case (_, fn) =>
      try force(fn(spark, sfDir)) catch { case e: Throwable =>
        println(s"[probe] warm fail: ${e.getMessage}") }
    }

    val defaults = variants.flatMap(_._2.keys).distinct
      .map(k => k -> spark.conf.getOption(k)).toMap

    val results = variants.map { case (label, confs) =>
      defaults.foreach { case (k, v) =>
        v match { case Some(x) => spark.conf.set(k, x); case None => spark.conf.unset(k) }
      }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      def pass(): Map[String, Double] = queries.map { case (n, fn) =>
        val t0 = System.nanoTime()
        try { force(fn(spark, sfDir)); n -> (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => n -> -1.0 }
      }.toMap
      val p1 = pass(); val p2 = pass()
      val best = queries.map { case (n, _) => n -> math.min(p1(n), p2(n)) }.toMap
      label -> best
    }

    println(f"${"query"}%-28s" + variants.map(v => f"${v._1}%14s").mkString)
    queries.foreach { case (n, _) =>
      println(f"$n%-28s" + results.map { case (_, m) => f"${m(n)}%14.2f" }.mkString)
    }
    println(f"${"TOTAL"}%-28s" + results.map { case (_, m) =>
      f"${m.values.filter(_ >= 0).sum}%14.2f" }.mkString)
    spark.stop()
  }
}
