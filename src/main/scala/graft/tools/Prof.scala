package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler: times labeled sub-pipelines of the pair-family
  * queries through the same noop sink the bench uses. Not part of any
  * driver contract.
  */
object Prof {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def t(name: String)(df: => DataFrame): Unit = {
    val d = df
    force(d) // warm
    val t0 = System.nanoTime()
    force(d)
    println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    import spark.implicits._
    import graft.operators.Dedup

    if (args.contains("agg")) {
      // oracle-parity decimal aggregation vs the double sums a production
      // deployment would use (sensitivity for SCALE.md)
      t("q1: decimal (oracle parity)")(graft.operators.Relational.q1Agg(spark, dir))
      t("q1: double sums") {
        graft.Tables.lineitem(spark, dir)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum($"l_quantity").as("sum_qty"),
            sum($"l_extendedprice").as("sum_base_price"),
            sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
            count(lit(1)).as("n_rows"))
      }
      t("q1: scan only")(graft.Tables.lineitem(spark, dir)
        .select($"l_returnflag", $"l_linestatus", $"l_quantity",
          $"l_extendedprice", $"l_discount"))
      spark.stop(); return
    }
    if (args.contains("bm25")) {
      import graft.operators.TextOps
      val docs = graft.Tables.spreadBy(graft.Tables.documents(spark, dir), "doc_id")
      t("q95: raw scan")(graft.Tables.documents(spark, dir).select($"doc_id", $"text"))
      t("q95: spreadBy scan")(docs.select($"doc_id", $"text"))
      val padded = concat(lit(" "), replace($"text", lit(" "), lit("  ")), lit(" "))
      t("q95: perDoc len only")(docs.select($"doc_id",
        (length($"text") - length(replace($"text", lit(" "))) + 1L).as("len")))
      val terms = Seq("fast", "hash", "join", "stream", "window", "agg", "slow", "table", "scan")
      t("q95: perDoc full (9 tf)")(docs
        .select($"doc_id", $"text", padded.as("padded"))
        .select($"doc_id",
          (length($"text") - length(replace($"text", lit(" "))) + 1L).as("len"),
          array(terms.map { tm =>
            ((length($"padded") - length(replace($"padded", lit(s" $tm "))))
              / lit(tm.length + 2)).cast("long")
          }: _*).as("tfs")))
      t("q95: full")(TextOps.q95Bm25(spark, dir))
      t("q105: full")(TextOps.q105Bm25Indexed(spark, dir))
      spark.stop(); return
    }
    if (args.contains("wav")) {
      import graft.operators.Multimodal
      t("q47: wav encode only")(Multimodal.wavTable(spark, dir))
      t("q47: full")(Multimodal.q47AudioDecode(spark, dir))
      val t0 = System.nanoTime()
      var i = 0L
      while (i < 1000) { Multimodal.decodeWavScalar(Multimodal.syntheticWav(i)); i += 1 }
      println(f"[prof] 1000 single-thread synth+decode: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // pure-JVM multithreaded run — isolates codec-level lock contention
      // from Spark plan structure
      val nThreads = cpus.toInt
      val perThread = 5000 / nThreads
      val t1 = System.nanoTime()
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          var j = 0L
          while (j < perThread) {
            Multimodal.decodeWavScalar(Multimodal.syntheticWav(t * perThread + j)); j += 1
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      println(f"[prof] 5000 on $nThreads threads:       ${(System.nanoTime() - t1) / 1e9}%.2f s")
      spark.stop(); return
    }
    if (args.contains("plan")) {
      // dump the physical plan skeleton of any SparkEntry query
      val name = args(args.indexOf("plan") + 1)
      val p = graft.SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(p)
      spark.stop(); return
    }
    if (args.contains("cc")) {
      import graft.operators.Dedup
      // round structure of the two CC formulations on the real band graph
      val bandsDf = Dedup.q28MinhashPairs(spark, dir)
      t("q28 pairs (edge input)")(bandsDf)
      val t0 = System.nanoTime()
      val viaEdges = Dedup.connectedComponents(
        Dedup.q28MinhashPairs(spark, dir)
          .select($"doc_a".as("u"), $"doc_b".as("v")))
      force(viaEdges)
      println(f"[prof] edge CC end-to-end:          ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      val viaMembership = Dedup.membershipComponents(
        Dedup.probeBands(spark, dir), Seq("band", "r0", "r1"), "doc_id")
      force(viaMembership)
      println(f"[prof] membership CC end-to-end:    ${(System.nanoTime() - t1) / 1e9}%.2f s")
      t("q48 full")(Dedup.q48NeardupClusters(spark, dir))
      spark.stop(); return
    }
    if (args.contains("dims")) {
      // q6 stage decomposition: where does a 5-way dim join spend time?
      val li = graft.Tables.lineitem(spark, dir)
      val o = graft.Tables.orders(spark, dir)
      val c = graft.Tables.customer(spark, dir)
      val n = graft.Tables.nation(spark, dir)
      val r = graft.Tables.region(spark, dir)
      t("q6: li scan")(li.select($"l_orderkey", $"l_extendedprice", $"l_discount"))
      t("q6: li join o")(li.join(o, $"l_orderkey" === $"o_orderkey")
        .select($"l_extendedprice", $"o_custkey"))
      t("q6: li join bcast(o)")(li.join(broadcast(o), $"l_orderkey" === $"o_orderkey")
        .select($"l_extendedprice", $"o_custkey"))
      t("q6: full")(graft.operators.Relational.q6JoinDims(spark, dir))
      t("q6: full, bcast o+c") {
        li.join(broadcast(o), $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(graft.operators.Relational
            .dsumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"r_name")
      }
      t("q4: full")(graft.operators.Relational.q4Clock(spark, dir))
      spark.stop(); return
    }
    t("q44: sketch32")(Dedup.simhashSketch(spark, dir, 32))
    t("q44: sketch+bands") {
      val sk = Dedup.simhashSketch(spark, dir, 32)
      val nibbles = (0 until 4).map { b =>
        struct(lit(b).as("band"), shiftright($"simhash", 8 * b).bitwiseAND(255).as("key"))
      }
      sk.select($"doc_id", $"simhash", explode(array(nibbles: _*)).as("bk"))
        .select($"bk.band".as("band"), $"bk.key".as("key"),
          struct($"doc_id", $"simhash").as("v"))
    }
    t("q44: +chunkedLists") {
      val sk = Dedup.simhashSketch(spark, dir, 32)
      val nibbles = (0 until 4).map { b =>
        struct(lit(b).as("band"), shiftright($"simhash", 8 * b).bitwiseAND(255).as("key"))
      }
      Dedup.chunkedPostingLists(
        sk.select($"doc_id", $"simhash", explode(array(nibbles: _*)).as("bk"))
          .select($"bk.band".as("band"), $"bk.key".as("key"),
            struct($"doc_id", $"simhash").as("v")),
        Seq("band", "key"), "v", Dedup.hotBucketCap)
    }
    t("q44: +boundedPairs") {
      val sk = Dedup.simhashSketch(spark, dir, 32)
      val nibbles = (0 until 4).map { b =>
        struct(lit(b).as("band"), shiftright($"simhash", 8 * b).bitwiseAND(255).as("key"))
      }
      Dedup.boundedPairs(
        sk.select($"doc_id", $"simhash", explode(array(nibbles: _*)).as("bk"))
          .select($"bk.band".as("band"), $"bk.key".as("key"),
            struct($"doc_id", $"simhash").as("v")),
        Seq("band", "key"), "v")
    }
    if (args.contains("explain")) {
      val p = Dedup.q44SimhashPairs(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      println("[plan] q44:\n" + p.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Sort") ||
          l.contains("Window") || l.contains("Aggregate") || l.contains("Generate"))
        .mkString("\n"))
    }
    if (args.contains("r8")) {
      import graft.Tables
      import org.apache.spark.sql.expressions.Window
      // shuffle-byte meter: local wall-clock hides the network cost that
      // dominates on a real cluster, so the A/B reads each exchange's own
      // write metrics off the executed plan (records + bytes)
      def tb(name: String)(df: => DataFrame): Unit = {
        val d = df
        force(d) // warm
        val d2 = df // fresh plan so metrics are this run's only
        val t0 = System.nanoTime()
        // collect, not the noop sink: DataFrameWriter spawns its OWN
        // QueryExecution, so metrics must be read off a plan an action on
        // THIS frame executed (outputs here are ≤ k·groups rows)
        d2.collect()
        val secs = (System.nanoTime() - t0) / 1e9
        def exchanges(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] =
          p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              exchanges(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              exchanges(q.plan) // Result/Shuffle/Broadcast stages are leaves
            case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
              s +: s.children.flatMap(exchanges)
            case other => other.children.flatMap(exchanges)
          }
        val ex = exchanges(d2.queryExecution.executedPlan).distinct
        if (sys.props.contains("graft.profdebug")) {
          println(s"[prof-debug] ${ex.size} exchanges; keys=" +
            ex.headOption.map(_.metrics.keys.mkString(",")).getOrElse("-") +
            "; plan root=" + d2.queryExecution.executedPlan.getClass.getSimpleName)
          d2.queryExecution.executedPlan match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              println("[prof-debug] inner:\n" + a.executedPlan.treeString)
            case _ => ()
          }
        }
        val bytes = ex.map(_.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)).sum
        val recs = ex.map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum
        println(f"[prof] $name%-28s $secs%.2f s  shuffle=${bytes / 1024}%d KiB ($recs%d rows)")
      }
      // q83 A/B: native bounded-heap aggregate vs the row_number window
      tb("q83: native bounded_top_k")(
        graft.operators.ScaleOps.q83TopkPerGroup(spark, dir))
      tb("q83: row_number window") {
        val w = Window.partitionBy($"event_type")
          .orderBy($"value".desc, $"event_id".asc)
        Tables.events(spark, dir)
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter($"rank" <= 5)
          .select($"event_type", $"rank", $"event_id", $"value")
      }
      // q81 A/B: bucketed band join vs the naive non-equi join Catalyst
      // plans as BroadcastNestedLoopJoin (|L|·|R| predicate evals)
      t("q81: bucketed band join")(
        graft.operators.ScaleOps.q81BandJoin(spark, dir))
      t("q81: naive BNLJ") {
        val ev = Tables.events(spark, dir)
        val c = ev.filter($"event_type" === "click")
          .select(expr("ts div 1000").as("c_us"), $"value")
        val p = ev.filter($"event_type" === "purchase")
          .select($"event_id", expr("ts div 1000").as("p_us"))
        p.join(c, abs($"c_us" - $"p_us") <= graft.operators.ScaleOps.BandUs, "left")
          .groupBy($"event_id")
          .agg(count($"c_us").as("n_nearby"),
            sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("nearby_value"))
      }
      spark.stop(); return
    }
    if (args.contains("r8b")) {
      import graft.Tables
      def tb(name: String)(df: => DataFrame): Unit = {
        val d = df
        force(d) // warm
        val d2 = df
        val t0 = System.nanoTime()
        force(d2) // per-doc outputs are corpus-sized: noop sink, not collect
        val secs = (System.nanoTime() - t0) / 1e9
        // the noop sink runs its own QueryExecution, so read the metrics
        // off the plan Spark's listener attached to the LAST execution:
        // simplest robust form — re-run through collect on the small ones
        println(f"[prof] $name%-32s $secs%.2f s")
      }
      def tm(name: String)(df: => DataFrame): Unit = {
        val d = df
        d.collect() // warm
        val d2 = df
        val t0 = System.nanoTime()
        d2.collect()
        val secs = (System.nanoTime() - t0) / 1e9
        def exchanges(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] =
          p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              exchanges(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              exchanges(q.plan)
            case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
              s +: s.children.flatMap(exchanges)
            case other => other.children.flatMap(exchanges)
          }
        val ex = exchanges(d2.queryExecution.executedPlan)
        val bytes = ex.map(_.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)).sum
        val recs = ex.map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum
        println(f"[prof] $name%-32s $secs%.2f s  shuffle=${bytes / 1024}%d KiB ($recs%d rows)")
      }
      // q85 A/B: scan-side bloom gate (corpus never shuffles) vs the exact
      // q52 semi-join spelling (every (doc, gram) pair shuffles)
      val benchBits = {
        val b = graft.operators.TrainPrep.bloomBuild(
          Tables.documents(spark, dir)
            .filter($"doc_id" % 97 === 0)
            .select(explode(graft.functions.ShingleFunctions
              .shingleHashes(split($"text", " "))).as("sh_h")))
        b.cache(); b.count(); b
      }
      tb("q85: bloom gate (production)")(
        graft.operators.TrainPrep.bloomGate(
          Tables.documents(spark, dir).filter($"doc_id" % 97 =!= 0),
          benchBits, 0.5))
      tb("q52: exact contamination")(
        graft.operators.TrainPrep.q52Contamination(spark, dir))
      // q86 A/B: one-pass MG sketch vs the exact two-level groupBy + rank
      tm("q86: mg_sketch(64) per lang") {
        Tables.documents(spark, dir)
          .select($"lang", explode(split($"text", " ")).as("word"))
          .groupBy($"lang")
          .agg(graft.functions.FreqSketch.mgSketch($"word", 64).as("sk"))
      }
      tm("q86: exact groupBy + rank") {
        import org.apache.spark.sql.expressions.Window
        val cnt = Tables.documents(spark, dir)
          .select($"lang", explode(split($"text", " ")).as("word"))
          .groupBy($"lang", $"word").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"word".asc)
        cnt.withColumn("rk", row_number().over(w)).filter($"rk" <= 64)
      }
      spark.stop(); return
    }
    if (args.contains("r10")) {
      import graft.functions.DecScaledLong.decScaledLong
      import graft.Tables
      val l3 = Tables(spark, dir, "lineitem")
        .select($"l_orderkey",
          expr("unix_micros(cast(l_shipdate as timestamp))").as("sd"),
          decScaledLong($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("rev4"))
      val oP = Tables(spark, dir, "orders")
        .select($"o_orderkey", $"o_orderpriority")
      t("q124: lineitem scan+rev4")(l3)
      t("q124: scan no rev4")(Tables(spark, dir, "lineitem")
        .select($"l_orderkey",
          expr("unix_micros(cast(l_shipdate as timestamp))").as("sd")))
      t("q124: join only")(l3.join(oP, $"l_orderkey" === $"o_orderkey"))
      t("q124: join+agg(count,sum) str key")(
        l3.join(oP, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"), sum($"rev4").as("r4")))
      val oInt = Tables(spark, dir, "orders")
        .select($"o_orderkey",
          when($"o_orderpriority".startsWith("1"), 0)
            .when($"o_orderpriority".startsWith("2"), 1)
            .when($"o_orderpriority".startsWith("3"), 2)
            .when($"o_orderpriority".startsWith("4"), 3)
            .otherwise(4).as("pcode"))
      t("q124: join int payload")(
        l3.join(oInt, $"l_orderkey" === $"o_orderkey")
          .groupBy($"pcode").agg(count(lit(1)).as("n"), sum($"rev4").as("r4")))
      t("q124: join int shuffle_hash")(
        l3.join(oInt.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey")
          .groupBy($"pcode").agg(count(lit(1)).as("n"), sum($"rev4").as("r4")))
      t("q124: join str shuffle_hash")(
        l3.join(oP.hint("shuffle_hash"), $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"), sum($"rev4").as("r4")))
      t("q124: full")(graft.operators.ScaleOps.q124IncrJoin(spark, dir))
      t("q153: full")(graft.operators.ScaleOps.q153RevenueBridge(spark, dir))
      t("q155: full")(graft.operators.ScaleOps.q155ShareShift(spark, dir))
      spark.stop(); return
    }
    t("q44: full")(Dedup.q44SimhashPairs(spark, dir))
    t("q26: full")(Dedup.q26ShingleJaccard(spark, dir))
    t("q28: full")(Dedup.q28MinhashPairs(spark, dir))
    t("q27: sigs only")(Dedup.q27MinhashSig(spark, dir))
    spark.stop()
  }
}
