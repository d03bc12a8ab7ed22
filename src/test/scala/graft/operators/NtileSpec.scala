package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Relational.withGlobalNtile]] — the parallel rank decomposition
  * that replaced q102's single-task global window — bit-identical to the
  * window `ntile` across bucket counts that divide the row count evenly,
  * unevenly, and exceed it, and across input partition layouts (the ids
  * the helper derives ranks from are partition-local, so the layout is
  * the thing that could break it).
  */
class NtileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private def viaWindow(df: org.apache.spark.sql.DataFrame, n: Int) = {
    import spark.implicits._
    df.withColumn("tile",
      ntile(n).over(Window.orderBy($"v", $"id")).cast("int"))
      .select($"id", $"tile")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
  }

  private def viaHelper(df: org.apache.spark.sql.DataFrame, n: Int) = {
    import spark.implicits._
    Relational.withGlobalNtile(df, n, Seq($"v", $"id"), "tile")
      .select($"id", $"tile")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
  }

  test("equals window ntile: even, uneven, n > N, across layouts") {
    import spark.implicits._
    // 1003 rows (uneven vs 10), duplicate v values so the id tiebreaker
    // is load-bearing
    val base = spark.range(1003).select(
      $"id", pmod(hash($"id"), lit(97)).cast("long").as("v"))
    for (layout <- Seq(base.repartition(1), base.repartition(11),
         base.repartitionByRange(5, $"id"));
         n <- Seq(10, 17, 2000)) {
      val w = viaWindow(layout, n)
      val h = viaHelper(layout, n)
      assert(h.size == 1003 && h == w, s"n=$n layout mismatch")
    }
  }

  test("withGroupedRank equals the partitioned window rank family") {
    import spark.implicits._
    // small-cardinality group key (incl. a NULL group and a 1-row group
    // for the percent_rank n=1 edge), duplicate v values so the id
    // tiebreaker is load-bearing
    val df = spark.range(2000).select(
      when($"id" === 0, lit(null).cast("string"))
        .when($"id" === 1, lit("solo"))
        .otherwise(concat(lit("g"), pmod(hash($"id"), lit(4)))).as("g"),
      $"id", pmod(hash($"id" * 13), lit(31)).cast("long").as("v"))
      .repartition(9)
    val w = Window.partitionBy($"g").orderBy($"v", $"id")
    val expected = df.select($"g", $"id",
      dense_rank().over(w).cast("long").as("drank"),
      round(percent_rank().over(w), 6).as("prank"),
      round(cume_dist().over(w), 6).as("cdist"))
      .collect().map(r => (r.getLong(1),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val got = Relational.withGroupedRank(df, Seq("g"), Seq($"v", $"id"), "_r", "_gn")
      .select($"id", $"_r".as("drank"),
        round(when($"_gn" === 1, lit(0.0)).otherwise(
          ($"_r" - 1).cast("double") / ($"_gn" - 1).cast("double")), 6).as("prank"),
        round($"_r".cast("double") / $"_gn".cast("double"), 6).as("cdist"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.size == 2000 && got == expected)
  }

  test("withBucketedGroupRank equals the partitioned window rank, any layout") {
    import spark.implicits._
    // numeric values with heavy duplication (31 distinct over 2000 rows)
    // so bucket edges collide and ties sit ON the percentile edges — the
    // case where a value-straddling bucket split would corrupt ranks; a
    // near-constant group exercises the degenerate one-bucket path
    val df = spark.range(2000).select(
      when($"id" < 3, lit("tiny"))
        .otherwise(concat(lit("g"), pmod(hash($"id"), lit(3)))).as("g"),
      $"id",
      when($"id" < 3, lit(7L))
        .otherwise(pmod(hash($"id" * 13), lit(31)).cast("long")).as("v"))
      .repartition(9)
    val w = Window.partitionBy($"g").orderBy($"v", $"id")
    val expected = df.select($"id",
      row_number().over(w).cast("long").as("r"),
      count(lit(1)).over(Window.partitionBy($"g")).as("n"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    for (layout <- Seq(df.repartition(1), df.repartition(11))) {
      val got = Relational.withBucketedGroupRank(layout,
        $"g", $"v", $"id", "_r", "_gn",
        s"ntile_spec_bucketed_${layout.rdd.getNumPartitions}",
        Seq("/root/testdata/sf0.001/region.parquet"))
        .select($"id", $"_r", $"_gn")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      assert(got.size == 2000 && got == expected,
        s"bucketed rank mismatch at ${layout.rdd.getNumPartitions} partitions")
    }
  }

  test("withBucketedGroupRank throws on a filtered caller, never mis-ranks") {
    import spark.implicits._
    // the caller-contract trap (VERDICT r13 #5): cached offsets are a
    // function of the FULL fingerprinted frame; a caller that filters df
    // before ranking would inherit offsets from the unfiltered corpus.
    // The guard must fail loudly, not return silently wrong ranks.
    val df = spark.range(2000).select(
      concat(lit("g"), pmod(hash($"id"), lit(3))).as("g"), $"id",
      pmod(hash($"id" * 13), lit(31)).cast("long").as("v"))
    val cacheKey = "ntile_spec_bucketed_guard"
    val inputs = Seq("/root/testdata/sf0.001/region.parquet")
    // warm the cache against the FULL frame
    Relational.withBucketedGroupRank(df, $"g", $"v", $"id", "_r", "_gn",
      cacheKey, inputs)
      .write.format("noop").mode("overwrite").save()
    // a filtered caller reusing the same cache entry must throw
    val filtered = Relational.withBucketedGroupRank(
      df.filter($"id" % 7 =!= 0), $"g", $"v", $"id", "_r", "_gn",
      cacheKey, inputs)
    val e = intercept[Exception] {
      filtered.write.format("noop").mode("overwrite").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bucketed-rank cache drift")),
      s"expected the cache-drift guard, got: ${e.getMessage}")
  }

  test("withBucketedGroupRank throws when a filter elides an ENTIRE bucket") {
    import spark.implicits._
    // ADVICE r14: a value predicate aligned with bucket edges can remove
    // every row of one (group, bucket) while leaving every SURVIVING
    // bucket's count intact — the per-bucket check alone has no row left
    // to fail, and later buckets would silently inherit the vanished
    // bucket's cached offset. The per-group live-total check must raise.
    val df = spark.range(2000).select(
      concat(lit("g"), pmod(hash($"id"), lit(3))).as("g"), $"id",
      pmod(hash($"id" * 13), lit(31)).cast("long").as("v"))
    val cacheKey = "ntile_spec_bucketed_guard_elide"
    val inputs = Seq("/root/testdata/sf0.001/region.parquet")
    Relational.withBucketedGroupRank(df, $"g", $"v", $"id", "_r", "_gn",
      cacheKey, inputs)
      .write.format("noop").mode("overwrite").save()
    // 31 edges over 31 distinct values ⇒ buckets align with single values;
    // dropping one VALUE drops whole buckets and nothing else, so every
    // surviving bucket still matches its cached per-bucket count
    val elided = Relational.withBucketedGroupRank(
      df.filter($"v" =!= 0L), $"g", $"v", $"id", "_r", "_gn",
      cacheKey, inputs)
    val e = intercept[Exception] {
      elided.write.format("noop").mode("overwrite").save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bucketed-rank cache drift")),
      s"expected the cache-drift guard on whole-bucket elision, " +
        s"got: ${e.getMessage}")
  }

  test("single-task window is GONE from the q102 plan") {
    val df = ScaleOps.q102NtileHist(spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    // an unpartitioned WindowExec prints 'Window [...], [v ASC ...]'
    // with no partition spec; the helper's only window runs over the
    // <=|partitions|-row offsets frame. Assert no window consumes the
    // events-grain sort: the ntile itself must come from the rank
    // arithmetic (projected), not a Window over the full stream.
    assert(!plan.contains("ntile"), "q102 still plans a window ntile")
  }
}
