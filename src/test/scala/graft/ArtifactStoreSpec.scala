package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the build-once/probe-many store's in-memory half:
  * [[ArtifactStore.frameCached]] memoizes per (session, name, version,
  * input fingerprint), rebuilds when an input file changes, and serves
  * a cache whose PARTITIONING consumers can ride (the property the
  * basket/bridge/q77 rewrites depend on — an exchange-free groupBy over
  * the cached partitions). [[ArtifactStore.scalarCached]] shares the
  * fingerprint rule.
  */
class ArtifactStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  private def writeInput(dir: String, rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("k", "v").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
  }

  test("frameCached: built once per fingerprint, rebuilt when the input changes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("asfc").toString
    writeInput(dir, Seq((1L, 10L), (2L, 20L)))
    var builds = 0
    // the lit(builds) marker makes each build's logical plan distinct, so
    // Dataset.storageLevel below resolves THIS build's cache entry rather
    // than a sameResult match against the successor's
    def cached() = ArtifactStore.frameCached(spark, "asfc_t", 1,
      Seq(s"$dir/t.parquet")) {
      builds += 1
      spark.read.parquet(s"$dir/t.parquet").repartition($"k")
        .withColumn("b", lit(builds))
    }
    val a = cached()
    val b = cached()
    assert(builds == 1, "second call must serve the memoized frame")
    assert(a eq b, "memoization returns the same DataFrame instance")
    assert(a.count() == 2)
    // changing the input data changes the fingerprint — next call rebuilds
    // (ensure a distinct (length, mtime) signature regardless of clock
    // granularity by changing the row count)
    writeInput(dir, Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    Paths.get(dir) // keep path referenced
    val c = cached()
    assert(builds == 2, "a changed input fingerprint must rebuild")
    assert(c.count() == 3)
    // the superseded frame must be UNPERSISTED, not leaked: in a
    // long-lived session each dataset refresh would otherwise pin a
    // full stale intermediate in executor storage forever
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "superseded frameCached entry still persisted — storage leak")
    assert(c.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "current frameCached entry must stay persisted")
  }

  test("cached: a stale incomplete destination (no _SUCCESS) self-heals") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ashl").toString
    writeInput(dir, Seq((1L, 10L), (2L, 20L)))
    val artRoot = Files.createTempDirectory("ashlroot").toString
    spark.conf.set("graft.artifacts.dir", artRoot)
    try {
      // plant a wreck at the EXACT destination key: a directory with a
      // part file but no _SUCCESS (a writer that died mid-write before
      // the staging protocol existed). renameTo over a non-empty dir
      // fails, so without self-healing every subsequent build throws.
      val probe = ArtifactStore.cached(spark, "ashl_idx", 1,
        Seq(s"$dir/t.parquet")) {
        spark.read.parquet(s"$dir/t.parquet")
      }
      assert(probe.count() == 2)
      val committed = new java.io.File(artRoot).listFiles()
        .filter(_.getName.startsWith("ashl_idx-"))
      assert(committed.length == 1)
      val dst = committed.head
      // wreck it: drop _SUCCESS, leave a stale part file behind
      new java.io.File(dst, "_SUCCESS").delete()
      val stale = new java.io.File(dst, "stale-part.bin")
      Files.write(stale.toPath, Array[Byte](1, 2, 3))
      val healed = ArtifactStore.cached(spark, "ashl_idx", 1,
        Seq(s"$dir/t.parquet")) {
        spark.read.parquet(s"$dir/t.parquet")
      }
      assert(healed.count() == 2, "rebuild over a wrecked dst must serve fresh data")
      assert(new java.io.File(dst, "_SUCCESS").isFile,
        "healed artifact must carry _SUCCESS")
      assert(!stale.exists, "the stale part file must not survive the heal")
    } finally spark.conf.unset("graft.artifacts.dir")
  }

  test("frameCached: consumers ride the cached partitioning — no re-exchange") {
    import spark.implicits._
    val dir = Files.createTempDirectory("asfp").toString
    writeInput(dir, (1L to 100L).map(i => (i % 7, i)))
    val cached = ArtifactStore.frameCached(spark, "asfp_t", 1,
      Seq(s"$dir/t.parquet")) {
      spark.read.parquet(s"$dir/t.parquet").repartition($"k")
    }
    val agg = cached.groupBy($"k").agg(sum($"v").as("s"))
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), s"aggregate does not read the cache:\n$p")
    assert(!p.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning(k") && l.contains("ENSURE_REQUIREMENTS")),
      s"the groupBy re-exchanged the cached rows:\n$p")
  }

  test("scalarCached: memoized per fingerprint, recomputed on input change") {
    val dir = Files.createTempDirectory("assc").toString
    writeInput(dir, Seq((1L, 1L)))
    var computes = 0
    def cached() = ArtifactStore.scalarCached("assc_n", 1,
      Seq(s"$dir/t.parquet")) {
      computes += 1
      spark.read.parquet(s"$dir/t.parquet").count()
    }
    assert(cached() == 1L && cached() == 1L && computes == 1)
    writeInput(dir, Seq((1L, 1L), (2L, 2L)))
    assert(cached() == 2L && computes == 2)
  }
}
