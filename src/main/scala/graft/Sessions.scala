package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Session factory + table access helpers shared by Verify/Bench/tests.
  *
  * Scale notes: `shuffle.partitions` defaults to the local core count here,
  * but every operator in this library is written so that the same code runs
  * on a multi-executor cluster — no `collect()` in the data path, joins
  * declare broadcast hints only for genuinely small sides, and AQE is left
  * on to re-plan at runtime.
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // hold every generated class of a multi-query workload (default 100
      // entries thrashes and re-runs janino per stage per query — see
      // Bench.scala rationale)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // typed aggregates over HIGH-CARDINALITY groups (weighted_median per
      // part: ~200k groups) need the object-hash map to hold the task's
      // group count; the 128-key default falls back to sort-based
      // aggregation — re-paying exactly the per-partition sort the native
      // aggregate exists to avoid. Buffers are small primitive maps
      // (~tens of entries), so 1M keys is bounded by ~100s of MB per
      // task; past it the sort fallback remains the graceful path.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString)
      // events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects;
      // read them as epoch-nanos longs instead (SPARK-40819 escape hatch).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Builder preconfigured for the large-cluster deployment this library
    * is designed for (SCALE.md) — the settings that change between
    * `local[32]` and 1000 executors are all HERE, none in operator code.
    * The caller supplies master/deploy specifics and `getOrCreate()`.
    *
    * Rationale per knob:
    *  - shuffle.partitions high (AQE coalesces down at runtime; starting
    *    low caps reduce parallelism instead)
    *  - AQE skew-join splits hot reduce partitions (the salted-join
    *    operator remains for pre-aggregated build sides AQE can't split)
    *  - 128 MB file partitions bound scan-task memory against wide
    *    binary/multimodal rows
    *  - broadcast threshold raised to 64 MB: the dimension/benchmark/
    *    query-set sides this library broadcasts are small even at 100 TB
    *    fact scale, and a missed broadcast costs a full fact shuffle
    */
  def clusterBuilder(shufflePartitions: Int = 2048): SparkSession.Builder =
    SparkSession
      .builder()
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // a long-lived cluster session serves many distinct queries; the
      // 100-entry codegen cache default forces steady-state recompilation
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // high-cardinality typed aggregates (see Sessions.local rationale)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // executor sizing lives HERE as a DEFAULT, not a mandate (ADVICE
      // r14): programmatic builder config has the highest precedence, so
      // hard-coding would lock out spark-submit flags / conf files on a
      // real deployment. We only fill the values in when the environment
      // did not: spark-submit puts --executor-memory/--conf into system
      // properties before the session builds, and standalone mode reads
      // SPARK_EXECUTOR_MEMORY/SPARK_EXECUTOR_CORES. Rationale for the
      // 16g/4-core (4g/core) fallback: the heavy typed aggregates
      // (weighted-median per part, the object-hash maps sized by
      // fallbackThreshold above) and the MEMORY_AND_DISK frameCached
      // views need real executor heap — the 1g default OOMs them. The
      // multi-process bench (Bench.scala, local-cluster) keeps the same
      // per-core ratio via its own SPARK_GRAFT_EXECUTOR_MEM knob.
      .config("spark.executor.memory",
        sys.props.get("spark.executor.memory")
          .orElse(sys.env.get("SPARK_EXECUTOR_MEMORY")).getOrElse("16g"))
      .config("spark.executor.cores",
        sys.props.get("spark.executor.cores")
          .orElse(sys.env.get("SPARK_EXECUTOR_CORES")).getOrElse("4"))
}

/** Readers for the driver-provided synthetic tables (TESTDATA.md).
  * One parquet file per table under `<sfDir>/<name>.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") withNanosTs(df) else df
  }

  /** The library-wide contract for `events.ts` is epoch-NANOS LONG: every
    * event-time operator (hour buckets, sessionize gaps, funnel windows)
    * does integer nanos arithmetic, and the original driver corpus carried
    * parquet TIMESTAMP(NANOS) which Spark can only read as long
    * (`nanosAsLong`). Regenerated corpora write `ts` as TIMESTAMP(MICROS)
    * instead — same instants, different logical type — which would bind
    * those integer expressions against TimestampType and fail resolution.
    * Restore the contract AT THE READ, in one place, so the physical
    * schema of the corpus can drift without touching any operator: a
    * micros timestamp (tz'd or NTZ; session TZ is pinned UTC) becomes
    * zero-padded nanos, exactly what DuckDB's `epoch_ns(ts)` yields on
    * the same file, so oracle hashes are unaffected. A long column passes
    * through untouched. (Schema drift under rewrite is a real 100 TB
    * hazard — a copy of a table is only a copy if logical types survive
    * the round trip; normalizing at the boundary is the defense.)
    */
  def withNanosTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case _ => df
    }

  /** Round-robin parallelism restore, GATED on the input's actual split
    * count. The local test tables are single parquet files (1–2 scan
    * partitions), where fanning out to the session's core count is what
    * makes the downstream per-row work (shingling, signatures, decode)
    * parallel at all. A production multi-split input already scans wide —
    * there the extra exchange is pure waste, so it is skipped. The split
    * count comes from physical planning only; no job runs.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** [[spread]]'s KEYED sibling: hash-cluster on `key` — but only when
    * the input does not already scan wide. The corpus pipelines cluster
    * the raw documents on doc_id once so every downstream doc_id-keyed
    * aggregate/join reuses a single exchange, which doubles as the
    * parallelism restore on the single-file local tables. A production
    * input that already arrives in thousands of splits (or bucketed by
    * the key) must NOT pay an unconditional full-corpus shuffle of the
    * document text for that convenience — the same gate [[spread]]
    * applies to its round-robin. Correctness does not depend on the
    * clustering (PartitionInvarianceSpec), only plan shape does.
    */
  def spreadBy(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    // explicit count: a bare repartition(col) would use
    // spark.sql.shuffle.partitions, which need not reach the `target`
    // this gate just tested against (spread has the same contract)
    else df.repartition(target, org.apache.spark.sql.functions.col(key))
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
