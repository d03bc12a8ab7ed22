package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
      .config("spark.sql.codegen.cache.maxEntries", "10000") // see Bench.scala
      // same broadcast threshold as Bench: the physical plans the bench
      // MEASURES (extra broadcasts vs sort-merge) must be the plans this
      // harness VERIFIES — a strategy-dependent bug can't hide between
      // differently-configured sessions. (Shuffle compression, Bench's
      // other local-only delta, doesn't change plans — only block bytes.)
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64L * 1024 * 1024).toString)
      // high-cardinality typed aggregates (see Sessions.local rationale);
      // same value as Bench so benched plans are the verified plans
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only subset knob (mirrors Bench): a subset dump leaves the other
    // oracle entries out of oracle_sql.json too, so the compare script
    // reports exactly the subset rather than erroring on missing dumps; the
    // driver's official invocation sets no env and always runs the full map
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // A query that fails to RUN must stay visible in the round artifact,
    // not vanish from it (round-7 lesson: three errored queries left a
    // fully-green-looking 83-entry file). errors.json maps each failed
    // query to its message; an official full run writes it even when
    // empty so "no file" can't be confused with "no failures".
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // exit 0 even on per-query failures: a nonzero rc could abort the
    // driver's downstream DuckDB compare and erase the round's artifact
    // entirely — the visible record is errors.json + stderr, not the rc
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
