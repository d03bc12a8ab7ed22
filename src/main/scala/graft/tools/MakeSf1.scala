package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Dev-only: synthesize an sf1-equivalent dataset as a 10× key-shifted
  * union of sf0.1, for the SCALE.md fixed-overhead amortization run.
  * Dimension tables (region, nation) stay single-copy; fact/entity keys
  * shift by i·10⁸ per copy so joins and groupings keep their cardinality
  * structure.
  *
  * Two content modes:
  *  - default: document/embedding CONTENT is left duplicated. Every doc
  *    gains 9 exact copies, so the near-dup candidate-pair graph grows
  *    ~100× (quadratically unrepresentative) — the amortization run
  *    restricts itself to the linear/join/agg queries (see SCALE.md).
  *  - `perturb` (4th arg): each copy's content is made unique while
  *    preserving WITHIN-copy similarity structure. Copy i suffixes every
  *    document token with `_i` — a bijection on shingle space, so every
  *    sf0.1 near-dup pair recurs inside each copy with IDENTICAL Jaccard,
  *    while cross-copy similarity is exactly 0; embeddings get a small
  *    deterministic per-(copy,dim) jitter. The pair family then grows
  *    ~linearly (10×), which is what a real 10×-bigger crawl looks like —
  *    use this mode to bench q26–q28/q44–q48/q61–q66 at sf1.
  *
  * Usage: runMain graft.tools.MakeSf1 [srcDir] [dstDir] [copies] [perturb]
  */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "target/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val perturb = args.length > 3 && args(3) == "perturb"
    val OFF = 100000000L
    val spark = Sessions.local()
    def write(name: String, keys: Seq[String]): Unit = {
      val base = Tables(spark, src, name)
      val out =
        if (keys.isEmpty) base
        else (0 until copies).map { i =>
          val shifted =
            keys.foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(i * OFF)))
          if (!perturb || i == 0) shifted
          else name match {
            case "documents" =>
              // token-suffix bijection: within-copy shingle sets (and thus
              // Jaccard/containment/MinHash collisions) are isomorphic to
              // sf0.1's, cross-copy overlap is zero
              shifted
                .withColumn("text", array_join(
                  transform(split(col("text"), " "),
                    w => concat(w, lit(s"_$i"))), " "))
                .withColumn("n_chars", length(col("text")))
            case "embeddings" =>
              // deterministic sub-percent jitter, a different draw per
              // (copy, dimension): breaks exact duplication without moving
              // vectors far enough to redraw the similarity structure
              shifted.withColumn("embedding",
                transform(col("embedding"), (x, j) =>
                  (x + ((col("vec_id") * 31 + j * 7 + lit(i * 13)) % 17 - 8)
                    .cast("float") * lit(2e-4f)).cast("float")))
            case _ => shifted
          }
        }.reduce(_ unionAll _)
      // type-faithful round trip: Tables normalizes events.ts to nanos
      // LONG for the library's internal contract, but a corpus COPY must
      // carry the source's logical type (TIMESTAMP) or every downstream
      // reader — DuckDB's epoch_ns() included — binds against the wrong
      // type. Restore it at the write boundary, mirroring the read-side
      // normalization (µs-truncated instants; the physical parquet type
      // Spark emits — MICROS or NANOS — reads back identically through
      // both Tables.withNanosTs and DuckDB's epoch_ns).
      val typed =
        if (name == "events" && out.schema("ts").dataType ==
              org.apache.spark.sql.types.LongType)
          out.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else out
      typed.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[makesf1] $name done")
    }
    write("region", Nil)
    write("nation", Nil)
    write("customer", Seq("c_custkey"))
    write("supplier", Seq("s_suppkey"))
    write("part", Seq("p_partkey"))
    write("orders", Seq("o_orderkey", "o_custkey"))
    write("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    write("events", Seq("event_id", "user_id"))
    write("documents", Seq("doc_id"))
    write("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
