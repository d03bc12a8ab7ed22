package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Dev-only: synthesize an sf1-equivalent dataset as a 10× key-shifted
  * union of sf0.1, for the SCALE.md fixed-overhead amortization run.
  * Dimension tables (region, nation) stay single-copy; fact/entity keys
  * shift by i·10⁸ per copy so joins and groupings keep their cardinality
  * structure. NOTE: document/embedding CONTENT is intentionally left
  * duplicated, which makes the near-dup pair family quadratically
  * unrepresentative at this scale — the amortization run restricts itself
  * to the linear/join/agg queries (see SCALE.md).
  *
  * Usage: runMain graft.tools.MakeSf1 [srcDir] [dstDir] [copies]
  */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "target/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val OFF = 100000000L
    val spark = Sessions.local()
    def write(name: String, keys: Seq[String]): Unit = {
      val base = Tables(spark, src, name)
      val out =
        if (keys.isEmpty) base
        else (0 until copies).map { i =>
          keys.foldLeft(base)((df, k) => df.withColumn(k, col(k) + lit(i * OFF)))
        }.reduce(_ unionAll _)
      out.repartition(spark.sparkContext.defaultParallelism)
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
