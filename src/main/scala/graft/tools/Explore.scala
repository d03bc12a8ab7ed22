package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables

/** Scratch profiling main (not part of the driver contract). */
object Explore {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[explore] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.read.parquet(s"$dir/lineitem.parquet").count() // warm-up

    val docs = Tables.documents(spark, dir).repartition(32)
      .select($"doc_id", $"lang", $"source", $"text")
    val rows = graft.operators.Dedup.shingleRows(spark, docs)
    time("shingleRows count")(rows.count())
    time("shingleRows+md5")(
      rows.select(pmod(graft.operators.Dedup.portableHash($"shingle"), lit(97L)).as("m"))
        .agg(sum("m")).collect())
    time("q27 full")(graft.operators.Dedup.q27MinhashSig(spark, dir).count())
    time("q27 again")(graft.operators.Dedup.q27MinhashSig(spark, dir).count())
    time("q26 full")(graft.operators.Dedup.q26ShingleJaccard(spark, dir).count())
    time("q28 full")(graft.operators.Dedup.q28MinhashPairs(spark, dir).count())
    spark.stop()
  }
}
