package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ChessEtl
import graft.operators.ChessQueries

/** The DataSourceV2 read path: one partition per (player, day), fetch in
  * executors through the registered transport, rows consumable by the
  * existing parse operators.
  */
class LichessDataSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  final class CountingTransport extends LichessTransport {
    val calls = new ConcurrentLinkedQueue[String]()
    def get(path: String, params: Seq[(String, String)],
        headers: Map[String, String]): String = {
      calls.add(path + "?" + params.map(kv => kv._1 + "=" + kv._2).mkString("&"))
      ChessQueries.pgnFixture
    }
  }

  test("players x days fan out to partitions; rows feed the existing parser") {
    val t = new CountingTransport
    LichessTransports.register("spec-transport", t)
    val df = spark.read.format("graft.sources.LichessDataSource")
      .option("players", "thibault,german11")
      .option("perf_type", "blitz")
      .option("from_date", "2024-04-26")
      .option("to_date", "2024-04-28")
      .option("transport", "spec-transport")
      .option("token", "tok")
      .load()

    assert(df.rdd.getNumPartitions == 6) // 2 players x 3 days

    val rows = df.collect()
    assert(rows.length == 6)
    assert(t.calls.size == 6)
    assert(t.calls.iterator().next().startsWith("/api/games/user/"))
    // full-flag PGN call with unix-ms day bounds
    assert(t.calls.asScala.forall(c =>
      c.contains("clocks=true") && c.contains("evals=true") && c.contains("since=")))

    val players = rows.map(_.getAs[String]("player")).toSet
    assert(players == Set("thibault", "german11"))
    val dates = rows.map(_.getAs[java.sql.Date]("data_date").toString).toSet
    assert(dates == Set("2024-04-26", "2024-04-27", "2024-04-28"))

    // the pgn column is the Dataset[String] shape the parser consumes
    import spark.implicits._
    val parsed = ChessEtl.parse(spark, df.select($"pgn").as[String])
    assert(parsed.count() == 12) // 2 fixture games x 6 partitions
  }

  implicit class QAsScala[A](q: ConcurrentLinkedQueue[A]) {
    def asScala: Iterator[A] = {
      val it = q.iterator()
      new Iterator[A] { def hasNext = it.hasNext; def next() = it.next() }
    }
  }
}
