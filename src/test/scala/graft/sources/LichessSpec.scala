package graft.sources

import java.time.LocalDate

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors `/root/reference/tests/vendors/test_lichess.py:79-152`: the
  * fetch steps must issue exactly the reference's API calls — same unix-ms
  * GMT day bounds, same flag set per step, the auth token — and write the
  * flattened parquet the downstream `clean` step consumes unchanged.
  */
class LichessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  final case class Call(path: String, params: Seq[(String, String)], headers: Map[String, String])

  /** Records calls; scripted responses, optionally failing first. */
  class FakeTransport(response: String, fail429First: Int = 0) extends LichessTransport {
    val calls = ArrayBuffer.empty[Call]
    var failuresLeft: Int = fail429First
    def get(path: String, params: Seq[(String, String)], headers: Map[String, String]): String = {
      calls += Call(path, params, headers)
      if (failuresLeft > 0) { failuresLeft -= 1; throw LichessHttpError(429, "rate limited") }
      response
    }
  }

  // the lichess API example game the reference test uses
  // (tests/vendors/test_lichess.py:14-53)
  val sampleJson: String =
    """{"id":"q7ZvsdUF","rated":true,"variant":"standard","speed":"blitz","perf":"blitz",
      |"createdAt":1514505150384,"lastMoveAt":1514505592843,"status":"draw",
      |"players":{"white":{"user":{"name":"Lance5500","title":"LM","patron":true,"id":"lance5500"},
      |"rating":2389,"ratingDiff":4},
      |"black":{"user":{"name":"TryingHard87","id":"tryinghard87"},"rating":2498,"ratingDiff":-4}},
      |"opening":{"eco":"D31","name":"Semi-Slav Defense: Marshall Gambit","ply":7},
      |"moves":"d4 d5 c4 c6 Nc3 e6","clock":{"initial":300,"increment":3,"totalTime":420}}"""
      .stripMargin.linesIterator.mkString

  val player = "thibault"
  val perfType = "bullet"
  val dataDate: LocalDate = LocalDate.of(2024, 4, 28)
  // converted manually to ms format (same literals as the reference test)
  val sinceUnix = 1714262400000L
  val untilUnix = 1714348800000L

  test("fetch_json issues the reference's exact API call and flattens with sep='_'") {
    val t = new FakeTransport(sampleJson)
    val client = new LichessClient(t, token = "abc")
    val io = java.nio.file.Files.createTempDirectory("lichess").toString

    val df = Lichess.fetchJson(spark, client, player, perfType, dataDate, io)

    assert(t.calls.size == 1)
    val c = t.calls.head
    assert(c.path == s"/api/games/user/$player")
    assert(c.params.toMap == Map(
      "since" -> sinceUnix.toString,
      "until" -> untilUnix.toString,
      "perfType" -> perfType,
      "evals" -> "false",
      "clocks" -> "false",
      "moves" -> "false"))
    assert(c.headers == Map("Authorization" -> "Bearer abc"))

    // json_normalize(sep='_') parity on the nested players/opening/clock
    val written = spark.read.parquet(
      s"$io/2024-04-28_thibault_bullet_raw_json.parquet")
    val row = written.collect().head
    val get = (n: String) => row.get(row.fieldIndex(n))
    assert(written.count() == 1)
    assert(get("id") == "q7ZvsdUF")
    assert(get("players_white_user_name") == "Lance5500")
    assert(get("players_black_rating") == 2498L)
    assert(get("players_black_ratingDiff") == -4L)
    assert(get("opening_eco") == "D31")
    assert(get("clock_initial") == 300L)
    assert(get("moves") == "d4 d5 c4 c6 Nc3 e6")
  }

  val samplePgn: String =
    """[Event "Rated bullet game"]
      |[Site "https://lichess.org/q7ZvsdUF"]
      |[Date "2024.04.28"]
      |[Round "-"]
      |[White "thibault"]
      |[Black "other"]
      |[Result "1-0"]
      |[UTCDate "2024.04.28"]
      |[UTCTime "12:00:00"]
      |[WhiteElo "1500"]
      |[BlackElo "1400"]
      |[Variant "Standard"]
      |[TimeControl "60+0"]
      |[ECO "C20"]
      |[Termination "Normal"]
      |
      |1. e4 e5 2. Qh5 Nc6 3. Bc4 Nf6 4. Qxf7# 1-0
      |""".stripMargin

  test("fetch_pgn issues the full-flags call after reading the json output") {
    val t = new FakeTransport(samplePgn)
    val client = new LichessClient(t, token = "abc")
    val io = java.nio.file.Files.createTempDirectory("lichess").toString

    // fetch_pgn reads fetch_json's parquet first (reference game_count
    // dependency) — stage it
    val jsonT = new FakeTransport(sampleJson)
    Lichess.fetchJson(spark, new LichessClient(jsonT, "abc"), player, perfType, dataDate, io)

    val df = Lichess.fetchPgn(spark, client, player, perfType, dataDate, io)

    assert(t.calls.size == 1)
    val c = t.calls.head
    assert(c.path == s"/api/games/user/$player")
    assert(c.params.toMap == Map(
      "since" -> sinceUnix.toString,
      "until" -> untilUnix.toString,
      "perfType" -> perfType,
      "clocks" -> "true",
      "evals" -> "true",
      "opening" -> "true"))
    assert(c.headers == Map("Authorization" -> "Bearer abc"))

    val written = spark.read.parquet(
      s"$io/2024-04-28_thibault_bullet_raw_pgn.parquet")
    val row = written.collect().head
    assert(written.count() == 1)
    assert(row.getAs[String]("Site") == "https://lichess.org/q7ZvsdUF")
    assert(row.getAs[String]("Result") == "1-0")
    assert(row.getAs[scala.collection.Seq[String]]("moves").size == 7)
  }

  test("429 retries up to max_retries then succeeds; sleeps a minute each") {
    val slept = ArrayBuffer.empty[Long]
    val t = new FakeTransport(sampleJson, fail429First = 3)
    val client = new LichessClient(t, "abc", maxRetries = 3, sleep = slept += _)
    val lines = client.userGamesJson(player, perfType, dataDate)
    assert(lines.nonEmpty)
    assert(t.calls.size == 4) // initial + 3 retries
    assert(slept.toSeq == Seq(60000L, 60000L, 60000L))
  }

  test("429 past max_retries propagates; other HTTP errors never retry") {
    val t = new FakeTransport(sampleJson, fail429First = 4)
    val client = new LichessClient(t, "abc", maxRetries = 3, sleep = _ => ())
    intercept[LichessHttpError] { client.userGamesJson(player, perfType, dataDate) }
    assert(t.calls.size == 4)

    val t2 = new FakeTransport(sampleJson) {
      override def get(path: String, params: Seq[(String, String)],
          headers: Map[String, String]): String = {
        calls += Call(path, params, headers)
        throw LichessHttpError(500, "server error")
      }
    }
    val client2 = new LichessClient(t2, "abc", maxRetries = 3, sleep = _ => ())
    intercept[LichessHttpError] { client2.userGamesJson(player, perfType, dataDate) }
    assert(t2.calls.size == 1)
  }
}
