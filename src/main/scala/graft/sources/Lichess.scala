package graft.sources

import java.time.LocalDate
import java.time.ZoneOffset

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.etl.ChessEtl

/** Lichess API ingestion (S1/S2 fetch) — the reference pipeline's entry
  * point (`/root/reference/src/vendors/lichess.py:25-123`).
  *
  * The HTTP layer is an injectable [[LichessTransport]]: this container has
  * zero egress, the reference's own tests mock `lichess.api.user_games` the
  * same way (`tests/vendors/test_lichess.py:12-75`), and production would
  * plug in any JVM HTTP client. Everything else — the request surface
  * (path, query params, auth header), unix-ms GMT day bounds, the retry
  * policy (max_retries = 3, `pipeline_import/transforms.py:34-35`), and
  * the json_normalize(sep='_') flatten — is implemented and spec-tested
  * against the reference's exact-call-args assertions.
  */
trait LichessTransport extends Serializable {

  /** GET `path` with query params and headers; returns the raw body
    * (ND-JSON or PGN text). Throw [[LichessHttpError]] for HTTP failures.
    */
  def get(path: String, params: Seq[(String, String)], headers: Map[String, String]): String
}

final case class LichessHttpError(status: Int, message: String)
    extends RuntimeException(s"HTTP $status: $message")

/** Typed client for the game-export API. Mirrors the reference's
  * `LichessApiClient(max_retries=3)`: HTTP 429 waits a minute and retries
  * (the Lichess API contract), up to `maxRetries` retries; other failures
  * propagate immediately.
  */
final class LichessClient(
    transport: LichessTransport,
    token: String,
    maxRetries: Int = 3,
    sleep: Long => Unit = Thread.sleep) extends Serializable {

  /** [since, until) unix-ms bounds for one GMT day
    * (`vendors/lichess.py:31-38`: midnight to midnight, ×1000).
    */
  def dayBoundsUnixMs(dataDate: LocalDate): (Long, Long) = {
    val since = dataDate.atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    val until = dataDate.plusDays(1).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
    (since, until)
  }

  private def withRetries[A](body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e @ LichessHttpError(429, _) =>
          if (attempt >= maxRetries) throw e
          attempt += 1
          sleep(60000L) // the API asks for a one-minute pause after a 429
      }
    }
    sys.error("unreachable")
  }

  private def userGames(
      player: String,
      perfType: String,
      dataDate: LocalDate,
      extra: Seq[(String, String)]): String = {
    val (since, until) = dayBoundsUnixMs(dataDate)
    val params = Seq(
      "since" -> since.toString,
      "until" -> until.toString,
      "perfType" -> perfType) ++ extra
    withRetries {
      transport.get(s"/api/games/user/$player", params,
        Map("Authorization" -> s"Bearer $token"))
    }
  }

  /** S1 call: metadata-only JSON export (`vendors/lichess.py:42-51` —
    * evals/clocks/moves all 'false'). Returns ND-JSON lines.
    */
  def userGamesJson(player: String, perfType: String, dataDate: LocalDate): Seq[String] =
    userGames(player, perfType, dataDate, Seq(
      "evals" -> "false", "clocks" -> "false", "moves" -> "false"))
      .linesIterator.filter(_.nonEmpty).toSeq

  /** S2 call: full PGN export (`vendors/lichess.py:85-94` —
    * clocks/evals/opening all 'true'). Returns PGN text.
    */
  def userGamesPgn(player: String, perfType: String, dataDate: LocalDate): String =
    userGames(player, perfType, dataDate, Seq(
      "clocks" -> "true", "evals" -> "true", "opening" -> "true"))
}

object Lichess {

  /** `{date}_{player}_{perf_type}` (`utils/output.py:10-16`). */
  def outputFilePrefix(player: String, perfType: String, dataDate: LocalDate): String =
    s"${dataDate}_${player}_$perfType" // LocalDate.toString is %F (ISO)

  /** pandas `json_normalize(sep='_')` parity: nested structs lifted to
    * top-level columns joined with '_', depth-first in field order.
    */
  def flattenStructs(df: DataFrame): DataFrame = {
    def expand(schema: StructType, parent: Option[Column], prefix: String): Seq[Column] =
      schema.fields.flatMap { f =>
        val c = parent.map(_.getField(f.name)).getOrElse(col(s"`${f.name}`"))
        f.dataType match {
          case st: StructType => expand(st, Some(c), s"$prefix${f.name}_")
          case _ => Seq(c.as(s"$prefix${f.name}"))
        }
      }
    df.select(expand(df.schema, None, ""): _*)
  }

  /** S1 fetch_json (`vendors/lichess.py:25-58`): one API call per
    * (player, perf_type, day), ND-JSON → flattened DataFrame →
    * `{prefix}_raw_json.parquet`. The per-day page is small (one player's
    * games); the heavy lift at scale is many (player, day) partitions of
    * this, each an independent call — which is exactly how the reference's
    * scheduler fans out.
    */
  def fetchJson(
      spark: SparkSession,
      client: LichessClient,
      player: String,
      perfType: String,
      dataDate: LocalDate,
      ioDir: String): DataFrame = {
    import spark.implicits._
    val lines = client.userGamesJson(player, perfType, dataDate)
    val flat = flattenStructs(spark.read.json(lines.toDS()))
    val prefix = outputFilePrefix(player, perfType, dataDate)
    flat.write.mode("overwrite").parquet(s"$ioDir/${prefix}_raw_json.parquet")
    flat
  }

  /** S2 fetch_pgn (`vendors/lichess.py:61-123`): reads the raw-json output
    * first (the reference does, for its game count), fetches the PGN
    * export, replays every game through the seven visitors, and writes the
    * wide per-game frame to `{prefix}_raw_pgn.parquet`.
    */
  def fetchPgn(
      spark: SparkSession,
      client: LichessClient,
      player: String,
      perfType: String,
      dataDate: LocalDate,
      ioDir: String): DataFrame = {
    import spark.implicits._
    val prefix = outputFilePrefix(player, perfType, dataDate)
    // ordering dependency on fetch_json, same as the reference (it reads
    // the json output for game_count progress reporting)
    spark.read.parquet(s"$ioDir/${prefix}_raw_json.parquet").count()
    val pgnText = client.userGamesPgn(player, perfType, dataDate)
    val wide = ChessEtl.toWide(ChessEtl.parse(spark, Seq(pgnText).toDS()))
    wide.write.mode("overwrite").parquet(s"$ioDir/${prefix}_raw_pgn.parquet")
    wide
  }
}
