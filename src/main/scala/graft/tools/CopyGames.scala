package graft.tools

import java.time.LocalDate
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Sessions
import graft.etl.{ChainedEvalProvider, ChessEtl, EvalProvider, Evals, InMemoryCounterStore, UciProcessEngine}
import graft.ml.WpModel
import graft.sources.{JdbcUpsert, Lichess, LichessClient, LichessTransport}

/** The reference's CLI entry point (`docker_entrypoint.py:66-112`): one
  * `--step` per invocation with parquet handoff through `--io_dir`, the
  * same 17-step registry, and the same argument surface
  * (player / perf_type / data_date / local_stockfish).
  *
  * Differences forced by this environment, all injectable:
  *  - the fetch steps read their HTTP payloads from `--fixture_json` /
  *    `--fixture_pgn` files (zero egress here); a production deployment
  *    supplies a real [[LichessTransport]].
  *  - `--stockfish_path` points at any UCI engine binary for the
  *    local-eval tier (spawned per eval, like the reference).
  */
object CopyGames {

  final case class Args(
      player: String = "thibault",
      perfType: String = "bullet",
      dataDate: LocalDate = LocalDate.of(2024, 1, 29),
      localStockfish: Boolean = false,
      step: String = "",
      ioDir: String = "",
      jdbcUrl: Option[String] = None,
      fixtureJson: Option[String] = None,
      fixturePgn: Option[String] = None,
      stockfishPath: Option[String] = None,
      stockfishDepth: Int = 20)

  val perfTypes = Set("ultrabullet", "bullet", "blitz", "rapid", "classical")

  def parseArgs(argv: Array[String]): Args = {
    def loop(rest: List[String], a: Args): Args = rest match {
      case "--player" :: v :: t => loop(t, a.copy(player = v))
      case "--perf_type" :: v :: t =>
        require(perfTypes(v), s"perf_type must be one of $perfTypes, got $v")
        loop(t, a.copy(perfType = v))
      case "--data_date" :: v :: t => loop(t, a.copy(dataDate = LocalDate.parse(v)))
      case "--local_stockfish" :: t => loop(t, a.copy(localStockfish = true))
      case "--step" :: v :: t => loop(t, a.copy(step = v))
      case "--io_dir" :: v :: t => loop(t, a.copy(ioDir = v))
      case "--jdbc_url" :: v :: t => loop(t, a.copy(jdbcUrl = Some(v)))
      case "--fixture_json" :: v :: t => loop(t, a.copy(fixtureJson = Some(v)))
      case "--fixture_pgn" :: v :: t => loop(t, a.copy(fixturePgn = Some(v)))
      case "--stockfish_path" :: v :: t => loop(t, a.copy(stockfishPath = Some(v)))
      case "--stockfish_depth" :: v :: t => loop(t, a.copy(stockfishDepth = v.toInt))
      case Nil => a
      case other => sys.error(s"unrecognized arguments: $other")
    }
    val a = loop(argv.toList, Args())
    require(a.step.nonEmpty, "--step is required")
    require(a.ioDir.nonEmpty, "--io_dir is required")
    require(steps.contains(a.step), s"--step must be one of ${steps.keys.toSeq.sorted}")
    a
  }

  /** File-backed transport for offline runs: JSON-flagged calls read the
    * json fixture, PGN-flagged calls the pgn fixture.
    */
  final class FixtureTransport(json: Option[String], pgn: Option[String])
      extends LichessTransport {
    def get(path: String, params: Seq[(String, String)],
        headers: Map[String, String]): String = {
      val wantsJson = params.contains("moves" -> "false")
      val f = (if (wantsJson) json else pgn).getOrElse(sys.error(
        s"offline run: supply --fixture_${if (wantsJson) "json" else "pgn"} for $path"))
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)), "UTF-8")
    }
  }

  private def prefix(a: Args): String =
    Lichess.outputFilePrefix(a.player, a.perfType, a.dataDate)

  private def client(a: Args): LichessClient =
    new LichessClient(
      new FixtureTransport(a.fixtureJson, a.fixturePgn),
      token = sys.env.getOrElse("LICHESS_TOKEN", ""))

  private def readStep(spark: SparkSession, a: Args, suffix: String): DataFrame =
    spark.read.parquet(s"${a.ioDir}/${prefix(a)}_$suffix.parquet")

  private def writeStep(df: DataFrame, a: Args, suffix: String): Unit =
    df.write.mode("overwrite").parquet(s"${a.ioDir}/${prefix(a)}_$suffix.parquet")

  private def cachedEvals(spark: SparkSession, a: Args): DataFrame = {
    import spark.implicits._
    a.jdbcUrl.flatMap { url =>
      scala.util.Try(
        JdbcUpsert.readWhere(spark, url, "position_evals", "1=1")
          .select($"fen", $"evaluation", $"eval_depth")).toOption // table may not exist yet
    }.getOrElse(
      Seq.empty[(String, Double, Int)].toDF("fen", "evaluation", "eval_depth"))
  }

  private def provider(a: Args): Option[EvalProvider] =
    if (!a.localStockfish) None
    else Some(new ChainedEvalProvider(
      cloud = None, remote = None,
      local = new UciProcessEngine(a.stockfishPath.getOrElse(
        sys.error("--local_stockfish requires --stockfish_path"))),
      counters = new InMemoryCounterStore(),
      localDepth = a.stockfishDepth))

  private def load(spark: SparkSession, a: Args, table: String, suffix: String): Unit =
    JdbcUpsert.upsertNamed(
      readStep(spark, a, suffix),
      a.jdbcUrl.getOrElse(sys.error(s"load steps require --jdbc_url")),
      table, new Properties())

  /** ETL_STEPS parity (`docker_entrypoint.py:46-63`). */
  val steps: Map[String, (SparkSession, Args) => Unit] = Map(
    "fetch_json" -> ((s, a) =>
      Lichess.fetchJson(s, client(a), a.player, a.perfType, a.dataDate, a.ioDir)),
    "fetch_pgn" -> ((s, a) =>
      Lichess.fetchPgn(s, client(a), a.player, a.perfType, a.dataDate, a.ioDir)),
    "clean_df" -> ((s, a) =>
      writeStep(ChessEtl.clean(readStep(s, a, "raw_pgn"), readStep(s, a, "raw_json")),
        a, "cleaned_df")),
    "get_evals" -> ((s, a) =>
      writeStep(Evals.getEvals(s, readStep(s, a, "cleaned_df"), cachedEvals(s, a),
        provider(a), a.stockfishDepth), a, "evals")),
    "explode_moves" -> ((s, a) =>
      writeStep(ChessEtl.explodeMoves(readStep(s, a, "cleaned_df")), a, "exploded_moves")),
    "explode_clocks" -> ((s, a) =>
      writeStep(ChessEtl.explodeClocks(readStep(s, a, "cleaned_df")), a, "exploded_clocks")),
    "explode_positions" -> ((s, a) =>
      writeStep(ChessEtl.explodePositions(readStep(s, a, "cleaned_df")), a, "exploded_positions")),
    "explode_materials" -> ((s, a) =>
      writeStep(ChessEtl.explodeMaterials(readStep(s, a, "cleaned_df")), a, "exploded_materials")),
    "get_game_infos" -> ((s, a) =>
      writeStep(ChessEtl.gameInfos(readStep(s, a, "cleaned_df"), a.player), a, "game_infos")),
    "get_win_probs" -> ((s, a) =>
      writeStep(WpModel.winProbabilities(
        readStep(s, a, "game_infos"), readStep(s, a, "evals"),
        readStep(s, a, "exploded_positions"), readStep(s, a, "exploded_clocks"),
        a.localStockfish), a, "win_probabilities")),
    "load_chess_games" -> ((s, a) => load(s, a, "chess_games", "game_infos")),
    "load_position_evals" -> ((s, a) => load(s, a, "position_evals", "evals")),
    "load_game_positions" -> ((s, a) => load(s, a, "game_positions", "exploded_positions")),
    "load_game_materials" -> ((s, a) => load(s, a, "game_materials", "exploded_materials")),
    "load_move_clocks" -> ((s, a) => load(s, a, "game_clocks", "exploded_clocks")),
    "load_move_list" -> ((s, a) => load(s, a, "game_moves", "exploded_moves")),
    "load_win_probs" -> ((s, a) => load(s, a, "win_probabilities", "win_probabilities")))

  /** Run one step (the reference runs one process per step; chaining steps
    * in one JVM works too because handoff is parquet).
    */
  def run(spark: SparkSession, argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    steps(a.step)(spark, a)
  }

  def main(argv: Array[String]): Unit = {
    val spark = Sessions.local()
    try run(spark, argv) finally spark.stop()
  }
}
