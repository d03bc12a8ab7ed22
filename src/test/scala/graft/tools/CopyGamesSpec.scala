package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChessQueries

/** End-to-end CLI run (`docker_entrypoint.py:66-112` parity): every step of
  * the registry invoked through the argument surface, parquet handoff in a
  * temp io_dir, a scripted UCI engine binary for the local-stockfish tier,
  * and the seven load steps landing in a live Derby.
  */
class CopyGamesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  test("all 17 steps run end-to-end through the CLI argument surface") {
    val io = Files.createTempDirectory("copygames").toString

    // offline fixtures standing in for the two API payloads
    val jsonFixture =
      """{"id":"TTYLmSUX","speed":"bullet","status":"mate"}
        |{"id":"abcd1234","speed":"blitz","status":"resign"}""".stripMargin
    Files.write(Paths.get(s"$io/games.ndjson"), jsonFixture.getBytes("UTF-8"))
    Files.write(Paths.get(s"$io/games.pgn"), ChessQueries.pgnFixture.getBytes("UTF-8"))

    // a scripted UCI engine: any FEN scores `cp -77` for the side to move
    val engine = Paths.get(s"$io/fakefish")
    Files.write(engine,
      """#!/bin/sh
        |while read line; do
        |  case "$line" in
        |    uci) echo "uciok";;
        |    go*) echo "info depth 20 seldepth 28 score cp -77 nodes 100 pv e2e4"
        |         echo "bestmove e2e4";;
        |    quit) exit 0;;
        |  esac
        |done
        |""".stripMargin.getBytes("UTF-8"))
    engine.toFile.setExecutable(true)

    val url = "jdbc:derby:memory:copygames;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    Seq(
      "CREATE TABLE chess_games (player VARCHAR(64), game_link VARCHAR(128), player_color VARCHAR(8), player_result VARCHAR(8), player_elo DOUBLE)",
      "CREATE TABLE game_moves (game_link VARCHAR(128), half_move BIGINT, move VARCHAR(16))",
      "CREATE TABLE game_clocks (game_link VARCHAR(128), half_move BIGINT, clock INT)",
      "CREATE TABLE game_positions (game_link VARCHAR(128), half_move BIGINT, fen VARCHAR(128))",
      "CREATE TABLE game_materials (game_link VARCHAR(128), half_move BIGINT, pawns_white INT, queens_black INT)",
      "CREATE TABLE position_evals (fen VARCHAR(128), evaluation DOUBLE, eval_depth INT)",
      "CREATE TABLE win_probabilities (game_link VARCHAR(128), half_move BIGINT, win_probability_white DOUBLE, win_prob_model_version VARCHAR(16))"
    ).foreach(conn.createStatement().executeUpdate)
    conn.close()

    val base = Array(
      "--player", "thibault", "--perf_type", "bullet",
      "--data_date", "2021-05-01", "--io_dir", io,
      "--jdbc_url", url,
      "--fixture_json", s"$io/games.ndjson", "--fixture_pgn", s"$io/games.pgn",
      "--local_stockfish", "--stockfish_path", s"$io/fakefish")

    val order = Seq(
      "fetch_json", "fetch_pgn", "clean_df", "get_evals",
      "explode_moves", "explode_clocks", "explode_positions",
      "explode_materials", "get_game_infos", "get_win_probs",
      "load_chess_games", "load_position_evals", "load_game_positions",
      "load_game_materials", "load_move_clocks", "load_move_list",
      "load_win_probs")
    order.foreach(step => CopyGames.run(spark, base ++ Array("--step", step)))

    // parquet handoff wrote the reference's filenames
    val prefix = "2021-05-01_thibault_bullet"
    Seq("raw_json", "raw_pgn", "cleaned_df", "evals", "exploded_moves",
      "exploded_clocks", "exploded_positions", "exploded_materials",
      "game_infos", "win_probabilities").foreach { s =>
      assert(Files.exists(Paths.get(s"$io/${prefix}_$s.parquet")), s)
    }

    // the scripted engine's evals flowed through: game 2 has no server
    // evals, so its positions carry cp -77 negated per side to move
    val evals = spark.read.parquet(s"$io/${prefix}_evals.parquet")
    import spark.implicits._
    val engineEvals = evals.filter($"eval_depth" === 20 && ($"evaluation" === 0.77 || $"evaluation" === -0.77))
    assert(engineEvals.count() > 0)

    val c = java.sql.DriverManager.getConnection(url)
    def count(t: String): Int = {
      val rs = c.createStatement().executeQuery(s"SELECT COUNT(*) FROM $t")
      rs.next(); rs.getInt(1)
    }
    assert(count("chess_games") == 2)
    assert(count("game_moves") == 11)
    assert(count("game_clocks") == 11)
    assert(count("game_positions") == 11)
    assert(count("game_materials") == 13)
    assert(count("position_evals") == 11)
    assert(count("win_probabilities") == 13)
    c.close()
  }

  test("argument parsing rejects bad perf_type / unknown step / missing required") {
    intercept[IllegalArgumentException] {
      CopyGames.parseArgs(Array("--perf_type", "correspondence",
        "--step", "clean_df", "--io_dir", "/tmp"))
    }
    intercept[IllegalArgumentException] {
      CopyGames.parseArgs(Array("--step", "not_a_step", "--io_dir", "/tmp"))
    }
    intercept[IllegalArgumentException] {
      CopyGames.parseArgs(Array("--step", "clean_df"))
    }
    val a = CopyGames.parseArgs(Array("--step", "clean_df", "--io_dir", "/tmp"))
    assert(a.player == "thibault" && a.perfType == "bullet") // reference defaults
  }
}
