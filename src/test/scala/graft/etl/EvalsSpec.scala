package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChessQueries

/** get_evals parity (`vendors/stockfish.py:13-111`) + terminal shortcut
  * (`transforms.py:100-113`) + the whole-day pipeline wiring.
  */
class EvalsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  def cleaned = ChessQueries.cleaned(spark)

  test("terminal shortcut: stalemate 0, checkmate signed for the winner") {
    // black king a8 cornered by white queen c7: black to move, stalemated
    assert(TerminalEval.evaluate("k7/2Q5/8/8/8/8/8/7K b - - 0") == Some(0.0))
    // white Qg7 supported by Kg6 mates the black king on h8
    assert(TerminalEval.evaluate("7k/6Q1/6K1/8/8/8/8/8 b - -") == Some(9999.0))
    // mirrored: white checkmated → -9999
    assert(TerminalEval.evaluate("8/8/8/8/8/6k1/6q1/7K w - -") == Some(-9999.0))
    // opening position: non-terminal
    assert(TerminalEval.evaluate("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq -").isEmpty)
  }

  test("getEvals: server evals pass through, cache wins, provider fills the rest") {
    import spark.implicits._
    // cache one of game-2's positions (game 2 has no server evals)
    val e4Fen = "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0"
    val cached = Seq((e4Fen, 0.42, 30)).toDF("fen", "evaluation", "eval_depth")

    val result = Evals.getEvals(spark, cleaned, cached,
      provider = Some(new FakeEvalProvider), providerDepth = 12).cache()

    // game 1 contributed its server evals; the position after 1.e4 is in
    // the cache (both games open 1.e4) so its PGN eval is superseded → 3
    assert(result.filter($"eval_depth" === 20).count() == 3)
    // game 2 has 7 positions; e4 is cached → 6 fresh provider evals at depth 12
    assert(result.filter($"eval_depth" === 12).count() == 6)
    // the cached row survives verbatim (anti-join removed the fresh duplicate)
    val cachedRow = result.filter($"fen" === e4Fen).collect()
    assert(cachedRow.length == 1)
    assert(cachedRow.head.getDouble(1) == 0.42)

    // provider=None (local_stockfish off): only server evals + cache remain
    val noProvider = Evals.getEvals(spark, cleaned, cached, provider = None)
    assert(noProvider.count() == 4)
  }

  test("pipeline runDay wires every stage end-to-end") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double, Int)].toDF("fen", "evaluation", "eval_depth")
    val out = Pipeline.runDay(
      spark,
      Seq(ChessQueries.pgnFixture).toDS(),
      Seq(("TTYLmSUX", "bullet", "mate"), ("abcd1234", "blitz", "resign"))
        .toDF("id", "speed", "status"),
      player = "thibault",
      cachedEvals = empty,
      evalProvider = Some(new FakeEvalProvider))
    assert(out.cleaned.count() == 2)
    assert(out.moves.count() == 11)
    assert(out.clocks.count() == 11)
    assert(out.positions.count() == 11)
    assert(out.materials.count() == 13) // plies+1 per game
    assert(out.gameInfos.count() == 2)
    assert(out.evals.count() == 11) // 4 server + 7 provider
    // 13, not 11: both games pass through the position after 1.e4, so evals
    // carries two rows for that fen (one server, one provider) and the
    // positions⋈evals left join fans out — the same duplicate-fen fan-out
    // the reference's pandas merge produces (`inference.py:41`)
    assert(out.winProbabilities.count() == 13)
  }

  test("loadAll upserts all seven serving tables end-to-end (Derby)") {
    import spark.implicits._
    val url = "jdbc:derby:memory:loadall;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    // representative column subsets of db/tables/*.sql — the upsert
    // reconciles the wide frames down to what each table stores
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

    val empty = Seq.empty[(String, Double, Int)].toDF("fen", "evaluation", "eval_depth")
    val out = Pipeline.runDay(
      spark,
      Seq(ChessQueries.pgnFixture).toDS(),
      Seq(("TTYLmSUX", "bullet", "mate"), ("abcd1234", "blitz", "resign"))
        .toDF("id", "speed", "status"),
      player = "thibault",
      cachedEvals = empty,
      evalProvider = Some(new FakeEvalProvider))

    def counts(): Map[String, Int] = {
      val c = java.sql.DriverManager.getConnection(url)
      val m = Seq("chess_games", "game_moves", "game_clocks", "game_positions",
        "game_materials", "position_evals", "win_probabilities").map { t =>
        val rs = c.createStatement().executeQuery(s"SELECT COUNT(*) FROM $t")
        rs.next(); t -> rs.getInt(1)
      }.toMap
      c.close(); m
    }

    Pipeline.loadAll(out, url)
    val first = counts()
    assert(first == Map(
      "chess_games" -> 2, "game_moves" -> 11, "game_clocks" -> 11,
      "game_positions" -> 11, "game_materials" -> 13,
      "position_evals" -> 11, "win_probabilities" -> 13))
    // replaying the same day must not duplicate anything (keyed upsert)
    Pipeline.loadAll(out, url)
    assert(counts() == first)
  }
}
