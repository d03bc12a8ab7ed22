package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.ChessEtl
import graft.ml.WpModel

/** The chess ETL surfaced through the driver's correctness gate: a fixed
  * fixture corpus (FIXTURES.md §A1 shapes) runs the real pipeline
  * (parse → clean → explode → game_infos → win probabilities) and the
  * oracle is a VALUES literal of reference-derived expected rows — e.g. the
  * position FENs are the exact strings asserted in the reference's
  * `tests/test_visitors.py:150-154`. sfDir is ignored: the corpus is the
  * input.
  */
object ChessQueries {

  val pgnFixture: String =
    """[Event "Rated Bullet game"]
      |[Site "https://lichess.org/TTYLmSUX"]
      |[Date "2021.05.01"]
      |[Round "-"]
      |[White "thibault"]
      |[Black "opponent1"]
      |[Result "1-0"]
      |[UTCDate "2021.05.01"]
      |[UTCTime "12:00:01"]
      |[WhiteElo "1500"]
      |[BlackElo "1600"]
      |[WhiteRatingDiff "+8"]
      |[BlackRatingDiff "-8"]
      |[Variant "Standard"]
      |[TimeControl "60+0"]
      |[ECO "B20"]
      |[Opening "Sicilian Defense"]
      |[Termination "Normal"]
      |
      |1. e4 { [%eval 0.05] [%clk 0:01:00] } 1... c5 { [%eval 0.32] [%clk 0:01:00] } 2. f4 { [%eval 0.3] [%clk 0:00:59] } 2... d6 { [%eval 0.1] [%clk 0:00:58] } 1-0
      |
      |[Event "Casual Blitz Arena tournament"]
      |[Site "https://lichess.org/abcd1234"]
      |[Date "2021.05.02"]
      |[Round "-"]
      |[White "someone"]
      |[Black "thibault"]
      |[Result "0-1"]
      |[UTCDate "2021.05.02"]
      |[UTCTime "18:30:00"]
      |[WhiteElo "?"]
      |[BlackElo "1610"]
      |[Variant "Standard"]
      |[TimeControl "300+3"]
      |[ECO "C20"]
      |[Opening "King's Pawn"]
      |[Termination "Normal"]
      |
      |1. e4 { [%clk 0:05:00] } 1... e5 { [%clk 0:05:00] } 2. Nf3 { [%clk 0:04:58] } 2... Nc6 { [%clk 0:04:57] } 3. Bc4 { [%clk 0:04:55] } 3... Nf6 { [%clk 0:04:55] } 4. O-O { [%clk 0:04:52] } 0-1""".stripMargin

  private def jsonFixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("TTYLmSUX", "bullet", "mate", Some(false), None: Option[Boolean]),
      ("abcd1234", "blitz", "resign", None: Option[Boolean], Some(true))
    ).toDF("id", "speed", "status",
      "players_black_provisional", "players_white_provisional")
  }

  // the fixture corpus is identical for every qc4x query in a session:
  // cache the cleaned frame once so the seven gate queries don't each
  // re-run parse→clean (pure staging reuse; results are unchanged)
  @volatile private var cleanedMemo: (SparkSession, DataFrame) = null

  def cleaned(spark: SparkSession): DataFrame = synchronized {
    if (cleanedMemo == null || (cleanedMemo._1 ne spark)) {
      import spark.implicits._
      cleanedMemo = (spark, ChessEtl.clean(
        ChessEtl.toWide(ChessEtl.parse(spark, Seq(pgnFixture).toDS())),
        jsonFixture(spark)).cache())
    }
    cleanedMemo._2
  }

  def qc40Moves(spark: SparkSession, dir: String): DataFrame =
    ChessEtl.explodeMoves(cleaned(spark)).orderBy(col("game_link"), col("half_move"))

  def qc41Positions(spark: SparkSession, dir: String): DataFrame =
    ChessEtl.explodePositions(cleaned(spark))
      .filter(col("game_link") === "https://lichess.org/TTYLmSUX")
      .select(col("game_link"), col("half_move"), col("fen"))
      .orderBy(col("half_move"))

  def qc42Clocks(spark: SparkSession, dir: String): DataFrame =
    ChessEtl.explodeClocks(cleaned(spark)).orderBy(col("game_link"), col("half_move"))

  def qc43GameInfos(spark: SparkSession, dir: String): DataFrame =
    ChessEtl.gameInfos(cleaned(spark), "thibault")
      .select(
        col("game_link"), col("player_color"), col("opponent"),
        col("player_result"), col("player_elo"), col("opponent_elo"),
        col("starting_time"), col("increment"), col("in_arena"),
        col("rated_casual"), col("queen_exchange"),
        col("player_castling_side"), col("opponent_castling_side"))
      .orderBy(col("game_link"))

  def qc44WinProb(spark: SparkSession, dir: String): DataFrame = {
    val c = cleaned(spark)
    WpModel.winProbabilities(
      gameInfos = ChessEtl.gameInfos(c, "thibault"),
      evals = ChessEtl.explodeEvals(c),
      positions = ChessEtl.explodePositions(c),
      clocks = ChessEtl.explodeClocks(c))
      .filter(col("game_link") === "https://lichess.org/TTYLmSUX")
      .orderBy(col("half_move"))
  }

  /** E4: the map→10-column materials contract
    * (`feature_engineering.py:145-182`): plies+1 rows per game, fixed piece
    * columns — game 1 has no captures, so full material at every row.
    */
  def qc45Materials(spark: SparkSession, dir: String): DataFrame =
    ChessEtl.explodeMaterials(cleaned(spark))
      .filter(col("game_link") === "https://lichess.org/TTYLmSUX")
      .orderBy(col("half_move"))

  /** Separate fixture for V2 berserk and V6 promotion outputs — kept out
    * of [[pgnFixture]] so qc40–qc45's expected rows stay untouched.
    * Game `berserk1`: 60+0 arena where white's first clock is half the
    * time control (the berserk signature — ClocksVisitor compares the
    * first two clocks on the third comment, `visitors.py:59-76`).
    * Game `promote1`: white promotes with 5. axb8=Q.
    */
  val pgnFixtureFlags: String =
    """[Event "Rated Bullet Arena tournament"]
      |[Site "https://lichess.org/berserk1"]
      |[Date "2021.05.03"]
      |[Round "-"]
      |[White "thibault"]
      |[Black "opponent2"]
      |[Result "1-0"]
      |[UTCDate "2021.05.03"]
      |[UTCTime "09:00:00"]
      |[WhiteElo "1520"]
      |[BlackElo "1530"]
      |[Variant "Standard"]
      |[TimeControl "60+0"]
      |[ECO "C40"]
      |[Opening "King's Knight Opening"]
      |[Termination "Normal"]
      |
      |1. e4 { [%clk 0:00:30] } 1... e5 { [%clk 0:01:00] } 2. Nf3 { [%clk 0:00:29] } 1-0
      |
      |[Event "Rated Bullet game"]
      |[Site "https://lichess.org/promote1"]
      |[Date "2021.05.03"]
      |[Round "-"]
      |[White "thibault"]
      |[Black "opponent3"]
      |[Result "1-0"]
      |[UTCDate "2021.05.03"]
      |[UTCTime "09:05:00"]
      |[WhiteElo "1520"]
      |[BlackElo "1510"]
      |[Variant "Standard"]
      |[TimeControl "60+0"]
      |[ECO "A00"]
      |[Opening "Ware Opening"]
      |[Termination "Normal"]
      |
      |1. a4 b5 2. axb5 a6 3. bxa6 c5 4. a7 c4 5. axb8=Q 1-0""".stripMargin

  /** V2/V6: berserk flags + promotion outputs surfaced per game. */
  def qc46Flags(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val json = Seq(
      ("berserk1", "bullet", "resign"), ("promote1", "bullet", "resign")
    ).toDF("id", "speed", "status")
    ChessEtl.clean(
      ChessEtl.toWide(ChessEtl.parse(spark, Seq(pgnFixtureFlags).toDS())), json)
      .select(col("game_link"), col("white_berserked"), col("black_berserked"),
        col("has_promotion"),
        col("promotion_count_white"), col("promotion_count_black"),
        col("promotions_white"), col("promotions_black"))
      .orderBy(col("game_link"))
  }

  /** Serving-layer parity (reference `db/tables/game_evals_view.sql:1-11`,
    * `eco_codes.sql:1-6`, `win_probabilities_eval_only.sql:1-5`): the
    * fixture pipeline's outputs register as NAMED Spark SQL views via
    * [[graft.serving.ServingViews]], and this query runs the user-facing
    * serving SQL — `game_evals` joined to the `eco_codes` dimension —
    * exactly as a reference user would against Postgres.
    */
  def qc47ServingViews(spark: SparkSession, dir: String): DataFrame = {
    val c = cleaned(spark)
    graft.serving.ServingViews.register(spark,
      positions = ChessEtl.explodePositions(c),
      evals = ChessEtl.explodeEvals(c),
      ecoCodes = graft.serving.ServingViews.ecoCodesSample(spark))
    c.select(col("game_link"), col("opening_played"))
      .createOrReplaceTempView("chess_games_eco")
    spark.sql(
      """SELECT ge.game_link, ge.half_move, ge.fen, ge.evaluation,
        |       ge.eval_depth, ge.win_probability_lr,
        |       ec.eco_code, ec.opening_name
        |FROM game_evals ge
        |JOIN chess_games_eco g ON g.game_link = ge.game_link
        |JOIN eco_codes ec ON ec.eco_code = g.opening_played
        |ORDER BY ge.game_link, ge.half_move""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qc47_serving_views" -> (qc47ServingViews _),
    "qc40_chess_moves" -> (qc40Moves _),
    "qc41_chess_positions" -> (qc41Positions _),
    "qc42_chess_clocks" -> (qc42Clocks _),
    "qc43_chess_game_infos" -> (qc43GameInfos _),
    "qc44_chess_winprob" -> (qc44WinProb _),
    "qc45_chess_materials" -> (qc45Materials _),
    "qc46_chess_flags" -> (qc46Flags _)
  )

  private val g1 = "https://lichess.org/TTYLmSUX"
  private val g2 = "https://lichess.org/abcd1234"

  val oracles: Map[String, String] = Map(
    // expected rows replay the view semantics by hand: position_evals
    // carries ONLY g1 (g2 has no eval comments — P20), but the view joins
    // on FEN alone (`game_evals_view.sql:8`), and both fixture games open
    // 1. e4 — so g2's first position joins g1's eval row, exactly as the
    // reference's Postgres view would. probability_lr values are the
    // eval-only LR curve (elo_diff 0, full clocks, no increment).
    "qc47_serving_views" ->
      s"""SELECT * FROM (VALUES
         |  ('$g1', CAST(1 AS BIGINT), 'rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0',
         |   CAST(0.05 AS DOUBLE), CAST(20 AS INT), CAST(0.500569 AS DOUBLE), 'B20', 'Sicilian Defence'),
         |  ('$g1', 2, 'rnbqkbnr/pp1ppppp/8/2p5/4P3/8/PPPP1PPP/RNBQKBNR w KQkq - 0',
         |   0.32, 20, 0.511339, 'B20', 'Sicilian Defence'),
         |  ('$g1', 3, 'rnbqkbnr/pp1ppppp/8/2p5/4PP2/8/PPPP2PP/RNBQKBNR b KQkq - 0',
         |   0.3, 20, 0.510542, 'B20', 'Sicilian Defence'),
         |  ('$g1', 4, 'rnbqkbnr/pp2pppp/3p4/2p5/4PP2/8/PPPP2PP/RNBQKBNR w KQkq - 0',
         |   0.1, 20, 0.502564, 'B20', 'Sicilian Defence'),
         |  ('$g2', 1, 'rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0',
         |   0.05, 20, 0.500569, 'C20', 'King''s Pawn Game')
         |) t(game_link, half_move, fen, evaluation, eval_depth,
         |    win_probability_lr, eco_code, opening_name)
         |ORDER BY game_link, half_move""".stripMargin,
    "qc40_chess_moves" ->
      s"""SELECT * FROM (VALUES
         |  ('$g2', 'e4', CAST(1 AS BIGINT)), ('$g2', 'e5', 2), ('$g2', 'Nf3', 3), ('$g2', 'Nc6', 4),
         |  ('$g2', 'Bc4', 5), ('$g2', 'Nf6', 6), ('$g2', 'O-O', 7),
         |  ('$g1', 'e4', 1), ('$g1', 'c5', 2), ('$g1', 'f4', 3), ('$g1', 'd6', 4)
         |) t(game_link, move, half_move) ORDER BY game_link, half_move""".stripMargin,
    "qc41_chess_positions" ->
      s"""SELECT * FROM (VALUES
         |  ('$g1', CAST(1 AS BIGINT), 'rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0'),
         |  ('$g1', 2, 'rnbqkbnr/pp1ppppp/8/2p5/4P3/8/PPPP1PPP/RNBQKBNR w KQkq - 0'),
         |  ('$g1', 3, 'rnbqkbnr/pp1ppppp/8/2p5/4PP2/8/PPPP2PP/RNBQKBNR b KQkq - 0'),
         |  ('$g1', 4, 'rnbqkbnr/pp2pppp/3p4/2p5/4PP2/8/PPPP2PP/RNBQKBNR w KQkq - 0')
         |) t(game_link, half_move, fen) ORDER BY half_move""".stripMargin,
    "qc42_chess_clocks" ->
      s"""SELECT * FROM (VALUES
         |  ('$g2', 300, CAST(1 AS BIGINT)), ('$g2', 300, 2), ('$g2', 298, 3), ('$g2', 297, 4),
         |  ('$g2', 295, 5), ('$g2', 295, 6), ('$g2', 292, 7),
         |  ('$g1', 60, 1), ('$g1', 60, 2), ('$g1', 59, 3), ('$g1', 58, 4)
         |) t(game_link, clock, half_move) ORDER BY game_link, half_move""".stripMargin,
    "qc43_chess_game_infos" ->
      s"""SELECT * FROM (VALUES
         |  ('$g2', 'black', 'someone', 'Win', CAST(1610.0 AS DOUBLE), CAST(1500.0 AS DOUBLE), 300, 3,
         |   'In arena', 'Casual', 'No queen exchange', 'No castling', 'kingside'),
         |  ('$g1', 'white', 'opponent1', 'Win', 1500.0, 1600.0, 60, 0,
         |   'Not in arena', 'Rated', 'No queen exchange', 'No castling', 'No castling')
         |) t(game_link, player_color, opponent, player_result, player_elo,
         |    opponent_elo, starting_time, increment, in_arena, rated_casual,
         |    queen_exchange, player_castling_side, opponent_castling_side)
         |ORDER BY game_link""".stripMargin,
    "qc44_chess_winprob" ->
      s"""SELECT * FROM (VALUES
         |  ('$g1', CAST(1 AS BIGINT), CAST(0.386704 AS DOUBLE), CAST(0.024775 AS DOUBLE), CAST(0.588521 AS DOUBLE), '794ab1c'),
         |  ('$g1', 2, 0.390137, 0.036785, 0.573078, '794ab1c'),
         |  ('$g1', 3, 0.377652, 0.05686, 0.565488, '794ab1c'),
         |  ('$g1', 4, 0.370119, 0.05707, 0.572811, '794ab1c')
         |) t(game_link, half_move, win_probability_white, draw_probability,
         |    win_probability_black, win_prob_model_version)
         |ORDER BY half_move""".stripMargin,
    "qc45_chess_materials" ->
      s"""SELECT * FROM (VALUES
         |  ('$g1', CAST(1 AS BIGINT), CAST(8 AS INT), CAST(2 AS INT), CAST(2 AS INT), CAST(2 AS INT), CAST(1 AS INT),
         |          CAST(8 AS INT), CAST(2 AS INT), CAST(2 AS INT), CAST(2 AS INT), CAST(1 AS INT)),
         |  ('$g1', 2, 8, 2, 2, 2, 1, 8, 2, 2, 2, 1),
         |  ('$g1', 3, 8, 2, 2, 2, 1, 8, 2, 2, 2, 1),
         |  ('$g1', 4, 8, 2, 2, 2, 1, 8, 2, 2, 2, 1),
         |  ('$g1', 5, 8, 2, 2, 2, 1, 8, 2, 2, 2, 1)
         |) t(game_link, half_move, pawns_black, bishops_black, knights_black,
         |    rooks_black, queens_black, pawns_white, bishops_white,
         |    knights_white, rooks_white, queens_white)
         |ORDER BY half_move""".stripMargin,
    "qc46_chess_flags" ->
      """SELECT * FROM (VALUES
        |  ('https://lichess.org/berserk1', TRUE, FALSE, FALSE, CAST(0 AS INT), CAST(0 AS INT), '', ''),
        |  ('https://lichess.org/promote1', FALSE, FALSE, TRUE, 1, 0, 'q', '')
        |) t(game_link, white_berserked, black_berserked, has_promotion,
        |    promotion_count_white, promotion_count_black,
        |    promotions_white, promotions_black)
        |ORDER BY game_link""".stripMargin
  )
}
