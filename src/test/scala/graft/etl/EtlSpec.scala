package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.WpModel

/** End-to-end ETL parity against reference-derived golden values
  * (`tests/test_feature_engineering.py`, `tests/test_transforms.py`,
  * `src/inference.py` semantics; fixtures per FIXTURES.md §A).
  */
class EtlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

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

  def jsonFixture: DataFrame = {
    import spark.implicits._
    Seq(
      ("TTYLmSUX", "bullet", "mate", Some(false), None: Option[Boolean]),
      ("abcd1234", "blitz", "resign", None, Some(true))
    ).toDF("id", "speed", "status",
      "players_black_provisional", "players_white_provisional")
  }

  lazy val cleaned: DataFrame = {
    import spark.implicits._
    val wide = ChessEtl.toWide(ChessEtl.parse(spark, Seq(pgnFixture).toDS()))
    ChessEtl.clean(wide, jsonFixture).cache()
  }

  test("clean joins PGN and JSON and renames to snake_case") {
    val row = cleaned.filter(col("game_link") === "https://lichess.org/TTYLmSUX")
      .select("black", "white_elo", "time_control", "speed", "status",
        "black_elo_tentative", "white_elo_tentative", "chess_variant")
      .head()
    assert(row.getString(0) == "opponent1")
    assert(row.getString(1) == "1500")
    assert(row.getString(2) == "60+0")
    assert(row.getString(3) == "bullet")
    assert(row.getString(4) == "mate")
    assert(!row.getBoolean(5)) // present false stays false
    assert(!row.getBoolean(6)) // missing → repaired to false
    assert(row.getString(7) == "Standard")
    val row2 = cleaned.filter(col("game_link") === "https://lichess.org/abcd1234")
      .select("black_elo_tentative", "white_elo_tentative").head()
    assert(!row2.getBoolean(0)) // missing → false
    assert(row2.getBoolean(1))  // present true stays true
  }

  test("explode_moves mints half_move from list position") {
    val rows = ChessEtl.explodeMoves(cleaned)
      .filter(col("game_link") === "https://lichess.org/TTYLmSUX")
      .orderBy("half_move").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("e4", "c5", "f4", "d6"))
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("explode_clocks converts to seconds") {
    val rows = ChessEtl.explodeClocks(cleaned)
      .filter(col("game_link") === "https://lichess.org/TTYLmSUX")
      .orderBy("half_move").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(60, 60, 59, 58))
  }

  test("explode_positions emits clean FENs (fullmove dropped)") {
    val rows = ChessEtl.explodePositions(cleaned)
      .filter(col("game_link") === "https://lichess.org/TTYLmSUX")
      .orderBy("half_move").collect()
    assert(rows.head.getString(1) == "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0 1")
    assert(rows.head.getString(3) == "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq - 0")
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("explode_materials yields plies+1 rows of fixed piece columns") {
    val rows = ChessEtl.explodeMaterials(cleaned)
      .filter(col("game_link") === "https://lichess.org/TTYLmSUX")
      .orderBy("half_move").collect()
    assert(rows.length == 5) // pre-game board included
    assert(rows.forall(r => r.getInt(r.fieldIndex("pawns_white")) == 8))
    assert(rows.forall(r => r.getInt(r.fieldIndex("queens_black")) == 1))
  }

  test("explode_evals zips evals/depths/positions in lockstep") {
    val rows = ChessEtl.explodeEvals(cleaned).orderBy("fen").collect()
    // only game 1 has evals; game 2 (clocks only) is excluded by P20
    assert(rows.length == 4)
    assert(rows.forall(_.getInt(2) == 20))
  }

  test("game_infos: player-centric transform parity") {
    val gi = ChessEtl.gameInfos(cleaned, "thibault").cache()
    val g1 = gi.filter(col("game_link") === "https://lichess.org/TTYLmSUX").head()
    def s(r: org.apache.spark.sql.Row, n: String) = r.getString(r.fieldIndex(n))
    def d(r: org.apache.spark.sql.Row, n: String) = r.getDouble(r.fieldIndex(n))
    assert(s(g1, "player_color") == "white")
    assert(s(g1, "opponent") == "opponent1")
    assert(s(g1, "player_result") == "Win")
    assert(s(g1, "opponent_result") == "Loss")
    assert(d(g1, "player_elo") == 1500.0)
    assert(d(g1, "opponent_elo") == 1600.0)
    assert(d(g1, "player_rating_diff") == 8.0)
    assert(g1.getInt(g1.fieldIndex("starting_time")) == 60)
    assert(g1.getInt(g1.fieldIndex("increment")) == 0)
    assert(s(g1, "in_arena") == "Not in arena")
    assert(s(g1, "rated_casual") == "Rated")
    assert(s(g1, "queen_exchange") == "No queen exchange")
    assert(s(g1, "player_castling_side") == "No castling")
    assert(g1.getTimestamp(g1.fieldIndex("datetime_played")).toString == "2021-05-01 12:00:01.0")

    val g2 = gi.filter(col("game_link") === "https://lichess.org/abcd1234").head()
    assert(s(g2, "player_color") == "black")
    assert(s(g2, "player_result") == "Win") // 0-1 with player black
    assert(d(g2, "opponent_elo") == 1500.0) // '?' sentinel repair
    assert(s(g2, "in_arena") == "In arena")
    assert(s(g2, "rated_casual") == "Casual")
    assert(s(g2, "opponent_castling_side") == "kingside") // white O-O
    assert(s(g2, "player_castling_side") == "No castling")
    assert(g2.getInt(g2.fieldIndex("increment")) == 3)
  }

  test("color stats pivot: row-normalized Win/Draw/Loss shares") {
    import spark.implicits._
    // fixture shape of tests/test_transforms.py:791-821
    val games = Seq(
      ("g1", "blitz", "white", "Win"), ("g2", "blitz", "white", "Win"),
      ("g3", "blitz", "white", "Loss"), ("g4", "blitz", "black", "Draw"),
      ("g5", "bullet", "black", "Win")
    ).toDF("game_link", "time_control_category", "player_color", "player_result")
    val stats = ChessEtl.colorStats(games).collect()
    val byKey = stats.map(r => (r.getString(0), r.getString(1)) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(byKey(("blitz", "white")) == ((2.0 / 3, 0.0, 1.0 / 3)))
    assert(byKey(("blitz", "black")) == ((0.0, 1.0, 0.0)))
    assert(byKey(("bullet", "black")) == ((1.0, 0.0, 0.0)))
  }

  test("elo by weekday: Sunday-first encoding, single-row std → 0") {
    import spark.implicits._
    val df = Seq(
      ("blitz", java.sql.Timestamp.valueOf("2021-05-02 10:00:00"), 1500.0), // Sunday
      ("blitz", java.sql.Timestamp.valueOf("2021-05-03 10:00:00"), 1510.0), // Monday
      ("blitz", java.sql.Timestamp.valueOf("2021-05-03 11:00:00"), 1530.0),
      ("bullet", java.sql.Timestamp.valueOf("2021-05-04 10:00:00"), 1400.0)
    ).toDF("time_control_category", "datetime_played", "player_elo")
    val rows = ChessEtl.eloByWeekday(df, "blitz").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L)) // Sunday=0, Monday=1
    val sunday = rows(0)
    assert(sunday.getDouble(1) == 1500.0)
    assert(sunday.getDouble(2) == 0.0) // single-row group: NaN/null → 0
    val monday = rows(1)
    assert(monday.getDouble(1) == 1520.0)
    assert(math.abs(monday.getDouble(2) - math.sqrt(200.0)) < 1e-9)
  }

  test("win probabilities match the exported sklearn model (golden values)") {
    val gi = ChessEtl.gameInfos(cleaned, "thibault")
    val wp = WpModel.winProbabilities(
      gameInfos = gi,
      evals = ChessEtl.explodeEvals(cleaned),
      positions = ChessEtl.explodePositions(cleaned),
      clocks = ChessEtl.explodeClocks(cleaned))
      .filter(col("game_link") === "https://lichess.org/TTYLmSUX")
      .orderBy("half_move").collect()
    // golden values: pandas/numpy replication of models.py semantics with
    // the exported coefficients (see WpModel scaladoc)
    val expected = Seq(
      (1, 0.386704, 0.024775, 0.588521),
      (2, 0.390137, 0.036785, 0.573078),
      (3, 0.377652, 0.05686, 0.565488),
      (4, 0.370119, 0.05707, 0.572811))
    assert(wp.length == 4)
    wp.zip(expected).foreach { case (r, (hm, win, draw, loss)) =>
      assert(r.getLong(r.fieldIndex("half_move")) == hm)
      assert(math.abs(r.getDouble(r.fieldIndex("win_probability_white")) - win) < 1e-9)
      assert(math.abs(r.getDouble(r.fieldIndex("draw_probability")) - draw) < 1e-9)
      assert(math.abs(r.getDouble(r.fieldIndex("win_probability_black")) - loss) < 1e-9)
      assert(r.getString(r.fieldIndex("win_prob_model_version")) == "794ab1c")
    }
  }
}
