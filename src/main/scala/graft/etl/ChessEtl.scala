package graft.etl

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.chess.{ParsedGame, Pgn, Replay}

/** The chess-pipeline ETL re-expressed Spark-first.
  *
  * Stage map (reference → here):
  *  - fetch_pgn + visitors (`src/vendors/lichess.py:61-123`)  → [[parse]] / [[toWide]]
  *  - clean_chess_df (`src/feature_engineering.py:13-70`)      → [[clean]]
  *  - explode_* (`src/feature_engineering.py:73-182`)          → [[explodeMoves]] etc.
  *  - transform_game_data (`src/pipeline_import/transforms.py:251-391`) → [[gameInfos]]
  *  - get_color_stats / get_elo_by_weekday (`transforms.py:394-440`)    → [[colorStats]] / [[eloByWeekday]]
  *
  * Ordering is explicit everywhere (`posexplode` mints half_move from list
  * position, never from row order) — the #1 semantic trap flagged in
  * SURVEY.md §7.4. At scale each stage shuffles only on game_link /
  * aggregate keys; game parsing is a narrow mapPartitions.
  */
object ChessEtl {

  /** PGN text chunks → one ParsedGame per game. Each chunk may hold many
    * games (a Lichess export). Unparseable games are dropped, not fatal —
    * a single bad game must not kill a 100 TB partition.
    */
  def parse(spark: SparkSession, pgnChunks: Dataset[String]): Dataset[ParsedGame] = {
    import spark.implicits._
    pgnChunks.flatMap { chunk =>
      Pgn.parseAll(chunk).flatMap(g => Try(Replay.parse(g)).toOption)
    }
  }

  /** Standard Lichess export headers lifted to columns (FIXTURES.md §A2). */
  val headerColumns: Seq[String] = Seq(
    "Event", "Site", "Date", "Round", "White", "Black", "Result",
    "UTCDate", "UTCTime", "WhiteElo", "BlackElo", "WhiteRatingDiff",
    "BlackRatingDiff", "Variant", "TimeControl", "ECO", "Opening",
    "Termination")

  /** Wide per-game frame: header columns + visitor outputs. */
  def toWide(games: Dataset[ParsedGame]): DataFrame = {
    val withHeaders = headerColumns.foldLeft(games.toDF()) { (df, h) =>
      df.withColumn(h, element_at(col("headers"), h))
    }
    withHeaders.drop("headers")
  }

  /** clean_chess_df parity: flatten the Lichess JSON side, repair missing
    * provisional columns to false (P15, `transforms.py:226-233`), inner-join
    * on game URL (J1 — the JSON side is per-day small → broadcast), then
    * the 19-column snake_case rename (`feature_engineering.py:48-69`).
    */
  def clean(pgnWide: DataFrame, json: DataFrame): DataFrame = {
    val provisionalFixed = Seq("players_black_provisional", "players_white_provisional")
      .foldLeft(json) { (df, c) =>
        if (df.columns.contains(c)) df.withColumn(c, coalesce(col(c), lit(false)))
        else df.withColumn(c, lit(false))
      }
    val jsonSel = provisionalFixed
      .withColumn("Site", concat(lit("https://lichess.org/"), col("id")))
      .select("Site", "speed", "status",
        "players_black_provisional", "players_white_provisional")
    val renames = Seq(
      "Black" -> "black", "BlackElo" -> "black_elo",
      "BlackRatingDiff" -> "black_rating_diff", "Date" -> "date_played",
      "ECO" -> "opening_played", "Event" -> "event_type",
      "Result" -> "result", "Round" -> "round", "Site" -> "game_link",
      "Termination" -> "termination", "TimeControl" -> "time_control",
      "UTCDate" -> "utc_date_played", "UTCTime" -> "time_played",
      "Variant" -> "chess_variant", "White" -> "white",
      "WhiteElo" -> "white_elo", "WhiteRatingDiff" -> "white_rating_diff",
      "Opening" -> "lichess_opening",
      "players_black_provisional" -> "black_elo_tentative",
      "players_white_provisional" -> "white_elo_tentative")
    renames.foldLeft(pgnWide.join(broadcast(jsonSel), "Site")) {
      case (df, (from, to)) => df.withColumnRenamed(from, to)
    }
  }

  private def explodeList(cleaned: DataFrame, listCol: String, outCol: String): DataFrame =
    cleaned
      .select(col("game_link"), posexplode(col(listCol)).as(Seq("pos0", outCol)))
      .withColumn("half_move", (col("pos0") + 1).cast("long"))
      .drop("pos0")

  /** E1: (game_link, move, half_move). */
  def explodeMoves(cleaned: DataFrame): DataFrame =
    explodeList(cleaned, "moves", "move").select("game_link", "move", "half_move")

  /** E2: clocks exploded + P13 'H:MM:SS' → seconds with the -1 sentinel
    * (`transforms.py:236-243` — the sentinel is consumed by the WP model's
    * clock filter at `models.py:23`).
    */
  def explodeClocks(cleaned: DataFrame): DataFrame = {
    val parts = split(col("clock_str"), ":")
    explodeList(cleaned, "clocks", "clock_str")
      .withColumn("clock",
        coalesce(
          when(size(parts) === 3,
            parts.getItem(0).cast("int") * 3600 +
              parts.getItem(1).cast("int") * 60 +
              parts.getItem(2).cast("int")),
          lit(-1)))
      .select("game_link", "clock", "half_move")
  }

  /** E3: positions exploded + P14 FEN canonicalization (drop the trailing
    * fullmove field, `transforms.py:246-248`).
    */
  def explodePositions(cleaned: DataFrame): DataFrame = {
    val w = split(col("position"), " ")
    explodeList(cleaned, "positions", "position")
      .withColumn("fen", array_join(slice(w, lit(1), greatest(size(w) - 1, lit(0))), " "))
      .select("game_link", "position", "half_move", "fen")
  }

  /** E4: material maps → 10 fixed int columns, missing piece → 0
    * (`feature_engineering.py:145-182`). NOTE: length = plies+1 (the
    * MaterialVisitor sees the pre-game board).
    */
  def explodeMaterials(cleaned: DataFrame): DataFrame = {
    val pieceCols = Seq(
      "p" -> "pawns_black", "b" -> "bishops_black", "n" -> "knights_black",
      "r" -> "rooks_black", "q" -> "queens_black",
      "P" -> "pawns_white", "B" -> "bishops_white", "N" -> "knights_white",
      "R" -> "rooks_white", "Q" -> "queens_white")
    val base = explodeList(cleaned, "material_by_move", "mat")
    pieceCols.foldLeft(base) { case (df, (sym, name)) =>
      df.withColumn(name, coalesce(element_at(col("mat"), sym), lit(0)).cast("int"))
    }.select("game_link" +: "half_move" +: pieceCols.map(_._2) map col: _*)
  }

  /** E5: evaluations/eval_depths/positions exploded positionally in
    * lockstep via arrays_zip (`vendors/stockfish.py:39-53` relies on pandas
    * row-index alignment; arrays_zip makes the alignment explicit), with
    * clean FENs.
    */
  def explodeEvals(cleaned: DataFrame): DataFrame = {
    val w = split(col("position"), " ")
    cleaned
      .filter(exists(col("evaluations"), e => e =!= 0.0)) // P20 semantics
      .select(posexplode(arrays_zip(col("positions"), col("evaluations"), col("eval_depths"))).as(Seq("pos0", "z")))
      .select(
        col("z.positions").as("position"),
        col("z.evaluations").as("evaluation"),
        col("z.eval_depths").as("eval_depth"))
      .withColumn("w", split(col("position"), " "))
      .withColumn("fen",
        array_join(slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))), " "))
      .select("fen", "evaluation", "eval_depth")
  }

  /** transform_game_data parity (`transforms.py:251-391`): player-centric
    * derivations. The castling self-join (J2) is eliminated — the map
    * column is consulted in-row, as flagged in SURVEY.md §2.3.
    */
  def gameInfos(cleaned: DataFrame, player: String): DataFrame = {
    val playerBlack = col("black") === player
    def blend(whenBlack: Column, whenWhite: Column): Column =
      when(playerBlack, whenBlack).otherwise(whenWhite)
    val resultMapPlayer = Map(
      "0-1true" -> "Win", "1-0false" -> "Win",
      "1/2-1/2true" -> "Draw", "1/2-1/2false" -> "Draw",
      "1-0true" -> "Loss", "0-1false" -> "Loss")
    val resultKey = concat(col("result"), playerBlack.cast("string"))
    def resultDecode(m: Map[String, String]): Column =
      m.foldLeft(lit(null: String)) { case (acc, (k, v)) =>
        when(resultKey === k, lit(v)).otherwise(acc)
      }
    def rating(c: Column): Column =
      when(c === "?", lit("1500")).otherwise(c).cast("double")
    val castleW = coalesce(element_at(col("castling_sides"), "white"), lit("No castling"))
    val castleB = coalesce(element_at(col("castling_sides"), "black"), lit("No castling"))

    val withDiffDefaults = Seq("black_rating_diff", "white_rating_diff")
      .foldLeft(cleaned) { (df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(0))
      }

    withDiffDefaults
      .withColumn("player", lit(player))
      .withColumn("opponent",
        regexp_replace(concat(col("white"), col("black")), java.util.regex.Pattern.quote(player), ""))
      .withColumn("player_color", blend(lit("black"), lit("white")))
      .withColumn("opponent_color", blend(lit("white"), lit("black")))
      .withColumn("player_elo", rating(blend(col("black_elo"), col("white_elo"))))
      .withColumn("opponent_elo", rating(blend(col("white_elo"), col("black_elo"))))
      .withColumn("player_rating_diff",
        blend(col("black_rating_diff"), col("white_rating_diff")).cast("double"))
      .withColumn("opponent_rating_diff",
        blend(col("white_rating_diff"), col("black_rating_diff")).cast("double"))
      .withColumn("player_result", resultDecode(resultMapPlayer))
      .withColumn("opponent_result", resultDecode(resultMapPlayer.map {
        case (k, "Win") => k -> "Loss"
        case (k, "Loss") => k -> "Win"
        case (k, v) => k -> v
      }))
      .withColumnRenamed("speed", "time_control_category")
      .withColumn("datetime_played",
        to_timestamp(concat_ws(" ", col("utc_date_played"), col("time_played")),
          "yyyy.MM.dd HH:mm:ss"))
      .withColumn("starting_time", regexp_extract(col("time_control"), "(\\d+)\\+", 1).cast("int"))
      .withColumn("increment", regexp_extract(col("time_control"), "\\+(\\d+)", 1).cast("int"))
      .withColumn("in_arena",
        when(col("event_type").contains("Arena"), lit("In arena")).otherwise(lit("Not in arena")))
      .withColumn("rated_casual",
        when(col("event_type").contains("Casual"), lit("Casual")).otherwise(lit("Rated")))
      .withColumn("queen_exchange",
        when(col("queen_exchange"), lit("Queen exchange")).otherwise(lit("No queen exchange")))
      .withColumn("player_castling_side",
        when(col("player_color") === "black", castleB).otherwise(castleW))
      .withColumn("opponent_castling_side",
        when(col("player_color") === "black", castleW).otherwise(castleB))
      .withColumn("date_played", to_date(col("date_played"), "yyyy.MM.dd"))
      .withColumn("utc_date_played", to_date(col("utc_date_played"), "yyyy.MM.dd"))
  }

  /** A2-A4 (`transforms.py:394-416`): win/draw/loss share per
    * (time-control, color), row-normalized, fixed column order.
    */
  def colorStats(gameInfos: DataFrame): DataFrame = {
    val results = Seq("Win", "Draw", "Loss")
    val counts = gameInfos
      .groupBy(col("time_control_category"), col("player_color"))
      .pivot("player_result", results)
      .agg(countDistinct(col("game_link")))
    val filled = results.foldLeft(counts) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0L)))
    }
    val total = col("Win") + col("Draw") + col("Loss")
    filled.select(
      col("time_control_category"), col("player_color"),
      (col("Win").cast("double") / total).as("Win"),
      (col("Draw").cast("double") / total).as("Draw"),
      (col("Loss").cast("double") / total).as("Loss"))
      .orderBy(col("time_control_category"), col("player_color"))
  }

  /** A5/A6 (`transforms.py:419-440`): elo stats by weekday, 0=Sunday
    * encoding, sample stddev with single-row groups repaired to 0.
    */
  def eloByWeekday(gameInfos: DataFrame, category: String = "blitz"): DataFrame =
    gameInfos
      .filter(col("time_control_category") === category)
      .withColumn("weekday_played", (dayofweek(col("datetime_played")) - 1).cast("long"))
      .groupBy(col("weekday_played"))
      .agg(
        avg(col("player_elo")).as("mean"),
        coalesce(stddev_samp(col("player_elo")), lit(0.0)).as("std"),
        min(col("player_elo")).as("min"),
        max(col("player_elo")).as("max"))
      .orderBy(col("weekday_played"))
}
