package graft.serving

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.WpModel

/** The reference's SERVING layer as engine objects: the `eco_codes`
  * dimension (reference `db/tables/eco_codes.sql:1-6`, loaded from the
  * same CSV layout as `db/assorted_sql/copy_eco_codes.sql:1`) and the
  * view pair `game_evals` (`db/tables/game_evals_view.sql:1-11`) over
  * `win_probabilities_eval_only`
  * (`db/tables/win_probabilities_eval_only.sql:1-5`) — registered as
  * NAMED Spark SQL views so a reference user's serving queries
  * (`SELECT ... FROM game_evals ...`) run verbatim on this engine.
  */
object ServingViews {

  /** Column layout of the reference's ECO dimension. The `id` serial is
    * assigned in eco_code order (deterministic, unlike insertion-order
    * serials — documented divergence).
    */
  private def withSerialId(rows: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("eco_code"))
    // dimension tables are tiny (ECO has 500 codes); the single-partition
    // window is the standard dim-build idiom, never applied to fact data
    rows.withColumn("id", row_number().over(w))
      .select(col("id"), col("eco_code"), col("opening_name"), col("opening_notes"))
  }

  /** Load the ECO dimension from a headerless CSV
    * (eco_code, opening_name, opening_notes) — the reference's
    * eco-dictionary layout. */
  def ecoCodesFromCsv(spark: SparkSession, path: String): DataFrame =
    withSerialId(spark.read
      .schema("eco_code STRING, opening_name STRING, opening_notes STRING")
      .option("quote", "\"").csv(path))

  /** Embedded starter dimension (public ECO classification facts; covers
    * the fixture corpus) for tests and demos without a CSV on disk. */
  def ecoCodesSample(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withSerialId(Seq(
      ("A00", "Irregular Openings", "1. a4, 1. g4 and other rare first moves"),
      ("A02", "Bird's Opening", "1. f4"),
      ("B20", "Sicilian Defence", "1. e4 c5"),
      ("C20", "King's Pawn Game", "1. e4 e5"),
      ("C40", "King's Knight Opening", "1. e4 e5 2. Nf3"),
      ("D00", "Queen's Pawn Game", "1. d4 d5"),
      ("E00", "Queen's Pawn, Indian Defences", "1. d4 Nf6 2. c4 e6")
    ).toDF("eco_code", "opening_name", "opening_notes"))
  }

  /** The eval-only win-probability curve
    * (`win_probabilities_eval_only.sql:1-5`): P(white win) from the SAME
    * exported LR model (WpModel M2) with every non-eval feature at its
    * neutral value — even material of information: elo_diff 0, both
    * clocks full (clock_pct = 1), no increment. One row per distinct
    * evaluation — the curve a serving layer precomputes so eval-grain
    * lookups never run the model.
    */
  def winProbabilitiesEvalOnly(evals: DataFrame): DataFrame = {
    val sigFull = math.log(1.0 / (1.00001 - 1.0)) // sig(clock_pct = 1)
    WpModel.predictWp(
      evals.select(col("evaluation")).distinct()
        .withColumn("elo_diff", lit(0.0))
        .withColumn("white_sig_clock_pct", lit(sigFull))
        .withColumn("black_sig_clock_pct", lit(sigFull))
        .withColumn("has_increment", lit(0)))
      .select(col("evaluation").as("eval"),
        col("win_probability_white").as("probability_lr"))
  }

  /** Register the serving objects as named Spark SQL temp views:
    * `game_positions`, `position_evals`, `win_probabilities_eval_only`,
    * `eco_codes`, and the composed `game_evals` view — the reference's
    * view SQL (`game_evals_view.sql:1-11`) runs as-is over them.
    */
  def register(spark: SparkSession, positions: DataFrame, evals: DataFrame,
      ecoCodes: DataFrame): Unit = {
    positions.createOrReplaceTempView("game_positions")
    evals.createOrReplaceTempView("position_evals")
    winProbabilitiesEvalOnly(evals)
      .createOrReplaceTempView("win_probabilities_eval_only")
    ecoCodes.createOrReplaceTempView("eco_codes")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW game_evals AS
        |SELECT game_positions.game_link,
        |       game_positions.half_move,
        |       game_positions.fen,
        |       position_evals.evaluation,
        |       position_evals.eval_depth,
        |       win_probabilities_eval_only.probability_lr AS win_probability_lr
        |FROM game_positions
        |INNER JOIN position_evals
        |  ON position_evals.fen = game_positions.fen
        |INNER JOIN win_probabilities_eval_only
        |  ON win_probabilities_eval_only.eval = position_evals.evaluation
        |""".stripMargin)
  }
}
