package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Win-probability feature assembly + closed-form multinomial-LR scoring
  * (reference M1/M2: `src/pipeline_import/models.py`, `src/inference.py`).
  *
  * The reference scores a pickled sklearn LogisticRegression
  * (`wp_model.pckl`, md5-prefix 794ab1c). Its multinomial weights are
  * exported below as plain literals and scored as a softmax column
  * expression — codegen'd, no model runtime, bit-stable. Classes are
  * result-points [0.0, 0.5, 1.0] → (loss, draw, win) for white
  * (`models.py:119-121`, `res/analyses/win_probability/v3/src/models/
  * model_training.py:55-81`).
  */
object WpModel {

  /** Feature order: elo_diff, evaluation, white_sig_clock_pct,
    * black_sig_clock_pct, has_increment (`models.py:112-117`).
    */
  val coef: Seq[Seq[Double]] = Seq(
    Seq(-0.0020653456825569442, -0.06943595392251008, 0.017729792778502,
      0.017976611559316156, -0.060189557097077295),
    Seq(-0.0005689565359262641, -0.022899197990353885, -0.03749966370481846,
      -0.03706236252357, 0.19143268086099524),
    Seq(0.002634302218487745, 0.09233515191299033, 0.019769870926325487,
      0.019085750964400777, -0.13124312376377403))

  val intercept: Seq[Double] =
    Seq(0.5817576521378292, -1.1691812999036673, 0.5874236477611321)

  val modelVersion: String = "794ab1c"

  /** M1 feature derivation (`create_wp_features`, `models.py:19-99`).
    *
    * Input: one row per (game_link, half_move) carrying `clock`,
    * `player_color`, `player_elo`, `opponent_elo`, `evaluation`,
    * `has_increment`.
    *
    * Divergence from the reference, on purpose: the reference's
    * opponent-clock backfill (`models.py:26`) calls pandas `shift(2)`
    * WITHOUT a game grouping, so 1-2-ply games can read clocks from the
    * previous game in file order. We keep the lag within the game window —
    * same result for every game with ≥3 recorded clocks, no cross-game
    * leak, and it distributes (a global ordering would serialize 100 TB
    * through one partition).
    */
  def createWpFeatures(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("game_link")).orderBy(col("half_move"))
    def clip(c: Column, lo: Option[Double], hi: Option[Double]): Column = {
      val lower = lo.map(v => greatest(c, lit(v))).getOrElse(c)
      hi.map(v => least(lower, lit(v))).getOrElse(lower)
    }
    def sig(pct: Column): Column = log(pct / (lit(1.00001) - pct))

    val base = df
      .filter(col("clock") =!= -1)
      .withColumn("lead1", lead(col("clock"), 1).over(w))
      .withColumn("opponent_clock",
        coalesce(col("lead1"), lag(col("lead1"), 2).over(w), col("clock")))
      .withColumn("player_to_move", col("half_move") % 2)

    val wInit = Window.partitionBy(col("game_link"), col("player_to_move"))
      .orderBy(col("half_move"))
    val withInit = base
      .withColumn("initial_clock", first(col("clock")).over(wInit))
    // opponent's initial clock: the other parity's first clock, in-row via
    // a game-level window (join J6 eliminated per SURVEY.md §2.3)
    val wGame = Window.partitionBy(col("game_link"))
    val withOppInit = withInit
      .withColumn("initial_even",
        max(when(col("player_to_move") === 0, col("initial_clock"))).over(wGame))
      .withColumn("initial_odd",
        max(when(col("player_to_move") === 1, col("initial_clock"))).over(wGame))
      .withColumn("opponent_initial_clock",
        when(col("player_to_move") === 0, col("initial_odd")).otherwise(col("initial_even")))

    val clockPct = clip(clip(col("clock"), Some(1.0), None) / col("initial_clock"), None, Some(1.0))
    val oppClockPct = clip(clip(col("opponent_clock"), Some(1.0), None) / col("opponent_initial_clock"), None, Some(1.0))
    val mapped = when(col("player_color") === "black", 1.0).otherwise(0.0)

    withOppInit
      // single-parity games (e.g. 1-ply) have no opponent first clock;
      // the reference's inner merge on the flipped initial_times drops
      // those rows entirely (`inference.py:47-52`) — match it rather than
      // emit NULL-probability rows into the serving table
      .filter(col("opponent_initial_clock").isNotNull)
      .withColumn("clock_pct", clockPct)
      .withColumn("sig_clock_pct", sig(col("clock_pct")))
      .withColumn("opponent_clock_pct", oppClockPct)
      .withColumn("opponent_sig_clock_pct", sig(col("opponent_clock_pct")))
      .withColumn("player_color_mapped", mapped)
      .withColumn("white_sig_clock_pct",
        col("player_color_mapped") * col("opponent_sig_clock_pct") +
          (lit(1.0) - col("player_color_mapped")) * col("sig_clock_pct"))
      .withColumn("black_sig_clock_pct",
        col("player_color_mapped") * col("sig_clock_pct") +
          (lit(1.0) - col("player_color_mapped")) * col("opponent_sig_clock_pct"))
      .withColumn("white_elo_n",
        col("player_color_mapped") * col("opponent_elo") +
          (lit(1.0) - col("player_color_mapped")) * col("player_elo"))
      .withColumn("black_elo_n",
        col("player_color_mapped") * col("player_elo") +
          (lit(1.0) - col("player_color_mapped")) * col("opponent_elo"))
      .withColumn("elo_diff", col("white_elo_n") - col("black_elo_n"))
  }

  /** M2 scoring (`predict_wp`, `models.py:102-121`): softmax over the
    * exported weights, probabilities rounded to 6dp, model version stamped
    * (M3, `inference.py:63-71`).
    */
  def predictWp(features: DataFrame): DataFrame = {
    val xs = Seq(
      col("elo_diff"), col("evaluation"),
      col("white_sig_clock_pct"), col("black_sig_clock_pct"),
      col("has_increment").cast("double"))
    val zs = coef.zip(intercept).map { case (cs, b) =>
      exp(cs.zip(xs).map { case (c, x) => x * c }.reduce(_ + _) + lit(b))
    }
    val denom = zs.reduce(_ + _)
    features
      .withColumn("win_probability_white", round(zs(2) / denom, 6))
      .withColumn("draw_probability", round(zs(1) / denom, 6))
      .withColumn("win_probability_black", round(zs(0) / denom, 6))
      .withColumn("win_prob_model_version", lit(modelVersion))
  }

  /** estimate_win_probabilities parity (`src/inference.py:11-72`):
    * positions ⋈(left) evals with missing-eval repair, ⋈ clocks,
    * ⋈ projected game_infos (broadcast — per-day game set is small),
    * features, softmax.
    */
  def winProbabilities(
      gameInfos: DataFrame,
      evals: DataFrame,
      positions: DataFrame,
      clocks: DataFrame,
      localStockfish: Boolean = false): DataFrame = {
    val gi = gameInfos
      .withColumn("has_increment", (col("increment") > 0).cast("int"))
      .select("game_link", "has_increment", "player_color", "player_elo", "opponent_elo")
    val withEvals = positions
      .join(evals.select("fen", "evaluation"), Seq("fen"), "left")
    val repaired =
      if (localStockfish) withEvals
      else withEvals.withColumn("evaluation", coalesce(col("evaluation"), lit(0.0)))
    val joined = repaired
      .join(clocks, Seq("game_link", "half_move"))
      .join(broadcast(gi), Seq("game_link"))
    predictWp(createWpFeatures(joined))
      .select("game_link", "half_move", "win_probability_white",
        "draw_probability", "win_probability_black", "win_prob_model_version")
  }
}
