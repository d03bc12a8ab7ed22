package graft.etl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.ml.WpModel
import graft.sources.JdbcUpsert

/** The whole-day job (reference entry point 3.3, the `CopyGames` surface:
  * `docker_entrypoint.py:46-63`'s 17-step DAG collapsed into one Spark job
  * graph). Each reference step was a process writing parquet; here the
  * stages are lazy DataFrames over one SparkSession — Catalyst sees the
  * whole lineage, so column pruning and filter pushdown cross what used to
  * be process boundaries.
  */
object Pipeline {

  final case class DayOutputs(
      cleaned: DataFrame,
      evals: DataFrame,
      moves: DataFrame,
      clocks: DataFrame,
      positions: DataFrame,
      materials: DataFrame,
      gameInfos: DataFrame,
      winProbabilities: DataFrame)

  /** fetch→parse→clean→explodes→game_infos→win_probabilities for one
    * (player, day) batch of PGN text + game-metadata JSON.
    */
  def runDay(
      spark: SparkSession,
      pgnChunks: Dataset[String],
      json: DataFrame,
      player: String,
      cachedEvals: DataFrame,
      evalProvider: Option[EvalProvider] = None,
      localStockfish: Boolean = false): DayOutputs = {
    val cleaned =
      ChessEtl.clean(ChessEtl.toWide(ChessEtl.parse(spark, pgnChunks)), json).cache()
    val evals = Evals.getEvals(spark, cleaned, cachedEvals, evalProvider)
    val positions = ChessEtl.explodePositions(cleaned)
    val clocks = ChessEtl.explodeClocks(cleaned)
    val gameInfos = ChessEtl.gameInfos(cleaned, player)
    DayOutputs(
      cleaned = cleaned,
      evals = evals,
      moves = ChessEtl.explodeMoves(cleaned),
      clocks = clocks,
      positions = positions,
      materials = ChessEtl.explodeMaterials(cleaned),
      gameInfos = gameInfos,
      winProbabilities = WpModel.winProbabilities(
        gameInfos, evals, positions, clocks, localStockfish))
  }

  /** load_* ×7 (S7): upsert every output into its serving table with the
    * reference's id-column keys (`postgres_templates.py:13-157`).
    */
  def loadAll(outputs: DayOutputs, url: String,
      props: Properties = new Properties()): Unit = {
    JdbcUpsert.upsertNamed(outputs.gameInfos, url, "chess_games", props)
    JdbcUpsert.upsertNamed(outputs.moves, url, "game_moves", props)
    JdbcUpsert.upsertNamed(outputs.clocks, url, "game_clocks", props)
    JdbcUpsert.upsertNamed(outputs.positions, url, "game_positions", props)
    JdbcUpsert.upsertNamed(outputs.materials, url, "game_materials", props)
    JdbcUpsert.upsertNamed(outputs.evals, url, "position_evals", props)
    JdbcUpsert.upsertNamed(outputs.winProbabilities, url, "win_probabilities", props)
  }
}
