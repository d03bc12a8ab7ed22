package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.chess.Board

/** Eval acquisition (reference `src/vendors/stockfish.py:13-111` +
  * `src/pipeline_import/transforms.py:100-183`): games that carry server
  * evals contribute them directly (E5); positions without evals are
  * anti-joined against the eval cache (J7) and the remainder is scored by a
  * pluggable [[EvalProvider]] (X1's terminal → cloud → remote → local chain
  * collapses to one trait here; rate budgets live inside the provider, as
  * they do in the reference's valkey counters).
  *
  * Scale notes: provider calls run inside mapPartitions — one provider per
  * partition, so a 1000-executor cluster fans out to 1000 engine processes
  * exactly like the reference's backfill queue (`scripts/rerun_stockfish
  * .py:62-94`), while rate-limited remote providers should bound
  * parallelism by repartitioning the to-evaluate set first.
  */
trait EvalProvider extends Serializable {

  /** Centipawn-scaled eval (white-positive) for a clean FEN, or None if the
    * provider declines (rate budget, engine error).
    */
  def evaluate(cleanFen: String): Option[Double]
}

/** P22 terminal shortcut (`transforms.py:100-113`): stalemate → 0,
  * checkmate → ±99.99 pawns for the side that delivered it; non-terminal →
  * None (fall through to the engine).
  */
object TerminalEval extends EvalProvider {
  def evaluate(cleanFen: String): Option[Double] = {
    val board = Board.fromFen(cleanFen)
    if (board.isStalemate) Some(0.0)
    else if (board.isCheckmate) {
      // side to move is checkmated; the OTHER side won
      Some(if (board.whiteToMove) -9999.0 else 9999.0)
    } else None
  }
}

/** Deterministic fake engine for tests (the reference mocks the engine the
  * same way, `tests/test_transforms.py:230-244`): terminal shortcut first,
  * then a hash-derived pseudo-eval.
  */
final class FakeEvalProvider extends EvalProvider {
  def evaluate(cleanFen: String): Option[Double] =
    TerminalEval.evaluate(cleanFen).orElse {
      Some((math.abs(cleanFen.hashCode) % 2000 - 1000) / 100.0)
    }
}

object Evals {

  /** get_evals parity. `cached` is the position_evals table
    * (fen, evaluation, eval_depth); `provider` = None mirrors
    * local_stockfish=false (no fresh evaluation, only server evals and
    * cache).
    */
  def getEvals(
      spark: SparkSession,
      cleaned: DataFrame,
      cached: DataFrame,
      provider: Option[EvalProvider],
      providerDepth: Int = 20): DataFrame = {
    import spark.implicits._
    val cachedFens = cached.select($"fen").distinct()

    // games WITH server evals → (fen, evaluation, eval_depth), E5 zip
    val serverEvals = ChessEtl.explodeEvals(cleaned)

    // games WITHOUT evals → positions to acquire, minus cache hits (J7)
    val w = split($"position", " ")
    val noEvalPositions = cleaned
      .filter(!exists($"evaluations", e => e =!= 0.0))
      .select(explode($"positions").as("position"))
      .withColumn("fen",
        array_join(slice(w, lit(1), greatest(size(w) - 1, lit(0))), " "))
      .select($"fen")
    val toEvaluate = noEvalPositions.join(cachedFens, Seq("fen"), "left_anti")

    val fresh = provider match {
      case Some(p) =>
        val depth = providerDepth
        toEvaluate
          .as[String]
          .mapPartitions { fens => fens.map(f => (f, p.evaluate(f))) }
          .filter(_._2.isDefined)
          .map { case (f, e) => (f, e.get, depth) }
          .toDF("fen", "evaluation", "eval_depth")
      case None => spark.emptyDataset[(String, Double, Int)]
        .toDF("fen", "evaluation", "eval_depth")
    }

    serverEvals
      .join(cachedFens, Seq("fen"), "left_anti") // cache wins over PGN evals
      .unionByName(fresh)
      .unionByName(cached.select($"fen", $"evaluation", $"eval_depth"))
  }
}
