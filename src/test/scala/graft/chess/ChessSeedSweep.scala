package graft.chess

import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive sweep of the ChessProps seed domain (0..5000): the
  * property suite samples 100 seeds per run, so a single bad seed
  * would surface as a rare flake (one full-suite run in round 13
  * reported ChessProps failed with no falsified case in the captured
  * tail, unreproducible across re-runs). This spec replays the
  * library-level invariants over EVERY seed once, deterministically —
  * if a bad seed existed it would fail here every time.
  */
class ChessSeedSweep extends AnyFunSuite {

  private def playGame(seed: Long, maxPlies: Int): Seq[Board] = {
    val rnd = new scala.util.Random(seed)
    var board = Board.initial
    val states = scala.collection.mutable.ArrayBuffer(board.copyBoard())
    var ply = 0
    var done = false
    while (ply < maxPlies && !done) {
      val moves = board.legalMoves
      if (moves.isEmpty) done = true
      else {
        val (from, to, promo) = moves(rnd.nextInt(moves.length))
        board.applyMove(from, to, promo)
        states += board.copyBoard()
        ply += 1
      }
    }
    states.toSeq
  }

  test("every seed in 0..5000: fen round-trips and kings survive") {
    (0L to 5000L).foreach { seed =>
      val game = playGame(seed, 80)
      // >1, not >10: quick legal mates exist (seed 511 mates in 9
      // plies) — the game must only be non-vacuous
      assert(game.length > 1, s"seed $seed: trivial game")
      game.foreach { b =>
        assert(Board.fromFen(b.fen).fen == b.fen, s"seed $seed: fen round-trip")
        val pieces = b.fen.takeWhile(_ != ' ')
        assert(pieces.contains('K') && pieces.contains('k'),
          s"seed $seed: a king vanished")
      }
    }
  }
}
