package graft.chess

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the chess core (the ScalaCheck upgrade SURVEY.md §5
  * notes the reference lacks): random legal games replayed through the
  * engine must keep FEN serialization, SAN rendering, and material
  * accounting self-consistent.
  */
object ChessProps extends Properties("chess") {

  /** Play a deterministic pseudo-random game from the given seed. */
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

  private val seeds = Gen.chooseNum(0L, 5000L)

  // guard against vacuous properties: the generator must actually play.
  // The bound is >1 (at least one move), NOT >10: a legal quick mate is
  // a valid short game — seed 511 mates in 9 plies, and the former >10
  // made the suite fail whenever ScalaCheck happened to draw such a
  // seed (the round-13 one-in-many-runs flake; ChessSeedSweep now
  // replays every seed in the domain deterministically).
  property("random games are non-trivial (anti-vacuousness)") =
    Prop.forAll(seeds) { seed =>
      Board.initial.legalMoves.length == 20 && playGame(seed, 80).length > 1
    }

  property("fen round-trips at every position of a random game") =
    Prop.forAll(seeds) { seed =>
      playGame(seed, 80).forall { b =>
        val fen = b.fen
        Board.fromFen(fen).fen == fen
      }
    }

  property("rendered SAN parses back to the same position") =
    Prop.forAll(seeds) { seed =>
      val rnd = new scala.util.Random(seed)
      var board = Board.initial
      var ok = true
      var ply = 0
      while (ply < 60 && ok) {
        val moves = board.legalMoves
        if (moves.isEmpty) ply = 60
        else {
          val (from, to, promo) = moves(rnd.nextInt(moves.length))
          val pre = board.copyBoard()
          val post = pre.copyBoard()
          post.applyMove(from, to, promo)
          val kingside =
            if (pre.piece(from).toUpper == 'K' && math.abs(to % 8 - from % 8) == 2)
              Some(to % 8 == 6)
            else None
          // a pawn moving diagonally always captures (en passant included)
          val isCapture = pre.piece(to) != 0 ||
            (pre.piece(from).toUpper == 'P' && to % 8 != from % 8)
          val san = San.render(pre, post,
            SanMove(from, to, pre.piece(from).toUpper, isCapture, promo, kingside))
          val replayed = pre.copyBoard()
          replayed.applySan(san)
          ok = replayed.fen == post.fen
          board = post
          ply += 1
        }
      }
      ok
    }

  property("material never increases and kings survive") =
    Prop.forAll(seeds) { seed =>
      val states = playGame(seed, 80)
      val counts = states.map(_.materialCount.values.sum)
      val monotone = counts.zip(counts.tail).forall { case (a, b) => b <= a }
      val kings = states.forall(b =>
        b.materialCount.getOrElse("K", 0) == 1 && b.materialCount.getOrElse("k", 0) == 1)
      monotone && kings
    }

  property("legal moves never leave the mover in check") =
    Prop.forAll(seeds) { seed =>
      val rnd = new scala.util.Random(seed)
      val states = playGame(rnd.nextLong(), 40)
      states.forall { b =>
        b.legalMoves.forall { case (from, to, promo) =>
          val c = b.copyBoard()
          val mover = c.whiteToMove
          c.applyMove(from, to, promo)
          !c.isAttacked(c.kingSquare(mover), !mover)
        }
      }
    }
}
