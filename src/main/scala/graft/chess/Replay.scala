package graft.chess

import scala.collection.mutable.ArrayBuffer

/** One parsed game: every PGN header plus all seven visitor outputs
  * (reference `src/vendors/lichess.py:96-123`,
  * `src/pipeline_import/transforms.py:215-223`). The reference replays the
  * game once per visitor; we fold all visitors in a single board replay.
  *
  * `promotion_count`/`promotions` keep the reference's `str(chess.WHITE)` /
  * `str(chess.BLACK)` keys ("True"/"False", `visitors.py:153-158`).
  */
final case class ParsedGame(
    headers: Map[String, String],
    moves: Seq[String],
    evaluations: Seq[Double],
    eval_depths: Seq[Int],
    clocks: Seq[String],
    white_berserked: Boolean,
    black_berserked: Boolean,
    queen_exchange: Boolean,
    castling_sides: Map[String, String],
    positions: Seq[String],
    has_promotion: Boolean,
    promotion_count: Map[String, Int],
    promotions: Map[String, Seq[String]],
    promotion_count_white: Int,
    promotion_count_black: Int,
    promotions_white: String,
    promotions_black: String,
    material_by_move: Seq[Map[String, Int]]
)

object Replay {

  private val evalRe = """\[%eval ([^\]]+)""".r
  private val clkRe = """\[%clk ([^\]]+)""".r

  /** Replay one game, folding all visitor semantics in a single pass. */
  def parse(g: PgnGame): ParsedGame = {
    // From-Position games carry a FEN header; python-chess starts the replay
    // there while the reference renames the variant to Standard
    // (`transforms.py:216-217` — its getattr() always yields the default, so
    // Variant is unconditionally rewritten).
    val board = g.header("FEN").map(Board.fromFen).getOrElse(Board.initial)

    val sans = ArrayBuffer.empty[String]
    val evals = ArrayBuffer.empty[Double]
    val depths = ArrayBuffer.empty[Int]
    val clocks = ArrayBuffer.empty[String]
    var whiteBerserked = false
    var blackBerserked = false
    var whiteClock: Option[Int] = None
    var blackClock: Option[Int] = None
    var queenExchange = false
    var capturedAt = 0
    var moveCounter = 0
    var castleWhite: String = null
    var castleBlack: String = null
    val positions = ArrayBuffer.empty[String]
    var hasPromotion = false
    val promosWhite = ArrayBuffer.empty[String]
    val promosBlack = ArrayBuffer.empty[String]
    val materials = ArrayBuffer.empty[Map[String, Int]]

    // MaterialVisitor sees the pre-game board too (visit_board fires for the
    // initial position; PositionsVisitor skips it — `visitors.py:137-140` vs
    // `:188-193`).
    materials += board.materialCount

    def visitComment(c: String): Unit = {
      // EvalsVisitor (`visitors.py:18-45`)
      evalRe.findFirstMatchIn(c) match {
        case Some(m) =>
          val e = m.group(1)
          val v =
            if (e.startsWith("#")) { if (e.contains("-")) -9999.0 else 9999.0 }
            else e.toDouble
          evals += v
          depths += 20
        case None if evals.nonEmpty =>
          // comment without eval on a game that has evals: final checkmate
          // ply — backfill from the game result (draws never hit this path:
          // stalemate gets a real 0.0 eval, `visitors.py:31-45`)
          val r = g.result match {
            case "1-0" => 9999.0
            case "0-1" => -9999.0
            case other => throw new IllegalStateException(s"no eval backfill for result $other")
          }
          evals += r
          depths += 20
        case None => ()
      }
      // ClocksVisitor (`visitors.py:59-76`): berserk check fires on the 3rd
      // comment, comparing the first two clocks; a strictly larger black
      // clock means white berserked and vice versa.
      val clockTime = clkRe.findFirstMatchIn(c).map(_.group(1)).getOrElse("")
      val secs = parseClock(clockTime)
      if (clocks.length == 0) whiteClock = secs
      else if (clocks.length == 1) blackClock = secs
      else if (clocks.length == 2) (whiteClock, blackClock) match {
        case (Some(w), Some(b)) =>
          if (b > w) whiteBerserked = true
          else if (w > b) blackBerserked = true
        case _ => ()
      }
      clocks += clockTime
    }

    var ply = 0
    while (ply < g.moves.length) {
      val before = board.copyBoard()
      val sm = board.applySan(g.moves(ply))
      sans += San.render(before, board, sm)
      moveCounter += 1
      // QueenExchangeVisitor (`visitors.py:92-98`): a queen sitting on the
      // destination square, captured on the ply right after another one.
      val dest = before.piece(sm.to)
      if (dest == 'Q' || dest == 'q') {
        if (capturedAt == moveCounter - 1) queenExchange = true
        capturedAt = moveCounter
      }
      // CastlingVisitor (`visitors.py:114-124`): any king move landing on
      // g1/c1/g8/c8 counts, castling or not — mirrored exactly.
      if (sm.piece == 'K') sm.to match {
        case 6  => castleWhite = "kingside"
        case 2  => castleWhite = "queenside"
        case 62 => castleBlack = "kingside"
        case 58 => castleBlack = "queenside"
        case _  => ()
      }
      // PromotionsVisitor (`visitors.py:160-166`)
      if (sm.promo != 0) {
        hasPromotion = true
        if (before.whiteToMove) promosWhite += sm.promo.toLower.toString
        else promosBlack += sm.promo.toLower.toString
      }
      // PositionsVisitor + MaterialVisitor (post-move board)
      positions += board.fen
      materials += board.materialCount
      g.comments(ply).foreach(visitComment)
      ply += 1
    }

    val headers = {
      val base = g.headers.toMap
      // `transforms.py:216-217`: Variant is rewritten to Standard (the
      // reference's getattr() on Headers always returns the '' default, so
      // the rewrite is unconditional).
      base.updated("Variant", "Standard")
    }

    ParsedGame(
      headers = headers,
      moves = sans.toSeq,
      evaluations = evals.toSeq,
      eval_depths = depths.toSeq,
      clocks = clocks.toSeq,
      white_berserked = whiteBerserked,
      black_berserked = blackBerserked,
      queen_exchange = queenExchange,
      castling_sides = Map("black" -> castleBlack, "white" -> castleWhite),
      positions = positions.toSeq,
      has_promotion = hasPromotion,
      promotion_count = Map("True" -> promosWhite.length, "False" -> promosBlack.length),
      promotions = Map("True" -> promosWhite.toSeq, "False" -> promosBlack.toSeq),
      promotion_count_white = promosWhite.length,
      promotion_count_black = promosBlack.length,
      promotions_white = promosWhite.sorted.mkString,
      promotions_black = promosBlack.sorted.mkString,
      material_by_move = materials.toSeq
    )
  }

  def parseClock(s: String): Option[Int] = {
    val parts = s.split(":")
    if (parts.length != 3) None
    else
      try Some(parts(0).toInt * 3600 + parts(1).toInt * 60 + parts(2).toInt)
      catch { case _: NumberFormatException => None }
  }
}

/** Canonical SAN rendering (python-chess `Board.san()` parity): the
  * reference re-renders every move via `x.san()` (`transforms.py:222`),
  * so our `moves` column must be canonical SAN, not the input token.
  */
object San {

  /** Render the SAN of `sm` given the position before (`pre`) and after
    * (`post`) the move.
    */
  def render(pre: Board, post: Board, sm: SanMove): String = {
    val suffix =
      if (post.isCheckmate) "#"
      else if (post.inCheck) "+"
      else ""
    sm.kingside match {
      case Some(true)  => return "O-O" + suffix
      case Some(false) => return "O-O-O" + suffix
      case None        => ()
    }
    val toName = Board.squareName(sm.to)
    if (sm.piece == 'P') {
      val promoStr = if (sm.promo != 0) s"=${sm.promo.toUpper}" else ""
      if (sm.capture) s"${('a' + sm.from % 8).toChar}x$toName$promoStr$suffix"
      else s"$toName$promoStr$suffix"
    } else {
      // disambiguate among *legal* same-piece moves reaching the target
      val want = if (pre.whiteToMove) sm.piece else sm.piece.toLower
      val others = (0 until 64).filter { from =>
        from != sm.from && pre.piece(from) == want && canLegallyReach(pre, from, sm.to)
      }
      val dis =
        if (others.isEmpty) ""
        else {
          val sameFile = others.exists(o => o % 8 == sm.from % 8)
          val sameRank = others.exists(o => o / 8 == sm.from / 8)
          if (!sameFile) ('a' + sm.from % 8).toChar.toString
          else if (!sameRank) (sm.from / 8 + 1).toString
          else Board.squareName(sm.from)
        }
      val x = if (sm.capture) "x" else ""
      s"${sm.piece}$dis$x$toName$suffix"
    }
  }

  private def canLegallyReach(pre: Board, from: Int, to: Int): Boolean =
    pre.pseudoReach(from, to) && !pre.wouldLeaveKingInCheck(from, to)
}
