package graft.chess

import scala.collection.mutable.ArrayBuffer

/** A single parsed PGN game: tag pairs + movetext tokens.
  * `moves(i)` is the SAN token of ply i+1; `comments(i)` the comment blocks
  * attached to that ply (python-chess fires `visit_comment` once per block,
  * and not at all for moves without comments — the Evals/Clocks visitors
  * depend on that distinction, reference `visitors.py:18-45,59-76`).
  */
final case class PgnGame(
    headers: Vector[(String, String)],
    moves: Vector[String],
    comments: Vector[Vector[String]],
    result: String
) {
  def header(name: String): Option[String] = headers.find(_._1 == name).map(_._2)
}

/** PGN text → games. Handles multi-game exports, `{}` comments, `;` line
  * comments, `$n` NAGs, move-number tokens, and (skipped) recursive
  * variations — the full import surface python-chess reads for Lichess
  * exports (reference `src/vendors/lichess.py:61-123`).
  */
object Pgn {

  private val tagRe = """\[\s*(\w+)\s*"((?:[^"\\]|\\.)*)"\s*\]""".r
  private val resultTokens = Set("1-0", "0-1", "1/2-1/2", "*")

  def parseAll(text: String): Vector[PgnGame] = {
    val games = ArrayBuffer.empty[PgnGame]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text(i).isWhitespace) i += 1
      if (i < n) {
        val (game, next) = parseOne(text, i)
        if (game.headers.nonEmpty || game.moves.nonEmpty) games += game
        i = math.max(next, i + 1)
      }
    }
    games.toVector
  }

  private def parseOne(text: String, start: Int): (PgnGame, Int) = {
    var i = start
    val n = text.length
    val headers = ArrayBuffer.empty[(String, String)]
    // --- header section: lines starting with '['
    var scanning = true
    while (scanning) {
      while (i < n && (text(i) == ' ' || text(i) == '\t' || text(i) == '\r' || text(i) == '\n')) i += 1
      if (i < n && text(i) == '[') {
        val eol = { val e = text.indexOf('\n', i); if (e < 0) n else e }
        val line = text.substring(i, eol)
        tagRe.findFirstMatchIn(line) match {
          case Some(m) =>
            headers += ((m.group(1), m.group(2).replace("\\\"", "\"").replace("\\\\", "\\")))
            i = eol
          case None => scanning = false // '[' that is not a tag: movetext
        }
      } else scanning = false
    }
    // --- movetext
    val moves = ArrayBuffer.empty[String]
    val comments = ArrayBuffer.empty[Vector[String]]
    var pending = ArrayBuffer.empty[String] // comments for last move
    var gameResult = "*"
    var done = false
    def flushComments(): Unit =
      if (moves.nonEmpty) { comments(moves.length - 1) = pending.toVector }
    while (!done && i < n) {
      val c = text(i)
      if (c.isWhitespace) i += 1
      else if (c == '{') {
        val e = text.indexOf('}', i + 1)
        val end = if (e < 0) n else e
        pending += text.substring(i + 1, end).trim
        flushComments()
        i = end + 1
      } else if (c == ';') {
        val e = text.indexOf('\n', i); i = if (e < 0) n else e
      } else if (c == '(') { // skip variation with nesting (Lichess: absent)
        var depth = 1; i += 1
        while (i < n && depth > 0) {
          text(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case '{' => val e = text.indexOf('}', i); i = if (e < 0) n - 1 else e
            case _   =>
          }
          i += 1
        }
      } else if (c == '[') { // next game's header block
        done = true
      } else {
        var j = i
        while (j < n && !text(j).isWhitespace && text(j) != '{' && text(j) != ';' && text(j) != '(' && text(j) != ')') j += 1
        val tok0 = text.substring(i, j)
        i = j
        if (resultTokens.contains(tok0)) { gameResult = tok0; done = true }
        else if (tok0.head == '$') () // NAG
        else {
          // strip a leading move number, possibly glued to the SAN ("12.e4",
          // "12...", "12."), but keep 0-0/0-0-0 castling intact
          val tok =
            if (tok0.head.isDigit && !tok0.startsWith("0-0"))
              tok0.dropWhile(_.isDigit).dropWhile(_ == '.')
            else if (tok0.head == '.') tok0.dropWhile(_ == '.')
            else tok0
          if (tok.nonEmpty) {
            moves += tok
            comments += Vector.empty
            // DOCUMENTED DIVERGENCE: a comment appearing BEFORE the first
            // move is discarded here, where python-chess fires
            // visit_comment for it. Lichess exports never emit pre-move
            // comments (clk/eval annotations always follow a move), so no
            // reference-pipeline input hits this; a replay of arbitrary
            // PGN with game-start commentary would shift clocks[0] wrt
            // the reference. See COVERAGE.md.
            pending = ArrayBuffer.empty[String]
          }
        }
      }
    }
    // consume trailing whitespace so caller resumes at the next game
    while (i < n && text(i).isWhitespace) i += 1
    (PgnGame(headers.toVector, moves.toVector, comments.toVector,
      headers.find(_._1 == "Result").map(_._2).getOrElse(gameResult)), i)
  }
}
