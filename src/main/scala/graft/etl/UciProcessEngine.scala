package graft.etl

import java.io.{BufferedReader, InputStreamReader, PrintWriter}

/** Real local-engine implementation of [[LocalEngine]]: spawns a UCI
  * process per evaluation exactly like the reference's eval of last resort
  * (`transforms.py:94-100` constructs a fresh `stockfish.Stockfish` per
  * FEN), speaks `position fen` / `go depth`, and returns the final
  * score-carrying `info` line — the string [[UciEval.parse]] consumes.
  *
  * Spawning per call is deliberate parity (and crash isolation: a wedged
  * engine kills one eval, not the executor). A pooled variant would keep
  * the process open across calls; the contract is unchanged.
  */
final class UciProcessEngine(location: String, timeoutMs: Long = 60000L)
    extends LocalEngine {

  def eval(fen: String, depth: Int): String = {
    val pb = new ProcessBuilder(location)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new PrintWriter(proc.getOutputStream, true)
    val in = new BufferedReader(new InputStreamReader(proc.getInputStream))
    try {
      out.println("uci")
      out.println(s"position fen $fen")
      out.println(s"go depth $depth")
      val deadline = System.currentTimeMillis() + timeoutMs
      var lastInfo: String = ""
      var line: String = null
      while ({ line = in.readLine(); line != null } &&
          !line.startsWith("bestmove")) {
        if (line.contains(" score ") || line.startsWith("info")) lastInfo = line
        if (System.currentTimeMillis() > deadline)
          throw new RuntimeException(s"UCI engine timed out after ${timeoutMs}ms: $location")
      }
      out.println("quit")
      lastInfo
    } finally {
      proc.destroy()
    }
  }
}
