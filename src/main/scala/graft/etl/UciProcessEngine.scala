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
      UciProcessEngine.score(out, in, fen, depth, timeoutMs, location,
        () => proc.isAlive)
    } finally {
      proc.destroy()
    }
  }
}

object UciProcessEngine {

  /** Shared go/read loop: sends the position, collects the last
    * score-carrying info line until `bestmove`.
    *
    * Reads are BOUNDED: `readLine` only runs once `in.ready()` reports
    * buffered input, so an engine that wedges without emitting anything
    * trips the deadline instead of blocking the thread (and, in
    * [[PooledUciEngine]], its lock) forever. A dead-and-drained process
    * surfaces as the EOF error, not a timeout.
    */
  private[etl] def score(
      out: PrintWriter,
      in: BufferedReader,
      fen: String,
      depth: Int,
      timeoutMs: Long,
      location: String,
      alive: () => Boolean = () => true): String = {
    out.println(s"position fen $fen")
    out.println(s"go depth $depth")
    val deadline = System.currentTimeMillis() + timeoutMs
    def nextLine(): String = {
      while (!in.ready()) {
        if (System.currentTimeMillis() > deadline)
          throw new RuntimeException(
            s"UCI engine timed out after ${timeoutMs}ms: $location")
        // exited with nothing buffered: drain EOF now (readLine → null)
        // rather than spinning out the whole deadline
        if (!alive()) return in.readLine()
        Thread.sleep(2)
      }
      in.readLine()
    }
    var lastInfo: String = ""
    var line: String = null
    while ({ line = nextLine(); line != null } &&
        !line.startsWith("bestmove")) {
      if (line.contains(" score ") || line.startsWith("info")) lastInfo = line
      if (System.currentTimeMillis() > deadline)
        throw new RuntimeException(s"UCI engine timed out after ${timeoutMs}ms: $location")
    }
    if (line == null)
      throw new RuntimeException(s"UCI engine exited before bestmove: $location")
    lastInfo
  }
}

/** Pooled variant — the SCALE.md "obvious next constant-factor win": ONE
  * long-lived engine process per deserialized instance (i.e. per executor
  * task chain), reused across evals instead of a spawn per FEN. The
  * process is respawned transparently if it dies; `close()` (or process
  * teardown at executor exit) ends it.
  *
  * Same [[LocalEngine]] contract as [[UciProcessEngine]], so the two are
  * interchangeable in [[ChainedEvalProvider]].
  */
final class PooledUciEngine(location: String, timeoutMs: Long = 60000L)
    extends LocalEngine with AutoCloseable {

  @transient private var proc: Process = _
  @transient private var out: PrintWriter = _
  @transient private var in: BufferedReader = _

  private def ensureProcess(): Unit =
    if (proc == null || !proc.isAlive) {
      val pb = new ProcessBuilder(location)
      pb.redirectErrorStream(true)
      proc = pb.start()
      out = new PrintWriter(proc.getOutputStream, true)
      in = new BufferedReader(new InputStreamReader(proc.getInputStream))
      out.println("uci")
    }

  def eval(fen: String, depth: Int): String = synchronized {
    ensureProcess()
    try UciProcessEngine.score(out, in, fen, depth, timeoutMs, location,
      () => proc.isAlive)
    catch {
      case e: Throwable =>
        close() // a wedged engine must not poison subsequent evals
        throw e
    }
  }

  override def close(): Unit = synchronized {
    if (proc != null) {
      try out.println("quit") catch { case _: Throwable => () }
      proc.destroy()
      proc = null
    }
  }
}
