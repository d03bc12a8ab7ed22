package graft.etl

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Engine process contracts: spawn-per-eval vs pooled-reuse, scored
  * through the same go/read loop, verified with a scripted engine that
  * records every spawn.
  */
class UciEngineSpec extends AnyFunSuite {

  /** A fake engine that logs its own startup and echoes a per-position
    * score (the cp value = length of the fen string, so different
    * positions produce different scores through one process).
    */
  private def scriptedEngine(dir: String): String = {
    val log = s"$dir/spawns.log"
    val path = Paths.get(s"$dir/fakefish")
    Files.write(path,
      s"""#!/bin/sh
         |echo spawn >> $log
         |while read line; do
         |  case "$$line" in
         |    uci) echo "uciok";;
         |    position*) FEN=$${line#position fen };;
         |    go*) echo "info depth 20 score cp $${#FEN} pv e2e4"
         |         echo "bestmove e2e4";;
         |    quit) exit 0;;
         |  esac
         |done
         |""".stripMargin.getBytes("UTF-8"))
    path.toFile.setExecutable(true)
    path.toString
  }

  private def spawns(dir: String): Int = {
    val p = Paths.get(s"$dir/spawns.log")
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").linesIterator.size
    else 0
  }

  val whiteFen = "8/8/8/8/8/8/8/K6k w - - 0 1"

  test("spawn-per-eval engine starts one process per call (reference parity)") {
    val dir = Files.createTempDirectory("uci").toString
    val engine = new UciProcessEngine(scriptedEngine(dir))
    assert(UciEval.parse(engine.eval(whiteFen, 20), whiteFen) == whiteFen.length / 100.0)
    engine.eval(whiteFen + " x", 20)
    assert(spawns(dir) == 2)
  }

  /** An engine that answers `uci` then wedges silently on `go` — it never
    * emits another byte, so only a bounded-wait read loop can time out.
    */
  private def silentEngine(dir: String, onGo: String): String = {
    val path = Paths.get(s"$dir/wedgefish")
    Files.write(path,
      s"""#!/bin/sh
         |while read line; do
         |  case "$$line" in
         |    uci) echo "uciok";;
         |    go*) $onGo;;
         |  esac
         |done
         |""".stripMargin.getBytes("UTF-8"))
    path.toFile.setExecutable(true)
    path.toString
  }

  test("a silent engine trips the timeout instead of blocking forever") {
    val dir = Files.createTempDirectory("uci").toString
    val engine = new UciProcessEngine(silentEngine(dir, "sleep 60"), timeoutMs = 400)
    val t0 = System.currentTimeMillis()
    val e = intercept[RuntimeException](engine.eval(whiteFen, 20))
    assert(e.getMessage.contains("timed out"))
    assert(System.currentTimeMillis() - t0 < 5000) // not the 60s sleep
  }

  test("an engine that dies before bestmove errors promptly, not at the deadline") {
    val dir = Files.createTempDirectory("uci").toString
    val engine = new UciProcessEngine(silentEngine(dir, "exit 1"), timeoutMs = 60000)
    val t0 = System.currentTimeMillis()
    val e = intercept[RuntimeException](engine.eval(whiteFen, 20))
    assert(e.getMessage.contains("exited before bestmove"))
    assert(System.currentTimeMillis() - t0 < 5000) // EOF, not the 60s timeout
  }

  test("pooled engine reuses one process across evals and respawns after a kill") {
    val dir = Files.createTempDirectory("uci").toString
    val engine = new PooledUciEngine(scriptedEngine(dir))
    try {
      val fens = (1 to 5).map(i => whiteFen + (" y" * i))
      fens.foreach { f =>
        assert(UciEval.parse(engine.eval(f, 20), f) == f.length / 100.0)
      }
      assert(spawns(dir) == 1) // five evals, one process

      engine.close() // simulate a dead engine
      assert(UciEval.parse(engine.eval(whiteFen, 20), whiteFen) == whiteFen.length / 100.0)
      assert(spawns(dir) == 2) // transparently respawned
    } finally engine.close()
  }
}
