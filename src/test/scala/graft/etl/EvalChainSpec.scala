package graft.etl

import java.time.LocalDate

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LichessHttpError

/** Mirrors `/root/reference/tests/test_transforms.py:230-504`: the tiered
  * cloud → remote → local chain, day/month budgets on expiring counters,
  * and the UCI `score (cp|mate)` parse with its sign conventions.
  */
class EvalChainSpec extends AnyFunSuite {

  val day: LocalDate = LocalDate.of(2024, 4, 28)

  final class RecordingCounters extends CounterStore {
    val store = scala.collection.mutable.Map.empty[String, Long]
    val inits = ArrayBuffer.empty[(String, Long)]
    def getOrInit(key: String, expireAtUnix: Long): Long = {
      inits += (key -> expireAtUnix)
      store.getOrElseUpdate(key, 0L)
    }
    def incr(key: String): Unit = store(key) = store.getOrElse(key, 0L) + 1
  }

  final class FakeCloud(pv: Map[String, Int], fail: Option[Int] = None) extends CloudEvalApi {
    var calls = 0
    def cloudEval(fen: String, multiPv: Int): Map[String, Int] = {
      calls += 1
      fail.foreach(status => throw LichessHttpError(status, "api error"))
      pv
    }
  }

  final class FakeLocal(info: String) extends LocalEngine {
    var calls = 0
    def eval(fen: String, depth: Int): String = { calls += 1; info }
  }

  def chain(
      cloud: Option[CloudEvalApi] = None,
      remote: Option[RemoteEvalApi] = None,
      local: LocalEngine = new FakeLocal("score cp 0 "),
      counters: CounterStore = new RecordingCounters): ChainedEvalProvider =
    new ChainedEvalProvider(cloud, remote, local, counters, localDepth = 20, today = () => day)

  // non-terminal position from the reference tests
  val fen = "r1bqkb1r/pp1ppppp/2n2n2/2p5/8/1P3NP1/PBPPPP1P/RN1QKB1R b KQkq - 0 1"

  test("cloud cp eval: -30 centipawns → -0.3 (white-centric, no fen negation)") {
    assert(chain(cloud = Some(new FakeCloud(Map("cp" -> -30)))).rate(fen) == -0.3)
  }

  test("cloud mate-in-x → ±9999") {
    val mateFen = "r1bqkbnr/ppp2ppp/2np4/4p3/2B1P3/5Q2/PPPP1PPP/RNB1K1NR w KQkq - 2 4"
    assert(chain(cloud = Some(new FakeCloud(Map("mate" -> 1)))).rate(mateFen) == 9999.0)
    assert(chain(cloud = Some(new FakeCloud(Map("mate" -> -2)))).rate(fen) == -9999.0)
  }

  test("cloud call increments the day counter once, with tomorrow's expiry") {
    val c = new RecordingCounters
    chain(cloud = Some(new FakeCloud(Map("cp" -> -30))), counters = c).rate(fen)
    assert(c.store("lichess-cloud-evals-api-2024-04-28") == 1L)
    // day key expires at the next GMT midnight, month key at the next 1st
    assert(c.inits.toMap.apply("lichess-cloud-evals-api-2024-04-28") == 1714348800L)
    assert(c.inits.toMap.apply("remote-evals-2024-04") == 1714521600L)
  }

  test("day budget exhausted skips the cloud and uses the local engine") {
    val c = new RecordingCounters
    c.store("lichess-cloud-evals-api-2024-04-28") =
      ChainedEvalProvider.MaxCloudApiCallsPerDay + 1
    val cloudApi = new FakeCloud(Map("cp" -> -30))
    val localEngine = new FakeLocal("garbage with no rating")
    intercept[UciEval.UciParseError] {
      chain(cloud = Some(cloudApi), local = localEngine, counters = c).rate(fen)
    }
    assert(cloudApi.calls == 0)
    assert(localEngine.calls == 1)
  }

  test("cloud pv with neither cp nor mate propagates (data error, not fallback)") {
    intercept[NoSuchElementException] {
      chain(cloud = Some(new FakeCloud(Map("foobar" -> 1)))).rate(fen)
    }
  }

  test("cloud API error falls through to the local engine") {
    val localEngine = new FakeLocal("info depth 20 score cp 52 nodes 1000")
    // fen is black to move: engine score negates → -0.52
    assert(chain(cloud = Some(new FakeCloud(Map("cp" -> 1), fail = Some(429))),
      local = localEngine).rate(fen) == -0.52)
    assert(localEngine.calls == 1)
  }

  test("remote engine: UCI string parsed, month counter incremented") {
    val c = new RecordingCounters
    val remoteApi = new RemoteEvalApi {
      def eval(f: String): String = "info depth 20 seldepth 30 score cp -89 pv e2e4"
    }
    // black to move → negate → +0.89
    assert(chain(remote = Some(remoteApi), counters = c).rate(fen) == 0.89)
    assert(c.store("remote-evals-2024-04") == 1L)
  }

  test("remote unavailable falls through to local; month budget respected") {
    val localEngine = new FakeLocal("score cp 10 ")
    val unavailable = new RemoteEvalApi {
      var calls = 0
      def eval(f: String): String = { calls += 1; throw RemoteEvalUnavailable("no env") }
    }
    assert(chain(remote = Some(unavailable), local = localEngine).rate(fen) == -0.1)
    assert(localEngine.calls == 1)

    val c = new RecordingCounters
    c.store("remote-evals-2024-04") = ChainedEvalProvider.MaxCloudFunctionCallsPerMonth
    val remoteApi = new FakeRemoteCounting
    chain(remote = Some(remoteApi), local = new FakeLocal("score cp 10 "), counters = c).rate(fen)
    assert(remoteApi.calls == 0)
  }

  final class FakeRemoteCounting extends RemoteEvalApi {
    var calls = 0
    def eval(f: String): String = { calls += 1; "score cp 1 " }
  }

  test("UCI parse: mate sign conventions (`transforms.py:186-212`)") {
    val whiteFen = "8/5q1k/7p/4Q2r/P3P3/4R1P1/7p/3R1r1K w - - 3 0"
    // mate -3 as white to move → -9999
    assert(UciEval.parse("info score mate -3 pv h5f7", whiteFen) == -9999.0)
    // mate 2 as white to move → +9999
    assert(UciEval.parse("info score mate 2", whiteFen) == 9999.0)
    // mate 1 for the side to move, black → negated
    assert(UciEval.parse("info score mate 1", fen) == -9999.0)
    // bare `mate 0` falls back to the fen's side-to-move field — and then
    // the ' b ' negation still applies, so a black-to-move fen DOUBLE
    // negates back to +9999 (faithful to `transforms.py:199-209`, whose
    // own TODO doubts mate 0 ever occurs)
    assert(UciEval.parse("score mate 0", whiteFen) == 9999.0)
    assert(UciEval.parse("score mate 0", fen) == 9999.0)
  }

  test("UCI parse: cp at end of string, and garbage raises") {
    assert(UciEval.parse("info depth 20 score cp -52", "8/8 w - - 0 1") == -0.52)
    intercept[UciEval.UciParseError] { UciEval.parse("no rating here", fen) }
  }

  test("terminal positions short-circuit the whole chain") {
    val cloudApi = new FakeCloud(Map("cp" -> 1))
    // stalemate from the reference tests
    val stalemate = "3Q4/8/8/8/8/3QK2P/8/4k3 b - - 0"
    assert(chain(cloud = Some(cloudApi)).rate(stalemate) == 0.0)
    assert(cloudApi.calls == 0)
  }

  test("counters expire: a stale day key reads as fresh 0") {
    var clock = 1000L
    val c = new InMemoryCounterStore(now = () => clock)
    assert(c.getOrInit("k", 2000L) == 0L)
    c.incr("k")
    assert(c.getOrInit("k", 2000L) == 1L)
    clock = 3000L // past expiry → re-initialized
    assert(c.getOrInit("k", 4000L) == 0L)
  }
}
