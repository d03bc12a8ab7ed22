package graft.etl

import java.time.LocalDate

/** X1: the reference's tiered eval acquisition
  * (`/root/reference/src/pipeline_import/transforms.py:30-212`) — terminal
  * shortcut, then Lichess cloud evals under a 3000/day budget, then the
  * remote engine under a 900k/month budget, then the local engine as the
  * eval of last resort — with valkey-style expiring counters behind an
  * injectable [[CounterStore]].
  *
  * All network/engine surfaces are injectable traits (this container has
  * zero egress; the reference's tests mock the same seams,
  * `tests/test_transforms.py:230-504`).
  */
trait CounterStore extends Serializable {

  /** Valkey `SET key 0 EXAT exp NX GET`: initialize to 0 with an expiry if
    * absent, return the value that was current BEFORE the call (0 when
    * freshly initialized — `transforms.py:137-150`).
    */
  def getOrInit(key: String, expireAtUnix: Long): Long

  /** INCR. */
  def incr(key: String): Unit
}

/** Expiring in-memory counter store (per JVM). Production would back this
  * with any shared KV store; the contract is only getOrInit/incr.
  */
final class InMemoryCounterStore(now: () => Long = () => System.currentTimeMillis() / 1000)
    extends CounterStore {
  private val m = scala.collection.mutable.Map.empty[String, (Long, Long)] // key -> (value, exat)

  def getOrInit(key: String, expireAtUnix: Long): Long = synchronized {
    m.get(key) match {
      case Some((v, exat)) if exat > now() => v
      case _ => m(key) = (0L, expireAtUnix); 0L
    }
  }

  def incr(key: String): Unit = synchronized {
    m.updateWith(key) {
      case Some((v, exat)) => Some((v + 1, exat))
      case None => Some((1L, Long.MaxValue))
    }
  }
}

/** First principal variation of a Lichess cloud eval: 'cp' or 'mate' →
  * value. Implementations throw [[graft.sources.LichessHttpError]] on API
  * failure (rate limits included) — the chain falls through to the next
  * tier on those, exactly like the reference's ApiError handler
  * (`transforms.py:152-162`).
  */
trait CloudEvalApi extends Serializable {
  def cloudEval(fen: String, multiPv: Int = 1): Map[String, Int]
}

/** Remote engine: FEN → UCI info string. Throw [[RemoteEvalUnavailable]]
  * when not configured / HTTP error (`transforms.py:66-91`).
  */
trait RemoteEvalApi extends Serializable {
  def eval(fen: String): String
}

final case class RemoteEvalUnavailable(reason: String)
    extends RuntimeException(reason)

/** Local engine of last resort: FEN + depth → UCI info string
  * (`transforms.py:94-100`).
  */
trait LocalEngine extends Serializable {
  def eval(fen: String, depth: Int): String
}

/** P21: `score (cp|mate) N` parse with the reference's sign conventions
  * (`transforms.py:186-212`): mate → ±999900 centipawns (sign of N; a
  * bare `mate 0` falls back to the side-to-move field), engine scores are
  * side-to-move so ' b ' FENs negate, and everything lands in pawns (÷100).
  */
object UciEval {

  final case class UciParseError(info: String)
      extends RuntimeException(s"Could not find chess engine rating in info string: $info")

  private val Score = """score (cp|mate) (.+?)(?: |$)""".r

  def parse(uciResult: String, fen: String): Double = {
    val m = Score.findFirstMatchIn(uciResult).getOrElse(throw UciParseError(uciResult))
    var rating: Double =
      if (m.group(1) == "mate") {
        val original = m.group(2).toInt
        if (original != 0) 999900.0 * original / math.abs(original)
        else if (fen.contains(" w ")) 999900.0
        else -999900.0
      } else m.group(2).toInt.toDouble
    if (fen.contains(" b ")) rating = -rating
    rating / 100.0
  }
}

/** get_sf_evaluation parity (`transforms.py:118-183`): terminal → cloud
  * (day budget) → remote (month budget) → local. Returns Some(pawns);
  * malformed engine output or a cloud pv with neither cp nor mate
  * propagates as an exception, as it does in the reference.
  */
final class ChainedEvalProvider(
    cloud: Option[CloudEvalApi],
    remote: Option[RemoteEvalApi],
    local: LocalEngine,
    counters: CounterStore,
    localDepth: Int = 20,
    today: () => LocalDate = () => LocalDate.now(java.time.ZoneOffset.UTC))
    extends EvalProvider {

  import ChainedEvalProvider._

  def evaluate(cleanFen: String): Option[Double] = Some(rate(cleanFen))

  /** The raw chain; public for spec parity with the reference tests. */
  def rate(fen: String): Double =
    TerminalEval.evaluate(fen).getOrElse(engineRate(fen))

  private def engineRate(fen: String): Double = {
    val t = today()
    val zone = java.time.ZoneOffset.UTC
    val tomorrowUnix = t.plusDays(1).atStartOfDay(zone).toEpochSecond
    val nextMonthUnix = t.withDayOfMonth(1).plusMonths(1).atStartOfDay(zone).toEpochSecond
    val apiKey = s"lichess-cloud-evals-api-$t" // strftime('%F') == ISO date
    val remoteKey = f"remote-evals-${t.getYear}%04d-${t.getMonthValue}%02d"

    val lichessCalls = counters.getOrInit(apiKey, tomorrowUnix)
    val remoteCalls = counters.getOrInit(remoteKey, nextMonthUnix)

    // tier 1: Lichess cloud evals, 3000/day (`transforms.py:152-162`).
    // API errors (incl. rate limits) fall through; a pv carrying neither
    // cp nor mate is a data error and propagates, as in the reference.
    val fromCloud: Option[Double] =
      if (lichessCalls >= MaxCloudApiCallsPerDay) None
      else cloud.flatMap { api =>
        try {
          val pv = api.cloudEval(fen)
          counters.incr(apiKey)
          Some(pv.get("cp").map(_ / 100.0)
            .orElse(pv.get("mate").map(m => if (m < 0) -9999.0 else 9999.0))
            .getOrElse(throw new NoSuchElementException(s"$fen, $pv")))
        } catch {
          case _: graft.sources.LichessHttpError => None
        }
      }

    // tier 2: remote engine, 900k/month (`transforms.py:164-176`); a
    // missing/unreachable remote falls through, its parse errors propagate
    def fromRemote: Option[Double] =
      if (remoteCalls >= MaxCloudFunctionCallsPerMonth) None
      else remote.flatMap { api =>
        try {
          val uci = api.eval(fen)
          counters.incr(remoteKey)
          Some(UciEval.parse(uci, fen))
        } catch {
          case _: RemoteEvalUnavailable => None
        }
      }

    // tier 3: local engine of last resort (`transforms.py:178-183`) —
    // malformed output propagates as UciParseError
    fromCloud.orElse(fromRemote)
      .getOrElse(UciEval.parse(local.eval(fen, localDepth), fen))
  }
}

object ChainedEvalProvider {
  val MaxCloudApiCallsPerDay = 3000L
  val MaxCloudFunctionCallsPerMonth = 900000L
}
