package graft.etl

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.DotOps
import org.apache.spark.sql.catalyst.util.ArrayData

/** Property coverage for the round-2 scalar surfaces: the UCI parse sign
  * algebra, day-bound arithmetic, and the native dot product against a
  * driver-side BigDecimal reference.
  */
object EvalChainProps extends Properties("evalchain") {

  val whiteFen = "8/8/8/8/8/8/8/K6k w - - 0 1"
  val blackFen = "8/8/8/8/8/8/8/K6k b - - 0 1"

  property("uci cp parse: value/100, negated for black to move") =
    Prop.forAll(Gen.chooseNum(-20000, 20000)) { cp =>
      UciEval.parse(s"info depth 20 score cp $cp nodes 5", whiteFen) == cp / 100.0 &&
      UciEval.parse(s"info depth 20 score cp $cp nodes 5", blackFen) == -cp / 100.0
    }

  property("uci mate parse: sign of N wins, then black negation") =
    Prop.forAll(Gen.chooseNum(-50, 50).suchThat(_ != 0)) { n =>
      val w = UciEval.parse(s"score mate $n", whiteFen)
      val b = UciEval.parse(s"score mate $n", blackFen)
      w == (if (n > 0) 9999.0 else -9999.0) && b == -w
    }

  property("cp at string end still parses (regex `(?: |$)` tail)") =
    Prop.forAll(Gen.chooseNum(-999, 999)) { cp =>
      UciEval.parse(s"info score cp $cp", whiteFen) == cp / 100.0
    }

  property("lichess day bounds: exactly one GMT day apart, on day boundaries") =
    Prop.forAll(Gen.chooseNum(0L, 20000L)) { epochDay =>
      val d = LocalDate.ofEpochDay(epochDay)
      val client = new graft.sources.LichessClient(
        (_: String, _: Seq[(String, String)], _: Map[String, String]) => "",
        token = "t")
      val (since, until) = client.dayBoundsUnixMs(d)
      until - since == 86400000L && since % 86400000L == 0 &&
        since / 86400000L == epochDay
    }

  private val floatArrays: Gen[Array[Float]] =
    Gen.chooseNum(1, 96).flatMap(n =>
      Gen.containerOfN[Array, Float](n, Gen.chooseNum(-8.0f, 8.0f)))

  property("native exact dot == driver BigDecimal reference (any lengths, min taken)") =
    Prop.forAll(floatArrays, floatArrays) { (a, b) =>
      val n = math.min(a.length, b.length)
      val ref = (0 until n).map { i =>
        new java.math.BigDecimal(java.lang.Double.toString(a(i).toDouble * b(i).toDouble))
          .setScale(14, java.math.RoundingMode.HALF_UP)
      }.foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue()
      DotOps.exact(ArrayData.toArrayData(a), ArrayData.toArrayData(b)) == ref
    }

  property("native fast dot == plain double fold") =
    Prop.forAll(floatArrays, floatArrays) { (a, b) =>
      val n = math.min(a.length, b.length)
      var s = 0.0
      (0 until n).foreach(i => s += a(i).toDouble * b(i).toDouble)
      DotOps.fast(ArrayData.toArrayData(a), ArrayData.toArrayData(b)) == s
    }
}
