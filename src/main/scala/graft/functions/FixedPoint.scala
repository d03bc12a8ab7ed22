package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Fixed-point quantization for exact money/quantity aggregation: the
  * double is quantized to `scale` decimal places exactly the way Spark's
  * `Cast(double → DECIMAL(p, scale))` does it — through the SHORTEST
  * decimal representation (`BigDecimal.valueOf`), HALF_UP — and surfaced
  * as the unscaled long.
  *
  * Summing these longs is exact and associative, so
  * `sum(dec_scaled(x, 2)) / 100.0` equals
  * `sum(x.cast(DECIMAL(18,2))).cast("double")` bit for bit (the final
  * division correctly rounds the same rational the decimal→double cast
  * rounds), while the aggregation buffer is a primitive long instead of a
  * Decimal — measured 7× on the sf1 q1 aggregate, where the decimal
  * buffer dominated the marginal cost vs DuckDB's vectorized int128.
  *
  * Per-row envelope: exactly the one `cast(double → DECIMAL(18, scale))`
  * imposed — a non-finite input or a quantized value wider than 18 digits
  * yields NULL (skipped by `sum`), never an exception. |Σ unscaled| must
  * still stay under 2⁶³ (~9.2e18), and the final long→double conversion is
  * exact below 2⁵³; callers that sum these longs guard that group-level
  * envelope (see `Relational.dsum`'s overflow canary).
  */
case class DecScaledLong(child: Expression, scale: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  // NULL is produced for non-finite / >18-digit inputs even when the child
  // is non-nullable (same nullability the replaced decimal cast had)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "dec_scaled_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType if scale >= 0 && scale <= 9 => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input and 0<=scale<=9, got $dt / scale=$scale")
  }

  override protected def nullSafeEval(input: Any): Any =
    FixedPointOps.scaledLongOrNull(input.asInstanceOf[Double], scale)

  // helper statics live outside the companion (the Janino static-forwarder
  // trap documented on DotProduct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("scaled")
      s"""
         |java.lang.Long $boxed = graft.functions.FixedPointOps.scaledLongOrNull($c, $scale);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DecScaledLong =
    copy(child = newChild)
}

object DecScaledLong {
  def decScaledLong(c: Column, scale: Int): Column =
    ColumnBridge.column(DecScaledLong(ColumnBridge.expression(c), scale))
}

/** Static eval helpers called from generated code. */
object FixedPointOps {

  private val pow10 = Array.tabulate(10)(i => math.pow(10.0, i))

  /** Quantize with `cast(double → DECIMAL(18, scale))` null semantics: NaN,
    * ±Infinity, and quantized values wider than 18 digits return null (the
    * boxed Long is immediately unboxed in generated code — scalar-replaced
    * on the hot path). precision ≤ 18 ⇒ |unscaled| < 10¹⁸ < 2⁶³, so the
    * narrowing is exact.
    *
    * Fast path: the reference semantics round the SHORTEST-DECIMAL
    * representation of x (`BigDecimal.valueOf` = `Double.toString`) half-up
    * at `scale` — and `Double.toString` plus two BigDecimal allocations per
    * row was the dominant per-row cost of every dsum/cents pipeline. But
    * the shortest decimal D(x) differs from x by < 1 ulp, so y = x·10^s
    * (one correctly-rounded multiply, relative error ≤ 2⁻⁵²) differs from
    * D(x)·10^s by ≤ |y|·2⁻⁵¹ + 1 ulp-ish. Whenever y is farther than a
    * conservative error bound from the half-integer rounding boundary, the
    * half-up integer is decided identically for both — take it without
    * materializing a single object. Only boundary-adjacent values (≈ one
    * in 10¹²) and |y| ≥ 2⁵¹ (where long-integer spacing of doubles exceeds
    * the margin) fall back to the exact BigDecimal path. The differential
    * spec (`FixedPointSpec`) drives both paths across generated cents
    * values and adversarial boundary cases.
    */
  def scaledLongOrNull(x: Double, scale: Int): java.lang.Long = {
    if (!java.lang.Double.isFinite(x)) return null
    val y = x * pow10(scale)
    val ay = math.abs(y)
    if (ay < 4.5e15) { // < 2^52: floor/ceil exact, margin meaningful
      val f = math.floor(y)
      val frac = y - f
      // distance from the .5 boundary must exceed the accumulated
      // representation + multiply error (≤ ~4 ulp of y, plus an absolute
      // floor for tiny y)
      val margin = ay * 1e-15 + 1e-12
      if (frac > 0.5 + margin || frac < 0.5 - margin) {
        val n = if (frac > 0.5) f + 1.0 else f
        if (n >= 1.0e18 || n <= -1.0e18) return null // precision > 18
        return n.toLong
      }
    }
    val bd = java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    if (bd.precision() > 18) null else bd.unscaledValue().longValue()
  }

  /** The exact reference path, kept callable for the differential spec. */
  def scaledLongExact(x: Double, scale: Int): java.lang.Long = {
    if (!java.lang.Double.isFinite(x)) return null
    val bd = java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    if (bd.precision() > 18) null else bd.unscaledValue().longValue()
  }
}
