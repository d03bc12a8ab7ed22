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
  /** Quantize with `cast(double → DECIMAL(18, scale))` null semantics: NaN,
    * ±Infinity, and quantized values wider than 18 digits return null (the
    * boxed Long is immediately unboxed in generated code — scalar-replaced
    * on the hot path). precision ≤ 18 ⇒ |unscaled| < 10¹⁸ < 2⁶³, so the
    * narrowing is exact.
    */
  def scaledLongOrNull(x: Double, scale: Int): java.lang.Long = {
    if (!java.lang.Double.isFinite(x)) return null
    val bd = java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    if (bd.precision() > 18) null else bd.unscaledValue().longValue()
  }
}
