package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product of two float arrays — the hot scalar of the
  * similarity family (one call per candidate pair, 64 multiplies each).
  *
  * Two modes behind one expression:
  *
  *  - `exact = false` (fast): a plain left-to-right double fold, identical
  *    to `aggregate(zip_with(a, b, (x,y) => x*y), 0d, _+_)` — used for
  *    pruning only, never surfaced in results.
  *  - `exact = true`: bit-identical to the portable decimal formulation the
  *    DuckDB oracle replays — each float product is exact in double
  *    (24+24-bit mantissas < 53), then quantized to DECIMAL(28,14) exactly
  *    the way Spark's `Cast(double→decimal)` does it
  *    (`BigDecimal(Double.toString(p)).setScale(14, HALF_UP)` — Spark casts
  *    through the SHORTEST decimal representation, not the exact binary
  *    expansion), summed exactly, and converted to double at the end. The
  *    sum is order-independent, so Spark and DuckDB agree to the last bit.
  *
  * The interpreted `zip_with`+`aggregate` chain this replaces evaluated a
  * lambda-variable binding per element; this is a tight loop inside
  * whole-stage codegen — the round-1 bench showed the chain 6–100× slower
  * than DuckDB on the ANN queries, all of it this constant factor.
  *
  * Exactness note: the old lambda fold was also subtly WEAKER than this —
  * Catalyst types `Add(DECIMAL(38,14), DECIMAL(28,14))` at precision 39,
  * so the precision-loss rule rounded every intermediate sum to scale 13
  * (order-dependent; agreed with DuckDB's exact `SUM(DECIMAL)` only after
  * `round(_, 6)`). This expression computes the true scale-14 decimal sum,
  * i.e. exactly DuckDB's aggregate semantics (`GraftFunctionsSpec` pins
  * both facts).
  *
  * Pass the same array twice for a squared norm (`dot(a, a)`).
  *
  * Element types: each side independently accepts `array<float>` or
  * `array<double>` — the k-means family (q58) scores float corpus vectors
  * against DOUBLE centroid arrays (decimal-exact per-dimension means), and
  * casting those centroids to float would round them away from the values
  * the oracle computes. A float element is widened exactly; a double
  * element is used as-is, and double×double is exactly rounded in IEEE, so
  * every product is engine-independent before the decimal quantization.
  */
case class DotProduct(left: Expression, right: Expression, exact: Boolean)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = if (exact) "ddot_native" else "fdot_native"

  private def isDouble(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (exact)
      DotOps.exact(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isDouble(left.dataType), isDouble(right.dataType))
    else
      DotOps.fast(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        isDouble(left.dataType), isDouble(right.dataType))

  // NOTE: the helpers live in the standalone DotOps object, NOT the
  // companion — the case-class accessor `exact()` suppresses the
  // companion's static forwarder of the same name, so Janino would only
  // see the zero-arg accessor and fail to compile the generated call.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (exact) "exact" else "fast"
    val (ad, bd) = (isDouble(left.dataType), isDouble(right.dataType))
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotOps.$fn($a, $b, $ad, $bd)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Column wrappers. */
  def ddot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b), exact = true))

  def fdot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b), exact = false))
}

/** Static eval helpers called from generated code — deliberately NOT the
  * [[DotProduct]] companion (see the doGenCode note).
  */
object DotOps {

  /** Plain double fold, left to right (same order as the `aggregate` it
    * replaces, so prefilter thresholds are unchanged). `aDbl`/`bDbl` select
    * the element getter per side (double elements read as-is, floats widen
    * exactly) — codegen passes compile-time constants, so the branches fold
    * away after JIT.
    */
  def fast(a: ArrayData, b: ArrayData, aDbl: Boolean, bDbl: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aDbl) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDbl) b.getDouble(i) else b.getFloat(i).toDouble
      s += x * y
      i += 1
    }
    s
  }

  /** Float-only overload kept for source compatibility with existing specs. */
  def fast(a: ArrayData, b: ArrayData): Double = fast(a, b, aDbl = false, bDbl = false)

  /** Sentinel for [[quant14]]: the product needs the BigDecimal path. */
  private final val NeedsBig = java.lang.Long.MIN_VALUE

  /** The BigDecimal reference quantization: shortest decimal
    * representation, scale 14, HALF_UP — exactly Spark's and DuckDB's
    * double→DECIMAL(28,14) cast. [[quant14]] must agree bit-for-bit
    * wherever it doesn't return [[NeedsBig]] (`GraftFunctionsSpec`
    * differential-tests this on millions of draws).
    */
  private def quant14Big(p: Double): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(p))
      .setScale(14, java.math.RoundingMode.HALF_UP)

  /** Scale-14 HALF_UP quantization of the SHORTEST-REPR decimal of `p`,
    * as a scaled long.
    *
    * Fast path (r16, the FixedPointOps.scaledLongOrNull guard applied at
    * scale 14): the reference semantics round the shortest decimal D(p)
    * half-up at 14 places, and |D(p) − p| ≤ ulp(p)/2, so y = p·10¹⁴ (one
    * correctly-rounded multiply; 10¹⁴ < 2⁵³ is an exact double) differs
    * from D(p)·10¹⁴ by ≤ ~2 ulp of y. Whenever y sits farther than a
    * conservative error bound from the .5 rounding boundary, floor(y)+
    * (frac>.5) is provably the same integer the string path derives —
    * decided with zero allocation. Only boundary-adjacent values (~1 in
    * 10¹²) and |y| ≥ 2⁵² (double integer spacing exceeds the margin)
    * fall through to [[quant14Slow]]. This was the dominant per-element
    * cost of every exact dot product: JDK 17's `Double.toString` runs
    * ~1 µs, turning a 64-dim ddot into ~100 µs — the whole similarity
    * family's profile was this call (OPTIMIZATION_r16.md).
    *
    * The differential spec (GraftFunctionsSpec) drives fast and slow
    * paths against [[quant14Big]] across random and boundary draws.
    */
  private def quant14(p: Double): Long = {
    val y = p * 1e14
    val ay = math.abs(y)
    if (ay < 4.5e15) { // < 2^52: floor exact, margin meaningful
      val f = math.floor(y)
      val frac = y - f
      // representation + multiply error ≤ ~4 ulp of y, plus an absolute
      // floor for tiny y (NaN/±Inf fracs are NaN → comparisons false →
      // fall through to the slow path, which handles them as before)
      val margin = ay * 1e-15 + 1e-12
      if (frac > 0.5 + margin || frac < 0.5 - margin)
        return (if (frac > 0.5) f + 1.0 else f).toLong
    }
    quant14Slow(p)
  }

  /** The string-parsing reference path of [[quant14]]: parses
    * `Double.toString`'s digits directly — value = digits ×
    * 10^(dotPos − len); scaled target is the integer of the digit string
    * shifted to dotPos+14, HALF_UP decided by the first dropped digit
    * (HALF_UP rounds away from zero iff the discarded fraction ≥ ½, i.e.
    * iff that digit ≥ 5). Returns [[NeedsBig]] when the magnitude could
    * overflow the long (|value| > ~9e4 after scaling) — the caller falls
    * back to the BigDecimal reference path.
    */
  private def quant14Slow(p: Double): Long = {
    if (p == 0.0) return 0L // covers -0.0: "−0.0" would parse sign-only digits
    if (!java.lang.Double.isFinite(p)) return NeedsBig // NaN/Inf: reference path throws, as before
    val s = java.lang.Double.toString(p)
    val len = s.length
    var i = 0
    var neg = false
    if (s.charAt(0) == '-') { neg = true; i = 1 }
    // digits before '.', then after, then optional exponent
    var mantissa = 0L
    var nd = 0 // significant digits consumed
    var dotPos = -1 // digit count before the dot
    var exp = 0
    var expNeg = false
    var inExp = false
    var seenDot = false
    while (i < len) {
      val c = s.charAt(i)
      if (c == '.') { seenDot = true; dotPos = nd }
      else if (c == 'E' || c == 'e') inExp = true
      else if (inExp) {
        if (c == '-') expNeg = true
        else if (c == '+') ()
        else exp = exp * 10 + (c - '0')
      } else {
        // Double.toString emits ≤ 17 significant digits → mantissa fits
        mantissa = mantissa * 10 + (c - '0')
        nd += 1
      }
      i += 1
    }
    if (expNeg) exp = -exp
    if (!seenDot) dotPos = nd
    // value = mantissa × 10^(dotPos + exp − nd); target = round(value×1e14)
    // = mantissa shifted by `shift` decimal places (positive: append
    // zeros; negative: drop digits with HALF_UP on the first one)
    val shift = dotPos + exp + 14 - nd
    val kept =
      if (shift >= 0) {
        // mantissa has ≤17 digits; nd + shift ≤ 18 keeps the product exact
        if (nd + shift > 18) return NeedsBig
        var m = mantissa
        var k = shift
        while (k > 0) { m *= 10L; k -= 1 }
        m
      } else if (shift > -19) {
        var pow = 1L
        var k = -shift
        while (k > 0) { pow *= 10L; k -= 1 }
        val q = mantissa / pow
        // HALF_UP rounds away from zero iff the discarded fraction ≥ ½,
        // decided by its first digit (mantissa ≤ 1e17, so ×10 stays exact)
        if ((mantissa % pow) * 10L / pow >= 5) q + 1 else q
      } else {
        // ≥19 digits dropped: |value×1e14| ≤ 9.99e16 × 10⁻¹⁹ < 0.5 → 0
        0L
      }
    if (neg) -kept else kept
  }

  /** Order-independent exact dot: per-element product quantized to 14
    * decimal places through the shortest decimal representation (matching
    * Spark's and DuckDB's double→DECIMAL(28,14) cast), summed exactly.
    * Fast path: scaled-long accumulation (exact for the embedding-sized
    * magnitudes every caller produces); any element or sum that could
    * overflow falls back to the BigDecimal reference for the WHOLE call.
    */
  def exact(a: ArrayData, b: ArrayData, aDbl: Boolean, bDbl: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aDbl) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDbl) b.getDouble(i) else b.getFloat(i).toDouble
      val q = quant14(x * y)
      if (q == NeedsBig) return exactBig(a, b, aDbl, bDbl)
      val next = acc + q
      // overflow guard (|each term| ≤ ~9.2e18/10 by NeedsBig bound is NOT
      // guaranteed across n terms): detect two's-complement wrap
      if (((acc ^ next) & (q ^ next)) < 0) return exactBig(a, b, aDbl, bDbl)
      acc = next
      i += 1
    }
    // N×10^-14 correctly rounded: N and 1e14 are exact doubles when
    // |N| < 2^53, and one IEEE division rounds once — identical to
    // BigDecimal.valueOf(N, 14).doubleValue()
    if (math.abs(acc) < (1L << 53)) acc.toDouble / 1e14
    else java.math.BigDecimal.valueOf(acc, 14).doubleValue()
  }

  private def exactBig(a: ArrayData, b: ArrayData, aDbl: Boolean, bDbl: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val x = if (aDbl) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDbl) b.getDouble(i) else b.getFloat(i).toDouble
      acc = acc.add(quant14Big(x * y))
      i += 1
    }
    acc.doubleValue()
  }

  /** Float-only overload kept for source compatibility with existing specs. */
  def exact(a: ArrayData, b: ArrayData): Double = exact(a, b, aDbl = false, bDbl = false)
}
