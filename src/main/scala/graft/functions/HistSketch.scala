package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fixed-grid histogram sketch: exact counts over `buckets` equal-width
  * cells of a declared [lo, hi) value range (out-of-range values clamp
  * to the edge cells), persisted as a binary column.
  *
  * The quantile member of the sketch-warehouse family (HLL = distinct,
  * Misra–Gries = heavy hitters): per-partition histograms are built
  * nightly, persisted as one row each, and every later quantile rollup
  * is arithmetic over sketches. Like [[HllBuffer]] the merge is exact
  * vector addition — associative, commutative, and a function of the
  * input MULTISET — so any build/merge path lands on bit-identical
  * bytes (q100 pins merged-vs-direct equality), and unlike KLL/t-digest
  * there is no compaction randomness or merge-order dependence to
  * wallpaper over.
  *
  * The trade, stated honestly: the guarantee is in VALUE space, not
  * rank space — a quantile estimate lands within one bucket width of
  * an exact order statistic at the probed rank (counts are exact, so
  * the rank's true value lies inside the same bucket the estimator
  * reads), but `quantile_cont`'s interpolation between two order stats
  * can straddle a sparse region; q100's contract therefore allows a
  * few widths. Grids need a declared range, which metrics-like columns
  * have; for genuinely unbounded domains use a rank-space sketch
  * (Spark's own approx_percentile, oracled in q41/q75/q79).
  */
final class HistBuffer(val lo: Double, val hi: Double, val buckets: Int) {
  val counts = new Array[Long](buckets)
  val width: Double = (hi - lo) / buckets

  def add(v: Double): Unit = {
    val raw = ((v - lo) / width).toInt
    val idx = if (raw < 0) 0 else if (raw >= buckets) buckets - 1 else raw
    counts(idx) += 1
  }

  def mergeIn(other: HistBuffer): Unit = {
    require(lo == other.lo && hi == other.hi && buckets == other.buckets,
      s"hist_merge: mixed geometries [$lo,$hi)x$buckets vs " +
        s"[${other.lo},${other.hi})x${other.buckets}")
    var i = 0
    while (i < buckets) { counts(i) += other.counts(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 + 4 + buckets * 8)
    bb.putDouble(lo); bb.putDouble(hi); bb.putInt(buckets)
    counts.foreach(bb.putLong)
    bb.array()
  }
}

object HistBuffer {
  def deserialize(bytes: Array[Byte]): HistBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new HistBuffer(bb.getDouble, bb.getDouble, bb.getInt)
    var i = 0
    while (i < b.buckets) { b.counts(i) = bb.getLong; i += 1 }
    b
  }

  /** Value estimate at the continuous rank q·(N−1), interpolated like
    * `quantile_cont`: estimate the order statistics at floor(rank) and
    * ceil(rank) (each lies in the bucket whose exact cumulative count
    * covers it — positioned uniformly within), then blend by the rank
    * fraction. Each statistic's estimate shares a bucket with its true
    * value, so the blended error is bounded by one bucket width.
    */
  def quantile(bytes: Array[Byte], q: Double): Double = {
    val b = deserialize(bytes)
    var n = 0L
    var i = 0
    while (i < b.buckets) { n += b.counts(i); i += 1 }
    if (n == 0L) return Double.NaN
    def valueAt(rank: Long): Double = {
      var cum = 0L
      var j = 0
      while (j < b.buckets) {
        val c = b.counts(j)
        if (rank < cum + c) return b.lo + b.width * (j + (rank - cum + 0.5) / c)
        cum += c
        j += 1
      }
      b.hi // unreachable when counts sum to n
    }
    val r = q * (n - 1)
    val i0 = r.toLong
    val frac = r - i0
    if (frac == 0.0) valueAt(i0)
    else (1.0 - frac) * valueAt(i0) + frac * valueAt(i0 + 1)
  }
}

/** `hist_sketch(value, lo, hi, buckets)` → binary fixed-grid histogram. */
case class HistSketchAgg(
    child: Expression,
    lo: Double,
    hi: Double,
    buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistBuffer] with UnaryLike[Expression] {

  require(hi > lo, s"hist_sketch needs hi > lo, got [$lo, $hi)")
  require(buckets > 0 && buckets <= (1 << 20), s"hist_sketch buckets out of range: $buckets")

  override def prettyName: String = "hist_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"hist_sketch requires a numeric value, got $dt")
  }

  override def createAggregationBuffer(): HistBuffer = new HistBuffer(lo, hi, buckets)

  override def update(buffer: HistBuffer, input: InternalRow): HistBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v match {
      case d: java.lang.Double  => d.doubleValue()
      case f: java.lang.Float   => f.doubleValue()
      case l: java.lang.Long    => l.doubleValue()
      case i: java.lang.Integer => i.doubleValue()
    })
    buffer
  }

  override def merge(buffer: HistBuffer, other: HistBuffer): HistBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: HistBuffer): Any = buffer.serialize()
  override def serialize(buffer: HistBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HistBuffer =
    HistBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistSketchAgg =
    copy(child = newChild)
}

/** `hist_merge(sketch)` → binary: bucket-wise sum (equal geometry). */
case class HistMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "hist_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"hist_merge requires binary sketches, got $dt")
  }

  override def createAggregationBuffer(): HistBuffer = null

  override def update(buffer: HistBuffer, input: InternalRow): HistBuffer = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = HistBuffer.deserialize(v.asInstanceOf[Array[Byte]])
      if (buffer == null) in
      else {
        require(buffer.lo == in.lo && buffer.hi == in.hi && buffer.buckets == in.buckets,
          s"hist_merge: mixed geometries [${buffer.lo},${buffer.hi})x${buffer.buckets}" +
            s" vs [${in.lo},${in.hi})x${in.buckets}")
        buffer.mergeIn(in); buffer
      }
    }
  }

  override def merge(buffer: HistBuffer, other: HistBuffer): HistBuffer =
    if (other == null) buffer
    else if (buffer == null) other
    else { buffer.mergeIn(other); buffer }

  override def eval(buffer: HistBuffer): Any =
    if (buffer == null) Array.emptyByteArray else buffer.serialize()
  override def serialize(buffer: HistBuffer): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HistBuffer =
    if (bytes.isEmpty) null else HistBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HistMergeAgg =
    copy(child = newChild)
}

/** `hist_quantile(sketch, q)` → double estimate at the continuous rank. */
case class HistQuantile(child: Expression, q: Double) extends UnaryExpression {
  require(q >= 0.0 && q <= 1.0, s"hist_quantile needs q in [0,1], got $q")
  override def prettyName: String = "hist_quantile"
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"hist_quantile requires a binary sketch, got $dt")
  }
  override protected def nullSafeEval(input: Any): Any =
    HistBuffer.quantile(input.asInstanceOf[Array[Byte]], q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HistBuffer.quantile($c, $q)")
  override protected def withNewChildInternal(newChild: Expression): HistQuantile =
    copy(child = newChild)
}

object HistSketch {
  def histSketch(value: Column, lo: Double, hi: Double, buckets: Int): Column =
    ColumnBridge.column(HistSketchAgg(
      ColumnBridge.expression(value), lo, hi, buckets).toAggregateExpression())

  def histMerge(sketch: Column): Column =
    ColumnBridge.column(HistMergeAgg(
      ColumnBridge.expression(sketch)).toAggregateExpression())

  def histQuantile(sketch: Column, q: Double): Column =
    ColumnBridge.column(HistQuantile(ColumnBridge.expression(sketch), q))
}
