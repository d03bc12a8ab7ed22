package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007), the
  * register-max mergeable form.
  *
  * State is m = 2^p one-byte registers; item x contributes
  * rho(low bits of xxhash64(x)) to register (top p bits of the hash).
  * Register j is therefore `max over the SET of distinct inputs` of a
  * pure function of each input — max is associative, commutative and
  * idempotent, so the register array (and hence the estimate) is a
  * deterministic function of the input SET: independent of partitioning,
  * arrival order, AND duplication. That is strictly stronger than the
  * usual "mergeable sketch" contract (compare [[MgBuffer]], whose slot
  * residue is order-dependent) and it is what lets q93 pin the merged
  * daily sketches bit-equal to the one-shot sketch.
  *
  * Estimator: the classic bias-corrected harmonic mean
  * (alpha_m · m² / Σ 2^(−M_j)) with the small-range linear-counting
  * correction (E ≤ 2.5m and empty registers exist → m·ln(m/V)). The
  * 64-bit hash makes the large-range collision correction unnecessary.
  * Standard error ≈ 1.04/√m — ~1.6% at the default p=12 (4 KB state).
  *
  * Why this exists next to Spark's `approx_count_distinct` (which is
  * itself HLL++): the sketch VALUE here is a first-class `binary` column
  * — buildable per (group, day), persistable to parquet, re-mergeable
  * across files/days/streams with [[HllMergeAgg]], estimable any time
  * with [[HllEstimate]]. At 100 TB the whole point of a distinct-count
  * sketch is that you never rescan the corpus: nightly partitions each
  * fold to a 4 KB row, and every later rollup (weekly, per-source,
  * all-time) is arithmetic over sketches, not a scan. Spark's built-in
  * exposes only the final number and discards the sketch.
  */
final class HllBuffer(val p: Int) {
  val m: Int = 1 << p
  val registers = new Array[Byte](m)

  def addHash(h: Long): Unit = {
    val j = (h >>> (64 - p)).toInt
    val w = h << p
    val rho = math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, 64 - p + 1)
    if (rho > registers(j)) registers(j) = rho.toByte
  }

  def mergeIn(other: HllBuffer): Unit = {
    require(p == other.p, s"hll_merge: mixed precisions $p vs ${other.p}")
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
  }

  def serialize(): Array[Byte] = {
    val out = new Array[Byte](1 + m)
    out(0) = p.toByte
    System.arraycopy(registers, 0, out, 1, m)
    out
  }
}

object HllBuffer {
  def deserialize(bytes: Array[Byte]): HllBuffer = {
    val b = new HllBuffer(bytes(0).toInt)
    require(bytes.length == 1 + b.m, s"corrupt HLL sketch: ${bytes.length} bytes for p=${b.p}")
    System.arraycopy(bytes, 1, b.registers, 0, b.m)
    b
  }

  def estimate(bytes: Array[Byte]): Long = {
    val b = deserialize(bytes)
    val m = b.m
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = b.registers(i).toInt
      sum += java.lang.Double.longBitsToDouble((1023L - r) << 52) // 2^-r exactly
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
    math.rint(corrected).toLong
  }

  /** xxhash64(seed 42) of the item, matching the Bloom family's choice of
    * hash for the same input types ([[BloomOps]]).
    */
  def hashAny(v: Any): Long = v match {
    case l: java.lang.Long     => XXH64.hashLong(l, 42L)
    case i: java.lang.Integer  => XXH64.hashLong(i.longValue(), 42L)
    case s: UTF8String         => XXH64.hashUTF8String(s, 42L)
    case other => throw new IllegalArgumentException(s"hll: unsupported input $other")
  }
}

/** `hll_sketch(item, p)` → binary: the m=2^p-register HLL sketch of the
  * group's distinct items. Accepts bigint/int/string items.
  */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] with UnaryLike[Expression] {

  require(p >= 4 && p <= 18, s"hll_sketch needs 4 <= p <= 18, got $p")

  override def prettyName: String = "hll_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch requires bigint/int/string items, got $dt")
  }

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.addHash(HllBuffer.hashAny(v))
    buffer
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: HllBuffer): Any = buffer.serialize()

  override def serialize(buffer: HllBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HllBuffer =
    HllBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** `hll_merge(sketch)` → binary: register-wise max of a group of sketches
  * (all with the same p). The rollup half of the build-once/merge-forever
  * pattern: per-day sketch rows fold to per-source (or all-time) sketches
  * without touching the corpus.
  */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "hll_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"hll_merge requires binary sketches, got $dt")
  }

  // p is carried by the sketches themselves; the buffer materializes on
  // the first one seen (null until then, serialized as the empty array).
  override def createAggregationBuffer(): HllBuffer = null

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = HllBuffer.deserialize(v.asInstanceOf[Array[Byte]])
      if (buffer == null) in
      else {
        require(buffer.p == in.p, s"hll_merge: mixed precisions ${buffer.p} vs ${in.p}")
        buffer.mergeIn(in); buffer
      }
    }
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer =
    if (other == null) buffer
    else if (buffer == null) other
    else { buffer.mergeIn(other); buffer }

  override def eval(buffer: HllBuffer): Any =
    if (buffer == null) Array.emptyByteArray else buffer.serialize()

  override def serialize(buffer: HllBuffer): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HllBuffer =
    if (bytes.isEmpty) null else HllBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** `hll_est(sketch)` → bigint: the bias-corrected cardinality estimate.
  * A plain scalar over the binary column — estimable on live aggregates,
  * parquet-persisted sketch tables, and streaming state alike.
  */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def prettyName: String = "hll_est"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"hll_est requires a binary sketch, got $dt")
  }
  override protected def nullSafeEval(input: Any): Any =
    HllBuffer.estimate(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllBuffer.estimate($c)")
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

object Hll {
  val defaultP = 12 // 4 KB state, ~1.6% standard error

  def hllSketch(item: Column, p: Int = defaultP): Column =
    ColumnBridge.column(HllSketchAgg(
      ColumnBridge.expression(item), p).toAggregateExpression())

  def hllMerge(sketch: Column): Column =
    ColumnBridge.column(HllMergeAgg(
      ColumnBridge.expression(sketch)).toAggregateExpression())

  def hllEst(sketch: Column): Column =
    ColumnBridge.column(HllEstimate(ColumnBridge.expression(sketch)))
}
