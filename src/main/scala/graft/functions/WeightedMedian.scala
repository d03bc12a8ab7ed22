package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-group weighted-median state: a small open-addressed hash map from
  * price (raw double bits) to accumulated weight (exact scaled-long), the
  * q84/TopK one-pass discipline applied to the grouped-quantile problem.
  * Per-group memory is bounded by the DISTINCT price count (lineitem:
  * ~tens per part), never raw rows; partial buffers combine map-side, so
  * the exchange carries one compact buffer per (group, task) instead of
  * feeding a corpus-wide window sort. The former q139 spelling —
  * repartition + (p, price) hash aggregate + cumulative/total windows +
  * second aggregate — paid a full per-partition sort and three extra
  * operators for the same answer.
  *
  * Weights are exact longs (scaled cents upstream), so the cumulative
  * threshold 2·cum ≥ total is integer-exact — bit-identical to the
  * oracle's DECIMAL cumulative-window formulation.
  *
  * Key canonicalization: update() normalizes -0.0 to +0.0 and every NaN
  * to the canonical quiet NaN BEFORE taking bits, so ±0.0 is one price
  * and NaN one key. NaN sorts after every finite price in result()'s
  * walk (Scala's total ordering), so it is returned as the median only
  * when NaN rows hold the upper half of the group's weight — callers
  * feeding possibly-NaN prices should filter or accept that convention.
  */
final class WMedBuffer(initialCapacity: Int = 4) {
  // open addressing, linear probing; keys are raw price bits, entries with
  // state(i) == false are empty (price 0.0 has bits 0L, so a sentinel key
  // cannot mark emptiness)
  private var cap = Integer.highestOneBit(math.max(4, initialCapacity) * 2 - 1)
  private var keys = new Array[Long](cap)
  private var wts = new Array[Long](cap)
  private var state = new Array[Boolean](cap)
  private var n = 0

  def size: Int = n

  private def mix(k: Long): Int = {
    var h = k * -7046029254386353131L // Murmur3 fmix64 constant
    h ^= h >>> 32
    (h & (cap - 1)).toInt
  }

  def add(priceBits: Long, w: Long): Unit = {
    var i = mix(priceBits)
    while (state(i) && keys(i) != priceBits) i = (i + 1) & (cap - 1)
    if (state(i)) wts(i) += w
    else {
      keys(i) = priceBits; wts(i) = w; state(i) = true; n += 1
      if (n * 4 >= cap * 3) grow()
    }
  }

  private def grow(): Unit = {
    val (ok, ow, os, oc) = (keys, wts, state, cap)
    cap = oc * 2
    keys = new Array[Long](cap); wts = new Array[Long](cap)
    state = new Array[Boolean](cap); n = 0
    var i = 0
    while (i < oc) { if (os(i)) add(ok(i), ow(i)); i += 1 }
  }

  def mergeIn(other: WMedBuffer): Unit = {
    var i = 0
    while (i < other.cap) {
      if (other.state(i)) add(other.keys(i), other.wts(i))
      i += 1
    }
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < cap) {
      if (state(i)) { bb.putLong(keys(i)); bb.putLong(wts(i)) }
      i += 1
    }
    bb.array()
  }

  /** (weighted_median, total_weight, n_distinct_prices): sort the bounded
    * distinct-price grid in-row, walk the cumulative until 2·cum clears
    * the total — the min price satisfying the oracle's window predicate.
    */
  def result(): (Double, Long, Int) = {
    val prices = new Array[Double](n)
    val idx = new Array[Int](n)
    var i = 0; var j = 0
    while (i < cap) {
      if (state(i)) { prices(j) = java.lang.Double.longBitsToDouble(keys(i)); idx(j) = i; j += 1 }
      i += 1
    }
    // sort an index permutation by price asc (boxless dual-pivot on the
    // price array would lose the weight pairing; n is tens, not millions)
    val order = idx.indices.toArray.sortBy(prices)
    var total = 0L
    i = 0
    while (i < n) { total += wts(idx(i)); i += 1 }
    var cum = 0L
    i = 0
    while (i < n) {
      cum += wts(idx(order(i)))
      if (cum * 2 >= total) return (prices(order(i)), total, n)
      i += 1
    }
    (prices(n - 1), total, n) // unreachable for positive weights
  }
}

object WMedBuffer {
  def deserialize(bytes: Array[Byte]): WMedBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new WMedBuffer(math.max(4, n))
    var i = 0
    while (i < n) { b.add(bb.getLong, bb.getLong); i += 1 }
    b
  }
}

/** `weighted_median(price double, weight long)` →
  * struct<w_median double, total long, n_prices int>; null weight or
  * price rows are ignored, an all-null group yields NULL.
  */
case class WeightedMedianAgg(
    priceExpr: Expression,
    weightExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[WMedBuffer] with BinaryLike[Expression] {

  override def left: Expression = priceExpr
  override def right: Expression = weightExpr
  override def prettyName: String = "weighted_median"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("w_median", DoubleType, nullable = false),
    StructField("total", LongType, nullable = false),
    StructField("n_prices", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (priceExpr.dataType == DoubleType && weightExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"weighted_median requires (double, long) inputs, got " +
        s"(${priceExpr.dataType}, ${weightExpr.dataType})")

  override def createAggregationBuffer(): WMedBuffer = new WMedBuffer()

  override def update(buffer: WMedBuffer, input: InternalRow): WMedBuffer = {
    val p = priceExpr.eval(input)
    val w = weightExpr.eval(input)
    if (p != null && w != null) {
      // Canonicalize the key at the ONLY raw-double entry point: `+ 0.0`
      // folds -0.0 into +0.0 (IEEE round-to-nearest), and doubleToLongBits
      // (not RawLongBits) collapses every NaN payload to the canonical
      // quiet NaN. Without this, 0.0 and -0.0 count as distinct prices and
      // distort n_prices and the median walk. merge()/deserialize() move
      // already-canonical bits only, so no second normalization site exists.
      buffer.add(java.lang.Double.doubleToLongBits(
        p.asInstanceOf[Double] + 0.0), w.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: WMedBuffer, other: WMedBuffer): WMedBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: WMedBuffer): Any =
    if (buffer.size == 0) null
    else {
      val (m, t, np) = buffer.result()
      InternalRow(m, t, np)
    }

  override def serialize(buffer: WMedBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): WMedBuffer =
    WMedBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedMedianAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedMedianAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedMedianAgg =
    copy(priceExpr = newLeft, weightExpr = newRight)
}

object WeightedMedian {
  def weightedMedian(price: Column, weight: Column): Column =
    ColumnBridge.column(WeightedMedianAgg(
      ColumnBridge.expression(price),
      ColumnBridge.expression(weight)).toAggregateExpression())
}
