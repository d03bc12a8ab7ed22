package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fixed-width bitset OR-aggregate (TypedImperativeAggregate): each input
  * row contributes one bit position; the aggregate's value is the m-bit
  * set with those bits on, emitted as `array<long>` of length m/64 (word
  * i holds bits [64·i, 64·i+64), LSB-first).
  *
  * This is the BUILD half of a broadcast Bloom filter: the small side
  * (benchmark n-grams, a blocklist, a seen-set) folds into a few-hundred-KB
  * bitset through the ordinary two-phase aggregation protocol — each map
  * partition produces one local bitset, partials merge by word-wise OR, so
  * the exchange carries O(partitions · m/64) longs regardless of input row
  * count, and the merge is associative+commutative (partition-order
  * invariant: OR is idempotent, duplicate positions are free, no
  * distinct pre-pass needed). The result row is then broadcast and probed
  * IN-ROW on the large side (`element_at` + `bit_get` over the array
  * column), which is the whole point at 100 TB: the corpus is never
  * shuffled, never joined row-to-row against the set — a 256 KB bitset
  * rides along with every task.
  *
  * Null/range contract: NULL positions are ignored; an out-of-range
  * position throws (a Bloom build feeding garbage positions is a bug, not
  * data to tolerate silently).
  */
final class BitsetBuffer(val numBits: Int) {
  val words = new Array[Long]((numBits + 63) / 64)
  def set(pos: Long): Unit = {
    require(pos >= 0 && pos < numBits, s"bit position $pos outside [0, $numBits)")
    words((pos >> 6).toInt) |= 1L << (pos & 63)
  }
  def orIn(other: BitsetBuffer): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }
  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + words.length * 8)
    bb.putInt(numBits)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object BitsetBuffer {
  def deserialize(bytes: Array[Byte]): BitsetBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new BitsetBuffer(bb.getInt)
    var i = 0
    while (i < b.words.length) { b.words(i) = bb.getLong; i += 1 }
    b
  }
}

case class BitsetOrAgg(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitsetBuffer] with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0,
    s"bitset_or needs a positive multiple-of-64 bit count, got $numBits")

  override def prettyName: String = "bitset_or"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bitset_or requires an integral bit position, got $dt")
  }

  override def createAggregationBuffer(): BitsetBuffer = new BitsetBuffer(numBits)

  override def update(buffer: BitsetBuffer, input: InternalRow): BitsetBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.set(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    })
    buffer
  }

  override def merge(buffer: BitsetBuffer, other: BitsetBuffer): BitsetBuffer = {
    buffer.orIn(other); buffer
  }

  override def eval(buffer: BitsetBuffer): Any = new GenericArrayData(buffer.words)

  override def serialize(buffer: BitsetBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): BitsetBuffer =
    BitsetBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitsetOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitsetOrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitsetOrAgg =
    copy(child = newChild)
}

object Bitset {
  /** `bitsetOr(pos, m)` aggregates bit positions into an m-bit set
    * (`array<long>`, m/64 words, LSB-first within each word).
    */
  def bitsetOr(pos: Column, numBits: Int): Column =
    ColumnBridge.column(BitsetOrAgg(
      ColumnBridge.expression(pos), numBits).toAggregateExpression())
}
