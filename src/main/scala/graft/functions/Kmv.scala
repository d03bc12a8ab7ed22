package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV / bottom-k distinct-value sketch (Bar-Yossef et al. 2002; the
  * "theta sketch" family): keep the k SMALLEST distinct hash values seen.
  * If hashes are uniform on [0, H), the k-th smallest value θ estimates
  * the distinct count as (k−1)·H/θ — k points evenly spaced over a
  * fraction θ/H of the hash line.
  *
  * What it adds next to [[HllSketchAgg]]: the sketch retains the SAMPLE
  * of hash values, not just register maxima, so two sketches support SET
  * ALGEBRA — bottom-k of a union is computable from the two bottom-k
  * sets alone (union, sort, first k), and the intersection estimate
  * |K(A∪B) ∩ A ∩ B| / k · |A∪B|̂ falls out of plain array built-ins
  * (q119 spells it in `array_intersect`/`slice` — no native union/
  * intersect expression needed, Catalyst already has them). HLL can
  * only union; overlap between crawl snapshots needs KMV/theta.
  *
  * Determinism: the result is the SET of the k smallest distinct hashes —
  * a property of the data alone, independent of partition count and merge
  * order (unlike MG slot residue). Emitted ascending, so downstream
  * hashes are stable and the oracle can pin estimates exactly.
  *
  * State: a bounded TreeSet, O(k) longs per group per task; mergeable
  * through the ordinary partial/final protocol; streaming-legal.
  * Feed it [[PortableHash60]] hashes: uniform on [0, 2^60), so
  * H = 2^60 in the estimator.
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(v: Long): Unit =
    if (set.size < k) { set.add(v); () }
    else if (v < set.last && !set.contains(v)) {
      set.add(v)
      set.remove(set.last)
    }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(set.size)
    val it = set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush(); bos.toByteArray
  }
}

object KmvBuffer {
  def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new KmvBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) { b.set.add(in.readLong()); n -= 1 }
    b
  }
}

/** `kmv_sketch(hash, k)` → array<bigint>: the k smallest distinct hashes,
  * ascending. θ is the last element when the array is full; an array
  * shorter than k means the group's EXACT distinct hash set was captured
  * whole (estimate = its length, error zero).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 1, s"kmv_sketch needs k > 1, got $k")

  override def prettyName: String = "kmv_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"kmv_sketch requires bigint hashes, got $dt")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val arr = new Array[Any](buffer.set.size)
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object Kmv {
  /** `kmvSketch(hash, k)` → ascending array of the k smallest distinct hashes. */
  def kmvSketch(hash: Column, k: Int): Column =
    ColumnBridge.column(KmvAgg(
      ColumnBridge.expression(hash), k).toAggregateExpression())
}
