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
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters state: at most k (item, counter) pairs.
  *
  * Invariants (the MERGEABLE form, Agarwal et al., "Mergeable Summaries",
  * PODS'12): after any sequence of adds and merges over a stream of N
  * items, every stored counter UNDERCOUNTS its item's true frequency by
  * at most N/(k+1), and any item NOT stored has true frequency at most
  * N/(k+1) — so every item with frequency > N/(k+1) is guaranteed
  * present. Which LOW-frequency items round out the k slots is
  * partition-order dependent; the guarantees above are not. Consumers
  * that need deterministic output emit the contract (presence of exact
  * heavy items, bounded error), not the raw slot contents — q86 does
  * exactly that.
  *
  * add: present → +1; room → insert at 1; full → decrement ALL by 1 and
  * drop zeros (the classic MG step: one decrement "spends" k+1 stream
  * items, hence the N/(k+1) bound). merge: counter-wise sum, then if over
  * k slots subtract the (k+1)-th largest counter from all and drop ≤ 0 —
  * at most k survive, and total decrement stays within the same budget.
  */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, java.lang.Long]()

  def add(item: String): Unit = {
    val cur = counts.get(item)
    if (cur != null) counts.put(item, cur + 1L)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Weighted insert = merging a singleton summary {item: w} (a summary
    * of the w-repetition stream, which is exact): counter add, then the
    * same over-k correction as [[mergeIn]]. The Mergeable-Summaries
    * guarantees therefore carry over verbatim — total decrement budget
    * N/(k+1), so undercount and recall bounds hold for pre-aggregated
    * (item, count) inputs exactly as for the unit stream (q86's artifact
    * composition).
    */
  def addW(item: String, w: Long): Unit = {
    if (w <= 0L) return
    counts.merge(item, w, (a, b) => java.lang.Long.valueOf(a + b))
    if (counts.size > k) overKCorrection()
  }

  def mergeIn(other: MgBuffer): Unit = {
    other.counts.forEach { (item, v) =>
      counts.merge(item, v, (a, b) => java.lang.Long.valueOf(a + b))
    }
    if (counts.size > k) overKCorrection()
  }

  private def overKCorrection(): Unit = {
    {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - 1 - k) // the (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  /** (est desc, item asc) — deterministic order for whatever survives. */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue.longValue()); i += 1 }
    arr.sortWith { (a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(counts.size)
    counts.forEach { (item, v) => out.writeUTF(item); out.writeLong(v) }
    out.flush(); bos.toByteArray
  }
}

object MgBuffer {
  def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MgBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) { b.counts.put(in.readUTF(), in.readLong()); n -= 1 }
    b
  }
}

/** Native Misra–Gries heavy-hitters aggregate: one pass, O(k) state per
  * group per task, mergeable through the ordinary partial/final protocol —
  * the exchange carries ≤ k (item, counter) pairs per group per partition
  * instead of the full per-item count table. THE shape for "frequent
  * tokens / domains / URLs per stratum" at 100 TB, where the exact
  * formulation's intermediate (`groupBy(stratum, item)`) is itself
  * corpus-sized: a Zipf-tail vocabulary shuffles billions of rows to
  * answer a question about its top fifty. Also legal in streaming groupBy
  * aggregations (complete/update mode), where the exact two-level groupBy
  * + rank is not expressible in one query.
  *
  * Emits array<struct<item, est>> in (est desc, item asc) order. est ≤
  * true frequency always; see [[MgBuffer]] for the error/recall
  * guarantees and the determinism caveat on slot residue.
  */
case class MgSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  require(k > 0, s"mg_sketch needs k > 0, got $k")

  override def prettyName: String = "mg_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"mg_sketch requires string items, got $dt")
  }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: MgBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    }.toArray[Any])

  override def serialize(buffer: MgBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgSketchAgg =
    copy(child = newChild)
}

/** `mg_sketch_w(item, weight, k)`: the weighted-insert twin of
  * [[MgSketchAgg]] for pre-aggregated (item, count) inputs — each update
  * is a singleton-summary merge (see [[MgBuffer.addW]]), so the
  * Mergeable-Summaries recall/undercount guarantees hold for the count
  * table exactly as for the unit stream. Slot RESIDUE differs from the
  * row-wise build (it is partition-order dependent either way); q86
  * emits only the contract, never the residue.
  */
case class MgSketchWAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0, s"mg_sketch_w needs k > 0, got $k")

  override def prettyName: String = "mg_sketch_w"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"mg_sketch_w requires (string item, bigint weight), got ($l, $r)")
    }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val item = left.eval(input)
    val w = right.eval(input)
    if (item != null && w != null)
      buffer.addW(item.asInstanceOf[UTF8String].toString, w.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: MgBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    }.toArray[Any])

  override def serialize(buffer: MgBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchWAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchWAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MgSketchWAgg =
    copy(left = newLeft, right = newRight)
}

object FreqSketch {
  /** `mgSketch(item, k)` → array<struct<item, est>> heavy-hitter summary. */
  def mgSketch(item: Column, k: Int): Column =
    ColumnBridge.column(MgSketchAgg(
      ColumnBridge.expression(item), k).toAggregateExpression())

  /** `mgSketchW(item, weight, k)` — weighted insert over a count table. */
  def mgSketchW(item: Column, weight: Column, k: Int): Column =
    ColumnBridge.column(MgSketchWAgg(
      ColumnBridge.expression(item), ColumnBridge.expression(weight),
      k).toAggregateExpression())
}
