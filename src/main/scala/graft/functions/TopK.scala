package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: at most k (value, id) pairs under the total
  * order "higher value wins, lower id breaks ties". A binary min-heap on
  * that order (worst element at the root) gives O(log k) insert and O(1)
  * reject, so a partition pass is O(n log k) with O(k) memory — never a
  * sort, never more than k rows of state.
  */
final class TopKBuffer(val k: Int) {
  // worst-first ordering: the queue's MAX is the element to evict
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      // a "greater" than b  ⇔  a is WORSE: smaller value, or equal value
      // with larger id
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def add(value: Double, id: Long): Unit =
    if (heap.size < k) heap.enqueue((value, id))
    else if (worstFirst.compare(heap.head, (value, id)) > 0) {
      heap.dequeue(); heap.enqueue((value, id))
    }

  def mergeIn(other: TopKBuffer): Unit =
    other.heap.foreach { case (v, id) => add(v, id) }

  /** Best-first (value desc, id asc) — the emission order. */
  def sorted: Array[(Double, Long)] = heap.toArray.sortWith { (a, b) =>
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(heap.size)
    heap.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush(); bos.toByteArray
  }
}

object TopKBuffer {
  def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) { b.add(in.readDouble(), in.readLong()); n -= 1 }
    b
  }
}

/** Native bounded top-k aggregate (TypedImperativeAggregate): the scalable
  * answer to "top k rows per group". The built-in formulation —
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` — shuffles
  * and sorts EVERY row of the table to keep k per group; this aggregate
  * keeps a k-bounded heap per group through the ordinary two-phase
  * aggregation protocol, so the map side already reduces each partition to
  * ≤ k rows per group and the exchange carries O(k·|groups|) bytes, not
  * O(n). Determinism: the order is total (value desc, id asc), so ties
  * cannot make the result depend on partitioning — PartitionInvariance
  * applies.
  *
  * Null contract: rows where value or id is NULL are ignored (the
  * row_number formulation drops NULL-ordered rows to the end; a top-k over
  * a nullable metric wants them absent, and the oracle's ORDER BY ... DESC
  * puts NULLs last in DuckDB anyway).
  */
case class TopKAgg(
    valueExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def left: Expression = valueExpr
  override def right: Expression = idExpr
  override def prettyName: String = "bounded_top_k"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (valueExpr.dataType == DoubleType && idExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_top_k requires (double, long) inputs, got " +
        s"(${valueExpr.dataType}, ${idExpr.dataType})")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      buffer.add(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (v, id) =>
      InternalRow(id, v)
    }.toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(valueExpr = newLeft, idExpr = newRight)
}

object TopK {
  /** Column-API entry: `topK(value, id, k)` aggregates to an
    * array<struct<event_id, value>> in (value desc, id asc) order.
    */
  def topK(value: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKAgg(
      ColumnBridge.expression(value),
      ColumnBridge.expression(id), k).toAggregateExpression())
}
