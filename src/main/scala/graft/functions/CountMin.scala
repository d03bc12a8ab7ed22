package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): a
  * depth×width grid of long counters; every item increments one counter
  * per row, a point query reads the MINIMUM of its depth counters.
  *
  * Guarantees, and why they complement the Misra–Gries family
  * ([[MgSketchAgg]]): CM never UNDERcounts (every counter an item touches
  * received all of its increments), and with width w the expected
  * overcount is N/w per row — the min over depth rows makes a large
  * overcount exponentially unlikely. MG answers "which items are heavy"
  * (it stores items); CM answers "how often did THIS item occur" for
  * items supplied at query time — it stores no items at all, so its size
  * is a fixed depth·width·8 bytes regardless of vocabulary. Merge is
  * counter-wise addition: commutative and associative, so the sketch
  * bytes are IDENTICAL whatever the partition count or merge order —
  * unlike MG's slot residue, a CM sketch is deterministic end to end,
  * which is what lets q118's oracle hash it.
  *
  * Row/slot derivation reuses the library's double-hashing discipline
  * (Kirsch–Mitzenmauer, the [[BloomOps]] identity): slot(row) =
  * (xxhash64(h) + row·(2·murmur3(h)+1)) mod w, w a power of two so the
  * odd step visits w distinct slots. Build and probe share
  * [[CmOps.slot]] VERBATIM — the two sides agreeing on it IS the
  * sketch's identity, exactly the Bloom build/probe contract.
  *
  * Layout: [depth:int][width:int][depth·width longs], big-endian.
  */
object CmOps {

  def slot(h: Long, row: Int, width: Int): Int = {
    val h1 = java.lang.Long.remainderUnsigned(XXH64.hashLong(h, 42L), width)
    val step = (2L * Murmur3_x86_32.hashLong(h, 42) + 1) & (width - 1)
    ((h1 + row * step) % width).toInt
  }

  /** Point estimate: min over the item's depth counters. One static call
    * per probe row inside generated code — no buffer wrap, no allocation.
    */
  def query(sketch: Array[Byte], h: Long): Long = {
    val depth = readInt(sketch, 0)
    val width = readInt(sketch, 4)
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = readLong(sketch, 8 + (r * width + slot(h, r, width)) * 8)
      if (c < min) min = c
      r += 1
    }
    min
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private[functions] def readLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }
}

/** Mutable grid state; serialized form is the wire/result layout above. */
final class CmBuffer(val depth: Int, val width: Int) {
  val counts = new Array[Long](depth * width)

  def add(h: Long): Unit = addW(h, 1L)

  /** Weighted insert: counter addition commutes, so adding an item's
    * PRE-AGGREGATED count w yields the bit-identical grid to w unit
    * inserts — the path that lets a persisted (stratum, item, cnt)
    * count table rebuild its sketches without replaying the token
    * stream (q118's artifact composition).
    */
  def addW(h: Long, w: Long): Unit = {
    var r = 0
    while (r < depth) {
      counts(r * width + CmOps.slot(h, r, width)) += w
      r += 1
    }
  }

  def mergeIn(other: CmBuffer): Unit = {
    require(other.depth == depth && other.width == width,
      s"cm_sketch geometry mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }

  def serialize(): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + counts.length * 8)
    buf.putInt(depth).putInt(width)
    var i = 0
    while (i < counts.length) { buf.putLong(counts(i)); i += 1 }
    buf.array()
  }
}

object CmBuffer {
  def deserialize(bytes: Array[Byte]): CmBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val b = new CmBuffer(buf.getInt(), buf.getInt())
    var i = 0
    while (i < b.counts.length) { b.counts(i) = buf.getLong(); i += 1 }
    b
  }
}

/** `cm_sketch(hash, depth, width)` → binary: one-pass mergeable frequency
  * sketch over pre-hashed items (pair with [[PortableHash60]] on strings).
  * Fixed depth·width·8-byte state per group per task through the ordinary
  * partial/final protocol; streaming-legal (update/complete-mode groupBy).
  */
case class CmSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmBuffer] with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"cm_sketch depth must be in [1,16], got $depth")
  require(width > 1 && Integer.bitCount(width) == 1,
    s"cm_sketch width must be a power of two > 1, got $width")

  override def prettyName: String = "cm_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"cm_sketch requires bigint hashes, got $dt")
  }

  override def createAggregationBuffer(): CmBuffer = new CmBuffer(depth, width)

  override def update(buffer: CmBuffer, input: InternalRow): CmBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CmBuffer, other: CmBuffer): CmBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: CmBuffer): Any = buffer.serialize()
  override def serialize(buffer: CmBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmBuffer = CmBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmSketchAgg =
    copy(child = newChild)
}

/** `cm_merge(sketch)` → binary: counter-wise sum of already-built sketches
  * — the re-aggregation path (hourly partials → daily total) that makes
  * the sketch a PERSISTABLE warehouse artifact, mirroring hll_merge /
  * hist_merge.
  */
case class CmMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "cm_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"cm_merge requires binary sketches, got $dt")
  }

  // geometry is carried by the serialized sketches themselves; the empty
  // marker buffer adopts the first input's grid
  override def createAggregationBuffer(): CmBuffer = new CmBuffer(1, 2)
  private def isMarker(b: CmBuffer): Boolean = b.depth == 1 && b.width == 2

  override def update(buffer: CmBuffer, input: InternalRow): CmBuffer = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = CmBuffer.deserialize(v.asInstanceOf[Array[Byte]])
      if (isMarker(buffer)) in else { buffer.mergeIn(in); buffer }
    }
  }

  override def merge(buffer: CmBuffer, other: CmBuffer): CmBuffer =
    if (isMarker(other)) buffer
    else if (isMarker(buffer)) other
    else { buffer.mergeIn(other); buffer }

  override def eval(buffer: CmBuffer): Any = buffer.serialize()
  override def serialize(buffer: CmBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmBuffer = CmBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmMergeAgg =
    copy(child = newChild)
}

/** `cm_query(sketch, hash)` → bigint: the point-frequency estimate, one
  * codegen'd static call per row — the probe side of the build/probe pair.
  */
case class CmQuery(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "cm_query"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary sketch, bigint hash), got ($l, $r)")
  }

  override protected def nullSafeEval(sketch: Any, h: Any): Any =
    CmOps.query(sketch.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, h) => s"graft.functions.CmOps.query($s, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmQuery =
    copy(left = newLeft, right = newRight)
}

/** `cm_sketch_w(hash, weight, depth, width)`: the weighted-insert twin of
  * [[CmSketchAgg]] for pre-aggregated (item, count) inputs. Counter-wise
  * addition commutes, so the grid is BIT-EQUAL to the row-wise build over
  * the expanded stream — pinned in CountMinSpec.
  */
case class CmSketchWAgg(
    left: Expression,
    right: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"cm_sketch_w depth must be in [1,16], got $depth")
  require(width > 1 && Integer.bitCount(width) == 1,
    s"cm_sketch_w width must be a power of two > 1, got $width")

  override def prettyName: String = "cm_sketch_w"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cm_sketch_w requires (bigint hash, bigint weight), got ($l, $r)")
    }

  override def createAggregationBuffer(): CmBuffer = new CmBuffer(depth, width)

  override def update(buffer: CmBuffer, input: InternalRow): CmBuffer = {
    val h = left.eval(input)
    val w = right.eval(input)
    if (h != null && w != null)
      buffer.addW(h.asInstanceOf[Long], w.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CmBuffer, other: CmBuffer): CmBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: CmBuffer): Any = buffer.serialize()
  override def serialize(buffer: CmBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CmBuffer = CmBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketchWAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketchWAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmSketchWAgg =
    copy(left = newLeft, right = newRight)
}

object CountMin {
  def cmSketch(hash: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(CmSketchAgg(
      ColumnBridge.expression(hash), depth, width).toAggregateExpression())
  def cmSketchW(hash: Column, weight: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(CmSketchWAgg(
      ColumnBridge.expression(hash), ColumnBridge.expression(weight),
      depth, width).toAggregateExpression())
  def cmMerge(sketch: Column): Column =
    ColumnBridge.column(CmMergeAgg(
      ColumnBridge.expression(sketch)).toAggregateExpression())
  def cmQuery(sketch: Column, hash: Column): Column =
    ColumnBridge.column(CmQuery(
      ColumnBridge.expression(sketch), ColumnBridge.expression(hash)))
}
