package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Bloom-filter probe math, shared VERBATIM by the build side (positions
  * explode into [[BitsetOrAgg]]) and the probe side ([[BloomCount]]) —
  * the two sides agreeing on this function IS the filter's identity.
  *
  * Double hashing (Kirsch–Mitzenmauer): pos_i = h1 + i·step mod m, with
  * h1 = xxhash64(h) and step = 2·murmur3(h)+1 — the same two hash
  * families Spark's own expressions use for these types (XXH64.hashLong /
  * Murmur3_x86_32.hashLong, seed 42), and step odd so for a power-of-two
  * m the k probes never collapse onto one slot.
  *
  * A first cut expressed the probe as a higher-order `filter` lambda over
  * built-ins; Spark evaluates higher-order-function lambdas INTERPRETED
  * (no whole-stage codegen inside the lambda), and the spelling
  * re-evaluated both hashes per probe — ~10 expression-tree walks per
  * gram. These expressions do one static-helper call per row inside
  * generated code instead; the q85 A/B in SCALE.md has the numbers.
  */
object BloomOps {

  def positions(h: Long, numBits: Int, numHashes: Int): ArrayData = {
    val out = new Array[Long](numHashes)
    val h1 = java.lang.Long.remainderUnsigned(XXH64.hashLong(h, 42L), numBits)
    val step = (2L * Murmur3_x86_32.hashLong(h, 42) + 1) & (numBits - 1)
    var i = 0
    var p = h1
    while (i < numHashes) {
      out(i) = p
      p += step
      if (p >= numBits) p -= numBits
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Single-key membership: all k probe bits of `h` set in `bits`? */
  def contains(bits: ArrayData, h: Long, numBits: Int, numHashes: Int): Boolean = {
    val h1 = java.lang.Long.remainderUnsigned(XXH64.hashLong(h, 42L), numBits)
    val step = (2L * Murmur3_x86_32.hashLong(h, 42) + 1) & (numBits - 1)
    var i = 0
    var p = h1
    while (i < numHashes) {
      if ((bits.getLong((p >> 6).toInt) & (1L << (p & 63))) == 0L) return false
      p += step
      if (p >= numBits) p -= numBits
      i += 1
    }
    true
  }

  /** Count of hashes in `hs` whose k probe bits are ALL set in `bits`. */
  def countContained(
      bits: ArrayData, hs: ArrayData, numBits: Int, numHashes: Int): Long = {
    val n = hs.numElements()
    var count = 0L
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      val h1 = java.lang.Long.remainderUnsigned(XXH64.hashLong(h, 42L), numBits)
      val step = (2L * Murmur3_x86_32.hashLong(h, 42) + 1) & (numBits - 1)
      var i = 0
      var p = h1
      var all = true
      while (all && i < numHashes) {
        if ((bits.getLong((p >> 6).toInt) & (1L << (p & 63))) == 0L) all = false
        p += step
        if (p >= numBits) p -= numBits
        i += 1
      }
      if (all) count += 1
      j += 1
    }
    count
  }
}

/** `bloom_positions(h)` → array<long>(k) probe slots for one hash. */
case class BloomPositions(child: Expression, numBits: Int, numHashes: Int)
  extends UnaryExpression {
  require(Integer.bitCount(numBits) == 1, s"numBits must be a power of two, got $numBits")
  override def prettyName: String = "bloom_positions"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires bigint, got $dt")
  }
  override protected def nullSafeEval(input: Any): Any =
    BloomOps.positions(input.asInstanceOf[Long], numBits, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomOps.positions($c, $numBits, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)
}

/** `bloom_count(bits, hashes)` → how many of the row's hashes the filter
  * contains — one generated-code call per ROW, a tight loop per gram.
  */
case class BloomCount(
    left: Expression, right: Expression, numBits: Int, numHashes: Int)
  extends BinaryExpression {
  require(Integer.bitCount(numBits) == 1, s"numBits must be a power of two, got $numBits")
  override def prettyName: String = "bloom_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint> bits, array<bigint> hashes), got ($l, $r)")
  }
  override protected def nullSafeEval(bits: Any, hs: Any): Any =
    BloomOps.countContained(
      bits.asInstanceOf[ArrayData], hs.asInstanceOf[ArrayData], numBits, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomOps.countContained($b, $h, $numBits, $numHashes)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomCount =
    copy(left = newLeft, right = newRight)
}

/** `bloom_contains(bits, h)` → boolean: single-key membership probe —
  * the runtime-filter shape (one codegen'd call per fact row, no array
  * allocation), next to [[BloomCount]]'s per-document gram loop.
  */
case class BloomContains(
    left: Expression, right: Expression, numBits: Int, numHashes: Int)
  extends BinaryExpression {
  require(Integer.bitCount(numBits) == 1, s"numBits must be a power of two, got $numBits")
  override def prettyName: String = "bloom_contains"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint> bits, bigint key), got ($l, $r)")
  }
  override protected def nullSafeEval(bits: Any, h: Any): Any =
    BloomOps.contains(
      bits.asInstanceOf[ArrayData], h.asInstanceOf[Long], numBits, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomOps.contains($b, $h, $numBits, $numHashes)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomFunctions {
  def bloomPositions(h: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(BloomPositions(ColumnBridge.expression(h), numBits, numHashes))
  def bloomCount(bits: Column, hashes: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(BloomCount(
      ColumnBridge.expression(bits), ColumnBridge.expression(hashes), numBits, numHashes))
  def bloomContains(bits: Column, key: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(BloomContains(
      ColumnBridge.expression(bits), ColumnBridge.expression(key), numBits, numHashes))
}
