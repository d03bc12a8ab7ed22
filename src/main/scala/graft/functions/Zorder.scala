package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two 16-bit keys — the multi-dimensional
  * data-layout primitive: sorting by the interleaved value clusters rows
  * that are close in BOTH dimensions into the same file/row group, so
  * min/max stats stay tight on every interleaved column at once and a
  * scan filtered on EITHER dimension skips most files. A single-column
  * sort gives that property to one dimension and destroys it for the
  * others; Z-order splits the benefit across all of them
  * (`ZorderSpec` measures exactly this trade on real files).
  *
  * The bit spread is the classic magic-mask doubling
  * (x | x<<8 → mask, | x<<4 → mask, ...), 10 integer ops per key —
  * pure integer arithmetic, so the DuckDB oracle replays it
  * bit-identically from the same five mask constants.
  */
object ZorderOps {
  /** Spread the low 16 bits of x to the even bit positions of a 32-bit value. */
  def spread16(x0: Long): Long = {
    var x = x0 & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def zorder2(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** The same spread, spelled as SQL over the five mask constants — the
    * oracle-side twin of [[spread16]] (kept here so the two spellings
    * sit next to each other).
    */
  def spreadSql(e: String): String = {
    val m = Seq(
      ("(%s & 65535)", ""),
      ("((%s | (%s << 8)) & 16711935)", ""),
      ("((%s | (%s << 4)) & 252645135)", ""),
      ("((%s | (%s << 2)) & 858993459)", ""),
      ("((%s | (%s << 1)) & 1431655765)", ""))
    m.foldLeft(e) { case (acc, (tpl, _)) =>
      tpl.replace("%s", acc)
    }
  }

  def zorderSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}

/** `zorder2(x, y)` → bigint: Morton interleave of the two keys' low 16
  * bits (x on even bits, y on odd). Codegen'd static call.
  */
case class Zorder2(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "zorder2"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType | IntegerType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral keys, got ($l, $r)")
  }
  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZorderOps.zorder2(toLong(x), toLong(y))
  private def toLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZorderOps.zorder2((long)$x, (long)$y)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Zorder2 =
    copy(left = newLeft, right = newRight)
}

object Zorder {
  def zorder2(x: Column, y: Column): Column =
    ColumnBridge.column(Zorder2(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
