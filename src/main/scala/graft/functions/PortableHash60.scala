package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the top 60 bits of md5(input) as a long —
  * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)` (the portable
  * formulation DuckDB replays as `CAST('0x'||substring(md5(s),1,15) AS
  * BIGINT)`), but computed straight from the digest bytes instead of
  * allocating a hex string and re-parsing it base-16.
  *
  * This is the hot scalar of the dedup family (one call per shingle), so it
  * gets `doGenCode` to stay inside whole-stage codegen rather than falling
  * back to interpreted eval.
  */
case class PortableHash60(child: Expression)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"portable_hash60 requires a string input, got ${child.dataType}")
  override def prettyName: String = "portable_hash60"

  override protected def nullSafeEval(input: Any): Any =
    PortableHash60.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHash60.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): PortableHash60 =
    copy(child = newChild)
}

object PortableHash60 {

  /** First 15 hex digits of md5 = top 7.5 bytes, big-endian. */
  def hash(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Column wrapper. */
  def portableHash60(c: Column): Column =
    ColumnBridge.column(PortableHash60(ColumnBridge.expression(c)))
}
