package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd SimHash sketch over a token array: bit j of the result
  * is set when Σ_tokens (±1 by bit j of md5_60(token)) > 0.
  *
  * Semantics are IDENTICAL to the exploded formulation it replaces
  * (`explode(tokens)` → 60-bit portable hash → `bits` conditional sums
  * through a `groupBy(doc_id)`) — the counters are exact long integers, so
  * the in-row pass and the shuffled aggregate cannot disagree, and the
  * DuckDB oracle SQL is unchanged. What changes is the plan: the sketch is
  * now a single projection — |docs| rows in, |docs| rows out, ZERO
  * shuffles — where the round-3 shape exploded |docs|·|tokens| rows through
  * a wide hash aggregate (the dominant cost of q29/q44 at any scale; at
  * 100 TB the explode alone is two orders of magnitude more shuffle I/O
  * than the documents themselves).
  *
  * The md5 per token (portability with the oracle — see
  * [[PortableHash60]]) dominates the per-row cost; a production deployment
  * swaps in xxhash64 behind the same signature.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_native"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits >= 1 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> and 1<=bits<=64, got $dt / bits=$bits")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashOps.sketch(input.asInstanceOf[ArrayData], bits)

  // helper statics live in SimHashOps, not the companion (a same-named
  // case-class accessor would suppress the companion's static forwarder —
  // the Janino trap documented on DotProduct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashOps.sketch($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  /** Column wrapper: `simhash(tokens, bits)`. */
  def simhash(tokens: Column, bits: Int): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(tokens), bits))
}

/** Static eval helpers called from generated code. */
object SimHashOps {

  /** Exact integer simhash: per token, bit j contributes +1 when bit j of
    * the 60-bit portable hash is set, else −1; sketch bit j = (sum > 0).
    * Null tokens contribute nothing (split() never produces them; the
    * guard keeps a hand-built array from NPEing the task).
    */
  def sketch(tokens: ArrayData, bits: Int): Long = {
    val counters = new Array[Long](bits)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val g = PortableHash60.hash(tokens.getUTF8String(t).getBytes)
        var j = 0
        while (j < bits) {
          counters(j) += ((g >>> j) & 1L) * 2 - 1
          j += 1
        }
      }
      t += 1
    }
    var sk = 0L
    var j = 0
    while (j < bits) {
      if (counters(j) > 0) sk |= 1L << j
      j += 1
    }
    sk
  }
}
