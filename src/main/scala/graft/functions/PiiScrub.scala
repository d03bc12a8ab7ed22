package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII scrub (q51): emails and 555-phones counted AND redacted in
  * one expression evaluation, replacing a 4-expression chain — two
  * `regexp_extract_all(size(...))` plus a nested double `regexp_replace`
  * — that re-materialized the document string four times and ran four
  * full matcher traversals per row.
  *
  * Semantics are EXACTLY the reference chain's (the DuckDB oracle keeps
  * the 4-call spelling, so the hash gate enforces this):
  *
  *  - `n_emails` = count of email matches on the RAW string;
  *  - `n_phones` = count of phone matches on the RAW string — including
  *    phones embedded inside an email span ("call 555-66@x.yy" counts
  *    one of each), because the reference counts both patterns on raw;
  *  - `clean_text` = `replace(replace(raw, email→<EMAIL>), phone→<PHONE>)`
  *    — the phone pass of the chain runs on the email-REPLACED string,
  *    whose "<EMAIL>" tokens create word boundaries the raw string may
  *    not have ("x.cc555-1" hides the phone; "<EMAIL>555-1" exposes it).
  *
  * The boundary fidelity comes for free from java.util.regex OPAQUE
  * region bounds: phone replacement scans each inter-email gap as a
  * region, and a region edge behaves exactly like the '>' / '<' of the
  * literal "<EMAIL>" neighbor — a non-word character, so `\b` holds iff
  * the adjacent gap character is a word character. No phone can straddle
  * a gap edge (phone bodies are digits/'-'; email spans end in a TLD
  * letter and "<EMAIL>" contains no digit), so gap-region matching on the
  * raw string is bit-identical to a second pass over the replaced string,
  * without materializing it.
  *
  * Three matcher traversals (email, phone-count, phone-in-gaps) instead
  * of four, ONE UTF8String→String decode instead of four, one output
  * StringBuilder instead of two intermediate full-string rebuilds.
  *
  * Ref behavior: guidopetri/chess-pipeline has no PII stage; this is the
  * LLM-pipeline extension surface (SURVEY §2), reference semantics fixed
  * by the q51 oracle since round 6.
  */
object PiiScrubOps {
  // identical pattern source as the oracle SQL (TrainPrep.emailRe/phoneRe);
  // compiled once per JVM — Spark's own RegExpReplace caches per-instance,
  // which a 4-expression chain pays four times
  private val email = Pattern.compile("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  private val phone = Pattern.compile("\\b555-[0-9]+\\b")

  def scrub(raw: UTF8String): InternalRow = {
    val s = raw.toString
    // pass 1 — emails: count + record spans (gap edges: s[gaps(i), gaps(i+1))
    // is the i/2-th inter-email gap; an "<EMAIL>" splice sits between gaps)
    val em = email.matcher(s)
    var nEmails = 0
    val gaps = new scala.collection.mutable.ArrayBuffer[Int](8)
    var last = 0
    while (em.find()) {
      nEmails += 1
      gaps += last; gaps += em.start()
      last = em.end()
    }
    gaps += last; gaps += s.length
    // pass 2 — phones on the RAW string (the reference counts both
    // patterns on raw, not sequentially)
    val pcRaw = phone.matcher(s)
    var nPhones = 0
    while (pcRaw.find()) nPhones += 1
    if (nEmails == 0 && nPhones == 0)
      return InternalRow(0, 0, raw) // untouched row: no rebuild at all
    // pass 3 — the output in one walk: each gap is phone-scanned as an
    // OPAQUE-bounds region (edges behave as non-word context, exactly the
    // '>' / '<' of the "<EMAIL>" neighbor in the replaced string), with
    // "<EMAIL>" spliced between gaps
    val res = new java.lang.StringBuilder(s.length + 16)
    val pm = phone.matcher(s)
    var gi = 0
    while (gi < gaps.length) {
      val g0 = gaps(gi); val g1 = gaps(gi + 1)
      if (gi > 0) res.append("<EMAIL>")
      pm.region(g0, g1)
      var pos = g0
      while (pm.find()) {
        res.append(s, pos, pm.start()).append("<PHONE>")
        pos = pm.end()
      }
      res.append(s, pos, g1)
      gi += 2
    }
    InternalRow(nEmails, nPhones, UTF8String.fromString(res.toString))
  }
}

/** `pii_scrub(text)` → struct<n_emails:int, n_phones:int, clean_text:string>. */
case class PiiScrub(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def prettyName: String = "pii_scrub"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $dt")
  }
  override protected def nullSafeEval(input: Any): Any =
    PiiScrubOps.scrub(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScrubOps.scrub($c)")
  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}

object PiiScrub {
  def piiScrub(c: Column): Column =
    ColumnBridge.column(PiiScrub(ColumnBridge.expression(c)))
}
