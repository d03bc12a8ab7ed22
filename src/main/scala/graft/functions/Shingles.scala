package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** In-row word-3-gram machinery for the dedup family: the round-3 pipeline
  * exploded every word, stitched 3-grams with two `lead()` windows,
  * hashed, `distinct()`-ed, and counted through two more wide operators —
  * four full-data shuffles before any pairing happened. These expressions
  * compute the same values in a single projection pass per document
  * (|docs| rows in, |docs| rows out, zero shuffles), the q29/q40 round-4
  * pattern. md5 stays the hash for DuckDB-oracle parity; a production
  * deployment swaps xxhash64 behind the same signature.
  */
object ShingleOps {

  /** (a, b) parameters of the 8 minhash "permutations" — the single
    * source of truth (Dedup.minhashParams aliases this).
    */
  val minhashParams: Seq[(Long, Long)] = Seq(
    (131L, 7L), (137L, 91L), (139L, 173L), (149L, 255L),
    (151L, 337L), (157L, 419L), (163L, 501L), (167L, 583L))

  private val P = 2147483647L

  /** 60-bit portable hash of the 3-gram starting at `i`, digested
    * incrementally (identical bytes to `md5(w0 ++ " " ++ w1 ++ " " ++ w2)`).
    * Token bytes arrive pre-extracted (`tokenBytes`) — every token
    * participates in up to three grams, and re-materializing its UTF-8
    * bytes per gram tripled the allocation churn of the corpus-wide
    * signature passes (r16).
    */
  private def gramHash(
      md: java.security.MessageDigest, toks: Array[Array[Byte]], i: Int,
      d: Array[Byte]): Long = {
    md.reset()
    md.update(toks(i))
    md.update(' '.toByte)
    md.update(toks(i + 1))
    md.update(' '.toByte)
    md.update(toks(i + 2))
    // digest into the caller's reused 16-byte buffer: md.digest() would
    // allocate a fresh array per gram — ~200 per document, tens of
    // millions per corpus-wide signature pass (r17)
    md.digest(d, 0, 16)
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  private def tokenBytes(tokens: ArrayData): Array[Array[Byte]] = {
    val n = tokens.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    toks
  }

  /** Sorted DISTINCT 60-bit hashes of a document's word 3-grams (empty
    * for <3 words) — `size()` of the result is the q26 `n_sh`.
    * Primitive sort + in-place dedup (r16): the former boxed TreeSet
    * allocated a node per gram on the hottest per-row path of the whole
    * dedup family; output is identical (sorted distinct).
    */
  def shingleHashes(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](16)
    val toks = tokenBytes(tokens)
    val hs = new Array[Long](n - 2)
    var i = 0
    while (i + 2 < n) {
      hs(i) = gramHash(md, toks, i, buf)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** [n_2grams, n_distinct_2grams, top_2gram_count] over a document's
    * word 2-grams, or null for <2 tokens (see [[RepetitionStats]]).
    */
  def repetitionStats(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 2) return null
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var i = 0
    while (i + 1 < n) {
      val g = tokens.getUTF8String(i).toString + " " + tokens.getUTF8String(i + 1).toString
      val c: Int = counts.merge(g, 1, (a, b) => Integer.valueOf(a + b))
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array[Long](n - 1L, counts.size.toLong, top.toLong))
  }

  /** The 8 minhash permutation minima over a document's 3-gram hashes
    * (h_i = min over shingles of (a_i·(g mod P) + b_i) mod P), or null
    * when the document has no shingles — the multiset minimum equals the
    * distinct-set minimum, so no dedup pass is needed.
    */
  def minhashSig(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](16)
    val toks = tokenBytes(tokens)
    val as = new Array[Long](8)
    val bs = new Array[Long](8)
    var k = 0
    while (k < 8) { as(k) = minhashParams(k)._1; bs(k) = minhashParams(k)._2; k += 1 }
    val mins = Array.fill(8)(Long.MaxValue)
    var i = 0
    while (i + 2 < n) {
      val g = gramHash(md, toks, i, buf) % P
      k = 0
      while (k < 8) {
        val h = (as(k) * g + bs(k)) % P
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `repetition_stats(tokens)` → [n_2grams, n_distinct_2grams,
  * top_2gram_count], null for <2 tokens — the q59 metrics in one in-row
  * pass. Exact string counts (no hashing), so the result is bit-identical
  * to the explode + two-groupBy formulation it replaces — that plan
  * shuffled every token through a window sort; this one shuffles nothing.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // <2 words → null
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $dt")
  }
  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.repetitionStats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ShingleOps.repetitionStats($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** `shingle_hashes(tokens)` → sorted distinct array<long>. */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $dt")
  }
  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.shingleHashes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleOps.shingleHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `minhash_sig(tokens)` → array<long>(8), null when no shingles exist. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // <3 words → null sig
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $dt")
  }
  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.minhashSig(input.asInstanceOf[ArrayData])
  // nullSafeCodeGen (not defineCodeGen): the helper returns null for
  // <3-word documents, which must surface as SQL NULL
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.ShingleOps.minhashSig($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object ShingleFunctions {
  def shingleHashes(c: Column): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c)))
  def minhashSig(c: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c)))
  def repetitionStats(c: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(c)))
}
