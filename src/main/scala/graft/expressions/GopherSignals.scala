package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All five Gopher-rule raw signals (Rae et al. 2021 §A1.1) in ONE
  * byte-scan over the document — the single-pass replacement for the
  * five-expression battery in [[graft.operators.Curation.gopherFilters]]
  * (split + aggregate-HOF + filter-HOF-with-rlike + three splits +
  * regexp_extract_all), which materialized a token array per row and ran
  * a regex NFA per token. At 10× text volume that battery was the one
  * map-side-only operator with a super-linear probe curve (12.7× — the
  * per-row array/lambda allocation cost grows with text, the JIT never
  * sees a tight loop). This kernel is three allocation-free byte loops
  * (token pass, symbol pass, stopword pass) and one 5-field struct per
  * row.
  *
  * Value-identical semantics to the composed form, proven by fuzz
  * equality in GopherSignalsSpec:
  *  - tokens are `split(trim(t), "\\s+")` runs — trim strips 0x20 only;
  *    a leading/trailing NON-SPACE whitespace (\t \n \x0B \f \r) emits an
  *    empty token (counted in n_words, contributing 0 length / no alpha);
  *    the empty trimmed string yields [""] → n_words = 1;
  *  - sum_word_len sums `length(x)` (code points) over tokens — counted
  *    as non-continuation UTF-8 bytes inside non-whitespace runs;
  *  - n_alpha counts tokens containing an ASCII letter (the composed
  *    form's `x rlike '[a-zA-Z]'`);
  *  - n_symbols counts '#' bytes plus NON-OVERLAPPING leftmost "..."
  *    triples plus U+2026 '…' (E2 80 A6) over the FULL untrimmed text —
  *    exactly `size(split(t, p, -1)) - 1` summed over the three patterns
  *    (the three byte sets are disjoint, so one loop computes all);
  *  - n_stop counts DISTINCT stopwords from {the and of to in is that it
  *    for was} occurring as `\b`-delimited matches of lower(t). An
  *    ASCII-\b match is exactly a maximal [0-9A-Za-z_] run equal
  *    (case-insensitively) to a stopword, so the kernel scans word runs
  *    on the RAW text with ASCII case folding. (Unicode lowercasings
  *    that produce ASCII letters — U+0130 'İ' → "i̇", U+212A 'K' → 'k' —
  *    cannot create a stopword match the run scan misses: the combining
  *    dot breaks the word run right after 'i', and no stopword contains
  *    'k'.)
  */
case class GopherSignals(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gopher_signals expects string, got ${other.sql}")
  }

  override def dataType: DataType = GopherSignals.schema
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    GopherSignals.signals(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.GopherSignals.signals($c);")

  override protected def withNewChildInternal(
      newChild: Expression): GopherSignals = copy(child = newChild)
}

object GopherSignals {

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_symbols", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  /** Column form: one struct column with the five raw signals. */
  def apply(c: Column): Column = ColumnBridge.column(
    GopherSignals(ColumnBridge.expression(c)))

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c ||
      b == 0x0d

  @inline private def isWordCh(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  @inline private def lc(b: Byte): Int =
    if (b >= 'A' && b <= 'Z') b + 32 else b.toInt

  /** Static kernel, called from both interpreted eval and generated code. */
  def signals(s: UTF8String): InternalRow = {
    val n = s.numBytes()

    // ---- token pass (trimmed region): n_words, sum_word_len, n_alpha ----
    var start = 0
    while (start < n && s.getByte(start) == 0x20) start += 1
    var end = n - 1
    while (end >= start && s.getByte(end) == 0x20) end -= 1
    var nWords = 0
    var sumLen = 0L
    var nAlpha = 0
    if (start > end) {
      nWords = 1 // empty trimmed string -> [""]
    } else {
      if (isWs(s.getByte(start))) nWords += 1 // leading empty token
      if (isWs(s.getByte(end))) nWords += 1 // trailing empty token
      var i = start
      var inRun = false
      var runHasAlpha = false
      while (i <= end) {
        val b = s.getByte(i)
        if (isWs(b)) {
          if (inRun) {
            if (runHasAlpha) nAlpha += 1
            inRun = false
          }
        } else {
          if (!inRun) { nWords += 1; inRun = true; runHasAlpha = false }
          if ((b & 0xC0) != 0x80) sumLen += 1 // code-point count
          if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z'))
            runHasAlpha = true
        }
        i += 1
      }
      if (inRun && runHasAlpha) nAlpha += 1
    }

    // ---- symbol pass (full text): '#' + non-overlapping "..." + '…' ----
    var nSym = 0
    var j = 0
    while (j < n) {
      val b = s.getByte(j)
      if (b == '.' && j + 2 < n && s.getByte(j + 1) == '.' &&
          s.getByte(j + 2) == '.') { nSym += 1; j += 3 }
      else if (b == '#') { nSym += 1; j += 1 }
      else if (b == 0xE2.toByte && j + 2 < n &&
          s.getByte(j + 1) == 0x80.toByte &&
          s.getByte(j + 2) == 0xA6.toByte) { nSym += 1; j += 3 }
      else j += 1
    }

    // ---- stopword pass (full text): distinct \b-delimited stopwords ----
    var mask = 0
    var k = 0
    while (k < n) {
      if (isWordCh(s.getByte(k))) {
        val st = k
        while (k < n && isWordCh(s.getByte(k))) k += 1
        val len = k - st
        if (len >= 2 && len <= 4) mask |= stopBit(s, st, len)
      } else k += 1
    }

    new GenericInternalRow(Array[Any](
      nWords, sumLen, nAlpha, nSym, Integer.bitCount(mask)))
  }

  /** Bit for the stopword equal (ASCII-case-insensitively) to the word
    * run at [st, st+len), or 0. Stop list (Gopher's duplicated-stopword
    * guard): the and of to in is that it for was. */
  private def stopBit(s: UTF8String, st: Int, len: Int): Int = {
    val c0 = lc(s.getByte(st))
    val c1 = lc(s.getByte(st + 1))
    len match {
      case 2 =>
        if (c0 == 'o' && c1 == 'f') 1 << 2
        else if (c0 == 't' && c1 == 'o') 1 << 3
        else if (c0 == 'i' && c1 == 'n') 1 << 4
        else if (c0 == 'i' && c1 == 's') 1 << 5
        else if (c0 == 'i' && c1 == 't') 1 << 7
        else 0
      case 3 =>
        val c2 = lc(s.getByte(st + 2))
        if (c0 == 't' && c1 == 'h' && c2 == 'e') 1 << 0
        else if (c0 == 'a' && c1 == 'n' && c2 == 'd') 1 << 1
        else if (c0 == 'f' && c1 == 'o' && c2 == 'r') 1 << 8
        else if (c0 == 'w' && c1 == 'a' && c2 == 's') 1 << 9
        else 0
      case _ =>
        val c2 = lc(s.getByte(st + 2))
        val c3 = lc(s.getByte(st + 3))
        if (c0 == 't' && c1 == 'h' && c2 == 'a' && c3 == 't') 1 << 6
        else 0
    }
  }
}
