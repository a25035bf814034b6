package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace token count as a single-pass byte-scan expression —
  * value-identical to `size(split(trim(c), "\\s+"))` (the repo-wide token
  * count idiom) with NONE of that composition's work: no regex NFA, no
  * per-row UTF8String[] allocation, no array materialization. On the text
  * battery the split form allocates one array element per token per row;
  * this is a read-only scan of the UTF8String's bytes.
  *
  * Exact semantics replicated (proven equal on fuzzed corpora in
  * WordCountSpec):
  *  - `trim` strips 0x20 SPACES only (Spark's StringTrim default);
  *  - Java `split("\\s+", -1)` emits a LEADING empty token when the
  *    trimmed string starts with non-space whitespace (\t \n \x0B \f \r),
  *    and a TRAILING empty token when it ends with one — both counted;
  *  - the empty trimmed string yields [""], i.e. count 1.
  * Whitespace membership is Java-regex `\s` = [ \t\n\x0B\f\r] — all
  * ASCII, so a byte scan is UTF-8-correct (continuation bytes ≥ 0x80
  * never match).
  */
case class WordCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_count expects string, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    WordCount.count(s)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WordCount.count($c);")

  override protected def withNewChildInternal(
      newChild: Expression): WordCount = copy(child = newChild)
}

object WordCount {

  /** Column form: `wordCount(c)` ≡ `size(split(trim(c), "\\s+"))`. */
  def apply(c: Column): Column = ColumnBridge.column(
    WordCount(ColumnBridge.expression(c)))

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c ||
      b == 0x0d

  /** Static kernel, called from both interpreted eval and generated code. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    // trim: first/last byte that is not 0x20
    var start = 0
    while (start < n && s.getByte(start) == 0x20) start += 1
    var end = n - 1
    while (end >= start && s.getByte(end) == 0x20) end -= 1
    if (start > end) return 1 // empty trimmed string -> [""]
    var runs = 0
    var inRun = false
    var i = start
    while (i <= end) {
      if (isWs(s.getByte(i))) inRun = false
      else if (!inRun) { runs += 1; inRun = true }
      i += 1
    }
    runs + (if (isWs(s.getByte(start))) 1 else 0) +
      (if (isWs(s.getByte(end))) 1 else 0)
  }
}
