package graft.expressions

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair (the ftfy-style fix for UTF-8 text decoded as
  * Latin-1 — "café" → "cafÃ©", the most common encoding corruption in
  * web crawls) as a native expression. A built-in
  * `decode(encode(c, "ISO-8859-1"), "UTF-8")` chain cannot express the
  * GUARD: Spark 4's `decode` throws MALFORMED_CHARACTER_CODING on
  * invalid bytes instead of yielding U+FFFD, so genuine Latin-1 text
  * would kill the job rather than pass through. This expression decodes
  * STRICTLY and treats failure as "not mojibake":
  *
  * repair applies iff (a) every char is ≤ 0xFF (pure Latin-1 image),
  * (b) at least one char is ≥ 0x80 (something to repair), and (c) the
  * chars-as-bytes form STRICTLY valid UTF-8. Otherwise the input passes
  * through byte-identical. Deterministic, partition-local, no throw. */
case class MojibakeRepair(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fix_mojibake expects string, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MojibakeRepair.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MojibakeRepair.repair($c);")

  override protected def withNewChildInternal(
      newChild: Expression): MojibakeRepair = copy(child = newChild)
}

object MojibakeRepair {

  /** Column form. */
  def apply(c: Column): Column = ColumnBridge.column(
    MojibakeRepair(ColumnBridge.expression(c)))

  /** Static kernel, called from interpreted eval and generated code. */
  def repair(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    var hasHigh = false
    var i = 0
    while (i < n) {
      val ch = str.charAt(i)
      if (ch > 0xFF) return s // not a Latin-1 image — cannot be this bug
      if (ch >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s // pure ASCII — nothing to repair
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) { bytes(i) = str.charAt(i).toByte; i += 1 }
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val repaired = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      UTF8String.fromString(repaired)
    } catch {
      case _: CharacterCodingException => s // genuine Latin-1 — keep
    }
  }
}
