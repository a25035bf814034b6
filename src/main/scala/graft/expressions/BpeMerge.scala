package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge application (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units", ACL 2016 — the `merge_vocab` step):
  * every leftmost, non-overlapping adjacent occurrence of (left, right) in
  * a symbol array is replaced by the concatenated symbol. A trained model
  * is an ORDERED list of such merges; both the trainer's iteration and the
  * encoder apply them with this same kernel, one pass per merge.
  *
  * The merge pair is part of the expression (a literal per training step),
  * so generated code is a single virtual call against pre-built UTF8String
  * constants — no per-row decoding of the pair. NULL input yields NULL; a
  * null element passes through unchanged (symbols are never null in
  * practice — produced by split). */
case class BpeMerge(child: Expression, left: String, right: String)
    extends UnaryExpression {

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  @transient private lazy val lr = UTF8String.fromString(left + right)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge expects array<string>, got ${other.sql}")
  }

  override def dataType: DataType = child.dataType

  /** Kernel shared by eval and generated code. */
  def merge(arr: ArrayData): ArrayData = {
    if (arr == null) return null
    val n = arr.numElements()
    if (n < 2) return arr
    val out = new Array[AnyRef](n)
    var i = 0
    var o = 0
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (i < n - 1 && cur != null && !arr.isNullAt(i + 1) &&
          cur.equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        out(o) = lr
        i += 2
      } else {
        out(o) = cur
        i += 1
      }
      o += 1
    }
    if (o == n) arr
    else new GenericArrayData(java.util.Arrays.copyOf(out, o))
  }

  override def nullSafeEval(input: Any): Any =
    merge(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerge", this,
      classOf[BpeMerge].getName)
    defineCodeGen(ctx, ev, c => s"$ref.merge($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeMerge = copy(child = newChild)
}
