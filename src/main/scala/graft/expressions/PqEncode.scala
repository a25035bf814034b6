package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoder (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): splits a dim-length vector into
  * `m` contiguous subvectors of `dsub` dims and maps each to the index of
  * its nearest codebook centroid (L2, ties to the lowest index) — the
  * dim×4-byte float embedding becomes m small codes.
  *
  * One fused loop over m × ksub × dsub per row, generated code makes a
  * single virtual call against the reference-held flat codebook — no
  * per-row allocation beyond the m-length code array. The codebook layout
  * is `[(s * ksub + j) * dsub + d]` (subspace-major).
  *
  * NULL for NULL input, a length mismatch (≠ m·dsub), or a null element —
  * the same propagate-never-truncate contract as VectorCosine.
  */
case class PqEncode(child: Expression, codebook: Array[Double],
                    m: Int, ksub: Int, dsub: Int) extends UnaryExpression {

  require(codebook.length == m * ksub * dsub,
    s"codebook length ${codebook.length} != m*ksub*dsub (${m * ksub * dsub})")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  private val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Kernel shared by eval and generated code. Returns null on contract
    * violations (wrong length / null element). */
  def encode(arr: ArrayData): GenericArrayData = {
    if (arr == null || arr.numElements() != m * dsub) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        var dist = 0.0
        var d = 0
        while (d < dsub) {
          val i = s * dsub + d
          if (arr.isNullAt(i)) return null
          val x = if (elemIsFloat) arr.getFloat(i).toDouble
                  else arr.getDouble(i)
          val diff = x - codebook((s * ksub + j) * dsub + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestD) { bestD = dist; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncoder", this,
      classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.encode($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}
