package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Cosine of the input vector against EVERY centroid of a fixed coarse
  * quantizer, as one `array<double>` (index = centroid id) — the scale
  * regime of IVF assignment/probing (Similarity.centroidScores).
  *
  * Why a custom Expression (SURVEY §7 preference order (b)): for
  * corpus-sized cell counts the two composable forms both collapse —
  * per-centroid [[VectorCosine]] literal expansion generates janino code
  * roughly quadratic in nlist and falls off whole-stage codegen past ~64
  * cells, and the higher-order-function form
  * (`transform(centroids, c -> aggregate(zip_with(...)))`) pays an
  * interpreted-lambda invocation per ELEMENT — the round-7 scale probe
  * measured 132 s to assign 20k vectors to 313 cells that way. This
  * kernel is a flat row-major double matrix walked in one compiled loop:
  * the same assignment runs in well under a second.
  *
  * The centroid matrix rides in the expression as a flat row-major array
  * (nlist × dim doubles) — plan size O(1), serialized once per task.
  * CodegenFallback is deliberate: the per-ROW dispatch overhead is
  * irrelevant next to the nlist×dim inner loop, which is compiled Scala
  * either way, and skipping doGenCode keeps the janino method size
  * independent of nlist (the exact failure mode this kernel exists to
  * avoid).
  *
  * Numeric contract: dot and norms accumulate in double, elements
  * left-to-right, cosine = dot/(|v|·|c|) with 0.0 when either norm is 0
  * (matching the driver-side `cosArr` the k-means trainer uses, so
  * assignment and training agree on degenerate vectors). A null input
  * vector yields NULL; a null ELEMENT or a length ≠ dim yields NULL (the
  * caller contracts fixed-dim non-null embeddings — anything else must
  * surface, not silently mis-assign). */
case class CentroidCosines(child: Expression, flat: Array[Double], dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim > 0 && flat.length % dim == 0,
    s"flat centroid matrix length ${flat.length} not a multiple of dim $dim")
  private val nlist = flat.length / dim

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_cosines"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"centroid_cosines expects array<float|double>, got ${t.sql}")
    }

  // lazy: touching child.dataType at construction blows up on unresolved
  // attributes (the expression is built before analysis)
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  // centroid norms, computed once per (deserialized) expression instance
  @transient private lazy val cnorm: Array[Double] = {
    val out = new Array[Double](nlist)
    var i = 0
    while (i < nlist) {
      var s = 0.0
      var j = 0
      val off = i * dim
      while (j < dim) { val x = flat(off + j); s += x * x; j += 1 }
      out(i) = math.sqrt(s)
      i += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    val vec = new Array[Double](dim)
    var vn = 0.0
    var j = 0
    while (j < dim) {
      if (a.isNullAt(j)) return null
      val x = if (elemIsFloat) a.getFloat(j).toDouble else a.getDouble(j)
      vec(j) = x; vn += x * x
      j += 1
    }
    vn = math.sqrt(vn)
    val out = new Array[Double](nlist)
    var i = 0
    while (i < nlist) {
      var dot = 0.0
      var k = 0
      val off = i * dim
      while (k < dim) { dot += flat(off + k) * vec(k); k += 1 }
      val d = vn * cnorm(i)
      out(i) = if (d == 0) 0.0 else dot / d
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CentroidCosines = copy(child = newChild)
}
