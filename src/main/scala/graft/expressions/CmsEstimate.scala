package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency probe against a pre-built Count-Min sketch (Spark's public
  * `org.apache.spark.util.sketch.CountMinSketch`) — the heavy-hitter /
  * approximate-frequency counterpart of [[BloomMightContain]], completing
  * the mergeable-sketch state family (HLL = distinct counts, Bloom =
  * membership, CMS = frequencies). The serialized sketch ships inside the
  * expression; executors deserialize lazily and probe from generated code.
  *
  * Contract: never underestimates; overestimates by at most ε·N with
  * probability ≥ confidence (both chosen at build time). String keys probe
  * via the same `String` encoding `CountMinSketch.add` uses. */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects string or bigint keys, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  def estimate(s: UTF8String): Long = cms.estimateCount(s.toString)
  def estimateLong(l: Long): Long = cms.estimateCount(l)

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => estimate(s)
    case l: Long       => estimateLong(l)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this,
      classOf[CmsEstimate].getName)
    val call = child.dataType match {
      case StringType => (c: String) => s"$ref.estimate($c)"
      case _          => (c: String) => s"$ref.estimateLong($c)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsEstimate = copy(child = newChild)
}
