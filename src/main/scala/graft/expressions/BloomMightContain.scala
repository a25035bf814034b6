package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom sketch (Spark's public
  * `org.apache.spark.util.sketch.BloomFilter`, the same sketch family the
  * engine uses for runtime row-group filters) — the pre-filter kernel of
  * [[graft.operators.Dedup.bloomIncremental]].
  *
  * The serialized sketch ships inside the expression (task binary →
  * executors, exactly once per task set); executors deserialize lazily and
  * probe per row from generated code — a single virtual call, no UDF
  * boxing. Supports the two key shapes the dedup family uses: UTF8 strings
  * (md5 hex fingerprints; probed via the identical byte encoding
  * `putString` used) and 64-bit hashes.
  *
  * Contract: may return true for a key never added (that is what a Bloom
  * filter is); never returns false for an added key. Callers MUST treat
  * `true` as "verify exactly" — see bloomIncremental, whose output is
  * row-identical to the exact anti-join for any fpp.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects string or bigint keys, got ${other.sql}")
  }

  override def dataType: DataType = BooleanType

  /** Probe entry points for both eval and generated code. */
  def test(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)
  def testLong(l: Long): Boolean = bloom.mightContainLong(l)

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => test(s)
    case l: Long       => testLong(l)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // the expression instance itself is the reference object — generated
    // code calls the same lazily-deserialized sketch eval uses
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    val call = child.dataType match {
      case StringType => (c: String) => s"$ref.test($c)"
      case _          => (c: String) => s"$ref.testLong($c)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}
