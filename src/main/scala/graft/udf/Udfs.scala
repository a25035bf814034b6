package graft.udf

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.{functions => F}

/** UDF / UDAF surface (reference udf.rs:33-95, udaf.rs:34-146).
  *
  * Scalar UDFs: the reference ships Python callables over Arrow batches; on
  * the JVM a plain Spark `udf` is already native code in the executor — no
  * batch bridge exists or is needed, and unlike the reference's Python UDFs
  * (which "do not work" distributed, reference OLDREADME.md:35) these
  * serialize to executors by construction.
  *
  * Volatility (reference utils.rs:34-47): immutable/stable fold at plan
  * time (Spark's default deterministic UDFs); volatile must not be
  * constant-folded → `asNondeterministic`.
  */
object Udfs {

  /** Apply the reference's volatility contract to a Spark UDF. */
  def withVolatility(u: UserDefinedFunction,
                     volatility: String): UserDefinedFunction =
    volatility.toLowerCase match {
      case "immutable" | "stable" => u
      case "volatile"             => u.asNondeterministic()
      case v => throw new IllegalArgumentException(s"unknown volatility $v")
    }

  def udf1[A: reflect.runtime.universe.TypeTag,
           R: reflect.runtime.universe.TypeTag](
      f: A => R, volatility: String = "immutable"): UserDefinedFunction =
    withVolatility(F.udf(f), volatility)

  def udf2[A: reflect.runtime.universe.TypeTag,
           B: reflect.runtime.universe.TypeTag,
           R: reflect.runtime.universe.TypeTag](
      f: (A, B) => R, volatility: String = "immutable"): UserDefinedFunction =
    withVolatility(F.udf(f), volatility)
}

/** UDAF surface: the reference's `Accumulator` protocol — state() / update /
  * merge / evaluate (reference ballista/__init__.py:47-62, udaf.rs:100-146)
  * — is exactly Spark's typed `Aggregator` zero/reduce/merge/finish, so
  * aggregators here implement the idiomatic Spark contract and register via
  * `functions.udaf` (partial aggregation + shuffle merge come from the
  * engine, same partial/merge/final protocol as the reference).
  */
object Udafs {

  /** Geometric mean — the reference documentation's canonical UDAF example
    * shape: a state vector folded with update/merge and finished once. */
  case class GeoMeanBuf(var sumLn: Double, var n: Long)

  object GeometricMean extends Aggregator[Double, GeoMeanBuf, Double] {
    def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
    def reduce(b: GeoMeanBuf, a: Double): GeoMeanBuf = {
      b.sumLn += math.log(a); b.n += 1; b
    }
    def merge(x: GeoMeanBuf, y: GeoMeanBuf): GeoMeanBuf = {
      x.sumLn += y.sumLn; x.n += y.n; x
    }
    def finish(b: GeoMeanBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
    def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Sum of squared deviations via Welford merge — exercises a multi-field
    * state with a non-trivial merge, the same protocol stress the reference
    * tests with its Accumulator examples. */
  case class M2Buf(var n: Long, var mean: Double, var m2: Double)

  object PopulationVariance extends Aggregator[Double, M2Buf, Double] {
    def zero: M2Buf = M2Buf(0L, 0.0, 0.0)
    def reduce(b: M2Buf, x: Double): M2Buf = {
      b.n += 1
      val d = x - b.mean
      b.mean += d / b.n
      b.m2 += d * (x - b.mean)
      b
    }
    def merge(a: M2Buf, b: M2Buf): M2Buf = {
      if (b.n == 0) a
      else if (a.n == 0) b
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        val m2 = a.m2 + b.m2 + d * d * a.n * b.n / n
        M2Buf(n, a.mean + d * b.n / n, m2)
      }
    }
    def finish(b: M2Buf): Double = if (b.n == 0) Double.NaN else b.m2 / b.n
    def bufferEncoder: Encoder[M2Buf] = Encoders.product[M2Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val geometricMean: UserDefinedFunction = F.udaf(GeometricMean)
  val populationVariance: UserDefinedFunction = F.udaf(PopulationVariance)
}
