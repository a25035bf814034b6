package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Expression-algebra invariants (SURVEY.md §5 test plan item 4):
  * plan-level identities that must hold for any data. Uses raw scalacheck
  * generators with fixed seeds (scalatestplus bridge is not a dependency). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val smallInts = Gen.listOfN(30, Gen.chooseNum(-50, 50))

  private def cases[A](g: Gen[A], n: Int = 12): Seq[A] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(42L + i)))

  test("filter(p).filter(q) == filter(p && q)") {
    cases(smallInts).foreach { xs =>
      val df = xs.toDF("x")
      val a = df.filter($"x" > 0).filter($"x" % 2 === 0)
        .collect().map(_.getInt(0)).sorted.toSeq
      val b = df.filter($"x" > 0 && $"x" % 2 === 0)
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(a == b)
    }
  }

  test("sort asc_nulls_first puts nulls first; desc_nulls_last puts them last") {
    cases(smallInts).filter(_.nonEmpty).foreach { xs =>
      val df = xs.toDF("x").select(nullif($"x", lit(0)).as("v"))
      val ascF = df.orderBy($"v".asc_nulls_first).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getInt(0)))
      val nNull = ascF.count(_.isEmpty)
      assert(ascF.take(nNull).forall(_.isEmpty))
      assert(ascF.drop(nNull).flatten.toSeq ==
        ascF.drop(nNull).flatten.toSeq.sorted)
      val descL = df.orderBy($"v".desc_nulls_last).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getInt(0)))
      assert(descL.takeRight(nNull).forall(_.isEmpty))
    }
  }

  test("cast int→long→int round-trips") {
    cases(smallInts).foreach { xs =>
      val df = xs.toDF("x")
      val back = df.select($"x".cast("long").cast("int").as("x"))
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(back == xs.sorted)
    }
  }

  test("limit(n) returns min(n, count) rows") {
    val gn = Gen.chooseNum(0, 40)
    cases(Gen.zip(smallInts, gn)).foreach { case (xs, n) =>
      val df = xs.toDF("x")
      assert(df.limit(n).count() == math.min(n, xs.length))
    }
  }

  test("union symmetry of counts and except-self emptiness") {
    cases(smallInts).foreach { xs =>
      val df = xs.toDF("x")
      assert(df.union(df).count() == 2L * xs.length)
      assert(df.except(df).count() == 0L)
    }
  }

  test("distinct is idempotent and bounded by count") {
    cases(smallInts).foreach { xs =>
      val df = xs.toDF("x")
      val d1 = df.distinct()
      assert(d1.count() == d1.distinct().count())
      assert(d1.count() == xs.distinct.length)
    }
  }

  test("regexp_match equals the java.util.regex reference on random strings") {
    import graft.functions.{Functions => Fx}
    // reference implementation of the PostgreSQL contract: capture groups
    // of the first match (whole match when no groups), null when no match
    def reference(s: String, pattern: String): Option[Seq[String]] = {
      val m = java.util.regex.Pattern.compile(pattern).matcher(s)
      if (!m.find()) None
      else if (m.groupCount() == 0) Some(Seq(m.group(0)))
      else Some((1 to m.groupCount()).map(g => Option(m.group(g)).getOrElse("")))
    }
    val alphabet = Gen.oneOf('a', 'b', 'c', '1', '2', ' ', '#')
    val strs = Gen.listOfN(12, alphabet).map(_.mkString)
    val patterns = Seq("(a+)(b*)", "c+1", "(\\d)(\\d)", "b(c)?1", "z+",
      "([ab]+)#?(\\d*)")
    patterns.foreach { p =>
      val inputs = cases(strs, 20)
      val df = inputs.toDF("s")
      val got = df.select(Fx.regexp_match($"s", p)).collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getSeq[String](0).toSeq))
      inputs.zip(got).foreach { case (s, g) =>
        assert(g == reference(s, p), s"input '$s' pattern '$p'")
      }
    }
  }

  test("blake2b/blake2s distinct and length-stable across block boundaries") {
    import graft.expressions.Blake2
    // exercise lengths straddling every block boundary of both variants
    val lens = Seq(0, 1, 63, 64, 65, 127, 128, 129, 255, 256, 300)
    val inputs = lens.map(n => Array.tabulate[Byte](n)(i => (i % 251).toByte))
    val b2b = inputs.map(Blake2.blake2b(_).toSeq)
    val b2s = inputs.map(Blake2.blake2s(_).toSeq)
    assert(b2b.forall(_.length == 64) && b2s.forall(_.length == 32))
    assert(b2b.distinct.length == b2b.length) // no boundary collisions
    assert(b2s.distinct.length == b2s.length)
    // determinism across repeated evaluation
    assert(b2b == inputs.map(Blake2.blake2b(_).toSeq))
  }

  test("trunc_numeric matches BigDecimal truncation toward zero") {
    import graft.functions.{Functions => Fx}
    val vals = Seq(-3.567, -0.5, -0.04, 0.0, 0.04, 0.5, 3.567, 123.456,
      -123.456)
    for (digits <- 0 to 3) {
      val df = vals.toDF("d")
      val got = df.select(Fx.trunc_numeric($"d", digits)).collect()
        .map(_.getDouble(0))
      val want = vals.map(v => BigDecimal(v)
        .setScale(digits, BigDecimal.RoundingMode.DOWN).toDouble)
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"digits=$digits got=$g want=$w")
      }
    }
  }
}
