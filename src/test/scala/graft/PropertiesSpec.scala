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
}
