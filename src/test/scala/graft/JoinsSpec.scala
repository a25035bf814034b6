package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** The seven join types of the reference binding (dataframe.rs:132-163),
  * including the error contract for unknown types and right_semi's
  * output-side semantics. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("lk", "lv")
  private lazy val r = Seq((2, "x"), (3, "y"), (4, "z")).toDF("rk", "rv")

  private def rows(how: String): Set[Seq[Any]] =
    Joins.join(l, r, Seq("lk"), Seq("rk"), how)
      .collect().map(_.toSeq.toVector.toSeq).toSet

  test("inner") {
    assert(rows("inner") == Set(Seq(2, "b", 2, "x"), Seq(3, "c", 3, "y")))
  }
  test("left") {
    assert(rows("left") == Set(Seq(1, "a", null, null),
      Seq(2, "b", 2, "x"), Seq(3, "c", 3, "y")))
  }
  test("right") {
    assert(rows("right") == Set(Seq(2, "b", 2, "x"), Seq(3, "c", 3, "y"),
      Seq(null, null, 4, "z")))
  }
  test("full") {
    assert(rows("full") == Set(Seq(1, "a", null, null), Seq(2, "b", 2, "x"),
      Seq(3, "c", 3, "y"), Seq(null, null, 4, "z")))
  }
  test("semi keeps only left columns") {
    assert(rows("semi") == Set(Seq(2, "b"), Seq(3, "c")))
  }
  test("anti keeps only non-matching left rows") {
    assert(rows("anti") == Set(Seq(1, "a")))
  }
  test("right_semi keeps only right columns of matching rows") {
    assert(rows("right_semi") == Set(Seq(2, "x"), Seq(3, "y")))
  }
  test("unknown join type raises the reference's error message") {
    val e = intercept[IllegalArgumentException](rows("sideways"))
    assert(e.getMessage.contains("does not exist or is not implemented"))
  }
  test("multi-key join") {
    val l2 = Seq((1, 10, "a"), (1, 20, "b")).toDF("k1", "k2", "v")
    val r2 = Seq((1, 10, "p"), (1, 30, "q")).toDF("j1", "j2", "w")
    val out = Joins.join(l2, r2, Seq("k1", "k2"), Seq("j1", "j2"), "inner")
      .collect()
    assert(out.length == 1 && out.head.getString(2) == "a")
  }
  test("joinOn supports non-equi conditions") {
    val out = Joins.joinOn(l, r, l("lk") < r("rk"), "inner").count()
    assert(out == 6) // (1,a)x3 + (2,b)x2 + (3,c)x1
  }
  test("crossJoin") {
    assert(Joins.crossJoin(l, r).count() == 9)
  }
}
