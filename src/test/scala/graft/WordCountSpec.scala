package graft

import graft.expressions.WordCount
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** WordCount must be VALUE-IDENTICAL to size(split(trim(c), "\s+")) —
  * the repo-wide token-count idiom it replaces in hot paths — across
  * edge vectors (leading/trailing/pure whitespace, empties, multibyte,
  * non-\s Unicode spaces) and a fuzzed corpus, through the DataFrame
  * (codegen) path and the static kernel alike. */
class WordCountSpec extends SparkSpec {
  import spark.implicits._

  private def splitForm(s: String): Int =
    s.replaceAll("^ +", "").replaceAll(" +$", "").split("\\s+", -1).length

  private val vectors = Seq(
    "", " ", "  ", "\t", "\n", " \t ", "a", " a ", "a b", "  a  b  ",
    "\ta b\t", "a\tb\nc", "héllo wörld", "a b", // NBSP is NOT \s
    "　x", // ideographic space is NOT \s in default Java regex
    "one", "one two three", "\r", "x\r\ny", " \tx ", "x\t ")

  test("vectors match the split composition (DataFrame codegen path)") {
    val df = vectors.toDF("s")
    val got = df.select(WordCount(col("s")).as("wc"),
        size(split(trim(col("s")), "\\s+")).as("sp"))
      .collect()
    got.zip(vectors).foreach { case (r, v) =>
      assert(r.getInt(0) == r.getInt(1), s"input ${v.map(_.toInt)}")
    }
  }

  test("fuzzed corpus matches the split composition exactly") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab \t\n\f\rxé "
    val docs = (1 to 2000).map { _ =>
      val len = rnd.nextInt(30)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val bad = docs.toDF("s")
      .select(col("s"), WordCount(col("s")).as("wc"),
        size(split(trim(col("s")), "\\s+")).as("sp"))
      .filter(col("wc") =!= col("sp"))
      .collect()
    assert(bad.isEmpty,
      bad.take(3).map(r => r.getString(0).map(_.toInt)).mkString(" | "))
  }

  test("static kernel agrees with the interpreted reference") {
    vectors.foreach { v =>
      assert(WordCount.count(UTF8String.fromString(v)) == splitForm(v),
        s"kernel on ${v.map(_.toInt)}")
    }
  }

  test("null flows through") {
    val got = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "s")
      .select(WordCount(col("s"))).collect()
    assert(got.head.isNullAt(0))
  }
}
