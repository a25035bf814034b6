package graft

import graft.expressions.GopherSignals
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GopherSignals must be VALUE-IDENTICAL to the composed five-expression
  * battery it replaced in Curation.gopherFilters (split + aggregate HOF +
  * filter-HOF-with-rlike + three splits + regexp_extract_all) — raw
  * signal by raw signal, across targeted edge vectors and a fuzzed
  * corpus, through the DataFrame (codegen) path. The composed form is
  * reconstructed HERE as the oracle so the equivalence stays pinned even
  * though production no longer runs it. */
class GopherSignalsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r8 composed battery, verbatim signal definitions. */
  private def composed(df: DataFrame): DataFrame = {
    val nWords = greatest(size(col("__toks")), lit(1)).cast("double")
    df.withColumn("__toks", split(trim(col("s")), "\\s+"))
      .withColumn("c_n_words", size(col("__toks")))
      .withColumn("c_sum_len",
        expr("aggregate(__toks, 0L, (a, x) -> a + length(x))"))
      .withColumn("c_n_alpha",
        expr("size(filter(__toks, x -> x rlike '[a-zA-Z]'))"))
      .withColumn("c_n_symbols",
        size(split(col("s"), "#", -1)) - 1 +
          size(split(col("s"), "\\.\\.\\.", -1)) - 1 +
          size(split(col("s"), "…", -1)) - 1)
      .withColumn("c_n_stop", size(array_distinct(regexp_extract_all(
        lower(col("s")),
        lit("\\b(the|and|of|to|in|is|that|it|for|was)\\b"), lit(0)))))
      .drop("__toks")
  }

  private def check(docs: Seq[String]): Unit = {
    val rows = composed(docs.toDF("s"))
      .withColumn("g", GopherSignals(col("s")))
      .select(col("s"),
        col("c_n_words"), col("g.n_words"),
        col("c_sum_len"), col("g.sum_word_len"),
        col("c_n_alpha"), col("g.n_alpha"),
        col("c_n_symbols"), col("g.n_symbols"),
        col("c_n_stop"), col("g.n_stop"))
      .collect()
    rows.foreach { r =>
      val in = r.getString(0)
      assert(r.getInt(1) == r.getInt(2),
        s"n_words: ${in.map(_.toInt).mkString(",")}")
      assert(r.getLong(3) == r.getLong(4),
        s"sum_word_len: ${in.map(_.toInt).mkString(",")}")
      assert(r.getInt(5) == r.getInt(6),
        s"n_alpha: ${in.map(_.toInt).mkString(",")}")
      assert(r.getInt(7) == r.getInt(8),
        s"n_symbols: ${in.map(_.toInt).mkString(",")}")
      assert(r.getInt(9) == r.getInt(10),
        s"n_stop: ${in.map(_.toInt).mkString(",")}")
    }
  }

  test("edge vectors match the composed battery") {
    check(Seq(
      "", " ", "  ", "\t", "\n", " \t ", "a", " a ", "a  b",
      "\ta b\t", "a\tb\nc", "héllo wörld …", "#", "##", "#.#",
      "...", "....", ".....", "......", ".......", "..", ". . .",
      "a...b...c", "#...#…", "… … …", "x#y", "the", "The", "THE",
      "the the the", "the and of to in is that it for was",
      "athe", "the9", "_the", "the_", "9the", "the-and", "the.and",
      "that's it", "to-do", "in,of", "was!", "foR WaS tHaT",
      "forward toward wasp theme android", // stopwords as prefixes only
      "é the é", "the…and", "日本語 the 中文", "ｔｈｅ", // fullwidth ≠ ascii
      " \tx ", "x\t ", "\r", "x\r\ny", "　the　")) // ideographic space not \s
  }

  test("fuzzed corpus matches the composed battery exactly") {
    val rnd = new scala.util.Random(4242)
    val words = Seq("the", "and", "of", "to", "in", "is", "that", "it",
      "for", "was", "dog", "cat", "a", "x9", "_y", "é", "...", "#",
      "…", "..", "w.r.t", "e.g...", "##the##", "the...and")
    val seps = Seq(" ", "  ", "\t", "\n", " \t", "\f", "\r\n")
    val docs = (1 to 3000).map { _ =>
      val n = rnd.nextInt(12)
      val body = (1 to n)
        .map(_ => words(rnd.nextInt(words.length)))
        .mkString(seps(rnd.nextInt(seps.length)))
      val pre = if (rnd.nextBoolean()) seps(rnd.nextInt(seps.length)) else ""
      val post = if (rnd.nextBoolean()) seps(rnd.nextInt(seps.length)) else ""
      pre + body + post
    }
    check(docs)
  }

  test("null text yields a null struct") {
    val r = Seq[(Integer, String)]((1, null)).toDF("id", "s")
      .select(GopherSignals(col("s")).as("g")).collect()
    assert(r.head.isNullAt(0))
  }
}
