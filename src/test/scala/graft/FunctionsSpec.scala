package graft

import graft.functions.{Functions => Fx, WindowFns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Golden-value tests for the function registry, focusing on the gap
  * functions and semantics the DuckDB oracle cannot check. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("v")).collect().head.get(0)

  test("sha224/384/512 golden vectors (NIST 'abc')") {
    val df = Seq("abc").toDF("s")
    val r = df.select(
      Fx.sha224($"s"), Fx.sha384($"s"), Fx.sha512($"s")).collect().head
    assert(r.getString(0) ==
      "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(r.getString(1) ==
      "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed" +
      "8086072ba1e7cc2358baeca134c825a7")
    assert(r.getString(2) ==
      "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a" +
      "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f")
  }

  test("digest dispatches by method and rejects unknown") {
    val df = Seq("x").toDF("s")
    assert(df.select(Fx.digest($"s", "md5")).collect().head.getString(0) ==
      "9dd4e461268c8034f5c8564e155c67a6")
    intercept[IllegalArgumentException](Fx.digest($"s", "nope"))
  }

  test("concat skips NULLs (reference semantics), Spark concat would not") {
    val df = Seq(("a", null: String, "b")).toDF("x", "y", "z")
    assert(df.select(Fx.concat($"x", $"y", $"z")).collect()
      .head.getString(0) == "ab")
    // builtin comparison: nulls out
    assert(df.select(concat($"x", $"y", $"z")).collect().head.isNullAt(0))
  }

  test("trunc_numeric truncates toward zero at any scale") {
    val df = Seq((2.789, -2.789)).toDF("p", "n")
    val r = df.select(
      Fx.trunc_numeric($"p", 2), Fx.trunc_numeric($"n", 2),
      Fx.trunc_numeric($"p"), Fx.trunc_numeric($"n")).collect().head
    assert(r.getDouble(0) == 2.78)
    assert(r.getDouble(1) == -2.78)
    assert(r.getDouble(2) == 2.0)
    assert(r.getDouble(3) == -2.0)
  }

  test("date_bin tumbles into stride windows anchored at origin") {
    val df = Seq("2024-03-15 10:37:45", "2024-03-15 10:44:59",
                 "2024-03-15 10:45:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val binned = df.select(Fx.date_bin("15 MINUTE", $"ts",
      lit("2024-01-01 00:00:00").cast("timestamp")).cast("string"))
      .collect().map(_.getString(0))
    assert(binned.toSeq == Seq("2024-03-15 10:30:00", "2024-03-15 10:30:00",
      "2024-03-15 10:45:00"))
  }

  test("date_bin handles sources before the origin (floor, not trunc)") {
    val df = Seq("2023-12-31 23:59:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val b = df.select(Fx.date_bin("1 HOUR", $"ts",
      lit("2024-01-01 00:00:00").cast("timestamp")).cast("string"))
      .collect().head.getString(0)
    assert(b == "2023-12-31 23:00:00")
  }

  test("regexp_match: first-match capture groups, PostgreSQL semantics") {
    val df = Seq("a1b22c333").toDF("s")
    // no capture groups -> [whole first match]
    assert(df.select(Fx.regexp_match($"s", "\\d+")).collect()
      .head.getSeq[String](0) == Seq("1"))
    // capture groups -> groups of the FIRST match only
    assert(df.select(Fx.regexp_match($"s", "([a-z])(\\d+)")).collect()
      .head.getSeq[String](0) == Seq("a", "1"))
    // no match -> NULL (not empty array)
    assert(df.select(Fx.regexp_match($"s", "z(\\d+)")).collect().head.isNullAt(0))
  }

  test("regexp_match_all returns every whole-pattern match") {
    val df = Seq("a1b22c333").toDF("s")
    assert(df.select(Fx.regexp_match_all($"s", "\\d+")).collect()
      .head.getSeq[String](0) == Seq("1", "22", "333"))
  }

  test("byName regexp_match / trunc-with-digits registry forms") {
    val df = Seq(("a1b22", -3.567)).toDF("s", "d")
    assert(df.select(Fx.byName("regexp_match", $"s", lit("([a-z])(\\d+)")))
      .collect().head.getSeq[String](0) == Seq("a", "1"))
    assert(df.select(Fx.byName("trunc", $"d", lit(2))).collect()
      .head.getDouble(0) == -3.56)
  }

  test("split_part / left / right / strpos / substr parity basics") {
    val df = Seq("one#two#three").toDF("s")
    val r = df.select(
      Fx.split_part($"s", "#", 2),
      Fx.left($"s", 3), Fx.right($"s", 5),
      Fx.strpos($"s", "two"), Fx.substr($"s", 5, 3)).collect().head
    assert(r.getString(0) == "two")
    assert(r.getString(1) == "one")
    assert(r.getString(2) == "three")
    assert(r.getInt(3) == 5)
    assert(r.getString(4) == "two")
  }

  test("replace is literal, not regex") {
    val df = Seq("a.b.c").toDF("s")
    assert(df.select(Fx.replace($"s", ".", "-")).collect()
      .head.getString(0) == "a-b-c")
  }

  test("from_unixtime returns a timestamp (reference type contract)") {
    val df = Seq(86400L).toDF("t")
    val r = df.select(Fx.from_unixtime($"t").cast("string")).collect().head
    assert(r.getString(0) == "1970-01-02 00:00:00")
  }

  test("current_time formats HH:mm:ss") {
    val s = one(Fx.current_time()).toString
    assert(s.matches("\\d{2}:\\d{2}:\\d{2}"))
  }

  test("in_list with negation") {
    val df = Seq("a", "b", "c").toDF("s")
    assert(df.filter(Fx.in_list($"s", Seq("a", "c"))).count() == 2)
    assert(df.filter(Fx.in_list($"s", Seq("a", "c"), negated = true))
      .count() == 1)
  }

  test("byName resolves registry and falls through to builtins") {
    val df = Seq((-3.5, "xy")).toDF("d", "s")
    assert(df.select(Fx.byName("abs", $"d")).collect().head.getDouble(0)
      == 3.5)
    assert(df.select(Fx.byName("upper", $"s")).collect().head.getString(0)
      == "XY")
    assert(df.select(Fx.byName("trunc", $"d")).collect().head.getDouble(0)
      == -3.0)
  }

  test("window resolver: ranking + aggregate over same spec") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 5)).toDF("g", "v")
    val out = df.select($"g", $"v",
      WindowFns.window("row_number", Nil, Seq($"g"), Seq($"v")).as("rn"),
      WindowFns.window("sum", Seq($"v"), Seq($"g"), Nil).as("s"))
      .orderBy($"g", $"v").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getInt(2),
      r.getLong(3))).toSeq ==
      Seq(("a", 1, 1, 6L), ("a", 2, 2, 6L), ("a", 3, 3, 6L),
          ("b", 5, 1, 5L)))
  }

  test("arrow_typeof analog") {
    assert(one(Fx.arrow_typeof(lit(1L))).toString == "bigint")
  }
}
