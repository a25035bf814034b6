package graft

import graft.udf.{Udafs, Udfs}
import org.apache.spark.sql.functions._

/** UDF/UDAF surface: volatility contract, Aggregator partial/merge/final
  * protocol (reference udf.rs, udaf.rs, utils.rs:34-47). */
class UdfSpec extends SparkSpec {
  import spark.implicits._

  test("scalar udf1/udf2 compute and serialize") {
    val plus = Udfs.udf1((x: Int) => x + 10)
    val cat = Udfs.udf2((a: String, b: String) => a + b)
    val df = Seq((1, "x"), (2, "y")).toDF("n", "s")
    val out = df.select(plus($"n").as("p"), cat($"s", lit("!")).as("c"))
      .orderBy($"p").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(11, 12))
    assert(out.map(_.getString(1)).toSeq == Seq("x!", "y!"))
  }

  test("volatile udf is non-deterministic; immutable/stable stay foldable") {
    val f = (x: Int) => x
    assert(!Udfs.udf1(f, "volatile").deterministic)
    assert(Udfs.udf1(f, "immutable").deterministic)
    assert(Udfs.udf1(f, "stable").deterministic)
    intercept[IllegalArgumentException](Udfs.udf1(f, "sometimes"))
  }

  test("geometric mean matches closed form") {
    val df = Seq(2.0, 8.0).toDF("v")
    val g = df.agg(Udafs.geometricMean($"v")).collect().head.getDouble(0)
    assert(math.abs(g - 4.0) < 1e-12)
  }

  test("geometric mean distributes over partitions (merge path)") {
    val df = spark.range(1, 101).select($"id".cast("double").as("v"))
      .repartition(7)
    val g = df.agg(Udafs.geometricMean($"v")).collect().head.getDouble(0)
    val expected = math.exp((1 to 100).map(i => math.log(i)).sum / 100.0)
    assert(math.abs(g - expected) / expected < 1e-12)
  }

  test("population variance matches Spark builtin (Welford merge path)") {
    val df = spark.range(0, 1000)
      .select(($"id" % 37).cast("double").as("v")).repartition(5)
    val ours = df.agg(Udafs.populationVariance($"v")).collect()
      .head.getDouble(0)
    val builtin = df.agg(var_pop($"v")).collect().head.getDouble(0)
    assert(math.abs(ours - builtin) < 1e-9)
  }

  test("udaf groups independently") {
    val df = Seq(("a", 2.0), ("a", 8.0), ("b", 3.0)).toDF("g", "v")
    val out = df.groupBy($"g").agg(Udafs.geometricMean($"v").as("gm"))
      .orderBy($"g").collect()
    assert(math.abs(out(0).getDouble(1) - 4.0) < 1e-12)
    assert(math.abs(out(1).getDouble(1) - 3.0) < 1e-12)
  }
}
