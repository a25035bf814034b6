package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** Temporal operators: asofJoin parity vs a brute-force theta-join
  * formulation (including tie and no-match cases), and rangeJoinBinned
  * parity vs Spark's own non-equi join across bin-boundary cases. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, "a", 100L), (2L, "a", 205L), (3L, "a", 300L),
    (4L, "b", 50L), (5L, "b", 500L),
    (6L, "c", 10L) // key with no right rows at all
  ).toDF("id", "k", "t")

  private val right = Seq(
    ("a", 100L, 1.0), ("a", 200L, 2.0), ("a", 310L, 3.0),
    ("b", 60L, 4.0), ("b", 400L, 5.0)
  ).toDF("k", "rt", "v")

  test("asofJoinNearest: minimal |gap| per key, ties to backward, " +
    "tolerance caps the winning gap") {
    def run(tol: Option[Long]) =
      Temporal.asofJoinNearest(left, right, Seq("k"), "t", "rt", tol)
        .select("id", "matched_rt")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    // hand: 100→100 (exact), 205→200 (5 vs 105), 300→310 (10 vs 100),
    // 50→60 (forward only), 500→400, key c → null
    assert(run(None) == Map(1L -> 100L, 2L -> 200L, 3L -> 310L,
      4L -> 60L, 5L -> 400L, 6L -> null))
    // tolerance 5: only the exact and the gap-5 matches survive
    assert(run(Some(5L)) == Map(1L -> 100L, 2L -> 200L, 3L -> null,
      4L -> null, 5L -> null, 6L -> null))
    // brute force on a fuzzed set: nearest with backward ties
    val rnd = new scala.util.Random(11)
    val fl = (1L to 300L).map(i => (i, s"k${rnd.nextInt(5)}",
      rnd.nextInt(1000).toLong)).toDF("id", "k", "t")
    val fr = (1L to 200L).map(i => (s"k${rnd.nextInt(6)}",
      rnd.nextInt(1000).toLong, i.toDouble))
      .distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      .toDF("k", "rt", "v")
    val got = Temporal.asofJoinNearest(fl, fr, Seq("k"), "t", "rt")
      .select("id", "matched_rt").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    val rightRows = fr.collect().map(r => (r.getString(0), r.getLong(1)))
    val leftRows = fl.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    leftRows.foreach { case (id, k, t) =>
      val cands = rightRows.filter(_._1 == k).map(_._2)
      val want = if (cands.isEmpty) None
        else {
          val minGap = cands.map(rt => math.abs(rt - t)).min
          val tied = cands.filter(rt => math.abs(rt - t) == minGap)
          Some(if (tied.exists(_ <= t)) tied.filter(_ <= t).max
               else tied.min)
        }
      assert(got(id) == want, s"row $id key $k t $t")
    }
  }

  test("asofJoin/asofJoinNearest: NULL payload fields of the matched " +
    "right row stay null (no backfill from an older right row)") {
    // right row at 200 has v = null; a left probe at 205 must match the
    // 200 row and surface matched_v = NULL — a per-column last() would
    // silently pull v = 1.0 from the OLDER row at 100, mixing rows
    val l = Seq((1L, "a", 205L), (2L, "a", 105L)).toDF("id", "k", "t")
    val r = Seq(("a", 100L, Some(1.0)), ("a", 200L, None))
      .toDF("k", "rt", "v")
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val m = df.select("id", "matched_rt", "matched_v").collect()
        .map(x => x.getLong(0) -> ((x.getLong(1),
          if (x.isNullAt(2)) None else Some(x.getDouble(2))))).toMap
      assert(m(1L) == ((200L, None)), s"null field backfilled: $m")
      assert(m(2L) == ((100L, Some(1.0))))
    }
    check(Temporal.asofJoin(l, r, Seq("k"), "t", "rt"))
    check(Temporal.asofJoinNearest(l, r, Seq("k"), "t", "rt"))
  }

  test("asofJoin backward matches brute-force most-recent-at-or-before") {
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", "rt")
      .select("id", "matched_rt", "matched_v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    // brute force: join all right rows with rt <= t, keep max rt per left id
    val brute = left.join(right,
        left("k") === right("k") && col("rt") <= col("t"), "left")
      .groupBy(col("id")).agg(max(struct(col("rt"), col("v"))).as("m"))
      .select(col("id"), col("m.rt"), col("m.v"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got == brute)
    // tie: left t=100 matches right rt=100 (inclusive)
    assert(got.contains((1L, 100L, 1.0)))
    // no right rows for key c -> null match survives (left-outer)
    assert(got.contains((6L, null, null)))
  }

  test("asofJoin forward matches brute-force earliest-at-or-after") {
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", "rt",
        direction = "forward")
      .select("id", "matched_rt", "matched_v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    val brute = left.join(right,
        left("k") === right("k") && col("rt") >= col("t"), "left")
      .groupBy(col("id")).agg(min(struct(col("rt"), col("v"))).as("m"))
      .select(col("id"), col("m.rt"), col("m.v"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got == brute)
    // t=500 for key b has no later right row -> null
    assert(got.contains((5L, null, null)))
  }

  test("asofJoin tolerance nulls out matches beyond the gap cap") {
    // key a: t=205 matches rt=200 (gap 5, inside tol 10);
    //        t=300 matches rt=200 (gap 100 -> nulled)
    val got = Temporal.asofJoin(left, right, Seq("k"), "t", "rt",
        toleranceUs = Some(10L))
      .select("id", "matched_rt", "matched_v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got.contains((2L, 205L - 5L, 2.0)))
    assert(got.contains((3L, null, null)))
    assert(got.contains((1L, 100L, 1.0))) // gap 0 kept
    // forward with tolerance: t=205 -> rt=310 is 105 away -> nulled
    val fwd = Temporal.asofJoin(left, right, Seq("k"), "t", "rt",
        direction = "forward", toleranceUs = Some(10L))
      .select("id", "matched_rt")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toSet
    assert(fwd.contains((2L, null)))
    assert(fwd.contains((3L, 310L))) // gap 10 inclusive
  }

  test("asofJoin supports composite by-keys") {
    val l2 = Seq((1L, "a", 1, 100L), (2L, "a", 2, 100L))
      .toDF("id", "k1", "k2", "t")
    val r2 = Seq(("a", 1, 90L, 1.0), ("a", 2, 95L, 2.0))
      .toDF("k1", "k2", "rt", "v")
    val got = Temporal.asofJoin(l2, r2, Seq("k1", "k2"), "t", "rt")
      .select("id", "matched_v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // same k1, different k2 -> each left row matches its own k2's right row
    assert(got == Set((1L, 1.0), (2L, 2.0)))
  }

  test("asofJoin keeps left payload columns and rejects bad direction") {
    val out = Temporal.asofJoin(left, right, Seq("k"), "t", "rt")
    assert(out.columns.toSeq ==
      Seq("k", "id", "t", "matched_v", "matched_rt"))
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(left, right, Seq("k"), "t", "rt", "sideways")
    }
  }

  test("rangeJoinBinned matches plain non-equi join incl. bin boundaries") {
    val points = Seq(9L, 10L, 19L, 20L, 21L, 35L, 99L)
      .toDF("pt").withColumn("pid", col("pt"))
    // intervals crossing bin boundaries, zero-length, and bin-aligned
    val intervals = Seq((1L, 10L, 20L), (2L, 5L, 36L), (3L, 20L, 20L),
      (4L, 30L, 31L)).toDF("iid", "s", "e")
    for (bin <- Seq(1L, 7L, 10L, 100L)) {
      val got = Temporal.rangeJoinBinned(points, col("pt"),
          intervals, col("s"), col("e"), bin)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = points.join(intervals,
          col("pt") >= col("s") && col("pt") < col("e"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      // same multiset: each pair exactly once regardless of bin width
      assert(got.sorted == want.sorted, s"binWidth=$bin")
    }
  }
}
