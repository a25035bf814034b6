package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the temporal joins: random datasets vs an
  * independent in-memory (plain Scala) reference implementation. Raw
  * scalacheck generators with fixed seeds, as in PropertiesSpec. */
class TemporalPropsSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int = 8): Seq[A] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(1042L + i)))

  private val genData: Gen[(List[(String, Long)], List[(String, Long)])] =
    for {
      l <- Gen.listOfN(40, for {
        k <- Gen.oneOf("a", "b", "c")
        t <- Gen.chooseNum(0L, 100L)
      } yield (k, t))
      r <- Gen.listOfN(25, for {
        k <- Gen.oneOf("a", "b", "c", "d")
        t <- Gen.chooseNum(0L, 100L)
      } yield (k, t))
    } yield (l, r.distinct) // right unique on (k, t): operator contract

  test("asofJoin matches an in-memory reference on random data, and " +
    "matched payload fields come from the SAME right row (nulls kept)") {
    cases(genData).foreach { case (lRows, rRows) =>
      val left = lRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("id", "k", "t")
      // payload v is rt-derived but NULL for every third right row — the
      // struct-carry contract: a null field of the matched row must stay
      // null, never backfill from an older row
      val right = rRows.map { case (k, t) =>
        (k, t, if (t % 3 == 0) None else Some(t * 2.0)) }
        .toDF("k", "rt", "v")
      val byKey = rRows.groupBy(_._1)
      for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(15L))) {
        val got = Temporal.asofJoin(left, right, Seq("k"), "t", "rt",
            dir, tol)
          .select("id", "matched_rt", "matched_v")
          .collect().map(r => (r.getLong(0),
            (if (r.isNullAt(1)) None else Some(r.getLong(1)),
             if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
        val want = lRows.zipWithIndex.map { case ((k, t), i) =>
          val cands = byKey.getOrElse(k, Nil).map(_._2)
          val nearest =
            if (dir == "backward") cands.filter(_ <= t).maxOption
            else cands.filter(_ >= t).minOption
          val gapped = nearest.filter(rt =>
            tol.forall(m => math.abs(t - rt) <= m))
          val v = gapped.flatMap(rt =>
            if (rt % 3 == 0) None else Some(rt * 2.0))
          i.toLong -> ((gapped, v))
        }.toMap
        assert(got == want, s"dir=$dir tol=$tol")
      }
    }
  }

  private val genRange: Gen[(List[Long], List[(Long, Long)])] =
    for {
      pts <- Gen.listOfN(30, Gen.chooseNum(0L, 120L))
      ivs <- Gen.listOfN(12, for {
        s <- Gen.chooseNum(0L, 110L)
        len <- Gen.chooseNum(0L, 40L) // includes empty intervals
      } yield (s, s + len))
    } yield (pts, ivs)

  test("chunkDocuments covers every token at the declared stride") {
    val gen = for {
      n <- Gen.chooseNum(1, 120)
      ck <- Gen.chooseNum(4, 20)
      ov <- Gen.chooseNum(0, 3)
    } yield (n, ck, ov)
    cases(gen, n = 10).foreach { case (n, ck, ov) =>
      val doc = (1 to n).map(i => s"t$i").mkString(" ")
      val rows = graft.operators.Curation.chunkDocuments(
          Seq((1L, doc)).toDF("id", "text"), "id", col("text"), ck, ov)
        .orderBy("chunk_ix").collect()
      val stride = ck - ov
      val covered = rows.flatMap { r =>
        val toks = r.getString(3).split(" ")
        // chunk i starts at token index i*stride (0-based)
        val start = r.getLong(1).toInt * stride
        assert(toks.length == r.getLong(2), s"n=$n ck=$ck ov=$ov")
        assert(toks.headOption.contains(s"t${start + 1}"))
        start until (start + toks.length)
      }.toSet
      assert(covered == (0 until n).toSet, s"n=$n ck=$ck ov=$ov")
    }
  }

  test("rangeJoinBinned matches an in-memory reference on random data") {
    cases(genRange).foreach { case (pts, ivs) =>
      val points = pts.zipWithIndex
        .map { case (p, i) => (i.toLong, p) }.toDF("pid", "pt")
      val intervals = ivs.zipWithIndex
        .map { case ((s, e), i) => (i.toLong, s, e) }.toDF("iid", "s", "e")
      for (bin <- Seq(1L, 8L, 64L)) {
        val got = Temporal.rangeJoinBinned(points, col("pt"),
            intervals, col("s"), col("e"), bin)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        val want = (for {
          (p, pi) <- pts.zipWithIndex
          ((s, e), ii) <- ivs.zipWithIndex
          if p >= s && p < e
        } yield (pi.toLong, ii.toLong)).sorted
        assert(got == want, s"bin=$bin")
      }
    }
  }
}
