package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-4 native kernels against independent plain
  * Scala references: BpeMerge (leftmost non-overlapping merge), PqEncode
  * (argmin subspace assignment), MediaHeaders (build→parse round-trip over
  * random parameters). Raw scalacheck generators with fixed seeds, as in
  * DedupPropsSpec. */
class KernelPropsSpec extends SparkSpec {

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(90210L + i)))

  // ---- BpeMerge ----------------------------------------------------------

  // tiny symbol alphabet -> adjacent merge pairs occur often, including
  // the overlapping-run adversarial case (a a a ...)
  private val sym: Gen[String] = Gen.oneOf("a", "b", "c", "ab", "bc")
  private val genSyms: Gen[List[String]] =
    Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, sym))

  /** Independent reference: leftmost non-overlapping single pass. */
  private def refMerge(xs: List[String], l: String,
                       r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < xs.length) {
      if (i < xs.length - 1 && xs(i) == l && xs(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += xs(i); i += 1 }
    }
    out.toList
  }

  test("BpeMerge kernel equals the reference merge on random symbol runs") {
    val pairs = Seq(("a", "a"), ("a", "b"), ("ab", "c"), ("b", "bc"))
    cases(genSyms, 60).foreach { xs =>
      val arr = new GenericArrayData(
        xs.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      pairs.foreach { case (l, r) =>
        val got = graft.expressions.BpeMerge(
            org.apache.spark.sql.catalyst.expressions.Literal(null), l, r)
          .merge(arr)
        val gotList = (0 until got.numElements())
          .map(i => got.getUTF8String(i).toString).toList
        val want = refMerge(xs, l, r)
        assert(gotList == want, s"xs=$xs merge=($l,$r)")
        // concatenation invariant: merging never alters the character stream
        assert(gotList.mkString == xs.mkString)
      }
    }
  }

  // ---- PqEncode ----------------------------------------------------------

  test("PqEncode assigns every subvector to its true nearest centroid") {
    val rnd = new scala.util.Random(4221)
    val m = 3; val ksub = 5; val dsub = 4
    val codebook = Array.fill(m * ksub * dsub)(rnd.nextGaussian())
    val enc = graft.expressions.PqEncode(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      codebook, m, ksub, dsub)
    for (_ <- 1 to 80) {
      val v = Array.fill(m * dsub)(rnd.nextGaussian())
      val got = enc.encode(new GenericArrayData(v))
      for (s <- 0 until m) {
        val dists = (0 until ksub).map { j =>
          (0 until dsub).map { d =>
            val diff = v(s * dsub + d) - codebook((s * ksub + j) * dsub + d)
            diff * diff
          }.sum
        }
        // reference argmin with ties to the lowest index
        val want = dists.zipWithIndex.minBy { case (dist, j) => (dist, j) }._2
        assert(got.getInt(s) == want, s"subspace $s")
      }
    }
  }

  // ---- CmsEstimate -------------------------------------------------------

  test("CmsEstimate: never underestimates, bounded over, merge = whole") {
    import org.apache.spark.util.sketch.CountMinSketch
    val rnd = new scala.util.Random(99)
    val items = (1 to 5000).map(_ => s"tok${rnd.nextInt(300)}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val eps = 0.001
    val whole = CountMinSketch.create(eps, 0.999, 42)
    items.foreach(whole.add)
    // mergeable-state contract: two half-corpus sketches merged in place
    // give the same estimates as one whole-corpus sketch (same seed)
    val (h1, h2) = items.splitAt(items.length / 2)
    val a = CountMinSketch.create(eps, 0.999, 42)
    val b = CountMinSketch.create(eps, 0.999, 42)
    h1.foreach(a.add); h2.foreach(b.add)
    a.mergeInPlace(b)
    val bytes = { val o = new java.io.ByteArrayOutputStream()
      whole.writeTo(o); o.toByteArray }
    val probe = graft.expressions.CmsEstimate(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.StringType), bytes)
    exact.foreach { case (tok, freq) =>
      val est = probe.estimate(
        org.apache.spark.unsafe.types.UTF8String.fromString(tok))
      assert(est >= freq, s"$tok underestimated")
      assert(est <= freq + math.ceil(eps * items.length).toLong + 1,
        s"$tok overestimated beyond the eps*N bound")
      assert(est == a.estimateCount(tok), s"$tok merged != whole")
    }
  }

  test("CmsEstimate expression under forced codegen") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq("x", "x", "x", "y").toDF("t")
      val cms = df.stat.countMinSketch("t", eps = 0.01,
        confidence = 0.99, seed = 7)
      val bytes = { val o = new java.io.ByteArrayOutputStream()
        cms.writeTo(o); o.toByteArray }
      val est = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.expressions.CmsEstimate(
          org.apache.spark.sql.graftbridge.ColumnBridge.eagerExpression(
            spark, df("t")), bytes))
      val rows = df.distinct().withColumn("e", est)
        .orderBy($"t").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows(0)._2 >= 3L && rows(1)._2 >= 1L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  // ---- MediaHeaders ------------------------------------------------------

  private val genDims: Gen[(Int, Int)] = for {
    w <- Gen.chooseNum(1, 700); h <- Gen.chooseNum(1, 700)
  } yield (w, h)

  test("media builders round-trip through the parser for random params") {
    import graft.expressions.MediaHeaders
    cases(genDims, 25).foreach { case (w, h) =>
      val png = MediaHeaders.buildPng(w, h)
      assert(MediaHeaders.longField(png, MediaHeaders.FWidth) == w)
      assert(MediaHeaders.longField(png, MediaHeaders.FHeight) == h)
      val jpg = MediaHeaders.buildJpeg(w, h)
      assert(MediaHeaders.longField(jpg, MediaHeaders.FWidth) == w)
      assert(MediaHeaders.longField(jpg, MediaHeaders.FHeight) == h)
    }
    val rates = Seq(8000, 11025, 22050, 44100, 48000)
    for (rate <- rates; ch <- 1 to 2) {
      val wav = MediaHeaders.buildWav(rate, ch, 16, 321)
      assert(MediaHeaders.longField(wav, MediaHeaders.FSampleRate) == rate)
      assert(MediaHeaders.longField(wav, MediaHeaders.FChannels) == ch)
      assert(MediaHeaders.longField(wav, MediaHeaders.FDurationMs) ==
        321L * 1000 / rate)
    }
  }
}
