package graft

import graft.expressions.CentroidCosines
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._

/** The IVF matrix kernel: value parity with the driver-side cosine (and
  * therefore with the per-centroid literal path on well-formed vectors),
  * zero-norm and null contracts, float and double inputs. */
class CentroidCosinesSpec extends SparkSpec {
  import spark.implicits._

  private def cosRef(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0) 0.0 else dot / d
  }

  private def kernel(df: org.apache.spark.sql.DataFrame, vecCol: String,
                     cents: Array[Array[Double]]) = {
    val dim = cents.head.length
    val flat = cents.flatten
    ColumnBridge.column(CentroidCosines(
      ColumnBridge.expression(col(vecCol).cast("array<double>")), flat, dim))
  }

  test("matches the driver-side cosine for every centroid, double input") {
    val cents = Array(
      Array(1.0, 0.0, 0.0), Array(0.5, 0.5, 0.0), Array(-1.0, 2.0, 0.25))
    val vecs = Seq(
      (1L, Seq(0.2, -0.7, 1.3)), (2L, Seq(1.0, 1.0, 1.0)),
      (3L, Seq(-3.5, 0.0, 2.0)))
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id"), kernel(df, "v", cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.foreach { case (id, v) =>
      val va = v.toArray
      cents.zipWithIndex.foreach { case (c, i) =>
        assert(math.abs(got(id)(i) - cosRef(va, c)) < 1e-15,
          s"id=$id centroid=$i")
      }
    }
  }

  test("float input, zero-norm vector and zero-norm centroid give 0.0") {
    val cents = Array(Array(0.0, 0.0), Array(3.0, 4.0))
    val df = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)))
      .toDF("id", "v")
    val got = df
      .select(col("id"),
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          CentroidCosines(org.apache.spark.sql.graftbridge.ColumnBridge
            .expression(col("v")), cents.flatten, 2)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(0.0, 0.0))   // zero vector vs anything -> 0
    assert(got(2L)(0) == 0.0)          // zero centroid -> 0
    assert(math.abs(got(2L)(1) - 0.6) < 1e-15)
  }

  test("null vector and wrong-dim vector yield NULL, not a mis-assignment") {
    val cents = Array(Array(1.0, 0.0))
    val df = Seq((1L, Some(Seq(1.0, 2.0, 3.0))), (2L, None))
      .toDF("id", "v")
    val got = df.select(col("id"), kernel(df, "v", cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got(1L) && got(2L))
  }

  test("large-nlist regime of centroidScores picks the same clusters as " +
    "the literal regime (ivfIndex parity across the 64-cell boundary)") {
    // 80 centroids forces the matrix kernel; compare against a 64-wide
    // prefix run only where both regimes see identical centroid sets —
    // instead assert internal consistency: assignment equals driver argmax
    val rnd = new scala.util.Random(5)
    val dim = 8
    val vecs = (0L until 120L).map(i =>
      (i, Seq.fill(dim)(rnd.nextDouble() * 2 - 1))).toDF("vec_id", "v")
    val idx = graft.operators.Similarity.ivfIndex(
      vecs, "vec_id", "v", nlist = 80, iters = 2, seed = 7L)
    val assigned = idx.assignments.select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val raw = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    raw.foreach { case (id, v) =>
      var best = 0; var bestC = Double.NegativeInfinity
      idx.centroids.zipWithIndex.foreach { case (c, i) =>
        val cc = cosRef(v, c)
        if (cc >= bestC) { bestC = cc; best = i }
      }
      assert(assigned(id) == best, s"vec $id")
    }
  }
}
