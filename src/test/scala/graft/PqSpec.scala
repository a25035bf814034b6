package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product quantization: the lossless regime (ksub ≥ distinct training
  * points ⇒ codebooks ARE the points ⇒ ADC = exact cosine) must reproduce
  * brute-force top-k exactly; the lossy regime must still rank the
  * planted nearest neighbor first after rescoring. Encoder runs under
  * forced codegen. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(23)
  private def vec(dim: Int): Seq[Float] =
    Seq.fill(dim)(rnd.nextGaussian().toFloat)

  test("lossless regime: PQ top-k equals brute-force top-k exactly") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val dim = 8
      val rows = (0L until 12L).map(i => (i, vec(dim)))
      val corpus = rows.toDF("id", "v")
      val queries = corpus.filter($"id" < 3)
      val idx = Similarity.pqIndex(corpus, "id", "v",
        m = 4, ksub = 12, iters = 3, seed = 7L)
      val pq = Similarity.pqTopKBatch(idx, "id", queries, "id", "v", k = 5)
        .select($"query_id", $"id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val exact = Similarity.topKBatch(corpus, "id", "v",
          queries, "id", "v", k = 5)
        .select($"query_id", $"id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // same (query, id) sets AND same per-query ranking
      assert(pq.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap ==
        exact.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  test("lossy regime: planted near-duplicate survives coding + rescoring") {
    val dim = 16
    val base = vec(dim)
    val nearDup = base.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val corpus = ((2L until 60L).map(i => (i, vec(dim))) ++
      Seq((0L, base), (1L, nearDup))).toDF("id", "v")
    val queries = corpus.filter($"id" === 0L)
    val idx = Similarity.pqIndex(corpus, "id", "v",
      m = 4, ksub = 8, iters = 4, seed = 11L)
    val top = Similarity.pqTopKBatch(idx, "id", queries, "id", "v", k = 8)
      .select($"id").collect().map(_.getLong(0)).toSet
    // the ADC candidate set must surface both the query itself and its
    // planted near-duplicate (cosine ≈ 1)
    assert(top.contains(0L) && top.contains(1L))
  }

  test("codes are m small ints; corrupt-length vectors yield NULL") {
    val corpus = (0L until 10L).map(i => (i, vec(12))).toDF("id", "v")
    val idx = Similarity.pqIndex(corpus, "id", "v",
      m = 3, ksub = 4, iters = 2, seed = 3L)
    val codes = idx.codes.collect()
    assert(codes.forall { r =>
      val c = r.getSeq[Int](1); c.length == 3 && c.forall(j => j >= 0 && j < 4)
    })
    assert(idx.codebook.length == 3 * 4 * 4)
    // wrong-dimension input rows encode to NULL, never throw
    val bad = Seq((99L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val enc = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.PqEncode(
        org.apache.spark.sql.graftbridge.ColumnBridge.eagerExpression(
          spark, bad("v")),
        idx.codebook, 3, 4, 4))
    assert(bad.select(enc.as("c")).head().isNullAt(0))
  }
}
