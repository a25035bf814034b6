package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the heavy dedup pipeline (not part of the
  * driver contract; used to attribute bench time to pipeline stages). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)

    def time(name: String)(f: => Unit): Unit = {
      // two passes, report both (first pays JIT)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${ts.head}%6.2f s  ${ts(1)}%6.2f s")
    }

    val docs = t.documents
    // exact bench reproduction: warmup at sf0.001, then the gated queries
    for (q <- Seq("llm_dedup_ngram", "llm_dedup_minhash"))
      graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    for (q <- Seq("llm_dedup_ngram", "llm_dedup_minhash"))
      time(s"gated $q") {
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    // bench-order reproduction: ngram then minhash, two passes each, no
    // manual persist (the operators' own persistScoped governs caching)
    time("full ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    time("full minhashDedupPairs") {
      Dedup.minhashDedupPairs(docs, "doc_id", "text", 3, 64, 16, 0.9)
        .write.format("noop").mode("overwrite").save()
    }
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    time("sig only (over live cache)") {
      val mins = (0 until 64).map(i =>
        min(xxhash64(lit(i), col("sh"))).as(s"mh_$i"))
      sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
        .write.format("noop").mode("overwrite").save()
    }
    time("sig+bands+cands") {
      val mins = (0 until 64).map(i =>
        min(xxhash64(lit(i), col("sh"))).as(s"mh_$i"))
      val sig = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      Dedup.lshCandidates(sig, "doc_id", 64, 16)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
