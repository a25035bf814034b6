package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: decompose tfidfCosinePairsAuto's cost on a given corpus —
  * the full-corpus pre-flight statistic vs each branch's solo time,
  * from cleared caches per reading (the SkewProbe time1 discipline).
  * Usage: runMain graft.tools.ProfileAuto [dir] [n] [reps]
  * (dir defaults to the skew-probe corpus with n=1; pass
  * /root/testdata/sf0.1 3 for the bench shape). */
object ProfileAuto {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/skew-probe/zipf-30000")
    val n = if (args.length > 1) args(1).toInt else 1
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // match the bench session's r10 AQE discipline (overridable for A/B)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "256"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_REPART", "true"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "1048576")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def fresh(): Unit = {
      Dedup.releaseCaches(); spark.sharedState.cacheManager.clearCache()
    }
    def t(label: String)(f: => Unit): Unit = {
      fresh()
      val t0 = System.nanoTime(); f
      println(f"[auto] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    // warm plan shapes
    Dedup.tfidfPrefixMassRatio(docs.limit(200), "doc_id", "text", n, 0.5)
    for (_ <- 1 to reps) {
      t("stat full") {
        Dedup.tfidfPrefixMassRatio(docs, "doc_id", "text", n, 0.5); ()
      }
      t("stat sampled m=8") {
        Dedup.tfidfPrefixMassRatioSampled(docs, "doc_id", "text", n, 0.5); ()
      }
      t("stat sampled AQE-off") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          Dedup.tfidfPrefixMassRatioSampled(docs, "doc_id", "text", n, 0.5)
          ()
        } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      t("stat sampled m=32") {
        Dedup.tfidfPrefixMassRatioSampled(docs, "doc_id", "text", n, 0.5,
          m = 32); ()
      }
      t("plain solo") {
        Dedup.tfidfCosinePairs(docs, "doc_id", "text", n, 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      t("prefix solo") {
        Dedup.tfidfCosinePairsPrefix(docs, "doc_id", "text", n, 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      t("auto") {
        Dedup.tfidfCosinePairsAuto(docs, "doc_id", "text", n, 0.5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
