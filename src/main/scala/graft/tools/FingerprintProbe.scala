package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the PlanGuardSpec fingerprint tuple (Exchange, SortMergeJoin,
  * CartesianProduct, GroupedTopK, pushed-filter scans, BNLJ) for the named
  * queries, measured exactly as the spec measures them: test-session
  * config, caches cleared first, queries evaluated in the given order at
  * sf0.001. Use when adding fingerprint pins for new queries. */
object FingerprintProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Dedup.releaseCaches()
    spark.sharedState.cacheManager.clearCache()
    args.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      def c(p: String) = p.r.findAllIn(plan).length
      println(s"[probe] $name ex=${c("Exchange")} smj=${c("SortMergeJoin")}" +
        s" cart=${c("CartesianProduct")} topk=${c("GroupedTopK")}" +
        s" pushed=${c("PushedFilters: \\[[^\\]]")}" +
        s" bnl=${c("BroadcastNestedLoopJoin")}")
    }
    spark.stop()
  }
}
