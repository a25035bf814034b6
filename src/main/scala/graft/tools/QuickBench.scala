package graft.tools
import org.apache.spark.sql.SparkSession
object QuickBench {
  def main(args: Array[String]): Unit = {
    val names = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names)
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    for (n <- names; i <- 1 to 3) {
      // Bench.scala's cold-cache + GC discipline, so readings match the
      // committed artifact's methodology
      graft.operators.Dedup.releaseCaches()
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"[qb] $n pass$i ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    spark.stop()
  }
}
