package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the plain TF-IDF pair-aggregate formulations at probe
  * scale (ad-hoc, not part of the driver contract). Variants share one
  * persisted weight table so only the pair stage differs:
  *
  *   partial — groupBy(id_a,id_b) straight off the explode (the shipped
  *             r8 shape): map-side partial agg hash map over the quadratic
  *             pair stream, which spills at 30×.
  *   repart  — repartition(id_a,id_b) BEFORE the groupBy: the explode
  *             streams straight into the shuffle writer (no map-side hash
  *             map), and both agg modes run post-exchange on
  *             advisory-sized partitions.
  *
  * Also reports the combine ratio (raw pair incidences / distinct pairs)
  * so the shuffle-volume cost of skipping map-side combine is a measured
  * number, not a guess.
  *
  * Usage: runMain graft.tools.ProfileTfidfVar [corpusDir] [variants]
  *   env SPARK_GRAFT_ADVISORY / SPARK_GRAFT_INIT_PARTS as in ProfileTfidf
  */
object ProfileTfidfVar {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale-probe/v2-x10")
    val variants = (if (args.length > 1) args(1) else "partial,repart")
      .split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "32"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val w = Dedup.tfidfWeights(docs, "doc_id", "text", 3, Some(500))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[var] weight rows: ${w.count()}")

    def pairsOf(wt: DataFrame, mode: String): DataFrame = {
      val exploded = wt
        .groupBy(col("sh"))
        .agg(collect_list(struct(col("doc_id").as("id"), col("wgt"))).as("xs"))
        .select(explode(col("xs")).as("a"), col("xs"))
        .select(col("a"), explode(col("xs")).as("b"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          (col("a.wgt") * col("b.wgt")).as("p"))
      val pre = mode match {
        case "partial" => exploded
        case "repart"  => exploded.repartition(col("id_a"), col("id_b"))
      }
      pre.groupBy(col("id_a"), col("id_b")).agg(sum(col("p")).as("dot"))
    }

    // combine ratio: raw incidences vs distinct pairs
    val raw = w.groupBy(col("sh")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c").cast("double") * (col("c") - 1) / 2)).head().getDouble(0)
    println(f"[var] raw pair incidences: $raw%.3e")

    for (v <- variants; pass <- 1 to 2) {
      spark.sharedState.cacheManager.clearCache()
      val w2 = Dedup.tfidfWeights(docs, "doc_id", "text", 3, Some(500))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      w2.count()
      val t0 = System.nanoTime()
      val n = pairsOf(w2, v).filter(col("dot") > 1e300).count() // forces full agg, ~0 rows survive
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[var] variant=$v pass=$pass  ${sec}%7.2f s  (survivors $n)")
    }
    spark.stop()
  }
}
