package graft.tools

import graft.Tables
import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for llm_pipeline_curate_v2 (the heaviest bench
  * query): prefix-Jaccard pairs → CC survivors → balance → split → stats.
  * Not part of the driver contract. */
object ProfileV2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[profile] $name%-30s ${ts.head}%6.2f s  ${ts(1)}%6.2f s")
    }
    // warm the full query once at tiny SF (JIT), like Bench does
    graft.SparkEntry.queries("llm_pipeline_curate_v2")(
      spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()

    val t = Tables(spark, sfDir)
    time("stage1 prefix pairs") {
      Dedup.prefixJaccardPairs(t.documents, "doc_id", "text", 3, 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    val pairs = Dedup.prefixJaccardPairs(t.documents, "doc_id", "text",
      3, 0.8)
    time("stage2 survivors (CC)") {
      Dedup.survivors(t.documents.select(col("doc_id"), col("lang"),
        col("n_chars")), pairs, "doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    val surv = Dedup.survivors(t.documents.select(col("doc_id"),
      col("lang"), col("n_chars")), pairs, "doc_id").persist()
    surv.count()
    time("stage3-5 balance+split+agg") {
      val bal = Curation.balanceMix(surv, "lang", col("doc_id"),
        Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.15,
          "zh" -> 0.05), "graft-sample-v1:")
      val lab = Curation.datasetSplit(bal, col("doc_id"),
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
        "graft-sample-v1:")
      lab.groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"),
          min(col("doc_id")).as("min_doc"))
        .write.format("noop").mode("overwrite").save()
    }
    time("gated llm_pipeline_curate_v2") {
      graft.SparkEntry.queries("llm_pipeline_curate_v2")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    // per-iteration CC cost: replicate the clusterLabels loop with timing
    println("[profile] pairs=" + pairs.count())
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    println("[profile] edges=" + edges.count() +
      " parts=" + edges.rdd.getNumPartitions)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < 15 && !converged) {
      val t0 = System.nanoTime()
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("label", "dst_label"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_label")).as("nbr_label"))
        .join(labels, Seq("id"))
        .select(col("id"),
          least(col("label"), col("nbr_label")).as("label"),
          col("label").as("old"))
        .localCheckpoint(true)
      val next = nbrMin.as("a")
        .join(nbrMin.select(col("id").as("label"),
          col("label").as("jump")).as("b"), Seq("label"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("jump"), col("label")))
            .as("label"), col("old"))
        .localCheckpoint(true)
      val changed = next.filter(col("label") =!= col("old")).count()
      converged = changed == 0
      labels = next.select(col("id"), col("label"))
      iter += 1
      println(f"[profile] cc iter $iter changed=$changed " +
        f"${(System.nanoTime() - t0) / 1e9}%5.2f s")
    }
    spark.stop()
  }
}
