package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Plan auditor: prints the markers that matter for the 100 TB design
  * review — scan pushdown/pruning, join strategies (AQE-chosen broadcasts
  * vs shuffles), exchange count, codegen spans — for the headline queries.
  * Run with SPARK_GRAFT_SF_DIR to audit at a given scale factor. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tpch_q5", "tpch_q7", "tpch_q8", "tpch_q21",
        "llm_dedup_minhash", "llm_embed_ann_pairs")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      // audit the plans users get: graft optimizer rules active
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // execute so AQE finalizes its runtime plan choices
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val qe: QueryExecution = df.queryExecution
      val plan = qe.executedPlan.toString
      def count(marker: String): Int =
        marker.r.findAllIn(plan).length
      println(f"== $name  ($secs%.2fs)")
      // codegen spans show as `*(n)` operator prefixes in executedPlan's
      // string form (the word WholeStageCodegen never appears there)
      println(s"   BroadcastHashJoin=${count("BroadcastHashJoin")} " +
        s"SortMergeJoin=${count("SortMergeJoin")} " +
        s"ShuffledHashJoin=${count("ShuffledHashJoin")} " +
        s"Exchange=${count("Exchange (?!hashpartitioning#)")} " +
        s"CodegenSpans=${"\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size} " +
        s"Sort=${count("\\bSort\\b")} " +
        s"GroupedTopK=${count("GroupedTopK")} " +
        s"WindowGroupLimit=${count("WindowGroupLimit")}")
      plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .take(8)
        .foreach(l => println("   " + l.trim.take(160)))
    }
    spark.stop()
  }
}
