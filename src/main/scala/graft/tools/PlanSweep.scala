package graft.tools
import org.apache.spark.sql.SparkSession
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        val cart = "CartesianProduct".r.findAllIn(plan).length
        val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
        if (cart + bnl > 0) println(s"[sweep] $name cart=$cart bnl=$bnl")
      } catch { case e: Throwable => println(s"[sweep] $name ERR ${e.getMessage.take(80)}") }
    }
    println("[sweep] done")
    spark.stop()
  }
}
