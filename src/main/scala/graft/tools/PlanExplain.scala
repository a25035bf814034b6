package graft.tools

import graft.SparkEntry

/** Dump the `.explain("formatted")` output (and, after a noop-sink
  * execution, the AQE-final executed plan) of one gated query, for the
  * committed before/after plan evidence under plans/. Args:
  * <sfDir> <queryName> [outFile]. Same session + cache-reset discipline
  * as PlanGuardSpec so the dumped plan is the one the bench measures. */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val name = args(1)
    val spark = graft.engine.Context.local().spark
    graft.operators.Dedup.releaseCaches()
    spark.sharedState.cacheManager.clearCache()
    val df = SparkEntry.queries(name)(spark, sf)
    val sb = new StringBuilder
    sb.append("==== explain(formatted) " + name + " ====\n")
    sb.append(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    df.write.format("noop").mode("overwrite").save()
    sb.append("\n==== executed plan (AQE final) " + name + " ====\n")
    sb.append(df.queryExecution.executedPlan.toString)
    val out = sb.toString
    if (args.length > 2) {
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
        out.getBytes("UTF-8"))
      println("wrote " + args(2))
    } else println(out)
    spark.stop()
  }
}
