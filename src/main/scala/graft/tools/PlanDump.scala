package graft.tools

import graft.SparkEntry

/** Throwaway diagnostic: print the executed plan of one gated query under
  * the same session + cache-reset discipline PlanGuardSpec uses, so BNLJ
  * count drift can be eyeballed. Args: <sfDir> <queryName>. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sf = args(0)
    val name = args(1)
    val spark = graft.engine.Context.local().spark
    graft.operators.Dedup.releaseCaches()
    spark.sharedState.cacheManager.clearCache()
    val df = SparkEntry.queries(name)(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    println("==== PLAN " + name + " ====")
    println(plan)
    println("==== BNLJ count: " +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).length + " ====")
    spark.stop()
  }
}
