package graft.engine

import org.apache.spark.sql.DataFrame

/** Plan-introspection surface (reference dataframe.rs:165-181:
  * `explain(verbose, analyze)` / `explain_string`). */
object Explain {

  def explainString(df: DataFrame, verbose: Boolean = false,
                    analyze: Boolean = false): String = {
    if (analyze) {
      // nearest analog of DataFusion's EXPLAIN ANALYZE: execute, then render
      // the final (AQE-resolved) physical plan with runtime metrics
      df.queryExecution.executedPlan.executeCollect()
      df.queryExecution.executedPlan.toString
    } else if (verbose) {
      df.queryExecution.toString
    } else {
      df.queryExecution.optimizedPlan.toString + "\n" +
        df.queryExecution.executedPlan.toString
    }
  }

  def explain(df: DataFrame, verbose: Boolean = false,
              analyze: Boolean = false): Unit =
    // scalastyle:off println
    println(explainString(df, verbose, analyze))
    // scalastyle:on println
}
