package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query suite: each suite contributes named DataFrame
  * queries plus (where SQL-expressible) a DuckDB oracle twin. Column names
  * are aliased identically on both sides (driver hash-compares after
  * sorting columns by name).
  */
object SparkEntry {

  private def suites: Seq[Suite] = Seq(
    Tpch, OpsRelational, OpsScalar, OpsExtensibility, OpsLlm, OpsEvents,
    OpsSql, OpsTemporal, OpsCuration, OpsImage, OpsSelection, OpsWeb)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's flagship example (reference
    * examples/sql-parquet.py:21-28: scan → filter not-null → group →
    * count → order) on the lineitem table. */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_returnflag").isNotNull)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    suites.flatMap(_.oracle).toMap
}
