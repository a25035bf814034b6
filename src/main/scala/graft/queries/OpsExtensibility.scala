package graft.queries

import graft.Tables
import graft.functions.WindowFns
import graft.udf.{Udafs, Udfs}
import org.apache.spark.sql.functions._

/** UDF / UDAF / name-resolved window coverage (SURVEY.md §2.5, §2.10).
  * The UDF bodies compute SQL-expressible arithmetic so DuckDB can oracle
  * them; the point under test is the registration/execution machinery, not
  * the body. */
object OpsExtensibility extends Suite {

  private val uniq = Seq(col("l_orderkey"), col("l_linenumber"),
    col("l_partkey"), col("l_suppkey"), col("l_quantity"),
    col("l_extendedprice"))
  private val uniqSql =
    "l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice"

  // -- scalar UDFs (reference udf.rs:33-95) ---------------------------------
  private val udfQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    val double1 = Udfs.udf1((x: Double) => x * 2.0 + 1.0)
    val mul2 = Udfs.udf2((x: Double, y: Double) => x * y)
    t.lineitem.filter(col("l_orderkey") < 300)
      .select(Seq(
        double1(col("l_quantity")).as("udf1_v"),
        mul2(col("l_quantity"), col("l_discount")).as("udf2_v")) ++ uniq: _*)
      .orderBy(uniq: _*)
  }
  private val udfSql =
    s"""SELECT l_quantity * 2.0 + 1.0 AS udf1_v,
       |  l_quantity * l_discount AS udf2_v,
       |  $uniqSql
       |FROM lineitem WHERE l_orderkey < 300
       |ORDER BY $uniqSql""".stripMargin

  // -- UDAFs via the Aggregator partial/merge/final protocol (udaf.rs) ------
  private val udafQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(round(Udafs.geometricMean(col("l_quantity")), 6).as("geomean_v"),
           round(Udafs.populationVariance(col("l_quantity")), 4).as("varpop_v"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }
  private val udafSql =
    """SELECT l_returnflag,
      |  round(exp(avg(ln(l_quantity))), 6) AS geomean_v,
      |  round(var_pop(l_quantity), 4) AS varpop_v,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // -- name-resolved window functions (reference functions.rs:111-138) ------
  private val windowByName: Q = (s, dir) => {
    val t = Tables(s, dir)
    val pb = Seq(col("l_returnflag"))
    val ob = col("l_shipdate") +: uniq
    t.lineitem.filter(col("l_orderkey") < 300)
      .select(Seq(
        WindowFns.window("row_number", Nil, pb, ob).as("rn"),
        WindowFns.window("lag", Seq(col("l_quantity"), lit(1)), pb, ob)
          .as("lag_v"),
        WindowFns.window("nth_value", Seq(col("l_quantity"), lit(3)), pb, ob)
          .as("nth3_v"),
        round(WindowFns.window("sum", Seq(col("l_quantity")), pb, ob), 2)
          .as("runsum_v"),
        round(WindowFns.window("avg", Seq(col("l_quantity")), pb, Nil), 6)
          .as("partavg_v"),
        WindowFns.window("count", Nil, pb, Nil).as("partn_v")) ++ uniq: _*)
      .orderBy(uniq: _*)
  }
  private val windowByNameSql =
    s"""SELECT
       |  CAST(row_number() OVER w AS INT) AS rn,
       |  lag(l_quantity, 1) OVER w AS lag_v,
       |  nth_value(l_quantity, 3) OVER w AS nth3_v,
       |  round(sum(l_quantity) OVER w, 2) AS runsum_v,
       |  round(avg(l_quantity) OVER p, 6) AS partavg_v,
       |  count(*) OVER p AS partn_v,
       |  $uniqSql
       |FROM lineitem WHERE l_orderkey < 300
       |WINDOW w AS (PARTITION BY l_returnflag
       |             ORDER BY l_shipdate, $uniqSql
       |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |       p AS (PARTITION BY l_returnflag)
       |ORDER BY $uniqSql""".stripMargin

  def defs: Map[String, Q] = Map(
    "op_udf" -> udfQ,
    "op_udaf" -> udafQ,
    "op_window_byname" -> windowByName)

  def oracle: Map[String, String] = Map(
    "op_udf" -> udfSql,
    "op_udaf" -> udafSql,
    "op_window_byname" -> windowByNameSql)
}
