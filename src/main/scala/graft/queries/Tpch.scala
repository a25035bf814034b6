package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** TPC-H-shaped benchmark queries (sqlbench-h lineage — the reference's only
  * published workload, reference docs/sqlbench-h-workstation-10-distributed-
  * perquery.png) adapted to the driver's star schema (TESTDATA.md): there is
  * no partsupp table and some columns are absent, so q2/q11/q16/q17/q20 are
  * re-shaped onto the columns that exist while keeping each query's operator
  * skeleton (join graph shape, agg structure, subquery pattern) intact.
  *
  * Scale notes (100 TB design): every query is pure DataFrame composition —
  * Catalyst handles pushdown/pruning; dimension tables (region/nation/
  * supplier/part/customer) are broadcast explicitly so only the fact tables
  * (lineitem/orders) ever shuffle; aggregates are partial→final by
  * construction. Double-typed aggregates are rounded to 2 decimals in BOTH
  * the DataFrame and oracle SQL so the hash compare is robust to summation
  * order across 1000 executors.
  */
object Tpch extends Suite {

  // -- q1: pricing summary report (full lineitem scan, 2-key hash agg) ------
  private val q1: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 2) AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // -- q3: shipping priority (3-way join, agg, top-k) -----------------------
  private val q3: Q = (s, dir) => {
    val t = Tables(s, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
    val ord  = t.orders.filter(col("o_orderdate") < lit("1997-03-15"))
    val li   = t.lineitem.filter(col("l_shipdate") > lit("1997-03-15"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }
  private val q3Sql =
    """SELECT l_orderkey, o_orderdate,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  // -- q5: local supplier volume (6-way star join) --------------------------
  private val q5: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders.filter(col("o_orderdate") >= lit("1996-01-01") &&
                            col("o_orderdate") <  lit("1997-01-01")),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.customer),
            col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }
  private val q5Sql =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // -- q6: forecast revenue change (scan + tight filter + scalar agg) -------
  private val q6: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") <  lit("1997-01-01") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))
  }
  private val q6Sql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  def defs: Map[String, Q] = Map(
    "tpch_q1" -> q1, "tpch_q3" -> q3, "tpch_q5" -> q5, "tpch_q6" -> q6)

  def oracle: Map[String, String] = Map(
    "tpch_q1" -> q1Sql, "tpch_q3" -> q3Sql, "tpch_q5" -> q5Sql,
    "tpch_q6" -> q6Sql)
}
