package graft.queries

import graft.Tables

/** SQL pass-through coverage (reference context.rs:166: `ctx.sql` reaches
  * the full DataFusion SQL dialect — correlated/uncorrelated subqueries,
  * EXISTS/IN, theta joins). Each query here is ONE dialect-neutral SQL
  * string executed by `spark.sql` over registered temp views AND used
  * verbatim as the DuckDB oracle — the strongest possible parity statement
  * for the SQL surface: same text, two engines, identical results.
  * Catalyst's subquery decorrelation (SURVEY §4) is what's really under
  * test on the Spark side. */
object OpsSql extends Suite {

  private val sqlExistsCorrelated =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_suppkey = s_suppkey
      |                AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00')
      |ORDER BY s_suppkey""".stripMargin

  private val sqlNotInSubquery =
    """SELECT p_partkey FROM part
      |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
      |                        WHERE l_quantity = 50.0)
      |ORDER BY p_partkey""".stripMargin

  private val sqlScalarCorrelated =
    """SELECT c_custkey FROM customer c
      |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
      |                   WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  private val sqlThetaJoin =
    """SELECT n1.n_name AS a, n2.n_name AS b FROM nation n1, nation n2
      |WHERE n1.n_nationkey < n2.n_nationkey
      |  AND n1.n_regionkey = n2.n_regionkey
      |ORDER BY a, b""".stripMargin

  private val sqlInCorrelatedAgg =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'MACHINERY')
      |  AND o_totalprice > 450000.0
      |ORDER BY o_orderkey""".stripMargin

  // Recursive CTE: supported by BOTH engines (Spark 4 added WITH
  // RECURSIVE), run as the same text — a generated month series LEFT
  // JOINed to real orders, exercising recursion + outer join + agg.
  private val sqlRecursiveCte =
    """WITH RECURSIVE series(n) AS (
      |  SELECT 0
      |  UNION ALL
      |  SELECT n + 1 FROM series WHERE n < 11
      |)
      |SELECT n AS month_ix, CAST(count(o_orderkey) AS BIGINT) AS orders
      |FROM series LEFT JOIN orders
      |  ON date_part('month', o_orderdate) = n + 1
      | AND date_part('year', o_orderdate) = 1997
      |GROUP BY n ORDER BY n""".stripMargin

  // LATERAL correlated derived table — per-region top-balance supplier.
  private val sqlLateral =
    """SELECT r_name, t.s_name, t.s_acctbal
      |FROM region, LATERAL (
      |  SELECT s_name, s_acctbal FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_regionkey = r_regionkey
      |  ORDER BY s_acctbal DESC, s_name LIMIT 2) t
      |ORDER BY r_name, t.s_acctbal DESC, t.s_name""".stripMargin

  // Multiset set-ops: ALL variants keep duplicate counts.
  private val sqlSetAll =
    """SELECT l_partkey FROM lineitem WHERE l_quantity < 3.0
      |INTERSECT ALL
      |SELECT l_partkey FROM lineitem WHERE l_discount > 0.05
      |ORDER BY l_partkey""".stripMargin

  // Aggregate FILTER clause + an explicit RANGE window frame.
  private val sqlFilterFrame =
    """SELECT n_nationkey,
      |  CAST(count(*) FILTER (WHERE s_acctbal > 0) AS BIGINT) AS pos_cnt,
      |  CAST(count(*) FILTER (WHERE s_acctbal <= 0) AS BIGINT) AS neg_cnt,
      |  round(sum(sum(s_acctbal)) OVER (
      |    ORDER BY n_nationkey
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
      |    AS running_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_nationkey
      |ORDER BY n_nationkey""".stripMargin

  // Value-based RANGE frame offsets (distinct from the UNBOUNDED range in
  // sql_filter_frame: the frame is keyed on the ORDER BY VALUE, not row
  // position — rows with keys within ±offset join the frame).
  private val sqlRangeValueFrame =
    """SELECT s_suppkey,
      |  round(sum(s_acctbal) OVER (
      |    PARTITION BY s_nationkey ORDER BY s_suppkey
      |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW), 2) AS bal_back,
      |  CAST(count(*) OVER (
      |    PARTITION BY s_nationkey ORDER BY s_suppkey
      |    RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING) AS BIGINT)
      |    AS n_near
      |FROM supplier
      |ORDER BY s_suppkey""".stripMargin

  // Named-window (WINDOW clause) reuse across multiple functions.
  private val sqlNamedWindow =
    """SELECT s_suppkey,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(row_number() OVER w AS BIGINT) AS rn,
      |  round(s_acctbal - first_value(s_acctbal) OVER w, 2) AS gap_to_top
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey
      |             ORDER BY s_acctbal DESC, s_suppkey)
      |ORDER BY s_suppkey""".stripMargin

  private def q(sql: String): Q = (s, dir) => {
    Tables(s, dir).registerAll()
    s.sql(sql)
  }

  private val all = Map(
    "sql_exists_correlated" -> sqlExistsCorrelated,
    "sql_not_in_subquery" -> sqlNotInSubquery,
    "sql_scalar_correlated" -> sqlScalarCorrelated,
    "sql_theta_join" -> sqlThetaJoin,
    "sql_in_subquery" -> sqlInCorrelatedAgg,
    "sql_recursive_cte" -> sqlRecursiveCte,
    "sql_lateral" -> sqlLateral,
    "sql_set_all" -> sqlSetAll,
    "sql_filter_frame" -> sqlFilterFrame,
    "sql_range_value_frame" -> sqlRangeValueFrame,
    "sql_named_window" -> sqlNamedWindow)

  def defs: Map[String, Q] = all.map { case (k, sql) => k -> q(sql) }
  def oracle: Map[String, String] = all
}
