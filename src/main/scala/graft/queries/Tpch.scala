package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** TPC-H-shaped benchmark queries (sqlbench-h lineage — the reference's only
  * published workload, reference docs/sqlbench-h-workstation-10-distributed-
  * perquery.png) adapted to the driver's star schema (TESTDATA.md): there is
  * no partsupp table and some columns are absent, so q2/q9/q11/q12/q14/q16/
  * q17/q20/q21 are re-shaped onto the columns that exist while keeping each
  * query's operator skeleton (join graph, agg structure, subquery pattern)
  * intact.
  *
  * Scale notes (100 TB design): every query is pure DataFrame composition —
  * Catalyst handles pushdown/pruning. Broadcast policy: explicit
  * `broadcast()` hints are reserved for sides whose size is BOUNDED
  * regardless of scale factor — region (5 rows), nation (25), and one-row /
  * per-nation scalar aggregates. customer/supplier/part grow linearly with
  * SF, so their join strategy is left to CBO + AQE: at small SF the planner
  * still picks broadcast from observed sizes, and at the 100 TB shape it
  * degrades to shuffle joins instead of OOMing every executor on a forced
  * multi-hundred-GB broadcast. Aggregates are partial→final by
  * construction; correlated subqueries are decorrelated by hand into
  * joins against small aggregates (never a driver-side collect).
  * Double-typed aggregates are rounded identically in BOTH the DataFrame and
  * oracle SQL so the hash compare is robust to summation order across 1000
  * executors.
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

  // -- q2: min-cost supplier shape (correlated scalar subquery → decorrelated
  //        broadcast join against a per-nation max) -------------------------
  private val q2: Q = (s, dir) => {
    val t = Tables(s, dir)
    val euroSupp = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
    val maxPerNation = euroSupp.groupBy(col("s_nationkey").as("mx_nation"))
      .agg(max(col("s_acctbal")).as("mx_bal"))
    euroSupp
      .join(broadcast(maxPerNation),
            col("s_nationkey") === col("mx_nation") &&
            col("s_acctbal") === col("mx_bal"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("s_acctbal"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
  }
  private val q2Sql =
    """SELECT s_suppkey, s_name, n_name, s_acctbal
      |FROM supplier s, nation, region
      |WHERE s.s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2, nation n2,
      |                     region r2
      |                   WHERE s2.s_nationkey = n2.n_nationkey
      |                     AND n2.n_regionkey = r2.r_regionkey
      |                     AND r2.r_name = 'EUROPE'
      |                     AND s2.s_nationkey = s.s_nationkey)
      |ORDER BY s_acctbal DESC, s_suppkey""".stripMargin

  // -- q3: shipping priority (3-way join, agg, top-k) -----------------------
  private val q3: Q = (s, dir) => {
    val t = Tables(s, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
    val ord  = t.orders.filter(col("o_orderdate") < lit("1997-03-15"))
    val li   = t.lineitem.filter(col("l_shipdate") > lit("1997-03-15"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
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

  // -- q4: order priority checking (EXISTS → left-semi join with extra
  //        non-equi conjunct) ----------------------------------------------
  private val q4: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .filter(col("o_orderdate") >= lit("1996-07-01") &&
              col("o_orderdate") <  lit("1996-10-01"))
      .join(t.lineitem,
            col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }
  private val q4Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // -- q5: local supplier volume (6-way star join) --------------------------
  private val q5: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders.filter(col("o_orderdate") >= lit("1996-01-01") &&
                            col("o_orderdate") <  lit("1997-01-01")),
            col("l_orderkey") === col("o_orderkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(t.customer,
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

  // -- q7: volume shipping between two trade partners (double-aliased dim
  //        joins; partner pairing lifted to regions so the query is
  //        non-degenerate at every scale factor — sf0.001 has only 10
  //        suppliers over 25 nations) --------------------------------------
  private val q7: Q = (s, dir) => {
    val t = Tables(s, dir)
    val n1 = t.nation.select(col("n_nationkey").as("sn_key"),
                             col("n_name").as("supp_nation"),
                             col("n_regionkey").as("sn_region"))
    val n2 = t.nation.select(col("n_nationkey").as("cn_key"),
                             col("n_name").as("cust_nation"),
                             col("n_regionkey").as("cn_region"))
    val r1 = t.region.select(col("r_regionkey").as("sr_key"),
                             col("r_name").as("supp_region"))
    val r2 = t.region.select(col("r_regionkey").as("cr_key"),
                             col("r_name").as("cust_region"))
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") <= lit("1997-12-31"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .join(broadcast(r1), col("sn_region") === col("sr_key"))
      .join(broadcast(r2), col("cn_region") === col("cr_key"))
      .filter((col("supp_region") === "EUROPE" && col("cust_region") === "ASIA") ||
              (col("supp_region") === "ASIA" && col("cust_region") === "EUROPE"))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }
  private val q7Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM supplier, lineitem, orders, customer, nation n1, nation n2,
      |     region r1, region r2
      |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey
      |  AND n1.n_regionkey = r1.r_regionkey
      |  AND n2.n_regionkey = r2.r_regionkey
      |  AND ((r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
      |    OR (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE'))
      |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                     AND TIMESTAMP '1997-12-31 00:00:00'
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // -- q8: market share (conditional agg over 7-way join) -------------------
  private val q8: Q = (s, dir) => {
    val t = Tables(s, dir)
    val n1 = t.nation.select(col("n_nationkey").as("cn_key"),
                             col("n_regionkey").as("cn_region"))
    val n2 = t.nation.select(col("n_nationkey").as("sn_key"),
                             col("n_name").as("supp_nation"))
    t.lineitem
      .join(t.part.filter(col("p_type") === "ECONOMY"),
            col("l_partkey") === col("p_partkey"))
      .join(t.orders.filter(col("o_orderdate") >= lit("1996-01-01") &&
                            col("o_orderdate") <= lit("1997-12-31")),
            col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
      .join(broadcast(t.region.filter(col("r_name") === "AMERICA")),
            col("cn_region") === col("r_regionkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
      .withColumn("volume", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(0.0))
          / sum(col("volume")), 4).as("mkt_share"))
      .orderBy(col("o_year"))
  }
  private val q8Sql =
    """SELECT year(o_orderdate) AS o_year,
      |  round(sum(CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount)
      |                 ELSE 0 END)
      |        / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
      |FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
      |     region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |  AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
      |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
      |                      AND TIMESTAMP '1997-12-31 00:00:00'
      |  AND p_type = 'ECONOMY'
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // -- q9: product profit by nation and year (no ps_supplycost — profit is
  //        discounted revenue; keeps the 5-way join + LIKE filter shape) ----
  private val q9: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.part.filter(col("p_name").like("%red%")),
            col("l_partkey") === col("p_partkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
               year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }
  private val q9Sql =
    """SELECT n_name AS nation, year(o_orderdate) AS o_year,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
      |FROM part, supplier, lineitem, orders, nation
      |WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |  AND p_name LIKE '%red%'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY n_name, o_year DESC""".stripMargin

  // -- q10: returned items report (join + agg + top 20) ---------------------
  private val q10: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem.filter(col("l_returnflag") === "R")
      .join(t.orders.filter(col("o_orderdate") >= lit("1996-10-01") &&
                            col("o_orderdate") <  lit("1997-01-01")),
            col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }
  private val q10Sql =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // -- q11: important stock shape (groupBy + HAVING vs global scalar agg;
  //         decorrelated into a broadcast cross join) -----------------------
  private val q11: Q = (s, dir) => {
    val t = Tables(s, dir)
    val n1Supp = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val vals = t.lineitem
      .join(n1Supp, col("l_suppkey") === col("s_suppkey"))
      .withColumn("val", col("l_extendedprice") * col("l_quantity"))
    val total = vals.agg(sum(col("val")).as("total_val"))
    vals.groupBy(col("l_partkey"))
      .agg(sum(col("val")).as("part_val"))
      .join(broadcast(total))
      .filter(col("part_val") > col("total_val") * 0.001)
      .select(col("l_partkey"), round(col("part_val"), 2).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }
  private val q11Sql =
    """SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS value
      |FROM lineitem, supplier, nation, region
      |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      |GROUP BY l_partkey
      |HAVING sum(l_extendedprice * l_quantity) >
      |  (SELECT sum(l_extendedprice * l_quantity) * 0.001
      |   FROM lineitem, supplier, nation, region
      |   WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |     AND n_regionkey = r_regionkey AND r_name = 'ASIA')
      |ORDER BY value DESC, l_partkey""".stripMargin

  // -- q12: shipping priority classes (join + conditional two-way count) ----
  private val q12: Q = (s, dir) => {
    val t = Tables(s, dir)
    val hi = col("o_orderpriority") === "1-URGENT" ||
             col("o_orderpriority") === "2-HIGH"
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") <  lit("1997-01-01"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey") &&
                      col("l_shipdate") > col("o_orderdate"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }
  private val q12Sql =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey AND l_shipdate > o_orderdate
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // -- q13: customer order-count distribution (outer join + two-level agg) --
  private val q13: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.customer
      .join(t.orders.filter(col("o_orderpriority") =!= "5-LOW"),
            col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }
  private val q13Sql =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // -- q14: promo revenue ratio (join + conditional agg, single row) --------
  private val q14: Q = (s, dir) => {
    val t = Tables(s, dir)
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-09-01") &&
              col("l_shipdate") <  lit("1996-10-01"))
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_type") === "ECONOMY", rev).otherwise(0.0)) * 100.0
          / sum(rev), 4).as("promo_revenue"))
  }
  private val q14Sql =
    """SELECT round(100.00 * sum(CASE WHEN p_type = 'ECONOMY'
      |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  // -- q15: top supplier (CTE revenue view + scalar max equality) -----------
  private val q15: Q = (s, dir) => {
    val t = Tables(s, dir)
    val revenue = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") <  lit("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("max_revenue"))
    t.supplier
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_revenue"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }
  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // -- q16: supplier count per part attrs (anti join + count distinct) ------
  private val q16: Q = (s, dir) => {
    val t = Tables(s, dir)
    val badSupp = t.supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    t.lineitem
      .join(t.part.filter(col("p_brand") =!= "Brand#1" &&
              col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)),
            col("l_partkey") === col("p_partkey"))
      .join(badSupp, col("l_suppkey") === col("s_suppkey"),
            "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
               col("p_size"))
  }
  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1'
      |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // -- q17: small-quantity orders (correlated avg → decorrelated broadcast
  //         join on per-part average) ---------------------------------------
  private val q17: Q = (s, dir) => {
    val t = Tables(s, dir)
    val partAvg = t.lineitem.groupBy(col("l_partkey").as("pa_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    t.lineitem
      .join(t.part.filter(col("p_brand") === "Brand#3"),
            col("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("pa_partkey"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }
  private val q17Sql =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
      |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  // -- q18: large-volume customers (IN over HAVING subquery → semi join) ----
  private val q18: Q = (s, dir) => {
    val t = Tables(s, dir)
    val bigOrders = t.lineitem.groupBy(col("l_orderkey").as("bo_orderkey"))
      .agg(sum(col("l_quantity")).as("bo_qty"))
      .filter(col("bo_qty") > 250)
      .select(col("bo_orderkey"))
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(bigOrders, col("o_orderkey") === col("bo_orderkey"), "left_semi")
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
               col("o_orderdate"), col("o_totalprice"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }
  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  round(sum(l_quantity), 2) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      |LIMIT 100""".stripMargin

  // -- q19: disjunctive predicates join (OR-of-conjunctions pushdown) -------
  private val q19: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
         col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#17" && col("p_size").between(1, 10) &&
         col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#25" && col("p_size").between(1, 15) &&
         col("l_quantity").between(20, 30)))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }
  private val q19Sql =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND ((p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5
      |        AND l_quantity BETWEEN 1 AND 11)
      |    OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 10
      |        AND l_quantity BETWEEN 10 AND 20)
      |    OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15
      |        AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  // -- q20: nested semi-join chain (IN → IN with HAVING) --------------------
  private val q20: Q = (s, dir) => {
    val t = Tables(s, dir)
    val redParts = t.part.filter(col("p_name").like("red%"))
      .select(col("p_partkey"))
    val bigShippers = t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
              col("l_shipdate") <  lit("1997-01-01"))
      .join(redParts, col("l_partkey") === col("p_partkey"),
            "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("ship_qty"))
      .filter(col("ship_qty") > 50)
      .select(col("l_suppkey"))
    t.supplier
      .join(bigShippers, col("s_suppkey") === col("l_suppkey"),
            "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }
  private val q20Sql =
    """SELECT s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part
      |                      WHERE p_name LIKE 'red%')
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
      |ORDER BY s_name""".stripMargin

  // -- q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS lineitem
  //         self-joins → semi + anti joins on renamed columns) --------------
  private val q21: Q = (s, dir) => {
    val t = Tables(s, dir)
    val l1 = t.lineitem
    val l2 = t.lineitem.select(col("l_orderkey").as("l2_orderkey"),
                               col("l_suppkey").as("l2_suppkey"))
    val l3 = t.lineitem.select(col("l_orderkey").as("l3_orderkey"),
                               col("l_suppkey").as("l3_suppkey"),
                               col("l_shipdate").as("l3_shipdate"))
    l1.join(t.orders.filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"))
      .join(l2, col("l_orderkey") === col("l2_orderkey") &&
                col("l_suppkey") =!= col("l2_suppkey"), "left_semi")
      .join(l3, col("l_orderkey") === col("l3_orderkey") &&
                col("l_suppkey") =!= col("l3_suppkey") &&
                col("l3_shipdate") > col("l_shipdate"), "left_anti")
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }
  private val q21Sql =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation, region
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  // -- q22: global sales opportunity (scalar avg subquery + anti join) ------
  private val q22: Q = (s, dir) => {
    val t = Tables(s, dir)
    val codes = Seq("10", "11", "12", "13", "14", "15", "16")
    val avgBal = t.customer.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    t.customer
      .withColumn("cntrycode", substring(col("c_name"), 16, 2))
      .filter(col("cntrycode").isin(codes: _*))
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      // "no high-value orders" keeps the anti-join non-degenerate at tiny
      // scale factors, where every customer has at least one order
      .join(t.orders.filter(col("o_totalprice") > 400000.0),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
           round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }
  private val q22Sql =
    """SELECT cntrycode, count(*) AS numcust,
      |  round(sum(c_acctbal), 2) AS totacctbal
      |FROM (SELECT substr(c_name, 16, 2) AS cntrycode, c_acctbal, c_custkey
      |      FROM customer
      |      WHERE substr(c_name, 16, 2) IN ('10','11','12','13','14','15','16')
      |        AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                         WHERE c_acctbal > 0.00)) custsale
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_totalprice > 400000.0)
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin

  def defs: Map[String, Q] = Map(
    "tpch_q1" -> q1, "tpch_q2" -> q2, "tpch_q3" -> q3, "tpch_q4" -> q4,
    "tpch_q5" -> q5, "tpch_q6" -> q6, "tpch_q7" -> q7, "tpch_q8" -> q8,
    "tpch_q9" -> q9, "tpch_q10" -> q10, "tpch_q11" -> q11, "tpch_q12" -> q12,
    "tpch_q13" -> q13, "tpch_q14" -> q14, "tpch_q15" -> q15,
    "tpch_q16" -> q16, "tpch_q17" -> q17, "tpch_q18" -> q18,
    "tpch_q19" -> q19, "tpch_q20" -> q20, "tpch_q21" -> q21,
    "tpch_q22" -> q22)

  def oracle: Map[String, String] = Map(
    "tpch_q1" -> q1Sql, "tpch_q2" -> q2Sql, "tpch_q3" -> q3Sql,
    "tpch_q4" -> q4Sql, "tpch_q5" -> q5Sql, "tpch_q6" -> q6Sql,
    "tpch_q7" -> q7Sql, "tpch_q8" -> q8Sql, "tpch_q9" -> q9Sql,
    "tpch_q10" -> q10Sql, "tpch_q11" -> q11Sql, "tpch_q12" -> q12Sql,
    "tpch_q13" -> q13Sql, "tpch_q14" -> q14Sql, "tpch_q15" -> q15Sql,
    "tpch_q16" -> q16Sql, "tpch_q17" -> q17Sql, "tpch_q18" -> q18Sql,
    "tpch_q19" -> q19Sql, "tpch_q20" -> q20Sql, "tpch_q21" -> q21Sql,
    "tpch_q22" -> q22Sql)
}
