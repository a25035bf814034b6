package graft.queries

import graft.Tables
import graft.operators.Joins
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-operator coverage queries for SURVEY.md §2.2-2.7: projection/filter,
  * all seven join types (reference dataframe.rs:132-163), aggregation incl.
  * DISTINCT modifiers (reference functions.rs:158-178,297-302), ROLLUP/CUBE/
  * GROUPING SETS (SQL pass-through, reference context.rs:166), the full
  * window-function surface (reference functions.rs:111-138), sort with all
  * four nulls-ordering combos (reference expression.rs:119-123), limit/top-k
  * (reference dataframe.rs:102-112), and set operations (SQL pass-through).
  *
  * Determinism rules for the DuckDB hash compare: every query ends in a
  * total ORDER BY over a unique key set; Spark's sort default is
  * nulls-first-asc / nulls-last-desc, so every oracle ORDER BY spells
  * NULLS FIRST/LAST explicitly; double aggregates are rounded identically
  * on both sides.
  */
object OpsRelational extends Suite {

  // -- §2.2 projection / with_column / filter -------------------------------
  private val project: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"))
      // Row-level arithmetic is left unrounded: IEEE ops on identical
      // inputs are bit-exact across engines, while decimal rounding of
      // exact-half products is not (Spark HALF_UP on shortest-repr vs
      // binary-value rounding elsewhere).
      .withColumn("net", col("l_extendedprice")
        * (lit(1) - col("l_discount")))
      .filter(col("l_orderkey") < 500)
      .orderBy(col("l_orderkey"), col("l_linenumber"),
               col("l_quantity"), col("l_extendedprice"))
  }
  private val projectSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  l_discount,
      |  l_extendedprice * (1 - l_discount) AS net
      |FROM lineitem WHERE l_orderkey < 500
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin

  private val filter: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .filter(col("o_orderstatus").isin("F", "O") &&
              col("o_totalprice").between(1000.0, 20000.0) &&
              col("o_orderpriority").startsWith("1") &&
              !col("o_custkey").isNull)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }
  private val filterSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderstatus IN ('F','O')
      |  AND o_totalprice BETWEEN 1000.0 AND 20000.0
      |  AND starts_with(o_orderpriority, '1')
      |  AND o_custkey IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  // -- §2.3 joins: seven types through the Joins façade ---------------------
  // Key-subset joins engineered so outer sides produce NULL rows.
  private def custSub(t: Tables) =
    t.customer.filter(col("c_custkey") < 100)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
  private def ordSub(t: Tables) =
    t.orders.filter(col("o_orderdate") >= lit("1997-01-01") &&
                    col("o_orderdate") < lit("1997-02-01"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private def joinQ(how: String): Q = (s, dir) => {
    val t = Tables(s, dir)
    val j = Joins.join(ordSub(t), custSub(t),
                       Seq("o_custkey"), Seq("c_custkey"), how)
    val cols = how match {
      case "semi" | "anti" =>
        Seq(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      case "right_semi" =>
        Seq(col("c_custkey"), col("c_name"))
      case _ =>
        Seq(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("c_custkey"), col("c_name"))
    }
    val keys = how match {
      case "semi" | "anti" => Seq(col("o_orderkey"))
      case "right_semi"    => Seq(col("c_custkey"))
      case _               => Seq(col("o_orderkey"), col("c_custkey"))
    }
    j.select(cols: _*).orderBy(keys: _*)
  }

  private val joinBase =
    """FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |        AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00') o
      |  %s
      |  (SELECT c_custkey, c_name, c_nationkey FROM customer
      |   WHERE c_custkey < 100) c
      |  ON o.o_custkey = c.c_custkey""".stripMargin
  private def joinSql(kind: String): String =
    s"""SELECT o_orderkey, o_custkey, o_totalprice, c_custkey, c_name
       |${joinBase.format(kind)}
       |ORDER BY o_orderkey NULLS FIRST, c_custkey NULLS FIRST""".stripMargin

  private val joinSemiSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM customer
      |              WHERE c_custkey < 100 AND c_custkey = o_custkey)
      |ORDER BY o_orderkey""".stripMargin
  private val joinAntiSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00'
      |  AND NOT EXISTS (SELECT 1 FROM customer
      |                  WHERE c_custkey < 100 AND c_custkey = o_custkey)
      |ORDER BY o_orderkey""".stripMargin
  private val joinRightSemiSql =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey < 100
      |  AND EXISTS (SELECT 1 FROM orders
      |              WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |                AND o_orderdate <  TIMESTAMP '1997-02-01 00:00:00'
      |                AND o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // -- §2.4 aggregation -----------------------------------------------------
  private val aggBasic: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           count(col("l_quantity")).as("n_qty"),
           round(sum(col("l_quantity")), 2).as("sum_qty"),
           round(avg(col("l_quantity")), 6).as("avg_qty"),
           min(col("l_quantity")).as("min_qty"),
           max(col("l_quantity")).as("max_qty"),
           min(col("l_shipdate")).as("min_ship"),
           max(col("l_shipdate")).as("max_ship"))
      .orderBy(col("l_returnflag"))
  }
  private val aggBasicSql =
    """SELECT l_returnflag, count(*) AS n, count(l_quantity) AS n_qty,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val aggDistinct: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_linestatus"))
      .agg(countDistinct(col("l_suppkey")).as("nd_supp"),
           countDistinct(col("l_partkey"), col("l_suppkey")).as("nd_ps"),
           round(sum_distinct(col("l_quantity")), 2).as("sumd_qty"),
           round(avg(col("l_discount")), 6).as("avg_disc"))
      .orderBy(col("l_linestatus"))
  }
  private val aggDistinctSql =
    """SELECT l_linestatus,
      |  count(DISTINCT l_suppkey) AS nd_supp,
      |  count(DISTINCT (l_partkey, l_suppkey)) AS nd_ps,
      |  round(sum(DISTINCT l_quantity), 2) AS sumd_qty,
      |  round(avg(l_discount), 6) AS avg_disc
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  private val countStar: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders.agg(count(lit(1)).as("n"))
  }
  private val countStarSql = "SELECT count(*) AS n FROM orders"

  /** HLL++ estimate — contract-level twin of the reference's HLL
    * `approx_distinct` (reference functions.rs:302). Raw estimates differ
    * across engines, so the gated output carries the accuracy CONTRACT
    * instead: the exact cardinality plus a boolean asserting the HLL
    * estimate landed within 5% of it (HLL++ at default rsd=5% — a miss is
    * a real implementation fault, not noise). The oracle emits the same
    * exact count and a literal true, so the driver's hash compare verifies
    * the estimate's tolerance, not just row shape. */
  private val aggApprox: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem.agg(
      approx_count_distinct(col("l_partkey")).as("approx"),
      countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("exact_parts"),
        (abs(col("approx") - col("exact_parts")).cast("double") /
          col("exact_parts") <= 0.05).as("within_5pct"))
  }
  private val aggApproxSql =
    """SELECT count(DISTINCT l_partkey) AS exact_parts,
      |       true AS within_5pct FROM lineitem""".stripMargin

  private val aggRollup: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sq"))
      .orderBy(col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)
  }
  private val aggRollupSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  round(sum(l_quantity), 2) AS sq
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  private val aggCube: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sq"))
      .orderBy(col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)
  }
  private val aggCubeSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  round(sum(l_quantity), 2) AS sq
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // -- pivot / unpivot: wide<->long reshaping. The DSL pivot with an
  //    explicit value list stays a single partial-agg pass (no distinct-
  //    values pre-query); the oracle is the portable FILTER-aggregation
  //    form. unpivot's oracle is the equivalent UNION ALL. ----------------
  private val pivotQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))
      .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
      .orderBy(col("l_returnflag"))
  }
  private val pivotSql =
    """SELECT l_returnflag,
      |  round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_f,
      |  round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_o
      |FROM lineitem GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  private val unpivotQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.part.unpivot(
        ids = Array(col("p_partkey")),
        values = Array(col("p_retailprice"), col("p_size").cast("double")),
        variableColumnName = "measure",
        valueColumnName = "val")
      .orderBy(col("p_partkey"), col("measure"))
  }
  private val unpivotSql =
    """SELECT p_partkey, measure, val FROM (
      |  SELECT p_partkey, 'p_retailprice' AS measure,
      |         p_retailprice AS val FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'p_size' AS measure,
      |         CAST(p_size AS DOUBLE) AS val FROM part)
      |ORDER BY p_partkey, measure""".stripMargin

  private val aggGroupingSets: Q = (s, dir) => {
    Tables(s, dir).lineitem.createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin)
  }
  private val aggGroupingSetsSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
      |                        (l_returnflag, l_linestatus))
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // -- §2.5 window functions ------------------------------------------------
  // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so the
  // window order and the final output order both use the full 6-column key
  // set that is unique — otherwise ranking/analytic results are
  // nondeterministic across engines.
  private def liSub(t: Tables) =
    t.lineitem.filter(col("l_orderkey") < 300)
  private val uniq = Seq(col("l_orderkey"), col("l_linenumber"),
    col("l_partkey"), col("l_suppkey"), col("l_quantity"),
    col("l_extendedprice"))
  private val uniqSql =
    "l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice"
  private val winSpec = Window.partitionBy(col("l_returnflag"))
    .orderBy(col("l_shipdate") +: uniq: _*)
  private val winSqlSpec =
    s"PARTITION BY l_returnflag ORDER BY l_shipdate, $uniqSql"

  private val windowRanking: Q = (s, dir) => {
    liSub(Tables(s, dir))
      .select(Seq(col("l_returnflag"),
        row_number().over(winSpec).as("rn"),
        rank().over(winSpec).as("rk"),
        dense_rank().over(winSpec).as("drk"),
        round(percent_rank().over(winSpec), 8).as("prk"),
        round(cume_dist().over(winSpec), 8).as("cd"),
        ntile(4).over(winSpec).as("nt")) ++ uniq: _*)
      .orderBy(uniq: _*)
  }
  private val windowRankingSql =
    s"""SELECT l_returnflag,
       |  CAST(row_number() OVER w AS INT) AS rn,
       |  CAST(rank() OVER w AS INT) AS rk,
       |  CAST(dense_rank() OVER w AS INT) AS drk,
       |  round(percent_rank() OVER w, 8) AS prk,
       |  round(cume_dist() OVER w, 8) AS cd,
       |  CAST(ntile(4) OVER w AS INT) AS nt,
       |  $uniqSql
       |FROM lineitem WHERE l_orderkey < 300
       |WINDOW w AS ($winSqlSpec)
       |ORDER BY $uniqSql""".stripMargin

  private val windowAnalytic: Q = (s, dir) => {
    liSub(Tables(s, dir))
      .select(Seq(
        lag(col("l_quantity"), 1).over(winSpec).as("lag_q"),
        lead(col("l_quantity"), 1).over(winSpec).as("lead_q"),
        first(col("l_quantity")).over(winSpec).as("first_q"),
        last(col("l_quantity")).over(winSpec).as("last_q"),
        nth_value(col("l_quantity"), 2).over(winSpec).as("nth2_q")) ++
        uniq: _*)
      .orderBy(uniq: _*)
  }
  private val windowAnalyticSql =
    s"""SELECT
       |  lag(l_quantity, 1) OVER w AS lag_q,
       |  lead(l_quantity, 1) OVER w AS lead_q,
       |  first_value(l_quantity) OVER w AS first_q,
       |  last_value(l_quantity) OVER w AS last_q,
       |  nth_value(l_quantity, 2) OVER w AS nth2_q,
       |  $uniqSql
       |FROM lineitem WHERE l_orderkey < 300
       |WINDOW w AS ($winSqlSpec
       |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY $uniqSql""".stripMargin

  private val windowAgg: Q = (s, dir) => {
    val whole = Window.partitionBy(col("l_returnflag"))
    liSub(Tables(s, dir))
      .select(Seq(
        round(sum(col("l_quantity")).over(whole), 2).as("part_sum"),
        round(avg(col("l_quantity")).over(whole), 6).as("part_avg"),
        count(lit(1)).over(whole).as("part_n"),
        round(sum(col("l_quantity")).over(winSpec), 2).as("running_sum")) ++
        uniq: _*)
      .orderBy(uniq: _*)
  }
  private val windowAggSql =
    s"""SELECT
       |  round(sum(l_quantity) OVER p, 2) AS part_sum,
       |  round(avg(l_quantity) OVER p, 6) AS part_avg,
       |  count(*) OVER p AS part_n,
       |  round(sum(l_quantity) OVER w, 2) AS running_sum,
       |  $uniqSql
       |FROM lineitem WHERE l_orderkey < 300
       |WINDOW p AS (PARTITION BY l_returnflag),
       |       w AS ($winSqlSpec)
       |ORDER BY $uniqSql""".stripMargin

  // -- §2.6 sort / limit / top-k -------------------------------------------
  /** All four nulls-ordering combos (reference expression.rs:119-123); nulls
    * are synthesized with nullif since the test tables are null-free. */
  private val sortNulls: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem.filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"),
              nullif(col("l_discount"), lit(0.0)).as("d_null"),
              nullif(col("l_tax"), lit(0.0)).as("t_null"))
      .orderBy(col("d_null").asc_nulls_first, col("t_null").desc_nulls_last,
               col("l_orderkey").asc, col("l_linenumber").asc)
  }
  private val sortNullsSql =
    """SELECT l_orderkey, l_linenumber,
      |  nullif(l_discount, 0.0) AS d_null, nullif(l_tax, 0.0) AS t_null
      |FROM lineitem WHERE l_orderkey < 300
      |ORDER BY d_null ASC NULLS FIRST, t_null DESC NULLS LAST,
      |  l_orderkey, l_linenumber""".stripMargin

  private val sortNulls2: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.lineitem.filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"),
              nullif(col("l_discount"), lit(0.0)).as("d_null"))
      .orderBy(col("d_null").asc_nulls_last,
               col("l_orderkey").desc_nulls_first,
               col("l_linenumber").asc)
  }
  private val sortNulls2Sql =
    """SELECT l_orderkey, l_linenumber, nullif(l_discount, 0.0) AS d_null
      |FROM lineitem WHERE l_orderkey < 300
      |ORDER BY d_null ASC NULLS LAST, l_orderkey DESC NULLS FIRST,
      |  l_linenumber""".stripMargin

  /** orderBy + limit — Spark fuses to TakeOrderedAndProject (top-k without a
    * total sort; the reference composes sort+limit the same way,
    * dataframe.rs:102-112). */
  private val topk: Q = (s, dir) => {
    val t = Tables(s, dir)
    t.orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)
      .select(col("o_orderkey"), col("o_totalprice"))
  }
  private val topkSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin

  /** GROUPED top-k through the custom whole-operator path (logical node +
    * strategy + bounded-heap exec, plans/GroupedTopK.scala): top-2 orders
    * per customer without sorting any partition. */
  private val groupedTopk: Q = (s, dir) => {
    val t = Tables(s, dir)
    graft.plans.GroupedTopK(t.orders, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }
  private val groupedTopkSql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 2 ORDER BY o_custkey, o_orderkey""".stripMargin

  // -- §2.7 set operations --------------------------------------------------
  private val unionAll: Q = (s, dir) => {
    val t = Tables(s, dir)
    val a = t.customer.filter(col("c_custkey") < 60)
      .select(col("c_custkey").as("k"))
    val b = t.customer.filter(col("c_custkey") >= 40 && col("c_custkey") < 80)
      .select(col("c_custkey").as("k"))
    a.union(b).orderBy(col("k"))
  }
  private val unionAllSql =
    """SELECT c_custkey AS k FROM customer WHERE c_custkey < 60
      |UNION ALL
      |SELECT c_custkey AS k FROM customer
      |WHERE c_custkey >= 40 AND c_custkey < 80
      |ORDER BY k""".stripMargin

  private val unionDistinct: Q = (s, dir) => {
    val t = Tables(s, dir)
    val a = t.customer.filter(col("c_custkey") < 60)
      .select(col("c_nationkey").as("k"))
    val b = t.customer.filter(col("c_custkey") >= 40 && col("c_custkey") < 80)
      .select(col("c_nationkey").as("k"))
    a.union(b).distinct().orderBy(col("k"))
  }
  private val unionDistinctSql =
    """SELECT c_nationkey AS k FROM customer WHERE c_custkey < 60
      |UNION
      |SELECT c_nationkey AS k FROM customer
      |WHERE c_custkey >= 40 AND c_custkey < 80
      |ORDER BY k""".stripMargin

  private val intersectQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    val a = t.orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
    val b = t.orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("k"))
    a.intersect(b).orderBy(col("k"))
  }
  private val intersectSql =
    """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY k""".stripMargin

  private val exceptQ: Q = (s, dir) => {
    val t = Tables(s, dir)
    val a = t.customer.filter(col("c_custkey") < 100)
      .select(col("c_custkey").as("k"))
    val b = t.customer.filter(col("c_custkey") >= 40)
      .select(col("c_custkey").as("k"))
    a.except(b).orderBy(col("k"))
  }
  private val exceptSql =
    """SELECT c_custkey AS k FROM customer WHERE c_custkey < 100
      |EXCEPT
      |SELECT c_custkey AS k FROM customer WHERE c_custkey >= 40
      |ORDER BY k""".stripMargin

  // -- deterministic grouped MODE: most frequent o_orderpriority per
  //    customer nation (count-grouped, then argmax per nation via the
  //    GroupedTopK bounded heap with a lexicographic tie-break — Spark's
  //    own mode() aggregate resolves ties nondeterministically, which can
  //    never pass a hash gate). ------------------------------------------
  private val aggMode: Q = (s, dir) => {
    val t = Tables(s, dir)
    val counts = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    graft.plans.GroupedTopK(counts, Seq("c_nationkey"),
        Seq(col("n").desc, col("o_orderpriority").asc), 1)
      .select(col("c_nationkey"), col("o_orderpriority").as("mode_prio"),
        col("n"))
      .orderBy(col("c_nationkey"))
  }
  private val aggModeSql =
    """WITH c AS (SELECT c_nationkey, o_orderpriority, count(*) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |r AS (SELECT c_nationkey, o_orderpriority, n, row_number() OVER
      |        (PARTITION BY c_nationkey
      |         ORDER BY n DESC, o_orderpriority) AS rn
      |      FROM c)
      |SELECT c_nationkey, o_orderpriority AS mode_prio, n
      |FROM r WHERE rn = 1 ORDER BY c_nationkey""".stripMargin

  def defs: Map[String, Q] = Map(
    "op_agg_mode" -> aggMode,
    "op_project" -> project,
    "op_filter" -> filter,
    "op_join_inner" -> joinQ("inner"),
    "op_join_left" -> joinQ("left"),
    "op_join_right" -> joinQ("right"),
    "op_join_full" -> joinQ("full"),
    "op_join_semi" -> joinQ("semi"),
    "op_join_anti" -> joinQ("anti"),
    "op_join_right_semi" -> joinQ("right_semi"),
    "op_agg_basic" -> aggBasic,
    "op_agg_distinct" -> aggDistinct,
    "op_count_star" -> countStar,
    "op_agg_approx_distinct" -> aggApprox,
    "op_agg_rollup" -> aggRollup,
    "op_pivot" -> pivotQ,
    "op_unpivot" -> unpivotQ,
    "op_agg_cube" -> aggCube,
    "op_agg_grouping_sets" -> aggGroupingSets,
    "op_window_ranking" -> windowRanking,
    "op_window_analytic" -> windowAnalytic,
    "op_window_agg" -> windowAgg,
    "op_sort_nulls" -> sortNulls,
    "op_sort_nulls2" -> sortNulls2,
    "op_topk" -> topk,
    "op_grouped_topk" -> groupedTopk,
    "op_union_all" -> unionAll,
    "op_union_distinct" -> unionDistinct,
    "op_intersect" -> intersectQ,
    "op_except" -> exceptQ)

  def oracle: Map[String, String] = Map(
    "op_agg_mode" -> aggModeSql,
    "op_project" -> projectSql,
    "op_filter" -> filterSql,
    "op_join_inner" -> joinSql("INNER JOIN"),
    "op_join_left" -> joinSql("LEFT OUTER JOIN"),
    "op_join_right" -> joinSql("RIGHT OUTER JOIN"),
    "op_join_full" -> joinSql("FULL OUTER JOIN"),
    "op_join_semi" -> joinSemiSql,
    "op_join_anti" -> joinAntiSql,
    "op_join_right_semi" -> joinRightSemiSql,
    "op_agg_basic" -> aggBasicSql,
    "op_agg_distinct" -> aggDistinctSql,
    "op_count_star" -> countStarSql,
    "op_agg_approx_distinct" -> aggApproxSql,
    "op_agg_rollup" -> aggRollupSql,
    "op_pivot" -> pivotSql,
    "op_unpivot" -> unpivotSql,
    "op_agg_cube" -> aggCubeSql,
    "op_agg_grouping_sets" -> aggGroupingSetsSql,
    "op_window_ranking" -> windowRankingSql,
    "op_window_analytic" -> windowAnalyticSql,
    "op_window_agg" -> windowAggSql,
    "op_sort_nulls" -> sortNullsSql,
    "op_sort_nulls2" -> sortNulls2Sql,
    "op_topk" -> topkSql,
    "op_grouped_topk" -> groupedTopkSql,
    "op_union_all" -> unionAllSql,
    "op_union_distinct" -> unionDistinctSql,
    "op_intersect" -> intersectSql,
    "op_except" -> exceptSql)
}
