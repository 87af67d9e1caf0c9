package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import Exact._

/** Relational query suite over the driver tables.
  *
  * Each query generalizes an operator class from SURVEY.md §2 (the
  * reference executes these inside PostgreSQL; here they are Catalyst
  * logical plans). Every query has a DuckDB oracle twin in [[oracle]]
  * with identical column names and deterministic ORDER BY.
  *
  * Scale notes (100 TB posture) are on each query: which side is
  * broadcast, where the shuffles are, what prunes.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q01 — grouped multi-aggregate (A1 `trips_lambda.py:131-145`
  // generalized to the TPC-H Q1 shape). One shuffle on the group keys;
  // partial aggregation map-side; scan prunes to 7 of 11 columns and
  // pushes the shipdate predicate to parquet row groups.
  // ---------------------------------------------------------------------
  private def q01(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        fixedSum(col("l_extendedprice")).as("sum_base_price"),
        fixedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        fixedSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        fixedAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  sum(l_quantity) AS sum_qty,
       |  ${fixedSumSql("l_extendedprice")} AS sum_base_price,
       |  ${fixedSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
       |  ${fixedSumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
       |  sum(l_quantity) / count(*) AS avg_qty,
       |  ${fixedAvgSql("l_extendedprice")} AS avg_price,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // q02 — projection + pushed range/equality predicates (P1, P4, P6;
  // `trips_lambda.py:96-106`). No shuffle except the output sort; the
  // three predicates and the 5-column projection reach the parquet scan.
  // ---------------------------------------------------------------------
  private def q02(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-01-01")) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("disc_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  l_extendedprice * (1.0 - l_discount) AS disc_price
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_shipdate <  TIMESTAMP '1996-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------------
  // q03 — fact-dimension star join + aggregate (J4, `README.md:73-83`).
  // customer is small relative to lineitem → broadcast; orders⋈lineitem
  // shuffles on orderkey. At 100 TB, customer stays broadcast-able per
  // segment; AQE re-plans if not.
  // ---------------------------------------------------------------------
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    // two-phase: pre-aggregate per (segment, orderkey), then count
    // groups — a mixed countDistinct+sum aggregate makes Catalyst
    // Expand-replicate the whole joined scan per distinct expression
    // (measured 2×); this shape is one scan, no Expand, and the
    // second shuffle carries one row per order. Exactness holds:
    // quantities are integral doubles and revenue is scaled-long
    // summed in both phases (associative).
    broadcast(c)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_mktsegment"), col("o_orderkey"))
      .agg(
        sum(col("l_quantity")).as("q1"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 10000).cast("long")).as("r1"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("order_cnt"),
        sum(col("q1")).as("total_qty"),
        (sum(col("r1")) / 10000.0).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  private val q03Sql =
    s"""SELECT c_mktsegment,
       |  count(DISTINCT o_orderkey) AS order_cnt,
       |  sum(l_quantity) AS total_qty,
       |  ${fixedSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
       |FROM customer
       |JOIN orders   ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // q04 — snowflake dimension chain (J4). region and nation are tiny →
  // both broadcast; zero shuffles before the final 5-row aggregate.
  // ---------------------------------------------------------------------
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        countDistinct(col("n_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"),
        fixedSum(col("c_acctbal")).as("acct_total"))
      .orderBy(col("r_name"))
  }

  private val q04Sql =
    s"""SELECT r_name,
       |  count(DISTINCT n_nationkey) AS n_nations,
       |  count(*) AS n_customers,
       |  ${fixedSumSql("c_acctbal")} AS acct_total
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name
       |ORDER BY r_name""".stripMargin

  // ---------------------------------------------------------------------
  // q05 — left-semi join (EXISTS; SURVEY §2.3 "not in reference" API
  // surface). Semi joins ship only the join key of the right side.
  // ---------------------------------------------------------------------
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 150000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val q05Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q06 — left-anti join (NOT EXISTS).
  // ---------------------------------------------------------------------
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  private val q06Sql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q07 — global top-k (O1 generalized; `trips_lambda.py:163`). Spark
  // plans orderBy+limit as TakeOrderedAndProject: per-partition heaps,
  // no total sort — the right plan at any scale. Unique tiebreak key
  // keeps the result deterministic.
  // ---------------------------------------------------------------------
  private def q07(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)

  private val q07Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 25""".stripMargin

  // ---------------------------------------------------------------------
  // q08 — distinct aggregation (SURVEY §2.4 north-star addition).
  // countDistinct expands to a two-phase aggregate; exact, shuffle on
  // (group, distinct) then (group).
  // ---------------------------------------------------------------------
  private def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        fixedSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderpriority"))

  private val q08Sql =
    s"""SELECT o_orderpriority,
       |  count(*) AS n_orders,
       |  count(DISTINCT o_custkey) AS n_customers,
       |  ${fixedSumSql("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q09 — rollup (hierarchical totals; SURVEY §2.4 north-star).
  // ---------------------------------------------------------------------
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        fixedSum(col("c_acctbal")).as("acct_total"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  private val q09Sql =
    s"""SELECT r_name, n_name,
       |  count(*) AS n_customers,
       |  ${fixedSumSql("c_acctbal")} AS acct_total
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // q10 — set operations (SURVEY §2.7: absent from the reference,
  // required API surface). Three tagged branches in one result.
  // ---------------------------------------------------------------------
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val buyers = t(s, dir, "orders")
      .select(col("o_custkey").as("custkey")).distinct()
    val rich = t(s, dir, "customer").filter(col("c_acctbal") > 7500)
      .select(col("c_custkey").as("custkey")).distinct()
    val u = buyers.union(rich).distinct().withColumn("op", lit("union"))
    val i = buyers.intersect(rich).withColumn("op", lit("intersect"))
    val e = rich.except(buyers).withColumn("op", lit("except"))
    u.union(i).union(e)
      .select(col("op"), col("custkey"))
      .orderBy(col("op"), col("custkey"))
  }

  private val q10Sql =
    """WITH buyers AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
      |rich AS (SELECT DISTINCT c_custkey AS custkey FROM customer
      |         WHERE c_acctbal > 7500)
      |SELECT 'union' AS op, custkey
      |  FROM (SELECT custkey FROM buyers UNION SELECT custkey FROM rich)
      |UNION ALL
      |SELECT 'intersect' AS op, custkey
      |  FROM (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM rich)
      |UNION ALL
      |SELECT 'except' AS op, custkey
      |  FROM (SELECT custkey FROM rich EXCEPT SELECT custkey FROM buyers)
      |ORDER BY op, custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q87 — FULL OUTER join (the one join type the suite didn't gate):
  // year-over-year customer activity, 1994 vs 1995 — customers present
  // in either year survive, absent sides coalesce to zero. Both sides
  // are already-aggregated (one row per customer-year), so the outer
  // join's shuffle carries reduced rows, never the orders fact.
  // Spend summed as e2 fixed-point BIGINT (order-independent, exact).
  // ---------------------------------------------------------------------
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def yr(y: Int): DataFrame =
      o.filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey").as(s"ck$y"))
        .agg(count(lit(1)).as(s"n_$y"),
          sum(round(col("o_totalprice") * 100).cast("long"))
            .as(s"spend_e2_$y"))
    yr(1994).join(yr(1995), col("ck1994") === col("ck1995"), "full_outer")
      .select(
        coalesce(col("ck1994"), col("ck1995")).as("custkey"),
        coalesce(col("n_1994"), lit(0L)).as("n_1994"),
        coalesce(col("spend_e2_1994"), lit(0L)).as("spend_e2_1994"),
        coalesce(col("n_1995"), lit(0L)).as("n_1995"),
        coalesce(col("spend_e2_1995"), lit(0L)).as("spend_e2_1995"))
      .orderBy(col("custkey"))
  }

  private val q87Sql =
    """WITH y94 AS (
      |  SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS sp
      |  FROM orders WHERE year(o_orderdate) = 1994 GROUP BY o_custkey),
      |y95 AS (
      |  SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS sp
      |  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey)
      |SELECT COALESCE(y94.ck, y95.ck) AS custkey,
      |  COALESCE(y94.n, 0) AS n_1994,
      |  COALESCE(y94.sp, 0) AS spend_e2_1994,
      |  COALESCE(y95.n, 0) AS n_1995,
      |  COALESCE(y95.sp, 0) AS spend_e2_1995
      |FROM y94 FULL OUTER JOIN y95 ON y94.ck = y95.ck
      |ORDER BY custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_star_join_agg" -> (q03 _),
    "q04_dim_snowflake" -> (q04 _),
    "q05_semi_join" -> (q05 _),
    "q06_anti_join" -> (q06 _),
    "q07_topk" -> (q07 _),
    "q08_distinct_agg" -> (q08 _),
    "q09_rollup" -> (q09 _),
    "q10_setops" -> (q10 _),
    "q87_full_outer" -> (q87 _))

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_star_join_agg" -> q03Sql,
    "q04_dim_snowflake" -> q04Sql,
    "q05_semi_join" -> q05Sql,
    "q06_anti_join" -> q06Sql,
    "q07_topk" -> q07Sql,
    "q08_distinct_agg" -> q08Sql,
    "q09_rollup" -> q09Sql,
    "q10_setops" -> q10Sql,
    "q87_full_outer" -> q87Sql)
}
