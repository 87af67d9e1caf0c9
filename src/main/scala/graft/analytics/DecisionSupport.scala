package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.PlanStats.Pinned

/** Decision-support tier (session 9): the classic TPC-H reporting
  * shapes not yet in the gate — customer distribution incl. the
  * zero-join side (Q13), correlated-average filters decorrelated to
  * joins (Q17), group-HAVING top-k (Q18), EXISTS with a cross-table
  * predicate (Q4), the only-late-supplier exists/not-exists matrix
  * (Q21), promo share (Q14), per-period argmax (Q15) and the
  * returned-items report (Q10) — each adapted to the driver schema
  * (no partsupp/phone/receiptdate columns) and re-expressed
  * Spark-first: correlated subqueries become broadcast joins of
  * dimension-grain aggregates, EXISTS becomes a semi join, argmax
  * becomes an aggregate join-back — never a driver loop, never an
  * unpartitioned window.
  *
  * Shapes follow the public TPC-H specification (transaction
  * processing council); constants re-picked for this dataset's
  * ranges so every query returns non-trivial rows at sf0.001+.
  */
object DecisionSupport {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q316 — customer order-count distribution (TPC-H Q13): how many
  // customers placed k orders, INCLUDING k=0 — the left join whose
  // unmatched side is the point. Customer grain aggregates once;
  // the distribution is a second tiny aggregate.
  // ---------------------------------------------------------------------
  private def q316(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey"))
      .join(t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  private val q316Sql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------------
  // q317 — small-quantity revenue (TPC-H Q17): revenue lost to
  // below-average-fifth orders of one brand's parts. The spec's
  // correlated per-part AVG decorrelates into a part-grain aggregate
  // broadcast back onto the fact rows; the 0.2·avg comparison
  // cross-multiplies to exact integers (5·q·n < Σq). One fact scan
  // feeds both the per-part average and the filtered revenue (pin).
  // ---------------------------------------------------------------------
  private def q317(s: SparkSession, dir: String): DataFrame = {
    val parts7 = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#7")
      .select(col("p_partkey"))
    val lip = t(s, dir, "lineitem")
      .join(broadcast(parts7), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey").as("pk"),
        col("l_quantity").cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("price_e2"))
      .pin() // per-part average + qualifying rows share this slice
    val avgQ = lip.groupBy("pk")
      .agg(sum("q").as("sum_q"), count(lit(1)).as("n_li"))
    lip.join(broadcast(avgQ), Seq("pk"))
      .filter(col("q") * 5 * col("n_li") < col("sum_q"))
      .agg(count(lit(1)).as("n_rows"), sum("price_e2").as("rev_e2"))
      .select(col("n_rows"), col("rev_e2"),
        round(col("rev_e2").cast("double") / 7.0).cast("long")
          .as("avg_weekly_e2"))
  }

  private val q317Sql =
    """WITH lip AS (
      |  SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS q,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_e2
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#7'),
      |avgq AS (
      |  SELECT pk, CAST(sum(q) AS BIGINT) AS sum_q,
      |    CAST(count(*) AS BIGINT) AS n_li
      |  FROM lip GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(price_e2) AS BIGINT) AS rev_e2,
      |  CAST(round(CAST(sum(price_e2) AS DOUBLE) / 7.0) AS BIGINT)
      |    AS avg_weekly_e2
      |FROM lip JOIN avgq USING (pk)
      |WHERE q * 5 * n_li < sum_q""".stripMargin

  // ---------------------------------------------------------------------
  // q318 — large-volume orders (TPC-H Q18): orders whose total
  // quantity exceeds 120 (HAVING over the fact grain), top 20 by
  // price. The order-grain aggregate shuffles once on the join key
  // it already needs; the cut is a bounded TakeOrdered.
  // ---------------------------------------------------------------------
  private def q318(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 120)
    t(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        round(col("o_totalprice") * 100).cast("long").as("price_e2"),
        col("sum_qty"))
      .orderBy(col("price_e2").desc, col("o_orderkey"))
      .limit(20)
  }

  private val q318Sql =
    """SELECT c_name, c_custkey, o_orderkey,
      |  CAST(o_orderdate AS DATE) AS o_date,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_e2,
      |  sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT))
      |        AS BIGINT) AS sum_qty
      |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 120) big
      |  ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY price_e2 DESC, o_orderkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q319 — priority of slow orders (TPC-H Q4): per priority, count
  // of one quarter's orders with at least one lineitem shipped more
  // than 90 days after ordering — EXISTS with a cross-table
  // predicate, planned as a LEFT SEMI join (each order counted once
  // however many lineitems qualify).
  // ---------------------------------------------------------------------
  private def q319(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01") &&
        col("o_orderdate") < lit("1996-10-01"))
      .join(t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  private val q319Sql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q320 — the only late supplier (TPC-H Q21 shape): suppliers who,
  // on multi-supplier orders, were the SINGLE one to ship >180 days
  // late. The spec's EXISTS/NOT-EXISTS pair decorrelates to ONE
  // order-grain aggregate (distinct suppliers, distinct late
  // suppliers) joined back to the late pairs — same truth table,
  // one shuffle on the key the pairs already carry, no double
  // self-join of the fact table.
  // ---------------------------------------------------------------------
  private def q320(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(max((col("l_shipdate") > col("o_orderdate") +
        expr("INTERVAL 180 DAYS")).cast("long")).as("late"))
      .pin() // order stats + qualifying pairs share it
    val perOrder = pairs.groupBy(col("ok").as("ok2"))
      .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
    pairs.filter(col("late") === 1)
      .join(perOrder, col("ok") === col("ok2"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("sk"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("sk"))
      .limit(20)
  }

  private val q320Sql =
    """WITH pairs AS (
      |  SELECT l_orderkey AS ok, l_suppkey AS sk,
      |    CAST(max(CAST(l_shipdate > o_orderdate + INTERVAL 180 DAY
      |      AS BIGINT)) AS BIGINT) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |perorder AS (
      |  SELECT ok, CAST(count(*) AS BIGINT) AS n_supp,
      |    CAST(sum(late) AS BIGINT) AS n_late
      |  FROM pairs GROUP BY 1)
      |SELECT sk, CAST(count(*) AS BIGINT) AS numwait
      |FROM pairs JOIN perorder USING (ok)
      |WHERE late = 1 AND n_supp >= 2 AND n_late = 1
      |GROUP BY sk
      |ORDER BY numwait DESC, sk LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q321 — promo revenue share by month (TPC-H Q14): discounted
  // revenue share of PROMO-type parts per ship month — conditional
  // aggregation over one fact scan with the part dimension
  // broadcast; the share is one e6-rounded division per month row.
  // ---------------------------------------------------------------------
  private def q321(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(trunc(col("l_shipdate"), "month").cast("date").as("mon"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")).as("rev_e2"),
        sum(when(col("p_type") === "PROMO",
          round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100).cast("long")).otherwise(0L)).as("promo_e2"))
      .select(col("mon"), col("promo_e2"), col("rev_e2"),
        round(col("promo_e2").cast("double") / col("rev_e2").cast("double")
          * 1000000.0).cast("long").as("promo_share_e6"))
      .orderBy(col("mon"))

  private val q321Sql =
    """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mon,
      |  CAST(sum(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |      AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_e2,
      |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |    AS BIGINT)) AS BIGINT) AS rev_e2,
      |  CAST(round(CAST(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |        AS BIGINT) ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |      AS BIGINT)) AS DOUBLE) * 1000000.0) AS BIGINT)
      |    AS promo_share_e6
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY mon""".stripMargin

  // ---------------------------------------------------------------------
  // q322 — top supplier per quarter (TPC-H Q15): each quarter's
  // highest-revenue supplier. The spec's view + scalar-max
  // decorrelates to a quarter-grain max joined back (ties broken by
  // lowest supplier key) — an argmax as two aggregates and one
  // equi-join, no window over the supplier grain.
  // ---------------------------------------------------------------------
  private def q322(s: SparkSession, dir: String): DataFrame = {
    val qrev = t(s, dir, "lineitem")
      .groupBy((year(col("l_shipdate")) * 10 +
        quarter(col("l_shipdate"))).cast("long").as("yq"),
        col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")).as("rev_e2"))
      .pin() // quarter max + join-back share it
    val mx = qrev.groupBy(col("yq").as("yq2"))
      .agg(max("rev_e2").as("max_e2"))
    qrev.join(broadcast(mx),
        col("yq") === col("yq2") && col("rev_e2") === col("max_e2"))
      .groupBy(col("yq"))
      .agg(min(col("l_suppkey")).as("s_suppkey"),
        max(col("rev_e2")).as("rev_e2"))
      .orderBy(col("yq"))
  }

  private val q322Sql =
    """WITH qrev AS (
      |  SELECT CAST(year(l_shipdate) * 10 + quarter(l_shipdate)
      |      AS BIGINT) AS yq,
      |    l_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |      AS BIGINT)) AS BIGINT) AS rev_e2
      |  FROM lineitem GROUP BY 1, 2),
      |mx AS (SELECT yq, CAST(max(rev_e2) AS BIGINT) AS max_e2
      |       FROM qrev GROUP BY 1)
      |SELECT yq, CAST(min(l_suppkey) AS BIGINT) AS s_suppkey,
      |  CAST(max(rev_e2) AS BIGINT) AS rev_e2
      |FROM qrev JOIN mx USING (yq)
      |WHERE rev_e2 = max_e2
      |GROUP BY yq ORDER BY yq""".stripMargin

  // ---------------------------------------------------------------------
  // q323 — returned-item losses by customer (TPC-H Q10): one
  // quarter's discounted revenue on RETURNED lineitems, per
  // customer with nation context, top 20. Facts shuffle once on the
  // order key; customer/nation ride as broadcast dims; the cut is a
  // bounded TakeOrdered.
  // ---------------------------------------------------------------------
  private def q323(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .join(t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100).cast("long")).as("rev_e2"))
      .join(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("rev_e2"))
      .orderBy(col("rev_e2").desc, col("c_custkey"))
      .limit(20)

  private val q323Sql =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(rev_e2 AS BIGINT) AS rev_e2
      |FROM (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
      |      AS BIGINT)) AS BIGINT) AS rev_e2
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1996-04-01'
      |    AND l_returnflag = 'R'
      |  GROUP BY 1)
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY rev_e2 DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q344 — important part stock (TPC-H Q11 shape): parts whose total
  // revenue exceeds 1.5× the AVERAGE part's — the scalar-subquery
  // HAVING, made scale-invariant (a fixed global fraction empties as
  // the part count grows). The global total broadcasts back as a
  // 1-row cross join (never a second fact scan), and the compare
  // cross-multiplies to exact integers in decimal(38,0):
  // 2·val_e2·n_parts > 3·tot_e2 — val_e2·n_parts ≈ 1e13·2e7 at
  // 100 TB overflows INT64, so the PRODUCT is decimal; only BIGINTs
  // reach the output schema (the q307 lesson). One fact scan feeds
  // both sides (pin).
  // ---------------------------------------------------------------------
  private def q344(s: SparkSession, dir: String): DataFrame = {
    val perPart = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("val_e2"))
      .pin() // global total + threshold filter share this aggregate
    val tot = perPart.agg(sum("val_e2").as("tot_e2"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(tot))
      .filter(col("val_e2").cast("decimal(38,0)") * 2 * col("n_parts") >
        col("tot_e2").cast("decimal(38,0)") * 3)
      .select(col("l_partkey"), col("val_e2"))
      .orderBy(col("val_e2").desc, col("l_partkey"))
  }

  private val q344Sql =
    """WITH perpart AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |      AS BIGINT) AS val_e2
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(sum(val_e2) AS BIGINT) AS tot_e2,
      |        CAST(count(*) AS BIGINT) AS n_parts FROM perpart)
      |SELECT l_partkey, val_e2
      |FROM perpart, tot
      |WHERE CAST(val_e2 AS HUGEINT) * 2 * n_parts
      |  > CAST(tot_e2 AS HUGEINT) * 3
      |ORDER BY val_e2 DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------------
  // q345 — supplier count by part attributes (TPC-H Q16 shape): per
  // (brand, type, size) group, how many DISTINCT suppliers actually
  // shipped that part — the part–supplier relation derived from the
  // fact table (this schema has no partsupp), suppliers in bad
  // standing (negative balance — the spec's complaints exclusion)
  // removed by NOT IN, planned as an anti join of a broadcast-sized
  // exclusion list. The pair-distinct shuffles once on l_partkey ×
  // l_suppkey; the group count is a second, far smaller aggregate.
  // ---------------------------------------------------------------------
  private def q345(s: SparkSession, dir: String): DataFrame = {
    val badSupp = t(s, dir, "supplier")
      .filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val ps = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    ps.join(t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  private val q345Sql =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_suppkey NOT IN
      |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------------
  // q346 — idle wealthy customers (TPC-H Q22 shape): per nation,
  // customers with above-average positive balance and NO order in the
  // final quarter — the avg scalar subquery plus NOT EXISTS (against
  // a filtered order set: in this data every customer has SOME order,
  // so the spec's never-ordered predicate would be vacuous). The
  // average compare cross-multiplies to exact integers
  // (bal_e2·n_pos vs sum_e2 in decimal — bal_e2·n ≈ 1e6·1.5e9 at
  // 100 TB overflows INT64), and NOT EXISTS plans as a LEFT ANTI
  // join against the quarter's order keys.
  // ---------------------------------------------------------------------
  private def q346(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_e2"))
      .pin() // average + threshold filter share this scan
    val avg = cust.filter(col("bal_e2") > 0)
      .agg(sum("bal_e2").as("sum_e2"), count(lit(1)).as("n_pos"))
    cust.crossJoin(broadcast(avg))
      .filter(col("bal_e2").cast("decimal(38,0)") * col("n_pos") >
        col("sum_e2").cast("decimal(38,0)"))
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2001-10-01"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum("bal_e2").as("totbal_e2"))
      .orderBy(col("c_nationkey"))
  }

  private val q346Sql =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_e2
      |  FROM customer),
      |a AS (SELECT CAST(sum(bal_e2) AS BIGINT) AS sum_e2,
      |        CAST(count(*) AS BIGINT) AS n_pos
      |      FROM cust WHERE bal_e2 > 0)
      |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(bal_e2) AS BIGINT) AS totbal_e2
      |FROM cust, a
      |WHERE CAST(bal_e2 AS HUGEINT) * n_pos > CAST(sum_e2 AS HUGEINT)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '2001-10-01')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q316_order_count_dist" -> (q316 _),
    "q317_small_qty_revenue" -> (q317 _),
    "q318_large_orders" -> (q318 _),
    "q319_slow_order_priority" -> (q319 _),
    "q320_only_late_supplier" -> (q320 _),
    "q321_promo_share" -> (q321 _),
    "q322_top_supplier_quarter" -> (q322 _),
    "q323_returned_customers" -> (q323 _),
    "q344_part_value_fraction" -> (q344 _),
    "q345_supplier_cnt_by_attrs" -> (q345 _),
    "q346_idle_customers" -> (q346 _))

  val oracle: Map[String, String] = Map(
    "q316_order_count_dist" -> q316Sql,
    "q317_small_qty_revenue" -> q317Sql,
    "q318_large_orders" -> q318Sql,
    "q319_slow_order_priority" -> q319Sql,
    "q320_only_late_supplier" -> q320Sql,
    "q321_promo_share" -> q321Sql,
    "q322_top_supplier_quarter" -> q322Sql,
    "q323_returned_customers" -> q323Sql,
    "q344_part_value_fraction" -> q344Sql,
    "q345_supplier_cnt_by_attrs" -> q345Sql,
    "q346_idle_customers" -> q346Sql)
}
