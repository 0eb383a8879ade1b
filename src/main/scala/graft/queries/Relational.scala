package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator surface (SURVEY.md §2.4 J5, §2.5 A1/A5, §2.6 W1/O1/O2/
  * U1/U2, §2.2 P5): aggregation, multi-way joins, semi/anti joins, windows,
  * sort+limit, set ops, rollup — expressed DataFrame-first so Catalyst picks
  * broadcast/SMJ/partial-agg physical plans.
  *
  * Numeric discipline: monetary doubles are cast to decimal at the SOURCE and
  * all arithmetic stays in decimal, so Spark and the DuckDB oracle both do
  * exact arithmetic regardless of summation order. The FINAL output column is
  * then cast to double on BOTH sides (one IEEE rounding of the same exact
  * value → identical bits), so result hashing is stable under any driver
  * normalization — decimal outputs stringify scale-dependently
  * ("506627.00" vs float "506627.0") and are avoided at the result surface.
  * Int-valued aggregates surface as BIGINT on both sides for the same reason.
  */
object Relational {
  import Tables._

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def dbl(c: Column): Column = c.cast("double")

  // revenue term: exact decimal l_extendedprice * (1 - l_discount)
  private def revenue(): Column =
    dec(col("l_extendedprice")) * (lit(BigDecimal(1).setScale(2)) - dec(col("l_discount")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: hash aggregate with partial/final phases; filter pushed to scan.
    "q1_pricing_summary" -> ((s, d) => {
      // spread-if-narrow (r19, guide §2.6): at bench SF the whole lineitem
      // table is one scan split, so the heavy decimal partial aggregate ran
      // single-task; no-op at cluster scale (and partial aggregation before
      // the exchange is untouched there)
      graft.pipeline.TextOps.spreadNarrow(lineitem(s, d), col("l_orderkey"))
        .filter(col("l_shipdate") <= lit("2000-12-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          dbl(sum(revenue())).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P1/P5: tight filter + projection — pushdown visible in scan.
    "q6_forecast_revenue" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dbl(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"))
    }),

    // J5 + O1/O2: 3-way join, agg, deterministic top-k.
    "q3_shipping_priority" -> ((s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).filter(col("o_orderdate") < lit("1998-01-01"))
      val l = lineitem(s, d).filter(col("l_shipdate") > lit("1996-03-15"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(dbl(sum(revenue())).as("rev"))
        .orderBy(col("rev").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // J5 (left semi): orders having any heavy lineitem, counted by priority.
    "q4_priority_semi" -> ((s, d) => {
      val heavy = lineitem(s, d).filter(col("l_quantity") > 45)
      orders(s, d)
        .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // J5: 6-way join with broadcast-able dims (region/nation/supplier).
    "q5_local_supplier" -> ((s, d) => {
      val r = region(s, d).filter(col("r_name") === "ASIA")
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dbl(sum(revenue())).as("rev"))
        .orderBy(col("rev").desc, col("n_name"))
    }),

    // W1: window functions (rank within partition, deterministic order).
    "q7_top_customers_per_nation" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      customer(s, d)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("c_nationkey"), col("rnk"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_nationkey"), col("rnk"))
    }),

    // A1 distinct: de-dup via hash aggregate.
    "q8_distinct_flags" -> ((s, d) => {
      lineitem(s, d).select(col("l_returnflag"), col("l_linestatus"))
        .distinct().orderBy("l_returnflag", "l_linestatus")
    }),

    // U1/U2: union + intersect + except composed.
    "q9_setops" -> ((s, d) => {
      val building = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val machinery = customer(s, d).filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey").as("k"))
      val active = orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      building.union(machinery).intersect(active)
        .except(customer(s, d).filter(col("c_acctbal") < 0).select(col("c_custkey").as("k")))
        .orderBy("k")
    }),

    // A5: rollup grouping sets. Partial-aggregate FIRST, then rollup over
    // the partials: count/sum are distributive, so rolling up pre-aggregated
    // groups is algebraically identical — and the 3× grouping-set Expand
    // runs over the handful of base groups instead of the corpus (at 100 TB,
    // Expand×sets multiplies the shuffle; this caps it at base-group count).
    "q10_rollup" -> ((s, d) => {
      val base = lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("_n"), sum(dec(col("l_quantity"))).as("_sq"))
      base.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("_n")).as("n"), dbl(sum(col("_sq"))).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // PIVOT: long→wide reshape over a known value set. Pre-aggregate FIRST
    // (month × status base groups), THEN pivot the handful of partials —
    // same partial-then-reshape trick as q10's rollup, so the Expand/pivot
    // machinery never touches the corpus. Counts coalesce to 0 (absent
    // combinations), sums stay NULL (SQL empty-sum), both mirrored in the
    // oracle's FILTER form.
    "q70_pivot" -> ((s, d) => {
      orders(s, d)
        .groupBy(month(col("o_orderdate")).cast("long").as("m"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("o_totalprice")))).as("s"))
        .select(col("m"),
          coalesce(col("F_n"), lit(0L)).as("n_f"),
          coalesce(col("O_n"), lit(0L)).as("n_o"),
          coalesce(col("P_n"), lit(0L)).as("n_p"),
          col("F_s").as("sum_f"), col("O_s").as("sum_o"), col("P_s").as("sum_p"))
        .orderBy("m")
    }),

    // W1 widening: ranking-family window functions (ntile buckets,
    // percent_rank, cume_dist) in ONE window pass — all three share a
    // single sort/shuffle on the partition key.
    "q71_ranks" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").asc, col("s_suppkey").asc)
      supplier(s, d).select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
        .orderBy("s_nationkey", "s_suppkey")
    }),

    // Distributed equal-width histogram (Profile.histogram): one hash
    // aggregate, bins derived per-row — no sort, no window.
    "q72_histogram" -> ((s, d) =>
      graft.pipeline.Profile.histogram(lineitem(s, d), "l_extendedprice", 5000.0)
        .withColumnRenamed("sum_value", "sum_price")
        .orderBy("bin")),

    // Time-bucketed aggregation over the events stream table.
    "q11_events_hourly" -> ((s, d) => {
      events(s, d)
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("value")))).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // J5 (left anti): customers with no orders.
    "q12_customers_without_orders" -> ((s, d) => {
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_inactive"))
    }),

    // J5 (left outer): every nation with its customer count, including
    // nations with none (null-extension + coalesce).
    "q18_outer_join" -> ((s, d) => {
      val custByNation = customer(s, d).groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"), dbl(sum(dec(col("c_acctbal")))).as("total_bal"))
      nation(s, d)
        .join(custByNation, col("n_nationkey") === col("nk"), "left_outer")
        .select(col("n_name"), coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          col("total_bal"))
        .orderBy("n_name")
    }),

    // §2.7 scalar-function surface: string + date built-ins composed.
    "q19_scalar_funcs" -> ((s, d) => {
      orders(s, d)
        .select(
          col("o_orderkey"),
          upper(substring(col("o_orderpriority"), 1, 4)).as("prio4"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
          length(col("o_orderpriority")).cast("long").as("prio_len"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dbl(dec(col("o_totalprice")) * lit(BigDecimal("0.10"))).as("fee"))
        .filter(col("o_orderkey") <= 1000)
        .orderBy("o_orderkey")
    }),

    // Correlated-style aggregate subquery via join (parts above brand avg size).
    "q13_above_avg_parts" -> ((s, d) => {
      val avgSize = part(s, d).groupBy(col("p_brand").as("b"))
        .agg(avg(col("p_size")).as("avg_size"))
      part(s, d).join(broadcast(avgSize), col("p_brand") === col("b"))
        .filter(col("p_size") > col("avg_size"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n_above"))
        .orderBy("p_brand")
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY rev DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q4_priority_semi" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY rev DESC, n_name""".stripMargin,
    "q7_top_customers_per_nation" ->
      """SELECT c_nationkey, rnk, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
        |  FROM customer) t
        |WHERE rnk <= 3 ORDER BY c_nationkey, rnk""".stripMargin,
    "q8_distinct_flags" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",
    "q9_setops" ->
      """SELECT k FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'
        |) u
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
        |ORDER BY k""".stripMargin,
    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q11_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q12_customers_without_orders" ->
      """SELECT count(*) AS n_inactive FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q18_outer_join" ->
      """SELECT n_name, coalesce(c.n_cust, 0) AS n_cust, c.total_bal
        |FROM nation LEFT JOIN (
        |  SELECT c_nationkey AS nk, count(*) AS n_cust,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |  FROM customer GROUP BY c_nationkey) c
        |ON n_nationkey = c.nk
        |ORDER BY n_name""".stripMargin,
    "q19_scalar_funcs" ->
      """SELECT o_orderkey,
        |  upper(substr(o_orderpriority, 1, 4)) AS prio4,
        |  o_orderstatus || '-' || o_orderpriority AS tag,
        |  length(o_orderpriority) AS prio_len,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.10 AS DECIMAL(18,2)) AS DOUBLE) AS fee
        |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin,
    "q13_above_avg_parts" ->
      """SELECT p_brand, count(*) AS n_above FROM part p
        |JOIN (SELECT p_brand AS b, avg(p_size) AS avg_size FROM part GROUP BY 1) a
        |  ON p.p_brand = a.b
        |WHERE p_size > avg_size
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q70_pivot" ->
      """SELECT month(o_orderdate) AS m,
        |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (o_orderstatus = 'P') AS n_p,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS sum_f,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS sum_o,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS sum_p
        |FROM orders GROUP BY 1 ORDER BY m""".stripMargin,
    "q71_ranks" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin,
    "q72_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin, count(*) AS n,
        |  CAST(min(l_extendedprice) AS DOUBLE) AS lo,
        |  CAST(max(l_extendedprice) AS DOUBLE) AS hi,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin
  )
}
