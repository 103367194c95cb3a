package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Relational core on the TPC-H-ish star schema (SURVEY.md §2.2 Group B).
  *
  * Determinism rules for hash-matching against the DuckDB oracle:
  *  - every query ends in a total order (tie-broken by a unique key);
  *  - double aggregations go through DECIMAL(18,4) casts so the sum is
  *    exact and independent of partition/merge order (Spark's own
  *    run-to-run reduce order over 32 threads would otherwise wobble the
  *    last ulp) — the oracle SQL performs the identical decimal cast;
  *  - averages are computed as exact decimal sum / count in DOUBLE.
  *
  * Scale notes: all joins are equi-joins planned by Catalyst (AQE picks
  * broadcast vs sort-merge at runtime); only genuine dimension tables
  * (region, nation, customer-filtered) get explicit broadcast hints.
  * Filters/projections sit directly on the parquet scan (pushdown audited
  * via explain in RelationalSpec).
  */
object Relational {

  /** Exact, order-insensitive sum of a double column via decimal cast. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)
  /** Exact average: decimal sum / count, floor-HALF_UP-rounded to 4dp —
    * plain round(x,4) can diverge across engines when count is a power of
    * two (graft.Det). */
  private def davg(c: Column): Column = graft.Det.r4(dsum(c) / count(lit(1)))

  /** `scan_filter_project`: shipdate-range filter + arithmetic projection;
    * both the filter and the 5-column read schema reach the parquet scan. */
  def scanFilterProject(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              $"l_shipdate" <  lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
              $"l_discount" >= 0.02 && $"l_quantity" < 25.0)
      .select(
        $"l_orderkey", $"l_linenumber", $"l_quantity",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** `agg_pricing_summary`: TPC-H Q1 shape — partial+final hash aggregate. */
  def aggPricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(dsum($"l_quantity"), 4).as("sum_qty"),
        round(dsum($"l_extendedprice"), 4).as("sum_base_price"),
        round(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("sum_disc_price"),
        // 3-factor product carries 6 conceptual decimals: a per-row
        // DECIMAL(18,4) cast would sit exactly on rounding boundaries
        // (engines' double→decimal conversions disagree there), so rows
        // accumulate at (28,8). The SUM then steps down to scale 4 in
        // decimal space (exact, HALF_UP in both engines) BEFORE the
        // double cast: a scale-8 multi-billion total scales past 2^53,
        // where DuckDB's int128/10^8 double-rounds and drifts 1 ulp off
        // Spark's correctly-rounded conversion (seen at sf0.1).
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
          .cast(DecimalType(28, 8))).cast(DecimalType(18, 4))
          .cast(DoubleType).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        graft.Det.r4(sum($"l_discount".cast(DecimalType(18, 6))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** `join_broadcast`: fact join small filtered dim — explicit broadcast
    * hint keeps it shuffle-free on the orders side at any scale. */
  def joinBroadcast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_name")
    Tables.orders(spark, sfDir)
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey", $"c_name", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** `join_hash_hint`: [[joinBroadcast]]'s exact query under a forced
    * SHUFFLE_HASH strategy hint — the hint surface a tuner reaches for
    * when the optimizer's estimate is wrong in the OTHER direction (a
    * "small" side that isn't: broadcasting 100 GB OOMs the executors;
    * shuffle-hash keeps the partitioned build local). Shares
    * join_broadcast's oracle: the gate proves a join STRATEGY hint can
    * never change results, only the physical plan — which PlanAuditSpec
    * pins to ShuffledHashJoin. */
  def joinHashHint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_name")
    Tables.orders(spark, sfDir)
      .join(c.hint("SHUFFLE_HASH"), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey", $"c_name", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** `join_bloom_prefilter`: the runtime-filter semi-join pruning
    * pattern — a bloom filter built over the SELECTIVE side's keys
    * (BUILDING-segment customers) is attached as a scalar subquery and
    * probed against `o_custkey` BEFORE the exact semi join, so
    * non-matching fact rows never enter the join exchange. At 100 TB this is the
    * difference between shuffling every order and shuffling ~1/5th of
    * them; Catalyst's own InjectRuntimeFilter builds exactly this plan
    * (bloom_filter_agg + might_contain) when statistics justify it —
    * here it is declared explicitly so the gate can prove the bloom is
    * semantics-free: false positives are removed by the exact join,
    * false negatives cannot exist, so the result hash-matches the plain
    * semi-join oracle. */
  def joinBloomPrefilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    // scalar subquery (Spark 4's Dataset.scalar): might_contain requires
    // the filter blob as a constant/scalar, and the subquery broadcasts
    // the one-row result without a join
    val bloom = cust.agg(graft.functions.BloomFunctions
      .bloom_filter_agg($"c_custkey", 10000L, 80000L)).scalar()
    val pre = Tables.orders(spark, sfDir)
      .where(graft.functions.BloomFunctions.might_contain(bloom, $"o_custkey"))
    pre.join(cust, pre("o_custkey") === cust("c_custkey"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4)
          .as("sum_price"))
      .orderBy($"o_orderpriority")
  }

  /** `join_5way_revenue`: TPC-H Q5 shape — region⋈nation⋈customer⋈orders⋈
    * lineitem, revenue per nation in ASIA for orders in 1996. Only the
    * FIXED-cardinality dims (nation 25 rows, region 5) carry explicit
    * broadcast hints; the customer-proportional chain and the
    * orders⋈lineitem equi-join are left to AQE — a hint is honored
    * regardless of size, so broadcasting a customer-derived side would
    * OOM at 100× while AQE picks BHJ at bench scale and demotes to SMJ
    * when the build side outgrows the threshold (the q3 regime change
    * measured in SCALE.md). */
  def join5WayRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val region   = Tables.region(spark, sfDir).filter($"r_name" === "ASIA")
    val nation   = Tables.nation(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val orders   = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              $"o_orderdate" <  lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    val lineitem = Tables.lineitem(spark, sfDir)
    val dims =
      customer
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .select($"c_custkey", $"n_name")
    orders
      .join(dims, $"o_custkey" === $"c_custkey")
      .join(lineitem, $"o_orderkey" === $"l_orderkey")
      .groupBy($"n_name")
      .agg(round(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** `q5_local_supplier`: the FULL TPC-H Q5 shape — revenue from orders
    * where the supplying supplier sits in the customer's own nation
    * (`c_nationkey = s_nationkey`), per ASIA nation. Six tables: only
    * nation/region/supplier (fixed or sub-linear cardinality — SURVEY
    * §4's broadcast rule) carry explicit hints; the customer-derived
    * chain is UNHINTED so AQE broadcasts it at bench scale and demotes
    * to a shuffled join at 100× instead of OOMing on a forced
    * customer-proportional build side.
    * (`join_5way_revenue` keeps the supplier-free 5-way variant.) */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dims =
      Tables.customer(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(spark, sfDir).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .select($"c_custkey", $"c_nationkey", $"n_name")
    val sup = broadcast(
      Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_nationkey"))
    Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              $"o_orderdate" <  lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .join(dims, $"o_custkey" === $"c_custkey")
      .join(Tables.lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
      .join(sup, $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
      .groupBy($"n_name")
      .agg(round(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** `join_semi`: customers having at least one order (EXISTS). */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** `join_anti`: customers with no urgent orders (NOT EXISTS). The
    * priority filter keeps the result non-trivial (every customer has
    * *some* order in the test data). */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** `window_topk_group`: top-3 orders per customer by totalprice. */
  def windowTopkGroup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rk")
  }

  /** `window_running_sum`: running revenue per customer over orderdate.
    * Decimal accumulator: the running sum is exact, so prefix sums match
    * the oracle bit-for-bit. */
  def windowRunningSum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, sfDir)
      .select(
        $"o_custkey", $"o_orderkey",
        unix_millis($"o_orderdate".cast(TimestampType)).as("order_ms"),
        round(sum($"o_totalprice".cast(DecimalType(18, 4))).over(w).cast(DoubleType), 4)
          .as("running_total"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** `window_lag_lead`: per-customer order history with previous/next
    * order prices and gap-days — lag/lead over the orderdate ordering. */
  def windowLagLead(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, sfDir)
      .select(
        $"o_custkey", $"o_orderkey",
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"),
        datediff($"o_orderdate".cast(TimestampType),
          lag($"o_orderdate", 1).over(w).cast(TimestampType)).as("days_since_prev"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** `agg_grouping_sets`: explicit grouping sets — (status), (priority),
    * and grand total, distinguishable via coalesced labels. */
  def aggGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Views.withTemp(spark)("orders_gs" -> Tables.orders(spark, sfDir)) { v =>
      spark.sql(
        s"""SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
           |       coalesce(o_orderpriority, 'ALL') AS orderpriority,
           |       count(*) AS n_orders,
           |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_totalprice
           |FROM ${v("orders_gs")}
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           |ORDER BY orderstatus, orderpriority""".stripMargin)
    }
  }

  /** `q3_shipping_priority`: TPC-H Q3 shape — segment-filtered customers,
    * date-split orders/lineitems, revenue per order, top-10. The
    * segment-filtered customer side is customer-proportional (~1/5 of
    * the table), so it carries NO broadcast hint: AQE picks BHJ while it
    * fits and switches to SMJ past the threshold — the exact regime
    * change measured for this query in SCALE.md. */
  def q3ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val c = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" < lit(cut))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val l = Tables.lineitem(spark, sfDir).filter($"l_shipdate" > lit(cut))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(round(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"))
      .select($"l_orderkey", $"revenue",
        unix_millis($"o_orderdate".cast(TimestampType)).as("order_ms"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** `q18_large_orders`: TPC-H Q18 shape — orders whose lineitem quantity
    * sum exceeds a threshold (HAVING over a join), joined back to
    * customers, top-20 by price. */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val big = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(round(dsum($"l_quantity"), 4).as("sum_qty"))
      .filter($"sum_qty" > 250.0)
    big
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(20)
  }

  /** `q10_returned_items`: TPC-H Q10 shape — revenue lost to returned
    * items per customer over a quarter, top-20: date-sliced orders ⋈
    * return-flagged lineitems ⋈ customer ⋈ broadcast nation. */
  def q10ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              $"o_orderdate" <  lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      .select($"o_orderkey", $"o_custkey")
    val l = Tables.lineitem(spark, sfDir).filter($"l_returnflag" === "R")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, sfDir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(round(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** `subquery_scalar`: correlated scalar subquery through SQL — parts
    * priced 5% above their brand average. Catalyst decorrelates this into
    * an aggregate + join; declared through spark.sql to exercise exactly
    * that rewrite. */
  def subqueryScalar(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Views.withTemp(spark)("part_sq" -> Tables.part(spark, sfDir)) { v =>
      spark.sql(
        s"""SELECT p_partkey, p_brand, p_retailprice
           |FROM ${v("part_sq")} p
           |WHERE p_retailprice > 1.05 * (SELECT avg(p2.p_retailprice)
           |                              FROM ${v("part_sq")} p2
           |                              WHERE p2.p_brand = p.p_brand)
           |ORDER BY p_partkey""".stripMargin)
    }
  }

  /** `set_ops_intersect`: the third set operation — BUILDING ∩ big-spender
    * custkeys. */
  def setOpsIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      .intersect(c.filter($"c_acctbal" > 8000.0).select($"c_custkey"))
      .orderBy($"c_custkey")
  }

  /** `sort_limit_topk`: global top-10 orders — TakeOrderedAndProject, no
    * full sort at scale. */
  def sortLimitTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  /** `agg_distinct`: per-segment exact distinct counts. */
  def aggDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        countDistinct($"c_nationkey").as("n_nations"))
      .orderBy($"c_mktsegment")
  }

  /** `agg_rollup`: acctbal stats by rollup(mktsegment, nationkey); subtotal
    * rows are labeled 'ALL' so null semantics can't diverge between engines. */
  def aggRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .rollup($"c_mktsegment", $"c_nationkey")
      .agg(
        count(lit(1)).as("n_customers"),
        round(dsum($"c_acctbal"), 4).as("sum_acctbal"))
      .select(
        coalesce($"c_mktsegment", lit("ALL")).as("mktsegment"),
        coalesce($"c_nationkey".cast(StringType), lit("ALL")).as("nationkey"),
        $"n_customers", $"sum_acctbal")
      .orderBy($"mktsegment", $"nationkey")
  }

  /** `agg_cube`: order counts by cube(orderstatus, orderpriority). */
  def aggCube(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        round(dsum($"o_totalprice"), 4).as("sum_totalprice"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("orderstatus"),
        coalesce($"o_orderpriority", lit("ALL")).as("orderpriority"),
        $"n_orders", $"sum_totalprice")
      .orderBy($"orderstatus", $"orderpriority")
  }

  /** `agg_grouping_id`: `grouping()` / `grouping_id()` over a cube —
    * the level-identification functions that make multi-level
    * aggregates machine-consumable: `coalesce(col, 'ALL')` (the
    * aggCube idiom) cannot distinguish a REAL 'ALL' value from a
    * rolled-up level, while grouping bits can. Emits each cube row's
    * level bitmask plus per-column grouping flags, and keeps only the
    * subtotal levels (id > 0) — the standard "report the rollups,
    * details live elsewhere" shape. Oracle recomputes the bitmask as
    * `2·grouping(a) + grouping(b)` — engine-independent arithmetic over
    * the same cube. */
  def aggGroupingId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(
        grouping_id().as("level_id"),
        grouping($"o_orderstatus").as("status_rolled"),
        grouping($"o_orderpriority").as("priority_rolled"),
        count(lit(1)).as("n_orders"))
      .filter(grouping_id() > 0)
      .select(
        $"level_id".cast(IntegerType).as("level_id"),
        $"status_rolled".cast(IntegerType).as("status_rolled"),
        $"priority_rolled".cast(IntegerType).as("priority_rolled"),
        coalesce($"o_orderstatus", lit("~")).as("orderstatus"),
        coalesce($"o_orderpriority", lit("~")).as("orderpriority"),
        $"n_orders")
      .orderBy($"level_id", $"orderstatus", $"orderpriority")
  }

  /** `set_ops`: (BUILDING ∪ MACHINERY custkeys) ∖ big-spenders. Spark's
    * union is bag semantics, so distinct() restores set semantics before
    * the except. */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
    val a   = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val b   = c.filter($"c_mktsegment" === "MACHINERY").select($"c_custkey")
    val big = c.filter($"c_acctbal" > 8000.0).select($"c_custkey")
    a.union(b).distinct().except(big).orderBy($"c_custkey")
  }

  /** `string_funcs`: upper/substring/length/concat_ws/like over part. */
  def stringFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .select(
        $"p_partkey",
        upper($"p_name").as("name_upper"),
        substring($"p_name", 1, 8).as("name_prefix"),
        length($"p_name").as("name_len"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        $"p_name".like("%red%").cast(IntegerType).as("is_red"))
      .orderBy($"p_partkey")
  }

  /** `date_funcs`: calendar buckets + datediff vs a fixed date. */
  def dateFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("order_year"),
        month($"o_orderdate").as("order_month"),
        unix_millis(date_trunc("month", $"o_orderdate")).as("month_start_ms"),
        datediff(lit(java.sql.Date.valueOf("2002-01-01")), $"o_orderdate").as("days_to_2002"))
      .orderBy($"o_orderkey")
  }

  /** `math_case_funcs`: round/abs arithmetic + CASE tax buckets. */
  def mathCaseFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select(
        $"l_orderkey", $"l_linenumber",
        round($"l_extendedprice" * $"l_tax", 4).as("tax_amount"),
        round(abs($"l_discount" - 0.05), 4).as("disc_dev"),
        when($"l_tax" < 0.03, "low").when($"l_tax" < 0.06, "mid").otherwise("high").as("tax_bucket"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** `json_extract`: pull `$.k` out of the JSON props column, avg per type.
    * Integer sum keeps the average exact. */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      // try_cast, not cast: ANSI mode (Spark 4 default) makes a plain cast
      // THROW on a malformed value — one dirty record would kill the whole
      // job at scale; try_cast degrades it to null (RelationalSpec probes this).
      .select($"event_type",
        expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
      .groupBy($"event_type")
      .agg(
        count($"k").as("n"),
        graft.Det.r4(sum($"k").cast(DoubleType) / count($"k")).as("avg_k"))
      .orderBy($"event_type")
  }

  /** `agg_percentiles`: exact percentiles (continuous interpolation) per
    * group — Spark `percentile` ≡ DuckDB `quantile_cont`. */
  def aggPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5D)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.95D)"), 4).as("p95_qty"),
        round(expr("percentile(l_extendedprice, 0.5D)"), 4).as("p50_price"))
      .orderBy($"l_returnflag")
  }

  /** `agg_stats_moments`: stddev and correlation computed from exact
    * decimal moments (n, Σx, Σx², Σxy) instead of the built-in streaming
    * estimators — the built-ins merge partials in partition order and
    * wobble at the ulp level run-to-run; moments are exact and
    * order-insensitive, so the derived statistics are bit-stable. */
  def aggStatsMoments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d18 = DecimalType(18, 4); val d28 = DecimalType(28, 8)
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum($"l_quantity".cast(d18)).cast(DoubleType).as("sx"),
        sum($"l_extendedprice".cast(d18)).cast(DoubleType).as("sy"),
        sum(($"l_quantity" * $"l_quantity").cast(d28)).cast(DoubleType).as("sxx"),
        sum(($"l_extendedprice" * $"l_extendedprice").cast(d28)).cast(DoubleType).as("syy"),
        sum(($"l_quantity" * $"l_extendedprice").cast(d28)).cast(DoubleType).as("sxy"))
      .select(
        $"l_returnflag",
        round(sqrt(($"n" * $"sxx" - $"sx" * $"sx") / ($"n" * ($"n" - 1))), 4).as("stddev_qty"),
        round(
          ($"n" * $"sxy" - $"sx" * $"sy") /
            (sqrt($"n" * $"sxx" - $"sx" * $"sx") * sqrt($"n" * $"syy" - $"sy" * $"sy")), 4)
          .as("corr_qty_price"))
      .orderBy($"l_returnflag")
  }

  /** `agg_array_sorted`: collection aggregate — sorted distinct statuses
    * per group, joined to a string so the hash compare is list-layout
    * agnostic. */
  def aggArraySorted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        concat_ws(",", array_sort(collect_set($"l_linestatus"))).as("statuses"),
        countDistinct($"l_linestatus").as("n_statuses"))
      .orderBy($"l_returnflag")
  }

  /** `agg_pivot`: per-user event-type counts as columns (explicit value
    * list keeps the output schema deterministic). */
  def aggPivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0, types)
      .select($"user_id" +: types.map(t => col(t).as(s"n_$t")): _*)
      .orderBy($"user_id")
  }

  /** `agg_unpivot`: reshape — per-returnflag measure matrix melted to
    * (returnflag, measure, value) long form via Dataset.unpivot. */
  def aggUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wide = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        round(dsum($"l_quantity"), 4).as("sum_qty"),
        round(dsum($"l_extendedprice"), 4).as("sum_price"),
        round(dsum($"l_discount" * lit(100.0)), 4).as("sum_disc_pct"))
    wide.unpivot(
      ids = Array($"l_returnflag"),
      values = Array($"sum_qty", $"sum_price", $"sum_disc_pct"),
      variableColumnName = "measure",
      valueColumnName = "value")
      .orderBy($"l_returnflag", $"measure")
  }

  /** `agg_hll_sketch`: mergeable Datasketches HLL — per-type sketches
    * estimated, plus the union across all types (the operation plain
    * approx_count_distinct cannot do). lgConfigK = 15: a DataSketches
    * HLL stays in its coupon (LIST/SET) representation — where the
    * estimate is EXACTLY the distinct count — until ~0.75·2^(lgK-3)
    * keys (measured r15 with range probes: lgK=15 exact through 3072,
    * drifting at 3500; lgK=14 exact through ~1600; the old default
    * lgK=12 already drifts to 1494/1500 at sf0.1). The gate fixtures
    * top out at 1500 users, 2× inside lgK=15's exact regime, so the
    * query shares an exact DuckDB `count(DISTINCT)` oracle — the
    * theta-sketch below-nominal-capacity precedent. Past the coupon
    * range the SAME plan degrades gracefully to ±0.4% RSE estimates;
    * Round15OpsSpec pins both regimes, RelationalSpec keeps the
    * regime-independent bounds (within 5% of exact, union ≥ max
    * per-type). */
  def aggHllSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val perType = ev.groupBy($"event_type")
      .agg(expr("hll_sketch_agg(user_id, 15)").as("sk"))
    perType
      .select($"event_type", expr("hll_sketch_estimate(sk)").cast("long").as("est_users"))
      .union(
        perType.select(expr("'ALL'").as("event_type"),
          expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").as("est_users")))
      .orderBy($"event_type")
  }

  /** `union_by_name_evolution`: schema-evolution union — two extracts of
    * the same fact stream with different column sets (an old and a new
    * pipeline version) merged by NAME with missing columns null-filled;
    * positional union would silently mismatch columns, the lakehouse
    * schema-drift trap. */
  def unionByNameEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
    val v1 = o.filter($"o_orderdate" < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val v2 = o.filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
    v1.unionByName(v2, allowMissingColumns = true)
      .select($"o_orderkey", $"o_custkey",
        $"o_totalprice", coalesce($"o_orderpriority", lit("LEGACY")).as("priority"))
      .orderBy($"o_orderkey")
  }

  /** `join_null_safe`: null-safe equality (`<=>`) — null keys MATCH each
    * other instead of vanishing (the standard surprise when joining on a
    * nullable column). Nulls are synthesized via nullif on a real key. */
  def joinNullSafe(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir)
      .select($"c_custkey", nullif($"c_nationkey", lit(5)).as("nk"))
    val n = Tables.nation(spark, sfDir)
      .select(nullif($"n_nationkey", lit(5)).as("nk2"), $"n_name")
    c.join(n, $"nk" <=> $"nk2")
      .groupBy(coalesce($"n_name", lit("NULL_KEY")).as("nation"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"nation")
  }

  /** `sql_catalog_query`: the pure-SQL surface — star schema registered
    * as catalog tables ([[graft.cdc.CatalogDdl]], the reference's
    * CREATE KEYSPACE/TABLE analogue), then a join+agg written entirely
    * in SQL. Same Catalyst plan as the DataFrame form; the point is the
    * catalog path (name resolution, external parquet tables). */
  def sqlCatalogQuery(spark: SparkSession, sfDir: String): DataFrame = {
    graft.cdc.CatalogDdl.registerStarSchema(spark, sfDir)
    spark.sql(
      """SELECT r_name,
        |       count(*) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        |FROM graft.customer
        |  JOIN graft.nation ON c_nationkey = n_nationkey
        |  JOIN graft.region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
  }

  /** `agg_histogram`: equi-width histogram of order values —
    * `width_bucket` into 12 × 50k bins plus count/revenue per bin (the
    * one-pass distribution profile; a full sort computes nothing more).
    * The oracle reproduces width_bucket's exact arithmetic
    * (`floor(x / binWidth) + 1`, range-clamped) since DuckDB lacks the
    * function — bin width 50000 is float-exact so the division is the
    * same IEEE op on both sides. */
  def aggHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy(width_bucket($"o_totalprice", lit(0.0), lit(600000.0), lit(12)).as("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(dsum($"o_totalprice"), 4).as("sum_value"))
      .orderBy($"bucket")
  }

  /** `map_type_ops`: MapType construction and access — per user, an
    * event_type→count map assembled from grouped counts
    * (map_from_entries over a collected struct list), then map lookups/
    * size projected back out. The map itself never leaves the query
    * (map column layouts are engine-specific); the projected scalars
    * prove its content against a map-free oracle. */
  def mapTypeOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id")
      .agg(map_from_entries(collect_list(struct($"event_type", $"n"))).as("m"))
      .select(
        $"user_id",
        size($"m").as("n_types"),
        coalesce(element_at($"m", "click"), lit(0L)).as("n_clicks"),
        coalesce(element_at($"m", "purchase"), lit(0L)).as("n_purchases"),
        array_max(map_values($"m")).as("max_type_count"))
      .orderBy($"user_id")
  }

  /** `agg_bitwise`: bitwise aggregates (bit_and/bit_or/bit_xor) — the
    * flag-mask folds; order-insensitive integer ops, exactly
    * deterministic with no decimal machinery needed. */
  def aggBitwise(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        expr("bit_and(user_id)").as("uid_and"),
        expr("bit_or(user_id)").as("uid_or"),
        expr("bit_xor(event_id)").as("eid_xor"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  /** `join_salted_skew`: the hot-key-safe join pattern — salt the fact
    * side with a deterministic k-way split of each key's rows, replicate
    * the dimension side k times, join on (key, salt). Same result as the
    * plain equi-join (oracle-checked), but a key with 10⁹ fact rows
    * lands on k tasks instead of one. AQE's skew-join split handles the
    * common cases at runtime; this is the explicit form for when the
    * build side must also stay shuffled (too big to broadcast). */
  def joinSaltedSkew(spark: SparkSession, sfDir: String, salts: Int = 8): DataFrame = {
    import spark.implicits._
    val fact = Tables.orders(spark, sfDir)
      .withColumn("salt", pmod($"o_orderkey", lit(salts)))
    val dim = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment")
      .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
    fact.join(dim, fact("o_custkey") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), round(dsum($"o_totalprice"), 4).as("revenue"))
      .orderBy($"c_mktsegment")
  }

  /** `agg_approx_percentile`: GK-sketch approximate percentiles next to
    * the exact `agg_percentiles` — the mergeable sketch is what runs at
    * 100 TB (exact percentile is a full sort per group). No SQL oracle
    * (sketch internals are engine-specific); Round2OpsSpec bounds the
    * estimates against the exact values. */
  def aggApproxPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        round(expr("approx_percentile(l_quantity, 0.5D, 1000)"), 4).as("ap50_qty"),
        round(expr("approx_percentile(l_quantity, 0.95D, 1000)"), 4).as("ap95_qty"),
        round(expr("approx_percentile(l_extendedprice, 0.5D, 1000)"), 4).as("ap50_price"))
      .orderBy($"l_returnflag")
  }

  /** `window_first_last`: value-navigation window functions — first,
    * last, and 2nd order price within each customer's full history
    * (unbounded frame so last_value/nth_value see the whole partition,
    * the standard gotcha with their default frame). */
  def windowFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, sfDir)
      .select(
        $"o_custkey", $"o_orderkey", $"o_totalprice",
        first($"o_totalprice").over(w).as("first_price"),
        last($"o_totalprice").over(w).as("last_price"),
        nth_value($"o_totalprice", 2).over(w).as("second_price"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** `agg_min_max_by`: argmax/argmin aggregation — the customer holding
    * each segment's max/min balance. The ordering key folds in custkey
    * (acctbal is not unique) so both engines pick the same winner. */
  def aggMinMaxBy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // unique ranking key: acctbal (2 decimals, < 10^5) in cents, then
    // custkey; round BEFORE the long cast — Spark's double→long cast
    // truncates while DuckDB's rounds, and 2-dp money in binary sits a
    // hair below its integer cent value. Cents shifted by 2^40 (cents
    // fit ~21 bits; custkey < 2^40 up to SF ~7M) so keys stay unique
    // at any realistic scale — a 10^7 multiplier collides at SF~67.
    val rank = (round($"c_acctbal" * 100).cast(LongType) * (1L << 40) + $"c_custkey")
    Tables.customer(spark, sfDir)
      .groupBy($"c_mktsegment")
      .agg(
        max_by($"c_name", rank).as("richest"),
        min_by($"c_name", rank).as("poorest"),
        round(max($"c_acctbal"), 4).as("max_bal"),
        round(min($"c_acctbal"), 4).as("min_bal"))
      .orderBy($"c_mktsegment")
  }

  /** `join_cross_dims`: explicit cartesian product of two dimension
    * tables (the only join shape where a cross join is legitimate —
    * both sides are tiny and broadcastable; a label matrix). */
  def joinCrossDims(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.region(spark, sfDir).select($"r_regionkey", $"r_name")
      .crossJoin(broadcast(Tables.nation(spark, sfDir).select($"n_nationkey", $"n_name")))
      .select($"r_regionkey", $"n_nationkey",
        concat_ws("/", $"r_name", $"n_name").as("pair"))
      .orderBy($"r_regionkey", $"n_nationkey")
  }

  /** `date_arith_funcs`: calendar arithmetic — add_months (with its
    * month-end clamp), last_day, quarter, day-of-week bucketing. */
  def dateArithFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = $"o_orderdate".cast(TimestampType).cast(DateType)
    Tables.orders(spark, sfDir)
      .select(
        $"o_orderkey",
        unix_millis(add_months(d, 3).cast(TimestampType)).as("plus3m_ms"),
        unix_millis(last_day(d).cast(TimestampType)).as("month_end_ms"),
        quarter(d).as("qtr"),
        dayofweek(d).as("dow"))
      .orderBy($"o_orderkey")
  }

  /** `join_outer_coalesce`: left outer join with null-repair — every
    * order, with revenue from its 1998+ shipments or 0. The aggregate
    * runs BEFORE the join (pre-aggregated outer side), so the outer join
    * matches at most one build row per order — no row explosion at
    * scale, and the unmatched side is a plain null-fill. */
  def joinOuterCoalesce(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val recent = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      .groupBy($"l_orderkey")
      .agg(
        round(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("rev"),
        count(lit(1)).as("n"))
    Tables.orders(spark, sfDir)
      .join(recent, $"o_orderkey" === $"l_orderkey", "left_outer")
      .select(
        $"o_orderkey", $"o_orderstatus",
        coalesce($"rev", lit(0.0)).as("recent_revenue"),
        coalesce($"n", lit(0L)).as("n_recent_items"))
      .orderBy($"o_orderkey")
  }

  /** `window_ntile_rank`: distribution window functions — quartile,
    * percent_rank, cume_dist, dense_rank per segment over acctbal. The
    * window ordering is total (custkey tie-break) so rank functions are
    * engine-independent. */
  def windowNtileRank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    Tables.customer(spark, sfDir)
      .select(
        $"c_custkey", $"c_mktsegment", $"c_acctbal",
        ntile(4).over(w).as("quartile"),
        graft.Det.r4(percent_rank().over(w)).as("pct_rank"),
        graft.Det.r4(cume_dist().over(w)).as("cume"),
        dense_rank().over(w).as("bal_rank"))
      .orderBy($"c_custkey")
  }

  /** `window_range_days`: a RANGE frame over a day offset — running
    * 30-day revenue per customer. The frame key is an integer day count
    * (timestamp RANGE frames are not portable across engines); peers on
    * the same day aggregate together in both engines by definition of
    * RANGE, so no tie-break is needed for determinism. */
  def windowRangeDays(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"days")
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(spark, sfDir)
      .withColumn("days",
        datediff($"o_orderdate".cast(TimestampType), lit(java.sql.Date.valueOf("1992-01-01"))))
      .select(
        $"o_custkey", $"o_orderkey", $"days",
        round(sum($"o_totalprice".cast(DecimalType(18, 4))).over(w).cast(DoubleType), 4)
          .as("rev_30d"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** `agg_conditional`: FILTER-style conditional aggregation — count_if
    * and predicated sums inside one grouped pass (one scan, one shuffle,
    * regardless of how many predicates). */
  def aggConditional(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        count_if($"o_totalprice" > 200000.0).as("n_big"),
        count_if($"o_orderstatus" === "O" && $"o_totalprice" < 50000.0).as("n_open_small"),
        round(dsum(when($"o_orderstatus" === "F", $"o_totalprice")), 4).as("sum_finished"),
        bool_and($"o_totalprice" > 900.0).cast(IntegerType).as("all_above_900"),
        bool_or($"o_totalprice" > 400000.0).cast(IntegerType).as("any_above_400k"))
      .orderBy($"o_orderpriority")
  }

  /** `join_range_bucketed`: interval join via time bucketing — clicks
    * within ±5 minutes of each error event. The scale path for a range
    * join: quantize both sides to 5-minute buckets, explode the probe
    * side into its 3 adjacent buckets, equi-join on the bucket, then
    * apply the exact |Δt| predicate as a residual filter. Each true
    * pair meets exactly once (at the click's own bucket), so no
    * dedup — unlike the naive θ-join, which is a broadcast nested loop
    * (quadratic) the moment Catalyst sees the inequality predicate. */
  def joinRangeBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val WinUs = 300000000L // 5 minutes in microseconds
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"event_type", unix_micros($"ts").as("us"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"us".as("click_us"),
        expr(s"us div ${WinUs}L").as("bucket"))
    val errs = ev.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"us".as("err_us"),
        expr(s"us div ${WinUs}L").as("b"))
      .select($"err_id", $"err_us", explode(array($"b" - 1, $"b", $"b" + 1)).as("bucket"))
    errs.join(clicks, "bucket")
      .filter(abs($"err_us" - $"click_us") <= WinUs)
      .groupBy($"err_id")
      .agg(count(lit(1)).as("n_nearby_clicks"))
      .orderBy($"err_id")
  }

  /** `sample_tablesample`: seeded Bernoulli fraction sampling of
    * lineitem (the TABLESAMPLE shape), aggregated per return flag. The
    * accept draw is CONTENT-KEYED — a row is in the 10% sample iff the
    * first 3 hex chars of `md5(l_orderkey:l_linenumber:seed)` fall under
    * `19a` (0x19a/0x1000 = 410/4096 ≈ 10.01%) — rather than
    * `df.sample`'s per-partition RNG stream: the engine-native draw
    * makes the sampled SET a function of scan split planning (core
    * count, maxPartitionBytes, file layout), so it reproduces only
    * under identical partitioning and differs per engine (r17 advisor).
    * The hash draw is reproducible across repartitionings, engines, and
    * cluster sizes — the only Bernoulli sample a 100 TB pipeline can
    * re-run incrementally — and makes the query DuckDB-oracle-eligible
    * (the `sample_split_assign` md5 idiom; lowercase-hex string compare
    * agrees byte-for-byte across engines). `df.sample`'s statistical
    * contract stays property-tested in Round5OpsSpec. */
  def sampleTablesample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val draw = substring(md5(concat(
      $"l_orderkey".cast("string"), lit(":"),
      $"l_linenumber".cast("string"), lit(":42"))), 1, 3)
    Tables.lineitem(spark, sfDir)
      .filter(draw < "19a")
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_sampled"),
        round(sum($"l_quantity"), 4).as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  /** `agg_approx_distinct`: HLL++ approximate distinct users per type (no
    * SQL oracle — approximate; bounds are property-tested vs the exact
    * count in RelationalSpec). */
  def aggApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", 0.01).as("approx_users"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }
}
