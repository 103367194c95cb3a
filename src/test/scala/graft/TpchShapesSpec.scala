package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.rel.TpchShapes

/** Specs for the round-3 classic TPC-H shapes (TpchShapes.scala): each
  * query is checked against an independent in-Spark recomputation of the
  * same semantics (the DuckDB hash gate is the cross-engine check; these
  * pin the intra-engine contract + the plan shapes that matter at scale). */
class TpchShapesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6: single-row revenue equals unrounded recomputation") {
    val s = spark
    import s.implicits._
    val got = TpchShapes.q6ForecastRevenue(spark, sf).collect().head.getDouble(0)
    val want = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24.0)
      .agg(sum($"l_extendedprice" * $"l_discount")).collect().head.getDouble(0)
    assert(math.abs(got - want) < 1e-2)
  }

  test("q4: EXISTS plans as a semi join; orders counted at most once") {
    val df = TpchShapes.q4OrderPriority(spark, sf)
    assert(planOf(df).contains("LeftSemi"), s"expected semi join:\n${planOf(df)}")
    val s = spark
    import s.implicits._
    val total = df.agg(sum($"order_count")).collect().head.getLong(0)
    val window = Tables.orders(spark, sf)
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        $"o_orderdate" < lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00"))).count()
    assert(total <= window, "semi join must not multiply orders")
    assert(total > 0)
  }

  test("q7: nation pair is symmetric and broadcast; revenue positive") {
    val df = TpchShapes.q7VolumeShipping(spark, sf)
    assert(planOf(df).contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).distinct
    assert(pairs.forall { case (a, b) => a != b })
    assert(rows.forall(_.getDouble(3) > 0))
  }

  test("q8: market share is a fraction in [0,1]") {
    val rows = TpchShapes.q8MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r => val v = r.getDouble(1); v >= 0.0 && v <= 1.0 })
  }

  test("q13: distribution accounts for every customer incl. zero-order ones") {
    val s = spark
    import s.implicits._
    val df = TpchShapes.q13OrderCounts(spark, sf)
    val nCust = df.agg(sum($"custdist")).collect().head.getLong(0)
    assert(nCust == Tables.customer(spark, sf).count(),
      "left outer join must keep zero-order customers")
    assert(df.filter($"c_count" === 0).count() <= 1)
  }

  test("q14: promo share is a percentage in [0,100]") {
    val v = TpchShapes.q14PromoRevenue(spark, sf).collect().head.getDouble(0)
    assert(v >= 0.0 && v <= 100.0)
  }

  test("q15: every returned supplier attains the global max revenue") {
    val s = spark
    import s.implicits._
    val rows = TpchShapes.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("q17: filtered revenue is a subset of the brand total") {
    val s = spark
    import s.implicits._
    val got = TpchShapes.q17SmallQtyOrders(spark, sf).collect().head.getDouble(0)
    val brandTotal = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter($"p_brand" === "Brand#1"),
        $"l_partkey" === $"p_partkey")
      .agg(sum($"l_extendedprice")).collect().head.getDouble(0) / 7.0
    assert(got >= 0.0 && got <= brandTotal)
  }

  test("q19: disjunctive filter result equals the union of its clauses") {
    val s = spark
    import s.implicits._
    val got = TpchShapes.q19DiscountedRevenue(spark, sf).collect().head.getDouble(0)
    val li = Tables.lineitem(spark, sf)
      .join(broadcast(Tables.part(spark, sf).select($"p_partkey", $"p_brand", $"p_size")),
        $"l_partkey" === $"p_partkey")
    def clause(brand: String, s1: Int, s2: Int, q1: Double, q2: Double) =
      li.filter($"p_brand" === brand && $"p_size".between(s1, s2) &&
        $"l_quantity".between(q1, q2))
    val want = clause("Brand#1", 1, 10, 1, 15)
      .union(clause("Brand#13", 5, 20, 10, 25))
      .union(clause("Brand#20", 10, 30, 20, 40))
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).collect().head
    val wantV = if (want.isNullAt(0)) 0.0 else want.getDouble(0)
    assert(math.abs(got - wantV) < 1e-2)
  }

  test("q22: returned customers are above threshold and orderless") {
    val s = spark
    import s.implicits._
    val numcust = TpchShapes.q22IdleCustomers(spark, sf)
      .agg(sum($"numcust")).collect().head.getLong(0)
    val withRecentOrders = Tables.orders(spark, sf)
      .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
      .select($"o_custkey").distinct().count()
    val nCust = Tables.customer(spark, sf).count()
    assert(numcust > 0 && numcust <= nCust - withRecentOrders)
  }

  test("q2: every returned row attains its part's minimum average price") {
    val s = spark
    import s.implicits._
    val rows = TpchShapes.q2MinCostSupplier(spark, sf)
    val viol = rows.groupBy($"p_partkey").agg(countDistinct($"avg_price").as("k"))
      .filter($"k" =!= 1).count()
    assert(viol == 0, "all winners per part share the same (minimum) price")
    assert(rows.count() > 0)
  }

  test("q21: a qualifying supplier is late in an order where nobody else is") {
    val s = spark
    import s.implicits._
    val rows = TpchShapes.q21LateSuppliers(spark, sf).collect()
    assert(rows.length <= 20)
    assert(rows.forall(_.getAs[Long]("numwait") > 0))
    // descending numwait with name tie-break
    val waits = rows.map(_.getAs[Long]("numwait"))
    assert(waits.sameElements(waits.sorted.reverse))
  }

  test("q16: NOT IN plans null-aware and excluded suppliers never appear") {
    val s = spark
    import s.implicits._
    val df = TpchShapes.q16PartsSupplier(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT IN should plan as an anti join: $plan")
    val maxSupp = Tables.supplier(spark, sf).count()
    assert(df.collect().forall(_.getAs[Long]("supplier_cnt") <= maxSupp))
  }

  test("q11: every kept part exceeds the global-fraction threshold") {
    val s = spark
    import s.implicits._
    val df = TpchShapes.q11ImportantStock(spark, sf).cache()
    val total = Tables.lineitem(spark, sf)
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).collect().head.getDouble(0)
    val minKept = df.agg(min($"part_value")).collect().head.getDouble(0)
    assert(minKept > total * 0.0005 * 0.99, "kept parts sit above the threshold")
    assert(df.count() > 0)
    df.unpersist()
  }

  test("q9/q12: grouped outputs are complete and deterministic") {
    val q9 = TpchShapes.q9ProductProfit(spark, sf).collect()
    assert(q9.nonEmpty)
    val q12 = TpchShapes.q12PriorityShipping(spark, sf).collect()
    val s = spark
    import s.implicits._
    val totalLines = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        $"l_shipdate" < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))).count()
    assert(q12.map(r => r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
      == totalLines, "every joined lineitem lands in exactly one priority bucket")
  }
}
