package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.rel.Relational

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan_filter_project pushes filters and prunes columns at the scan") {
    val df = Relational.scanFilterProject(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("IsNotNull(l_shipdate)")),
      s"no pushdown in plan:\n$plan")
    // read schema must not include untouched columns like l_comment-ish ones
    assert(!plan.contains("l_returnflag"), "column pruning failed: extra column read")
    assert(df.count() > 0)
  }

  test("join_broadcast actually broadcasts the dimension side") {
    val plan = planOf(Relational.joinBroadcast(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join:\n$plan")
  }

  test("sort_limit_topk plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf(Relational.sortLimitTopk(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }

  test("pricing summary matches a direct recomputation on one group") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val got = Relational.aggPricingSummary(spark, sf)
      .filter($"l_returnflag" === "A" && $"l_linestatus" === "F").collect().head
    val want = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")) &&
        $"l_returnflag" === "A" && $"l_linestatus" === "F")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q")).collect().head
    assert(got.getAs[Long]("count_order") == want.getAs[Long]("n"))
    assert(math.abs(got.getAs[Double]("sum_qty") - want.getAs[Double]("q")) < 1e-6)
  }

  test("semi and anti joins partition customers against the urgent-orders predicate") {
    val s = spark
    import s.implicits._
    val anti = Relational.joinAnti(spark, sf)
    val nCust = Tables.customer(spark, sf).count()
    val withUrgent = Tables.orders(spark, sf).filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct().count()
    assert(anti.count() == nCust - withUrgent)
    assert(Relational.joinSemi(spark, sf).count() ==
      Tables.orders(spark, sf).select("o_custkey").distinct().count())
  }

  test("window_topk_group emits at most 3 rows per customer, ranks 1..3") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val df = Relational.windowTopkGroup(spark, sf)
    val bad = df.groupBy($"o_custkey").agg(count(lit(1)).as("n"), max($"rk").as("m"))
      .filter($"n" > 3 || $"m" > 3).count()
    assert(bad == 0)
  }

  test("rollup contains the grand total and per-segment subtotals") {
    val s = spark
    import s.implicits._
    val df = Relational.aggRollup(spark, sf)
    val grand = df.filter($"mktsegment" === "ALL" && $"nationkey" === "ALL").collect()
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_customers") == Tables.customer(spark, sf).count())
    val segSubtotals = df.filter($"mktsegment" =!= "ALL" && $"nationkey" === "ALL")
    assert(segSubtotals.count() == 5)
  }

  test("cube has all four grouping combinations") {
    val s = spark
    import s.implicits._
    val df = Relational.aggCube(spark, sf)
    assert(df.filter($"orderstatus" === "ALL" && $"orderpriority" === "ALL").count() == 1)
    assert(df.filter($"orderstatus" =!= "ALL" && $"orderpriority" === "ALL").count() > 0)
    assert(df.filter($"orderstatus" === "ALL" && $"orderpriority" =!= "ALL").count() > 0)
  }

  test("set_ops: no big-spender survives, all results are in A∪B") {
    val s = spark
    import s.implicits._
    val res = Relational.setOps(spark, sf).collect().map(_.getLong(0)).toSet
    val c = Tables.customer(spark, sf)
    val ab = c.filter($"c_mktsegment".isin("BUILDING", "MACHINERY"))
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    val big = c.filter($"c_acctbal" > 8000.0)
      .select($"c_custkey").collect().map(_.getLong(0)).toSet
    assert(res.subsetOf(ab))
    assert(res.intersect(big).isEmpty)
  }

  test("hll sketch estimates are within 5% of exact, union >= max per-type") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val est = Relational.aggHllSketch(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("est_users")).toMap
    val exactAll = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(math.abs(est("ALL") - exactAll).toDouble / exactAll <= 0.05)
    assert(est("ALL") >= est.filter(_._1 != "ALL").values.max)
  }

  test("pivot counts per user sum to the user's event count") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val p = Relational.aggPivot(spark, sf)
    val total = p.select(
      ($"n_click" + $"n_error" + $"n_purchase" + $"n_signup" + $"n_view").as("t"))
      .agg(sum($"t")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("moment-based stddev/corr agree with Spark's built-in estimators to 1e-3") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val ours = Relational.aggStatsMoments(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val builtin = Tables.lineitem(spark, sf).groupBy($"l_returnflag")
      .agg(stddev_samp($"l_quantity").as("sd"), corr($"l_quantity", $"l_extendedprice").as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    ours.foreach { case (k, (sd, c)) =>
      assert(math.abs(sd - builtin(k)._1) < 1e-3)
      assert(math.abs(c - builtin(k)._2) < 1e-3)
    }
  }

  test("json extraction is robust to malformed props (null, not crash)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val malformed = Seq("not json", """{"k": "str"}""", "", null, """{"other": 1}""")
      .toDF("props")
    // the exact expression json_extract uses: under ANSI mode a plain cast
    // would throw on {"k": "str"}; try_cast must yield null instead
    val out = malformed
      .select(expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.forall(_.isEmpty)) // every malformed/missing case yields null
  }

  test("approx_count_distinct is within 5% of exact (rsd=0.01 requested)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val approx = Relational.aggApproxDistinct(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    val exact = Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n <= 0.05, s"$k: ${approx(k)} vs $n")
    }
  }
}
