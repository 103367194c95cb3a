package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.rel.SqlSurface

/** Specs for the pure-SQL surface shapes (recursive CTE, LATERAL,
  * LIMIT/OFFSET). */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("sql_recursive_cte: calendar is dense (80 months) and counts conserve") {
    val s = spark
    import s.implicits._
    val df = SqlSurface.recursiveCte(spark, sf).cache()
    assert(df.count() == 80, "1995-01 .. 2001-08 inclusive = 80 months")
    val total = df.agg(sum($"n_orders")).collect().head.getLong(0)
    assert(total == Tables.orders(spark, sf).count(),
      "every order lands in exactly one month; densified months add zeros")
    df.unpersist()
  }

  test("join_lateral_topk: lateral row is that customer's max-price order") {
    val s = spark
    import s.implicits._
    val got = SqlSurface.lateralTopk(spark, sf)
    val want = Tables.orders(spark, sf)
      .groupBy($"o_custkey").agg(max($"o_totalprice").as("mx"))
    val viol = got.join(want, got("c_custkey") === want("o_custkey"))
      .filter($"o_totalprice" =!= $"mx").count()
    assert(viol == 0)
    // one row per qualifying customer that has orders
    assert(got.groupBy($"c_custkey").count().filter($"count" > 1).count() == 0)
  }

  test("sort_limit_offset: page 3 equals rows 21-30 of the full ordering") {
    val s = spark
    import s.implicits._
    val page = SqlSurface.sortLimitOffset(spark, sf).collect().map(_.getLong(0))
    val full = Tables.orders(spark, sf)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(30).collect().map(_.getLong(0)).drop(20)
    assert(page.sameElements(full))
  }

  test("sql_pipe_query: pipe syntax gives the plain formulation's rows") {
    val pipe = SqlSurface.pipeQuery(spark, sf).collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("n_orders"),
        r.getAs[Double]("sum_price"))).toSeq
    val plain = SqlSurface.paramQuery(spark, sf).collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("n_orders"),
        r.getAs[Double]("sum_price"))).toSeq
    assert(pipe == plain, "pipe syntax diverged from the plain query")
    assert(pipe.nonEmpty)
  }
}
