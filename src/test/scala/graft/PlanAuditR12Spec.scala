package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 plan pins — same contract as PlanAuditSpec's round-11 test:
  * each new data-path operator's physical plan is pinned to the shape
  * its scale argument depends on, so a regression fails by name. */
class PlanAuditR12Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  private def plan(n: String): String =
    SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
  private def count(p: String, needle: String): Int =
    needle.r.findAllIn(p).length

  test("round-12 data-path ops keep their intended plan shapes") {
    // gap-fill: the grid join and BOTH ignoreNulls frame windows ride
    // user-keyed exchanges — and the anchor/grid sides stay exchange-
    // light (no corpus-wide shuffle beyond the keyed ones)
    val gf = plan("ts_gapfill_interpolate")
    assert(gf.contains("Window"), "gap-fill lost its frame windows")
    assert(count(gf, "Exchange hashpartitioning") <= 4,
      s"gap-fill grew extra shuffles:\n$gf")
    assert(!gf.contains("CartesianProduct") && !gf.contains("BroadcastNestedLoopJoin"))
    // typed UDAF: must plan as a real two-phase aggregate (partial on
    // the map side), not a single-phase collect-everything
    val ud = plan("sql_udaf_typed")
    assert(ud.contains("partial_graft_top3_sum") ||
      ud.toLowerCase.contains("partial"),
      s"UDAF lost map-side partial aggregation:\n$ud")
    assert(count(ud, "Exchange hashpartitioning") == 1,
      "UDAF aggregate should need exactly one exchange")
    // radius join: equi-join on cell keys (SMJ or SHJ/BHJ), never a
    // nested loop — the banding is the whole point
    val rg = plan("join_radius_grid")
    assert(!rg.contains("CartesianProduct") && !rg.contains("BroadcastNestedLoopJoin"),
      s"radius join degenerated to all-pairs:\n$rg")
    // text source: the scan reads ONLY the single value column
    val tl = plan("source_text_lines")
    assert(tl.contains("ReadSchema: struct<value:string>"),
      s"text scan reads more than the value column:\n$tl")
    // dynamic overwrite: partitioned scan feeding a plain aggregate
    val dyo = plan("layout_dynamic_overwrite")
    assert(!dyo.contains("Join"), "dynamic-overwrite query should be scan+agg only")
  }
}
