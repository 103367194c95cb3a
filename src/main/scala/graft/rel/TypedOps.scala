package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The typed sorted-group surface (Spark 4 `flatMapSortedGroups` /
  * `cogroupSorted`) — the Dataset API for per-key logic that NEEDS its
  * rows in order but doesn't need state across batches: the engine
  * shuffles once by key and sorts WITHIN partitions (secondary sort),
  * handing each group a sorted iterator. That is the 100 TB contract
  * worth caring about: user code never buffers or sorts a group in
  * memory (compare a naive `mapGroups` + `toSeq.sortBy`, which
  * materializes the whole group and dies on a hot key), so group size
  * is bounded only by disk like any sort-merge operator.
  *
  * Both queries fold in one pass over the sorted iterator(s) and are
  * integer-exact, so the window-function oracles match bit-for-bit. */
object TypedOps {

  case class Ev(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String, value: Double)
  case class Streak(user_id: Long, longest_streak: Long, n_events: Long)
  case class Interleave(user_id: Long, n_purchases: Long, n_clicks: Long,
      click_then_purchase: Long)

  private def events(spark: SparkSession, sfDir: String) = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir)
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"user_id",
        $"event_type", $"value")
      .as[Ev]
  }

  /** `typed_sorted_streaks`: per user, the longest STRICTLY-increasing
    * run of `value` in (ts, event_id) order — the order-dependent
    * per-key fold (streaks, session heuristics, monotonicity checks)
    * that aggregate functions can't express and unsorted `mapGroups`
    * would have to sort in user memory. `flatMapSortedGroups` gets the
    * engine's secondary sort; the fold is one pass, O(1) state. Oracle:
    * the lag/cumsum islands twin — a decrease (or equal value) starts a
    * new island, max island length per user. */
  def sortedStreaks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"ts_us", $"event_id") { (uid: Long, it: Iterator[Ev]) =>
        var longest = 0L
        var cur = 0L
        var n = 0L
        var prev = 0.0
        var seen = false
        it.foreach { e =>
          n += 1
          cur = if (seen && e.value > prev) cur + 1 else 1L
          if (cur > longest) longest = cur
          prev = e.value
          seen = true
        }
        Iterator.single(Streak(uid, longest, n))
      }
      .toDF()
      .orderBy($"user_id")
  }

  /** `typed_cogroup_sorted`: per user, purchases and clicks MERGED in
    * global (ts, event_id) order by a two-iterator merge scan —
    * `cogroupSorted` hands BOTH sides sorted, so the interleaving stat
    * (purchases immediately preceded by a click — the engaged-purchase
    * signal) falls out of one pass with O(1) state and zero user-side
    * sorting; the relational twin needs a union + lag window over the
    * merged stream, which is exactly what the oracle states. Keys
    * present on either side are covered (a click-only user reports
    * zero purchases). */
  def cogroupInterleave(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, sfDir)
    val purchases = ev.filter(_.event_type == "purchase").groupByKey(_.user_id)
    val clicks = ev.filter(_.event_type == "click").groupByKey(_.user_id)
    purchases
      .cogroupSorted(clicks)($"ts_us", $"event_id")($"ts_us", $"event_id") {
        (uid: Long, ps: Iterator[Ev], cs: Iterator[Ev]) =>
          val pi = ps.buffered
          val ci = cs.buffered
          var np = 0L
          var nc = 0L
          var ctp = 0L
          var prevWasClick = false
          while (pi.hasNext || ci.hasNext) {
            val takeP = pi.hasNext && (!ci.hasNext ||
              pi.head.ts_us < ci.head.ts_us ||
              (pi.head.ts_us == ci.head.ts_us && pi.head.event_id < ci.head.event_id))
            if (takeP) {
              pi.next(); np += 1
              if (prevWasClick) ctp += 1
              prevWasClick = false
            } else {
              ci.next(); nc += 1
              prevWasClick = true
            }
          }
          Iterator.single(Interleave(uid, np, nc, ctp))
      }
      .toDF()
      .orderBy($"user_id")
  }
}
