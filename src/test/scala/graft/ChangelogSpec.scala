package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Changelog

class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("op classification covers the domain and preserves cardinality") {
    val df = Changelog.opClassify(spark, sf)
    val total = Tables.events(spark, sf).count()
    assert(df.count() == total)
    val ops = df.select("op").distinct().collect().map(_.getString(0)).toSet
    assert(ops == Set("c", "u", "d"))
  }

  test("latest state: one row per key, and it is the max (ts, event_id) event") {
    val s = spark
    import s.implicits._
    val state = Changelog.latestState(spark, sf)
    val nKeys = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(state.count() == nKeys)
    // cross-check one key against a direct sort
    val ev = Tables.events(spark, sf)
      .filter($"user_id" === 0)
      .orderBy(unix_micros($"ts").desc, $"event_id".desc)
      .limit(1).collect().head
    val got = state.filter($"user_id" === 0).collect().head
    assert(got.getAs[Long]("last_event_id") == ev.getAs[Long]("event_id"))
  }

  test("latest-wins is input-order insensitive (upsert semantics R4)") {
    val s = spark
    import s.implicits._
    val base = Changelog.latestState(spark, sf).collect().toSeq
    // same data, adversarial pre-ordering + different partitioning
    val shuffled = Tables.events(spark, sf).orderBy($"value").repartition(7)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val alt = shuffled.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_id".as("last_event_id"),
        $"event_type".as("last_event_type"), round($"value", 4).as("last_value"),
        unix_micros($"ts").as("last_ts_us"))
      .orderBy($"user_id").collect().toSeq
    assert(alt == base)
  }

  test("delete semantics: dropped keys are exactly those whose last op is d") {
    val s = spark
    import s.implicits._
    val all  = Changelog.latestState(spark, sf)
    val live = Changelog.latestStateWithDeletes(spark, sf)
    val deletedKeys = all.filter($"last_event_type" === "error")
      .select($"user_id").collect().map(_.getLong(0)).toSet
    val liveKeys = live.select($"user_id").collect().map(_.getLong(0)).toSet
    assert(liveKeys.intersect(deletedKeys).isEmpty)
    assert(all.count() == live.count() + deletedKeys.size)
  }

  test("op counts partition the changelog") {
    val s = spark
    import s.implicits._
    val counts = Changelog.opCounts(spark, sf).collect()
    assert(counts.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count())
    // offset surrogates are consistent
    counts.foreach { r =>
      assert(r.getAs[Long]("min_event_id") <= r.getAs[Long]("max_event_id"))
    }
  }

  test("tumbling windows cover every event exactly once") {
    val df = Changelog.streamTumbling(spark, sf)
    val total = df.agg(sum("n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("snapshot-union's time filter pushes down to the parquet scan") {
    val df = Changelog.snapshotUnion(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(ts,"),
      s"ts_ns cutoff not pushed to scan:\n$plan")
    // both phases present and partition the event ids
    val s = spark
    import s.implicits._
    assert(df.count() ==
      Tables.events(spark, sf).filter($"ts_ns" >= 1705276800L * 1000000000L).count() +
      Tables.events(spark, sf).filter($"ts_ns" < 1705276800L * 1000000000L)
        .select($"user_id").distinct().count())
  }

  test("as-of attribution: every attributed click precedes its purchase") {
    val s = spark
    import s.implicits._
    val df = Changelog.asofAttribution(spark, sf)
    assert(df.count() ==
      Tables.events(spark, sf).filter($"event_type" === "purchase").count())
    // gap is strictly positive wherever a click was found
    assert(df.filter($"click_event_id".isNotNull && $"gap_us" <= 0).count() == 0)
  }

  test("sessionize: sessions partition the events and never overlap per user") {
    val s = spark
    import s.implicits._
    val df = Changelog.sessionize(spark, sf)
    assert(df.agg(sum("n_events")).collect().head.getLong(0) ==
      Tables.events(spark, sf).count())
    // starts strictly increase per user (orderBy already by (user, start))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"session_start_us")
    val bad = df.withColumn("prev", lag($"session_start_us", 1).over(w))
      .filter($"prev".isNotNull && $"session_start_us" <= $"prev").count()
    assert(bad == 0)
  }

  test("topic routing produces one topic per event type with full namespace") {
    val s = spark
    import s.implicits._
    val topics = Changelog.keyRouting(spark, sf).collect()
    assert(topics.length == 5)
    assert(topics.forall(_.getAs[String]("topic")
      .startsWith("GraftNamespace.graft_keyspace.")))
  }
}
