package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Fixture canary: the driver refreshes `events.parquet` between rounds and
  * has already changed its `ts` physical type twice (TIMESTAMP(NANOS) →
  * ns-as-long → µs TIMESTAMP_NTZ). `Tables.events` must normalize every
  * variant to the same surface; when the NEXT refresh lands, this spec
  * fails by name instead of 40+ downstream specs failing anonymously. */
class EventsFixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/events.parquet").exists())

  test("events normalizes to (ts: TIMESTAMP, ts_ns: µs-aligned long) on every sf dir") {
    assert(sfDirs.nonEmpty, "no test fixture dirs found")
    sfDirs.foreach { dir =>
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$dir: ts is ${ev.schema("ts").dataType}, expected TIMESTAMP — fixture drifted?")
      assert(ev.schema("ts_ns").dataType == LongType, s"$dir: ts_ns must be a long")
      val bad = ev.filter(col("ts_ns") % 1000L =!= 0L ||
        unix_micros(col("ts")) * 1000L =!= col("ts_ns")).count()
      assert(bad == 0, s"$dir: $bad rows where ts_ns is not the µs-aligned nanos of ts")
    }
  }

  test("timestamp-literal range predicates on ts reach the parquet scan") {
    val cutoff = lit("2024-01-15 00:00:00").cast(TimestampType)
    val plan = Tables.events(spark, sf).filter(col("ts") < cutoff)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(ts,"),
      s"ts range predicate did not push down — Tables.events conversion not unwrappable:\n$plan")
  }
}
