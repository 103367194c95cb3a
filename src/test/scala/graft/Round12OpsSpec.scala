package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Changelog
import graft.rel.{FuncSurface, Modern}

/** Round-12 additions: the tolerance-bounded as-of join, the masking
  * string family, and the timezone projection — semantics pinned on
  * planted fixtures plus independent in-Scala recomputation, alongside
  * their three-scale DuckDB oracles. */
class Round12OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("asof tolerance: planted boundary fixture (≤24h in, >24h out, no-click null)") {
    val s = spark
    import s.implicits._
    val h = 3600L * 1000000 // 1 h in µs
    // (event_id, user_id, event_type, ts_us):
    //  user 1: click then purchase 1 h later  -> attributed
    //  user 2: click then purchase 25 h later -> in_window=0, NULL attr
    //  user 3: purchase BEFORE its only click -> no prior click, NULLs
    //  user 4: purchase exactly 24 h after    -> boundary is inclusive
    //  user 5: two clicks; newest is the attribution source
    val rows = Seq(
      (1L, 1L, "click", 0L), (2L, 1L, "purchase", 1 * h),
      (3L, 2L, "click", 0L), (4L, 2L, "purchase", 25 * h),
      (5L, 3L, "purchase", 0L), (6L, 3L, "click", 1 * h),
      (7L, 4L, "click", 0L), (8L, 4L, "purchase", 24 * h),
      (9L, 5L, "click", 0L), (10L, 5L, "click", 2 * h),
      (11L, 5L, "purchase", 3 * h))
    val dir = Files.createTempDirectory(
      Files.createDirectories(Paths.get("/root/repo/target/r12-tmp")), "asof")
    rows.toDF("event_id", "user_id", "event_type", "ts_us")
      .select($"event_id", $"user_id", $"event_type",
        timestamp_micros($"ts_us").as("ts"), lit(0L).as("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Changelog.asofTolerance(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSeq
    assert(got == Seq(
      (2L, 1, Some(1L), Some(1 * h)),
      (4L, 0, None, None),
      (5L, 0, None, None),
      (8L, 1, Some(7L), Some(24 * h)),
      (11L, 1, Some(10L), Some(1 * h))))
  }

  test("asof tolerance ≡ unbounded attribution gated at 24h on the real fixture") {
    val s = spark
    import s.implicits._
    val tolUs = 24L * 3600 * 1000000
    val unb = Changelog.asofAttribution(spark, sf)
      .select($"purchase_event_id", $"click_event_id".as("u_click"), $"gap_us")
    val tol = Changelog.asofTolerance(spark, sf)
    assert(tol.count() ==
      Tables.events(spark, sf).filter($"event_type" === "purchase").count())
    val joined = tol.join(unb, "purchase_event_id")
    // in-window rows carry exactly the unbounded attribution; the rest null
    assert(joined.filter(($"in_window" === 1) =!=
      ($"gap_us".isNotNull && $"gap_us" <= tolUs)).count() == 0)
    assert(joined.filter($"in_window" === 1 &&
      ($"attr_click_id" =!= $"u_click" || $"attr_gap_us" =!= $"gap_us")).count() == 0)
    assert(joined.filter($"in_window" === 0 &&
      ($"attr_click_id".isNotNull || $"attr_gap_us".isNotNull)).count() == 0)
  }

  test("string masking matches an independent per-char recomputation") {
    val s = spark
    import s.implicits._
    def maskDefault(v: String): String = v.map {
      case c if c.isUpper => 'X'
      case c if c.isLower => 'x'
      case c if c.isDigit => 'n'
      case c => c
    }
    def maskPhone(v: String): String = v.map {
      case c if c.isUpper => 'A'
      case c if c.isLower => 'a'
      case c if c.isDigit => '0'
      case _ => '#'
    }
    val rows = FuncSurface.stringMaskFuncs(spark, sf).limit(50).collect()
    val names = Tables.customer(spark, sf)
      .select($"c_custkey", $"c_name", format_string("%02d-%03d-%04d",
        $"c_nationkey", $"c_custkey" % 1000, $"c_custkey" % 10000).as("phone"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (name, phone) = names(r.getLong(0))
      assert(r.getString(1) == maskDefault(name))
      assert(r.getString(2) == maskPhone(phone))
      assert(r.getString(3) == phone.substring(0, 3) + "***" + phone.substring(6, 11))
    }
  }

  test("timezone projection: fixed offsets, clock fields consistent with epochs") {
    val s = spark
    import s.implicits._
    val df = Modern.tsTimezoneFuncs(spark, sf)
    val istOff = (5 * 60 + 30) * 60L * 1000000 // +05:30 in µs
    val pstOff = -8 * 3600L * 1000000
    val base = Tables.events(spark, sf).filter($"event_id" % 37 === 0)
      .select($"event_id", unix_micros($"ts").as("us"))
    val j = df.join(base, "event_id")
    assert(j.count() > 0)
    // both zones are exact interval shifts of the instant clock
    assert(j.filter($"ist_us" =!= $"us" + istOff).count() == 0)
    assert(j.filter($"pst_us" =!= $"us" + pstOff).count() == 0)
    // local clock fields derive from the shifted epoch, day-exactly
    assert(j.filter($"ist_hour" =!=
      pmod(floor($"ist_us" / 3600000000L), lit(24)).cast("int")).count() == 0)
    assert(j.filter($"ist_date" =!=
      date_format(timestamp_micros($"ist_us"), "yyyy-MM-dd")).count() == 0)
  }
}
