package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.rel.FuncSurface
import graft.llm.{TextOps, VectorOps}

/** Specs for the round-3 function-surface ops: regression-from-moments,
  * null-safety scalars, ts formatting, array ops, sequence packing,
  * token entropy, int8 quantization. */
class FuncSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("agg_regression: decimal-moment slope/r2 track Spark's native regr_* closely") {
    val s = spark
    import s.implicits._
    val got = FuncSurface.aggRegression(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("slope"), r.getAs[Double]("r2"))).toMap
    val native = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(expr("regr_slope(l_extendedprice/1000.0, l_quantity)").as("sl"),
        expr("regr_r2(l_extendedprice/1000.0, l_quantity)").as("r2"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    got.foreach { case (flag, (slope, r2)) =>
      assert(math.abs(slope - native(flag)._1) < 1e-3, s"slope mismatch for $flag")
      assert(math.abs(r2 - native(flag)._2) < 1e-3, s"r2 mismatch for $flag")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("cond_null_funcs: try_divide nulls exactly the p_size=5 rows") {
    val s = spark
    import s.implicits._
    val df = FuncSurface.condNullFuncs(spark, sf).cache()
    val nullDiv = df.filter($"price_per_size" === -1.0).count()
    val sizeFive = Tables.part(spark, sf).filter($"p_size" === 5).count()
    assert(nullDiv == sizeFive, "divide-by-zero must null exactly size-5 parts")
    assert(df.filter($"size_or_null".isNull).count() ==
      Tables.part(spark, sf).filter($"p_size" === 10).count())
    val range = df.agg(min($"size_clamped"), max($"size_clamped")).collect().head
    assert(range.getInt(0) >= 5 && range.getInt(1) <= 40)
    df.unpersist()
  }

  test("ts_format_funcs: formatted day string round-trips the epoch") {
    val s = spark
    import s.implicits._
    val row = FuncSurface.tsFormatFuncs(spark, sf).limit(1).collect().head
    val fromEpoch = java.time.Instant.ofEpochSecond(row.getAs[Long]("epoch_s"))
      .toString.substring(0, 10)
    assert(row.getAs[String]("day_str") == fromEpoch)
    assert(row.getAs[Int]("h") >= 0 && row.getAs[Int]("h") <= 23)
  }

  test("array_basic_ops: dims fixed at 64, min <= max, distinct <= dims") {
    val s = spark
    import s.implicits._
    val rows = FuncSurface.arrayBasicOps(spark, sf).collect()
    assert(rows.forall(_.getAs[Int]("n_dims") == 64))
    assert(rows.forall(r => r.getAs[Int]("n_distinct") <= 64))
    assert(rows.forall(r => r.getAs[Double]("min_v") <= r.getAs[Double]("max_v")))
  }

  test("text_pack_sequences: packing conserves tokens and respects bin order") {
    val s = spark
    import s.implicits._
    val df = TextOps.packSequences(spark, sf).cache()
    val packedTokens = df.agg(sum($"tok_sum")).collect().head.getLong(0)
    val corpusTokens = Tables.documents(spark, sf)
      .select(size(split($"text", " ")).cast("long").as("n"))
      .agg(sum($"n")).collect().head.getLong(0)
    assert(packedTokens == corpusTokens, "every token lands in exactly one bin")
    // bins are contiguous from 0 within each lang
    val bad = df.groupBy($"lang")
      .agg(min($"bin").as("mn"), max($"bin").as("mx"), count(lit(1)).as("k"))
      .filter($"mn" =!= 0 || $"mx" =!= $"k" - 1).count()
    assert(bad == 0, "bins must be contiguous 0..k-1 per lang")
    df.unpersist()
  }

  test("text_entropy: uniform-token doc has zero entropy; bounds hold") {
    val s = spark
    import s.implicits._
    val ent = TextOps.tokenEntropy(spark, sf).cache()
    // entropy in [0, ln n]
    val bad = ent.filter($"entropy_nats" < -1e-9 ||
      $"entropy_nats" > log($"n_tokens".cast("double")) + 1e-4).count()
    assert(bad == 0)
    // a doc that is one token repeated must score exactly 0
    val single = Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size(array_distinct($"toks")) === 1)
      .select($"doc_id").limit(1).collect()
    single.foreach { r =>
      val e = ent.filter($"doc_id" === r.getLong(0)).collect().head.getAs[Double]("entropy_nats")
      assert(e == 0.0)
    }
    ent.unpersist()
  }

  test("string_pad_funcs: pad widths and split_part agree with raw string ops") {
    val s = spark
    import s.implicits._
    val row = FuncSurface.stringPadFuncs(spark, sf).limit(1).collect().head
    assert(row.getAs[String]("brand_lpad").length == 12)
    assert(row.getAs[String]("type_rpad").length == 10)
    val name = Tables.part(spark, sf).orderBy($"p_partkey").limit(1)
      .collect().head.getAs[String]("p_name")
    assert(row.getAs[String]("first_word") == name.split(" ").head)
    assert(row.getAs[String]("name_rev") == name.reverse)
  }

  test("window_moving_avg: first row per customer equals its own price") {
    val s = spark
    import s.implicits._
    val df = FuncSurface.windowMovingAvg(spark, sf)
    val firsts = Tables.orders(spark, sf)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")))
      .filter($"rn" === 1)
      .select($"o_orderkey", $"o_totalprice")
    val joined = df.join(firsts, "o_orderkey")
      .filter(abs($"mov_avg" - $"o_totalprice") > 1e-3).count()
    assert(joined == 0, "a 1-row frame's average is the row itself")
  }

  test("agg_count_distinct_multi: distinct nation count bounded by 25") {
    val s = spark
    import s.implicits._
    val rows = FuncSurface.aggCountDistinctMulti(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("n_nations") <= 25))
    assert(rows.forall(r => r.getAs[Long]("n_nations") <= r.getAs[Long]("n_cust")))
  }

  test("table_profile_stats: profile agrees with direct per-column queries") {
    val s = spark
    import s.implicits._
    val rows = FuncSurface.tableProfileStats(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val orders = Tables.orders(spark, sf)
    assert(rows("o_orderstatus").getAs[Long]("n_rows") == orders.count())
    assert(rows("o_orderstatus").getAs[Long]("n_distinct") ==
      orders.select($"o_orderstatus").distinct().count())
    assert(rows("o_orderpriority").getAs[Long]("n_null") == 0)
    assert(rows("o_orderpriority").getAs[String]("min_v") == "1-URGENT")
  }

  test("text_vocab_ids: ids are contiguous and counts non-increasing") {
    val s = spark
    import s.implicits._
    val vocabSize = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t")).distinct().count().toInt
    val rows = TextOps.vocabIds(spark, sf).collect()
    assert(rows.length == math.min(100, vocabSize))
    assert(rows.map(_.getAs[Int]("vocab_id")).sameElements(0 until rows.length))
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("sample_group_hash_topk: k rows per group, stable across recomputation") {
    val s = spark
    import s.implicits._
    val a = TextOps.sampleGroupHashTopk(spark, sf).collect()
    val b = TextOps.sampleGroupHashTopk(spark, sf).collect()
    assert(a.sameElements(b), "hash-rank sample must be run-deterministic")
    val perGroup = TextOps.sampleGroupHashTopk(spark, sf)
      .groupBy($"lang").count().collect()
    assert(perGroup.forall(_.getAs[Long]("count") <= 3))
  }

  test("join_full_outer: keeps months present on either side, counts conserve") {
    val s = spark
    import s.implicits._
    val df = FuncSurface.joinFullOuter(spark, sf).cache()
    assert(df.agg(sum($"n_orders")).collect().head.getLong(0) ==
      Tables.orders(spark, sf).count())
    assert(df.agg(sum($"n_ship_lines")).collect().head.getLong(0) ==
      Tables.lineitem(spark, sf).count())
    // shipdates run past the last orderdate month: some rows must be
    // order-less (the full-outer right side surviving)
    assert(df.filter($"n_orders" === 0).count() > 0)
    df.unpersist()
  }

  test("set_ops_all: bag semantics — except_all + intersect_all = left multiplicity") {
    val s = spark
    import s.implicits._
    val df = FuncSurface.setOpsAll(spark, sf)
    val byOp = df.groupBy($"op").agg(sum($"n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val building = Tables.customer(spark, sf)
      .filter($"c_mktsegment" === "BUILDING").count()
    assert(byOp.getOrElse("except_all", 0L) + byOp.getOrElse("intersect_all", 0L)
      == building, "every BUILDING row lands in exactly one of except_all/intersect_all")
  }

  test("math_extended_funcs: ceil/floor bracket the value, pmod non-negative") {
    val s = spark
    import s.implicits._
    val df = FuncSurface.mathExtendedFuncs(spark, sf)
    assert(df.filter($"bal_ceil" < $"bal_floor").count() == 0)
    assert(df.filter($"key_mod7" < 0 || $"key_mod7" > 6).count() == 0)
    assert(df.filter($"bal_sqrt" < 0).count() == 0)
  }

  test("join_right_outer: every customer appears exactly once") {
    val s = spark
    import s.implicits._
    val df = FuncSurface.joinRightOuter(spark, sf)
    assert(df.count() == Tables.customer(spark, sf).count())
    assert(df.filter($"n_urgent" === 0).count() > 0, "orderless customers survive")
  }

  test("csv_line_roundtrip: parsed fields equal the originals") {
    val s = spark
    import s.implicits._
    val bad = FuncSurface.csvLineRoundtrip(spark, sf)
      .join(Tables.events(spark, sf).select($"event_id", $"user_id", $"event_type"),
        "event_id")
      .filter($"rt_user_id" =!= $"user_id" || $"rt_event_type" =!= $"event_type")
      .count()
    assert(bad == 0)
  }

  test("binary_codec_funcs: base64 round-trip is lossless") {
    val s = spark
    import s.implicits._
    val bad = FuncSurface.binaryCodecFuncs(spark, sf)
      .filter($"byte_len" =!= $"rt_byte_len").count()
    assert(bad == 0)
  }

  test("map_explode_entries: map round-trip conserves event counts") {
    val s = spark
    import s.implicits._
    val total = FuncSurface.mapExplodeEntries(spark, sf)
      .agg(sum($"n_events")).collect().head.getLong(0)
    assert(total == Tables.events(spark, sf).count(),
      "build-map-then-explode must conserve every grouped count")
  }

  test("posexplode_outer_tokens: positions contiguous per doc, empty docs keep a null row") {
    val s = spark
    import s.implicits._
    val df = TextOps.posexplodeOuterTokens(spark, sf).cache()
    assert(df.select($"doc_id").distinct().count() ==
      Tables.documents(spark, sf).count(), "outer generate keeps every document")
    val badPos = df.filter($"pos".isNotNull)
      .groupBy($"doc_id").agg(min($"pos").as("mn"), max($"pos").as("mx"), count(lit(1)).as("k"))
      .filter($"mn" =!= 0 || $"mx" =!= $"k" - 1).count()
    assert(badPos == 0, "positions are 0..k-1 per document")
    assert(df.filter($"pos".isNull && $"long_tok".isNotNull).count() == 0)
    df.unpersist()
  }

  test("embed_quantize: quantized values stay in int8 range, scale positive") {
    val s = spark
    import s.implicits._
    val rows = VectorOps.embedQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Double]("scale_q") > 0))
    assert(rows.forall(r => r.getAs[Int]("q_min") >= -127 && r.getAs[Int]("q_max") <= 127))
    // max|q| must hit 127 for at least the dominant dimension (by construction
    // scale = max|v|/127, so one element quantizes to ±127)
    assert(rows.forall(r => r.getAs[Int]("q_max") == 127 || r.getAs[Int]("q_min") == -127))
  }
}
