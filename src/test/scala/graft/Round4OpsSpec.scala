package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Changelog, StreamingLatest}
import graft.llm.{TextOps, VectorOps}
import graft.rel.Modern

/** Specs for the round-4 operator additions (SURVEY.md §2.2): the
  * Spark-4-era surface (listagg, percentile_disc, bitmap distinct,
  * VARIANT, collations), interval arithmetic, map higher-order
  * transforms, URL parsing, edit distance, regexp analytics, the inline
  * generator, the brute-force kNN join, and the RocksDB state-store
  * streaming variant. */
class Round4OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("agg_listagg: one row per region, nations sorted within group") {
    val s = spark
    import s.implicits._
    val rows = Modern.aggListagg(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val parts = r.getAs[String]("nations").split(",").toSeq
      assert(parts == parts.sorted, s"unsorted listagg for ${r.getString(0)}")
      assert(parts.length == r.getAs[Long]("n_nations"))
    }
  }

  test("agg_percentile_disc returns actual data values, monotone across p") {
    val s = spark
    import s.implicits._
    val qtys = Tables.lineitem(spark, sf).select($"l_quantity")
      .distinct().collect().map(_.getDouble(0)).toSet
    Modern.aggPercentileDisc(spark, sf).collect().foreach { r =>
      val (p25, p50, p95) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p95)
      assert(qtys.contains(p25) && qtys.contains(p50) && qtys.contains(p95),
        "discrete percentile must be an actual data value")
    }
  }

  test("agg_bitmap_distinct equals plain countDistinct") {
    val s = spark
    import s.implicits._
    val viaBitmap = Modern.aggBitmapDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sf).groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBitmap == exact)
  }

  test("json_variant_ops: variant path agrees with get_json_object") {
    val s = spark
    import s.implicits._
    val viaVariant = Modern.jsonVariantOps(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    val viaJson = Tables.events(spark, sf)
      .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"event_type").agg(sum($"k").as("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaVariant == viaJson)
  }

  test("string_collation_ci: case-insensitive grouping matches clean groupBy") {
    val s = spark
    import s.implicits._
    val ci = Modern.stringCollationCi(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val clean = Tables.documents(spark, sf).groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ci == clean, "UTF8_LCASE grouping of the case-mangled copy diverged")
  }

  test("ts_interval_arith offsets are exact milliseconds") {
    val s = spark
    import s.implicits._
    val bad = Modern.tsIntervalArith(spark, sf)
      .join(Tables.events(spark, sf).select($"event_id", unix_millis($"ts").as("base")),
        "event_id")
      .filter(
        $"plus_90d_ms" - $"base" =!= lit(90L * 24 * 3600 * 1000) ||
        $"base" - $"minus_6h_ms" =!= lit(6L * 3600 * 1000) ||
        $"plus_36h_ms" - $"base" =!= lit(36L * 3600 * 1000) ||
        $"plus_30m_ms" - $"base" =!= lit(30L * 60 * 1000))
    assert(bad.count() == 0)
  }

  test("map_transform_ops: filtered/zipped map scalars match direct counts") {
    val s = spark
    import s.implicits._
    val out = Modern.mapTransformOps(spark, sf)
    val direct = Tables.events(spark, sf)
      .groupBy($"user_id").agg(
        countDistinct($"event_type").as("d_types"),
        (sum(when($"event_type" === "click", 1).otherwise(0)) * 2).as("d_clicks_x2"))
    val bad = out.join(direct, "user_id")
      .filter($"n_types" =!= $"d_types" || $"clicks_x2" =!= $"d_clicks_x2")
    assert(bad.count() == 0)
    // map_zip_with(m, m, +) doubles every count
    assert(out.filter($"views_x2" % 2 =!= 0).count() == 0)
  }

  test("url_parse_funcs inverts the URL construction") {
    val s = spark
    import s.implicits._
    val bad = Modern.urlParseFuncs(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
      .filter($"proto" =!= "https" || $"host" =!= "cdn.example.com" ||
        $"q_src" =!= $"source" ||
        $"path" =!= concat(lit("/"), $"lang", lit("/doc/"), $"doc_id".cast("string")))
    assert(bad.count() == 0)
  }

  test("text_edit_distance: zero iff equal, bounded by max token length") {
    val s = spark
    import s.implicits._
    val out = TextOps.textEditDistance(spark, sf)
    assert(out.filter(($"lev_fl" === 0) =!= ($"tok_first" === $"tok_last")).count() == 0)
    assert(out.filter($"lev_fl" > greatest(length($"tok_first"), length($"tok_last")))
      .count() == 0)
  }

  test("text_regexp_funcs: counts/positions consistent with token scan") {
    val s = spark
    import s.implicits._
    val out = TextOps.textRegexpFuncs(spark, sf)
    // n_long = number of tokens with length >= 6 (text is space-joined tokens)
    val direct = Tables.documents(spark, sf).select($"doc_id",
      size(filter(split($"text", " "), t => length(t) >= 6)).as("d_long"))
    assert(out.join(direct, "doc_id").filter($"n_long" =!= $"d_long").count() == 0)
    assert(out.filter($"pos_lit" < 0).count() == 0)
    assert(out.filter(($"n_long" === 0) =!= ($"first_long" === "-")).count() == 0)
  }

  test("gen_inline_zip: every token has length >= 6 and len = length(tok)") {
    val s = spark
    import s.implicits._
    val rows = TextOps.inlineTokenPairs(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[String]("tok").length == r.getAs[Long]("len"))
      assert(r.getAs[Long]("len") >= 6)
    }
  }

  test("sim_knn_join: 3 neighbours per probe, ranked by cosine, no self") {
    val s = spark
    import s.implicits._
    val out = VectorOps.simKnnJoin(spark, sf).collect()
    assert(out.length == 15)
    assert(out.count(r => r.getLong(0) == r.getLong(2)) == 0, "self-pair leaked")
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.length == 3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "cosine not monotone in rank")
    }
  }

  test("sim_knn_join rank-1 of probe 0 matches sim_topk_cosine's best") {
    val s = spark
    import s.implicits._
    val knnBest = VectorOps.simKnnJoin(spark, sf)
      .filter($"probe_id" === 0 && $"rk" === 1)
      .select($"cand_id", $"cos_sim").collect().head
    val topkBest = VectorOps.simTopkCosine(spark, sf)
      .orderBy($"cos_sim".desc, $"vec_id").select($"vec_id", $"cos_sim")
      .collect().head
    assert(knnBest.getLong(0) == topkBest.getLong(0))
    assert(knnBest.getDouble(1) == topkBest.getDouble(1))
  }

  test("cdc_stream_stateful_rocksdb equals batch latest-wins") {
    val rocks = StreamingLatest.streamStatefulRocksDb(spark, sf).collect().toSeq
    val batch = Changelog.latestState(spark, sf).collect().toSeq
    assert(rocks == batch, "RocksDB-backed streaming state diverged from batch")
  }
}
