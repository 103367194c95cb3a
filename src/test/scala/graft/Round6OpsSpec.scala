package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.GraphOps
import graft.rel.{FuncSurface, Modern}

/** Specs for the round-6 operator additions (SURVEY.md §2.2): XML wire
  * format round trip, higher-order array lambdas, mergeable approx-top-k
  * heavy hitters, and exact-arithmetic link-graph PageRank. */
class Round6OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("xml_roundtrip reproduces every source column") {
    val s = spark
    import s.implicits._
    val parsed = Modern.xmlRoundtrip(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getDouble(3), r.getInt(4))))
      .toMap
    val src = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority", $"o_totalprice",
        unix_date($"o_orderdate".cast("date")).as("d"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getDouble(3), r.getInt(4))))
      .toMap
    assert(parsed == src, "XML round trip lost or altered a field")
  }

  test("array_hof_ops: partition counts, flags, and norm bounds hold") {
    val rows = FuncSurface.arrayHofOps(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nPos, hasBig, allLt1, l2) =
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))
      assert(nPos >= 0 && nPos <= 64)
      assert(hasBig == 0 || hasBig == 1)
      assert(allLt1 == 0 || allLt1 == 1)
      assert(l2 >= 0.0)
      // |x| > 0.25 somewhere forces l2 > 0.25
      if (hasBig == 1) assert(l2 > 0.25 - 1e-4)
    }
  }

  test("agg_approx_top_k equals the exact top-20 (capacity > vocabulary)") {
    val s = spark
    import s.implicits._
    val sketch = Modern.aggApproxTopK(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token").limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketch == exact, "sketch top-20 diverged from exact counts")
  }

  test("agg_theta_setops: sketch set algebra equals exact set arithmetic") {
    val s = spark
    import s.implicits._
    val r = Modern.aggThetaSetops(spark, sf).collect().head
    val clickers = Tables.events(spark, sf).filter($"event_type" === "click")
      .select($"user_id").distinct().collect().map(_.getLong(0)).toSet
    val viewers = Tables.events(spark, sf).filter($"event_type" === "view")
      .select($"user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(r.getLong(0) == clickers.size)
    assert(r.getLong(1) == viewers.size)
    assert(r.getLong(2) == (clickers intersect viewers).size)
    assert(r.getLong(3) == (clickers diff viewers).size)
    // and the identity |A| = |A∩B| + |A\B| holds in the sketch domain
    assert(r.getLong(0) == r.getLong(2) + r.getLong(3))
  }

  test("agg_count_min_sketch: merged partials == global sketch; estimate >= exact") {
    val s = spark
    import s.implicits._
    val est = Modern.aggCountMinSketch(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-sided CMS guarantee against the exact per-user counts
    val exact = Tables.events(spark, sf)
      .filter($"user_id" < 20).groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (u, n) =>
      assert(est(u) >= n, s"CMS underestimated user $u: ${est(u)} < $n")
    }
    // mergeability: associatively merged per-type partials must equal the
    // single global sketch (same dims + seed → identical cell layout)
    val globalBytes = Tables.events(spark, sf)
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
    val global = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(globalBytes))
    (0L until 20L).foreach { u =>
      assert(est(u) == global.estimateCount(java.lang.Long.valueOf(u)),
        s"merged partials diverge from the global sketch at user $u")
    }
  }

  test("graph_pagerank: 3-cycle (regular graph) gives identical ranks") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val ranks = GraphOps.pageRankOnPairs(spark, pairs).collect()
    assert(ranks.length == 3)
    assert(ranks.map(_.getLong(1)).distinct.length == 1,
      "symmetric regular graph must give every node the same rank")
    // fixpoint of r = 0.15/3 + 0.85*r at nano scale: r = 1/3 (integer floor)
    val r = ranks.head.getLong(1)
    assert(math.abs(r - 333333333L) <= 10, s"3-cycle rank drifted: $r")
  }

  test("graph_pagerank: star hub outranks leaves; positions are a permutation") {
    val s = spark
    import s.implicits._
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("doc_a", "doc_b")
    val out = GraphOps.pageRankOnPairs(spark, pairs).collect()
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(l => byId(0L) > byId(l)), "hub must dominate leaves")
    assert(out.map(_.getInt(2)).sorted.toSeq == (1 to 5).toSeq,
      "pr_pos must be a 1..N permutation")
    assert(byId(0L) == byId.values.max)
  }

  test("mm_patch_grid: patch lengths tile the payload exactly") {
    val s = spark
    import s.implicits._
    val grid = graft.mm.MultiModal.patchGrid(spark, sf)
      .groupBy($"media_id")
      .agg(count(lit(1)).as("n_patches"), sum($"patch_len").as("len_sum"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val src = Tables.documents(spark, sf)
      .select($"doc_id", length($"text").as("blen"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    src.foreach { case (id, blen) =>
      val (np, lenSum) = grid(id)
      assert(np == (blen + 15) / 16, s"doc $id: wrong patch count")
      assert(lenSum == blen, s"doc $id: patch lengths don't tile the payload")
    }
  }

  test("url_canonicalize_dedup: canonical forms are clean and cover all docs") {
    val rows = Modern.urlCanonicalizeDedup(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val u = r.getString(0)
      assert(u.startsWith("https://cdn.example.com/doc/"), s"host not canonical: $u")
      assert(!u.contains("utm_") && !u.contains("#"), s"tracking residue: $u")
      assert(!u.contains("?&") && !u.endsWith("&"), s"dangling separator: $u")
    }
    assert(rows.exists(_.getLong(1) > 1), "no canonical collisions — op is vacuous")
  }

  test("sql_param_query binding is identical to inline literals") {
    val s = spark
    import s.implicits._
    val bound = graft.rel.SqlSurface.paramQuery(spark, sf).collect().map(_.toSeq).toSeq
    val inline = Tables.orders(spark, sf)
      .filter($"o_totalprice" > 150000.0 && $"o_orderstatus" === "F")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,4)")).cast("double").as("sum_price"))
      .orderBy($"o_orderpriority").collect().map(_.toSeq).toSeq
    assert(bound == inline)
  }

  test("cdc_stream_join_outer: inner part matches streamJoin, null rows below horizon") {
    val s = spark
    import s.implicits._
    val outer = graft.cdc.StreamingLatest.streamJoinOuter(spark, sf).collect()
    val inner = graft.cdc.StreamingLatest.streamJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val outerMatched = outer.filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(outerMatched == inner, "outer join's matched part must equal the inner join")
    // the finalized horizon: null rows only for purchases below
    // min(max purchase ts, max click ts) - 1 h
    val ev = Tables.events(spark, sf)
    val maxP = ev.filter($"event_type" === "purchase").agg(max(unix_micros($"ts"))).first().getLong(0)
    val maxC = ev.filter($"event_type" === "click").agg(max(unix_micros($"ts"))).first().getLong(0)
    val horizon = math.min(maxP, maxC) - 3600000000L
    val nullPurchases = outer.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    val purchaseTs = ev.filter($"event_type" === "purchase")
      .select($"event_id", unix_micros($"ts")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    nullPurchases.foreach { p =>
      assert(purchaseTs(p) < horizon,
        s"null row for purchase $p at ts ${purchaseTs(p)} ≥ horizon $horizon")
    }
    // and every finalized unmatched purchase DID get its null row
    val unmatchedFinalized = purchaseTs.collect {
      case (id, ts) if ts < horizon && !outerMatched.exists(_._1 == id) => id
    }.toSet
    assert(unmatchedFinalized == nullPurchases,
      "finalized unmatched purchases must all surface as null rows")
  }

  test("cdc_stream_stateful_tws (state API v2) equals batch cdc_latest_state") {
    val tws = graft.cdc.StreamingLatest.streamStatefulTws(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = graft.cdc.Changelog.latestState(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(tws == batch, "transformWithState result diverged from batch latest-wins")
  }

  test("xml_xpath_extract inverts the construction, incl. repeated elements") {
    val s = spark
    import s.implicits._
    val got = Modern.xmlXpathExtract(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    val want = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"n_chars".cast("int"),
        least(lit(3), size(split($"text", " "))).cast("int"),
        array_join(slice(split($"text", " "), 1, 3), "|"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(got == want)
  }

  test("subquery_exists_select flags agree with the semi-join counts") {
    val s = spark
    import s.implicits._
    val rows = graft.rel.SqlSurface.existsSelect(spark, sf).collect()
    assert(rows.length == Tables.customer(spark, sf).count())
    val urgentCustomers = Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct().collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert((r.getInt(2) == 1) == urgentCustomers(r.getLong(0)),
        s"has_urgent wrong for customer ${r.getLong(0)}")
    }
  }

  test("agg_try_arith equals the plain arithmetic on in-range data") {
    val s = spark
    import s.implicits._
    val tried = graft.rel.FuncSurface.aggTryArith(spark, sf).collect().map(_.toSeq).toSeq
    val plain = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(
        round(sum($"l_extendedprice".cast("decimal(18,4)")).cast("double"), 4),
        round(avg($"l_extendedprice".cast("decimal(18,4)")).cast("double"), 4),
        (max($"l_quantity").cast("long") + 1L),
        (count(lit(1)) * 2L))
      .orderBy($"l_returnflag").collect().map(_.toSeq).toSeq
    assert(tried == plain)
  }

  test("cdc_stream_update_counts final emissions equal the batch aggregate") {
    val s = spark
    import s.implicits._
    val streamed = graft.cdc.StreamingLatest.streamUpdateCounts(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value".cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
      .orderBy($"event_type").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("mm_audio_window: overlap framing and byte sums are exact") {
    val s = spark
    import s.implicits._
    val rows = graft.mm.MultiModal.audioWindows(spark, sf)
      .filter($"media_id" === 0L).collect()
    val text = Tables.documents(spark, sf).filter($"doc_id" === 0L)
      .select($"text").first().getString(0)
    val expWins = math.max((text.length - 64) / 32 + 1, 1)
    assert(rows.length == expWins, s"expected $expWins windows, got ${rows.length}")
    rows.foreach { r =>
      val (idx, len, sum) = (r.getInt(1), r.getInt(2), r.getLong(3))
      val slice = text.slice(idx * 32, idx * 32 + 64)
      assert(len == slice.length)
      assert(sum == slice.map(_.toLong).sum, s"window $idx byte sum mismatch")
    }
  }

  test("array_edit_ops: edit arithmetic consistent with raw token arrays") {
    val s = spark
    import s.implicits._
    val rows = graft.rel.FuncSurface.arrayEditOps(spark, sf).collect()
    val toks = Tables.documents(spark, sf).select($"doc_id", split($"text", " "))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    rows.foreach { r =>
      val t = toks(r.getLong(0))
      assert(r.getInt(1) == math.min(4, math.max(t.length, 0)) ||
        r.getInt(1) == (t.slice(0, 2) ++ t.slice(2, 4)).length)
      assert(r.getInt(2) == t.count(_ != "the"))
      assert(r.getLong(3) == (t.indexOf("the") + 1).toLong)
      assert(r.getString(4).split(",").length == 3)
      assert(r.getInt(5) == t.distinct.count(Set("the", "a", "of", "and", "is")))
    }
  }

  test("join_hash_hint result is identical to the broadcast twin") {
    val hinted = graft.rel.Relational.joinHashHint(spark, sf).collect().map(_.toSeq).toSeq
    val bcast = graft.rel.Relational.joinBroadcast(spark, sf).collect().map(_.toSeq).toSeq
    assert(hinted == bcast, "a join strategy hint must never change results")
  }

  test("observe() metrics piggyback on a query action (free pipeline QA counters)") {
    val s = spark
    import s.implicits._
    val obs = new org.apache.spark.sql.Observation("qa")
    val orders = Tables.orders(spark, sf)
      .observe(obs, count(lit(1)).as("n_rows"),
        sum($"o_totalprice".cast("decimal(18,4)")).as("price_total"))
    orders.filter($"o_orderstatus" === "F").count() // any action drains the metrics
    val got = obs.get
    val expRows = Tables.orders(spark, sf).count()
    val expTotal = Tables.orders(spark, sf)
      .agg(sum($"o_totalprice".cast("decimal(18,4)"))).first().getDecimal(0)
    assert(got("n_rows") == expRows, "observed row count wrong")
    assert(got("price_total") == expTotal, "observed sum wrong")
  }

  test("cdc_envelope_evolution: v1 rows read NULL value, v2 rows keep it") {
    val s = spark
    import s.implicits._
    val rows = graft.cdc.Envelope.envelopeEvolution(spark, sf).collect()
    assert(rows.length == Tables.events(spark, sf).count())
    rows.foreach { r =>
      val (id, gen) = (r.getLong(0), r.getInt(4))
      assert(gen == (if (id % 2 == 0) 1 else 2))
      if (gen == 1) assert(r.isNullAt(3), s"v1 record $id must read NULL value")
      else assert(!r.isNullAt(3), s"v2 record $id lost its value")
    }
  }

  test("source_orc_roundtrip matches the parquet-side aggregate") {
    val s = spark
    import s.implicits._
    val viaOrc = graft.rel.Formats.orcRoundtrip(spark, sf).collect().map(_.toSeq).toSeq
    val direct = Tables.orders(spark, sf)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4).as("sum_price"),
        min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderstatus").collect().map(_.toSeq).toSeq
    assert(viaOrc == direct, "ORC round trip altered the data")
  }

  test("window_range_interval: hour frame brackets the running count") {
    val s = spark
    import s.implicits._
    val rows = Modern.windowRangeInterval(spark, sf).collect()
    // frame includes the current row and only same-user events
    rows.foreach(r => assert(r.getLong(2) >= 1))
    // spot-check one user against a hand computation
    val u = rows.head.getLong(1)
    val evs = Tables.events(spark, sf).filter($"user_id" === u)
      .select($"event_id", unix_micros($"ts")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_.getLong(1) == u).foreach { r =>
      val t = evs(r.getLong(0))
      val exp = evs.values.count(v => v >= t - 3600000000L && v <= t)
      assert(r.getLong(2) == exp,
        s"event ${r.getLong(0)}: frame count ${r.getLong(2)} != $exp")
    }
  }

  test("graph_pagerank on the corpus is deterministic across runs") {
    val a = GraphOps.pageRank(spark, sf).collect().map(_.toSeq).toSeq
    val b = GraphOps.pageRank(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("join_bloom_prefilter: bloom pass is a superset of true matches, result exact") {
    val s = spark
    import s.implicits._
    val cust = Tables.customer(spark, sf)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val bloom = cust.agg(graft.functions.BloomFunctions
      .bloom_filter_agg($"c_custkey", 10000L, 80000L)).scalar()
    val pre = Tables.orders(spark, sf)
      .where(graft.functions.BloomFunctions.might_contain(bloom, $"o_custkey"))
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val exact = Tables.orders(spark, sf)
      .join(cust, $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(pre), "bloom filter produced a false negative")
    // the declared query equals the plain semi-join aggregate exactly
    val viaBloom = graft.rel.Relational.joinBloomPrefilter(spark, sf).collect().map(_.toSeq).toSeq
    val plain = Tables.orders(spark, sf)
      .join(cust, $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum($"o_totalprice".cast("decimal(18,4)"))
            .cast("double"), 4).as("sum_price"))
      .orderBy($"o_orderpriority").collect().map(_.toSeq).toSeq
    assert(viaBloom == plain)
  }
}
