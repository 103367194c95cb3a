package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract specs for the round-11 additions (funnel mining, containment
  * dedup, and friends) beyond their DuckDB oracles. */
class Round8OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("window_funnel_steps: step times are ordered and depth counts steps") {
    val s = spark
    import s.implicits._
    val out = graft.rel.Modern.windowFunnelSteps(spark, sf).collect()
    // one row per distinct user
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(out.length == nUsers)
    out.foreach { r =>
      val (v, c, p) = (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))
      val depth = r.getAs[Int]("funnel_depth")
      // strict ordering along the funnel; each step requires the previous
      (v, c) match { case (Some(a), Some(b)) => assert(b > a); case _ => assert(c.isEmpty || v.nonEmpty) }
      (c, p) match { case (Some(a), Some(b)) => assert(b > a); case _ => assert(p.isEmpty || c.nonEmpty) }
      assert(depth == Seq(v, c, p).takeWhile(_.nonEmpty).length)
    }
    // the fixture's event mix produces full-funnel users
    assert(out.exists(_.getAs[Int]("funnel_depth") == 3))
  }

  test("dedup_containment: prefix-filtered pairs equal the naive all-pairs recount") {
    val s = spark
    import s.implicits._
    val cont = graft.llm.TextOps.dedupContainment(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("containment")).toMap
    // naive all-pairs recount on raw shingle strings (same short-doc
    // rule as word_shingle_hashes: one partial shingle below width 3)
    def shingles(ts: Array[String]): Set[String] =
      ts.sliding(3).map(_.mkString(" ")).toSet
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), shingles(r.getString(1).split(" ", -1))))
    val expect = (for {
      (ida, sa) <- docs; (idb, sb) <- docs if ida != idb
      c = math.floor(sa.intersect(sb).size.toDouble / sa.size * 1e4 + 0.5) / 1e4
      if c >= 0.8
    } yield (ida, idb) -> c).toMap
    assert(cont == expect,
      s"containment mismatch: missing=${(expect.keySet -- cont.keySet).take(5)} " +
        s"extra=${(cont.keySet -- expect.keySet).take(5)}")
    // (the synthetic corpus's near-dups are same-length mutations, so
    // every fixture pair happens to qualify in both directions — the
    // directional semantics are pinned by the per-direction |A|
    // denominator in the recount above, not by fixture asymmetry)
    assert(expect.nonEmpty, "fixture should contain containment pairs")
  }

  test("mm_image_phash: banded pairs equal the codec-independent all-pairs recount") {
    val s = spark
    import s.implicits._
    import graft.mm.MultiModal._
    // recompute every dHash from pixelChannels directly — no BMP bytes,
    // no javax.imageio — so the assertion is independent of the codec
    def expectedHash(seed: Array[Byte]): Long = {
      val (w, h) = (BmpWidth, bmpHeight(seed.length))
      val sums = Array.ofDim[Long](PhashRows, PhashCols)
      val cnts = Array.ofDim[Long](PhashRows, PhashCols)
      for (y <- 0 until h; x <- 0 until w) {
        val by = math.min(PhashRows - 1, y * PhashRows / h)
        val bx = math.min(PhashCols - 1, x * PhashCols / w)
        val (r, g, b) = pixelChannels(seed, x, y)
        sums(by)(bx) += r + g + b
        cnts(by)(bx) += 1
      }
      (for {
        r <- 0 until PhashRows; c <- 0 until PhashCols - 1
        if sums(r)(c) * cnts(r)(c + 1) > sums(r)(c + 1) * cnts(r)(c)
      } yield 1L << (r * (PhashCols - 1) + c)).foldLeft(0L)(_ | _)
    }
    val hashes = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        expectedHash(r.getString(1).getBytes("UTF-8")))
    val expect = (for {
      (ida, ha) <- hashes; (idb, hb) <- hashes if ida < idb
      d = java.lang.Long.bitCount(ha ^ hb) if d <= PhashMaxHamming
    } yield (ida, idb, d)).toSet
    val got = graft.mm.MultiModal.imagePhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    assert(expect.exists(_._3 == 0) && expect.exists(_._3 > 0),
      "fixture should contain both exact and near image dups")
  }

  test("sample_temperature_weights: allocations sum to budget and flatten shares") {
    val s = spark
    import s.implicits._
    val out = graft.llm.TextOps.sampleTemperatureWeights(spark, sf).collect()
    val totalToks = out.map(_.getAs[Long]("lang_tokens")).sum
    // largest-remainder: integer allocations sum EXACTLY to the budget
    assert(out.map(_.getAs[Long]("alloc_tokens")).sum == totalToks / 2)
    // temperature flattening: smaller languages get a strictly higher
    // effective sampling rate than larger ones (α<1 upsamples the tail)
    val byTok = out.sortBy(_.getAs[Long]("lang_tokens"))
    val rates = byTok.map(_.getAs[Long]("rate_ppm"))
    assert(rates.zip(rates.tail).forall { case (small, big) => small >= big },
      s"rates should be non-increasing in language size: ${byTok.map(r =>
        (r.getAs[String]("lang"), r.getAs[Long]("lang_tokens"),
          r.getAs[Long]("rate_ppm"))).toSeq}")
  }

  test("table_quality_checks: six rules pass, the strict range rule reports violations") {
    val out = graft.rel.FuncSurface.tableQualityChecks(spark, sf).collect()
      .map(r => (r.getAs[String]("rule"), r.getAs[Long]("n_violations"),
        r.getAs[Boolean]("pass"))).toSeq
    assert(out.length == 7)
    val (range, rest) = out.partition(_._1 == "shipdate_in_range")
    assert(rest.forall { case (_, v, p) => v == 0L && p },
      s"clean rules should pass: ${rest.filterNot(_._3)}")
    // the deliberately-strict rule must exercise the non-zero path
    assert(range.head._2 > 0L && !range.head._3)
    out.foreach { case (_, v, p) => assert(p == (v == 0L)) }
  }

  test("text_quality_classifier: verdict agrees with an independent recount") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.llm.TextOps.qualityClassifier(spark, sf).collect()
    assert(out.length == docs.size)
    val verdicts = out.map(_.getAs[String]("verdict")).toSet
    assert(verdicts == Set("keep", "review", "drop"),
      s"fixture should hit all three verdicts, got $verdicts")
    out.take(50).foreach { r =>
      val ts = docs(r.getAs[Long]("doc_id")).split(" ", -1)
      val n = ts.length.toLong
      def ppm(c: Long) = math.floor(c * 1000000.0 / n + 0.5).toLong
      val score = ppm(ts.distinct.length) +
        4 * ppm(ts.count(t => t == "the" || t == "a")) + 10000 * math.min(n, 64)
      assert(r.getAs[Long]("score") == score)
      val expect = if (score >= 1400000) "keep"
        else if (score >= 1100000) "review" else "drop"
      assert(r.getAs[String]("verdict") == expect)
    }
  }

  test("vec_pca_power: returned direction dominates seeded alternatives") {
    val s = spark
    import s.implicits._
    val v = graft.llm.VectorOps.pcaPower(spark, sf).collect()
      .sortBy(_.getAs[Int]("dim")).map(_.getAs[Long]("loading_ppm").toDouble / 1e6)
    assert(v.length == 64)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"loading vector should be unit, norm=$norm")
    val corpus = Tables.embeddings(spark, sf).select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    def rayleigh(d: Array[Double]): Double = {
      val n = math.sqrt(d.map(x => x * x).sum)
      corpus.map { e =>
        val p = e.zip(d).map { case (a, b) => a * b }.sum / n
        p * p
      }.sum
    }
    val rPca = rayleigh(v)
    // deterministic pseudo-random alternatives (hash-derived, no RNG state)
    val alts = (1 to 10).map { seed =>
      Array.tabulate(64)(d =>
        (((seed * 2654435761L + d * 40503L) & 0xffff) / 65535.0) - 0.5)
    }
    alts.foreach { a =>
      assert(rPca >= rayleigh(a),
        s"power-iteration direction should dominate a random direction")
    }
  }

  test("window_gap_islands: islands partition each user's stream with alternating types") {
    val s = spark
    import s.implicits._
    val out = graft.rel.Modern.windowGapIslands(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("island_no"),
        r.getAs[String]("event_type"), r.getAs[Long]("n_events")))
    val perUser = Tables.events(spark, sf).groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_._1).foreach { case (uid, rows) =>
      // island lengths partition the user's event count
      assert(rows.map(_._4).sum == perUser(uid))
      // island numbering is 1..k dense and adjacent islands change type
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rows.length).toSeq)
      sorted.map(_._3).sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0) != pair(1), s"user $uid adjacent islands share type")
      }
    }
  }

  test("join_scd2_pointintime: lookup returns the latest strictly-prior version") {
    val s = spark
    import s.implicits._
    val events = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val out = graft.cdc.Changelog.scd2PointInTime(spark, sf).collect()
    val purchases = events.filter(_._3 == "purchase")
    assert(out.length == purchases.length, "exactly one row per purchase (no fan-out)")
    out.take(80).foreach { r =>
      val pid = r.getAs[Long]("purchase_event_id")
      val (uid, _, _, pus) = events.find(_._2 == pid).get
      // naive recount: the version in effect at t = pus-1 is the latest
      // event with a strictly earlier timestamp (a same-microsecond
      // event's interval [pus, …) opens after t)
      val prior = events.filter(e => e._1 == uid && e._4 < pus)
      if (prior.isEmpty) assert(r.isNullAt(r.fieldIndex("state_event_id")))
      else {
        val best = prior.maxBy(e => (e._4, e._2))
        assert(r.getAs[Long]("state_event_id") == best._2,
          s"purchase $pid expected state ${best._2}")
      }
    }
  }

  test("text_dedup_lines: digests match a naive rebuild and removal fires") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val segsOf = docs.map { case (id, t) =>
      id -> t.split(" ", -1).grouped(16).map(_.mkString(" ")).toVector
    }.toMap
    val freq = segsOf.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    val out = graft.llm.TextOps.dedupLines(spark, sf).collect()
    assert(out.length == docs.length)
    var removedTotal = 0L
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val segs = segsOf(id)
      assert(r.getAs[Long]("n_segments") == segs.length)
      val kept = segs.filter(sg => freq(sg) < 4)
      assert(r.getAs[Long]("n_removed") == segs.length - kept.length)
      removedTotal += r.getAs[Long]("n_removed")
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("cleaned_md5") == dig)
    }
    assert(removedTotal > 0, "fixture should contain boilerplate segments")
  }

  test("join_null_aware_anti: 3VL semantics and the null-aware anti plan") {
    val df = graft.rel.SqlSurface.nullAwareAnti(spark, sf)
    val r = df.collect().head
    assert(r.getAs[Long]("not_in_nullable") == 0L,
      "NOT IN over a null-bearing set must return zero rows")
    assert(r.getAs[Long]("not_in_clean") == r.getAs[Long]("not_exists"))
    assert(r.getAs[Long]("not_exists") > 0L)
    // the NOT IN must ride Spark's null-aware anti join, not a nested loop
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), "expected an anti-join in the plan")
  }

  test("join_interval_overlap: overlap accounting matches a naive recount") {
    val s = spark
    import s.implicits._
    val events = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val gap = 1800000000L
    val sessions = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val ts = evs.map(_._2).sorted
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (start, last) = (ts.head, ts.head)
      ts.tail.foreach { t =>
        if (t - last >= gap) { bounds += ((start, last + gap)); start = t }
        last = t
      }
      bounds += ((start, last + gap))
      bounds
    }
    val wins = Seq(
      (1, 1704412800000000L, 1704672000000000L),
      (2, 1705060800000000L, 1705190400000000L),
      (3, 1705708800000000L, 1706140800000000L))
    val expect = wins.map { case (id, ws, we) =>
      val ov = sessions.filter { case (s0, e0) => s0 < we && ws < e0 }
      id -> (ov.length.toLong,
        ov.map { case (s0, e0) => math.min(e0, we) - math.max(s0, ws) }.sum)
    }.toMap
    graft.rel.Modern.joinIntervalOverlap(spark, sf).collect().foreach { r =>
      val (n, total) = expect(r.getAs[Int]("window_id"))
      assert(r.getAs[Long]("n_sessions") == n)
      assert(r.getAs[Long]("total_overlap_us") == total)
    }
  }

  test("pipeline_corpus_build: funnel stages are coherent and keep set is hash-stable") {
    val s = spark
    import s.implicits._
    val out = graft.llm.TextOps.corpusBuild(spark, sf).collect()
    val langs = Tables.documents(spark, sf).select($"lang").distinct().count()
    assert(out.length == langs)
    var budgetTokens = 0L
    var keptTokens = 0L
    out.foreach { r =>
      val (raw, q, u) = (r.getAs[Long]("n_docs_raw"),
        r.getAs[Long]("n_docs_quality"), r.getAs[Long]("n_docs_unique"))
      val (kd, kt, lt) = (r.getAs[Long]("n_docs_kept"),
        r.getAs[Long]("n_tokens_kept"), r.getAs[Long]("lang_tokens"))
      assert(raw >= q && q >= u && u >= kd, "funnel must be monotone")
      assert(kd > 0L && kt > 0L && kt <= lt)
      assert(r.getAs[Long]("rate_ppm") <= 1000000L)
      budgetTokens += lt
      keptTokens += kt
    }
    // the hash-bucket selection approximates the half-corpus budget;
    // expectation is exact, realization fluctuates with bucket draws
    val ratio = keptTokens.toDouble / (budgetTokens / 2)
    assert(ratio > 0.5 && ratio < 1.5,
      s"kept tokens should be near the half-corpus budget, ratio=$ratio")
    // determinism: a second run keeps the identical per-lang counts
    val again = graft.llm.TextOps.corpusBuild(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs_kept"))).toMap
    out.foreach { r =>
      assert(again(r.getAs[String]("lang")) == r.getAs[Long]("n_docs_kept"))
    }
  }

  test("sample_balanced_classes: every class lands at the min size with the hash-ranked set") {
    val s = spark
    import s.implicits._
    val byLang = Tables.documents(spark, sf).select($"doc_id", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
    val minN = byLang.values.map(_.length).min
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = graft.llm.TextOps.balancedClasses(spark, sf).collect()
    assert(out.length == byLang.size)
    out.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(r.getAs[Long]("n_kept") == minN)
      assert(r.getAs[Long]("n_docs") == byLang(lang).length)
      val kept = byLang(lang).map(_._1)
        .sortBy(id => (md5hex(id.toString), id)).take(minN).sorted
      assert(r.getAs[String]("kept_ids_md5") == md5hex(kept.mkString(",")))
    }
  }

  test("window_retention_cohorts: offset-0 is full retention and cells match a recount") {
    val s = spark
    import s.implicits._
    val weekUs = 7L * 24 * 3600 * 1000000L
    val epoch0 = 1704067200000000L
    val act = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us")).collect()
      .map(r => (r.getLong(0), (r.getLong(1) - epoch0) / weekUs)).distinct
    val cohortOf = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val out = graft.rel.Modern.windowRetentionCohorts(spark, sf).collect()
    out.foreach { r =>
      val (c, k) = (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"))
      val members = cohortOf.filter(_._2 == c).keySet
      assert(r.getAs[Long]("n_cohort") == members.size)
      val active = act.filter { case (u, w) =>
        members(u) && w - c == k
      }.map(_._1).distinct.length
      assert(r.getAs[Long]("n_active") == active, s"cell ($c, $k)")
      if (k == 0L) assert(r.getAs[Long]("retained_bp") == 10000L,
        "offset 0 is the cohort definition week — everyone is active")
    }
    assert(out.exists(r => r.getAs[Long]("week_offset") > 0L),
      "fixture spans multiple weeks")
  }

  test("window_rolling_distinct: WAU equals the naive per-day trailing recount") {
    val s = spark
    import s.implicits._
    val dayUs = 24L * 3600 * 1000000L
    val epoch0 = 1704067200000000L
    val act = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us")).collect()
      .map(r => (r.getLong(0), (r.getLong(1) - epoch0) / dayUs)).distinct
    val maxD = act.map(_._2).max
    val out = graft.rel.Modern.windowRollingDistinct(spark, sf).collect()
      .map(r => r.getAs[Long]("report_day") -> r.getAs[Long]("wau")).toMap
    (0L to maxD).foreach { d =>
      val expect = act.filter { case (_, ad) => ad <= d && ad >= d - 6 }
        .map(_._1).distinct.length.toLong
      if (expect > 0) assert(out(d) == expect, s"day $d")
      else assert(!out.contains(d))
    }
  }

  test("text_perplexity_bucket: per-lang terciles are balanced and ordered") {
    val s = spark
    import s.implicits._
    val out = graft.llm.TextOps.perplexityBucket(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Double]("avg_nll"),
        r.getAs[String]("ppl_bucket")))
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_._3).view.mapValues(_.length)
      // ntile(3): bucket sizes differ by at most one
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang sizes $sizes")
      // every head score <= every middle score <= every tail score
      def mx(b: String) = rows.filter(_._3 == b).map(_._2).maxOption.getOrElse(-1e9)
      def mn(b: String) = rows.filter(_._3 == b).map(_._2).minOption.getOrElse(1e9)
      assert(mx("head") <= mn("middle") && mx("middle") <= mn("tail"),
        s"$lang bucket boundaries out of order")
    }
  }
}
