package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{AudioFunctions, SilenceRuns}
import graft.mm.MultiModal

/** Round-10 additions: the one-pass audio window-sum expression, the
  * shuffle-free silence-run fold, and the plan contract that replaced the
  * round-9 quadratic filter-inlined lambda. */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("ascii_window_sums equals the declarative per-window lambda (incl. non-ASCII)") {
    val s = spark
    import s.implicits._
    // empty payload (the NULL-window case), shorter-than-window, exact
    // multiples, non-ASCII codepoints (é=233, €=8364) — ascii() is
    // codePointAt(0), so the sums must be code-point sums
    val texts = Seq("", "ab", "a" * 64, "x" * 100, ("héllo€ " * 20).trim)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val win = 64
    val stride = 32
    val blen = length($"text")
    val nWin = greatest(
      (floor((blen - win).cast(DoubleType) / stride) + 1).cast(IntegerType), lit(1))
    val reference = df
      .select($"id", $"text", explode(sequence(lit(0), nWin - 1)).as("w"))
      .select($"id", $"w",
        $"text".substr($"w" * stride + 1, lit(win)).as("winS"))
      .select($"id", $"w",
        when(length($"winS") > 0,
          aggregate(
            transform(sequence(lit(1), length($"winS")),
              i => ascii($"winS".substr(i, lit(1))).cast(LongType)),
            lit(0L), (acc, v) => acc + v))
          .otherwise(lit(null).cast(LongType)).as("byte_sum"))
      .orderBy($"id", $"w").collect().toSeq
    val got = df
      .select($"id",
        posexplode(AudioFunctions.ascii_window_sums($"text", win, stride))
          .as(Seq("w", "byte_sum")))
      .orderBy($"id", $"w").collect().toSeq
    assert(got == reference)
  }

  test("silence_runs groups maximal runs, honours the ≤ boundary, breaks on NULL") {
    def runs(sums: Array[Any], tlen: Int, win: Int = 4, stride: Int = 2,
        maxMean: Long = 10L): Seq[(Int, Long, Long)] = {
      val arr = SilenceRuns.compute(new GenericArrayData(sums), tlen, win, stride, maxMean)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 3)
        (r.getInt(0), r.getLong(1), r.getLong(2))
      }
    }
    // full windows of len 4, threshold 40: boundary 40 is quiet, 41 is not;
    // [q q loud q] → two runs with exact starts/lengths/sums
    assert(runs(Array[Any](40L, 40L, 41L, 39L), tlen = 10) ===
      Seq((0, 2L, 80L), (3, 1L, 39L)))
    // NULL window sum (the empty-payload fixture) is never quiet and
    // splits an otherwise-contiguous run
    assert(runs(Array[Any](10L, null, 10L), tlen = 8) ===
      Seq((0, 1L, 10L), (2, 1L, 10L)))
    // shorter-than-window payload: the single window is scored over its
    // REAL length (tlen=3 → quiet iff sum ≤ 30)
    assert(runs(Array[Any](30L), tlen = 3) === Seq((0, 1L, 30L)))
    assert(runs(Array[Any](31L), tlen = 3) === Seq.empty)
    // all loud → no runs
    assert(runs(Array[Any](99L, 99L), tlen = 6) === Seq.empty)
  }

  test("mm_audio_silence equals the window-islands reference computation") {
    val s = spark
    import s.implicits._
    val win = MultiModal.AudioWin
    val stride = MultiModal.AudioStride
    val blen = length($"text")
    val nWin = greatest(
      (floor((blen - win).cast(DoubleType) / stride) + 1).cast(IntegerType), lit(1))
    // the round-9 declarative shape — substr windows, per-window lambda
    // sum, quiet filter, win_idx − row_number islands — kept here as the
    // executable specification the codegen rewrite must match
    val quiet = MultiModal.documentsWithFixture(spark, sf)
      .select($"doc_id".as("media_id"), $"text",
        explode(sequence(lit(0), nWin - 1)).as("w"))
      .select($"media_id", $"w".as("win_idx"),
        $"text".substr($"w" * stride + 1, lit(win)).as("winS"))
      .select($"media_id", $"win_idx",
        length($"winS").cast(LongType).as("win_len"),
        when(length($"winS") > 0,
          aggregate(
            transform(sequence(lit(1), length($"winS")),
              i => ascii($"winS".substr(i, lit(1))).cast(LongType)),
            lit(0L), (acc, v) => acc + v))
          .otherwise(lit(null).cast(LongType)).as("byte_sum"))
      .filter($"byte_sum".isNotNull &&
        $"byte_sum" <= lit(MultiModal.SilenceMean) * $"win_len")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_id").orderBy($"win_idx")
    val reference = quiet
      .withColumn("grp", $"win_idx" - row_number().over(w))
      .groupBy($"media_id", $"grp")
      .agg(min($"win_idx").as("run_start"), count(lit(1)).as("run_len"),
        sum($"byte_sum").as("run_byte_sum"))
      .select($"media_id", $"run_start".cast(IntegerType).as("run_start"),
        $"run_len", $"run_byte_sum")
      .orderBy($"media_id", $"run_start").collect().toSeq
    val got = MultiModal.audioSilence(spark, sf).collect().toSeq
    assert(got.nonEmpty, "fixture corpus must produce silence runs")
    assert(got == reference)
  }

  test("cdc_stream_tws_ttl equals cdc_stream_state_ttl row-for-row (API-generation equivalence)") {
    val s = spark
    import s.implicits._
    val v2 = graft.cdc.StreamingLatest.streamTwsTtl(spark, sf).collect().toSeq
    val v1 = graft.cdc.StreamingLatest.streamStateTtl(spark, sf).collect().toSeq
    assert(v2.nonEmpty)
    // timers (v2) and EventTimeTimeout (v1) must produce the SAME final
    // lifecycle: same winners, same eviction flags, key for key
    assert(v2 == v1)
    // both lifecycle branches occur at smoke scale, and the flag is the
    // ms-truncated closed-form horizon predicate
    val maxUs = Tables.events(spark, sf)
      .agg(max(unix_micros($"ts"))).first().getLong(0)
    v2.foreach { r =>
      val want = r.getAs[Long]("last_ts_us") / 1000L + 7200000L < maxUs / 1000L - 3600000L
      assert(r.getAs[Boolean]("expired") == want, s"flag wrong for $r")
    }
    assert(v2.exists(_.getAs[Boolean]("expired")))
    assert(v2.exists(!_.getAs[Boolean]("expired")))
  }

  test("cdc_stream_tws_topk: incremental ListState maintenance equals the batch top-3") {
    val s = spark
    import s.implicits._
    val got = graft.cdc.StreamingLatest.streamTwsTopk(spark, sf).collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"value".desc, $"event_id".desc)
    val expected = Tables.events(spark, sf)
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"user_id", $"rank", $"event_id", round($"value", 4).as("value"))
      .orderBy($"user_id", $"rank").collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("cdc_stream_tws_counts: entry-wise MapState counters equal the batch GROUP BY") {
    val s = spark
    import s.implicits._
    val got = graft.cdc.StreamingLatest.streamTwsCounts(spark, sf).collect().toSeq
    val expected = Tables.events(spark, sf)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .orderBy($"user_id", $"event_type").collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("label propagation: cliques collapse to min id; star oscillation is pinned") {
    val s = spark
    import s.implicits._
    // two disjoint triangles: each must collapse to its min id (stable
    // from round 2, so the fixed 4 rounds land on the fixpoint)
    val cliques = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L))
      .toDF("doc_a", "doc_b")
    val got = graft.llm.GraphOps.labelPropagationOnPairs(spark, cliques)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
    // star: synchronous LPA oscillates (leaves take the hub's label,
    // the hub takes the smallest leaf's) — the EVEN round count pins
    // the final state deterministically: hub back to 0, leaves at 1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("doc_a", "doc_b")
    val g2 = graft.llm.GraphOps.labelPropagationOnPairs(spark, star)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("cdc_stream_join_semi equals the batch semi join") {
    val s = spark
    import s.implicits._
    val got = graft.cdc.StreamingLatest.streamJoinSemi(spark, sf).collect().toSeq
    val ev = Tables.events(spark, sf)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"), $"user_id".as("p_user"))
    val c = ev.filter($"event_type" === "click")
      .select($"ts".as("c_ts"), $"user_id".as("c_user"))
    val expected = p.join(c,
        expr("p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"),
        "left_semi")
      .select($"p_id".as("purchase_event_id"), $"p_user".as("user_id"),
        unix_micros($"p_ts").as("p_ts_us"))
      .orderBy($"purchase_event_id").collect().toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("layout_rebalance_write splits each skewed key across multiple balanced files") {
    val s = spark
    import s.implicits._
    val dir = graft.rel.Bucketing.rebalancedDir(spark, sf)
    val perFile = spark.read.parquet(dir)
      .groupBy($"l_returnflag", col("_metadata.file_name").as("f"))
      .count()
    // the point of REBALANCE over repartition(key): each of the 3 flag
    // values must NOT sit in one fat file
    val filesPerFlag = perFile.groupBy($"l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(filesPerFlag.size == 3, s"expected 3 flags, got $filesPerFlag")
    filesPerFlag.foreach { case (flag, nf) =>
      assert(nf >= 2, s"flag $flag landed in one file — rebalance split didn't happen")
    }
    // and the split pieces are balanced: no file more than 4x the median
    val counts = perFile.select($"count").collect().map(_.getLong(0)).sorted
    val median = counts(counts.length / 2)
    assert(counts.last <= median * 4,
      s"rebalanced files unbalanced: max ${counts.last} vs median $median")
    // values unchanged (the oracle proves this cross-engine; this is the
    // fast in-suite guard): row count equals the source
    assert(spark.read.parquet(dir).count() == Tables.lineitem(spark, sf).count())
  }

  test("mm_audio_silence plans no shuffle beyond the presentation sort") {
    val plan = MultiModal.audioSilence(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"silence runs must fold inside the row, not via a window pass:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"no hash exchange should survive — runs never cross a document:\n$plan")
  }
}
