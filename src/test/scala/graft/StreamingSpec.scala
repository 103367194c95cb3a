package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Changelog, StreamingLatest}

/** Streaming/batch equivalence (SURVEY.md §5.5): the stateful streaming
  * latest-wins must converge to exactly the batch window result. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("cdc_stream_static_join equals the batch enrichment join exactly") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    val stream = StreamingLatest.streamStaticJoin(spark, sf).collect().toSeq
    val first = Tables.events(spark, sf)
      .groupBy($"user_id".as("d_user"))
      .agg(unix_micros(min($"ts")).as("first_us"))
    val batch = Tables.events(spark, sf)
      .join(first, $"user_id" === $"d_user")
      .select($"event_id", $"user_id", $"first_us",
        (unix_micros($"ts") - $"first_us").as("since_first_us"))
      .orderBy($"event_id").collect().toSeq
    assert(stream == batch, "stateless stream-static join must equal the batch join")
  }

  test("cdc_stream_foreachbatch incremental MERGE equals batch latest-state-with-deletes") {
    val streamRows = StreamingLatest.streamForeachBatchMerge(spark, sf).collect().toSeq
    val batchRows  = Changelog.latestStateWithDeletes(spark, sf).collect().toSeq
    assert(streamRows.length == batchRows.length)
    assert(streamRows == batchRows,
      "N-batch foreachBatch MERGE must equal the one-shot full-log rebuild")
  }

  test("cdc_stream_stateful final state equals batch cdc_latest_state") {
    val streamRows = StreamingLatest.streamStateful(spark, sf).collect().toSeq
    val batchRows  = Changelog.latestState(spark, sf).collect().toSeq
    assert(streamRows.length == batchRows.length)
    assert(streamRows == batchRows)
  }

  test("cdc_stream_windowed equals batch cdc_stream_tumbling") {
    val streamRows = StreamingLatest.streamWindowed(spark, sf).collect().toSeq
    val batchRows  = Changelog.streamTumbling(spark, sf).collect().toSeq
    assert(streamRows == batchRows)
  }

  test("salted two-phase latest-wins equals the window formulation") {
    val salted = Changelog.latestStateSalted(spark, sf).collect().toSeq
    val window = Changelog.latestState(spark, sf).collect().toSeq
    assert(salted == window)
  }

  test("checkpoint resume (R18): restart picks up only new files, final state correct") {
    val s = spark
    import s.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, GroupStateTimeout, Trigger}

    val runDir = Files.createTempDirectory(
      Files.createDirectories(Paths.get("/root/repo/target/stream-tmp")), "resume")
    val inDir = s"$runDir/in"; val outDir = s"$runDir/out"; val ckpt = s"$runDir/ckpt"

    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val firstHalf  = ev.filter($"event_id" % 2 === 0)
    val secondHalf = ev.filter($"event_id" % 2 === 1)

    def runOnce(): Unit = {
      val q = spark.readStream.schema(ev.schema).parquet(inDir)
        .as[StreamingLatest.Ev]
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
          StreamingLatest.updateKey _)
        .writeStream.outputMode("update")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingLatest.LatestRow], _: Long) =>
            b.write.mode("append").parquet(outDir)
        }.start()
      q.awaitTermination()
    }

    firstHalf.coalesce(1).write.mode("append").parquet(inDir)
    runOnce()                        // processes first half, commits offsets
    val afterFirst = spark.read.parquet(outDir).count()
    secondHalf.coalesce(1).write.mode("append").parquet(inDir)
    runOnce()                        // RESUME: must process only the new file
    val afterSecond = spark.read.parquet(outDir).count()
    assert(afterSecond > afterFirst)

    // final state (latest row per user across appended snapshots) == batch
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"last_ts_us".desc, $"last_event_id".desc)
    val finalState = spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"last_event_id", $"last_event_type",
        round($"last_value", 4).as("last_value"), $"last_ts_us")
      .orderBy($"user_id").collect().toSeq
    assert(finalState == Changelog.latestState(spark, sf).collect().toSeq)

    // the resumed run must NOT have reprocessed the first file: the output
    // appended by run 2 reflects only keys whose latest changed or arrived
    assert(afterSecond - afterFirst <=
      secondHalf.select($"user_id").distinct().count())
  }

  test("derived state-partition count is checkpoint-pinned: a grown source keeps the launch count, correctly") {
    // Lifecycle contract of Tuning.statePartitions (r18): the shuffle
    // partition count at a streaming query's FIRST start is pinned into
    // the checkpoint as the state-store partition count for the
    // checkpoint's whole lifetime — a source that GROWS under an
    // existing checkpoint keeps the launch-time count silently. This
    // spec proves both halves of the operational story: (a) the stale
    // count is a CAPACITY regression only, never a correctness one —
    // the restarted query still answers exactly; (b) re-sharding means
    // a NEW checkpoint + full replay, which picks up the count derived
    // from the grown volume.
    val s = spark
    import s.implicits._
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, GroupStateTimeout, Trigger}

    val runDir = Files.createTempDirectory(
      Files.createDirectories(Paths.get("/root/repo/target/stream-tmp")), "pinned")
    val inDir = s"$runDir/in"; val outDir = s"$runDir/out"

    val ev = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val firstHalf  = ev.filter($"event_id" % 2 === 0)
    val secondHalf = ev.filter($"event_id" % 2 === 1)

    def runOnce(ckpt: String, shufflePartitions: Int, out: String): Unit = {
      val k = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(k)
      spark.conf.set(k, shufflePartitions.toString)
      try {
        val q = spark.readStream.schema(ev.schema).parquet(inDir)
          .as[StreamingLatest.Ev]
          .groupByKey(_.user_id)
          .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
            StreamingLatest.updateKey _)
          .writeStream.outputMode("update")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[StreamingLatest.LatestRow], _: Long) =>
              b.write.mode("append").parquet(out)
          }.start()
        q.awaitTermination()
      } finally spark.conf.set(k, prev)
    }
    // state-store partition directories under <ckpt>/state/0/ — the
    // physical record of the pinned count
    def statePartitionDirs(ckpt: String): Int = {
      val st = Files.list(Paths.get(s"$ckpt/state/0"))
      try st.filter(p => p.getFileName.toString.forall(_.isDigit)).count().toInt
      finally st.close()
    }
    def latestFrom(out: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"last_ts_us".desc, $"last_event_id".desc)
      spark.read.parquet(out)
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id", $"last_event_id", $"last_event_type",
          round($"last_value", 4).as("last_value"), $"last_ts_us")
        .orderBy($"user_id").collect().toSeq
    }

    // launch on the small log: count 4 (the fixture-scale derivation)
    val ckptA = s"$runDir/ckptA"
    firstHalf.coalesce(1).write.mode("append").parquet(inDir)
    runOnce(ckptA, 4, outDir)
    assert(statePartitionDirs(ckptA) == 4,
      "first start must pin the launch-time partition count into the checkpoint")

    // the source GROWS; restart on the SAME checkpoint with a LARGER
    // derived count (9): the checkpoint must keep 4 — and still answer
    secondHalf.coalesce(1).write.mode("append").parquet(inDir)
    runOnce(ckptA, 9, outDir)
    assert(statePartitionDirs(ckptA) == 4,
      "a restart must reuse the checkpoint-pinned count, not the session conf")
    assert(latestFrom(outDir) == Changelog.latestState(spark, sf).collect().toSeq,
      "the stale pinned count must never change the answer")

    // re-shard = NEW checkpoint + full replay: the fresh launch adopts
    // the count derived from the grown volume
    val ckptB = s"$runDir/ckptB"; val outB = s"$runDir/outB"
    runOnce(ckptB, 9, outB)
    assert(statePartitionDirs(ckptB) == 9,
      "a fresh checkpoint must adopt the newly derived count")
    assert(latestFrom(outB) == Changelog.latestState(spark, sf).collect().toSeq)
  }

  test("cdc_state_reader: persisted streaming-agg state equals the batch aggregate") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    val got = StreamingLatest.streamStateReader(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value".cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
      .orderBy($"user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want && got.nonEmpty)
  }
}
