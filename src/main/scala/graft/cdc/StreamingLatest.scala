package graft.cdc

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured-Streaming latest-wins materialization — the streaming heart
  * of the reference pipeline (Kafka-Connect poll loop + offset tracking,
  * connector.properties:2 / connect-standalone.properties:4-5) re-expressed
  * as one streaming query:
  *
  *   file source (the CDC-log surrogate) -> watermark -> keyed
  *   flatMapGroupsWithState (latest per key by (ts, event_id)) ->
  *   foreachBatch append sink, with a checkpoint dir playing the role of
  *   the Connect offsets file (R18).
  *
  * Scale notes: state is one small record per key, partitioned by the
  * grouping key across executors; the watermark bounds how long late data
  * can arrive, and eviction would hook GroupStateTimeout if keys were
  * unbounded. No driver-side state.
  */
object StreamingLatest {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class LatestRow(user_id: Long, last_event_id: Long, last_event_type: String,
      last_value: Double, last_ts_us: Long)

  private def tsMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** State-store partition count is frozen from shuffle partitions at the
    * first checkpoint; size it to the replayed volume (see [[stateParts]]
    * — derived, floor 4), not the session's CPU count: at 32 partitions
    * on the fixture most state tasks carry near-empty stores and the
    * per-batch fixed cost dominates, while a fixture literal would pin a
    * large replay's state shuffle tiny forever. Restored after the
    * stream completes. */
  private[cdc] def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    withConf(spark,
      (("spark.sql.shuffle.partitions" -> n.toString) +: fastCheckpointConf): _*)(body)

  /** Skip the trailing no-data micro-batch for queries whose output is
    * fully emitted by the data batches themselves. Inner stream-stream
    * joins, update-mode flatMapGroupsWithState (NoTimeout), append-mode
    * dropDuplicatesWithinWatermark and complete-mode aggregates all emit
    * on data arrival — the extra watermark-only batch exists to evict
    * state / fire timeouts, which a finite AvailableNow replay that ends
    * with query shutdown doesn't need. Session windows in append mode DO
    * need it (emission happens when the watermark closes the session), so
    * streamSessionize must not use this. */
  private[cdc] def withoutNoDataBatch[T](spark: SparkSession)(body: => T): T =
    // `graft.keepNoDataBatch` re-enables the trailing batch WITHIN a JVM
    // so `DevStress streamvol nodata` can pair the two forms in one
    // session (the r19 40M inner-join reads motivated the A/B)
    if (sys.props.contains("graft.keepNoDataBatch")) body
    else withConf(spark, "spark.sql.streaming.noDataMicroBatches.enabled" -> "false")(body)

  /** Checkpoint-file checksums (Spark 4.x, on by default) double the
    * WAL/commit file writes per micro-batch to guard long-lived
    * checkpoints against disk corruption. These queries run a finite
    * AvailableNow replay and delete the checkpoint on completion, so the
    * corruption window the checksums defend is the seconds the query is
    * live — not worth 2x the per-batch commit I/O. A long-lived
    * production deployment should leave the default on. */
  private def fastCheckpointConf = Seq(
    "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")

  /** RocksDB provider + changelog checkpointing (default ON, r22): the
    * legacy commit zip-uploads the store's FULL SST snapshot every
    * micro-batch; with changelog checkpointing the commit appends only
    * that batch's key changes and full snapshots move to the background
    * maintenance cadence — the production posture for large stores with
    * small per-batch deltas (a 100 TB deployment's per-batch change set
    * is orders of magnitude smaller than its accumulated state; full
    * uploads per commit are the §2.3 "shuffle the payload, not the
    * delta" mistake on the checkpoint axis). State reconstruction on
    * restart replays snapshot + changelog tail — semantics unchanged
    * (the oracle re-proves it). `SPARK_GRAFT_ROCKSDB_CHANGELOG` /
    * `graft.rocksdbChangelog` override for A/B of the legacy regime. */
  private[cdc] def withRocksDb[T](spark: SparkSession)(body: => T): T =
    withConf(spark,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        sys.props.getOrElse("graft.rocksdbChangelog",
          sys.env.getOrElse("SPARK_GRAFT_ROCKSDB_CHANGELOG", "true")))(body)

  /** Stream-stream join state layout for the four join queries
    * (inner/outer/full/semi). Spark's legacy layout (v2) keeps FOUR
    * state stores per partition per join (keyToNumValues +
    * keyWithIndexToValue, per side) — every micro-batch pays 4×
    * commit/snapshot machinery per partition. Format v3 (Spark 4) keeps
    * ONE RocksDB store per partition using virtual column families; with
    * changelog checkpointing (withRocksDb, r22) a commit appends one
    * changelog instead of snapshotting four stores — the production
    * posture for stateful joins at 100 TB, where per-batch join-state
    * deltas are tiny against accumulated state. Layout only: eviction,
    * matching and emission semantics are identical (the oracle re-proves
    * each join's hash). `SPARK_GRAFT_JOIN_STATE_V3` / `graft.joinStateV3`
    * restore the legacy regime for A/Bs. */
  private[cdc] def withJoinStateV3[T](spark: SparkSession)(body: => T): T =
    if (!sys.props.getOrElse("graft.joinStateV3",
        sys.env.getOrElse("SPARK_GRAFT_JOIN_STATE_V3", "true")).toBoolean) body
    else withRocksDb(spark)(withConf(spark,
      "spark.sql.streaming.join.stateFormatVersion" -> "3")(body))

  private def withConf[T](spark: SparkSession, kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val StagedCols = Seq("event_id", "ts", "user_id", "event_type", "value")
  private val stagedDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** max(unix_micros(ts)) of the staged log, memoized beside
    * [[stagedDirs]] (same signature key): the staging write already
    * aggregates min/max ts to find the split midpoint, so the
    * finalized-horizon queries (sessionize, windowed_append) can reuse
    * the scalar instead of re-running a one-row batch aggregate over
    * events per invocation (~0.1 s of pure lifecycle cost each on the
    * bench box — guide §2.4's "don't recompute what a prior pass
    * already computed", at driver-scalar scale). */
  private val stagedMaxUs = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** State-stage partition count for this source, decided BEFORE the
    * query first starts (the checkpoint pins `shuffle.partitions` as
    * the state-store partition count for the query's lifetime — a
    * post-hoc AQE or conf change can never fix an undersized launch):
    * [[graft.Tuning.statePartitions]] over the replayed event count,
    * memoized per source dir alongside the staged-log memo so the
    * count job (a parquet metadata scan) runs once per (JVM, sfDir),
    * not once per query. Every test fixture lands on the derivation's
    * floor of 4 — the pre-r18 literal — so fixture checkpoints, state
    * layouts and the bench are unchanged; the count only grows when
    * the replayed log does (measured in `DevStress streamvol`). The
    * memo keys on the part-file signature, not the path alone (the
    * DevScale.srcSig idiom, r16/r17 advisor precedent): an events
    * table regenerated in place within one JVM re-counts instead of
    * silently reusing the stale volume. */
  private val eventRows = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Drop memo entries for the SAME source dir under a SUPERSEDED
    * part-file signature (the source was regenerated in place within
    * this JVM), running `onEvict` on each removed value — for the
    * staged-log memo that rmTree's the stale staged parquet copy, which
    * would otherwise sit on disk for the JVM's lifetime (the dead-owner
    * purge only reclaims after JVM exit). Eviction runs OUTSIDE
    * computeIfAbsent: mutating other keys from inside its remapping
    * function is forbidden by ConcurrentHashMap's contract.
    *
    * SEQUENTIAL HARNESS BY DESIGN (the `Tuning.withRoundPartitions`
    * precedent): eviction assumes no OTHER thread is mid-query on the
    * superseded entry — a concurrent caller still replaying the old
    * staged copy would have it rmTree'd out from under its source. The
    * memo map itself is a ConcurrentHashMap (per-key atomicity is
    * free); it is the evict-then-delete that is only safe because every
    * entry point runs queries sequentially per session. A concurrent
    * caller would need to serialize per-sfDir. */
  private def evictStale[V](memo: java.util.concurrent.ConcurrentHashMap[String, V],
      sfDir: String, liveKey: String)(onEvict: V => Unit): Unit = {
    val prefix = sfDir + "\n"
    import scala.jdk.CollectionConverters._
    memo.keySet.iterator.asScala
      .filter(k => k.startsWith(prefix) && k != liveKey).toList
      .foreach(k => Option(memo.remove(k)).foreach(onEvict))
  }

  private def stateParts(spark: SparkSession, sfDir: String): Int = {
    val key = sfDir + "\n" + graft.DevScale.srcSig(s"$sfDir/events.parquet")
    evictStale(eventRows, sfDir, key)(_ => ())
    graft.Tuning.statePartitions(eventRows.computeIfAbsent(key,
      _ => java.lang.Long.valueOf(graft.Tables.events(spark, sfDir).count())))
  }

  /** Fresh temp dir under this JVM's namespace (`<base>/jvm-<pid>/`) —
    * all staged/run/checkpoint dirs allocate through [[graft.StageDirs]]
    * (one liveness/purge idiom for the whole tree: portable
    * ProcessHandle liveness, every directory-listing stream closed). */
  private def jvmTmpDir(prefix: String): java.nio.file.Path =
    graft.StageDirs.fresh(graft.StageDirs.streamRoot, prefix)

  /** Fd-safe recursive delete (see [[graft.StageDirs.rm]]). */
  private def rmTree(p: java.nio.file.Path): Unit = graft.StageDirs.rm(p)

  /** Delete a finished replay's checkpoint — closing the native state
    * stores FIRST when the session ran it on the RocksDB provider.
    * Loaded providers SURVIVE query stop (they unload on reclaim or
    * maintenance timeout, not on stop), so RocksDB instances — with
    * live background compaction threads — linger after awaitTermination
    * returns. Those native threads SIGSEGV the whole JVM when they log
    * through the JNI callback while the VM is at the shutdown safepoint
    * (`LoggerJniCallback::Logv` + "could not attach current thread" —
    * hit twice, reproducibly, in the r19 40M-event provider A/B; the
    * second hs_err pinned it: `BackgroundCompaction` → `Logv`, "VM
    * state: at safepoint (shutting down)"). `StateStore.unloadAll()`
    * closes every loaded provider deterministically (RocksDB close
    * cancels its background work), after which deleting the checkpoint
    * races nothing; providers for later queries reload lazily from
    * their own checkpoints, so unloading a FINISHED replay's stores is
    * free. The HDFS-backed path keeps its historical behavior — its
    * provider tolerates post-stop checkpoint deletion (the triaged-r15
    * benign FileNotFound WARN) and holds no native threads.
    *
    * `unloadAll` is SESSION-GLOBAL (it closes providers of every loaded
    * query, not just the finished replay) — sound here because the
    * harness runs streaming queries sequentially per session, so at
    * cleanup time the finished replay's stores are the only loaded
    * ones. If two streaming queries ever ran concurrently in one
    * session, the live query's providers would be unloaded mid-flight
    * (a reload-from-checkpoint stall, or a state rebuild race on
    * RocksDB); scope the unload to provider ids rooted at `p` before
    * allowing that. The reflective lookup itself is pinned by a
    * Round20OpsSpec unit test so a Spark rename fails at a named test,
    * not inside a query teardown. */
  private def cleanupCkpt(spark: SparkSession, p: java.nio.file.Path): Unit = {
    if (spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        .exists(_.contains("RocksDB"))) {
      // private[sql] at compile time, public in bytecode (Scala access
      // modifiers don't survive erasure) — reflection is the supported
      // way to reach it from outside the spark.sql package tree
      val ss = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      ss.getMethod("unloadAll").invoke(ss.getField("MODULE$").get(null))
    }
    rmTree(p)
  }

  /** The CDC-log surrogate every streaming query replays: the events
    * table staged as two parquet files split at the time midpoint,
    * oldest written first, so file-mtime replay order = event-time order
    * (the ordering a Kafka partition / CDC log gives a consumer — the
    * property that makes watermark eviction provably safe; see
    * streamStateful/streamJoin). Staged once per (session, sfDir) and
    * shared by every streaming query: the staging write is harness
    * scaffolding standing in for the durable log, not operator work. */
  private[graft] def stagedEventLog(spark: SparkSession, sfDir: String): String = {
    // keyed on the part-file signature like the stateParts count memo
    // (and every replica .src-stamp): a source regenerated in place
    // within one JVM re-stages instead of replaying the stale log —
    // and the superseded staged copy (a full parquet copy of the log)
    // is deleted eagerly rather than leaked until JVM exit
    val key = sfDir + "\n" + graft.DevScale.srcSig(s"$sfDir/events.parquet")
    evictStale(stagedDirs, sfDir, key)(dir => rmTree(Paths.get(dir)))
    evictStale(stagedMaxUs, sfDir, key)(_ => ())
    stagedDirs.computeIfAbsent(key, { _ =>
      import spark.implicits._
      // Staged/run dirs are namespaced per JVM (jvm-<pid>) and allocated
      // through StageDirs.fresh, whose dead-owner purge is the ONE
      // liveness idiom in the tree (portable ProcessHandle — a /proc
      // probe would call every pid dead on macOS and yank a concurrent
      // JVM's staged log from under its active streaming queries).
      val inDir = jvmTmpDir("staged").toString
      val batch = graft.Tables.events(spark, sfDir)
        .select(StagedCols.map(col): _*)
      val mm = batch.agg(unix_micros(min($"ts")), unix_micros(max($"ts"))).first()
      val midUs = (mm.getLong(0) + mm.getLong(1)) / 2
      stagedMaxUs.put(key, java.lang.Long.valueOf(mm.getLong(1)))
      def parquets() = {
        val s = Files.list(Paths.get(inDir))
        try s.filter(p => p.toString.endsWith(".parquet"))
          .toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path]).toSet
        finally s.close()
      }
      batch.filter(unix_micros($"ts") <= midUs)
        .coalesce(1).write.mode("overwrite").parquet(inDir)
      val firstHalf = parquets()
      batch.filter(unix_micros($"ts") > midUs)
        .coalesce(1).write.mode("append").parquet(inDir)
      // pin replay order explicitly: mtime resolution could otherwise tie
      val t0 = System.currentTimeMillis()
      firstHalf.foreach(p => Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(t0)))
      (parquets() -- firstHalf).foreach(p => Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(t0 + 1000)))
      inDir
    })
  }

  /** Max event time (µs) of the log — the staging aggregate's scalar,
    * via [[stagedMaxUs]]; falls back to a one-row aggregate only if the
    * memo is cold under the live signature key. */
  private def maxEventUs(spark: SparkSession, sfDir: String): Long = {
    import spark.implicits._
    stagedEventLog(spark, sfDir) // populates the memo on first staging
    val key = sfDir + "\n" + graft.DevScale.srcSig(s"$sfDir/events.parquet")
    stagedMaxUs.computeIfAbsent(key, _ =>
      java.lang.Long.valueOf(graft.Tables.events(spark, sfDir)
        .agg(unix_micros(max($"ts"))).first().getLong(0))).longValue()
  }

  /** `cdc_stream_windowed`: event-time tumbling windows computed by a
    * *streaming* query (watermark + window aggregate, complete mode so the
    * bounded final state is the full answer) — the streaming twin of the
    * batch `cdc_stream_tumbling`, sharing its oracle SQL: the gate checks
    * streaming/batch equivalence through DuckDB. */
  def streamWindowed(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val runDir = jvmTmpDir("runw")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"ts", $"event_type", $"value").schema

    val agg = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 6))).as("sum_dec"))

    val q = agg.writeStream
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir))

    spark.read.parquet(outDir)
      .select(
        unix_millis($"w.start").as("bucket_ms"),
        $"event_type", $"n_events",
        round($"sum_dec".cast("double"), 4).as("sum_value"))
      .orderBy($"bucket_ms", $"event_type")
  } }

  /** `cdc_stream_sliding`: event-time SLIDING windows (1 hour every
    * 15 minutes) computed by a streaming query — completes the
    * window-type × mode matrix (tumbling: `cdc_stream_windowed`;
    * session: `cdc_stream_sessionize`; sliding: here). Each event lands
    * in 4 overlapping windows, so state is 4 window-rows per
    * (window, type) group — still bounded by the window/type
    * cardinality, evicted by the watermark in a live deployment;
    * complete mode makes the bounded final state the full answer, which
    * is why the query shares the batch `window_sliding_time` oracle
    * (the gate checks streaming/batch sliding-window equivalence
    * through DuckDB). */
  def streamSliding(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    val runDir = jvmTmpDir("runsl")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"ts", $"event_type", $"event_id").schema

    val agg = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        min($"event_id").as("min_event_id"),
        max($"event_id").as("max_event_id"))

    val q = agg.writeStream
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir))

    spark.read.parquet(outDir)
      .select(unix_micros($"w.start").as("win_start_us"), $"event_type",
        $"n_events", $"min_event_id", $"max_event_id")
      .orderBy($"win_start_us", $"event_type")
  } }

  /** `cdc_stream_sessionize`: streaming session windows — 30-minute-gap
    * sessions per user computed incrementally, emitted in APPEND mode,
    * i.e. only once the watermark proves a session can no longer grow
    * (watermark past session end + gap). Oracle via the finalized-horizon
    * restriction (same trick as `cdc_stream_join_outer`): the output is
    * pinned to sessions whose window end is STRICTLY below the final
    * watermark H = max(ts) − 1 h — Round2OpsSpec proves Spark emits every
    * such session (completeness bound) and that each equals its batch
    * twin, so `emitted ∩ {end < H}` IS the deterministic set
    * `{batch sessions : end < H}`, which plain SQL can reproduce
    * (lag/cumsum islands + the same horizon filter). Sessions at/after
    * the horizon stay in state awaiting more data and are excluded on
    * both sides. State: one (user, open-session) accumulator, merged on
    * gap-overlap, evicted at emission. */
  def streamSessionize(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val runDir = jvmTmpDir("runs")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"ts", $"user_id", $"value").schema

    val agg = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 6))).as("sum_dec"))

    val q = agg.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir))

    // finalized horizon (1-row scalar gate, same pattern as the staged
    // log's watermark scalar): the final no-data batch advances the
    // watermark to max(ts) − 1 h; sessions strictly below it are the
    // deterministic, oracle-checkable output set. The max-ts scalar is
    // the staging aggregate's, memoized (maxEventUs) — not a fresh
    // batch job per invocation.
    val horizonUs = maxEventUs(spark, sfDir) - 3600L * 1000000L

    spark.read.parquet(outDir)
      .filter(unix_micros($"sw.end") < horizonUs)
      .select($"user_id",
        unix_micros($"sw.start").as("session_start_us"),
        $"n_events",
        round($"sum_dec".cast("double"), 4).as("sum_value"))
      .orderBy($"user_id", $"session_start_us")
  }

  /** `cdc_stream_dedup`: streaming exactly-once dedup — the at-least-once
    * delivery repair every CDC consumer needs (the reference worker's
    * offset tracking is at-least-once: connect-standalone.properties:4-5,
    * re-delivery on crash replays events). The staged input is the event
    * log TWICE (the replayed copies carry later mtimes, so with
    * maxFilesPerTrigger = half-count the whole replay arrives in a later
    * micro-batch than every original);
    * `dropDuplicatesWithinWatermark` on the record key keeps state only
    * within the watermark horizon — bounded state at 100 TB, unlike plain
    * dropDuplicates whose key state grows forever. A replayed record is
    * either deduped against state (inside the horizon) or dropped as
    * late (behind it) — both paths erase the duplicate, which is why the
    * result can share the exact batch oracle (per-type counts of the
    * single-copy log). */
  def streamDedup(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    val runDir = jvmTmpDir("rund")
    val inDir   = s"$runDir/in"
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    // the at-least-once re-delivery: the staged log's files, then the
    // same files AGAIN — plain filesystem copies with stepped mtimes, so
    // the file source replays original halves first, then the duplicates
    val staged = Files.list(Paths.get(stagedEventLog(spark, sfDir)))
      .filter(p => p.toString.endsWith(".parquet"))
      .sorted(java.util.Comparator.comparingLong((p: java.nio.file.Path) =>
        Files.getLastModifiedTime(p).toMillis))
      .toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
    Files.createDirectories(Paths.get(inDir))
    (staged ++ staged).zipWithIndex.foreach { case (src, i) =>
      val dst = Paths.get(inDir, f"f$i%02d.parquet")
      Files.copy(src, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + i))
    }
    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"event_type").schema

    val deduped = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", staged.size.toString)
      .parquet(inDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

    val q = deduped.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    rmTree(Paths.get(inDir)); cleanupCkpt(spark, Paths.get(ckptDir))

    spark.read.parquet(outDir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  } }

  /** `cdc_stream_join`: watermarked stream-stream interval join — each
    * purchase joined to the same user's clicks from the preceding hour,
    * both sides live streams. The time-bound join condition plus the
    * two watermarks is what lets Spark evict join state (a click older
    * than purchase-watermark − 1 h can never match a future purchase),
    * so state stays bounded at 100 TB. The staged replay is event-time-
    * ordered (same files as streamStateful's contract): eviction then
    * provably never races a pending match — every batch-2 purchase
    * needs clicks newer than (watermark − 1 h), which are still in
    * state — so the streaming result shares an exact batch oracle. */
  def streamJoin(spark: SparkSession, sfDir: String): DataFrame = withJoinStateV3(spark) { withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    val runDir = jvmTmpDir("runj")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type").schema

    def src() = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val purchases = src().filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"), $"user_id".as("p_user"))
      .withWatermark("p_ts", "1 hour")
    val clicks = src().filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"ts".as("c_ts"), $"user_id".as("c_user"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"))
      .select($"p_id".as("purchase_event_id"), $"c_id".as("click_event_id"))

    val q = joined.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir)) // the staged log is shared; keep it

    spark.read.parquet(outDir)
      .orderBy($"purchase_event_id", $"click_event_id")
  } } }

  /** `cdc_stream_join_outer`: watermarked stream-stream LEFT OUTER
    * interval join — streamJoin's shape, but purchases with no click in
    * the preceding hour survive with a null click id. The null rows are
    * what makes outer streaming hard: one can only be emitted once the
    * watermark proves no future click can still match (c_ts ≤ p_ts, and
    * future clicks have c_ts ≥ watermark ⇒ finalized when watermark
    * passes p_ts), so the engine emits them on state eviction — which is
    * why this query must KEEP the trailing no-data micro-batch (the
    * final watermark advance happens after the last data batch; compare
    * withoutNoDataBatch's contract).
    *
    * Oracle: the finalized-horizon trick. At end of replay the global
    * watermark is min(max purchase ts, max click ts) − 1 h (two
    * watermarked inputs combine with the default "min" policy), so the
    * streaming output is exactly the batch left-outer join with null
    * rows RESTRICTED to purchases below that horizon — a closed-form
    * DuckDB twin, no streaming machinery needed on the oracle side. */
  def streamJoinOuter(spark: SparkSession, sfDir: String): DataFrame = withJoinStateV3(spark) { withStatePartitions(spark, stateParts(spark, sfDir)) {
    import spark.implicits._
    val runDir = jvmTmpDir("runjo")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type").schema

    def src() = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val purchases = src().filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"), $"user_id".as("p_user"))
      .withWatermark("p_ts", "1 hour")
    val clicks = src().filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"ts".as("c_ts"), $"user_id".as("c_user"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"),
      "left_outer")
      .select($"p_id".as("purchase_event_id"), $"c_id".as("click_event_id"))

    val q = joined.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir)) // the staged log is shared; keep it

    spark.read.parquet(outDir)
      .orderBy($"purchase_event_id", $"click_event_id")
  } }

  /** `cdc_stream_join_full`: watermarked stream-stream FULL OUTER
    * interval join — both unmatched sides survive with nulls, each
    * finalized by its OWN watermark horizon: a purchase with no click
    * is emittable once the watermark passes `p_ts` (future clicks have
    * `c_ts ≥ wm > p_ts`, outside the window — same rule as the left
    * outer), while a click with no purchase must wait until the
    * watermark passes `c_ts + 1 h` (its matches lie in its FUTURE:
    * `p_ts ∈ [c_ts, c_ts+1h]`). The asymmetry is the point — the same
    * interval condition finalizes at different horizons per side, and
    * the closed-form oracle states both predicates below the
    * end-of-replay watermark. Trailing no-data batch KEPT (null
    * emissions happen on state eviction). */
  def streamJoinFull(spark: SparkSession, sfDir: String): DataFrame = withJoinStateV3(spark) { withStatePartitions(spark, stateParts(spark, sfDir)) {
    import spark.implicits._
    val runDir = jvmTmpDir("runjf")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type").schema

    def src() = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val purchases = src().filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"), $"user_id".as("p_user"))
      .withWatermark("p_ts", "1 hour")
    val clicks = src().filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"ts".as("c_ts"), $"user_id".as("c_user"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"),
      "full_outer")
      .select($"p_id".as("purchase_event_id"), $"c_id".as("click_event_id"))

    val q = joined.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir)) // the staged log is shared; keep it

    spark.read.parquet(outDir)
      .orderBy($"purchase_event_id".asc_nulls_first, $"click_event_id".asc_nulls_first)
  } }

  /** `cdc_stream_join_semi`: watermarked stream-stream LEFT SEMI
    * interval join — completing the stream-stream join-type matrix
    * (inner / left outer / left semi): purchases that had AT LEAST one
    * click in the preceding hour, each emitted at most ONCE with no
    * click payload — the streaming existence filter (did-engage
    * gating) whose batch twin is `join_semi`. Semi is the cheap one of
    * the three: the left row needs no null-finalization wait (compare
    * streamJoinOuter) and no per-match fan-out; it emits on first
    * match and is marked, so state carries matched-bits instead of
    * match multiplicity. Because every candidate click lies in the
    * purchase's PAST (c_ts ≤ p_ts) and the staged replay is
    * event-time-ordered, a purchase's matches are already in state
    * when it arrives — emissions all happen on data batches and the
    * output is EXACTLY the batch semi join, no horizon restriction
    * (compare the outer join's finalized-horizon oracle). */
  def streamJoinSemi(spark: SparkSession, sfDir: String): DataFrame = withJoinStateV3(spark) { withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    val runDir = jvmTmpDir("runjs")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type").schema

    def src() = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val purchases = src().filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"), $"user_id".as("p_user"))
      .withWatermark("p_ts", "1 hour")
    val clicks = src().filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"ts".as("c_ts"), $"user_id".as("c_user"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"),
      "left_semi")
      .select($"p_id".as("purchase_event_id"), $"p_user".as("user_id"),
        unix_micros($"p_ts").as("p_ts_us"))

    val q = joined.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir)) // the staged log is shared; keep it

    spark.read.parquet(outDir)
      .orderBy($"purchase_event_id")
  } } }

  /** `cdc_stream_static_join`: stream-static enrichment join — the
    * streaming side (the replayed CDC log) joined per micro-batch
    * against a STATIC dimension computed once in batch (each user's
    * first-seen event time). Stream-static inner joins are STATELESS in
    * Structured Streaming — the static side is just re-planned into
    * every micro-batch, no watermark, no join state — which is what
    * makes them the scale-safe way to enrich a CDC stream with dimension
    * data (vs. a stream-stream join that must hold state). Because the
    * join is stateless and append-only, the result is EXACTLY the batch
    * join: the DuckDB oracle recomputes it directly. */
  def streamStaticJoin(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    val runDir = jvmTmpDir("runsj")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema

    // the static dimension: per-user first activity, computed in batch
    val firstSeen = graft.Tables.events(spark, sfDir)
      .groupBy($"user_id".as("d_user"))
      .agg(unix_micros(min($"ts")).as("first_us"))

    val enriched = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .join(broadcast(firstSeen), $"user_id" === $"d_user")
      .select($"event_id", $"user_id", $"first_us",
        (unix_micros($"ts") - $"first_us").as("since_first_us"))

    val q = enriched.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir))

    spark.read.parquet(outDir)
      .orderBy($"event_id")
  } }

  /** Keep the max-(ts_us, event_id) record per key; emit the new latest on
    * every update (OutputMode.Update). */
  private[graft] def updateKey(userId: Long, it: Iterator[Ev],
      state: GroupState[LatestRow]): Iterator[LatestRow] = {
    var best = state.getOption.orNull
    var changed = false
    it.foreach { e =>
      val us = tsMicros(e.ts)
      if (best == null || us > best.last_ts_us ||
          (us == best.last_ts_us && e.event_id > best.last_event_id)) {
        best = LatestRow(userId, e.event_id, e.event_type, e.value, us)
        changed = true
      }
    }
    if (changed) { state.update(best); Iterator.single(best) } else Iterator.empty
  }

  /** `cdc_stream_stateful`: run the streaming query to completion over the
    * events parquet (Trigger.AvailableNow) and return the final keyed
    * state. Shares the batch `cdc_latest_state` DuckDB oracle — sound
    * because the staged replay below is event-time-ordered, so the
    * watermark can never drop a key's winning event (the SIGMOD'18
    * batch/streaming-equivalence argument, PAPERS.md; StreamingSpec
    * additionally asserts the equivalence in-process at smoke scale). */
  /** `cdc_stream_stateful_rocksdb`: [[streamStateful]] with the state
    * store swapped to RocksDB — the provider a 100 TB deployment runs,
    * because keyed CDC state grows with key cardinality and an on-heap
    * HDFS-backed store OOMs long before the disk does. Identical query,
    * identical result (it shares the batch latest-state oracle), so the
    * gate proves the state-store choice is a pure capacity knob, not a
    * semantics change. */
  def streamStatefulRocksDb(spark: SparkSession, sfDir: String): DataFrame =
    withRocksDb(spark)(streamStateful(spark, sfDir))

  /** `cdc_stream_update_counts`: UPDATE-mode streaming aggregation —
    * the one output mode the suite didn't yet exercise (complete:
    * streamWindowed; append: sessionize/dedup/joins; update so far only
    * via flatMapGroupsWithState). A windowless per-type count re-emits
    * each CHANGED group per micro-batch; the sink keeps every emission
    * and the final row per group is the total — which is why this query
    * shares exact batch-count semantics: the last update for a group
    * equals the full-log aggregate. At 100 TB this is the live-dashboard
    * shape: bounded state (one row per group), bounded emission
    * (changed groups only), no watermark needed. */
  def streamUpdateCounts(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    val runDir = jvmTmpDir("runuc")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema

    val counts = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,6)")).as("sum_value_dec"))

    val q = counts.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        b.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir))

    // final emission per group = the total over the whole log
    val w = Window.partitionBy($"event_type").orderBy($"batch_id".desc)
    spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"event_type", $"n_events",
        round($"sum_value_dec".cast("double"), 4).as("sum_value"))
      .orderBy($"event_type")
  } }

  case class TtlRow(user_id: Long, last_event_id: Long, last_event_type: String,
      last_value: Double, last_ts_us: Long, expired: Boolean)

  /** State body for [[streamStateTtl]]: latest-wins plus an EVENT-TIME
    * TTL — every update re-arms a timeout at last_ts + 2 h; when the
    * watermark passes it the state is EVICTED and its final value
    * emitted flagged `expired`. The eviction branch (hasTimedOut) is
    * the one GroupState feature no other query exercises. */
  private[graft] def ttlKey(userId: Long, it: Iterator[Ev],
      state: GroupState[LatestRow]): Iterator[TtlRow] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(TtlRow(s.user_id, s.last_event_id, s.last_event_type,
        s.last_value, s.last_ts_us, expired = true))
    } else {
      var best = state.getOption.orNull
      var changed = false
      it.foreach { e =>
        val us = tsMicros(e.ts)
        if (best == null || us > best.last_ts_us ||
            (us == best.last_ts_us && e.event_id > best.last_event_id)) {
          best = LatestRow(userId, e.event_id, e.event_type, e.value, us)
          changed = true
        }
      }
      if (changed) {
        state.update(best)
        // re-arm: expire 2h of EVENT time after the latest event (ms API)
        state.setTimeoutTimestamp(best.last_ts_us / 1000L + 2L * 3600 * 1000)
        Iterator.single(TtlRow(best.user_id, best.last_event_id,
          best.last_event_type, best.last_value, best.last_ts_us, expired = false))
      } else Iterator.empty
    }
  }

  /** `cdc_stream_state_ttl`: latest-wins with EVENT-TIME state TTL —
    * the bounded-state discipline a 100 TB CDC consumer actually needs:
    * unbounded key cardinality means state must EVICT, and event-time
    * timeouts (armed at last activity + 2 h, fired by watermark
    * advance) are Spark's mechanism for it. A key idle past the TTL is
    * evicted mid-replay and, if it reappears, re-created fresh —
    * session-style lifecycle. Emissions: every new latest (update
    * mode, expired=false) plus one flagged row per eviction carrying
    * the evicted state; the trailing no-data micro-batch (which this
    * query therefore KEEPS, unlike the withoutNoDataBatch family)
    * advances the final watermark to max(ts) − 1 h and fires the
    * remaining timeouts.
    *
    * Closed-form oracle (the finalized-horizon trick): with the
    * event-time-ordered replay, the final per-key reduce (max
    * (ts, event_id), eviction rows winning ties) is exactly the batch
    * latest state, and a key ends expired iff the final watermark
    * strictly passed its last activity + TTL:
    * `max_ts − 1 h > last_ts + 2 h` — plain SQL, no streaming
    * machinery. 111 of the 150 fixture users expire; 39 stay live, so
    * both lifecycle branches are oracle-covered. */
  def streamStateTtl(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) {
    import spark.implicits._
    val runDir  = jvmTmpDir("runttl")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema

    val updates = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .withWatermark("ts", "1 hour")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(ttlKey)

    val q = updates.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[TtlRow], _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir))

    // final record per key: max (ts, event_id); an eviction row shares
    // its state's (ts, id), so `expired DESC` breaks the tie in its
    // favor — the eviction is the later lifecycle event
    val w = Window.partitionBy($"user_id")
      .orderBy($"last_ts_us".desc, $"last_event_id".desc, $"expired".desc)
    spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"last_event_id", $"last_event_type",
        round($"last_value", 4).as("last_value"), $"last_ts_us", $"expired")
      .orderBy($"user_id")
  }

  /** Latest-wins as a Spark 4 state-API-v2 [[StatefulProcessor]]: one
    * typed ValueState per key, same (ts_us, event_id) winner rule as
    * [[updateKey]], new latest emitted on change (update-mode shape). */
  private[graft] class LatestWinsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, LatestRow] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var latest: ValueState[LatestRow] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[LatestRow]("latest",
        org.apache.spark.sql.Encoders.product[LatestRow], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[LatestRow] = {
      var best = if (latest.exists()) latest.get() else null
      var changed = false
      rows.foreach { e =>
        val us = tsMicros(e.ts)
        if (best == null || us > best.last_ts_us ||
            (us == best.last_ts_us && e.event_id > best.last_event_id)) {
          best = LatestRow(key, e.event_id, e.event_type, e.value, us)
          changed = true
        }
      }
      if (changed) { latest.update(best); Iterator.single(best) } else Iterator.empty
    }
  }

  /** `cdc_stream_stateful_tws`: [[streamStateful]] re-expressed on the
    * Spark 4 arbitrary-state API v2 (`transformWithState`) — the
    * successor to flatMapGroupsWithState a new 100 TB deployment would
    * write against: typed named state slots (value/list/map per key),
    * TTL-capable, RocksDB-backed by design (the API refuses the on-heap
    * provider, because state API v2 deployments are exactly the ones
    * whose keyed state outgrows the heap). Identical winner rule,
    * identical result: shares the batch `cdc_latest_state` oracle, so
    * the gate proves the state API generation is an implementation
    * detail, not a semantics change. */
  def streamStatefulTws(spark: SparkSession, sfDir: String): DataFrame =
    withRocksDb(spark)(
      withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
        import spark.implicits._
        val runDir = jvmTmpDir("runtws")
        val inDir   = stagedEventLog(spark, sfDir)
        val outDir  = s"$runDir/out"
        val ckptDir = s"$runDir/ckpt"
        val schema = graft.Tables.events(spark, sfDir)
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema

        val updates = spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir)
          .withWatermark("ts", "1 hour")
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Ev]
          .groupByKey(_.user_id)
          .transformWithState(new LatestWinsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Update())

        val q = updates.writeStream
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckptDir)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[LatestRow], _: Long) =>
            batch.write.mode("append").parquet(outDir)
          }
          .start()
        q.awaitTermination()

        cleanupCkpt(spark, Paths.get(ckptDir))

        val w = Window.partitionBy($"user_id")
          .orderBy($"last_ts_us".desc, $"last_event_id".desc)
        spark.read.parquet(outDir)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"last_event_id", $"last_event_type",
            round($"last_value", 4).as("last_value"), $"last_ts_us")
          .orderBy($"user_id")
      } })

  /** [[LatestWinsProcessor]] plus NATIVE event-time eviction on the
    * state-API-v2 timer surface: same winner rule and update-mode
    * emissions, but each update re-arms a per-key EVENT-TIME timer at
    * last activity + 2 h TTL (`registerTimer`, the previous arm deleted
    * first — v2 timers are multi-shot per key, unlike the old API's
    * single timeout slot). When the watermark passes the arm,
    * [[handleExpiredTimer]] emits the evicted state flagged
    * `expired = true` and clears it — the exact lifecycle
    * [[ttlKey]] implements on `GroupStateTimeout.EventTimeTimeout`. */
  private[graft] class LatestWinsTtlProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, TtlRow] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var latest: ValueState[LatestRow] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[LatestRow]("latest",
        org.apache.spark.sql.Encoders.product[LatestRow], TTLConfig.NONE)
    private def armMs(r: LatestRow): Long = r.last_ts_us / 1000L + 2L * 3600 * 1000
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[TtlRow] = {
      val prev = if (latest.exists()) latest.get() else null
      var best = prev
      var changed = false
      rows.foreach { e =>
        val us = tsMicros(e.ts)
        if (best == null || us > best.last_ts_us ||
            (us == best.last_ts_us && e.event_id > best.last_event_id)) {
          best = LatestRow(key, e.event_id, e.event_type, e.value, us)
          changed = true
        }
      }
      if (changed) {
        latest.update(best)
        if (prev != null) getHandle.deleteTimer(armMs(prev))
        getHandle.registerTimer(armMs(best))
        Iterator.single(TtlRow(best.user_id, best.last_event_id,
          best.last_event_type, best.last_value, best.last_ts_us, expired = false))
      } else Iterator.empty
    }
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TtlRow] = {
      val b = if (latest.exists()) latest.get() else null
      latest.clear()
      if (b == null) Iterator.empty
      else Iterator.single(TtlRow(b.user_id, b.last_event_id,
        b.last_event_type, b.last_value, b.last_ts_us, expired = true))
    }
  }

  /** `cdc_stream_tws_ttl`: [[streamStateTtl]] re-expressed on the
    * state-API-v2 timer surface — completing the API matrix:
    * latest-wins ([[streamStateful]] old API / [[streamStatefulTws]]
    * v2) now has its TTL-evicting twin on BOTH generations too. Event
    * time drives everything: `TimeMode.EventTime` timers are armed at
    * last activity + 2 h and fired by watermark advance (the trailing
    * no-data batch is therefore KEPT — it advances the final watermark
    * to max(ts) − 1 h and fires the remaining timers), RocksDB-backed
    * as the v2 API requires. Shares `cdc_stream_state_ttl`'s
    * closed-form finalized-horizon oracle verbatim: a hash match
    * proves timer eviction is semantics-identical across the API
    * generations. */
  def streamTwsTtl(spark: SparkSession, sfDir: String): DataFrame =
    withRocksDb(spark)(
      withStatePartitions(spark, stateParts(spark, sfDir)) {
        import spark.implicits._
        val runDir  = jvmTmpDir("runtwsttl")
        val inDir   = stagedEventLog(spark, sfDir)
        val outDir  = s"$runDir/out"
        val ckptDir = s"$runDir/ckpt"
        val schema = graft.Tables.events(spark, sfDir)
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema

        val updates = spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir)
          .withWatermark("ts", "1 hour")
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Ev]
          .groupByKey(_.user_id)
          .transformWithState(new LatestWinsTtlProcessor,
            org.apache.spark.sql.streaming.TimeMode.EventTime(),
            OutputMode.Update())

        val q = updates.writeStream
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckptDir)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[TtlRow], _: Long) =>
            batch.write.mode("append").parquet(outDir)
          }
          .start()
        q.awaitTermination()

        cleanupCkpt(spark, Paths.get(ckptDir))

        // same final reduce as streamStateTtl: max (ts, event_id) per
        // key, eviction rows winning their tie (the later lifecycle event)
        val w = Window.partitionBy($"user_id")
          .orderBy($"last_ts_us".desc, $"last_event_id".desc, $"expired".desc)
        spark.read.parquet(outDir)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"last_event_id", $"last_event_type",
            round($"last_value", 4).as("last_value"), $"last_ts_us", $"expired")
          .orderBy($"user_id")
      })

  case class TopEntry(event_id: Long, value: Double)
  case class TopkRow(user_id: Long, upd: Long, rank: Int, event_id: Long, value: Double)

  /** Per-key top-3 events by (value, event_id) on state-API-v2
    * [[org.apache.spark.sql.streaming.ListState]] — the bounded-list
    * retention pattern (leaderboards, best-N samples per key) that the
    * old API forced into a single opaque blob: v2 stores the list
    * ELEMENT-WISE in RocksDB, so an append touches one entry, not a
    * reserialized whole. Emissions carry a per-key update version
    * (ValueState counter) so the finite replay's FINAL top-3 is
    * recoverable as the max-version rows per key. */
  private[graft] class TopKListProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, TopkRow] {
    import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var top: ListState[TopEntry] = _
    @transient private var ver: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState[TopEntry]("top3",
        org.apache.spark.sql.Encoders.product[TopEntry], TTLConfig.NONE)
      ver = getHandle.getValueState[Long]("ver",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    private def beats(a: TopEntry, b: TopEntry): Boolean =
      a.value > b.value || (a.value == b.value && a.event_id > b.event_id)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[TopkRow] = {
      val cur = top.get().toList
      var best = cur
      rows.foreach { e =>
        best = (TopEntry(e.event_id, e.value) :: best).sortWith(beats).take(3)
      }
      if (best != cur) {
        top.put(best.toArray)
        val v = (if (ver.exists()) ver.get() else 0L) + 1L
        ver.update(v)
        best.iterator.zipWithIndex.map { case (t, i) =>
          TopkRow(key, v, i + 1, t.event_id, t.value)
        }
      } else Iterator.empty
    }
  }

  /** `cdc_stream_tws_topk`: bounded per-key retention on v2 ListState —
    * each user's top-3 events by value maintained incrementally across
    * the replay (constant state per key: 3 entries + a version counter,
    * the 100 TB-safe alternative to buffering every event). The final
    * reduce keeps each key's max-version emission — the last time its
    * top-3 changed, which IS the final top-3. Oracle: the batch window
    * top-3 over the same log; a hash match proves incremental list
    * maintenance equals the global rank. */
  def streamTwsTopk(spark: SparkSession, sfDir: String): DataFrame =
    withRocksDb(spark)(
      withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
        import spark.implicits._
        val runDir  = jvmTmpDir("runtwstopk")
        val inDir   = stagedEventLog(spark, sfDir)
        val outDir  = s"$runDir/out"
        val ckptDir = s"$runDir/ckpt"
        val schema = graft.Tables.events(spark, sfDir)
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema

        val updates = spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir)
          .withWatermark("ts", "1 hour")
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Ev]
          .groupByKey(_.user_id)
          .transformWithState(new TopKListProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Update())

        val q = updates.writeStream
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckptDir)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[TopkRow], _: Long) =>
            batch.write.mode("append").parquet(outDir)
          }
          .start()
        q.awaitTermination()

        cleanupCkpt(spark, Paths.get(ckptDir))

        spark.read.parquet(outDir)
          .withColumn("mx", max($"upd").over(Window.partitionBy($"user_id")))
          .filter($"upd" === $"mx")
          .select($"user_id", $"rank", $"event_id",
            round($"value", 4).as("value"))
          .orderBy($"user_id", $"rank")
      } })

  case class TypeCountRow(user_id: Long, event_type: String, n_events: Long)

  /** Per-(key, event_type) counts on state-API-v2
    * [[org.apache.spark.sql.streaming.MapState]] — the keyed sub-map
    * pattern (per-entity feature counters) that the old API also forced
    * into one blob: v2 reads/writes single map ENTRIES in RocksDB, so a
    * batch touching one event_type leaves the others unread. Counts are
    * monotone, so the finite replay's final value per (key, type) is
    * simply the MAX emitted — no version state needed. */
  private[graft] class TypeCountsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, TypeCountRow] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode, TimerValues}
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[TypeCountRow] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val n = (if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L) + 1L
        counts.updateValue(e.event_type, n)
        touched += e.event_type
      }
      touched.iterator.map(t => TypeCountRow(key, t, counts.getValue(t)))
    }
  }

  /** `cdc_stream_tws_counts`: keyed sub-map aggregation on v2 MapState —
    * per-user event-type counters maintained entry-wise across the
    * replay; only the types a batch touches are emitted. With counts
    * monotone per (user, type), max-of-emissions is the final counter.
    * Oracle: the batch two-column GROUP BY; a hash match proves the
    * entry-wise map maintenance equals the global aggregate. Completes
    * the state-API-v2 slot matrix: ValueState (latest/TTL), timers
    * (eviction), ListState (top-k), MapState (keyed counters). */
  def streamTwsCounts(spark: SparkSession, sfDir: String): DataFrame =
    withRocksDb(spark)(
      withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
        import spark.implicits._
        val runDir  = jvmTmpDir("runtwscnt")
        val inDir   = stagedEventLog(spark, sfDir)
        val outDir  = s"$runDir/out"
        val ckptDir = s"$runDir/ckpt"
        val schema = graft.Tables.events(spark, sfDir)
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema

        val updates = spark.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir)
          .withWatermark("ts", "1 hour")
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Ev]
          .groupByKey(_.user_id)
          .transformWithState(new TypeCountsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Update())

        val q = updates.writeStream
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckptDir)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[TypeCountRow], _: Long) =>
            batch.write.mode("append").parquet(outDir)
          }
          .start()
        q.awaitTermination()

        cleanupCkpt(spark, Paths.get(ckptDir))

        spark.read.parquet(outDir)
          .groupBy($"user_id", $"event_type")
          .agg(max($"n_events").as("n_events"))
          .orderBy($"user_id", $"event_type")
      } })

  def streamStateful(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    val inDir = stagedEventLog(spark, sfDir)

    // The staged log replays in event-time order, split so
    // maxFilesPerTrigger=1 exercises incremental multi-batch state
    // updates — the ordering contract a CDC log/Kafka topic gives the
    // connector (reference: offset-ordered partition 0,
    // rpk_topic_consume.json). That makes the watermark safe to honor
    // strictly, which is what lets the streaming result share the batch
    // latest-state oracle.
    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema

    val source = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    latestWinsOver(spark, source)
  } }

  /** The latest-wins pipeline body, source-agnostic: `source` is any
    * STREAMING DataFrame carrying the event columns — the staged file
    * log above (the gate/bench path) or a real Kafka topic
    * ([[KafkaWire.latestState]]). Everything downstream of the source —
    * watermark, keyed flatMapGroupsWithState, foreachBatch append sink,
    * checkpoint lifecycle, final per-key reduce — is THIS one method, so
    * the two paths cannot drift. */
  private[cdc] def latestWinsOver(spark: SparkSession, source: DataFrame): DataFrame = {
    import spark.implicits._
    val runDir  = jvmTmpDir("run")
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"

    val updates = source
      .withWatermark("ts", "1 hour")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateKey)

    val q = updates.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[LatestRow], _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    // the returned DataFrame reads only outDir; drop the checkpoint so
    // repeated runs don't accumulate temp state (the staged log is shared)
    cleanupCkpt(spark, Paths.get(ckptDir))

    // Multiple micro-batches append successive per-key snapshots; reduce to
    // the final one per key (same (ts_us, event_id) order as the state fn).
    val w = Window.partitionBy($"user_id").orderBy($"last_ts_us".desc, $"last_event_id".desc)
    spark.read.parquet(outDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"last_event_id", $"last_event_type",
        round($"last_value", 4).as("last_value"), $"last_ts_us")
      .orderBy($"user_id")
  }

  /** `cdc_stream_foreachbatch`: the CDC → lakehouse MERGE sink — the
    * deployment shape the reference pipeline feeds (topic consumer
    * maintaining a queryable table): each micro-batch of the replayed
    * change log is MERGEd into a versioned parquet snapshot inside
    * `foreachBatch` — delta reduced to per-key latest (one max-struct
    * agg, map-side combined), unioned with the current snapshot,
    * latest-wins re-resolved, keys whose winner is a delete dropped.
    * Per-batch cost is ∝ snapshot + delta (the [[Changelog.mergeUpsert]]
    * incremental-apply invariant, here iterated across real streaming
    * batches with a checkpoint); at 100 TB the union+window step is what
    * a Delta/Iceberg MERGE INTO plans, with file pruning replacing the
    * full snapshot rewrite. Dropping deleted keys from the snapshot is
    * sound because the staged log replays in event-time order (see
    * [[stagedEventLog]]): no later batch can carry an older event that
    * would wrongly resurrect a deleted key. The final snapshot equals
    * the batch full-log rebuild, so the query shares
    * `cdc_latest_state_del`'s oracle SQL — the gate proves N-batch
    * incremental MERGE ≡ one-shot materialization through DuckDB. */
  def streamForeachBatchMerge(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    val inDir   = stagedEventLog(spark, sfDir)
    val runDir  = jvmTmpDir("fbm")
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema

    // driver-side pointer to the current snapshot version; foreachBatch
    // bodies run sequentially on the driver, so a plain var is safe
    var snapDir: Option[String] = None

    val source = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val q = source.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rec = struct(unix_micros(col("ts")).as("last_ts_us"),
          col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          col("value").as("last_value"))
        val delta = batch.groupBy(col("user_id")).agg(max(rec).as("rec"))
          .select(col("user_id"), col("rec.last_ts_us").as("last_ts_us"),
            col("rec.last_event_id").as("last_event_id"),
            col("rec.last_event_type").as("last_event_type"),
            col("rec.last_value").as("last_value"))
        val merged = snapDir match {
          case None => delta
          case Some(cur) =>
            val w = Window.partitionBy(col("user_id"))
              .orderBy(col("last_ts_us").desc, col("last_event_id").desc)
            spark.read.parquet(cur).unionByName(delta)
              .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
              .drop("rn")
        }
        val next = s"$runDir/snap-$id"
        merged.filter(Changelog.opCol(col("last_event_type")) =!= "d")
          .write.mode("overwrite").parquet(next)
        snapDir = Some(next)
      }
      .start()
    q.awaitTermination()

    val out = spark.read.parquet(snapDir.getOrElse(
      sys.error("foreachBatch merge produced no snapshot")))
      .select($"user_id", $"last_event_id", $"last_event_type",
        round($"last_value", 4).as("last_value"))
      .orderBy($"user_id")
      // materialize before deleting the snapshot dirs the plan reads
      .localCheckpoint(true)
    cleanupCkpt(spark, runDir)
    out
  } }

  /** `cdc_state_reader`: the state-store BATCH READER (Spark 4.x
    * `spark.read.format("statestore")`) — operational state
    * introspection. A streaming aggregation (per-user event count +
    * decimal-exact value sum) populates a checkpoint over the staged
    * event log; the checkpoint's state store is then read back as a
    * batch DataFrame — key struct → user_id, value struct → the
    * running aggregate. The gate's oracle recomputes the aggregate
    * from the raw events, so a hash match proves the PERSISTED state
    * is exactly the aggregate — the invariant an operator debugging a
    * production streaming job relies on when querying its checkpoint
    * in place. The read plans one task per state partition, so
    * inspecting a 1000-partition production store scales like any
    * columnar scan; no stream restart, no state export job.
    * (Reference analogue: inspecting the connector's committed offsets
    * + table state out-of-band, `connect-standalone.properties:5`.) */
  def streamStateReader(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    val runDir  = jvmTmpDir("ssr")
    val inDir   = stagedEventLog(spark, sfDir)
    val ckptDir = s"$runDir/ckpt"

    val schema = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").schema
    val agg = spark.readStream.schema(schema).parquet(inDir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,6)")).as("sum_value"))
    val q = agg.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .format("noop")
      .start()
    q.awaitTermination()

    val out = spark.read.format("statestore").load(ckptDir)
      .select($"key.user_id".as("user_id"),
        $"value.count".as("n_events"),
        round($"value.sum".cast("double"), 4).as("sum_value"))
      .orderBy($"user_id")
      // materialize BEFORE deleting the checkpoint the reader scans
      .localCheckpoint(true)

    cleanupCkpt(spark, runDir)
    out
  } }

  /** `cdc_stream_union`: UNION of two live streams feeding ONE stateful
    * aggregate — the fan-in topology (many CDC topics → one consumer)
    * the reference's single-topic tutorial is the degenerate case of.
    * Two independent file sources replay the same staged log with
    * different predicates/projections (purchases keep their value,
    * clicks ride a zero — the schema-alignment step any real fan-in
    * needs), `unionByName` merges them BEFORE the watermark, so one
    * watermark/state pipeline serves both sources; complete-mode hourly
    * aggregate = the full answer. Scale: the union is a no-shuffle
    * narrow op — each source's partitions feed the shared hash
    * aggregate directly; state stays bounded by (window × type). */
  def streamUnion(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) { withoutNoDataBatch(spark) {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val runDir  = jvmTmpDir("runu")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"ts", $"event_type", $"value").schema

    def src() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val purchases = src().filter($"event_type" === "purchase")
      .select($"ts", $"event_type", $"value")
    val clicks = src().filter($"event_type" === "click")
      .select($"ts", $"event_type", lit(0.0).as("value"))

    val agg = purchases.unionByName(clicks)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 6))).as("sum_dec"))

    val q = agg.writeStream
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir))

    spark.read.parquet(outDir)
      .select(
        unix_millis($"w.start").as("bucket_ms"),
        $"event_type", $"n_events",
        round($"sum_dec".cast("double"), 4).as("sum_value"))
      .orderBy($"bucket_ms", $"event_type")
  } }

  /** `cdc_stream_windowed_append`: the tumbling aggregate in APPEND
    * mode — each window row is emitted exactly ONCE, when the watermark
    * finalizes it, and never revised. Complete mode
    * (`cdc_stream_windowed`) re-emits the whole result every batch —
    * fine for a small dashboard sink; append is the mode a downstream
    * TABLE needs (immutable window rows, incremental consumption), and
    * its state is evicted at emission instead of held forever, which is
    * what bounds state at 100 TB. The no-data micro-batch is REQUIRED
    * here (unlike the complete-mode queries): emission happens on
    * watermark advance, so the final watermark-only batch is what
    * flushes the last closed windows. Output pinned to the finalized
    * horizon H = max(ts) − 1 h (strictly-below filter on BOTH engines,
    * the `streamSessionize` oracle trick) so the emitted set is
    * deterministic and closed-form. */
  def streamWindowedAppend(spark: SparkSession, sfDir: String): DataFrame = withStatePartitions(spark, stateParts(spark, sfDir)) {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val runDir = jvmTmpDir("runwa")
    val inDir   = stagedEventLog(spark, sfDir)
    val outDir  = s"$runDir/out"
    val ckptDir = s"$runDir/ckpt"
    val schema = graft.Tables.events(spark, sfDir)
      .select($"ts", $"event_type", $"value").schema

    val agg = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 6))).as("sum_dec"))

    val q = agg.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    cleanupCkpt(spark, Paths.get(ckptDir))

    // horizon scalar from the staging aggregate's memo (see maxEventUs)
    val horizonUs = maxEventUs(spark, sfDir) - 3600L * 1000000L

    spark.read.parquet(outDir)
      .filter(unix_micros($"w.end") < horizonUs)
      .select(
        unix_millis($"w.start").as("bucket_ms"),
        $"event_type", $"n_events",
        round($"sum_dec".cast("double"), 4).as("sum_value"))
      .orderBy($"bucket_ms", $"event_type")
  }
}
