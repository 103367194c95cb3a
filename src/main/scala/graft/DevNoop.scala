package graft
import org.apache.spark.sql.SparkSession

/** Dev-only noop-sink cross-check (optimization guide §1.4): times each
  * named query under BOTH terminal actions — the bench's `count()` and a
  * `noop` sink write (which eagerly computes every column of every row
  * and cannot be pruned) — so "is count() under-measuring the real
  * computation?" is a number, not an assumption. The bench keeps
  * `count()` (driver-contract comparability across rounds); this harness
  * exists to audit that choice per query.
  * `runMain graft.DevNoop q1 q2 …` (defaults to the historical top-cost
  * batch set). Each action is warmed once and timed on the second run. */
object DevNoop {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", "256"))
      // same AQE coalescing regime as Bench/DevTime/DevStreamProfile
      // (r21 default flip) — the noop cross-check must measure the
      // shipped regime, not a divergent one (r21 advisor)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "64MB"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val defaults = Seq("graph_bfs_distance", "dedup_containment",
      "dedup_substring_spans", "vec_kmeans_lloyd", "q21_late_suppliers",
      "q16_parts_supplier", "q18_large_orders", "text_perplexity_bucket",
      "text_bigram_logprob", "q8_market_share")
    // `stream` preset (r21 verdict item 8): the streaming family's
    // action-sensitivity. A streaming query RUNS during DataFrame
    // construction (inside fn), so both timings cover the full
    // stream + readback; the action only varies how the small readback
    // frame is consumed — expect ratios ≈ 1, and a ratio well above 1
    // would mean the bench's count() hides real readback work.
    val streamSet = SparkEntry.queries.keys.filter(_.startsWith("cdc_stream_"))
      .toSeq.sorted :+ "cdc_state_reader"
    val names =
      if (args.toSeq == Seq("stream")) streamSet
      else if (args.nonEmpty) args.toSeq else defaults
    // streaming names: stage the shared event log up front so the first
    // timed query doesn't absorb the one-time staging write (the Bench
    // warm-up rule)
    if (names.exists(n => n.startsWith("cdc_stream_") || n == "cdc_state_reader"))
      try graft.cdc.StreamingLatest.stagedEventLog(spark, sfDir)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[devnoop] staging warm-up failed: $e") }
    println(f"${"query"}%-28s ${"count_s"}%8s ${"noop_s"}%8s ${"noop/count"}%10s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(action: org.apache.spark.sql.DataFrame => Unit): Double = {
        action(fn(spark, sfDir)) // warm
        val t0 = System.nanoTime()
        action(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val tc = run(df => { df.count(); () })
      val tn = run(_.write.format("noop").mode("overwrite").save())
      println(f"$name%-28s $tc%8.3f $tn%8.3f ${tn / tc}%10.2f")
    }
    spark.stop()
  }
}
