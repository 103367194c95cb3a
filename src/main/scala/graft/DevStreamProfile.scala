package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Dev-only streaming-floor profiler: runs the named streaming queries
  * (default: the full cdc_stream_* set) with a listener that prints each
  * micro-batch's durationMs breakdown (addBatch / queryPlanning /
  * triggerExecution / walCommit / commitOffsets / getBatch / latestOffset)
  * plus per-query wall time — so the ~1.5-3.5 s/query bench floor can be
  * attributed to planner, state commit, source listing, or sink work
  * instead of guessed at. `runMain graft.DevStreamProfile [names…]`. */
object DevStreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench's production-AQE form (r17 default; r17 verdict item
      // 5 asks for the floor re-profile under the SHIPPED regime) so the
      // per-batch durations decompose the numbers the bench reports
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", "256"))
      // keep the dev-band regime identical to Bench's (r21 default flip)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "64MB"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[sprof] started ${e.id}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        println(s"[sprof] batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
          s"planning=${d.get("queryPlanning")} walCommit=${d.get("walCommit")} " +
          s"commitOffsets=${d.get("commitOffsets")} getBatch=${d.get("getBatch")} " +
          s"latestOffset=${d.get("latestOffset")} " +
          s"stateCommit=${Option(p.stateOperators).toSeq.flatten
            .map(_.commitTimeMs).sum}")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val defaults = SparkEntry.queries.keys.filter(_.startsWith("cdc_stream")).toSeq.sorted
    val names = if (args.nonEmpty) args.toSeq else defaults
    // warm the streaming machinery once so query 1 isn't charged startup
    graft.cdc.StreamingLatest.stagedEventLog(spark, sfDir)
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[sprof] $n total=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
