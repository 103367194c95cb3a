package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual queries standalone (outside the full
  * Bench sweep) — `runMain graft.DevTiming <sfDir> <query> [query...]`.
  * Each query runs twice so first-run planning cost is visible. */
object DevTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-dev-timing")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("GRAFT_DEV_STREAMPROFILE"))
      spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        def onQueryStarted(e: QueryStartedEvent): Unit = ()
        def onQueryProgress(e: QueryProgressEvent): Unit =
          println(s"[progress] batch=${e.progress.batchId} durationMs=${e.progress.durationMs}")
        def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      })
    try names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        println(f"[devtiming] $n%-28s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
      }
    } finally spark.stop()
  }
}
