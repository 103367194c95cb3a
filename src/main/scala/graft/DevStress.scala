package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stress harnesses for the two scale claims the replicated
  * star schema (DevScale) cannot exercise:
  *
  *   `runMain graft.DevStress skew [srcDir]` — HOT-KEY stress for the
  *   salted paths. Builds a skewed twin of the source fixture (default
  *   sf0.1; pass `target/scale10`/`scale30` — the DevScale replicas —
  *   so the hot key is millions of rows: 80% of events collapsed onto
  *   ONE user, 80% of orders onto ONE customer) and times the salted
  *   plan against its unsalted twin on BOTH the uniform and the skewed
  *   fixture. Broadcast is disabled for the join pair: the salted join
  *   exists for dims too big to broadcast (at local scale the customer
  *   dim would otherwise broadcast and neither plan would shuffle).
  *   AQE stays ON — its skew-join handles post-shuffle SMJ skew but
  *   cannot split a window partition or a single hot aggregate group,
  *   which is precisely what salting fixes.
  *
  *   `runMain graft.DevStress graph [n]` — BFS slope on synthetic
  *   graphs. graph_bfs_distance is excluded from DevScale for the same
  *   fixture artifact as pagerank/LPA (cloning the corpus makes the
  *   near-dup PAIR GRAPH quadratic — an artifact of duplicated text,
  *   not plan quality), so the relaxation rounds are scaled directly:
  *   deterministic pseudo-random graphs of n, 10n and 30n edges
  *   (xxhash64 endpoints, so the graph is identical across runs),
  *   timing [[graft.llm.GraphOps.bfsOnPairs]] at each size.
  */
object DevStress {
  private val Base = "/root/testdata/sf0.1"

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // production AQE form, same as Bench/DevScale (r16 verdict item 2)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", "1024"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Warm run + timed run; returns (seconds, timed run's result) so
    * callers never re-execute a pipeline just to read its count. */
  private def timeIt(body: => Long): (Double, Long) = {
    body // warm plan+codegen
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("skew")  => skew(args.lift(1).getOrElse(Base))
    case Some("graph") => graph(args.lift(1).map(_.toInt).getOrElse(60000))
    case _ => System.err.println("usage: DevStress skew [srcDir] | graph [nEdges]")
  }

  // ── hot-key stress ─────────────────────────────────────────────────
  // srcDir defaults to sf0.1; pass target/scale10 (the DevScale replica,
  // 6M events) to make the hot partition big enough that single-reducer
  // pain is visible over local-mode fixed overheads.
  private def skew(src: String): Unit = {
    val spark = session()
    import spark.implicits._
    val out = s"/root/repo/target/skew-${new java.io.File(src).getName}"
    // memo stamp (r15 advisor note): key the cached twin on the source's
    // absolute path + per-table mtime, not just the basename + existence
    // — a regenerated replica (or two sources sharing a basename) must
    // rebuild, not silently reuse stale skewed data. Written LAST so an
    // interrupted build (events written, customer not yet) also rebuilds.
    def srcStamp: String = (Seq(src) ++ Seq("events", "orders", "customer")
      .map(t => new java.io.File(s"$src/$t.parquet").lastModified.toString))
      .mkString("\n")
    val stampFile = new java.io.File(s"$out/.src-stamp")
    val fresh = stampFile.exists() && {
      val in = scala.io.Source.fromFile(stampFile)
      try in.mkString == srcStamp finally in.close()
    }
    if (!fresh) {
      println(s"[skew] building hot-key twin of $src at $out")
      // 80% of events land on user 0 — the one-key-is-a-celebrity shape
      spark.read.parquet(s"$src/events.parquet")
        .withColumn("user_id",
          when(pmod($"event_id", lit(5)) < 4, lit(0L)).otherwise($"user_id"))
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      // 80% of orders belong to customer 1
      spark.read.parquet(s"$src/orders.parquet")
        .withColumn("o_custkey",
          when(pmod($"o_orderkey", lit(5)) < 4, lit(1L)).otherwise($"o_custkey"))
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      spark.read.parquet(s"$src/customer.parquet")
        .write.mode("overwrite").parquet(s"$out/customer.parquet")
      val w = new java.io.PrintWriter(stampFile)
      try w.print(srcStamp) finally w.close()
    }
    spark.read.parquet(s"$out/events.parquet").count() // warm listings
    spark.read.parquet(s"$src/events.parquet").count()

    // the unsalted twin of join_salted_skew: same join + agg, no salt
    def joinUnsalted(dir: String): DataFrame = {
      val fact = spark.read.parquet(s"$dir/orders.parquet")
      val dim = spark.read.parquet(s"$dir/customer.parquet")
        .select($"c_custkey", $"c_mktsegment")
      fact.join(dim, fact("o_custkey") === dim("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4)
            .as("revenue"))
    }
    def withNoBroadcast[T](body: => T): T = {
      val k = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(k)
      spark.conf.set(k, "-1")
      try body finally spark.conf.set(k, prev)
    }

    println(f"${"case"}%-34s ${"uniform_s"}%10s ${"skewed_s"}%10s")
    def row(name: String, f: String => Double): Unit = {
      val u = f(src); val sk = f(out)
      println(f"$name%-34s $u%10.3f $sk%10.3f")
    }
    row("cdc_latest_state (window)",
      dir => timeIt(SparkEntry.queries("cdc_latest_state")(spark, dir).count())._1)
    row("cdc_latest_state_salted",
      dir => timeIt(SparkEntry.queries("cdc_latest_state_salted")(spark, dir).count())._1)
    row("join unsalted SMJ (no broadcast)",
      dir => withNoBroadcast(timeIt(joinUnsalted(dir).count())._1))
    row("join_salted_skew (no broadcast)",
      dir => withNoBroadcast(timeIt(
        graft.rel.Relational.joinSaltedSkew(spark, dir).count())._1))
    // equality guards: BOTH salted plans must still produce the
    // unsalted answers on the skewed fixture (the whole point of
    // salting) — the timing rows above are meaningless without this
    def sameRows(a: DataFrame, b: DataFrame, what: String): Unit =
      require(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what diverged on the skewed fixture")
    sameRows(
      SparkEntry.queries("cdc_latest_state")(spark, out),
      SparkEntry.queries("cdc_latest_state_salted")(spark, out),
      "salted latest-state")
    sameRows(
      joinUnsalted(out),
      graft.rel.Relational.joinSaltedSkew(spark, out),
      "salted join aggregate")
    spark.stop()
  }

  // ── synthetic-graph BFS slope ──────────────────────────────────────
  private def graph(nEdges: Int): Unit = {
    val spark = session()
    import spark.implicits._
    def pairsOf(m: Long): DataFrame = {
      val n = m / 3 // ~3 edges per node
      spark.range(m).select(
        pmod(xxhash64($"id", lit(1)), lit(n)).as("doc_a"),
        pmod(xxhash64($"id", lit(2)), lit(n)).as("doc_b"))
        .filter($"doc_a" =!= $"doc_b")
    }
    println(f"${"edges"}%10s ${"sec"}%8s ${"reached"}%10s")
    // sizes as Long: 30 * an Int nEdges near 2^31/30 would overflow to
    // a negative range and silently time an empty graph
    Seq(nEdges.toLong, 10L * nEdges, 30L * nEdges).foreach { m =>
      val (t, reached) = timeIt(
        graft.llm.GraphOps.bfsOnPairs(spark, pairsOf(m)).count())
      println(f"$m%10d $t%8.3f $reached%10d")
    }
    spark.stop()
  }
}
