package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: a distributed engine's results must be a
  * pure function of the DATA, never of how it happened to be
  * partitioned. The oracle gate catches partition-order sensitivity
  * only if it fires at the gate's fixed partition count; this spec
  * varies `spark.sql.shuffle.partitions` (3 vs 7 — coprime, both
  * different from the suite's 4) across a sample of the
  * order-sensitivity-RISKY shapes — float/decimal aggregation order,
  * window ties, ordered string aggregation, top-k boundaries, iterative
  * integer propagation — and requires bit-identical collected results.
  *
  * Streaming queries are excluded: they pin their own state-partition
  * count internally (frozen into the checkpoint), which is itself the
  * invariance mechanism on that surface. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  private val sample = Seq(
    "agg_pricing_summary",   // decimal-cast float sums
    "agg_listagg",           // ordered string aggregation
    "agg_mode_freq",         // packed-argmax mode (tie-broken by rule)
    "window_topk_group",     // rank boundaries
    "sort_limit_topk",       // global top-k boundary
    "sample_group_hash_topk",// hash-rank sampling
    "text_tfidf",            // per-doc float scoring + top-k ties
    "text_bpe_merges",       // iterated vocabulary rewrite
    "sim_topk_cosine",       // float dot products + rank
    "vec_kmeans_lloyd",      // integer-exact iterative assignment
    "graph_label_propagation", // iterative argmax propagation
    "q18_large_orders",      // having-filter over summed floats
    "typed_sorted_streaks",  // engine secondary sort feeding a typed fold
    "typed_cogroup_sorted",  // two-sided sorted merge scan
    "ts_downsample_ohlc")    // min_by/max_by argmin over struct keys

  test("results are invariant to the shuffle partition count (3 vs 7)") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def runAll(n: Int): Map[String, Seq[String]] = {
      spark.conf.set(key, n.toString)
      sample.map { name =>
        name -> SparkEntry.queries(name)(spark, sf)
          .collect().map(_.toString).toSeq
      }.toMap
    }
    try {
      val at3 = runAll(3)
      val at7 = runAll(7)
      sample.foreach { name =>
        assert(at3(name) == at7(name),
          s"$name changed results with the shuffle partition count")
        assert(at3(name).nonEmpty, s"$name returned no rows at smoke scale")
      }
    } finally spark.conf.set(key, prev)
  }
}
