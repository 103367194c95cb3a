package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rel.Bucketing

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf
  private val db = "graft_bucketed"

  test("bucketed orders x lineitem joins with zero shuffle exchanges") {
    val s = spark
    import s.implicits._
    Bucketing.writeBucketed(spark, sf, db)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path: at test scale AQE would broadcast the
    // small side, which also avoids the shuffle but not via bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, db)
      joined.collect() // materialize so the adaptive plan is final
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      // no hash-partitioning exchange anywhere below the join: bucket
      // layout already co-locates both sides
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"bucket info missing:\n$plan")

      // and it is correct: same revenue as the plain-parquet formulation
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey")
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("revenue"))
        .orderBy($"o_orderkey")
        .collect().toSeq
      assert(joined.collect().toSeq == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $db.orders_b")
      spark.sql(s"DROP TABLE IF EXISTS $db.lineitem_b")
      spark.sql(s"DROP DATABASE IF EXISTS $db")
    }
  }

  test("layout_zorder_cluster: every bucket spans <= 2^12 in BOTH dimensions") {
    val s = spark
    import s.implicits._
    val rows = Bucketing.zorderCluster(spark, sf).collect()
    assert(rows.nonEmpty)
    // bucket = top 8 interleaved bits = top 4 bits of each coordinate:
    // within a bucket both coords share their high nibble, so each
    // dimension's span is bounded by 2^12 - 1 — the pruning guarantee
    rows.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 4095L)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 4095L)
      assert(r.getAs[Long]("max_x") >> 12 == r.getAs[Long]("min_x") >> 12)
      assert(r.getAs[Long]("max_y") >> 12 == r.getAs[Long]("min_y") >> 12)
    }
    // and nothing is lost: bucket counts partition the table
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      Tables.lineitem(spark, sf).count())
  }

  test("layout_compact_files: 64 shards collapse to few, range-disjoint, bounded files") {
    val s = spark
    import s.implicits._
    val compacted = Bucketing.compactedDir(spark, sf)
    val fragmented = compacted.stripSuffix("/compacted") + "/fragmented"
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented) == 64, "fragmented staging lost its shards")
    assert(parquetFiles(compacted) <= 8,
      s"compaction left ${parquetFiles(compacted)} files, expected <= 8")
    val total = Tables.lineitem(spark, sf).count()
    // per-file row counts respect maxRecordsPerFile; per-file key ranges
    // are pairwise disjoint (the min/max pruning guarantee compaction
    // exists to restore) — both via the _metadata hidden column
    val perFile = spark.read.parquet(compacted)
      .select($"l_orderkey", col("_metadata.file_name").as("f"))
      .groupBy($"f")
      .agg(count(lit(1)).as("n"), min($"l_orderkey").as("lo"), max($"l_orderkey").as("hi"))
      .collect()
    assert(perFile.map(_.getAs[Long]("n")).sum == total, "compaction lost rows")
    perFile.foreach(r => assert(r.getAs[Long]("n") <= math.max(1L, total / 4),
      s"file ${r.getAs[String]("f")} exceeds maxRecordsPerFile"))
    val ranges = perFile.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping key ranges across files: $ranges")
      case _ => ()
    }
  }
}
