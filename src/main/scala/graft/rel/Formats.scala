package graft.rel

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Columnar-format interop beyond parquet. The engine's primary format
  * is parquet (every fixture table); an analytics-engine claim also
  * needs to WRITE and read back the other mainstream columnar format the
  * runtime ships (ORC). Avro is deliberately absent: this Spark build
  * carries the avro core jars but not the `spark-avro` runtime
  * expressions, so `from_avro` would fail at run time — documented
  * rather than stubbed. */
object Formats {

  // keyed on the session REFERENCE, not identityHashCode: hash codes can
  // be reused after a session is GC'd, which would hand a new session a
  // staging dir produced under different conf (same fix as
  // TextOps.pairsCache)
  private val stagedOrc =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** `source_orc_roundtrip`: orders written to ORC (zlib default) and
    * read back, then aggregated — the gate's oracle computes the SAME
    * aggregate from the original parquet, so a hash match proves the
    * ORC write/read cycle is lossless, including the NTZ timestamp
    * column surviving as partition of the row (not projected out). The
    * staging write happens once per (session, sfDir) — the same
    * shared-stage pattern as the streaming event log; repeated
    * consumers pay only the read. */
  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // same bounded-growth guard as TextOps.pairsCache: staged dirs for
    // dead sessions must not accumulate in a long-lived JVM (the temp
    // dirs themselves are OS-reclaimed; this caps the map)
    if (stagedOrc.size > 16) stagedOrc.clear()
    val dir = stagedOrc.computeIfAbsent(
      (spark, sfDir),
      _ => {
        val d = Files.createTempDirectory("graft-orc").toString
        Tables.orders(spark, sfDir).write.mode("overwrite").orc(s"$d/orders")
        d
      })
    spark.read.orc(s"$dir/orders")
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4)
          .as("sum_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
      .orderBy($"o_orderstatus")
  }

  private val stagedPart =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** `source_partitioned_roundtrip`: Hive-style PARTITIONED layout —
    * orders written `partitionBy(o_year)` (one directory per year), then
    * read back with a partition-key predicate. The filter resolves
    * against the directory listing, not the data: `.explain` shows it
    * under PartitionFilters and the executed scan's numFiles metric
    * counts only the matching `o_year=1995/` directory (asserted in
    * FormatsSpec). At 100 TB this is the first and cheapest scan
    * reducer — whole partitions never become tasks, which row-group
    * statistics pushdown (scan_filter_project) cannot do. Staged once
    * per (session, sfDir), same shared-stage pattern as [[orcRoundtrip]];
    * the oracle aggregates the ORIGINAL parquet under the same
    * predicate, so a hash match proves the partitioned write/read cycle
    * lossless AND the pruning semantics-preserving. */
  def partitionedRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    if (stagedPart.size > 16) stagedPart.clear()
    val dir = stagedPart.computeIfAbsent(
      (spark, sfDir),
      _ => {
        val d = Files.createTempDirectory("graft-part").toString
        Tables.orders(spark, sfDir)
          .withColumn("o_year", year($"o_orderdate"))
          .write.mode("overwrite").partitionBy("o_year").parquet(s"$d/orders")
        d
      })
    spark.read.parquet(s"$dir/orders")
      .filter($"o_year" === 1995)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast("decimal(18,4)")).cast("double"), 4)
          .as("sum_price"))
      .orderBy($"o_orderstatus")
  }
}
