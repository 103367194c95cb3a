package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver test data (TESTDATA.md).
  * All operators read via these; the path layout is `$sfDir/<name>.parquet`.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is ns-precision parquet (TIMESTAMP(NANOS)), which Spark 4
    * rejects outright unless read as a raw long. The driver data is
    * µs-aligned (verified: epoch_ns % 1000 == 0 for every row), so
    * `ns div 1000` is an exact conversion to a Spark µs timestamp.
    *
    * The raw long survives as `ts_ns`: predicates on the *converted* `ts`
    * cannot reach the parquet scan (a filter over `timestamp_micros(...)`
    * is not pushable), so time-range operators filter on `ts_ns` instead —
    * a plain long comparison the scan can push down (audited in
    * ChangelogSpec). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    else
      raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
