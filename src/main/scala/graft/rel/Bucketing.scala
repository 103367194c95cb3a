package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Bucketed co-located joins — the storage-layout half of the scale
  * story: write both fact tables bucketed (and sorted) by the join key
  * and the join needs **no shuffle exchange at all** — each task
  * sort-merge-joins bucket i of one table against bucket i of the other.
  * At 100 TB this converts the biggest shuffle in the workload
  * (orders⋈lineitem) into a map-side join; the same mechanism backs the
  * reference's partition-key clustering (`PRIMARY KEY(customer_id,
  * order_id)` — partition key routes, clustering key sorts;
  * README.md:96-103).
  *
  * Demonstrated (and plan-asserted) in BucketingSpec rather than shipped
  * as a declared query: the driver's query surface reads the immutable
  * test parquet, while bucketing is a property of how *derived* tables
  * are written.
  */
object Bucketing {
  val NumBuckets = 8

  /** Write orders + lineitem as bucketed, in-bucket-sorted tables. */
  def writeBucketed(spark: SparkSession, sfDir: String, db: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.orders(spark, sfDir).write
      .bucketBy(NumBuckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable(s"$db.orders_b")
    Tables.lineitem(spark, sfDir).write
      .bucketBy(NumBuckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable(s"$db.lineitem_b")
  }

  /** The co-located join: revenue per order, no Exchange in the plan. */
  def colocatedJoin(spark: SparkSession, db: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.table(s"$db.orders_b")
      .join(spark.table(s"$db.lineitem_b"), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey")
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast(DecimalType(18, 4))).cast(DoubleType).as("revenue"))
      .orderBy($"o_orderkey")
  }
}
