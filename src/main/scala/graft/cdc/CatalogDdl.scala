package graft.cdc

import org.apache.spark.sql.SparkSession

/** DDL surface (R1/R2): the reference's `CREATE KEYSPACE` /
  * `CREATE TABLE ... PRIMARY KEY(customer_id, order_id)`
  * (README.md:80,96-101) mapped to Spark catalog namespaces and external
  * tables, so the whole engine is reachable through plain SQL
  * (`SELECT ... FROM graft.lineitem`).
  *
  * The composite-primary-key layout intent (partition key + clustering
  * key) is carried by how derived tables are written — repartition on the
  * partition key, sortWithinPartitions on the clustering key (see
  * ChangelogSink) — not by catalog metadata; Spark's catalog has no PK
  * concept.
  */
object CatalogDdl {
  val Database = "graft"
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** CREATE DATABASE + one external parquet table per test-data file. */
  def registerStarSchema(spark: SparkSession, sfDir: String,
      db: String = Database): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    TableNames.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $db.$t")
      spark.sql(
        s"CREATE TABLE $db.$t USING parquet LOCATION '$sfDir/$t.parquet'")
    }
  }

  def dropAll(spark: SparkSession, db: String = Database): Unit = {
    TableNames.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $db.$t"))
    spark.sql(s"DROP DATABASE IF EXISTS $db")
  }
}
