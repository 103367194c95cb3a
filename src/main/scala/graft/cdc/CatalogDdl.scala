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

  // last (session, db) -> sfDir registered, so the several SQL-surface
  // queries in one session don't re-run 10 DROP+CREATE DDLs each — the
  // registration is idempotent per (session, db, sfDir) and only
  // re-executes when the data directory actually changes
  // keyed on the sharedState REFERENCE (not identityHashCode, which can
  // be reused after GC and would skip registration against a fresh empty
  // catalog — same fix as TextOps.pairsCache)
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[(AnyRef, String), String]()

  /** CREATE DATABASE + one external parquet table per test-data file. */
  def registerStarSchema(spark: SparkSession, sfDir: String,
      db: String = Database): Unit = {
    val key = (spark.sharedState: AnyRef, db)
    if (registered.get(key) == sfDir) return
    // back-compat for the legacy ns-precision events fixture, whose
    // CREATE TABLE schema inference would throw PARQUET_TYPE_ILLEGAL
    // without it; harmless under the current µs fixture (same dynamic
    // handling as graft.Tables.events, so registration works from a
    // bare session too)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    TableNames.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $db.$t")
      spark.sql(
        s"CREATE TABLE $db.$t USING parquet LOCATION '$sfDir/$t.parquet'")
    }
    registered.put(key, sfDir)
  }

  def dropAll(spark: SparkSession, db: String = Database): Unit = {
    registered.remove((spark.sharedState: AnyRef, db))
    TableNames.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $db.$t"))
    spark.sql(s"DROP DATABASE IF EXISTS $db")
  }
}
