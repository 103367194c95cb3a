package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The sink half of the reference pipeline (R16/R17): a topic-routed,
  * offset-addressed log append (rpk_topic_consume.json:6-55 — every
  * record identified by (topic, partition, offset), per-topic order by
  * offset).
  *
  * Sandbox sink is parquet partitioned by topic — the analogue of
  * topic-per-table routing (connector.properties:6-7); in production the
  * same DataFrame goes to `writeStream.format("kafka")` unchanged.
  *
  * Scale notes: `repartition($"topic")` gives one shuffle keyed exactly
  * like the Kafka producer's topic partitioner; `sortWithinPartitions`
  * reproduces per-partition offset order without a global sort. Readers
  * get partition pruning for free from the `topic=` directory layout
  * (audited in ChangelogSinkSpec).
  */
object ChangelogSink {

  /** Append-style materialization of a change-event stream to a
    * topic-partitioned log directory. */
  def writeTopicLog(events: DataFrame, path: String): Unit =
    events
      .repartition(col("topic"))
      .sortWithinPartitions(col("offset"))
      .write
      .partitionBy("topic")
      .mode("overwrite")
      .parquet(path)

  /** Consume one topic (R15's `rpk topic consume` analogue): the topic
    * predicate prunes to a single partition directory — no full-log scan. */
  def readTopic(spark: SparkSession, path: String, topic: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("topic") === topic)
      .orderBy(col("offset"))
}
