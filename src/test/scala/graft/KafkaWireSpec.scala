package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.KafkaWire

/** End-to-end proof of the optional real-broker path: publish the
  * events table to a Kafka/Redpanda topic, consume it back through the
  * SAME latest-wins pipeline the file source drives, and require the
  * identical per-key state as batch `cdc_latest_state`.
  *
  * The build sandbox has neither a broker nor the spark-sql-kafka
  * runtime jar, so both preconditions are `assume`d: without them the
  * test CANCELS (visibly, with the reason) rather than silently
  * passing. A deployment with a broker runs it by setting
  * `SPARK_GRAFT_KAFKA=host:port` (and optionally
  * `SPARK_GRAFT_KAFKA_TOPIC`). */
class KafkaWireSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("latest-wins over a real Kafka topic equals batch cdc_latest_state") {
    assume(KafkaWire.bootstrap.isDefined,
      s"${KafkaWire.BootstrapEnv} not set — no broker in this sandbox")
    assume(KafkaWire.runtimePresent,
      "spark-sql-kafka runtime not on the classpath")

    KafkaWire.publishEvents(spark, sf)
    val fromKafka = KafkaWire.latestState(spark)
      .collect().map(_.toSeq).toSet
    val fromBatch = graft.cdc.Changelog.latestState(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(fromKafka == fromBatch,
      "Kafka-sourced latest-wins state diverged from the batch oracle twin")
  }
}
