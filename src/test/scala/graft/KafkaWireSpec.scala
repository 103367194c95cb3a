package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.KafkaWire

/** The wire path, proven twice:
  *
  * 1. A broker-free MemoryStream TWIN (always runs): the events table is
  *    serialized through the SAME [[KafkaWire.toWire]] projection the
  *    broker sink uses, the resulting (key, JSON-value) records are
  *    replayed as a stream, parsed by the SAME [[KafkaWire.fromWire]],
  *    and driven through the SAME [[KafkaWire.latestStateOver]] pipeline
  *    — asserting the envelope bytes round-trip losslessly and the
  *    streamed latest-wins state equals batch `cdc_latest_state`. The
  *    only thing it cannot prove is the broker itself.
  *
  * 2. The real-broker end-to-end (publish → consume → identical state),
  *    registered ONLY when `SPARK_GRAFT_KAFKA=host:port` points at a
  *    live Kafka/Redpanda AND the spark-sql-kafka runtime jar is on the
  *    classpath. The build sandbox has neither, so by default the test
  *    is registered as ignored (with the reason in its name) instead of
  *    canceling mid-run — the default suite reports 0 canceled. A
  *    docker-capable host can stand the broker up with
  *    `tools/docker-compose-kafka.yml` (single-node Redpanda; the file
  *    header documents the connector-jar + env incantation). */
class KafkaWireSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("wire envelope round-trips losslessly: fromWire(toWire(events)) ≡ events") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    val back = KafkaWire.fromWire(KafkaWire.toWire(ev))
    // ts carries µs precision on both sides (toWire ships unix micros);
    // compare the full column set as sets — no row survives mutated
    assert(back.exceptAll(ev).count() == 0 && ev.exceptAll(back).count() == 0)
    // and the produce-side key contract: key = user_id, stringly
    val keys = KafkaWire.toWire(ev)
      .select($"key".cast("long").as("k")).distinct().collect().map(_.getLong(0)).toSet
    val users = ev.select($"user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(keys == users)
  }

  test("latest-wins over a MemoryStream wire twin equals batch cdc_latest_state") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{min, max, unix_micros}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ev = graft.Tables.events(spark, sf)
    // Two addData blocks split at the event-time midpoint (the same
    // ordered-halves shape as StreamingLatest.stagedEventLog), each
    // half shuffled internally: this proves arrival-order independence
    // WITHIN a source offset block (a broker partition only orders per
    // key; the pipeline must not rely even on that), and keeps the
    // replay watermark-safe whether AvailableNow consumes the two
    // offsets as one micro-batch (what MemoryStream does today) or
    // two — the second half is strictly newer, so the 1-hour watermark
    // can never drop a half-2 event below a half-1 high-water mark.
    val mm = ev.agg(unix_micros(min($"ts")), unix_micros(max($"ts"))).first()
    val midUs = (mm.getLong(0) + mm.getLong(1)) / 2
    val rnd = new scala.util.Random(42)
    def wireHalf(keep: org.apache.spark.sql.Column): Seq[(String, String)] =
      rnd.shuffle(KafkaWire.toWire(ev.filter(keep))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq)
    val h1 = wireHalf(unix_micros($"ts") <= midUs)
    val h2 = wireHalf(unix_micros($"ts") > midUs)
    assert(h1.nonEmpty && h2.nonEmpty)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    ms.addData(h1)
    ms.addData(h2)
    val wire = ms.toDF().toDF("key", "value")
    val fromTwin = KafkaWire.latestStateOver(spark, KafkaWire.fromWire(wire),
        eventRows = (h1.size + h2.size).toLong)
      .collect().map(_.toSeq).toSet
    val fromBatch = graft.cdc.Changelog.latestState(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(fromTwin == fromBatch,
      "MemoryStream-wire latest-wins state diverged from the batch oracle twin")
  }

  private val brokerReady =
    KafkaWire.bootstrap.isDefined && KafkaWire.runtimePresent

  if (brokerReady) {
    test("latest-wins over a real Kafka topic equals batch cdc_latest_state") {
      KafkaWire.publishEvents(spark, sf)
      val fromKafka = KafkaWire.latestState(spark, sf)
        .collect().map(_.toSeq).toSet
      val fromBatch = graft.cdc.Changelog.latestState(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(fromKafka == fromBatch,
        "Kafka-sourced latest-wins state diverged from the batch oracle twin")
    }
  } else {
    ignore("latest-wins over a real Kafka topic equals batch cdc_latest_state " +
      s"[needs ${KafkaWire.BootstrapEnv}=host:port + spark-sql-kafka jar]") {}
  }
}
