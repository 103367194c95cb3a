package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{Changelog, StreamingLatest}

/** Streaming/batch equivalence (SURVEY.md §5.5): the stateful streaming
  * latest-wins must converge to exactly the batch window result. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("cdc_stream_stateful final state equals batch cdc_latest_state") {
    val streamRows = StreamingLatest.streamStateful(spark, sf).collect().toSeq
    val batchRows  = Changelog.latestState(spark, sf).collect().toSeq
    assert(streamRows.length == batchRows.length)
    assert(streamRows == batchRows)
  }

  test("cdc_stream_windowed equals batch cdc_stream_tumbling") {
    val streamRows = StreamingLatest.streamWindowed(spark, sf).collect().toSeq
    val batchRows  = Changelog.streamTumbling(spark, sf).collect().toSeq
    assert(streamRows == batchRows)
  }

  test("salted two-phase latest-wins equals the window formulation") {
    val salted = Changelog.latestStateSalted(spark, sf).collect().toSeq
    val window = Changelog.latestState(spark, sf).collect().toSeq
    assert(salted == window)
  }
}
