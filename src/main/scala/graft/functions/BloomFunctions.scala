package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-API surface over Spark's internal bloom-filter expressions —
  * the machinery behind Catalyst's own InjectRuntimeFilter
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, not exposed in
  * the public function registry). A bloom built over the small side of
  * a selective join and evaluated against the big side's key BEFORE the
  * join shuffle is the canonical 100 TB semi-join pruning pattern: rows
  * that cannot match never enter the exchange. Keys are hashed with
  * xxhash64 exactly as the injected runtime filter does.
  *
  * Both are mergeable two-phase aggregates/scalar expressions with
  * codegen, so they ride whole-stage codegen like any builtin. */
object BloomFunctions {

  /** Aggregate: build a bloom filter over xxhash64(key).
    * @param expectedItems sizing hint (distinct keys on the build side)
    * @param numBits       filter width in bits */
  def bloom_filter_agg(key: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Scalar: membership probe of xxhash64(key) against a built filter
    * (false positives possible, false negatives never). */
  def might_contain(bloom: Column, key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom),
      new XxHash64(Seq(ColumnBridge.expression(key)))))
}
