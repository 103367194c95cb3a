package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash bit-vote aggregate: folds a group's 64-bit feature hashes into
  * one 64-bit fingerprint (bit b set iff features with bit b set
  * outnumber those without — Charikar sketch, Manku et al. web-dedup
  * form).
  *
  * Why a custom aggregate (SURVEY.md §2.3 escalation): the declarative
  * version is 64 independent `sum((h >> b) & 1)` columns + a count — a
  * 65-aggregate hash-agg whose generated update function is enormous
  * (codegen compile time alone showed up in the bench). This is ONE
  * `TypedImperativeAggregate` with an `Array[Long](65)` buffer (64 vote
  * counters + n), updated in a tight loop, merged element-wise —
  * partial+final aggregation (map-side combine) still applies, so the
  * shuffle carries one 520-byte buffer per (partition, key), same as at
  * any cluster scale.
  */
case class SimHashVoteAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val Bits = 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_agg expects bigint, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bits + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < Bits) { buf(b) += (h >>> b) & 1L; b += 1 }
      buf(Bits) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= Bits) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(Bits)
    var fp = 0L
    var b = 0
    while (b < Bits) { if (buf(b) * 2 > n) fp |= (1L << b); b += 1 }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate((Bits + 1) * 8)
    var i = 0
    while (i <= Bits) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](Bits + 1)
    var i = 0
    while (i <= Bits) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashVoteAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashVoteAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashVoteAgg =
    copy(child = newChildren.head)
}

object SimHashFunctions {
  /** Column API: 64-bit SimHash fingerprint of a group of hash values. */
  def simhash_agg(hashes: Column): Column =
    ColumnBridge.column(
      SimHashVoteAgg(ColumnBridge.expression(hashes)).toAggregateExpression())
}
