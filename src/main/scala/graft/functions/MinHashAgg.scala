package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature aggregate: folds a group's 64-bit shingle hashes
  * into a k-long signature — position i holds min over the group of
  * xxhash64-remixed (seed = i) hash values, the standard "k seeded
  * permutations" construction.
  *
  * One `TypedImperativeAggregate` with an `Array[Long](k)` buffer
  * replaces k independent `min(xxhash64(tok, i))` aggregate columns:
  * same partial+final merge shape (element-wise min is associative and
  * commutative, so map-side combine still applies and the shuffle
  * carries one k×8-byte buffer per key), but one generated update
  * function instead of a k-column plan.
  */
case class MinHashSigAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(k >= 1, s"signature length must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_agg expects bigint, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val p = XXH64.hashLong(h, i.toLong)
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    var i = 0
    while (i < k) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](k)
    var i = 0
    while (i < k) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
}

object MinHashFunctions {
  /** Column API: k-position MinHash signature of a group of hash values. */
  def minhash_agg(hashes: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashSigAgg(ColumnBridge.expression(hashes), k).toAggregateExpression())
}
