package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Executor-side count-min-sketch algebra over the serialized form that
  * Spark's builtin `count_min_sketch(...)` aggregate emits.
  *
  * Why (SURVEY.md §2.3 escalation): the builtin gives you per-group
  * PARTIAL sketches as binary but no second-phase tooling — merging
  * those partials otherwise forces a `collect()` + driver
  * `mergeInPlace`, the exact anti-pattern a 1000-executor heavy-hitter
  * pass cannot afford. `CmsMergeAgg` is the missing re-aggregation: a
  * `TypedImperativeAggregate[CountMinSketch]` whose update folds each
  * incoming serialized sketch into the buffer cell-wise (CMS cells add;
  * commutative + associative, so partial/final split and merge order
  * are free), keeping the whole reduction on executors. `CmsEstimate`
  * is the matching scalar probe so estimates are computed where the
  * sketch row lives, not on the driver.
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cms_merge expects binary, got $t")
  }

  // Empty-buffer sentinel: dims are only known from the first sketch seen
  // (they're encoded in the serialized form), so "no input yet" is null
  // and the first merge adopts the incoming sketch's layout.
  override def createAggregationBuffer(): CountMinSketch = null

  private def fold(buf: CountMinSketch, bytes: Array[Byte]): CountMinSketch = {
    val sk = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    if (buf == null) sk else { buf.mergeInPlace(sk); buf }
  }

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) buf else fold(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buf: CountMinSketch, other: CountMinSketch): CountMinSketch =
    if (other == null) buf
    else if (buf == null) other
    else { buf.mergeInPlace(other); buf }

  override def eval(buf: CountMinSketch): Any =
    if (buf == null) null else serialize(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = {
    if (buf == null) return Array.emptyByteArray
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    if (bytes.isEmpty) null
    else CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
}

/** Scalar probe: `estimateCount(key)` against a serialized CMS. The
  * deserialized sketch is memo-cached by CONTENT (reference fast path,
  * then Arrays.equals) — UnsafeRow.getBinary hands back a fresh copy
  * per eval, so a reference-only key would never hit in the Generate
  * fan-out shape (many probe keys over one merged sketch row); the
  * content check keeps it to one deserialization per distinct sketch
  * per partition. Eval-only (CodegenFallback) is fine here: the probe
  * side is dimension-bounded by construction, never the 100 TB fact
  * stream. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"cms_estimate expects (binary, bigint), got ($l, $r)")
    }

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override protected def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (!(bytes eq lastBytes) &&
        !java.util.Arrays.equals(bytes, lastBytes)) {
      lastSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    }
    lastBytes = bytes
    lastSketch.estimateCount(java.lang.Long.valueOf(key.asInstanceOf[Long]))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsFunctions {
  /** Aggregate: merge serialized count-min sketches cell-wise on
    * executors (second-phase re-aggregation of builtin
    * `count_min_sketch` partials). */
  def cms_merge(sketch: Column): Column =
    ColumnBridge.column(
      CmsMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  /** Scalar: frequency estimate of `key` from a serialized sketch. */
  def cms_estimate(sketch: Column, key: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(key)))
}
