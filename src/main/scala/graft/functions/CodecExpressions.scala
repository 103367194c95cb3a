package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE length of a string column's UTF-8 bytes — the primitive under
  * the compression-ratio quality filter (Gopher/CCNet-family pipelines
  * drop documents that compress "too well": near-constant byte streams
  * are boilerplate or degenerate repetition that per-token heuristics
  * can miss). Only the LENGTH escapes the expression: the compressed
  * bytes never materialize into a row, so the scan stays narrow; each
  * row allocates its own Deflater (native zlib state is not
  * thread-safe across codegen task threads).
  *
  * No DuckDB twin exists (no zlib surface), so the declared query is
  * oracle-exempt and spec-gated: an independent in-test Deflater
  * recompute, the fixed-point ratios of planted constant/random strings,
  * and double-dump determinism. Determinism note: DEFLATE output (and
  * thus its length) is fixed for a given zlib level and input on one
  * runtime — the gate always compares dumps produced by the same JVM.
  */
case class DeflateLen(child: Expression, level: Int)
    extends UnaryExpression {

  require(level >= 1 && level <= 9, s"deflate level must be in 1..9, got $level")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"deflate_len expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String], level)

  /** Same one-static-call codegen shape as [[WordShingleHashes]]: the
    * per-row deflate dominates, inlining buys nothing; staying inside
    * the WSCG span keeps the surrounding projection fused. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.DeflateLen.compute($v, $level);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  /** Raw-deflate (nowrap) length at the given level. The Deflater is
    * per-call: Deflater holds native zlib state that is NOT thread-safe,
    * and codegen evaluates rows on many task threads. */
  def compute(text: UTF8String, level: Int): Int = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def deflate_len(text: Column, level: Int = 6): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(text), level))
}
