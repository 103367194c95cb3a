package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All sliding-window code-point sums of a text column in ONE pass:
  * windows of `win` characters at offsets 0, stride, 2·stride, …, the
  * same framing as `floor((len−win)/stride)+1` windows (min 1 — a short
  * or empty payload still yields one window covering what exists), each
  * element the exact sum of `ascii(substr(text, i, 1))` over the
  * window's characters, NULL for a zero-length window.
  *
  * Semantics (and hash values) are identical to the declarative
  * `aggregate(transform(sequence(1, length(win)), i =>
  * ascii(substr(win, i, 1))), 0L, (a, v) => a + v)` per-window pipeline
  * it replaces — Spark 4's `Ascii` is `codePointAt(0)` of a one-char
  * (one-codepoint) substring, so the sum is a code-point sum — but that
  * pipeline is interpreted CodegenFallback, materializes a per-window
  * int array, and re-walks the string from offset 0 on every `substr`;
  * worse, when Catalyst pushes a filter over the aliased sum below the
  * projection it INLINES the whole lambda into the Filter condition
  * (the round-9 25× regression on `mm_audio_silence`). Emitting every
  * window's sum at once costs O(text) total via a prefix-sum pass, and
  * downstream filters see only the exploded scalar — no lambda can ever
  * be duplicated into a Filter again (PlanAuditSpec pins this class).
  *
  * 100 TB note: per-document work is linear in payload size regardless
  * of window/stride choice, and the array is nWin longs — ~1/4 the
  * footprint of the exploded (idx, window-slice) pairs the substr plan
  * shuffled. */
case class AsciiWindowSums(child: Expression, win: Int, stride: Int)
    extends UnaryExpression {

  require(win >= 1 && stride >= 1, s"win/stride must be >= 1, got $win/$stride")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ascii_window_sums expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "ascii_window_sums"

  override def nullSafeEval(input: Any): Any =
    AsciiWindowSums.compute(input.asInstanceOf[UTF8String], win, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.AsciiWindowSums.compute($v, $win, $stride);")

  override protected def withNewChildInternal(newChild: Expression): AsciiWindowSums =
    copy(child = newChild)
}

object AsciiWindowSums {
  def compute(text: UTF8String, win: Int, stride: Int): GenericArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    // integer division matches floor() here: for n < win the quotient is
    // ≤ 0 on both floor and truncate paths and the max(…, 1) absorbs it
    val nWin = math.max((n - win) / stride + 1, 1)
    val prefix = new Array[Long](n + 1)
    var i = 0
    while (i < n) { prefix(i + 1) = prefix(i) + cps(i); i += 1 }
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val start = w * stride
      val end = math.min(start + win, n)
      // only the blank-payload fixture reaches end <= start: its single
      // zero-length window must carry NULL (mirrors list_aggregate([], 'sum'))
      out(w) = if (end > start) java.lang.Long.valueOf(prefix(end) - prefix(start)) else null
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** Maximal runs of consecutive quiet windows over an [[AsciiWindowSums]]
  * array: window `w` is quiet iff its sum is non-NULL and
  * `sum ≤ maxMean · win_len` (cross-multiplied — no division), where
  * `win_len = min(tlen − w·stride, win)` is recovered arithmetically
  * from the text length; each maximal run yields one
  * `(run_start, run_len, run_byte_sum)` struct.
  *
  * Runs can never cross a document boundary, so computing them inside
  * the row — one O(nWin) scan over the sums array — removes the
  * `win_idx − row_number()` islands pass entirely: no exchange, no
  * per-media sort, no window state. At 100 TB that converts a shuffle
  * of every quiet window (the dominant cost of the window idiom, whose
  * showcase lives in `window_gap_islands`) into embarrassingly parallel
  * scan work. */
case class SilenceRuns(left: Expression, right: Expression,
    win: Int, stride: Int, maxMean: Long)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(win >= 1 && stride >= 1, s"win/stride must be >= 1, got $win/$stride")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"silence_runs expects (array<bigint>, int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(SilenceRuns.RunType, containsNull = false)
  override def prettyName: String = "silence_runs"

  override def nullSafeEval(sums: Any, tlen: Any): Any =
    SilenceRuns.compute(sums.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      tlen.asInstanceOf[Int], win, stride, maxMean)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t) =>
      s"${ev.value} = graft.functions.SilenceRuns.compute($s, $t, $win, $stride, ${maxMean}L);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SilenceRuns =
    copy(left = newLeft, right = newRight)
}

object SilenceRuns {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.StructField

  val RunType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      StructField("run_start", org.apache.spark.sql.types.IntegerType, nullable = false),
      StructField("run_len", LongType, nullable = false),
      StructField("run_byte_sum", LongType, nullable = false)))

  def compute(sums: ArrayData, tlen: Int, win: Int, stride: Int,
      maxMean: Long): GenericArrayData = {
    val n = sums.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var runStart = -1
    var runLen = 0L
    var runSum = 0L
    def flush(): Unit = if (runStart >= 0) {
      out += new GenericInternalRow(Array[Any](runStart, runLen, runSum))
      runStart = -1; runLen = 0L; runSum = 0L
    }
    var w = 0
    while (w < n) {
      val winLen = math.min(tlen.toLong - w.toLong * stride, win.toLong)
      val quiet = !sums.isNullAt(w) && {
        val s = sums.getLong(w)
        s <= maxMean * winLen
      }
      if (quiet) {
        if (runStart < 0) runStart = w
        runLen += 1
        runSum += sums.getLong(w)
      } else flush()
      w += 1
    }
    flush()
    new GenericArrayData(out.toArray)
  }
}

object AudioFunctions {
  /** Column API: every `win`-char/`stride`-step window's exact
    * code-point sum, one array per row, NULL for empty windows. */
  def ascii_window_sums(text: Column, win: Int, stride: Int): Column =
    ColumnBridge.column(AsciiWindowSums(ColumnBridge.expression(text), win, stride))

  /** Column API: maximal quiet runs (start, len, byte sum) over a
    * window-sums array; `tlen` is the source text's char length. */
  def silence_runs(sums: Column, tlen: Column, win: Int, stride: Int,
      maxMean: Long): Column =
    ColumnBridge.column(SilenceRuns(ColumnBridge.expression(sums),
      ColumnBridge.expression(tlen), win, stride, maxMean))
}
