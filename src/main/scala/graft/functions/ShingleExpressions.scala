package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingle hashes of a text column in one pass:
  * tokenize on single spaces, slide a k-token window, xxhash64 (seed 42)
  * each window's joined string, keep first-occurrence-distinct hashes.
  *
  * Semantics (and hash values) are identical to the declarative
  * `transform(array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(split(text," "), i+1, k)))), s => xxhash64(s))`
  * pipeline it replaces — documents shorter than k tokens contribute the
  * whole text as one shingle — but that pipeline is four nested
  * CodegenFallback higher-order functions that materialize every shingle
  * string into an intermediate array per row; at bench scale the
  * interpreted overhead dominated every query in the dedup family
  * (MinHash, SimHash, ngram-Jaccard, winnowing). This node does the
  * whole thing in one tight evaluation and feeds codegen consumers.
  *
  * 100 TB note: emitting 8-byte hashes instead of ~20-byte shingle
  * strings also narrows every downstream explode/shuffle; collisions
  * perturb set arithmetic with probability ~n²/2⁶⁴ per document —
  * negligible, and checked by the exact-string DuckDB oracle at the
  * correctness gate.
  */
case class WordShingleHashes(child: Expression, k: Int, sorted: Boolean)
    extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingle_hashes expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    WordShingleHashes.compute(input.asInstanceOf[UTF8String], k, sorted)

  /** Generated code calls the shared compute through one static-ish
    * dispatch — the per-row work (split/join/hash) is real enough that a
    * hand-inlined loop buys nothing over staying inside the WSCG span. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordShingleHashes.compute($v, $k, $sorted);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object WordShingleHashes {
  private val Seed = 42L // Spark's xxhash64 default seed

  /** `sorted=false`: first-occurrence order (positional consumers, e.g.
    * winnowing); `sorted=true`: ascending — the canonical set order the
    * prefix-filter join needs, sorted here on the primitive array
    * instead of through an interpreted ArraySort over the column. */
  def compute(text: UTF8String, k: Int, sorted: Boolean): UnsafeArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val nWindows = math.max(n - k, 0) + 1
    val seen = new mutable.LongMap[Unit](nWindows * 2)
    val out = new mutable.ArrayBuilder.ofLong
    out.sizeHint(nWindows)
    var i = 0
    while (i < nWindows) {
      val sb = new java.lang.StringBuilder
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed)
      if (!seen.contains(h)) { seen.update(h, ()); out += h }
      i += 1
    }
    val arr = out.result()
    if (sorted) java.util.Arrays.sort(arr)
    UnsafeArrayData.fromPrimitiveArray(arr)
  }
}

object ShingleFunctions {
  /** Column API: distinct word-k-shingle xxhash64 values of a text column. */
  def word_shingle_hashes(text: Column, k: Int, sorted: Boolean = false): Column =
    ColumnBridge.column(WordShingleHashes(ColumnBridge.expression(text), k, sorted))
}
