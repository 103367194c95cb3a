package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All random-hyperplane LSH bucket ids of a float vector in ONE pass.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.3 preference order b):
  * the declarative formulation needs `numTables * bitsPerTable` separate
  * `aggregate(zip_with(...))` higher-order expressions — each one is
  * CodegenFallback (interpreted lambda dispatch + an intermediate array
  * allocation per row), and together they bloat the plan tree enough
  * that analysis/codegen alone dominated the bench. This node evaluates
  * the whole `[tables × bits × dim]` projection as a tight fused loop
  * inside whole-stage codegen and returns `array<int>` of bucket ids,
  * one per table (bit b of table t's bucket = sign of plane[t][b]·vec).
  *
  * The plane tensor is a constructor parameter (flattened row-major into
  * one double[]), carried into generated code via `addReferenceObj` — a
  * literal in the plan, identical across runs/partitions/executors, so
  * results are deterministic at any parallelism.
  */
case class FloatVecLshBuckets(
    child: Expression,
    flatPlanes: Array[Double],
    numTables: Int,
    bitsPerTable: Int,
    dim: Int)
    extends UnaryExpression {

  require(flatPlanes.length == numTables * bitsPerTable * dim,
    s"plane tensor size ${flatPlanes.length} != $numTables*$bitsPerTable*$dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_lsh_buckets expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var b = 0
      while (b < bitsPerTable) {
        val off = (t * bitsPerTable + b) * dim
        var s = 0.0
        var d = 0
        while (d < n) { s += flatPlanes(off + d) * v.getFloat(d).toDouble; d += 1 }
        if (s > 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planes = ctx.addReferenceObj("planes", flatPlanes, "double[]")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val b = ctx.freshName("b")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val off = ctx.freshName("off"); val bucket = ctx.freshName("bucket")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int[] $out = new int[$numTables];
         |for (int $t = 0; $t < $numTables; $t++) {
         |  int $bucket = 0;
         |  for (int $b = 0; $b < $bitsPerTable; $b++) {
         |    int $off = ($t * $bitsPerTable + $b) * $dim;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $s += $planes[$off + $d] * (double) $v.getFloat($d);
         |    }
         |    if ($s > 0) $bucket |= (1 << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FloatVecLshBuckets =
    copy(child = newChild)
}

object LshFunctions {
  /** Column API: per-table LSH bucket ids for a float-vector column. */
  def vec_lsh_buckets(emb: Column, planes: Array[Array[Array[Double]]]): Column = {
    val tables = planes.length
    val bits = planes.head.length
    val dim = planes.head.head.length
    ColumnBridge.column(FloatVecLshBuckets(
      ColumnBridge.expression(emb), planes.flatten.flatten, tables, bits, dim))
  }
}
