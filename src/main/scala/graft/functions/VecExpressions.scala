package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two array<float> columns, accumulated in
  * DOUBLE with a left-to-right fold.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.3 preference order b):
  * the built-in formulation `aggregate(zip_with(a, b, (x,y) => xd*yd),
  * 0.0, _+_)` is correct but runs interpreted — higher-order functions
  * are CodegenFallback and allocate an intermediate array per row. This
  * expression generates a tight primitive loop inside whole-stage
  * codegen: no allocation, no lambda dispatch.
  *
  * Numerics contract: each float is widened to double *before* the
  * multiply and summed left-to-right — bit-identical to the higher-order
  * formulation it replaces and to the DuckDB oracle's
  * `list_aggregate(list_transform(...), 'sum')`, so the hash-compare gate
  * is unaffected by the swap.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_f expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object VecFunctions {
  /** Column-API surface: dot product of two float-vector columns. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Squared L2 norm / L2 norm of a float-vector column. */
  def vec_norm_sq(a: Column): Column = vec_dot(a, a)

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("vec_dot_f"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot_f"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs.head, exprs(1))))
}

/** SparkSessionExtensions hook: registers the vector functions for SQL
  * users (`SELECT vec_dot_f(a, b) ...`). Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`. The Column API in
  * [[VecFunctions]] needs no registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    VecFunctions.registrations.foreach(e.injectFunction)
}
