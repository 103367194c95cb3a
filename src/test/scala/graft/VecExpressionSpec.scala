package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VecFunctions

class VecExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  test("FloatVecDot equals the higher-order formulation bit-for-bit") {
    val s = spark
    import s.implicits._
    val e = Tables.embeddings(spark, sf).limit(100)
    val probe = e.filter($"vec_id" === 0).select($"embedding".as("p"))
    val both = e.crossJoin(broadcast(probe)).select(
      $"vec_id",
      VecFunctions.vec_dot($"embedding", $"p").as("native"),
      aggregate(zip_with($"embedding", $"p",
          (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("FloatVecDot survives SQL registration (GraftExtensions function set)") {
    val s = spark
    import s.implicits._
    VecFunctions.registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("emb_test")
    val viaSql = spark.sql(
      "SELECT vec_id, vec_dot_f(embedding, embedding) AS nsq FROM emb_test ORDER BY vec_id")
      .collect()
    val viaCol = Tables.embeddings(spark, sf).limit(5)
      .select($"vec_id", VecFunctions.vec_norm_sq($"embedding").as("nsq"))
      .orderBy($"vec_id").collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.forall(_.getDouble(1) > 0))
  }

  test("type check rejects non-float-array inputs") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    val err = intercept[Exception] {
      bad.select(VecFunctions.vec_dot($"v", $"v")).collect()
    }
    assert(err.getMessage.contains("vec_dot_f") || err.getMessage.toLowerCase.contains("type"))
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val x = ArrayData.toArrayData(Array(1.5f, -2.0f, 3.25f))
    val expr = graft.functions.FloatVecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(x,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(x,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val expected = 1.5 * 1.5 + 2.0 * 2.0 + 3.25 * 3.25
    assert(expr.eval(null).asInstanceOf[Double] == expected)
  }
}
