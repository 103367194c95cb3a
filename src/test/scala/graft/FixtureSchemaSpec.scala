package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-fixture canary, companion to EventsFixtureSpec: the driver
  * regenerates `/root/testdata` between rounds and has already changed a
  * physical type under us once (events.ts, round 6 — 42 queries failed
  * anonymously). Pin every table's column set plus the types the code
  * load-bears on, so the NEXT refresh fails here, by table name, first.
  *
  * Deliberately lenient where the code is: integral key columns accept
  * any integral width, and date-ish columns accept DATE / TIMESTAMP /
  * TIMESTAMP_NTZ (operators normalize via casts). Strict on column
  * names: a rename breaks analysis everywhere. */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = SparkFixture.Sf

  private val expectedCols = Map(
    "region"     -> Set("r_regionkey", "r_name"),
    "nation"     -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                        "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                        "l_linestatus", "l_shipdate"),
    "events"     -> Set("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  private def isIntegral(dt: DataType) = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
  private def isDateish(dt: DataType) = dt match {
    case _: DateType | _: TimestampType | _: TimestampNTZType => true
    case _ => false
  }

  test("every fixture table has the pinned column set") {
    expectedCols.foreach { case (t, cols) =>
      val actual = Tables.table(spark, sf, t).schema.fieldNames.toSet
      assert(actual == cols,
        s"$t drifted: missing=${cols -- actual} unexpected=${actual -- cols}")
    }
  }

  test("load-bearing column types hold (lenient where operators cast)") {
    def typ(t: String, c: String) = Tables.table(spark, sf, t).schema(c).dataType
    Seq("customer" -> "c_custkey", "orders" -> "o_orderkey", "orders" -> "o_custkey",
      "lineitem" -> "l_orderkey", "lineitem" -> "l_partkey", "lineitem" -> "l_suppkey",
      "supplier" -> "s_suppkey", "part" -> "p_partkey", "nation" -> "n_nationkey",
      "region" -> "r_regionkey", "events" -> "event_id", "events" -> "user_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id").foreach { case (t, c) =>
      assert(isIntegral(typ(t, c)), s"$t.$c is ${typ(t, c)}, expected an integral key")
    }
    Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate").foreach { case (t, c) =>
      assert(isDateish(typ(t, c)), s"$t.$c is ${typ(t, c)}, expected date/timestamp")
    }
    assert(typ("documents", "text") == StringType, "documents.text must be string")
    assert(typ("embeddings", "embedding") == ArrayType(FloatType, containsNull = true) ||
      typ("embeddings", "embedding") == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding is ${typ("embeddings", "embedding")}, expected array<float>")
    Seq("customer" -> "c_acctbal", "orders" -> "o_totalprice", "lineitem" -> "l_quantity",
      "lineitem" -> "l_extendedprice", "lineitem" -> "l_discount", "events" -> "value")
      .foreach { case (t, c) =>
        assert(typ(t, c) == DoubleType, s"$t.$c is ${typ(t, c)}, expected double")
      }
  }
}
