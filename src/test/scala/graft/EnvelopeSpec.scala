package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Envelope

/** Golden envelope test (SURVEY.md §5.1): feed the 7 mutations of the
  * reference workload (scylladb_cql_statements.md:18-34) through the
  * envelope builder and assert the produced records reproduce the
  * semantics of rpk_topic_consume.json field-for-field (op codes,
  * before=null, Cell wrapping, key struct, topic name) — timestamps
  * excluded. */
class EnvelopeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** The reference workload: 6 inserts + 1 update on
    * orders(customer_id, order_id, product) — using the JSON corpus as
    * ground truth for keys (order_id 6 for 'pasta', README.md:294). */
  private lazy val mutations = {
    val s = spark
    import s.implicits._
    Seq(
      // (customer_id, order_id, product, op, seq)
      (1, 1, "pizza",     "c", 0L),
      (2, 2, "cookies",   "c", 1L),
      (3, 3, "tea",       "c", 2L),
      (1, 4, "bread",     "c", 3L),
      (1, 5, "lollies",   "c", 4L),
      (1, 6, "pasta",     "c", 5L),
      (1, 6, "spaghetti", "u", 6L)
    ).toDF("customer_id", "order_id", "product", "opcode", "seq")
      .withColumn("ts", timestamp_micros(lit(1683357282912753L) + $"seq"))
  }

  private lazy val built = Envelope.changeEvents(
    mutations, tableName = "orders",
    keyCols = Seq("customer_id", "order_id"),
    valueCols = Seq("product"),
    op = col("opcode"), ts = col("ts"), offset = col("seq"))
    .orderBy("offset").collect()

  test("seven events, ordered by offset") {
    assert(built.length == 7)
    assert(built.map(_.getAs[Long]("offset")).toSeq == (0L until 7L))
  }

  test("topic = namespace.keyspace.table (connector.properties:6-7 scheme)") {
    assert(built.forall(_.getAs[String]("topic") ==
      s"${Envelope.Namespace}.${Envelope.Keyspace}.orders"))
  }

  test("key = struct of PK columns only (rpk_topic_consume.json:3)") {
    val k = built.head.getAs[Row]("key")
    assert(k.schema.fieldNames.toSeq == Seq("customer_id", "order_id"))
    assert(k.getInt(0) == 1 && k.getInt(1) == 1)
  }

  test("op codes: 6 creates then 1 update (rpk_topic_consume.json:4,52)") {
    val ops = built.map(_.getAs[Row]("value").getAs[String]("op")).toSeq
    assert(ops == Seq("c", "c", "c", "c", "c", "c", "u"))
  }

  test("before is null on every event, including the update (no pre-image)") {
    assert(built.forall(_.getAs[Row]("value").isNullAt(
      built.head.getAs[Row]("value").fieldIndex("before"))))
  }

  test("after Cell-wraps non-key columns; PK fields unwrapped (SURVEY.md §1.2.1)") {
    val after = built.last.getAs[Row]("value").getAs[Row]("after")
    assert(after.schema.fieldNames.toSeq == Seq("customer_id", "order_id", "product"))
    assert(after.getAs[Int]("customer_id") == 1)        // bare PK
    val cell = after.getAs[Row]("product")              // wrapped non-PK
    assert(cell.schema.fieldNames.toSeq == Seq("value"))
    assert(cell.getAs[String]("value") == "spaghetti")
  }

  test("upsert on existing PK keeps both events in the log (latest-wins downstream)") {
    val key16 = built.filter { r =>
      val k = r.getAs[Row]("key"); k.getInt(0) == 1 && k.getInt(1) == 6
    }
    assert(key16.length == 2)
    assert(key16.map(_.getAs[Row]("value").getAs[String]("op")).toSeq == Seq("c", "u"))
  }

  test("delete op nulls the after-image (R6)") {
    val s = spark
    import s.implicits._
    val del = Envelope.changeEvents(
      mutations.limit(1), "orders", Seq("customer_id", "order_id"), Seq("product"),
      op = lit("d"), ts = col("ts"), offset = col("seq")).collect().head
    val v = del.getAs[Row]("value")
    assert(v.isNullAt(v.fieldIndex("after")))
    assert(v.getAs[String]("op") == "d")
  }

  test("source block carries dual-precision event time (ts_ms + ts_us)") {
    val src = built.head.getAs[Row]("value").getAs[Row]("source")
    assert(src.getAs[Long]("ts_us") == 1683357282912753L)
    assert(src.getAs[Long]("ts_ms") == 1683357282912L)   // not derivable: independently projected
    assert(src.getAs[String]("keyspace_name") == Envelope.Keyspace)
    assert(src.getAs[String]("table_name") == "orders")
    assert(src.getAs[String]("snapshot") == "false")
  }

  test("Cell 3-state distinction survives to_json (struct-of-null != null-struct)") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "x"), (2, null.asInstanceOf[String]), (3, null.asInstanceOf[String]))
      .toDF("id", "v")
    // touched with null value vs untouched
    val out = df.orderBy($"id").select(
      to_json(Envelope.cell($"v", org.apache.spark.sql.types.StringType,
        touched = $"id" <= 2)).as("j")).collect().map(_.getString(0))
    assert(out(0) == """{"value":"x"}""")  // set to x
    assert(out(1) == "{}")                 // set to NULL: struct present, value absent
    assert(out(2) == null)                 // untouched: whole cell null
  }

  test("Connect schema JSON generated from the StructType (R14)") {
    val keyType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("customer_id",
        org.apache.spark.sql.types.IntegerType, nullable = true),
      org.apache.spark.sql.types.StructField("order_id",
        org.apache.spark.sql.types.IntegerType, nullable = true)))
    val js = Envelope.connectSchemaJson(keyType, optional = false, name = Some("orders.Key"))
    assert(js.contains(""""type":"struct""""))
    assert(js.contains(""""type":"int32","optional":true,"field":"customer_id""""))
    assert(js.contains(""""name":"orders.Key""""))
  }

  test("toConnectJson emits {schema,payload} records") {
    val js = Envelope.toConnectJson(
      Envelope.changeEvents(mutations, "orders", Seq("customer_id", "order_id"),
        Seq("product"), col("opcode"), col("ts"), col("seq")),
      "orders.Envelope").orderBy("offset").collect()
    val v = js.head.getAs[String]("value_json")
    assert(v.startsWith("""{"schema":{"type":"struct""""))
    assert(v.contains(""""payload":{"""))
    assert(js.head.getAs[String]("key_json") == """{"customer_id":1,"order_id":1}""")
  }
}
