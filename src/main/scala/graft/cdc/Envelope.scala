package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Debezium-style change-event envelope — the reference's "row type"
  * (rpk_topic_consume.json:3-4, README.md:224):
  *
  *   Key   = struct { pk columns }
  *   Value = struct { source, before, after, op, ts_ms, transaction }
  *
  * Load-bearing semantics reproduced here (SURVEY.md §1.2):
  *  1. Cell wrapping: non-key columns are `struct{value}` so that
  *     null-struct ("column untouched") != struct-of-null ("set to NULL").
  *  2. before = null (Scylla CDC has no pre-image, even for op="u" —
  *     rpk_topic_consume.json:49-56).
  *  3. after = null for deletes (op="d", README.md:166).
  *  4. Dual event-time clocks: source.ts_ms (millis) + source.ts_us
  *     (micros) are independent fields, not derivable from each other.
  *  5. Connect-JSON serialization with an embedded schema half
  *     (`{schema, payload}`, connect-standalone.properties:2-3): Spark's
  *     to_json emits only the payload, so the constant schema half is
  *     generated once from the StructType (R14).
  */
object Envelope {
  val Namespace = "GraftNamespace"
  val Keyspace  = "graft_keyspace"

  /** Cell wrapper: `struct{value}` when the column was touched, null-struct
    * otherwise (3-state null logic, SURVEY.md §1.2.1). */
  def cell(c: Column, dt: DataType, touched: Column): Column = {
    val cellType = StructType(Seq(StructField("value", dt, nullable = true)))
    when(touched, struct(c.as("value"))).otherwise(lit(null).cast(cellType))
  }

  /** The `source` block (rpk_topic_consume.json:4): connector metadata +
    * dual-precision event time. */
  def sourceStruct(tableName: String, ts: Column): Column =
    struct(
      lit("1.0.0").as("version"),
      lit("graft-spark-cdc").as("connector"),
      lit(Namespace).as("name"),
      unix_millis(ts).as("ts_ms"),
      lit("false").as("snapshot"),
      lit(Keyspace).as("db"),
      lit(Keyspace).as("keyspace_name"),
      lit(tableName).as("table_name"),
      unix_micros(ts).as("ts_us"))

  /** Full change-event build over an arbitrary keyed input:
    * key struct, envelope struct, topic, offset. `op` must be one of
    * c/u/d; for "d" the after-image is nulled (R6). */
  def changeEvents(
      df: DataFrame,
      tableName: String,
      keyCols: Seq[String],
      valueCols: Seq[String],
      op: Column,
      ts: Column,
      offset: Column): DataFrame = {
    val key = struct(keyCols.map(col): _*).as("key")
    val afterType = StructType(
      keyCols.map(k => StructField(k, df.schema(k).dataType, nullable = true)) ++
        valueCols.map(v => StructField(v,
          StructType(Seq(StructField("value", df.schema(v).dataType, nullable = true))),
          nullable = true)))
    val afterStruct = struct(
      keyCols.map(col) ++
        valueCols.map(v => struct(col(v).as("value")).as(v)): _*)
    val after = when(op === "d", lit(null).cast(afterType)).otherwise(afterStruct)
    val value = struct(
      sourceStruct(tableName, ts).as("source"),
      lit(null).cast(afterType).as("before"),   // no pre-image (SURVEY.md §1.2.2)
      after.as("after"),
      op.as("op"),
      unix_millis(current_timestamp()).as("ts_ms"))
    df.select(
      key,
      value.as("value"),
      concat_ws(".", lit(Namespace), lit(Keyspace), lit(tableName)).as("topic"),
      offset.as("offset"))
  }

  /** Kafka-Connect JSON schema for a Spark DataType — the constant `schema`
    * half of the `{schema, payload}` records the JsonConverter emits when
    * `schemas.enable=true` (connector.properties:3-4, README.md:186-204).
    * Deterministic field order = StructType field order. */
  def connectSchemaJson(dt: DataType, optional: Boolean = false,
      name: Option[String] = None, field: Option[String] = None): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    }
    val typ = dt match {
      case _: StructType                 => "struct"
      case IntegerType                   => "int32"
      case LongType                      => "int64"
      case StringType                    => "string"
      case DoubleType                    => "float64"
      case FloatType                     => "float"
      case BooleanType                   => "boolean"
      case ShortType                     => "int16"
      case ByteType                      => "int8"
      case BinaryType                    => "bytes"
      case TimestampType                 => "int64"
      case other => throw new IllegalArgumentException(s"no Connect mapping for $other")
    }
    val fields = dt match {
      case st: StructType =>
        Some(st.fields.map(f =>
          connectSchemaJson(f.dataType, f.nullable, None, Some(f.name))).mkString("[", ",", "]"))
      case _ => None
    }
    val parts = Seq(s""""type":"$typ"""") ++
      fields.map(f => s""""fields":$f""") ++
      Seq(s""""optional":$optional""") ++
      name.map(n => s""""name":"${esc(n)}"""") ++
      field.map(f => s""""field":"${esc(f)}"""")
    parts.mkString("{", ",", "}")
  }

  /** Serialize change events as Connect-style `{schema, payload}` JSON
    * strings (R14/R15): payload via to_json, schema as a literal column
    * generated once from the value StructType. */
  def toConnectJson(events: DataFrame, valueSchemaName: String): DataFrame = {
    val valueType = events.schema("value").dataType.asInstanceOf[StructType]
    val schemaLit = connectSchemaJson(valueType, optional = false, name = Some(valueSchemaName))
    events.select(
      to_json(col("key")).as("key_json"),
      concat(lit(s"""{"schema":$schemaLit,"payload":"""),
        to_json(col("value")), lit("}")).as("value_json"),
      col("topic"), col("offset"))
  }

  /** The declared `cdc_envelope_build` query: envelope over `events`
    * with user_id as key, Cell-wrapped non-key columns. Both key and
    * after-image go through a full serialize→parse ROUNDTRIP (to_json →
    * from_json under the builder's own StructType — R14/R15) and the
    * query emits the PARSED scalar fields, not the JSON text: JSON field
    * order is engine-specific, so hashing the string could never be
    * oracle-gated, while the parsed fields are plain columns DuckDB
    * recomputes directly from `events` — making this the last Group-A op
    * with a full DuckDB gate. A wrong Cell wrapping, op rule, dropped
    * after-null, or lossy serialization all surface as a hash mismatch. */
  def envelopeBuild(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val built = changeEvents(
      ev, tableName = "events",
      keyCols = Seq("user_id"),
      valueCols = Seq("event_type", "value"),
      op = Changelog.opCol($"event_type"),
      ts = $"ts",
      offset = $"event_id")
    val keyType = built.schema("key").dataType
    val afterType = built.schema("value").dataType
      .asInstanceOf[StructType]("after").dataType
    built
      .select(
        from_json(to_json($"key"), keyType).as("k"),
        $"value.source.ts_us".as("ts_us"),
        $"value.op".as("op"),
        // to_json(null struct) = null string → from_json = null struct,
        // so the delete-path after=null survives the roundtrip
        from_json(to_json($"value.after"), afterType).as("a"),
        $"value.after".isNull.cast("int").as("after_is_null"),
        $"value.before".isNull.cast("int").as("before_is_null"),
        $"topic", $"offset")
      .select(
        $"k.user_id".as("key_user_id"),
        $"ts_us", $"op",
        $"a.user_id".as("after_user_id"),
        $"a.event_type.value".as("after_event_type"),
        $"a.value.value".as("after_value"),
        $"after_is_null", $"before_is_null", $"topic", $"offset")
      .orderBy($"offset")
  }

  /** `cdc_envelope_evolution`: schema evolution across producer
    * generations — the contract every long-lived CDC topic eventually
    * tests: a v2 connector adds a column, and the consumer must read the
    * MIXED stream (old records without the field, new records with it)
    * under the latest schema, with absent-field → NULL. Modeled by
    * serializing even-id events with the v1 payload schema and odd-id
    * events with v2 (adds `value`), then parsing ALL records with the v2
    * read schema (`from_json` is explicit — schema-on-read, never
    * inference). The oracle recomputes the expected nulls directly from
    * the split rule, so the gate proves the missing-field semantics.
    * Pure projection both ways; the evolved schema costs nothing at any
    * scale. */
  def envelopeEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sfDir)
    val v1 = ev.filter($"event_id" % 2 === 0)
      .select(to_json(struct($"event_id", $"user_id",
        unix_micros($"ts").as("ts_us"))).as("j"))
    val v2 = ev.filter($"event_id" % 2 === 1)
      .select(to_json(struct($"event_id", $"user_id",
        unix_micros($"ts").as("ts_us"), $"value")).as("j"))
    val readSchema = StructType.fromDDL(
      "event_id BIGINT, user_id BIGINT, ts_us BIGINT, value DOUBLE")
    v1.union(v2)
      .select(from_json($"j", readSchema).as("p"))
      .select($"p.event_id", $"p.user_id", $"p.ts_us", $"p.value",
        when($"p.event_id" % 2 === 0, 1).otherwise(2)
          .cast("int").as("schema_gen"))
      .orderBy($"p.event_id")
  }
}
