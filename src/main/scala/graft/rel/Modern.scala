package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Round-4 surface widening: the Spark-4-era operator families — ordered
  * string aggregation (listagg), SQL-standard discrete percentiles,
  * bitmap-backed exact distinct counting, the VARIANT semi-structured
  * type, collation-aware grouping, interval arithmetic, map higher-order
  * transforms, and URL decomposition.
  *
  * Determinism rules are Relational.scala's: every query ends in a total
  * order, doubles go through Det rounding or exact integer/decimal paths,
  * and each oracle twin (graft.Oracle) mirrors the arithmetic literally.
  */
object Modern {

  /** `agg_listagg`: ordered string aggregation — per region, the
    * comma-joined list of its nations, ordered WITHIN GROUP by name
    * (SQL:2016 listagg; Spark 4 ships it natively). The deterministic
    * cousin of collect_list: the WITHIN GROUP order makes the output
    * hash-stable under any partitioning, which is what makes it usable
    * at scale at all (an unordered listagg is a flaky test away from
    * nondeterminism). Dim⋈dim join stays broadcast. */
  def aggListagg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.nation(spark, sfDir)
      .join(broadcast(Tables.region(spark, sfDir)),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy($"r_name")
  }

  /** `agg_percentile_disc`: SQL-standard DISCRETE percentiles (smallest
    * value whose cumulative distribution ≥ p) per group. Unlike the
    * interpolating percentile_cont (agg_percentiles), disc returns an
    * actual data value — no float arithmetic, so the output is exact and
    * needs no rounding; ties with DuckDB's quantile_disc by construction. */
  def aggPercentileDisc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25_qty"),
        expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY l_quantity)").as("p50_qty"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_quantity)").as("p95_qty"),
        expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50_price"))
      .orderBy($"l_returnflag")
  }

  /** `agg_bitmap_distinct`: EXACT distinct counting via mergeable bitmap
    * sketches — group by (key, bitmap_bucket_number(id)), OR the per-bucket
    * bit positions into a bitmap, then sum bitmap_count per key. Same
    * result as count(DISTINCT ...) (the oracle) but the partial state is a
    * fixed-size bitmap instead of a hash set of ids: at 100 TB this is the
    * difference between a bounded two-level shuffle and an Expand plan
    * carrying every distinct id to the reducer. */
  def aggBitmapDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority", expr("bitmap_bucket_number(o_custkey)").as("bucket"))
      .agg(
        expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").as("bm"),
        count(lit(1)).as("n"))
      .groupBy($"o_orderpriority")
      .agg(
        sum(expr("bitmap_count(bm)")).as("n_cust"),
        sum($"n").as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** `json_variant_ops`: the VARIANT semi-structured path (Spark 4) —
    * parse_json once, then typed variant_get extraction. Functionally the
    * json_extract twin, but the parse cost is paid once per row and every
    * downstream access is a binary-encoded field read, not a re-parse:
    * the schema-on-read shape a 100 TB JSON event lake needs. Aggregates
    * are exact integer sums. */
  def jsonVariantOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_type",
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        count($"k").as("n_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"),
        sum($"k").as("sum_k"))
      .orderBy($"event_type")
  }

  /** `string_collation_ci`: collation-aware grouping (Spark 4) — a
    * deterministically case-mangled copy of `lang` grouped under
    * UTF8_LCASE compares case-insensitively INSIDE the hash aggregate
    * (collation-aware hashing), so 'EN' and 'en' land in one group with
    * no normalizing projection. Output keys are re-collated to binary so
    * the result file carries plain strings. Oracle: the same counts from
    * grouping the clean column. */
  def stringCollationCi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        when($"doc_id" % 2 === 0, upper($"lang")).otherwise($"lang").as("lang_mixed"),
        $"n_chars")
      .groupBy(expr("collate(lang_mixed, 'UTF8_LCASE')").as("k"))
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .select(expr("collate(lower(k), 'UTF8_BINARY')").as("lang"),
        $"n_docs", $"sum_chars")
      .orderBy($"lang")
  }

  /** `ts_interval_arith`: event-time interval arithmetic — day/hour/
    * minute offsets and a mixed DAY TO HOUR interval on the ns-precision
    * event clock, projected to epoch millis (the envelope's native unit,
    * SURVEY §1.2). Pure projection: embarrassingly parallel, no shuffle. */
  def tsIntervalArith(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        unix_millis($"ts" + expr("INTERVAL '90' DAY")).as("plus_90d_ms"),
        unix_millis($"ts" - expr("INTERVAL '6' HOUR")).as("minus_6h_ms"),
        unix_millis($"ts" + expr("INTERVAL '1 12' DAY TO HOUR")).as("plus_36h_ms"),
        unix_millis($"ts" + expr("INTERVAL '30' MINUTE")).as("plus_30m_ms"))
      .orderBy($"event_id")
  }

  /** `ts_timezone_funcs`: timezone projection of the event clock —
    * `convert_timezone` into a NAMED zone (Asia/Kolkata, +05:30 since
    * 1945: the IANA lookup path is exercised while the result stays an
    * exact interval shift on any tzdb build) and an explicit-offset
    * zone (-08:00), emitted as epoch micros plus the local hour/date.
    * DST zones are deliberately OFF the hashed surface — a
    * tzdb-version divergence between engines would be the timestamp
    * twin of the sql_group_by_all float bug. Pure projection, no
    * shuffle; the local-wall-clock columns are what a partition-by-
    * local-date ingest layout keys on at 100 TB. */
  def tsTimezoneFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ntz = $"ts".cast(TimestampNTZType) // session is UTC: wall == instant
    val ist = convert_timezone(lit("UTC"), lit("Asia/Kolkata"), ntz)
    val pst = convert_timezone(lit("UTC"), lit("-08:00"), ntz)
    Tables.events(spark, sfDir)
      .filter($"event_id" % 37 === 0)
      .select(
        $"event_id",
        unix_micros(ist.cast(TimestampType)).as("ist_us"),
        hour(ist).as("ist_hour"),
        ist.cast(DateType).cast(StringType).as("ist_date"),
        unix_micros(pst.cast(TimestampType)).as("pst_us"),
        hour(pst).as("pst_hour"))
      .orderBy($"event_id")
  }

  /** `map_transform_ops`: the map higher-order family — map_filter,
    * transform_values, map_zip_with — over the per-user event-type→count
    * map (built exactly as map_type_ops does). Map layouts are
    * engine-specific, so outputs are scalars extracted from the
    * transformed maps; the oracle recomputes them map-free with FILTER
    * aggregates. */
  def mapTransformOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id")
      .agg(map_from_entries(array_sort(collect_list(struct($"event_type", $"n"))))
        .as("m"))
      .select(
        $"user_id",
        size($"m").cast(LongType).as("n_types"),
        size(map_filter($"m", (_, v) => v >= 3)).cast(LongType).as("n_hot_types"),
        coalesce(element_at(transform_values($"m", (_, v) => v * 2), "click"), lit(0L))
          .as("clicks_x2"),
        coalesce(element_at(map_zip_with($"m", $"m", (_, a, b) => a + b), "view"), lit(0L))
          .as("views_x2"))
      .orderBy($"user_id")
  }

  /** `json_nested_shred`: nested-document round trip — orders nested with
    * their lineitem array (collect_list of structs, ordered by linenumber
    * so the JSON bytes are partition-independent), serialized with
    * to_json, re-parsed with an EXPLICIT schema (never inference in the
    * engine path, SURVEY §1.2 R15), exploded back out and re-aggregated.
    * The gate proves deep shred fidelity: the oracle computes the same
    * aggregates straight from the relational tables, so any loss in the
    * nested array (element order, null handling, int/double coercion)
    * hash-mismatches. The build is one shuffle (groupBy orderkey); the
    * parse side is embarrassingly parallel — the schema-on-read shape of
    * a 100 TB JSON document lake. */
  def jsonNestedShred(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val itemSchema = ArrayType(new StructType()
      .add("ln", IntegerType).add("qty", DoubleType).add("flag", StringType))
    val docSchema = new StructType()
      .add("o", LongType).add("items", itemSchema)
    val doc = Tables.lineitem(spark, sfDir)
      .filter($"l_orderkey" < 1000)
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_list(struct(
        $"l_linenumber".as("ln"), $"l_quantity".as("qty"),
        $"l_returnflag".as("flag")))).as("items"))
      .select(to_json(struct($"l_orderkey".as("o"), $"items")).as("js"))
    doc
      .select(from_json($"js", docSchema).as("d"))
      .select($"d.o".as("o_orderkey"), explode($"d.items").as("it"))
      .groupBy($"o_orderkey")
      .agg(
        count(lit(1)).as("n_items"),
        min($"it.ln").as("first_ln"),
        round(sum($"it.qty"), 4).as("sum_qty"),
        sum(when($"it.flag" === "R", 1L).otherwise(0L)).as("n_returned"))
      .orderBy($"o_orderkey")
  }

  /** `agg_mode_freq`: deterministic mode — the most frequent order
    * priority per order status. Spark 4's `mode()` leaves ties
    * engine-defined, so this computes the count table and arg-maxes a
    * packed (count, key-rank) long instead: cnt·2^20 − dense key rank,
    * making "highest count, then alphabetically-first priority" the
    * unique winner on any engine and any partitioning. Two small hash
    * aggregates; the count table (statuses × priorities) is bounded by
    * the key-domain product, not the row count, so the final argmax is
    * effectively free at any scale. */
  def aggModeFreq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
    // key rank: priorities are '1-URGENT'..'5-LOW'; the leading digit is
    // a ready-made dense rank (cnt < 2^20·scale before the pack matters)
    val rank = $"cnt" * 1048576L - substring($"o_orderpriority", 1, 1).cast(LongType)
    counts
      .groupBy($"o_orderstatus")
      .agg(
        max_by($"o_orderpriority", rank).as("mode_priority"),
        max($"cnt").as("mode_n"),
        sum($"cnt").as("n_orders"))
      .orderBy($"o_orderstatus")
  }

  /** `url_parse_funcs`: URL decomposition — parse_url PROTOCOL/HOST/PATH
    * and keyed QUERY extraction over URLs assembled from document
    * attributes. The oracle doesn't re-parse: it recomputes each part
    * directly from the source columns, so the gate proves parse_url
    * exactly inverts the construction. */
  def urlParseFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val url = concat(lit("https://cdn.example.com/"), $"lang", lit("/doc/"),
      $"doc_id".cast(StringType), lit("?src="), $"source", lit("&v=2"))
    Tables.documents(spark, sfDir)
      .select($"doc_id", url.as("url"))
      .select(
        $"doc_id",
        parse_url($"url", lit("PROTOCOL")).as("proto"),
        parse_url($"url", lit("HOST")).as("host"),
        parse_url($"url", lit("PATH")).as("path"),
        parse_url($"url", lit("QUERY"), lit("src")).as("q_src"))
      .orderBy($"doc_id")
  }

  /** `url_canonicalize_dedup`: crawl-frontier URL canonicalization — the
    * dedup step every web-corpus pipeline runs before fetch/store.
    * Messy variants are BUILT from document attributes (mixed-case
    * scheme+host, utm_* tracking params, a fragment), then canonicalized:
    * scheme+host lowercased, utm params stripped, fragment dropped,
    * dangling '?'/'&' repaired. Docs collide on the canonical form
    * (path = doc_id mod 100), and the output is the canonical frontier:
    * one row per canonical URL with its variant count and representative
    * doc. Regexes stay in the Java∩RE2 dialect intersection (the
    * text_pii_redact rule) so the oracle applies the SAME patterns.
    * Pure projection + one hash agg: scales to any frontier size. */
  def urlCanonicalizeDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val raw = concat(
      lit("HTTPS://CDN.Example.COM/doc/"), pmod($"doc_id", lit(100)).cast(StringType),
      lit("?utm_source="), $"source", lit("&lang="), $"lang",
      lit("&utm_campaign=c"), pmod($"doc_id", lit(7)).cast(StringType),
      lit("#sec"), pmod($"doc_id", lit(5)).cast(StringType))
    val noFragment = regexp_replace(raw, "#.*$", "")
    val noUtm = regexp_replace(noFragment, "[?&]utm_[A-Za-z_]*=[^&#]*", "")
    // stripping the FIRST query param leaves "...&lang=..." — promote the
    // dangling '&' back to '?'
    val fixedQ = regexp_replace(noUtm, "^([^?]*)&", "$1?")
    val canonical = concat(
      lower(regexp_extract(fixedQ, "^([A-Za-z]+://[^/]+)", 1)),
      regexp_extract(fixedQ, "^[A-Za-z]+://[^/]+(.*)$", 1))
    Tables.documents(spark, sfDir)
      .select($"doc_id", canonical.as("canonical_url"))
      .groupBy($"canonical_url")
      .agg(count(lit(1)).as("n_variants"), min($"doc_id").as("rep_doc"))
      .orderBy($"canonical_url")
  }

  /** `xml_roundtrip`: XML (de)serialization — the third wire format next
    * to JSON (R14/R15) and CSV: order rows serialized with `to_xml`,
    * parsed back with `from_xml` under an EXPLICIT schema (never
    * inference in the engine path, same rule as from_json), fields
    * projected out. The oracle doesn't parse XML: it recomputes every
    * output column directly from the source columns, so the gate proves
    * the round trip is lossless — including the double totalprice
    * (shortest-repr decimal serialization re-parses to the identical
    * bits) and the date. Pure projection: codegen-friendly, no shuffle
    * beyond the final declared-order sort. */
  def xmlRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val xmlSchema = "status STRING, priority STRING, price DOUBLE, odate DATE"
    Tables.orders(spark, sfDir)
      .select($"o_orderkey",
        to_xml(struct(
          $"o_orderstatus".as("status"),
          $"o_orderpriority".as("priority"),
          $"o_totalprice".as("price"),
          $"o_orderdate".cast(DateType).as("odate"))).as("xml"))
      .select($"o_orderkey",
        from_xml($"xml", StructType.fromDDL(xmlSchema)).as("p"))
      .select($"o_orderkey",
        $"p.status".as("status"), $"p.priority".as("priority"),
        $"p.price".as("price"),
        // dates never appear raw in outputs (house determinism rule):
        // project to epoch days
        unix_date($"p.odate").as("odate_day"))
      .orderBy($"o_orderkey")
  }

  /** `window_range_interval`: TIME-based RANGE frame — per event, the
    * count and value sum of the same user's events in the PRECEDING
    * HOUR (frame = `RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT
    * ROW` over the event-time order). The interval frame is the one
    * window feature the integer-offset window_range_days can't express:
    * the boundary is a timestamp subtraction, not a row or integer
    * offset, and peers (exact-ts ties) share a frame on both engines by
    * RANGE semantics — so the result is deterministic without a tie
    * order. This is also the batch twin of the streaming interval join's
    * state window. Decimal value sums use the tumbling-window pattern
    * (DECIMAL(18,6) → DOUBLE → round 4). */
  def windowRangeInterval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val frame = "OVER (PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"ts", $"value")
      .select($"event_id", $"user_id",
        expr(s"count(*) $frame").as("n_last_hour"),
        expr(s"round(CAST(sum(CAST(value AS DECIMAL(18,6))) $frame AS DOUBLE), 4)")
          .as("sum_last_hour"))
      .orderBy($"event_id")
  }

  /** `window_sliding_time`: event-time SLIDING windows — `window(ts,
    * "1 hour", "15 minutes")`: each event lands in exactly 4
    * overlapping hour-long windows (duration/slide = 4; Spark aligns
    * starts to the epoch slide grid, no startTime offset), counted per
    * (window, event_type). The overlap factor is the difference from
    * `cdc_stream_tumbling`'s disjoint buckets — the shape behind any
    * "last hour, refreshed every 15 min" metric. Spark expands the
    * per-row window list BEFORE the shuffle, so the plan is one
    * generate + one hash-agg exchange keyed on (window, type): 4× the
    * aggregate input, not 4 passes — the expansion cost is the
    * operator's honest price at any scale. Integer-only aggregates
    * (count + min/max event_id) keep the twin hash-exact; the oracle
    * rebuilds the 4-window membership with an explicit 0..3 offset
    * cross join on the same µs grid. */
  def windowSlidingTime(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        min($"event_id").as("min_event_id"),
        max($"event_id").as("max_event_id"))
      .select(unix_micros($"window.start").as("win_start_us"), $"event_type",
        $"n_events", $"min_event_id", $"max_event_id")
      .orderBy($"win_start_us", $"event_type")
  }

  /** `window_funnel_steps`: ordered-step conversion funnel (the
    * MATCH_RECOGNIZE-shaped sequence question every product-analytics
    * deployment asks, expressed with what Spark has): per user, the
    * earliest `view`, the earliest `click` strictly AFTER that view,
    * and the earliest `purchase` strictly after that click — order
    * matters, which is what separates this from three independent
    * mins. Three chained full-partition window minimums share ONE
    * hash-partition exchange (no ORDER BY → no sort; each Window
    * stage's conditional min reads the previous stage's column), then
    * one per-user reduce. Funnel depth = how many steps completed, in
    * order. At 100 TB this is one shuffle of the events keyed by user
    * — state per user is three timestamps, never an event array. */
  def windowFunnelSteps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"ts")
      .withColumn("t_view",
        min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("t_click",
        min(when($"event_type" === "click" && $"ts" > $"t_view", $"ts")).over(w))
      .withColumn("t_purchase",
        min(when($"event_type" === "purchase" && $"ts" > $"t_click", $"ts")).over(w))
      .groupBy($"user_id")
      .agg(
        min($"t_view").as("tv"), min($"t_click").as("tc"), min($"t_purchase").as("tp"))
      .select($"user_id",
        unix_micros($"tv").as("view_us"),
        unix_micros($"tc").as("click_us"),
        unix_micros($"tp").as("purchase_us"),
        when($"tp".isNotNull, 3).when($"tc".isNotNull, 2)
          .when($"tv".isNotNull, 1).otherwise(0).as("funnel_depth"))
      .orderBy($"user_id")
  }

  /** `window_rolling_distinct`: trailing-7-day distinct actives (rolling
    * WAU) — the sliding-window DISTINCT that window functions cannot
    * express (a frame-bounded count_distinct isn't mergeable): each
    * (user, active-day) pair CONTRIBUTES itself to the 7 report days it
    * covers (one bounded 7× generate), duplicates collapse in a
    * (day, user) distinct, and a plain per-day count finishes — the
    * standard scale-out shape, shuffles keyed on (day, user), nothing
    * holds per-window state. Report days clipped to the observed day
    * span (integer day arithmetic on the fixed 2024-01-01 epoch). */
  def windowRollingDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val DayUs = 24L * 3600 * 1000000L
    val Epoch0 = 1704067200000000L
    val activity = Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("us"))
      // `div` truncates toward zero — and so does DuckDB's INTEGER `//`
      // (verified: -7 // 2 = -3; only the FLOAT form floors), so the two
      // engines bucket identically on pre-epoch (negative-offset) events
      // too. Do NOT "fix" this to a floor idiom: that is what diverges.
      .select($"user_id", expr(s"(us - $Epoch0) div $DayUs").as("d"))
      .distinct()
    val span = activity.agg(max($"d").as("max_d")).select($"max_d")
    activity
      .select($"user_id", explode(sequence($"d", $"d" + 6)).as("report_day"))
      .distinct()
      .crossJoin(broadcast(span))
      .filter($"report_day" <= $"max_d")
      .groupBy($"report_day")
      .agg(count(lit(1)).as("wau"))
      .orderBy($"report_day")
  }

  /** `window_retention_cohorts`: cohort retention — the
    * product-analytics staple: users are cohorted by FIRST-activity week
    * (fixed epoch 2024-01-01, integer µs week arithmetic) and each
    * (cohort, week-offset 0..4) cell reports how many cohort members
    * were active that week, as exact basis points. Join-free (r21
    * rewrite): one (user, week) distinct, the cohort week as
    * `MIN OVER (PARTITION BY user_id)` on that same frame, one
    * (cohort, offset) count-distinct, and the cohort size derived from
    * the offset-0 cell via a window max over the aggregated frame
    * (n_cohort ≡ n_active at offset 0, since w0 = min w) — every
    * shuffle is user- or cohort-keyed, nothing quadratic, and the
    * integer week/bp math is engine-exact. */
  def windowRetentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val WeekUs = 7L * 24 * 3600 * 1000000L
    val Epoch0 = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    // `div` truncates toward zero, exactly like DuckDB's INTEGER `//`
    // (verified: -7 // 2 = -3; only the float form floors) — identical
    // week buckets on both engines even for pre-epoch events
    // One corpus pass: the old shape consumed `activity` twice (cohort
    // min self-join) and `cohorts` twice (size + join) — 3 events scans.
    // The cohort week is a MIN OVER (PARTITION BY user_id) on activity
    // itself (the dedup_substring_spans window rule), and the cohort
    // SIZE needs no second pass at all: every user is active in their
    // own cohort week (w0 = min w), so n_cohort ≡ n_active at
    // week_offset 0 — a window max over the aggregated cohort frame.
    // Identical counts, identical rows.
    val wUser = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
    val wCohort = org.apache.spark.sql.expressions.Window.partitionBy($"cohort_week")
    Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("us"))
      .select($"user_id", expr(s"(us - $Epoch0) div $WeekUs").as("w"))
      .distinct()
      .withColumn("w0", min($"w").over(wUser))
      .select($"user_id", $"w0".as("cohort_week"), ($"w" - $"w0").as("week_offset"))
      .filter($"week_offset" <= 4)
      .groupBy($"cohort_week", $"week_offset")
      .agg(count_distinct($"user_id").as("n_active"))
      .withColumn("n_cohort",
        max(when($"week_offset" === 0, $"n_active")).over(wCohort))
      .select($"cohort_week", $"week_offset", $"n_cohort", $"n_active",
        expr("(n_active * 10000) div n_cohort").as("retained_bp"))
      .orderBy($"cohort_week", $"week_offset")
  }

  /** `join_interval_overlap`: interval OVERLAP join — sessions
    * (30-minute-gap `session_window`s per user, end = last event + gap)
    * joined to a literal campaign-window dimension on
    * `s.start < w.end AND w.start < s.end`, reporting per campaign the
    * overlapping session count, distinct users, and total overlap
    * microseconds (exact integer min/max arithmetic). The non-equi
    * predicate rides a BROADCAST nested loop against the 3-row dim —
    * the probe-panel pattern (constant-size build side, one streaming
    * pass over sessions), NOT an interval self-join; a fact×fact
    * overlap would use the bucketed-range decomposition
    * (`join_range_bucketed`). Completes the interval-join family:
    * containment lookup (`join_scd2_pointintime`), bucketed range
    * (`join_range_bucketed`), overlap (this). */
  def joinIntervalOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sessions = Tables.events(spark, sfDir)
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        unix_micros($"sw.start").as("s_us"), unix_micros($"sw.end").as("e_us"))
    val windows = Seq(
      (1, "2024-01-05 00:00:00", "2024-01-08 00:00:00"),
      (2, "2024-01-12 12:00:00", "2024-01-14 00:00:00"),
      (3, "2024-01-20 00:00:00", "2024-01-25 00:00:00"))
      .toDF("window_id", "ws", "we")
      .select($"window_id",
        unix_micros(to_timestamp($"ws")).as("w_start_us"),
        unix_micros(to_timestamp($"we")).as("w_end_us"))
    sessions
      .join(broadcast(windows),
        $"s_us" < $"w_end_us" && $"w_start_us" < $"e_us")
      .groupBy($"window_id", $"w_start_us", $"w_end_us")
      .agg(
        count(lit(1)).as("n_sessions"),
        count_distinct($"user_id").as("n_users"),
        sum(least($"e_us", $"w_end_us") - greatest($"s_us", $"w_start_us"))
          .as("total_overlap_us"))
      .orderBy($"window_id")
  }

  /** Grid-bucketed radius pair finder shared by [[joinRadiusGrid]] and
    * its planted-points spec: each point of the probe side expands to
    * its 3×3 cell stencil and equi-joins the build side on cell
    * coordinates, then exact integer distance² verifies. With
    * cellSize ≥ radius, two in-radius points are ≤ 1 cell apart per
    * axis, so the stencil is a COMPLETE candidate set; each qualifying
    * (a < b) pair appears exactly once (b lives in one cell, a's
    * stencil covers it once). */
  private[graft] def radiusPairs(points: DataFrame, cellSize: Int, r2: Long): DataFrame = {
    import points.sparkSession.implicits._
    val cells = points.select($"id", $"x", $"y",
      expr(s"x div $cellSize").as("cx"), expr(s"y div $cellSize").as("cy"))
    val stencil = cells
      .select($"id".as("a_id"), $"x".as("ax"), $"y".as("ay"), $"cx", $"cy",
        explode(expr(
          "transform(sequence(0, 8), i -> struct(i div 3 - 1 AS dx, i % 3 - 1 AS dy))"))
          .as("d"))
      .select($"a_id", $"ax", $"ay",
        ($"cx" + $"d.dx").as("scx"), ($"cy" + $"d.dy").as("scy"))
    stencil.join(
        cells.select($"id".as("b_id"), $"x".as("bx"), $"y".as("by"), $"cx", $"cy"),
        $"scx" === $"cx" && $"scy" === $"cy" && $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        (($"ax" - $"bx") * ($"ax" - $"bx")
          + ($"ay" - $"by") * ($"ay" - $"by")).as("dist2"))
      .filter($"dist2" <= r2)
      .orderBy($"a_id", $"b_id")
  }

  /** `join_radius_grid`: spatial RADIUS self-join via grid bucketing —
    * the 2D analogue of the LSH/banding discipline every near-dup path
    * here uses: never all-pairs; bucket by a cell whose size equals the
    * radius, equi-join each point's 3×3 stencil against the cells, and
    * verify candidates with exact integer distance². The shuffle is
    * keyed on cell coordinates; fan-out is a fixed ×9 generate; the
    * quadratic term is confined to within-cell occupancy (max 4 on
    * this fixture — at scale cell size trades occupancy against
    * stencil width, the standard spatial-join tuning). Points are a
    * deterministic quadratic-residue scatter of the 1-in-5 event slice
    * onto a 10000×10000 integer grid (affine id→coord maps were
    * rejected: consecutive ids form arithmetic-progression lattices
    * with degenerate pair structure — the quadratic mix breaks it).
    * Oracle replays the identical grid construction in SQL (the
    * graph_triangle_count convention); its pair set is proven equal to
    * the naive all-pairs join in Round9OpsSpec at the gate scale. */
  def joinRadiusGrid(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    radiusPairs(fixturePoints(spark, sfDir), 25, 625L)
  }

  /** The deterministic integer point cloud: quadratic mix mod a prime
    * (products stay < 2^63 — DuckDB BIGINT overflow would error, Spark
    * would wrap; neither is reached). */
  private[graft] def fixturePoints(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val P = 99991L
    Tables.events(spark, sfDir)
      .filter($"event_id" % 5 === 0)
      .select($"event_id".as("id"), ($"event_id" % P).as("m"))
      .select($"id",
        expr(s"(m * m * 3 + m * 7 + 11) % $P % 10000").as("x"),
        expr(s"(m * m * 5 + m * 13 + 17) % $P % 10000").as("y"))
  }

  /** `map_str_to_map`: `str_to_map` — the config/tag-string parser
    * (k:v pair lists are how crawl metadata, HTTP headers, and job
    * properties arrive as single columns): a metadata string assembled
    * from doc attributes is parsed back with explicit pair/kv
    * delimiters, keys enumerated in sorted order, values extracted
    * typed. The oracle recomputes every output from the SOURCE columns
    * — a hash match proves the parse exactly inverts the construction
    * (the `url_parse_funcs` proof pattern). */
  def mapStrToMap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select($"doc_id",
        concat(lit("lang:"), $"lang", lit(",src:"), $"source",
          lit(",len:"), length($"text")).as("cfg"))
      .select($"doc_id",
        expr("str_to_map(cfg, ',', ':')").as("m"))
      .select($"doc_id",
        concat_ws("|", array_sort(map_keys($"m"))).as("keys_sorted"),
        $"m".getItem("lang").as("lang"),
        $"m".getItem("src").as("src"),
        $"m".getItem("len").cast(IntegerType).as("text_len"),
        size($"m").as("n_keys"))
      .orderBy($"doc_id")
  }

  /** `window_session_dynamic`: DYNAMIC-GAP session windows — the
    * sessionization real products need (a purchase closes a session in
    * 15 minutes, browsing keeps it open for 45): `session_window(ts,
    * gapExpr)` takes the gap PER EVENT, so the merge rule becomes
    * "extend while the next event starts before the running max of
    * event-end = ts + its own gap" — which is exactly the running-max
    * islands formulation the oracle states (strict merge: an event AT
    * the session end starts a new session — gap windows are half-open).
    * One user-keyed exchange; the fixed-gap variants live in
    * `join_interval_overlap` (batch) and `cdc_stream_sessionize`
    * (streaming). Values 1e-4 integer-quantized for the exact sum. */
  def windowSessionDynamic(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val gap = when($"event_type" === "purchase", lit("15 minutes"))
      .otherwise(lit("45 minutes"))
    Tables.events(spark, sfDir)
      .groupBy(session_window($"ts", gap).as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(floor($"value" * 10000.0 + 0.5).cast(LongType)).as("sum_vu"))
      .select($"user_id",
        unix_micros($"sw.start").as("session_start_us"),
        unix_micros($"sw.end").as("session_end_us"),
        $"n_events", $"sum_vu")
      .orderBy($"user_id", $"session_start_us")
  }

  /** `table_transpose`: `DataFrame.transpose` (Spark 4) — the
    * report-shaping pivot that swaps rows and columns: a 3-row
    * per-status metrics frame becomes metrics-as-rows ×
    * statuses-as-columns (the layout a dashboard or spreadsheet export
    * wants). Transpose is driver-light sugar over a tiny aggregated
    * frame — the aggregate below it is the distributed work — and the
    * index column's VALUES become the output schema, so it only
    * belongs on small, bounded frames (here: 3 statuses). The oracle
    * restates the transposed table as conditional aggregates, one
    * UNION ALL branch per metric row. */
  def tableTranspose(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).cast(DoubleType).as("n_orders"),
        round(sum($"o_totalprice".cast(DecimalType(18, 4))).cast(DoubleType), 4)
          .as("sum_price"),
        min($"o_orderkey").cast(DoubleType).as("min_key"))
      .orderBy($"o_orderstatus")
      .transpose($"o_orderstatus")
      .orderBy($"key")
  }

  /** `ts_downsample_ohlc`: bucketed OHLC downsampling — the candle/
    * summary-bar shape every metrics store and financial pipeline
    * materializes when raw ticks outgrow the query layer: per
    * (user, hour), OPEN (first value in (ts, event_id) order), CLOSE
    * (last), HIGH/LOW (max/min), volume (count). First/last are
    * `min_by`/`max_by` over a `struct(ts_us, event_id)` ordering key —
    * a map-side-combinable argmin/argmax, NOT a window sort: at 100 TB
    * the difference between one partial-aggregated exchange carrying
    * 5 numbers per bucket and sorting every tick. Values are 1e-4
    * quantized (integer units) so first/last survive cross-engine
    * float formatting exactly; the oracle is the first_value/last_value
    * window twin over the identical total order. */
  def tsDownsampleOhlc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ord = struct(unix_micros($"ts").as("u"), $"event_id")
    graft.Tables.events(spark, sfDir)
      .filter($"user_id" % 50 === 0)
      .select($"user_id",
        expr("unix_micros(ts) div 3600000000").as("hour_bucket"),
        $"event_id", $"ts",
        (floor($"value" * 10000.0 + 0.5)).cast(LongType).as("vu"))
      .groupBy($"user_id", $"hour_bucket")
      .agg(
        min_by($"vu", ord).as("open_u"),
        max_by($"vu", ord).as("close_u"),
        max($"vu").as("high_u"),
        min($"vu").as("low_u"),
        count(lit(1)).as("n_ticks"))
      .orderBy($"user_id", $"hour_bucket")
  }

  /** `ts_gapfill_interpolate`: time-series resampling — densify each
    * user's value series onto a regular hourly grid and LINEARLY
    * INTERPOLATE the gaps, the gap-fill every metrics/feature pipeline
    * needs before a model can consume an irregular event stream (the
    * recursive-CTE calendar in `sql_recursive_cte` densifies; this op
    * adds the interpolation semantics). Per user: the latest event per
    * hour anchors the known points (micro-unit quantized — integer math
    * from there on), `sequence(min_h, max_h)` generates the grid, and
    * two frame windows over ONE user-keyed exchange carry each gap row
    * its previous/next anchors (`last/first(..., ignoreNulls)` over
    * unbounded-preceding / unbounded-following frames — same sort, same
    * exchange); the fill is integer `pv + (nv−pv)·(h−ph) div (nh−ph)`
    * (truncating div ≡ DuckDB integer `//`, the verified pair). Grid
    * edges are always anchored (a user's min/max hour comes from its
    * own events), so interior gaps always have both neighbours.
    * Demonstrated on the deterministic 1-in-50 user slice (the
    * `text_tfidf` slice pattern) to bound output; the plan is
    * slice-independent — one shuffle keyed by user at any cardinality,
    * generate bounded by the observed span. */
  def tsGapfillInterpolate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val HourUs = 3600L * 1000000L
    val known = Tables.events(spark, sfDir)
      .filter($"user_id" % 50 === 0)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"value")
      .withColumn("h", expr(s"us div $HourUs"))
      .groupBy($"user_id", $"h")
      .agg(max(struct($"us", $"event_id", $"value")).as("m"))
      .select($"user_id", $"h",
        expr("CAST(floor(m.value * 1000000 + 0.5) AS BIGINT)").as("vu"))
    val grid = known.groupBy($"user_id")
      .agg(min($"h").as("h0"), max($"h").as("h1"))
      .select($"user_id", explode(sequence($"h0", $"h1")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"h")
    val wPrev = w.rowsBetween(Long.MinValue, 0)
    val wNext = w.rowsBetween(0, Long.MaxValue)
    grid.join(known, Seq("user_id", "h"), "left")
      .withColumn("pv", last($"vu", ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(when($"vu".isNotNull, $"h"), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first($"vu", ignoreNulls = true).over(wNext))
      .withColumn("nh", first(when($"vu".isNotNull, $"h"), ignoreNulls = true).over(wNext))
      .select($"user_id", $"h".as("hour_bucket"),
        when($"vu".isNotNull, $"vu")
          .otherwise(expr("pv + ((nv - pv) * (h - ph)) div (nh - ph)")).as("vu_fill"),
        $"vu".isNull.as("interpolated"))
      .orderBy($"user_id", $"hour_bucket")
  }

  /** `window_gap_islands`: gaps-and-islands — the run-length view of a
    * behavior stream (consecutive same-type event runs per user): the
    * classic change-flag → running-sum island numbering, then one
    * grouped aggregate per island (bounds, length). Everything rides a
    * single `partitionBy(user_id)` exchange — the lag, the running sum,
    * and the final group-by all reuse it, so the plan is one shuffle no
    * matter how long the history; per-user state is one row. Ordering
    * ties are impossible (event_id is unique), making island numbers —
    * and the oracle hash — deterministic. */
  def windowGapIslands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val prev = lag($"event_type", 1).over(w)
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .withColumn("chg",
        when(prev.isNull || prev =!= $"event_type", 1L).otherwise(0L))
      .withColumn("island", sum($"chg").over(w))
      .groupBy($"user_id", $"island")
      .agg(
        min($"event_type").as("event_type"),
        count(lit(1)).as("n_events"),
        unix_micros(min($"ts")).as("start_us"),
        unix_micros(max($"ts")).as("end_us"))
      .select($"user_id", $"island".as("island_no"), $"event_type",
        $"n_events", $"start_us", $"end_us")
      .orderBy($"user_id", $"island_no")
  }

  /** `xml_xpath_extract`: XPath extraction over XML documents — the
    * query-side complement of xml_roundtrip's (de)serialization: scalar
    * paths (`xpath_string`/`xpath_int`) plus a repeated-element path
    * (`xpath(...)` returning the node list, counted and joined). The
    * documents are BUILT from doc attributes (corpus tokens are
    * alphanumeric, so no XML escaping hazard), and the oracle recomputes
    * every output from the source columns — proving XPath inverts the
    * construction, including multiplicity of the repeated <tok> nodes. */
  def xmlXpathExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val xmlCol = concat(
      lit("<doc><lang>"), $"lang", lit("</lang><n>"), $"n_chars", lit("</n>"),
      concat_ws("", transform(slice(split($"text", " "), 1, 3),
        t => concat(lit("<tok>"), t, lit("</tok>")))),
      lit("</doc>"))
    Tables.documents(spark, sfDir)
      .select($"doc_id", xmlCol.as("xml"))
      .select($"doc_id",
        expr("xpath_string(xml, '/doc/lang')").as("x_lang"),
        expr("xpath_int(xml, '/doc/n')").as("x_n"),
        size(expr("xpath(xml, '/doc/tok/text()')")).as("n_tok_elems"),
        array_join(expr("xpath(xml, '/doc/tok/text()')"), "|").as("toks_joined"))
      .orderBy($"doc_id")
  }

  /** `agg_approx_top_k`: mergeable top-k heavy hitters (Spark 4.1's
    * Datasketches frequent-items family) run as the 100 TB two-phase
    * shape: per-shard `approx_top_k_accumulate` partials → one
    * `approx_top_k_combine` → `approx_top_k_estimate`, exploded and
    * re-sorted under a total order. Per-shard state is a fixed-size
    * sketch, so the pre-combine shuffle moves 8 sketches, not the token
    * stream — the same partial/final layout a heavy-hitter pass over a
    * petabyte corpus needs.
    *
    * Oracle-checkable because the sketch is EXACT whenever the tracked
    * item capacity exceeds the distinct-item count (the corpus vocabulary
    * is tiny — 31 tokens — versus maxItemsTracked=1024): counts then
    * equal true counts and the explicit (cnt desc, token) re-sort makes
    * the top-20 cut deterministic on both engines. The estimate is asked
    * for every tracked item and the limit applied AFTER the re-sort, so
    * sketch-internal tie ordering can't change the result set. */
  def aggApproxTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(pmod($"doc_id", lit(8)).as("shard"),
        explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"shard")
      .agg(expr("approx_top_k_accumulate(token, 1024)").as("st"))
      .agg(expr("approx_top_k_estimate(approx_top_k_combine(st, 1024), 1024)")
        .as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as("token"), $"e.count".as("cnt"))
      .orderBy($"cnt".desc, $"token")
      .limit(20)
  }

  /** `agg_count_min_sketch`: the remaining classic mergeable frequency
    * sketch (CMS) — per-type PARTIAL sketches (`count_min_sketch`, fixed
    * seed) merged associatively, then probed for per-user event-frequency
    * estimates. The merge is the point: cells add, so partials built on
    * 1000 executors combine into exactly the sketch a single pass would
    * build — Round6OpsSpec asserts merged-estimates == single-global-
    * sketch estimates AND the one-sided CMS guarantee (estimate ≥ exact)
    * against exact per-user counts. The merge itself runs as a second
    * executor-side aggregation (`CmsMergeAgg`) — no driver collect
    * anywhere in the path; merge order doesn't matter (commutative cell
    * addition). Rows-only at the gate: estimate VALUES are
    * implementation-specific (seeded hash layout), like the HLL/top-k
    * sketches. */
  /** `agg_theta_setops`: Datasketches THETA sketches — the capability
    * HLL fundamentally lacks: set INTERSECTION and DIFFERENCE of
    * distinct sets, not just union. Two conditional sketches (clickers,
    * viewers) built in ONE pass over events, then |A|, |B|, |A∩B|,
    * |A\B| from the sketch algebra. Below the sketch's nominal capacity
    * (k = 4096 retained hashes) theta runs in EXACT mode — every test
    * scale's user cardinality (15/150/1500) is far under it, so the
    * gate hash-matches DuckDB's exact distinct counts; beyond k the
    * same plan degrades gracefully to bounded-error estimates (the
    * 100 TB regime — where exact distinct intersection would need a
    * full shuffle of both sides, the sketch needs one pass and
    * kilobytes). */
  def aggThetaSetops(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .agg(
        expr("theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)").as("ska"),
        expr("theta_sketch_agg(CASE WHEN event_type = 'view' THEN user_id END)").as("skb"))
      .select(
        expr("theta_sketch_estimate(ska)").as("n_click"),
        expr("theta_sketch_estimate(skb)").as("n_view"),
        expr("theta_sketch_estimate(theta_intersection(ska, skb))").as("n_both"),
        expr("theta_sketch_estimate(theta_difference(ska, skb))").as("n_click_only"))
  }

  def aggCountMinSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Per-type partial sketches, then the merge STAYS ON EXECUTORS: a
    // second aggregation over the sketch binaries (CmsMergeAgg) — the
    // same two-phase partial/final layout every mergeable sketch uses,
    // with zero driver participation. The probe fans the one merged
    // sketch row out over the key range with a Generate (no join, no
    // collect) and estimates in place via cms_estimate.
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
      .agg(graft.functions.CmsFunctions.cms_merge($"sk").as("sk"))
      .select(explode(sequence(lit(0L), lit(19L))).as("user_id"), $"sk")
      .select($"user_id",
        graft.functions.CmsFunctions.cms_estimate($"sk", $"user_id").as("cms_est"))
      .orderBy($"user_id")
  }

  /** `ts_calendar_features`: the calendar feature family every
    * partition-by-date pipeline derives before bucketing — ISO weekday,
    * ISO week-of-year, quarter, weekend flag — then the seasonal
    * rollup over (year, quarter, weekend). Cross-engine trap this query
    * exists to pin: Spark's `dayofweek` is 1=Sunday while DuckDB's
    * `dayofweek` is 0=Sunday — the ISO pair (`weekday` ≡ `isodow`−1,
    * Monday-based) is the only alignment that hashes identically, and
    * `weekofyear` is ISO in both (Jan 1 1995 → week 52). One scan,
    * bounded output, map-side combinable. */
  def tsCalendarFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wd = expr("weekday(o_orderdate)")
    Tables.orders(spark, sfDir)
      .select(
        $"o_orderkey", $"o_totalprice",
        year($"o_orderdate").as("o_year"),
        quarter($"o_orderdate").as("o_quarter"),
        weekofyear($"o_orderdate").as("iso_week"),
        wd.as("iso_weekday"),
        (wd >= 5).cast(IntegerType).as("is_weekend"))
      .groupBy($"o_year", $"o_quarter", $"is_weekend")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct($"iso_week").as("n_weeks"),
        min($"iso_weekday").as("min_wd"),
        max($"iso_weekday").as("max_wd"),
        round(sum($"o_totalprice".cast(DecimalType(18, 4))).cast(DoubleType), 4)
          .as("sum_price"))
      .orderBy($"o_year", $"o_quarter", $"is_weekend")
  }

  /** `agg_map_collect`: rows → MAP aggregation — each user's event-type
    * mix collected into one map column (`map_from_entries` over a sorted
    * struct list), the inverse of `map_explode_entries`. The map is
    * emitted through `to_json` because a map's physical layout is
    * engine-specific but its sorted-key JSON rendering is canonical —
    * the same hash-surface trick as the VARIANT queries. Two map-side
    * combinable aggregates; the collect_list is bounded by the
    * event-type cardinality (5), not the event count. */
  def aggMapCollect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"user_id")
      .agg(map_from_entries(array_sort(collect_list(struct($"event_type", $"cnt"))))
        .as("m"))
      .select($"user_id", size($"m").as("n_types"),
        to_json($"m").as("type_counts_json"))
      .orderBy($"user_id")
  }

  /** `window_rolling_zscore`: rolling anomaly score — each event's value
    * standardized against its user's trailing 7-event frame (sample
    * std from EXACT decimal frame sums, the window twin of the
    * agg_regression moment trick), with the outlier flag taken on the
    * QUANTIZED z so both engines gate the same value. The telemetry
    * anomaly pass every ingest pipeline runs; frame state is two sums +
    * a count per row, and the single exchange is the per-user sort. */
  def windowRollingZscore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-6, 0)
    val sx = sum($"value".cast(DecimalType(18, 6))).over(w).cast(DoubleType)
    val sxx = sum(($"value" * $"value").cast(DecimalType(28, 8))).over(w)
      .cast(DecimalType(28, 4)).cast(DoubleType)
    val n = count(lit(1)).over(w).cast(DoubleType)
    val varOk = (n * sxx - sx * sx) > 0.0 && n >= 3.0
    val z = ($"value" - sx / n) /
      sqrt((n * sxx - sx * sx) / (n * (n - lit(1.0))))
    val zq = graft.Det.r4s(z)
    graft.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"ts", $"value",
        count(lit(1)).over(w).as("n_frame"),
        when(varOk, zq).as("z"),
        when(varOk, (abs(zq) > 2.0).cast(IntegerType)).otherwise(0)
          .as("is_outlier"))
      .select($"event_id", $"user_id", $"n_frame", $"z", $"is_outlier")
      .orderBy($"event_id")
  }

  /** `window_drawdown`: running-peak drawdown per user — the
    * peak-to-current decline every monitoring/financial series tracks
    * (how far below its historical max is this reading?). Running max is
    * an exact element pick over the expanding frame (no float
    * accumulation), the drawdown ratio is one IEEE division quantized
    * signed HALF_UP, and the flag marks NEW PEAKS (drawdown 0 ⇔ the
    * reading is its own running max). Same single per-user exchange as
    * the other rolling-window queries. */
  def windowDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val peak = max($"value").over(w)
    graft.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"value",
        graft.Det.r4(peak).as("running_peak"),
        graft.Det.r4s($"value" / peak - lit(1.0)).as("drawdown"),
        ($"value" === peak).cast(IntegerType).as("is_new_peak"))
      .select($"event_id", $"user_id", $"running_peak", $"drawdown",
        $"is_new_peak")
      .orderBy($"event_id")
  }

  /** `window_rolling_median`: exact rolling median over the trailing
    * 5-event frame — the robust smoother next to `window_moving_avg`'s
    * mean (one fat-fingered reading skews a mean for 4 frames; the
    * median shrugs). Spark has no frame-median, so the frame is
    * collected (bounded: ≤5 values) and the LOWER median picked by
    * index — which is exactly DuckDB's `quantile_disc(0.5)` convention,
    * making the twin an element pick on both sides, no interpolation
    * arithmetic to diverge. */
  def windowRollingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-4, 0)
    graft.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id",
        sort_array(collect_list($"value").over(w)).as("frame"))
      .select($"event_id", $"user_id",
        size($"frame").as("n_frame"),
        round(expr("element_at(frame, CAST((size(frame) + 1) DIV 2 AS INT))"), 4)
          .as("rolling_median"))
      .orderBy($"event_id")
  }

  /** `window_ratio_to_report`: each order's share of its customer's
    * lifetime spend, plus the running cumulative share along the order
    * history — the SQL ratio-to-report analytic (Oracle's
    * `RATIO_TO_REPORT`), the per-entity Pareto curve behind "the top 3
    * orders explain 80% of this account" reporting. ONE exchange on
    * `o_custkey` serves BOTH frames (the full-partition total and the
    * expanding cumsum share the partition key, so Spark plans a single
    * window exchange); the sums are exact DECIMAL(18,4) — order-free
    * under any partitioning — and only the final two ratios touch IEEE,
    * through the shared HALF_UP quantize, so the oracle mirrors the
    * arithmetic literally. At 100 TB this is the canonical "window over
    * the natural entity key" plan: per-customer partitions are bounded,
    * no global sort, no skew (order counts per customer are ~uniform). */
  def windowRatioToReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val part = Window.partitionBy($"o_custkey")
    val cum = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, 0)
    val p = $"o_totalprice".cast(DecimalType(18, 4))
    val tot = sum(p).over(part).cast(DoubleType)
    Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey",
        graft.Det.r4($"o_totalprice".cast(DoubleType) / tot).as("share"),
        graft.Det.r4(sum(p).over(cum).cast(DoubleType) / tot).as("cum_share"))
      .orderBy($"o_custkey", $"o_orderkey")
  }
}
