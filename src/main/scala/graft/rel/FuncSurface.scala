package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Scalar/aggregate function surface widening (round 3): regression
  * aggregates, null-safety scalars, timestamp formatting, array ops.
  * Determinism per Relational.scala rules (decimal moments, Det.r4,
  * total order).
  */
object FuncSurface {

  /** `agg_regression`: least-squares slope/intercept/r² of extendedprice
    * (in thousands) on quantity, per returnflag — the regr_slope/
    * regr_intercept/regr_r2 family computed from EXACT decimal moments
    * (Σx, Σy, Σxy, Σx², Σy², n) instead of Spark's streaming double
    * accumulators: the moments are partial+final mergeable in one grouped
    * pass (same shuffle shape as regr_*), but bit-stable across partition
    * orders AND engines, which the floating accumulators are not.
    * Price is scaled to thousands so every decimal sum stays below 2^53
    * unscaled at bench scale (the Oracle.scala conversion-divergence
    * bound); the final arithmetic is identical IEEE double on both sides. */
  def aggRegression(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val x = $"l_quantity"
    val y = $"l_extendedprice" / lit(1000.0)
    val m = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x.cast(DecimalType(18, 4))).cast(DoubleType).as("sx"),
        sum(y.cast(DecimalType(18, 6))).cast(DoubleType).as("sy"),
        sum((x * y).cast(DecimalType(28, 8))).cast(DecimalType(28, 4)).cast(DoubleType).as("sxy"),
        sum((x * x).cast(DecimalType(28, 8))).cast(DecimalType(28, 4)).cast(DoubleType).as("sxx"),
        sum((y * y).cast(DecimalType(28, 8))).cast(DecimalType(28, 4)).cast(DoubleType).as("syy"))
    val n = $"n".cast(DoubleType)
    val covn  = n * $"sxy" - $"sx" * $"sy"   // n·cov
    val varxn = n * $"sxx" - $"sx" * $"sx"   // n·var(x)
    val varyn = n * $"syy" - $"sy" * $"sy"
    m.select(
        $"l_returnflag", $"n",
        graft.Det.r4s(covn / varxn).as("slope"),
        graft.Det.r4s(($"sy" - (covn / varxn) * $"sx") / n).as("intercept"),
        graft.Det.r4((covn * covn) / (varxn * varyn)).as("r2"))
      .orderBy($"l_returnflag")
  }

  /** `cond_null_funcs`: the null-safety scalar family — try_divide
    * (ANSI-safe division-by-zero → null), nullif, coalesce, greatest/
    * least — in one projection. At 100 TB these are what keep one dirty
    * row from killing a job (same rationale as try_cast in json_extract). */
  def condNullFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .select(
        $"p_partkey",
        // p_size = 5 → divide by zero → null (not an exception, not inf)
        graft.Det.r4s(coalesce(try_divide($"p_retailprice", ($"p_size" - 5).cast(DoubleType)),
          lit(-1.0))).as("price_per_size"),
        expr("nullif(p_size, 10)").as("size_or_null"),
        greatest(least($"p_size", lit(40)), lit(5)).as("size_clamped"),
        coalesce(expr("nullif(p_brand, 'Brand#1')"), $"p_type").as("brand_or_type"))
      .orderBy($"p_partkey")
  }

  /** `ts_format_funcs`: timestamp→string formatting and clock-field
    * extraction on the event stream (the reference's three-clock envelope
    * makes these the everyday projections: README.md ts_ms/ts_us). */
  def tsFormatFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        date_format($"ts", "yyyy-MM-dd").as("day_str"),
        date_format($"ts", "yyyy-MM").as("month_str"),
        hour($"ts").as("h"),
        minute($"ts").as("m"),
        second($"ts").as("s"),
        unix_timestamp($"ts").as("epoch_s"))
      .orderBy($"event_id")
  }

  /** `string_pad_funcs`: the padding/slicing string family — lpad/rpad,
    * left/right, split_part, translate, repeat, reverse — one codegen'd
    * projection, no shuffle. */
  def stringPadFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .select(
        $"p_partkey",
        lpad($"p_brand", 12, "*").as("brand_lpad"),
        rpad($"p_type", 10, ".").as("type_rpad"),
        expr("left(p_name, 4)").as("name_left"),
        expr("right(p_name, 3)").as("name_right"),
        expr("split_part(p_name, ' ', 1)").as("first_word"),
        translate($"p_type", "AEO", "aeo").as("type_translated"),
        repeat($"p_brand", 2).as("brand_twice"),
        reverse($"p_name").as("name_rev"))
      .orderBy($"p_partkey")
  }

  /** `string_mask_funcs`: the data-masking string family — `mask` with
    * its default classes (upper→'X', lower→'x', digit→'n', other kept)
    * and with custom replacement chars per class, plus positional
    * redaction via a substring splice (the OVERLAY shape; DuckDB has no
    * overlay, so the twin states the same splice). The phone is
    * synthesized from key columns (the build-from-columns fixture
    * idiom — the corpus ships no PII column) with `format_string`,
    * whose %0Nd padding is the same printf contract on both engines.
    * Pure per-row codegen projection — no shuffle, trivially parallel;
    * complements text_pii_redact (regex FINDING) with class masking
    * (structure-preserving TRANSFORMATION). */
  def stringMaskFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val phone = format_string("%02d-%03d-%04d",
      $"c_nationkey", $"c_custkey" % 1000, $"c_custkey" % 10000)
    Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name", phone.as("phone"))
      .select(
        $"c_custkey",
        mask($"c_name").as("name_masked"),
        mask($"phone", lit("A"), lit("a"), lit("0"), lit("#")).as("phone_masked"),
        concat(substring($"phone", 1, 3), lit("***"), substring($"phone", 7, 5))
          .as("phone_redact"))
      .orderBy($"c_custkey")
  }

  /** `window_moving_avg`: ROWS-frame sliding mean — each order's price
    * averaged with the customer's previous three orders (frame pinned by
    * a (date, orderkey) total order; decimal sum / frame count so the
    * mean is exact). Complements window_range_days' RANGE frame. */
  def windowMovingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(-3, 0)
    Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("mov_avg", graft.Det.r4(
        sum($"o_totalprice".cast(DecimalType(18, 4))).over(w).cast(DoubleType) /
          count(lit(1)).over(w).cast(DoubleType)))
      .select($"o_custkey", $"o_orderkey", $"mov_avg")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** `agg_count_distinct_multi`: several DISTINCT aggregates in one
    * grouped pass — Catalyst plans this with Expand (one row replicated
    * per distinct column, then de-dup per group), the multi-distinct
    * shape every SQL engine needs. */
  def aggCountDistinctMulti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .groupBy($"c_mktsegment")
      .agg(
        countDistinct($"c_nationkey").as("n_nations"),
        countDistinct(floor($"c_acctbal" / 1000.0)).as("n_bal_buckets"),
        count(lit(1)).as("n_cust"))
      .orderBy($"c_mktsegment")
  }

  /** `table_profile_stats`: ANALYZE-style column profiling — null count,
    * exact distinct count, min/max per profiled column, all in ONE pass
    * over the table (the melt-then-group shape: each row contributes one
    * (column, value) pair per profiled column). The engine-side answer
    * to "what does this table look like" before planning a 100 TB job;
    * at scale the exact distinct swaps for approx_count_distinct, same
    * plan shape. */
  def tableProfileStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.orders(spark, sfDir)
    val profiled = Seq("o_orderstatus", "o_orderpriority")
    val melted = li.select(
      explode(array(profiled.map(c =>
        struct(lit(c).as("col_name"), col(c).cast(StringType).as("v"))): _*)).as("p"))
      .select($"p.col_name", $"p.v")
    melted.groupBy($"col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"v".isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct($"v").as("n_distinct"),
        min($"v").as("min_v"),
        max($"v").as("max_v"))
      .orderBy($"col_name")
  }

  /** `table_observe_metrics`: `Dataset.observe` — data-quality metrics
    * collected DURING a pass, not by a second scan. The lineitem scan
    * runs once (here driven by a noop write, in production by the real
    * output write); the observation rides it as an AggregatingAccumulator
    * and delivers row count, decimal-exact quantity sum, and shipdate
    * bounds when the action completes. At 100 TB this is the only
    * affordable way to know what a job actually wrote — the QC aggregate
    * costs zero extra jobs and zero extra reads. The oracle computes the
    * same aggregate with a plain scan, proving observation ≡ aggregation.
    * A fresh Observation per call: instances are single-use. */
  def tableObserveMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation()
    Tables.lineitem(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
        unix_millis(min($"l_shipdate").cast(TimestampType)).as("min_ship_ms"),
        unix_millis(max($"l_shipdate").cast(TimestampType)).as("max_ship_ms"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    Seq((m("n_rows").asInstanceOf[Long], m("sum_qty").asInstanceOf[Double],
      m("min_ship_ms").asInstanceOf[Long], m("max_ship_ms").asInstanceOf[Long]))
      .toDF("n_rows", "sum_qty", "min_ship_ms", "max_ship_ms")
  }

  /** `join_full_outer`: FULL OUTER join of two independently aggregated
    * monthly series — order counts vs. shipment counts per month; months
    * present in either side survive with the other side null-filled
    * (then coalesced to 0). The full-outer sort-merge path is its own
    * physical join shape, distinct from the left/semi/anti family. */
  def joinFullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ordered = Tables.orders(spark, sfDir)
      .groupBy(date_trunc("month", $"o_orderdate").as("om"))
      .agg(count(lit(1)).as("n_orders"))
    val shipped = Tables.lineitem(spark, sfDir)
      .groupBy(date_trunc("month", $"l_shipdate").as("sm"))
      .agg(count(lit(1)).as("n_ship_lines"))
    ordered.join(shipped, $"om" === $"sm", "full_outer")
      .select(
        unix_millis(coalesce($"om", $"sm")).as("month_ms"),
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"n_ship_lines", lit(0L)).as("n_ship_lines"))
      .orderBy($"month_ms")
  }

  /** `set_ops_all`: bag-semantics set operations — EXCEPT ALL keeps
    * multiplicity (a key appearing 3 times minus 1 occurrence survives
    * twice), INTERSECT ALL keeps the min multiplicity. Distinct plan
    * machinery from the DISTINCT-semantics set_ops (no dedup pass);
    * projected to per-key counts so the output has a stable total order. */
  def setOpsAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val building = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_nationkey")
    val machinery = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment" === "MACHINERY").select($"c_nationkey")
    val exceptAll = building.exceptAll(machinery)
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
    val intersectAll = building.intersectAll(machinery)
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
    exceptAll.unionByName(intersectAll)
      .select($"op", $"c_nationkey", $"n")
      .orderBy($"op", $"c_nationkey")
  }

  /** `math_extended_funcs`: the exact-math scalar family — ceil/floor,
    * sign, pmod (non-negative modulus, unlike %), sqrt (IEEE 754
    * correctly-rounded, so cross-engine safe — unlike exp/log10/cbrt
    * which libms round differently and are deliberately excluded from
    * oracle-checked outputs). */
  def mathExtendedFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .select(
        $"c_custkey",
        ceil($"c_acctbal").cast(LongType).as("bal_ceil"),
        floor($"c_acctbal").cast(LongType).as("bal_floor"),
        signum($"c_acctbal").cast(IntegerType).as("bal_sign"),
        pmod($"c_custkey", lit(7)).as("key_mod7"),
        graft.Det.r4(sqrt(abs($"c_acctbal"))).as("bal_sqrt"))
      .orderBy($"c_custkey")
  }

  /** `join_right_outer`: the RIGHT OUTER physical path — urgent orders
    * right-joined to customers so every customer survives (zero-filled
    * count). Semantically the mirror of a left join; declared because
    * the planner's RightOuter build/stream side selection is its own
    * code path an engine must get right. */
  def joinRightOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey", $"o_orderkey")
      .join(Tables.customer(spark, sfDir).select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "right_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_urgent"))
      .orderBy($"c_custkey")
  }

  /** `csv_line_roundtrip`: CSV (de)serialization surface next to the JSON
    * round-trip — struct → to_csv line → from_csv(explicit schema) →
    * fields. Integer/string fields only: float formatting is
    * engine-specific, ids and enums are not. */
  def csvLineRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type")
      .withColumn("line", to_csv(struct($"event_id", $"user_id", $"event_type")))
      .withColumn("rt", from_csv($"line",
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, user_id BIGINT, event_type STRING"),
        Map.empty[String, String]))
      .select($"event_id", $"line",
        $"rt.user_id".as("rt_user_id"),
        $"rt.event_type".as("rt_event_type"))
      .orderBy($"event_id")
  }

  /** `binary_codec_funcs`: binary transport codecs — UTF-8 encode,
    * base64 both ways, byte lengths proving a lossless round-trip. */
  def binaryCodecFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val payload = encode($"text", "UTF-8")
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        // Spark's base64 MIME-chunks long output at 76 chars (legacy
        // behavior, conf-dependent); strip the line breaks so the value
        // is the canonical unchunked encoding on any session config
        regexp_replace(base64(payload), "[\r\n]", "").as("b64"),
        octet_length(payload).as("byte_len"),
        octet_length(unbase64(base64(payload))).as("rt_byte_len"))
      .orderBy($"doc_id")
  }

  /** `map_explode_entries`: the Generate-over-map path — a per-user
    * event-type→count map built by aggregation, then exploded BACK to
    * (user, key, value) rows. Map build + map explode round-trips the
    * grouped counts, which is exactly what the oracle recomputes
    * map-free; the declared point is the map-typed Generate, the last
    * generator variant next to array explode/posexplode. */
  def mapExplodeEntries(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id")
      .agg(map_from_entries(collect_list(struct($"event_type", $"n"))).as("m"))
      .select($"user_id", explode($"m").as(Seq("etype", "n_events")))
      .orderBy($"user_id", $"etype")
  }

  /** `array_basic_ops`: the array-function family over the embedding
    * column — size/distinct/min/max/slice-sum, plus set ops against a
    * constant token array on documents is covered in TextOps; here the
    * numeric side. Float elements are cast to double before arithmetic
    * (float→double is exact) so both engines sum identically. max/min
    * ride the FLOAT array directly (cast after — monotone and exact, so
    * value-identical) and the head-4 sum casts INSIDE its fold lambda:
    * no shared transform(cast) alias, so nothing for the optimizer to
    * inline N× into one Project (the r11-extended PlanAudit rule). */
  def arrayBasicOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // raw scans in one projection, signed rounding in the NEXT: Det.r4s
    // references its input twice (signum + abs), and applied directly it
    // would duplicate the fold lambda inside a single Project. Across a
    // projection boundary CollapseProject keeps the non-cheap producer
    // un-inlined when referenced more than once (SPARK-36718), so each
    // array is scanned exactly once.
    Tables.embeddings(spark, sfDir)
      .select(
        $"vec_id",
        size($"embedding").as("n_dims"),
        size(array_distinct($"embedding")).as("n_distinct"),
        array_max($"embedding").cast(DoubleType).as("max_raw"),
        array_min($"embedding").cast(DoubleType).as("min_raw"),
        aggregate(slice($"embedding", 1, 4), lit(0.0),
          (acc, v) => acc + v.cast(DoubleType)).as("head4_raw"))
      .select($"vec_id", $"n_dims", $"n_distinct",
        graft.Det.r4s($"max_raw").as("max_v"),
        graft.Det.r4s($"min_raw").as("min_v"),
        graft.Det.r4s($"head4_raw").as("head4_sum"))
      .orderBy($"vec_id")
  }

  /** `array_edit_ops`: the array EDITING family on token arrays —
    * flatten (nested→flat), element removal, position lookup,
    * replication, and set-intersection against a constant stopword
    * array. Twins chosen for the Spark∩DuckDB semantics intersection:
    * array_position's 0-for-missing maps to coalesce(list_position, 0),
    * and the intersect count is expressed as a membership filter on the
    * distinct set (identical semantics, no engine-specific list_intersect
    * ordering). All pure projections — codegen row-at-a-time, no
    * shuffle before the declared-order sort. */
  def arrayEditOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = split($"text", " ")
    val stop = array(lit("the"), lit("a"), lit("of"), lit("and"), lit("is"))
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        size(flatten(array(slice(toks, 1, 2), slice(toks, 3, 2)))).as("n_flat"),
        size(array_remove(toks, "the")).as("n_no_the"),
        array_position(toks, "the").as("pos_the"),
        concat_ws(",", array_repeat($"lang", 3)).as("lang3"),
        size(array_intersect(array_distinct(toks), stop)).as("n_stop_distinct"))
      .orderBy($"doc_id")
  }

  /** `agg_try_arith`: the error-safe arithmetic family (ANSI-mode
    * insurance): try_sum/try_avg aggregates plus try_add/try_multiply
    * scalars over lineitem money columns. On clean in-range data every
    * try_* is value-identical to its plain counterpart — which is
    * exactly what the oracle twin asserts (the plain expressions with
    * the same DECIMAL casts); under real overflow they return NULL
    * instead of failing the 100 TB job five hours in. Completes the
    * family started by cond_null_funcs' try_divide. */
  def aggTryArith(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        round(try_sum($"l_extendedprice".cast(DecimalType(18, 4))).cast(DoubleType), 4)
          .as("try_sum_price"),
        round(try_avg($"l_extendedprice".cast(DecimalType(18, 4))).cast(DoubleType), 4)
          .as("try_avg_price"),
        try_add(max($"l_quantity").cast(LongType), lit(1L)).as("try_add_maxq"),
        try_multiply(count(lit(1)), lit(2L)).as("try_double_count"))
      .orderBy($"l_returnflag")
  }

  /** `array_hof_ops`: the higher-order lambda family over the embedding
    * column — `filter` (positive-count), `exists`/`forall` (predicate
    * folds), and three-arg `aggregate` with a finish lambda (L2 norm in
    * one pass). Float elements cast to double first (exact), sums fold
    * left-to-right identically on both engines, and the norm goes
    * through Det rounding — same determinism story as array_basic_ops.
    * (These lambdas are CodegenFallback — fine for a per-row 64-element
    * projection; the HOT dedup/vector paths use the custom codegen
    * expressions in graft.functions instead, per SURVEY §2.3.) The
    * float→double cast lives INSIDE each predicate/fold — four DISTINCT
    * lambdas over the raw column, not four copies of a shared
    * transform(cast) alias (the r11-extended PlanAudit rule), and each
    * column now scans the array once with no intermediate array. */
  def arrayHofOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, sfDir)
      .select(
        $"vec_id",
        size(filter($"embedding", v => v.cast(DoubleType) > lit(0.0))).as("n_pos"),
        exists($"embedding", v => abs(v.cast(DoubleType)) > lit(0.25))
          .cast(IntegerType).as("has_big"),
        forall($"embedding", v => abs(v.cast(DoubleType)) < lit(1.0))
          .cast(IntegerType).as("all_lt1"),
        graft.Det.r4(aggregate($"embedding", lit(0.0),
          (acc, v) => acc + v.cast(DoubleType) * v.cast(DoubleType),
          acc => sqrt(acc))).as("l2_norm"))
      .orderBy($"vec_id")
  }

  /** `agg_weighted_percentile`: WEIGHTED percentiles — "the document
    * length below which 50% / 90% of corpus TOKENS live", per language.
    * The unweighted percentile family (`agg_percentiles`/`_disc`)
    * answers the wrong question for a training-data budget: a corpus of
    * many tiny docs and a few huge ones has most of its TOKENS in the
    * huge tail. No built-in computes this, and the classic construction
    * is exact with what Spark has: per group, sort by value (doc_id
    * tie-break), running token cumsum, then the smallest value whose
    * cumulative weight reaches p·total — ALL comparisons integer
    * (cumw·k ≥ total·(k·p) with integer k·p), so the boundary row is
    * engine-exact, no float percentile interpolation anywhere. One
    * sort+window per group then a hash agg — the per-group sorted scan
    * IS the weighted-percentile lower bound at any scale. */
  def aggWeightedPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tk = size(split($"text", " ")).cast(LongType)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n_chars", $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
    Tables.documents(spark, sfDir)
      .select($"lang", $"n_chars", $"doc_id", tk.as("tk"))
      .withColumn("cumw", sum($"tk").over(wCum))
      .withColumn("totw", sum($"tk").over(wAll))
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        max($"totw").as("tot_tokens"),
        min(when($"cumw" * 2 >= $"totw", $"n_chars")).as("w_p50_chars"),
        min(when($"cumw" * 10 >= $"totw" * 9, $"n_chars")).as("w_p90_chars"))
      .orderBy($"lang")
  }

  /** `table_quality_checks`: declarative data-quality RULE evaluation —
    * the contract-enforcement counterpart of `table_profile_stats`
    * (which describes data; this one judges it): each rule is a
    * (table, rule, rows checked, violations, pass) report row. Range
    * and null rules are single-scan conditional aggregates; the
    * referential-integrity rules are one left join + conditional count
    * each (null probe side = orphan) — the join runs shuffled-or-broadcast
    * by size exactly like any other equi-join, so the audit costs what
    * one pass over each fact costs, never more. All counts integer;
    * the report unions seven one-row aggregates. The shipdate-range rule
    * is deliberately stricter than the fixture (dates run into 2001), so
    * the report carries one genuinely FAILING row — the oracle verifies
    * the non-zero violation count, not just the all-green path. */
  def tableQualityChecks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def report(tbl: String, rule: String, df: DataFrame): DataFrame =
      df.select(lit(tbl).as("table_name"), lit(rule).as("rule"),
        $"n_checked", $"n_violations", ($"n_violations" === 0L).as("pass"))
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val part = Tables.part(spark, sfDir)
    // the three row-local lineitem rules share ONE scan+aggregate (the
    // old per-rule frames each re-scanned the full fact table — 3 of the
    // plan's 4 lineitem scans; at 100 TB that is 3 corpus passes for
    // what is one conditional-sum pass), then explode back to one row
    // per rule. Same counts, same rows.
    val li3 = li.agg(count(lit(1)).as("n_checked"),
      sum(when(!$"l_quantity".between(1.0, 50.0), 1L).otherwise(0L)).as("v1"),
      sum(when(!$"l_discount".between(0.0, 0.1), 1L).otherwise(0L)).as("v2"),
      sum(when(!$"l_shipdate".between(
        lit("1992-01-01").cast("timestamp_ntz"),
        lit("1998-12-31").cast("timestamp_ntz")), 1L).otherwise(0L)).as("v3"))
    val r123 = li3.select($"n_checked", explode(array(
        struct(lit("quantity_in_1_50").as("rule"), $"v1".as("nv")),
        struct(lit("discount_in_0_0.1").as("rule"), $"v2".as("nv")),
        struct(lit("shipdate_in_range").as("rule"), $"v3".as("nv")))).as("e"))
      .select(lit("lineitem").as("table_name"), $"e.rule".as("rule"),
        $"n_checked", $"e.nv".as("n_violations"), ($"e.nv" === 0L).as("pass"))
    val r4 = report("orders", "custkey_in_customer",
      ord.select($"o_custkey")
        .join(cust.select($"c_custkey"), $"o_custkey" === $"c_custkey", "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when($"c_custkey".isNull, 1L).otherwise(0L)).as("n_violations")))
    val r5 = report("lineitem", "orderkey_in_orders",
      li.select($"l_orderkey")
        .join(ord.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left")
        .agg(count(lit(1)).as("n_checked"),
          sum(when($"o_orderkey".isNull, 1L).otherwise(0L)).as("n_violations")))
    val r6 = report("customer", "acctbal_not_null",
      cust.agg(count(lit(1)).as("n_checked"),
        sum(when($"c_acctbal".isNull, 1L).otherwise(0L)).as("n_violations")))
    val r7 = report("part", "retailprice_positive",
      part.agg(count(lit(1)).as("n_checked"),
        sum(when($"p_retailprice" <= 0.0, 1L).otherwise(0L)).as("n_violations")))
    r123.unionByName(r4)
      .unionByName(r5).unionByName(r6).unionByName(r7)
      .orderBy($"table_name", $"rule")
  }

  /** `num_format_funcs`: the number↔string formatting surface —
    * `format_number` (locale-grouped integers), `to_char`/`to_number`
    * (template formatting with an exact parse round-trip), and
    * `format_string` (printf). Every surface is integer-driven: doubles
    * are first quantized through the DECIMAL(18,2) cast (the Oracle.scala
    * conversion idiom) so the string the formatter sees is bit-identical
    * on both engines — to_char on a raw double would hash-diverge on the
    * engines' different shortest-round-trip printers. Pure codegen
    * projection, no shuffle. */
  def numFormatFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .select(
        $"p_partkey",
        format_number($"p_partkey" * 131 + lit(7), 0).as("grouped"),
        expr("to_char(p_partkey, '0000000')").as("pad7"),
        expr("CAST(to_number(to_char(p_partkey, '0000000'), '0000000') AS BIGINT)")
          .as("roundtrip"),
        format_number(($"p_retailprice".cast(DecimalType(18, 2)) * 100)
          .cast(LongType), 0).as("cents_grouped"),
        format_string("%05d|%s", $"p_partkey", $"p_brand").as("tagged"))
      .orderBy($"p_partkey")
  }

  /** `agg_corr_covar`: Pearson correlation + sample/population covariance
    * of discount vs tax per linestatus — the corr/covar_samp/covar_pop
    * family computed from EXACT decimal moments (Σx, Σy, Σxy, Σx², Σy²,
    * n), the same bit-stability trick as `agg_regression` (which covers
    * the regr_* half of the bivariate-statistics surface; this covers
    * the normalized half): Spark's native corr/covar stream double
    * accumulators whose value depends on partition merge order. One
    * grouped pass, map-side combinable, final arithmetic identical IEEE
    * double (mul/div/sqrt are single correctly-rounded ops) + r4. */
  def aggCorrCovar(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val x = ($"l_discount" * 100).cast(DecimalType(18, 4))
    val y = ($"l_tax" * 100).cast(DecimalType(18, 4))
    val m = Tables.lineitem(spark, sfDir)
      .groupBy($"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        sum((x * y).cast(DecimalType(28, 8))).cast(DecimalType(28, 4)).cast(DoubleType).as("sxy"),
        sum((x * x).cast(DecimalType(28, 8))).cast(DecimalType(28, 4)).cast(DoubleType).as("sxx"),
        sum((y * y).cast(DecimalType(28, 8))).cast(DecimalType(28, 4)).cast(DoubleType).as("syy"))
    val n = $"n".cast(DoubleType)
    val covn  = n * $"sxy" - $"sx" * $"sy"   // n²·cov_pop
    val varxn = n * $"sxx" - $"sx" * $"sx"
    val varyn = n * $"syy" - $"sy" * $"sy"
    m.select(
        $"l_linestatus", $"n",
        graft.Det.r4s(covn / sqrt(varxn * varyn)).as("corr_xy"),
        graft.Det.r4s(covn / (n * (n - lit(1.0)))).as("covar_samp"),
        graft.Det.r4s(covn / (n * n)).as("covar_pop"))
      .orderBy($"l_linestatus")
  }

  /** `agg_skew_kurtosis`: third/fourth-moment shape statistics —
    * population skewness and excess kurtosis of quantity per returnflag —
    * from EXACT decimal raw moments Σx..Σx⁴ (Spark's native skewness/
    * kurtosis stream double central-moment accumulators whose value
    * depends on partition merge order). Completes the moment ladder:
    * stats_moments (2nd), regression/corr (bivariate 2nd), here 3rd/4th.
    * Headroom: x ≤ 50 so Σx⁴ ≤ 6.25e6·rows — DECIMAL(28,8) holds to
    * ~1.6e13 rows per group, far past bench scale. The central-moment
    * algebra is a fixed IEEE tree (x^1.5 spelled x·√x, not pow — libm
    * pow is not correctly rounded and may differ across engines), + r4. */
  def aggSkewKurtosis(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val x = $"l_quantity"
    val d18 = DecimalType(18, 4); val d28 = DecimalType(28, 8)
    val m = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(x.cast(d18)).cast(DoubleType).as("s1"),
        sum((x * x).cast(d28)).cast(DoubleType).as("s2"),
        sum((x * x * x).cast(d28)).cast(DoubleType).as("s3"),
        sum((x * x * x * x).cast(d28)).cast(DoubleType).as("s4"))
    val n = $"n".cast(DoubleType)
    val mean = $"s1" / n
    val m2 = $"s2" / n - mean * mean
    val m3 = $"s3" / n - lit(3.0) * mean * ($"s2" / n) + lit(2.0) * (mean * mean * mean)
    val m4 = $"s4" / n - lit(4.0) * mean * ($"s3" / n) +
      lit(6.0) * (mean * mean) * ($"s2" / n) - lit(3.0) * ((mean * mean) * (mean * mean))
    m.select(
        $"l_returnflag", $"n",
        graft.Det.r4(mean).as("mean_qty"),
        graft.Det.r4s(m3 / (m2 * sqrt(m2))).as("skewness"),
        graft.Det.r4s(m4 / (m2 * m2) - lit(3.0)).as("kurtosis_ex"))
      .orderBy($"l_returnflag")
  }

  /** `agg_entropy_gini`: class-balance diagnostics per user cohort —
    * Shannon entropy (nats) and Gini impurity of the event-type mix,
    * the two numbers a dataset-curation pass reads before rebalancing
    * (complements `text_entropy`'s per-document character entropy with
    * the cross-row categorical form). Determinism: a double SUM of
    * per-class terms would be partition-order dependent, so each term
    * (−p·ln p, p²) is HALF_UP-quantized to integer micro-units per
    * class FIRST and the cohort total is an exact long sum — the tfidf
    * log-quantization idiom lifted to aggregation. Two map-side
    * combinable passes over integer keys. */
  def aggEntropyGini(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = graft.Tables.events(spark, sfDir)
      .groupBy(pmod($"user_id", lit(10)).as("cohort"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
    val tot = Window.partitionBy($"cohort")
    val p = $"cnt".cast(DoubleType) / sum($"cnt").over(tot).cast(DoubleType)
    counts
      .select($"cohort", $"cnt",
        floor(-(p * log(p)) * 1000000.0 + 0.5).cast(LongType).as("h_term_u"),
        floor((p * p) * 1000000.0 + 0.5).cast(LongType).as("g_term_u"))
      .groupBy($"cohort")
      .agg(
        count(lit(1)).as("n_types"),
        sum($"cnt").as("n_events"),
        (sum($"h_term_u").cast(DoubleType) / 1000000.0).as("entropy_nats"),
        (lit(1.0) - sum($"g_term_u").cast(DoubleType) / 1000000.0).as("gini"))
      .orderBy($"cohort")
  }
}
