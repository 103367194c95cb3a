package graft

/** DuckDB oracle SQL for every hash-checked query in SparkEntry.queries.
  *
  * Each statement is the *semantic twin* of the Spark plan with the same
  * key: identical column aliases (the driver sorts columns by name before
  * hashing), identical total ordering, identical rounding, and — where
  * doubles are aggregated — the identical DECIMAL(18,x) cast so both
  * engines produce the exact same sums.
  *
  * Timestamps never appear raw in outputs: they are projected to epoch
  * millis/micros (`unix_millis`/`unix_micros` in Spark = `epoch_ms`/
  * `epoch_us` in DuckDB) because the events.ts physical type has drifted
  * across fixture refreshes (ns, ns-as-long, now µs no-tz) and the two
  * engines read it at different native types; epoch integers are stable
  * under all of them.
  */
object Oracle {
  private val latestStateSql =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
              round(value, 4) AS last_value, epoch_us(ts) AS last_ts_us
       FROM (SELECT *, row_number() OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
             FROM events)
       WHERE rn = 1 ORDER BY user_id"""

  /** Closed-form TTL twin (shared by the old-API and state-API-v2 TTL
    * queries): batch latest state + the finalized-horizon eviction
    * predicate (final watermark max_ts - 1h STRICTLY past last activity
    * + 2h TTL — Spark fires event-time timeouts on strict watermark
    * advance). Both sides of the comparison are ms-TRUNCATED first:
    * Spark tracks watermarks and timer/timeout timestamps in
    * milliseconds, so a key within 1ms of the exact 3h boundary must
    * resolve the same way on both engines. */
  private val stateTtlSql =
    """WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events)
       SELECT user_id, event_id AS last_event_id,
              event_type AS last_event_type, round(value, 4) AS last_value,
              epoch_us(ts) AS last_ts_us,
              epoch_us(ts) // 1000 + 7200000 < (SELECT m FROM mx) // 1000 - 3600000 AS expired
       FROM (SELECT *, row_number() OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
             FROM events)
       WHERE rn = 1 ORDER BY user_id"""

  private val latestStateDelSql =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
              round(value, 4) AS last_value
       FROM (SELECT *, row_number() OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
             FROM events)
       WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id"""

  private val tumblingSql =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, event_type,
              count(*) AS n_events,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY bucket_ms, event_type"""

  /** Shared by `window_sliding_time` (batch) and `cdc_stream_sliding`
    * (its streaming twin, complete mode = full answer): rebuild the
    * 4-overlapping-window membership explicitly — hour windows sliding
    * every 15 min mean each event belongs to starts
    * (floor(ts_us/900e6) − k)·900e6 for k in 0..3. */
  private val slidingSql =
    """SELECT (epoch_us(ts) // 900000000 - k.k) * 900000000 AS win_start_us,
              event_type, count(*) AS n_events,
              min(event_id) AS min_event_id, max(event_id) AS max_event_id
       FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** `graph_pagerank` twin: the same 6 PageRank iterations as
    * GraphOps.pageRank, unrolled as chained CTEs (standard SQL forbids
    * aggregation inside a recursive term, and the iteration count is a
    * fixed literal anyway). All arithmetic is integer nano-units —
    * `//` here ≡ `div` there on the all-positive domain — so the match
    * is exact, not rounded. The pair CTE is the dedup_ngram_jaccard
    * oracle minus its output shaping. */
  private val pageRankSql: String = {
    val iters = (1 to 6).map { i =>
      s"""         r$i AS (
           SELECT e.dst AS id,
             CAST((150000000 // (SELECT n FROM nn))
               + (85 * sum(p.r // e.outdeg)) // 100 AS BIGINT) AS r
           FROM edgesd e JOIN r${i - 1} p ON e.src = p.id
           GROUP BY e.dst)"""
    }.mkString(",\n")
    s"""WITH sh AS MATERIALIZED (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(string_split(text,' ')) - 2, 1)),
             i -> array_to_string((string_split(text,' '))[i+1:i+3], ' '))) AS s
           FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh),
         pairs AS MATERIALIZED (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n, b.n
           HAVING round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 4) >= 0.5),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                   UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         edgesd AS MATERIALIZED (
           SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d ON e.src = d.src),
         nn AS (SELECT count(DISTINCT src) AS n FROM edges),
         r0 AS (SELECT DISTINCT src AS id,
                  CAST(1000000000 // (SELECT n FROM nn) AS BIGINT) AS r FROM edges),
$iters
         SELECT id AS doc_id, r AS rank_nano,
                CAST(row_number() OVER (ORDER BY r DESC, id) AS INTEGER) AS pr_pos
         FROM r6 ORDER BY doc_id"""
  }

  /** `graph_label_propagation` twin: the same 4 synchronous LPA rounds
    * as GraphOps.labelPropagation, unrolled as chained CTEs over the
    * identical pair graph. The per-node pick is
    * `row_number() OVER (ORDER BY count DESC, label ASC)` = 1 — the
    * window twin of Spark's `min(struct(-count, label))` argmax; all
    * integer, so the match is exact even if the labels oscillate. */
  private val labelPropSql: String = {
    val iters = (1 to 4).map { i =>
      s"""         l$i AS (
           SELECT src AS id, l AS lbl FROM (
             SELECT e.src, p.lbl AS l,
                    row_number() OVER (PARTITION BY e.src
                      ORDER BY count(*) DESC, p.lbl ASC) AS rn
             FROM edges e JOIN l${i - 1} p ON e.dst = p.id
             GROUP BY e.src, p.lbl) WHERE rn = 1)"""
    }.mkString(",\n")
    s"""WITH sh AS MATERIALIZED (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(string_split(text,' ')) - 2, 1)),
             i -> array_to_string((string_split(text,' '))[i+1:i+3], ' '))) AS s
           FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh),
         pairs AS MATERIALIZED (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n, b.n
           HAVING round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 4) >= 0.5),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                   UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM edges),
$iters
         SELECT id AS doc_id, lbl AS community FROM l4 ORDER BY doc_id"""
  }

  /** `graph_bfs_distance` twin: the same 4 multi-source BFS relaxation
    * rounds as GraphOps.bfsDistance, unrolled as chained CTEs over the
    * identical pair graph (the pageRankSql/labelPropSql prefix). All
    * integer — seeds at hops 0, each round unions the previous reached
    * set with every one-hop extension and keeps the min — so the match
    * is exact; nodes beyond 4 hops are absent on both engines. */
  private val bfsDistanceSql: String = {
    val rounds = (1 to 4).map { i =>
      s"""         d$i AS (SELECT id, min(hops) AS hops FROM (
             SELECT id, hops FROM d${i - 1}
             UNION ALL
             SELECT e.dst AS id, p.hops + 1 AS hops
             FROM edges e JOIN d${i - 1} p ON e.src = p.id)
           GROUP BY id)"""
    }.mkString(",\n")
    s"""WITH sh AS MATERIALIZED (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(string_split(text,' ')) - 2, 1)),
             i -> array_to_string((string_split(text,' '))[i+1:i+3], ' '))) AS s
           FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh),
         pairs AS MATERIALIZED (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n, b.n
           HAVING round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 4) >= 0.5),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                   UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
         d0 AS (SELECT DISTINCT src AS id, 0 AS hops FROM edges WHERE src % 25 = 0),
$rounds
         SELECT id AS doc_id, hops FROM d4 ORDER BY doc_id"""
  }

  val sql: Map[String, String] = Map(
    // Skew-safe and streaming twins share the oracle of their batch
    // originals: the gate thereby checks salted ≡ windowed formulation
    // and streaming ≡ batch through DuckDB.
    "cdc_latest_state_salted" -> latestStateSql,
    "cdc_stream_windowed"     -> tumblingSql,
    // safe because the staged replay is event-time-ordered (see
    // StreamingLatest.streamStateful): the watermark never drops a
    // key's winning event, so streaming state ≡ batch latest-wins.
    "cdc_stream_stateful"     -> latestStateSql,

    // ── Group A: CDC semantics on `events` ────────────────────────────
    "cdc_op_classify" ->
      """SELECT event_id, user_id,
         CASE WHEN event_type = 'signup' THEN 'c'
              WHEN event_type = 'error'  THEN 'd'
              ELSE 'u' END AS op,
         epoch_ms(ts) AS ts_ms, epoch_us(ts) AS ts_us, 'events' AS tbl
         FROM events ORDER BY event_id""",

    "cdc_latest_state" -> latestStateSql,

    "cdc_latest_state_del" -> latestStateDelSql,
    // incremental MERGE (snapshot + delta) must equal the full-log
    // rebuild — the gate proves the equivalence through DuckDB.
    "cdc_merge_upsert"     -> latestStateDelSql,
    // N-batch streaming foreachBatch MERGE must equal the one-shot
    // full-log rebuild — incremental apply proven through DuckDB.
    "cdc_stream_foreachbatch" -> latestStateDelSql,

    "cdc_op_counts" ->
      """SELECT CASE WHEN event_type = 'signup' THEN 'c'
                     WHEN event_type = 'error'  THEN 'd'
                     ELSE 'u' END AS op,
                count(*) AS n_events, min(event_id) AS min_event_id,
                max(event_id) AS max_event_id
         FROM events GROUP BY 1 ORDER BY op""",

    "cdc_key_routing" ->
      """SELECT 'GraftNamespace.graft_keyspace.' || event_type AS topic,
                count(*) AS n_records
         FROM events GROUP BY 1 ORDER BY topic""",

    "cdc_stream_tumbling" -> tumblingSql,

    "cdc_snapshot_union" ->
      """SELECT user_id, event_id, 'r' AS op, 'true' AS snapshot, epoch_us(ts) AS ts_us
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
               FROM events WHERE ts < TIMESTAMP '2024-01-15')
         WHERE rn = 1
         UNION ALL
         SELECT user_id, event_id,
                CASE WHEN event_type = 'signup' THEN 'c'
                     WHEN event_type = 'error'  THEN 'd'
                     ELSE 'u' END AS op,
                'false' AS snapshot, epoch_us(ts) AS ts_us
         FROM events WHERE ts >= TIMESTAMP '2024-01-15'
         ORDER BY event_id""",

    "cdc_json_roundtrip" ->
      """SELECT event_id,
                CASE WHEN event_type = 'signup' THEN 'c'
                     WHEN event_type = 'error'  THEN 'd'
                     ELSE 'u' END AS op,
                CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS user_id,
                CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value,
                epoch_us(ts) AS ts_us
         FROM events ORDER BY event_id""",

    "cdc_envelope_build" ->
      // the Spark side serialize→parse roundtrips key + after through
      // Connect JSON and emits the PARSED fields; the oracle recomputes
      // them straight from events (op rule, after=null on deletes, Cell
      // values, constant topic, offset=event_id) — a lossy roundtrip or
      // wrong envelope rule breaks the hash
      """SELECT user_id AS key_user_id,
                epoch_us(ts) AS ts_us,
                CASE WHEN event_type = 'signup' THEN 'c'
                     WHEN event_type = 'error'  THEN 'd'
                     ELSE 'u' END AS op,
                CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS after_user_id,
                CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS after_event_type,
                CASE WHEN event_type = 'error' THEN NULL ELSE value END AS after_value,
                CAST(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS INTEGER) AS after_is_null,
                CAST(1 AS INTEGER) AS before_is_null,
                'GraftNamespace.graft_keyspace.events' AS topic,
                event_id AS "offset"
         FROM events ORDER BY "offset"""",

    "cdc_envelope_evolution" ->
      // absent-field → NULL under the evolved read schema; the oracle
      // recomputes expected nulls from the producer-generation split
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                CASE WHEN event_id % 2 = 1 THEN value END AS value,
                CAST(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS INTEGER) AS schema_gen
         FROM events ORDER BY event_id""",

    "join_asof_attribution" ->
      """SELECT event_id AS purchase_event_id, user_id, click_event_id,
                epoch_us(ts) - click_ts_us AS gap_us
         FROM (
           SELECT *,
             last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_event_id,
             last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts_us
           FROM events)
         WHERE event_type = 'purchase'
         ORDER BY purchase_event_id""",

    "cdc_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         sess AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged)
         SELECT user_id, min(ts_us) AS session_start_us, count(*) AS n_events,
                round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
         FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start_us""",

    "cdc_stream_sessionize" ->
      // finalized-horizon twin (StreamingLatest.streamSessionize): only
      // sessions whose window end (last event + 30 min gap) is strictly
      // below the final watermark max(ts) - 1 h; the streaming side
      // applies the identical filter, and Round2OpsSpec proves the
      // emitted set covers everything below that bound.
      """WITH flagged AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         sess AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged),
         wm AS (SELECT max(epoch_us(ts)) - 3600000000 AS h FROM events)
         SELECT user_id, min(ts_us) AS session_start_us, count(*) AS n_events,
                round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
         FROM sess GROUP BY user_id, sid
         HAVING max(ts_us) + 1800000000 < (SELECT h FROM wm)
         ORDER BY user_id, session_start_us""",

    "cdc_stream_dedup" ->
      """SELECT event_type, count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",

    "cdc_stream_join" ->
      """SELECT p.event_id AS purchase_event_id, c.event_id AS click_event_id
         FROM events p JOIN events c
           ON p.event_type = 'purchase' AND c.event_type = 'click'
          AND p.user_id = c.user_id
          AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
         ORDER BY purchase_event_id, click_event_id""",

    "cdc_stream_join_outer" ->
      // finalized-horizon twin (StreamingLatest.streamJoinOuter): null
      // rows only below the end-of-replay watermark
      // min(max purchase ts, max click ts) - 1 h; matched rows always
      """WITH p AS (SELECT event_id AS p_id, ts AS p_ts, user_id AS p_user
                    FROM events WHERE event_type = 'purchase'),
            c AS (SELECT event_id AS c_id, ts AS c_ts, user_id AS c_user
                    FROM events WHERE event_type = 'click'),
            wm AS (SELECT least((SELECT max(epoch_us(p_ts)) FROM p),
                                (SELECT max(epoch_us(c_ts)) FROM c))
                          - 3600000000 AS w)
         SELECT p.p_id AS purchase_event_id, c.c_id AS click_event_id
         FROM p LEFT JOIN c
           ON p.p_user = c.c_user
          AND epoch_us(c.c_ts) BETWEEN epoch_us(p.p_ts) - 3600000000 AND epoch_us(p.p_ts)
         WHERE c.c_id IS NOT NULL OR epoch_us(p.p_ts) < (SELECT w FROM wm)
         ORDER BY purchase_event_id, click_event_id NULLS FIRST""",

    "cdc_scd2_history" ->
      """SELECT user_id, event_id, event_type,
                epoch_us(ts) AS valid_from_us,
                lead(epoch_us(ts)) OVER w AS valid_to_us,
                CASE WHEN lead(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         ORDER BY user_id, valid_from_us, event_id""",

    // ── Group B: relational core on the star schema ───────────────────
    "scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
                round(l_extendedprice * (1 - l_discount), 4) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.02 AND l_quantity < 25.0
         ORDER BY l_orderkey, l_linenumber""",

    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_base_price,
                round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_disc_price,
                CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))), 4) AS DOUBLE) AS sum_charge,
                floor((CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
                floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
                floor((CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "join_broadcast" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         ORDER BY o_orderkey""",

    // same oracle, different physical strategy (SHUFFLE_HASH hint) — the
    // gate proves a join strategy hint cannot change results
    "join_hash_hint" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         ORDER BY o_orderkey""",

    "join_bloom_prefilter" ->
      // the plain semi join: a hash match proves the bloom prefilter is
      // semantics-free (no false negatives; false positives removed by
      // the exact join)
      """SELECT o_orderpriority, count(*) AS n_orders,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
         FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'BUILDING')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "join_5way_revenue" ->
      """SELECT n_name,
                round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM region
           JOIN nation   ON n_regionkey = r_regionkey
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders   ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q5_local_supplier" ->
      """SELECT n_name,
                round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM region
           JOIN nation   ON n_regionkey = r_regionkey
           JOIN customer ON c_nationkey = n_nationkey
           JOIN orders   ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
                round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
                epoch_ms(o_orderdate) AS order_ms
         FROM customer
           JOIN orders   ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-01-01'
           AND l_shipdate  > TIMESTAMP '1997-01-01'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
         FROM (SELECT l_orderkey,
                      round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
               FROM lineitem GROUP BY l_orderkey
               HAVING round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) > 250.0)
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",

    "join_outer_coalesce" ->
      """SELECT o_orderkey, o_orderstatus,
                coalesce(r.rev, 0.0) AS recent_revenue,
                coalesce(r.n, 0) AS n_recent_items
         FROM orders LEFT JOIN (
           SELECT l_orderkey,
                  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS rev,
                  count(*) AS n
           FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
           GROUP BY l_orderkey) r ON o_orderkey = r.l_orderkey
         ORDER BY o_orderkey""",

    "join_range_bucketed" ->
      """SELECT e.event_id AS err_id, count(*) AS n_nearby_clicks
         FROM events e JOIN events c
           ON e.event_type = 'error' AND c.event_type = 'click'
          AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= 300000000
         GROUP BY e.event_id ORDER BY err_id""",

    "window_ntile_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
                ntile(4) OVER w AS quartile,
                floor(percent_rank() OVER w * 10000.0 + 0.5) / 10000.0 AS pct_rank,
                floor(cume_dist() OVER w * 10000.0 + 0.5) / 10000.0 AS cume,
                dense_rank() OVER w AS bal_rank
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         ORDER BY c_custkey""",

    "window_range_days" ->
      """SELECT o_custkey, o_orderkey, days,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER
                  (PARTITION BY o_custkey ORDER BY days
                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS rev_30d
         FROM (SELECT *, date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS days
               FROM orders)
         ORDER BY o_custkey, o_orderkey""",

    "union_by_name_evolution" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
                coalesce(o_orderpriority, 'LEGACY') AS priority
         FROM (
           SELECT o_orderkey, o_custkey, o_totalprice, NULL AS o_orderpriority
           FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
           UNION ALL
           SELECT o_orderkey, o_custkey, NULL AS o_totalprice, o_orderpriority
           FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
         ORDER BY o_orderkey""",

    "join_null_safe" ->
      """SELECT coalesce(n_name, 'NULL_KEY') AS nation, count(*) AS n_customers
         FROM (SELECT c_custkey, nullif(c_nationkey, 5) AS nk FROM customer) c
         JOIN (SELECT nullif(n_nationkey, 5) AS nk2, n_name FROM nation) n
           ON c.nk IS NOT DISTINCT FROM n.nk2
         GROUP BY 1 ORDER BY nation""",

    "join_salted_skew" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // Exact BECAUSE the sketch is in its coupon regime at the gate
    // fixtures: a lgK=15 DataSketches HLL estimate equals the true
    // distinct count through ~3072 keys, measured — fixtures top out
    // at 1500 (Relational.aggHllSketch) — the same
    // below-nominal-capacity argument as agg_theta_setops.
    "agg_hll_sketch" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS est_users
         FROM events GROUP BY 1
         UNION ALL
         SELECT 'ALL' AS event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS est_users
         FROM events
         ORDER BY event_type""",

    "agg_histogram" ->
      """SELECT CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 600000.0 THEN 13
                     ELSE CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1 END AS bucket,
                count(*) AS n_orders,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
         FROM orders GROUP BY 1 ORDER BY bucket""",

    "map_type_ops" ->
      """WITH t AS (SELECT user_id, event_type, count(*) AS n
                    FROM events GROUP BY 1, 2)
         SELECT user_id,
                count(*) AS n_types,
                CAST(coalesce(sum(n) FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS n_clicks,
                CAST(coalesce(sum(n) FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT) AS n_purchases,
                max(n) AS max_type_count
         FROM t GROUP BY user_id ORDER BY user_id""",

    "agg_bitwise" ->
      """SELECT event_type,
                bit_and(user_id) AS uid_and,
                bit_or(user_id) AS uid_or,
                bit_xor(event_id) AS eid_xor,
                count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",

    // transitive closure via recursive CTE — checks the distributed
    // min-label-propagation fixpoint against true connected components
    "dedup_cluster_canonical" ->
      """WITH RECURSIVE sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(string_split(text,' ')) - 2, 1)),
             i -> array_to_string((string_split(text,' '))[i+1:i+3], ' '))) AS s
           FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n, b.n
           HAVING round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 4) >= 0.5),
         edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         reach AS (SELECT s, d FROM edges
                   UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
         SELECT s AS doc_id,
                least(s, min(d)) AS cluster_id,
                CASE WHEN least(s, min(d)) = s THEN 1 ELSE 0 END AS is_canonical
         FROM reach GROUP BY s ORDER BY doc_id""",

    "sample_split_assign" ->
      """SELECT lang,
                CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'valid'
                     ELSE 'test' END AS split,
                count(*) AS n_docs
         FROM documents GROUP BY 1, 2 ORDER BY lang, split""",

    "sample_shuffle_shard" ->
      // deterministic epoch shuffle: content-keyed md5 sort key, shard =
      // first hex digit, position within shard; string comparison of
      // lowercase hex agrees byte-for-byte across engines
      """WITH keyed AS (
           SELECT doc_id,
                  md5(CAST(doc_id AS VARCHAR) || ':42') AS k,
                  substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 1) AS shard
           FROM documents)
         SELECT doc_id, shard,
                row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                  AS pos_in_shard
         FROM keyed ORDER BY doc_id""",

    "sample_tablesample" ->
      // content-keyed Bernoulli sample (oracle-eligible since r18): the
      // md5-threshold draw is engine- and partitioning-independent, so
      // DuckDB reproduces the exact sampled row set — unlike df.sample's
      // per-partition RNG (lowercase-hex substring compare, the
      // sample_split_assign idiom)
      """SELECT l_returnflag,
                count(*) AS n_sampled,
                round(sum(l_quantity), 4) AS sum_qty
         FROM lineitem
         WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                          CAST(l_linenumber AS VARCHAR) || ':42'), 1, 3) < '19a'
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "explode_outer_tokens" ->
      """SELECT doc_id, long_tok
         FROM (SELECT doc_id,
                 unnest(CASE WHEN len(lt) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE lt END) AS long_tok
               FROM (SELECT doc_id,
                       list_filter(string_split(text, ' '), t -> length(t) >= 8) AS lt
                     FROM documents))
         ORDER BY doc_id, long_tok NULLS FIRST""",

    "text_ngram_freq" ->
      """WITH toks AS (
           SELECT doc_id,
                  unnest(string_split(text, ' ')) AS tok,
                  unnest(range(len(string_split(text, ' ')))) AS pos
           FROM documents),
         big AS (
           SELECT tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
           FROM toks)
         SELECT bigram, count(*) AS n FROM big WHERE bigram IS NOT NULL
         GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""",

    "window_first_last" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                first_value(o_totalprice) OVER w AS first_price,
                last_value(o_totalprice)  OVER w AS last_price,
                nth_value(o_totalprice, 2) OVER w AS second_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",

    "agg_min_max_by" ->
      """SELECT c_mktsegment,
                arg_max(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 1099511627776 + c_custkey) AS richest,
                arg_min(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 1099511627776 + c_custkey) AS poorest,
                round(max(c_acctbal), 4) AS max_bal,
                round(min(c_acctbal), 4) AS min_bal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "join_cross_dims" ->
      """SELECT r_regionkey, n_nationkey, r_name || '/' || n_name AS pair
         FROM region CROSS JOIN nation
         ORDER BY r_regionkey, n_nationkey""",

    "date_arith_funcs" ->
      """SELECT o_orderkey,
                epoch_ms(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)) AS plus3m_ms,
                epoch_ms(CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)) AS month_end_ms,
                quarter(CAST(o_orderdate AS DATE)) AS qtr,
                dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow
         FROM orders ORDER BY o_orderkey""",

    "agg_conditional" ->
      """SELECT o_orderpriority,
                count(*) AS n_orders,
                count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
                count(*) FILTER (WHERE o_orderstatus = 'O' AND o_totalprice < 50000.0) AS n_open_small,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 4) AS sum_finished,
                CAST(bool_and(o_totalprice > 900.0) AS INT) AS all_above_900,
                CAST(bool_or(o_totalprice > 400000.0) AS INT) AS any_above_400k
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
                round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM lineitem
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation   ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "subquery_scalar" ->
      """SELECT p_partkey, p_brand, p_retailprice
         FROM part p
         WHERE p_retailprice > 1.05 * (SELECT avg(p2.p_retailprice)
                                       FROM part p2
                                       WHERE p2.p_brand = p.p_brand)
         ORDER BY p_partkey""",

    "set_ops_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT c_custkey FROM customer WHERE c_acctbal > 8000.0
         ORDER BY c_custkey""",

    "window_topk_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
               FROM orders)
         WHERE rk <= 3 ORDER BY o_custkey, rk""",

    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS order_ms,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "window_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
                lag(o_totalprice, 1)  OVER w AS prev_price,
                lead(o_totalprice, 1) OVER w AS next_price,
                date_diff('day',
                  CAST(lag(o_orderdate, 1) OVER w AS DATE),
                  CAST(o_orderdate AS DATE)) AS days_since_prev
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
                coalesce(o_orderpriority, 'ALL') AS orderpriority,
                count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_totalprice
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY orderstatus, orderpriority""",

    "sort_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "agg_distinct" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
                count(DISTINCT c_nationkey) AS n_nations
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "agg_rollup" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS mktsegment,
                coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nationkey,
                count(*) AS n_customers,
                round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_acctbal
         FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
         ORDER BY mktsegment, nationkey""",

    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
                coalesce(o_orderpriority, 'ALL') AS orderpriority,
                count(*) AS n_orders,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_totalprice
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY orderstatus, orderpriority""",

    "set_ops" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
          UNION
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
         EXCEPT
         SELECT c_custkey FROM customer WHERE c_acctbal > 8000.0
         ORDER BY c_custkey""",

    "string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
                substring(p_name, 1, 8) AS name_prefix,
                length(p_name) AS name_len,
                concat_ws('|', p_brand, p_type) AS brand_type,
                CAST(p_name LIKE '%red%' AS INTEGER) AS is_red
         FROM part ORDER BY p_partkey""",

    "date_funcs" ->
      """SELECT o_orderkey,
                year(o_orderdate) AS order_year,
                month(o_orderdate) AS order_month,
                epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
                date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
         FROM orders ORDER BY o_orderkey""",

    "math_case_funcs" ->
      """SELECT l_orderkey, l_linenumber,
                round(l_extendedprice * l_tax, 4) AS tax_amount,
                round(abs(l_discount - 0.05), 4) AS disc_dev,
                CASE WHEN l_tax < 0.03 THEN 'low'
                     WHEN l_tax < 0.06 THEN 'mid'
                     ELSE 'high' END AS tax_bucket
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "json_extract" ->
      """SELECT event_type, count(k) AS n,
                floor((CAST(sum(k) AS DOUBLE) / count(k)) * 10000.0 + 0.5) / 10000.0 AS avg_k
         FROM (SELECT event_type, TRY_CAST(props->>'$.k' AS INTEGER) AS k FROM events)
         GROUP BY event_type ORDER BY event_type""",

    "agg_percentiles" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
                round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
                round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_stats_moments" ->
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
                  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
                  CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS syy,
                  CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag,
                round(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 4) AS stddev_qty,
                round((n * sxy - sx * sy)
                      / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 4) AS corr_qty_price
         FROM m ORDER BY l_returnflag""",

    "agg_array_sorted" ->
      """SELECT l_returnflag,
                array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
                count(DISTINCT l_linestatus) AS n_statuses
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_pivot" ->
      """SELECT user_id,
                CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
         FROM events GROUP BY user_id ORDER BY user_id""",

    "agg_unpivot" ->
      """WITH wide AS (
           SELECT l_returnflag,
                  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
                  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
                  round(CAST(sum(CAST(l_discount * 100.0 AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_disc_pct
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, measure, value FROM (
           SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
           UNION ALL
           SELECT l_returnflag, 'sum_price', sum_price FROM wide
           UNION ALL
           SELECT l_returnflag, 'sum_disc_pct', sum_disc_pct FROM wide)
         ORDER BY l_returnflag, measure""",

    "mm_frame_sample" ->
      // docs CTE = documents + the degenerate empty-payload fixture row
      // (mirrors MultiModal.documentsWithFixture): range(0) emits no
      // sample rows for it, gate-proving the query's n_samples>0 guard
      """WITH docs AS (SELECT doc_id, text FROM documents
                       UNION ALL SELECT -1, '')
         SELECT doc_id AS media_id, i * 4 AS frame_idx,
                least(32, octet_length(encode(text)) - i * 4 * 32) AS frame_len
         FROM docs,
              unnest(range(CAST(ceil(ceil(octet_length(encode(text)) / 32.0) / 4.0) AS BIGINT))) AS t(i)
         ORDER BY media_id, frame_idx""",

    // ── Group C: LLM data-pipeline ops ────────────────────────────────
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_dups
         FROM documents GROUP BY text ORDER BY doc_id""",

    "dedup_exact_hash" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_dups
         FROM documents GROUP BY sha256(text) ORDER BY doc_id""",

    "text_clean_normalize" ->
      """SELECT doc_id,
                md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS clean_md5,
                length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS clean_len,
                len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS n_clean_tokens
         FROM documents ORDER BY doc_id""",

    "vec_top_dims" ->
      """SELECT vec_id, rk, dim, round(CAST(v AS DOUBLE), 4) AS dim_value
         FROM (SELECT vec_id, dim, v,
                      row_number() OVER (PARTITION BY vec_id ORDER BY v DESC, dim) AS rk
               FROM (SELECT vec_id, unnest(embedding) AS v,
                            unnest(range(len(embedding))) AS dim
                     FROM embeddings WHERE vec_id < 10))
         WHERE rk <= 3 ORDER BY vec_id, rk""",

    "sql_catalog_query" ->
      """SELECT r_name, count(*) AS n_customers,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
         FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",

    "text_chunk_windows" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
                           len(string_split(text, ' ')) AS n
                    FROM documents),
         c AS (SELECT doc_id, toks, n,
                      unnest(range(CAST(floor((n - 1) / 24) AS BIGINT) + 1)) AS chunk_idx
               FROM d)
         SELECT doc_id, chunk_idx,
                chunk_idx * 24 AS chunk_start,
                least(32, n - chunk_idx * 24) AS chunk_len,
                md5(array_to_string(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ')) AS chunk_md5
         FROM c ORDER BY doc_id, chunk_idx""",

    "text_unigram_logprob" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         freqs AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
         tot AS (SELECT count(*)::DOUBLE AS total FROM toks)
         SELECT doc_id, count(*) AS n_tokens,
                floor((CAST(sum(CAST(floor((ln(total) - ln(cnt)) * 1e6 + 0.5) / 1e6
                                     AS DECIMAL(18,10))) AS DOUBLE) / count(*))
                      * 10000.0 + 0.5) / 10000.0 AS avg_nll
         FROM toks JOIN freqs USING (tok) CROSS JOIN tot
         GROUP BY doc_id ORDER BY doc_id""",

    "agg_weighted_percentile" ->
      // same integer boundary rule: smallest value whose running token
      // cumsum reaches p of the group total
      """WITH d AS (SELECT lang, n_chars, doc_id,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
                    FROM documents),
         c AS (SELECT lang, n_chars, tk,
                      sum(tk) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
                      sum(tk) OVER (PARTITION BY lang) AS totw
               FROM d)
         SELECT lang, count(*) AS n_docs,
                CAST(max(totw) AS BIGINT) AS tot_tokens,
                min(CASE WHEN cumw * 2 >= totw THEN n_chars END) AS w_p50_chars,
                min(CASE WHEN cumw * 10 >= totw * 9 THEN n_chars END) AS w_p90_chars
         FROM c GROUP BY lang ORDER BY lang""",

    "mm_video_keyframe" ->
      // same integer variance numerator; argmax via QUALIFY-style rank
      // (vn DESC, idx ASC) — equivalent to the min-of-struct; the empty
      // fixture payload's zero-length frame is dropped by the guard
      """WITH docs AS (SELECT doc_id, text FROM documents
                       UNION ALL SELECT -1, ''),
         fr AS (
           SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_idx,
                  substring(text, CAST(i * 32 + 1 AS INTEGER), 32) AS f
           FROM docs,
                unnest(range(CAST(greatest(ceil(length(text) / 32.0), 1) AS BIGINT))) AS t(i)
           WHERE length(substring(text, CAST(i * 32 + 1 AS INTEGER), 32)) > 0),
         st AS (
           SELECT media_id, frame_idx, CAST(length(f) AS BIGINT) AS fr_len,
                  CAST(list_aggregate(list_transform(range(length(f)),
                      i -> ascii(substring(f, CAST(i + 1 AS INTEGER), 1))), 'sum') AS BIGINT) AS s1,
                  CAST(list_aggregate(list_transform(range(length(f)),
                      i -> ascii(substring(f, CAST(i + 1 AS INTEGER), 1))
                           * ascii(substring(f, CAST(i + 1 AS INTEGER), 1))), 'sum') AS BIGINT) AS s2
           FROM fr),
         v AS (SELECT media_id, frame_idx, fr_len, s1,
                      fr_len * s2 - s1 * s1 AS var_num,
                      count(*) OVER (PARTITION BY media_id) AS n_frames,
                      row_number() OVER (PARTITION BY media_id
                        ORDER BY fr_len * s2 - s1 * s1 DESC, frame_idx) AS rk
               FROM st)
         SELECT media_id, CAST(n_frames AS INTEGER) AS n_frames,
                frame_idx AS kf_idx, fr_len AS kf_len,
                s1 AS kf_byte_sum, var_num AS kf_var_num
         FROM v WHERE rk = 1 ORDER BY media_id""",

    "join_asof_nearest" ->
      // same interleaved per-user order, both directional frames, same
      // backward-tie CASE
      """SELECT event_id AS purchase_event_id, user_id,
                CASE WHEN use_b THEN prev_id ELSE next_id END AS click_event_id,
                (CASE WHEN use_b THEN prev_us ELSE next_us END) - p_us AS signed_gap_us
         FROM (
           SELECT *, prev_us IS NOT NULL AND
                  (next_us IS NULL OR (p_us - prev_us) <= (next_us - p_us)) AS use_b
           FROM (
             SELECT event_id, user_id, event_type, epoch_us(ts) AS p_us,
               last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                 OVER w_prev AS prev_id,
               last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
                 OVER w_prev AS prev_us,
               first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                 OVER w_next AS next_id,
               first_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
                 OVER w_next AS next_us
             FROM events
             WINDOW
               w_prev AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               w_next AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)))
         WHERE event_type = 'purchase'
         ORDER BY purchase_event_id""",

    "sim_topk_prefix" ->
      // same ordered float->double accumulation as sim_topk_cosine,
      // staged: 16-dim prefix shortlist of 100, full-width re-rank
      """WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
         pre AS (
           SELECT e.vec_id, e.embedding,
             list_aggregate(list_transform(list_zip(e.embedding[1:16], p.pe[1:16]),
               t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), 'sum')
             / (sqrt(list_aggregate(list_transform(e.embedding[1:16],
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(p.pe[1:16],
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS pre_raw
           FROM embeddings e, p WHERE e.vec_id <> 0
           ORDER BY pre_raw DESC, e.vec_id LIMIT 100)
         SELECT vec_id, round(pre_raw, 4) AS prefix_sim,
                round(cos_raw, 4) AS cos_sim FROM (
           SELECT pre.vec_id, pre.pre_raw,
             list_aggregate(list_transform(list_zip(pre.embedding, p.pe),
               t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), 'sum')
             / (sqrt(list_aggregate(list_transform(pre.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(p.pe,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos_raw
           FROM pre, p
           ORDER BY cos_raw DESC, pre.vec_id LIMIT 10)
         ORDER BY vec_id""",

    "dedup_containment" ->
      // exact recompute on raw shingle strings (no prefix filter — the
      // oracle's exactness is independent of the candidate pruning);
      // same shingle construction as the dedup_ngram_jaccard twin
      """WITH sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(string_split(text,' ')) - 2, 1)),
             i -> array_to_string((string_split(text,' '))[i+1:i+3], ' '))) AS s
           FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                round(CAST(count(*) AS DOUBLE) / a.n, 4) AS containment
         FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id <> b.doc_id
         GROUP BY a.doc_id, b.doc_id, a.n
         HAVING round(CAST(count(*) AS DOUBLE) / a.n, 4) >= 0.8
         ORDER BY doc_a, doc_b""",

    "window_funnel_steps" ->
      // sequential conditional mins as chained CTEs: each step's min is
      // taken only over events strictly after the previous step's time
      """WITH v AS (SELECT user_id, min(ts) AS tv FROM events
                    WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
                    JOIN v USING (user_id)
                    WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY 1),
            p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
                    JOIN c USING (user_id)
                    WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1)
         SELECT u.user_id, epoch_us(tv) AS view_us, epoch_us(tc) AS click_us,
                epoch_us(tp) AS purchase_us,
                CASE WHEN tp IS NOT NULL THEN 3 WHEN tc IS NOT NULL THEN 2
                     WHEN tv IS NOT NULL THEN 1 ELSE 0 END AS funnel_depth
         FROM (SELECT DISTINCT user_id FROM events) u
         LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
         LEFT JOIN p USING (user_id)
         ORDER BY user_id""",

    "dedup_substring_spans" ->
      // raw-string twin of the hash-keyed Spark plan (counts are hash-
      // invariant absent 64-bit collisions, the dedup_exact_hash rule)
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents WHERE len(string_split(text, ' ')) >= 8),
            sp AS (SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+8], ' ') AS span
                   FROM docs, unnest(range(len(toks) - 7)) t(i)),
            g AS (SELECT span, count(*) AS n_docs FROM sp GROUP BY span)
         SELECT doc_id, count(*) AS n_spans,
                CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
                floor((CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*)) * 10000.0 + 0.5) / 10000.0 AS dup_frac
         FROM sp JOIN g USING (span)
         GROUP BY doc_id ORDER BY doc_id""",

    "text_bigram_logprob" ->
      // same quantized-ln construction one model order up: conditional
      // bigram NLL = ln(prefix count) - ln(bigram count); docs with a
      // single token have no transitions and no row on either side
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         bgr AS (SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i+1] AS bg
                 FROM t, unnest(range(1, len(toks))) AS r(i)),
         fbg AS (SELECT bg, count(*) AS bg_cnt FROM bgr GROUP BY bg),
         fw1 AS (SELECT w1, count(*) AS w1_cnt FROM bgr GROUP BY w1)
         SELECT doc_id, count(*) AS n_bigrams,
                floor((CAST(sum(CAST(floor((ln(w1_cnt) - ln(bg_cnt)) * 1e6 + 0.5) / 1e6
                                     AS DECIMAL(18,10))) AS DOUBLE) / count(*))
                      * 10000.0 + 0.5) / 10000.0 AS avg_nll
         FROM bgr JOIN fbg USING (bg) JOIN fw1 USING (w1)
         GROUP BY doc_id ORDER BY doc_id""",

    "text_quality_classifier" ->
      // same ppm divisions (one double rounding each), same literal
      // weights and thresholds, pure integer score
      """WITH f AS (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                    AS n_distinct,
                  CAST(len(list_filter(string_split(text, ' '),
                       t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
           FROM documents),
         p AS (
           SELECT doc_id, n_tokens,
                  CAST(floor(n_distinct * 1000000.0 / n_tokens + 0.5) AS BIGINT)
                    AS rep_ppm,
                  CAST(floor(n_stop * 1000000.0 / n_tokens + 0.5) AS BIGINT)
                    AS stop_ppm
           FROM f)
         SELECT doc_id, n_tokens, rep_ppm, stop_ppm,
                rep_ppm + 4 * stop_ppm + 10000 * least(n_tokens, 64) AS score,
                CASE WHEN rep_ppm + 4 * stop_ppm + 10000 * least(n_tokens, 64)
                          >= 1400000 THEN 'keep'
                     WHEN rep_ppm + 4 * stop_ppm + 10000 * least(n_tokens, 64)
                          >= 1100000 THEN 'review'
                     ELSE 'drop' END AS verdict
         FROM p ORDER BY doc_id""",

    "table_quality_checks" ->
      // the same seven rules as UNION ALL one-row aggregates
      """WITH r AS (
           SELECT 'lineitem' AS table_name, 'quantity_in_1_50' AS rule,
                  count(*) AS n_checked,
                  CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1.0 AND 50.0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
           FROM lineitem
           UNION ALL
           SELECT 'lineitem', 'discount_in_0_0.1', count(*),
                  CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1)
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'lineitem', 'shipdate_in_range', count(*),
                  CAST(sum(CASE WHEN NOT (l_shipdate BETWEEN
                           TIMESTAMP '1992-01-01' AND TIMESTAMP '1998-12-31')
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM lineitem
           UNION ALL
           SELECT 'orders', 'custkey_in_customer', count(*),
                  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM orders LEFT JOIN customer ON o_custkey = c_custkey
           UNION ALL
           SELECT 'lineitem', 'orderkey_in_orders', count(*),
                  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
           UNION ALL
           SELECT 'customer', 'acctbal_not_null', count(*),
                  CAST(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM customer
           UNION ALL
           SELECT 'part', 'retailprice_positive', count(*),
                  CAST(sum(CASE WHEN p_retailprice <= 0.0 THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM part)
         SELECT table_name, rule, n_checked, n_violations,
                n_violations = 0 AS pass
         FROM r ORDER BY table_name, rule""",

    "text_hash_features" ->
      // same two-hex-digit bucket arithmetic (strpos ≡ instr, 1-based)
      """SELECT doc_id,
                CAST(((strpos('0123456789abcdef', substring(md5(tok), 1, 1)) - 1) * 16
                      + (strpos('0123456789abcdef', substring(md5(tok), 2, 1)) - 1))
                     % 64 AS INTEGER) AS bucket,
                count(*) AS tf,
                CAST(count(DISTINCT tok) AS BIGINT) AS n_terms
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents)
         GROUP BY 1, 2 ORDER BY doc_id, bucket""",

    "sample_temperature_weights" ->
      // identical one-float-step construction: sqrt(share) quantized to
      // ppm, then pure 64-bit integer largest-remainder apportionment
      """WITH l AS (SELECT lang, count(*) AS n_docs,
                  CAST(sum(CAST(length(text) - length(replace(text, ' ', '')) + 1
                           AS BIGINT)) AS BIGINT) AS lang_tokens
           FROM documents GROUP BY lang),
         t AS (SELECT *, CAST(sum(lang_tokens) OVER () AS BIGINT) AS total_toks
               FROM l),
         w AS (SELECT *, CAST(floor(sqrt(CAST(lang_tokens AS DOUBLE)
                   / CAST(total_toks AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
                   AS weight_ppm FROM t),
         s AS (SELECT *, CAST(sum(weight_ppm) OVER () AS BIGINT) AS sum_w,
                      total_toks // 2 AS budget FROM w),
         a AS (SELECT *, (budget * weight_ppm) // sum_w AS alloc_floor,
                      (budget * weight_ppm) % sum_w AS rem FROM s),
         r AS (SELECT *, budget - CAST(sum(alloc_floor) OVER () AS BIGINT)
                        AS leftover,
                      row_number() OVER (ORDER BY rem DESC, lang) AS rk FROM a)
         SELECT lang, n_docs, lang_tokens, weight_ppm,
                alloc_floor + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
                  AS alloc_tokens,
                ((alloc_floor + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END))
                 * 1000000) // lang_tokens AS rate_ppm
         FROM r ORDER BY lang""",

    "text_perplexity_bucket" ->
      // the bigram-NLL CTE verbatim, then per-lang terciles: both
      // engines emit bit-identical avg_nll (the text_bigram_logprob
      // gate), so ntile over (avg_nll, doc_id) is deterministic
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         bgr AS (SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i+1] AS bg
                 FROM t, unnest(range(1, len(toks))) AS r(i)),
         fbg AS (SELECT bg, count(*) AS bg_cnt FROM bgr GROUP BY bg),
         fw1 AS (SELECT w1, count(*) AS w1_cnt FROM bgr GROUP BY w1),
         sc AS (SELECT doc_id, count(*) AS n_bigrams,
                floor((CAST(sum(CAST(floor((ln(w1_cnt) - ln(bg_cnt)) * 1e6 + 0.5) / 1e6
                                     AS DECIMAL(18,10))) AS DOUBLE) / count(*))
                      * 10000.0 + 0.5) / 10000.0 AS avg_nll
                FROM bgr JOIN fbg USING (bg) JOIN fw1 USING (w1)
                GROUP BY doc_id)
         SELECT doc_id, lang, n_bigrams, avg_nll,
                CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS ppl_bucket
         FROM (SELECT sc.*, d.lang,
                      ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY avg_nll, doc_id) AS nt
               FROM sc JOIN documents d USING (doc_id))
         ORDER BY doc_id""",

    "window_rolling_distinct" ->
      // same coverage explode + (day, user) distinct + per-day count
      """WITH act AS (
           SELECT DISTINCT user_id,
                  (epoch_us(ts) - 1704067200000000) // 86400000000 AS d
           FROM events),
         cover AS (SELECT DISTINCT user_id, d + i AS report_day
                   FROM act, unnest(range(7)) r(i)),
         mx AS (SELECT max(d) AS max_d FROM act)
         SELECT CAST(report_day AS BIGINT) AS report_day,
                count(*) AS wau
         FROM cover, mx WHERE report_day <= max_d
         GROUP BY report_day ORDER BY report_day""",

    "window_retention_cohorts" ->
      // same fixed-epoch integer week arithmetic and bp division
      """WITH act AS (
           SELECT DISTINCT user_id,
                  (epoch_us(ts) - 1704067200000000) // 604800000000 AS w
           FROM events),
         coh AS (SELECT user_id, CAST(min(w) AS BIGINT) AS w0
                 FROM act GROUP BY user_id),
         siz AS (SELECT w0 AS cohort_week, count(*) AS n_cohort
                 FROM coh GROUP BY w0),
         ret AS (SELECT c.w0 AS cohort_week, a.w - c.w0 AS week_offset,
                        CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
                 FROM act a JOIN coh c USING (user_id)
                 WHERE a.w - c.w0 <= 4
                 GROUP BY 1, 2)
         SELECT cohort_week, week_offset, n_cohort, n_active,
                (n_active * 10000) // n_cohort AS retained_bp
         FROM ret JOIN siz USING (cohort_week)
         ORDER BY cohort_week, week_offset""",

    "sample_balanced_classes" ->
      // same md5 ranking, min class size, and ordered kept-set digest
      """WITH r AS (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
                  count(*) OVER (PARTITION BY lang) AS cls_n
           FROM documents),
         m AS (SELECT *, CAST(min(cls_n) OVER () AS BIGINT) AS min_n FROM r)
         SELECT lang, CAST(min(cls_n) AS BIGINT) AS n_docs,
                count(*) AS n_kept,
                md5(string_agg(CAST(doc_id AS VARCHAR), ','
                               ORDER BY doc_id)) AS kept_ids_md5
         FROM m WHERE rk <= min_n
         GROUP BY lang ORDER BY lang""",

    "pipeline_corpus_build" ->
      // the identical funnel: classifier score gate, min-doc_id dedup,
      // sqrt-temperature largest-remainder rates, 5-hex-digit bucket keep
      """WITH f AS (
           SELECT doc_id, lang, text,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                    AS n_distinct,
                  CAST(len(list_filter(string_split(text, ' '),
                       t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
           FROM documents),
         q AS (
           SELECT doc_id, lang, text, n_toks,
                  (CAST(floor(n_distinct * 1000000.0 / n_toks + 0.5) AS BIGINT)
                   + 4 * CAST(floor(n_stop * 1000000.0 / n_toks + 0.5) AS BIGINT)
                   + 10000 * least(n_toks, 64)) >= 1100000 AS q_ok
           FROM f),
         raw AS (SELECT lang, count(*) AS n_docs_raw,
                        CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT)
                          AS n_docs_quality
                 FROM q GROUP BY lang),
         uniq AS (
           SELECT doc_id, lang, n_toks FROM (
             SELECT doc_id, lang, n_toks,
                    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
             FROM q WHERE q_ok) WHERE rn = 1),
         l AS (SELECT lang, count(*) AS n_docs_unique,
                      CAST(sum(n_toks) AS BIGINT) AS lang_tokens
               FROM uniq GROUP BY lang),
         t AS (SELECT *, CAST(sum(lang_tokens) OVER () AS BIGINT) AS total_toks
               FROM l),
         w AS (SELECT *, CAST(floor(sqrt(CAST(lang_tokens AS DOUBLE)
                   / CAST(total_toks AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
                   AS weight_ppm FROM t),
         s AS (SELECT *, CAST(sum(weight_ppm) OVER () AS BIGINT) AS sum_w,
                      total_toks // 2 AS budget FROM w),
         a AS (SELECT *, (budget * weight_ppm) // sum_w AS alloc_floor,
                      (budget * weight_ppm) % sum_w AS rem FROM s),
         r AS (SELECT *, budget - CAST(sum(alloc_floor) OVER () AS BIGINT)
                        AS leftover,
                      row_number() OVER (ORDER BY rem DESC, lang) AS rk FROM a),
         rates AS (SELECT lang, n_docs_unique, lang_tokens,
                     least(((alloc_floor +
                       (CASE WHEN rk <= leftover THEN 1 ELSE 0 END)) * 1000000)
                       // lang_tokens, 1000000) AS rate_ppm
                   FROM r),
         k AS (SELECT u.lang, u.n_toks, rates.rate_ppm,
                      rates.n_docs_unique, rates.lang_tokens,
                      ((strpos('0123456789abcdef',
                          substring(md5(CAST(u.doc_id AS VARCHAR)), 1, 1)) - 1) * 65536
                      + (strpos('0123456789abcdef',
                          substring(md5(CAST(u.doc_id AS VARCHAR)), 2, 1)) - 1) * 4096
                      + (strpos('0123456789abcdef',
                          substring(md5(CAST(u.doc_id AS VARCHAR)), 3, 1)) - 1) * 256
                      + (strpos('0123456789abcdef',
                          substring(md5(CAST(u.doc_id AS VARCHAR)), 4, 1)) - 1) * 16
                      + (strpos('0123456789abcdef',
                          substring(md5(CAST(u.doc_id AS VARCHAR)), 5, 1)) - 1))
                        AS b
               FROM uniq u JOIN rates USING (lang))
         SELECT k.lang, min(raw.n_docs_raw) AS n_docs_raw,
                min(raw.n_docs_quality) AS n_docs_quality,
                min(k.n_docs_unique) AS n_docs_unique,
                min(k.lang_tokens) AS lang_tokens,
                min(k.rate_ppm) AS rate_ppm,
                CAST(sum(CASE WHEN k.b * 1000000 < k.rate_ppm * 1048576
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
                CAST(sum(CASE WHEN k.b * 1000000 < k.rate_ppm * 1048576
                         THEN k.n_toks ELSE 0 END) AS BIGINT) AS n_tokens_kept
         FROM k JOIN raw ON k.lang = raw.lang
         GROUP BY k.lang ORDER BY k.lang""",

    "join_null_aware_anti" ->
      // DuckDB's 3VL must agree: NOT IN over a null-bearing set is empty
      """SELECT
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN
              (SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN o_custkey END
               FROM orders)) AS not_in_nullable,
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders
               WHERE o_orderpriority = '1-URGENT')) AS not_in_clean,
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS
              (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderpriority = '1-URGENT')) AS not_exists""",

    "join_interval_overlap" ->
      // manual lag+cumsum sessionization (the cdc_sessionize twin, end =
      // last event + gap) x a VALUES campaign dim, same overlap predicate
      """WITH flagged AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         sess AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged),
         sw AS (SELECT user_id, min(ts_us) AS s_us,
                       max(ts_us) + 1800000000 AS e_us
                FROM sess GROUP BY user_id, sid),
         win AS (SELECT * FROM (VALUES
           (1, epoch_us(TIMESTAMP '2024-01-05 00:00:00'),
               epoch_us(TIMESTAMP '2024-01-08 00:00:00')),
           (2, epoch_us(TIMESTAMP '2024-01-12 12:00:00'),
               epoch_us(TIMESTAMP '2024-01-14 00:00:00')),
           (3, epoch_us(TIMESTAMP '2024-01-20 00:00:00'),
               epoch_us(TIMESTAMP '2024-01-25 00:00:00')))
           t(window_id, w_start_us, w_end_us))
         SELECT window_id, w_start_us, w_end_us,
                count(*) AS n_sessions,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                CAST(sum(least(e_us, w_end_us) - greatest(s_us, w_start_us))
                     AS BIGINT) AS total_overlap_us
         FROM sw JOIN win
           ON sw.s_us < win.w_end_us AND win.w_start_us < sw.e_us
         GROUP BY window_id, w_start_us, w_end_us
         ORDER BY window_id""",

    "join_scd2_pointintime" ->
      // same interval-containment lookup over the lead-closed history
      """WITH hist AS (
           SELECT user_id, event_id AS state_event_id,
                  event_type AS state_event_type,
                  epoch_us(ts) AS valid_from_us,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS valid_to_us
           FROM events),
         fact AS (SELECT event_id AS purchase_event_id, user_id,
                         epoch_us(ts) - 1 AS t_us
                  FROM events WHERE event_type = 'purchase')
         SELECT f.purchase_event_id, f.user_id,
                h.state_event_id, h.state_event_type,
                f.t_us - h.valid_from_us AS state_age_us
         FROM fact f LEFT JOIN hist h
           ON f.user_id = h.user_id
          AND h.valid_from_us <= f.t_us
          AND (h.valid_to_us IS NULL OR h.valid_to_us > f.t_us)
         ORDER BY f.purchase_event_id""",

    "text_dedup_lines" ->
      // raw-segment twin of the hash-keyed plan (counts hash-invariant
      // absent 64-bit collisions); coalesce('' ) matches Spark's empty
      // concat_ws when every segment is boilerplate
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
         seg AS (SELECT doc_id, CAST(i AS INTEGER) AS i,
                        array_to_string(toks[i*16+1 : i*16+16], ' ') AS seg
                 FROM t,
                      unnest(range(CAST(ceil(len(toks) / 16.0) AS BIGINT)))
                        r(i)),
         fr AS (SELECT seg, count(DISTINCT doc_id) AS ndocs
                FROM seg GROUP BY seg)
         SELECT doc_id, count(*) AS n_segments,
                CAST(sum(CASE WHEN ndocs >= 4 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_removed,
                md5(coalesce(
                  string_agg(CASE WHEN ndocs < 4 THEN seg END, ' '
                             ORDER BY i), '')) AS cleaned_md5
         FROM seg JOIN fr USING (seg)
         GROUP BY doc_id ORDER BY doc_id""",

    "window_gap_islands" ->
      // same change-flag -> running-sum numbering; unique (ts, event_id)
      // ordering makes island ids deterministic
      """WITH e AS (
           SELECT user_id, event_id, event_type, ts,
                  CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                       THEN 1 ELSE 0 END AS chg
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         i AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS island
               FROM e)
         SELECT user_id, island AS island_no, min(event_type) AS event_type,
                count(*) AS n_events,
                epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
         FROM i GROUP BY user_id, island ORDER BY user_id, island_no""",

    "vec_pca_power" ->
      // the three power iterations unrolled (graph_pagerank idiom): each
      // step's reduction is a LONG or DECIMAL(38,0) sum — order-free —
      // and each float step (two decimal->double casts, one divide, one
      // sqrt) is a single correctly-rounded IEEE operation chain
      """WITH e AS (
           SELECT vec_id, CAST(dim AS INTEGER) AS dim,
                  CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                    AS x_u
           FROM (SELECT vec_id, unnest(embedding) AS x,
                        unnest(range(len(embedding))) AS dim
                 FROM embeddings)),
         v0 AS (SELECT CAST(i AS INTEGER) AS dim, CAST(125000 AS BIGINT) AS v_u
                FROM unnest(range(64)) t(i)),
         s1 AS (SELECT vec_id, (s_raw - (s_raw % 1000000)) // 1000000 AS s_sc
                FROM (SELECT e.vec_id, CAST(sum(e.x_u * v.v_u) AS BIGINT)
                        AS s_raw
                      FROM e JOIN v0 v USING (dim) GROUP BY e.vec_id)),
         u1 AS (SELECT dim,
                  CAST(sum(CAST(e.x_u * s.s_sc AS DECIMAL(38,0)))
                       AS DECIMAL(38,0)) AS u_raw
                FROM e JOIN s1 s USING (vec_id) GROUP BY dim),
         n1 AS (SELECT dim, w, CAST(floor(w * 1e9 + 0.5) AS BIGINT) AS wq
                FROM (SELECT dim,
                        CAST(u_raw AS DOUBLE) / CAST(greatest(
                          CAST(max(abs(u_raw)) OVER () AS DECIMAL(38,0)),
                          CAST(1 AS DECIMAL(38,0))) AS DOUBLE) AS w
                      FROM u1)),
         v1 AS (SELECT dim,
                  CAST(floor(w / (sqrt(CAST(n2 AS DOUBLE)) / 1e9) * 1e6 + 0.5)
                       AS BIGINT) AS v_u
                FROM (SELECT dim, w,
                        CAST(sum(CAST(wq * wq AS DECIMAL(38,0))) OVER ()
                             AS DECIMAL(38,0)) AS n2
                      FROM n1)),
         s2 AS (SELECT vec_id, (s_raw - (s_raw % 1000000)) // 1000000 AS s_sc
                FROM (SELECT e.vec_id, CAST(sum(e.x_u * v.v_u) AS BIGINT)
                        AS s_raw
                      FROM e JOIN v1 v USING (dim) GROUP BY e.vec_id)),
         u2 AS (SELECT dim,
                  CAST(sum(CAST(e.x_u * s.s_sc AS DECIMAL(38,0)))
                       AS DECIMAL(38,0)) AS u_raw
                FROM e JOIN s2 s USING (vec_id) GROUP BY dim),
         n2_ AS (SELECT dim, w, CAST(floor(w * 1e9 + 0.5) AS BIGINT) AS wq
                FROM (SELECT dim,
                        CAST(u_raw AS DOUBLE) / CAST(greatest(
                          CAST(max(abs(u_raw)) OVER () AS DECIMAL(38,0)),
                          CAST(1 AS DECIMAL(38,0))) AS DOUBLE) AS w
                      FROM u2)),
         v2 AS (SELECT dim,
                  CAST(floor(w / (sqrt(CAST(n2 AS DOUBLE)) / 1e9) * 1e6 + 0.5)
                       AS BIGINT) AS v_u
                FROM (SELECT dim, w,
                        CAST(sum(CAST(wq * wq AS DECIMAL(38,0))) OVER ()
                             AS DECIMAL(38,0)) AS n2
                      FROM n2_)),
         s3 AS (SELECT vec_id, (s_raw - (s_raw % 1000000)) // 1000000 AS s_sc
                FROM (SELECT e.vec_id, CAST(sum(e.x_u * v.v_u) AS BIGINT)
                        AS s_raw
                      FROM e JOIN v2 v USING (dim) GROUP BY e.vec_id)),
         u3 AS (SELECT dim,
                  CAST(sum(CAST(e.x_u * s.s_sc AS DECIMAL(38,0)))
                       AS DECIMAL(38,0)) AS u_raw
                FROM e JOIN s3 s USING (vec_id) GROUP BY dim),
         n3 AS (SELECT dim, w, CAST(floor(w * 1e9 + 0.5) AS BIGINT) AS wq
                FROM (SELECT dim,
                        CAST(u_raw AS DOUBLE) / CAST(greatest(
                          CAST(max(abs(u_raw)) OVER () AS DECIMAL(38,0)),
                          CAST(1 AS DECIMAL(38,0))) AS DOUBLE) AS w
                      FROM u3)),
         v3 AS (SELECT dim,
                  CAST(floor(w / (sqrt(CAST(n2 AS DOUBLE)) / 1e9) * 1e6 + 0.5)
                       AS BIGINT) AS v_u
                FROM (SELECT dim, w,
                        CAST(sum(CAST(wq * wq AS DECIMAL(38,0))) OVER ()
                             AS DECIMAL(38,0)) AS n2
                      FROM n3))
         SELECT dim, v_u * (CASE WHEN tot < 0 THEN -1 ELSE 1 END)
                  AS loading_ppm
         FROM (SELECT dim, v_u, CAST(sum(v_u) OVER () AS BIGINT) AS tot
               FROM v3)
         ORDER BY dim""",

    "vec_label_centroids" ->
      """SELECT label, dim, count(*) AS n_vecs,
                floor((CAST(sum(CAST(v AS DECIMAL(20,10))) AS DOUBLE) / count(*))
                      * 10000.0 + 0.5) / 10000.0 AS centroid
         FROM (SELECT label, unnest(embedding) AS v,
                      unnest(range(len(embedding))) AS dim
               FROM embeddings)
         GROUP BY label, dim ORDER BY label, dim""",

    "text_tokenize_counts" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         GROUP BY token ORDER BY n DESC, token LIMIT 20""",

    "text_lang_stats" ->
      """SELECT lang, count(*) AS n_docs,
                floor((CAST(sum(n_chars) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_chars,
                floor((CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_tokens
         FROM documents GROUP BY lang ORDER BY lang""",

    "embed_norms" ->
      """SELECT label, count(*) AS n_vecs,
                floor((CAST(sum(CAST(sqrt(list_aggregate(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                      AS DECIMAL(18,8))) AS DOUBLE) / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_norm
         FROM embeddings GROUP BY label ORDER BY label""",

    "dedup_ngram_jaccard" ->
      """WITH sh AS (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(string_split(text,' ')) - 2, 1)),
             i -> array_to_string((string_split(text,' '))[i+1:i+3], ' '))) AS s
           FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 4) AS jaccard
         FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id, a.n, b.n
         HAVING round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 4) >= 0.5
         ORDER BY doc_a, doc_b""",

    "text_lang_id" ->
      """WITH scored AS (
           SELECT doc_id, lang,
             len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','is'))) AS hits_en,
             len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','y','que'))) AS hits_es,
             len(list_filter(string_split(text,' '), t -> t IN ('der','die','das','und','ist'))) AS hits_de,
             len(list_filter(string_split(text,' '), t -> t IN ('le','la','de','et','est'))) AS hits_fr
           FROM documents),
         pred AS (
           SELECT doc_id, lang,
             CASE
               WHEN hits_fr > hits_en AND hits_fr > hits_es AND hits_fr > hits_de THEN 'fr'
               WHEN hits_de > hits_en AND hits_de > hits_es AND hits_de > hits_fr THEN 'de'
               WHEN hits_es > hits_en AND hits_es > hits_de AND hits_es > hits_fr THEN 'es'
               ELSE 'en' END AS predicted
           FROM scored)
         SELECT lang, predicted, count(*) AS n_docs
         FROM pred GROUP BY lang, predicted ORDER BY lang, predicted""",

    "text_quality_score" ->
      """SELECT doc_id,
                len(string_split(text,' ')) AS n_tokens,
                floor((CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                      / len(string_split(text,' '))) * 10000.0 + 0.5) / 10000.0 AS distinct_ratio,
                floor(((CAST(length(text) AS DOUBLE) - len(string_split(text,' ')) + 1.0)
                      / len(string_split(text,' '))) * 10000.0 + 0.5) / 10000.0 AS avg_token_len,
                floor((CAST(len(list_filter(string_split(text,' '),
                        t -> t IN ('the','a','of','and','is'))) AS DOUBLE)
                      / len(string_split(text,' '))) * 10000.0 + 0.5) / 10000.0 AS stopword_ratio,
                floor((0.4 * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                             / len(string_split(text,' ')))
                    + 0.3 * least(len(string_split(text,' ')) / 100.0, 1.0)
                    + 0.3 * (1.0 - CAST(len(list_filter(string_split(text,' '),
                               t -> t IN ('the','a','of','and','is'))) AS DOUBLE)
                             / len(string_split(text,' ')))) * 10000.0 + 0.5) / 10000.0 AS quality
         FROM documents ORDER BY doc_id""",

    "text_repetition_ratio" ->
      // Gopher-style repetition filter: most-frequent token / bigram
      // fraction per doc; flag compares the QUANTIZED bigram fraction
      // (identical floor(x*1e4+0.5) on both engines). Single-token docs
      // have no bigrams → NULL fraction, flag 0 via coalesce.
      """WITH base AS (
           SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         tc AS (
           SELECT doc_id, tok, count(*) AS c
           FROM (SELECT doc_id, unnest(l) AS tok FROM base)
           GROUP BY doc_id, tok),
         tmx AS (
           SELECT doc_id, max(c) AS mx_tok, sum(c) AS n FROM tc GROUP BY doc_id),
         bc AS (
           SELECT doc_id, bg, count(*) AS c
           FROM (SELECT doc_id,
                        unnest(list_transform(range(len(l) - 1),
                               i -> l[i + 1] || ' ' || l[i + 2])) AS bg
                 FROM base WHERE len(l) >= 2)
           GROUP BY doc_id, bg),
         bmx AS (
           SELECT doc_id, max(c) AS mx_bg FROM bc GROUP BY doc_id)
         SELECT t.doc_id,
                CAST(t.n AS BIGINT) AS n_tokens,
                floor(CAST(t.mx_tok AS DOUBLE) / t.n * 10000.0 + 0.5) / 10000.0
                  AS top_tok_frac,
                floor(CAST(b.mx_bg AS DOUBLE) / (t.n - 1) * 10000.0 + 0.5) / 10000.0
                  AS top_bigram_frac,
                CAST(coalesce(
                  floor(CAST(b.mx_bg AS DOUBLE) / (t.n - 1) * 10000.0 + 0.5) / 10000.0,
                  0.0) > 0.18 AS INTEGER) AS is_repetitive
         FROM tmx t LEFT JOIN bmx b USING (doc_id)
         ORDER BY t.doc_id""",

    "text_token_regex" ->
      """SELECT doc_id,
                len(string_split(text,' ')) AS n_ws_tokens,
                len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_re_tokens
         FROM documents ORDER BY doc_id""",

    "mm_binary_meta" ->
      // + degenerate empty-payload fixture row (documentsWithFixture
      // twin): byte_len 0, md5('') and empty header hex both engines
      """WITH docs AS (SELECT doc_id, text, source FROM documents
                       UNION ALL SELECT -1, '', 'fixture')
         SELECT doc_id AS media_id,
                octet_length(encode(text)) AS byte_len,
                md5(text) AS payload_md5,
                hex(encode(substring(text, 1, 8))) AS header_hex,
                source AS origin
         FROM docs ORDER BY media_id""",

    "sim_topk_cosine" ->
      """SELECT vec_id, round(cos_raw, 4) AS cos_sim FROM (
           SELECT e.vec_id,
             list_aggregate(list_transform(list_zip(e.embedding, p.probe_emb),
               t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), 'sum')
             / (sqrt(list_aggregate(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                * sqrt(list_aggregate(list_transform(p.probe_emb,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos_raw
           FROM embeddings e,
                (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 0) p
           WHERE e.vec_id <> 0
           ORDER BY cos_raw DESC, e.vec_id LIMIT 10)
         ORDER BY vec_id""",

    // ── TPC-H classic shapes (round 3; TpchShapes.scala) ──────────────
    "q6_forecast_revenue" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                year(l_shipdate) AS l_year,
                round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           AND n1.n_name IN ('NATION_3','NATION_8') AND n2.n_name IN ('NATION_3','NATION_8')
           AND n1.n_name <> n2.n_name
         GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""",

    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
                floor((CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE))
                  * 10000.0 + 0.5) / 10000.0 AS mkt_share
         FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           JOIN region ON n2.n_regionkey = r_regionkey
         WHERE p_name LIKE '%widget%' AND r_name = 'EUROPE'
         GROUP BY 1 ORDER BY o_year""",

    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
                round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_profit
         FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%widget%'
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",

    "q12_priority_shipping" ->
      """SELECT l_returnflag,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q13_order_counts" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c_custkey, count(o_orderkey) AS c_count
               FROM customer LEFT OUTER JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
               GROUP BY c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    "q14_promo_revenue" ->
      """SELECT floor((100.0 *
                  CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                  / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE))
                  * 10000.0 + 0.5) / 10000.0 AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'""",

    "q15_top_supplier" ->
      """WITH revenue AS (
           SELECT l_suppkey,
                  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM revenue JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         ORDER BY s_suppkey""",

    "q17_small_qty_orders" ->
      """WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice
                     FROM lineitem JOIN part ON l_partkey = p_partkey
                     WHERE p_brand = 'Brand#1'),
            a AS (SELECT l_partkey AS a_partkey,
                         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty
                  FROM li GROUP BY l_partkey)
         SELECT floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0)
                  * 10000.0 + 0.5) / 10000.0 AS avg_yearly
         FROM li JOIN a ON l_partkey = a_partkey
         WHERE l_quantity < 0.5 * avg_qty""",

    "q19_discounted_revenue" ->
      """SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_quantity >= 1 AND l_quantity <= 40 AND (
               (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 10 AND l_quantity BETWEEN 1  AND 15)
            OR (p_brand = 'Brand#13' AND p_size BETWEEN 5  AND 20 AND l_quantity BETWEEN 10 AND 25)
            OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 20 AND 40))""",

    "q16_parts_supplier" ->
      """SELECT p_brand, p_type, p_size,
                count(DISTINCT l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) rel
           JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#1' AND p_size BETWEEN 10 AND 30
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q11_important_stock" ->
      """WITH per_part AS (
           SELECT l_partkey,
                  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS part_value
           FROM lineitem GROUP BY l_partkey)
         SELECT l_partkey AS p_partkey, part_value
         FROM per_part
         WHERE part_value > (SELECT CAST(sum(CAST(part_value AS DECIMAL(18,4))) AS DOUBLE) * 0.0005
                             FROM per_part)
         ORDER BY part_value DESC, p_partkey""",

    "q22_idle_customers" ->
      """SELECT c_nationkey, count(*) AS numcust,
                round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS totacctbal
         FROM customer
         WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
                            FROM customer WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY c_nationkey ORDER BY c_nationkey""",

    // ── Function-surface widening (round 3; FuncSurface/TextOps/VectorOps) ──
    "agg_regression" ->
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice/1000.0 AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(CAST(sum(CAST(l_quantity*(l_extendedprice/1000.0) AS DECIMAL(28,8))) AS DECIMAL(28,4)) AS DOUBLE) AS sxy,
             CAST(CAST(sum(CAST(l_quantity*l_quantity AS DECIMAL(28,8))) AS DECIMAL(28,4)) AS DOUBLE) AS sxx,
             CAST(CAST(sum(CAST((l_extendedprice/1000.0)*(l_extendedprice/1000.0) AS DECIMAL(28,8))) AS DECIMAL(28,4)) AS DOUBLE) AS syy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           sign((CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx))
             * floor(abs((CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx)) * 10000.0 + 0.5) / 10000.0 AS slope,
           sign((sy - ((CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx)) * sx) / CAST(n AS DOUBLE))
             * floor(abs((sy - ((CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx)) * sx) / CAST(n AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS intercept,
           floor(((CAST(n AS DOUBLE)*sxy - sx*sy) * (CAST(n AS DOUBLE)*sxy - sx*sy)
             / ((CAST(n AS DOUBLE)*sxx - sx*sx) * (CAST(n AS DOUBLE)*syy - sy*sy))) * 10000.0 + 0.5) / 10000.0 AS r2
         FROM m ORDER BY l_returnflag""",

    "cond_null_funcs" ->
      """SELECT p_partkey,
           sign(coalesce(p_retailprice / nullif(CAST(p_size - 5 AS DOUBLE), 0.0), -1.0))
             * floor(abs(coalesce(p_retailprice / nullif(CAST(p_size - 5 AS DOUBLE), 0.0), -1.0)) * 10000.0 + 0.5) / 10000.0 AS price_per_size,
           nullif(p_size, 10) AS size_or_null,
           greatest(least(p_size, 40), 5) AS size_clamped,
           coalesce(nullif(p_brand, 'Brand#1'), p_type) AS brand_or_type
         FROM part ORDER BY p_partkey""",

    "ts_format_funcs" ->
      """SELECT event_id,
           strftime(ts, '%Y-%m-%d') AS day_str,
           strftime(ts, '%Y-%m') AS month_str,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(minute(ts) AS INTEGER) AS m,
           CAST(second(ts) AS INTEGER) AS s,
           epoch_us(ts) // 1000000 AS epoch_s
         FROM events ORDER BY event_id""",

    "array_basic_ops" ->
      """SELECT vec_id,
           len(embedding) AS n_dims,
           len(list_distinct(embedding)) AS n_distinct,
           sign(mx) * floor(abs(mx) * 10000.0 + 0.5) / 10000.0 AS max_v,
           sign(mn) * floor(abs(mn) * 10000.0 + 0.5) / 10000.0 AS min_v,
           sign(h4) * floor(abs(h4) * 10000.0 + 0.5) / 10000.0 AS head4_sum
         FROM (SELECT vec_id, embedding,
                 list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mx,
                 list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mn,
                 list_aggregate(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)), 'sum') AS h4
               FROM embeddings)
         ORDER BY vec_id""",

    "text_pack_sequences" ->
      """WITH t AS (SELECT doc_id, lang,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
            c AS (SELECT *, coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM t)
         SELECT lang, CAST(cum_before // 2048 AS BIGINT) AS bin,
                count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_sum,
                floor((CAST(sum(n_tok) AS DOUBLE) / 2048.0) * 10000.0 + 0.5) / 10000.0 AS fill_ratio
         FROM c GROUP BY lang, CAST(cum_before // 2048 AS BIGINT)
         ORDER BY lang, bin""",

    "text_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
            cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
            m AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                    sum(CAST(CAST(c AS DOUBLE) * (floor(ln(c) * 1000000.0 + 0.5) / 1000000.0)
                        AS DECIMAL(28,10))) AS clnc
                  FROM cnt GROUP BY doc_id)
         SELECT doc_id, n AS n_tokens,
           floor(((floor(ln(n) * 1000000.0 + 0.5) / 1000000.0)
                  - CAST(clnc AS DOUBLE) / CAST(n AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS entropy_nats
         FROM m ORDER BY doc_id""",

    "embed_quantize" ->
      """WITH v AS (SELECT vec_id,
                    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd FROM embeddings),
            sc AS (SELECT vec_id, vd,
                     list_max(list_transform(vd, x -> abs(x))) / 127.0 AS scale FROM v)
         SELECT vec_id,
           floor(scale * 1000000.0 + 0.5) / 1000000.0 AS scale_q,
           CAST(list_aggregate(list_transform(vd, x -> CAST(floor(x / scale + 0.5) AS BIGINT)), 'sum') AS BIGINT) AS q_sum,
           CAST(list_min(list_transform(vd, x -> CAST(floor(x / scale + 0.5) AS INTEGER))) AS INTEGER) AS q_min,
           CAST(list_max(list_transform(vd, x -> CAST(floor(x / scale + 0.5) AS INTEGER))) AS INTEGER) AS q_max
         FROM sc WHERE scale > 0 ORDER BY vec_id""",

    "q2_min_cost_supplier" ->
      """WITH avgp AS (
           SELECT l_partkey, l_suppkey,
                  floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*))
                    * 10000.0 + 0.5) / 10000.0 AS avg_price
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_size BETWEEN 10 AND 20
           GROUP BY l_partkey, l_suppkey),
         minp AS (SELECT l_partkey AS m_partkey, min(avg_price) AS min_price
                  FROM avgp GROUP BY l_partkey)
         SELECT l_partkey AS p_partkey, s_suppkey, s_name, avg_price
         FROM avgp
           JOIN minp ON l_partkey = m_partkey AND avg_price = min_price
           JOIN supplier ON l_suppkey = s_suppkey
         ORDER BY p_partkey, s_suppkey""",

    "q20_potential_promotion" ->
      """WITH parts AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
         perps AS (
           SELECT l_partkey, l_suppkey,
             sum(CASE WHEN l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
                      THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS avail_qty,
             sum(CASE WHEN l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
                      THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS demand_qty
           FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM parts)
           GROUP BY l_partkey, l_suppkey),
         qual AS (SELECT DISTINCT l_suppkey FROM perps
                  WHERE demand_qty > 0 AND avail_qty * 2 > demand_qty)
         SELECT s_suppkey, s_name
         FROM supplier JOIN qual ON s_suppkey = l_suppkey
         WHERE s_nationkey < 5
         ORDER BY s_suppkey""",

    "q21_late_suppliers" ->
      """WITH flags AS (
           SELECT l_orderkey, l_suppkey,
                  max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS is_late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY l_orderkey, l_suppkey),
         w AS (SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                      sum(is_late) OVER (PARTITION BY l_orderkey) AS n_late
               FROM flags)
         SELECT s_suppkey, s_name, numwait FROM (
           SELECT l_suppkey, count(*) AS numwait
           FROM w WHERE is_late = 1 AND n_supp > 1 AND n_late = 1
           GROUP BY l_suppkey)
           JOIN supplier ON l_suppkey = s_suppkey
         ORDER BY numwait DESC, s_name LIMIT 20""",

    "string_pad_funcs" ->
      """SELECT p_partkey,
                lpad(p_brand, 12, '*') AS brand_lpad,
                rpad(p_type, 10, '.') AS type_rpad,
                left(p_name, 4) AS name_left,
                right(p_name, 3) AS name_right,
                split_part(p_name, ' ', 1) AS first_word,
                translate(p_type, 'AEO', 'aeo') AS type_translated,
                repeat(p_brand, 2) AS brand_twice,
                reverse(p_name) AS name_rev
         FROM part ORDER BY p_partkey""",

    "window_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
                floor((CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
                       / CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE))
                      * 10000.0 + 0.5) / 10000.0 AS mov_avg
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "agg_count_distinct_multi" ->
      """SELECT c_mktsegment,
                count(DISTINCT c_nationkey) AS n_nations,
                count(DISTINCT floor(c_acctbal / 1000.0)) AS n_bal_buckets,
                count(*) AS n_cust
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "table_profile_stats" ->
      """WITH melted AS (
           SELECT 'o_orderstatus' AS col_name, CAST(o_orderstatus AS VARCHAR) AS v FROM orders
           UNION ALL
           SELECT 'o_orderpriority' AS col_name, CAST(o_orderpriority AS VARCHAR) AS v FROM orders)
         SELECT col_name, count(*) AS n_rows,
                CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                count(DISTINCT v) AS n_distinct,
                min(v) AS min_v, max(v) AS max_v
         FROM melted GROUP BY col_name ORDER BY col_name""",

    "text_vocab_ids" ->
      """SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok) - 1 AS INTEGER) AS vocab_id,
                tok, cnt
         FROM (SELECT tok, count(*) AS cnt
               FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
               GROUP BY tok)
         QUALIFY vocab_id < 100
         ORDER BY vocab_id""",

    "sql_recursive_cte" ->
      """WITH RECURSIVE months(m) AS (
           SELECT CAST('1995-01-01' AS DATE)
           UNION ALL
           SELECT m + INTERVAL 1 MONTH FROM months WHERE m < CAST('2001-08-01' AS DATE)),
         per_month AS (
           SELECT date_trunc('month', o_orderdate) AS om, count(*) AS n
           FROM orders GROUP BY 1)
         SELECT epoch_ms(CAST(m AS TIMESTAMP)) AS month_start_ms,
                coalesce(n, 0) AS n_orders
         FROM months LEFT JOIN per_month ON CAST(m AS TIMESTAMP) = om
         ORDER BY month_start_ms""",

    "join_lateral_topk" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
         FROM customer,
           LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                    WHERE o_custkey = c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 1)
         WHERE c_mktsegment = 'BUILDING'
         ORDER BY c_custkey""",

    // stream-static joins are stateless: streaming result == batch join,
    // so the oracle is the direct batch recomputation.
    "cdc_stream_static_join" ->
      """SELECT event_id, user_id, first_us, epoch_us(ts) - first_us AS since_first_us
         FROM events JOIN (SELECT user_id AS d_user, epoch_us(min(ts)) AS first_us
                           FROM events GROUP BY user_id)
           ON user_id = d_user
         ORDER BY event_id""",

    "math_extended_funcs" ->
      """SELECT c_custkey,
                CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
                CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
                CAST(sign(c_acctbal) AS INTEGER) AS bal_sign,
                CAST(((c_custkey % 7) + 7) % 7 AS BIGINT) AS key_mod7,
                floor(sqrt(abs(c_acctbal)) * 10000.0 + 0.5) / 10000.0 AS bal_sqrt
         FROM customer ORDER BY c_custkey""",

    "posexplode_outer_tokens" ->
      """SELECT doc_id,
                CASE WHEN long_tok IS NULL THEN NULL
                     ELSE CAST(pos1 - 1 AS INTEGER) END AS pos,
                long_tok
         FROM (SELECT doc_id,
                 unnest(CASE WHEN len(lt) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE lt END) AS long_tok,
                 unnest(CASE WHEN len(lt) = 0 THEN [CAST(NULL AS BIGINT)]
                        ELSE range(1, len(lt) + 1) END) AS pos1
               FROM (SELECT doc_id,
                       list_filter(string_split(text, ' '), t -> length(t) >= 8) AS lt
                     FROM documents))
         ORDER BY doc_id, pos NULLS FIRST""",

    "map_explode_entries" ->
      """SELECT user_id, event_type AS etype, count(*) AS n_events
         FROM events GROUP BY user_id, event_type
         ORDER BY user_id, etype""",

    "join_right_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_urgent
         FROM (SELECT o_custkey, o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') o
           RIGHT OUTER JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",

    "csv_line_roundtrip" ->
      """SELECT event_id,
                concat_ws(',', event_id, user_id, event_type) AS line,
                user_id AS rt_user_id,
                event_type AS rt_event_type
         FROM events ORDER BY event_id""",

    "binary_codec_funcs" ->
      """SELECT doc_id,
                to_base64(encode(text)) AS b64,
                octet_length(encode(text)) AS byte_len,
                octet_length(from_base64(to_base64(encode(text)))) AS rt_byte_len
         FROM documents ORDER BY doc_id""",

    "join_full_outer" ->
      """SELECT epoch_ms(coalesce(om, sm)) AS month_ms,
                coalesce(n_orders, 0) AS n_orders,
                coalesce(n_ship_lines, 0) AS n_ship_lines
         FROM (SELECT date_trunc('month', o_orderdate) AS om, count(*) AS n_orders
               FROM orders GROUP BY 1) o
           FULL OUTER JOIN
              (SELECT date_trunc('month', l_shipdate) AS sm, count(*) AS n_ship_lines
               FROM lineitem GROUP BY 1) l
           ON om = sm
         ORDER BY month_ms""",

    "set_ops_all" ->
      """WITH b AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
            m AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'),
            ea AS (SELECT c_nationkey FROM b EXCEPT ALL SELECT c_nationkey FROM m),
            ia AS (SELECT c_nationkey FROM b INTERSECT ALL SELECT c_nationkey FROM m)
         SELECT op, c_nationkey, n FROM (
           SELECT 'except_all' AS op, c_nationkey, count(*) AS n FROM ea GROUP BY 2
           UNION ALL
           SELECT 'intersect_all' AS op, c_nationkey, count(*) AS n FROM ia GROUP BY 2)
         ORDER BY op, c_nationkey""",

    "sample_group_hash_topk" ->
      """SELECT lang, CAST(rk AS INTEGER) AS rk, doc_id, h FROM (
           SELECT lang, doc_id, md5(text) AS h,
                  row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
           FROM documents)
         WHERE rk <= 3 ORDER BY lang, rk""",

    "sort_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 10 OFFSET 20""",

    // ── round 4: Spark-4-era surface ──────────────────────────────────
    // streaming RocksDB variant shares the batch latest-state oracle —
    // the gate proves the state-store provider is semantics-neutral
    "cdc_stream_stateful_rocksdb" -> latestStateSql,

    "agg_listagg" ->
      """SELECT r.r_name, string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
                count(*) AS n_nations
         FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name ORDER BY r.r_name""",

    "agg_percentile_disc" ->
      """SELECT l_returnflag,
                quantile_disc(l_quantity, 0.25) AS p25_qty,
                quantile_disc(l_quantity, 0.50) AS p50_qty,
                quantile_disc(l_quantity, 0.95) AS p95_qty,
                quantile_disc(l_extendedprice, 0.50) AS p50_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // the bitmap two-level plan must equal plain count(DISTINCT ...)
    "agg_bitmap_distinct" ->
      """SELECT o_orderpriority,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
                CAST(count(*) AS BIGINT) AS n_orders
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "json_variant_ops" ->
      """SELECT event_type, count(*) AS n, count(k) AS n_k,
                min(k) AS min_k, max(k) AS max_k,
                CAST(sum(k) AS BIGINT) AS sum_k
         FROM (SELECT event_type, TRY_CAST(props->>'$.k' AS INTEGER) AS k FROM events)
         GROUP BY event_type ORDER BY event_type""",

    // collation-aware grouping of the case-mangled copy ≡ grouping the
    // clean column
    "string_collation_ci" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY lang ORDER BY lang""",

    "ts_interval_arith" ->
      """SELECT event_id,
                epoch_ms(ts + INTERVAL 90 DAY) AS plus_90d_ms,
                epoch_ms(ts - INTERVAL 6 HOUR) AS minus_6h_ms,
                epoch_ms(ts + INTERVAL 1 DAY + INTERVAL 12 HOUR) AS plus_36h_ms,
                epoch_ms(ts + INTERVAL 30 MINUTE) AS plus_30m_ms
         FROM events ORDER BY event_id""",

    // map-free recomputation of the map_filter/transform_values/
    // map_zip_with scalars (map layouts are engine-specific)
    "map_transform_ops" ->
      """WITH t AS (SELECT user_id, event_type, count(*) AS n
                    FROM events GROUP BY 1, 2)
         SELECT user_id,
                count(*) AS n_types,
                count(*) FILTER (WHERE n >= 3) AS n_hot_types,
                CAST(2 * coalesce(sum(n) FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS clicks_x2,
                CAST(2 * coalesce(sum(n) FILTER (WHERE event_type = 'view'), 0) AS BIGINT) AS views_x2
         FROM t GROUP BY user_id ORDER BY user_id""",

    // no re-parse: each part recomputed from the source columns, so the
    // gate proves parse_url inverts the construction exactly
    "url_parse_funcs" ->
      """SELECT doc_id,
                'https' AS proto,
                'cdn.example.com' AS host,
                '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
                source AS q_src
         FROM documents ORDER BY doc_id""",

    "text_edit_distance" ->
      """SELECT doc_id,
                string_split(text, ' ')[1]  AS tok_first,
                string_split(text, ' ')[-1] AS tok_last,
                CAST(levenshtein(string_split(text, ' ')[1], string_split(text, ' ')[-1]) AS INTEGER) AS lev_fl,
                CAST(levenshtein(string_split(text, ' ')[1], 'spark') AS INTEGER) AS lev_probe
         FROM documents ORDER BY doc_id""",

    "text_regexp_funcs" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS INTEGER) AS n_long,
                coalesce(nullif(regexp_extract(text, '[a-z]{6,}'), ''), '-') AS first_long,
                CAST(CASE WHEN regexp_matches(text, 'table|spark')
                          THEN strpos(text, regexp_extract(text, 'table|spark'))
                          ELSE 0 END AS INTEGER) AS pos_lit
         FROM documents ORDER BY doc_id""",

    "gen_inline_zip" ->
      """SELECT tok, len, n FROM (
           SELECT tok, CAST(max(length(tok)) AS BIGINT) AS len, count(*) AS n
           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
           WHERE length(tok) >= 6
           GROUP BY tok ORDER BY n DESC, tok LIMIT 20)
         ORDER BY tok""",

    "sim_knn_join" ->
      """WITH p AS (SELECT vec_id AS probe_id, embedding AS p_emb
                    FROM embeddings WHERE vec_id < 5),
            c AS (SELECT vec_id AS cand_id, embedding FROM embeddings),
            s AS (SELECT p.probe_id, c.cand_id,
                    list_aggregate(list_transform(list_zip(c.embedding, p.p_emb),
                      t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), 'sum')
                    / (sqrt(list_aggregate(list_transform(c.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                       * sqrt(list_aggregate(list_transform(p.p_emb,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos_raw
                  FROM c, p WHERE c.cand_id <> p.probe_id)
         SELECT probe_id, CAST(rk AS INTEGER) AS rk, cand_id,
                round(cos_raw, 4) AS cos_sim
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY probe_id ORDER BY cos_raw DESC, cand_id) AS rk
               FROM s)
         WHERE rk <= 3 ORDER BY probe_id, rk""",

    // round 5 — nested-JSON shred, deterministic mode, TF-IDF
    "json_nested_shred" ->
      """SELECT l_orderkey AS o_orderkey,
                count(*) AS n_items,
                min(l_linenumber) AS first_ln,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
                CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
         FROM lineitem WHERE l_orderkey < 1000
         GROUP BY 1 ORDER BY 1""",

    "agg_mode_freq" ->
      """SELECT o_orderstatus,
                arg_max(o_orderpriority,
                        cnt * 1048576 - CAST(substr(o_orderpriority, 1, 1) AS BIGINT)) AS mode_priority,
                max(cnt) AS mode_n,
                CAST(sum(cnt) AS BIGINT) AS n_orders
         FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
               FROM orders GROUP BY 1, 2)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "text_tfidf" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
              nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
              tokall AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
              dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tokall GROUP BY tok),
              tf AS (SELECT doc_id, len(toks) AS len, unnest(toks) AS tok
                     FROM docs WHERE doc_id < 50),
              cnts AS (SELECT doc_id, tok, len, count(*) AS cnt FROM tf GROUP BY 1, 2, 3),
              scored AS (SELECT c.doc_id, c.tok,
                                floor(CAST(c.cnt AS DOUBLE) / c.len
                                      * (floor(ln((SELECT n FROM nd) / f.df) * 1000000.0 + 0.5) / 1000000.0)
                                      * 1000000.0 + 0.5) / 1000000.0 AS tfidf
                         FROM cnts c JOIN dfreq f USING (tok))
         SELECT doc_id, tok, tfidf
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
               FROM scored)
         WHERE rn <= 5 ORDER BY doc_id, tfidf DESC, tok""",

    "text_pii_redact" ->
      """WITH p AS (SELECT doc_id, length(text) AS text_len,
                           text || ' contact user' || CAST(doc_id AS VARCHAR)
                                || '@mail.example.com call +1-555-'
                                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii
                    FROM documents),
              r AS (SELECT doc_id, text_len,
                           regexp_replace(regexp_replace(pii,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
                               '\+1-555-[0-9][0-9][0-9][0-9]', '<PHONE>', 'g') AS redacted
                    FROM p)
         SELECT doc_id,
                substring(redacted, text_len + 1) AS redacted_tail,
                CAST(length(redacted) - text_len AS INTEGER) AS tail_len,
                CAST(len(regexp_extract_all(redacted,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS INTEGER) AS n_residual_email,
                CAST(len(regexp_extract_all(redacted,
                    '\+1-555-[0-9][0-9][0-9][0-9]')) AS INTEGER) AS n_residual_phone
         FROM r ORDER BY doc_id""",

    "text_decontaminate" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents WHERE len(string_split(text, ' ')) >= 8),
              sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+8], ' ') AS shingle
                     FROM docs, unnest(range(len(toks) - 7)) t(i)),
              bench AS (SELECT shingle, doc_id AS bench_doc FROM sh WHERE doc_id % 50 = 0)
         SELECT s.doc_id,
                count(DISTINCT s.shingle) AS n_shingles,
                count(DISTINCT b.bench_doc) AS n_bench_docs
         FROM sh s JOIN bench b USING (shingle)
         WHERE s.doc_id % 50 <> 0
         GROUP BY s.doc_id ORDER BY s.doc_id""",

    "xml_roundtrip" ->
      // no XML on the oracle side on purpose: every output column is
      // recomputed directly from the source columns, so the gate proves
      // to_xml -> from_xml inverts the construction losslessly
      """SELECT o_orderkey, o_orderstatus AS status, o_orderpriority AS priority,
                o_totalprice AS price,
                CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  AS INTEGER) AS odate_day
         FROM orders ORDER BY o_orderkey""",

    "array_hof_ops" ->
      """SELECT vec_id,
           CAST(len(list_filter(vd, x -> x > 0.0)) AS INTEGER) AS n_pos,
           CAST(CASE WHEN list_aggregate(list_transform(vd, x -> abs(x) > 0.25),
                  'bool_or') THEN 1 ELSE 0 END AS INTEGER) AS has_big,
           CAST(CASE WHEN list_aggregate(list_transform(vd, x -> abs(x) < 1.0),
                  'bool_and') THEN 1 ELSE 0 END AS INTEGER) AS all_lt1,
           floor(sqrt(list_aggregate(list_transform(vd, x -> x * x), 'sum'))
             * 10000.0 + 0.5) / 10000.0 AS l2_norm
         FROM (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
               FROM embeddings)
         ORDER BY vec_id""",

    "agg_approx_top_k" ->
      // exact twin is sound because the sketch capacity (1024) exceeds
      // the corpus vocabulary, making approx_top_k counts exact; the
      // (cnt desc, token) sort + late LIMIT pins the boundary on both
      // engines (Modern.aggApproxTopK has the argument)
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         SELECT token, count(*) AS cnt
         FROM tok WHERE token <> ''
         GROUP BY token ORDER BY cnt DESC, token LIMIT 20""",

    "graph_pagerank" -> pageRankSql,
    "graph_label_propagation" -> labelPropSql,

    "mm_patch_grid" ->
      // ASCII fixture: char positions == byte positions, so VARCHAR
      // substring mirrors the binary slice and md5 over the slice is
      // engine-independent (the mm_binary_meta argument)
      // docs CTE adds the degenerate empty-payload fixture row: range(0)
      // emits zero patches for it, gate-proving the query's np>0 guard
      """WITH docs AS (SELECT doc_id, text FROM documents
                       UNION ALL SELECT -1, '')
         SELECT doc_id AS media_id,
                CAST(i // 8 AS INTEGER) AS patch_row,
                CAST(i % 8 AS INTEGER) AS patch_col,
                CAST(least(16, octet_length(encode(text)) - i * 16) AS INTEGER) AS patch_len,
                md5(substring(text, CAST(i * 16 + 1 AS INTEGER), 16)) AS patch_md5
         FROM docs,
              unnest(range(CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT))) AS t(i)
         ORDER BY media_id, patch_row, patch_col""",

    "mm_audio_window" ->
      // exact integer byte sums (ASCII fixture: ascii == byte value);
      // only the mean is rounded — identical-IEEE HALF_UP both sides
      // docs CTE adds the degenerate empty-text fixture row: one empty
      // window with NULL byte_sum/mean, gate-proving the query's
      // empty-window guard (list_aggregate([], 'sum') IS NULL here)
      """WITH docs AS (SELECT doc_id, text FROM documents
                       UNION ALL SELECT -1, ''),
         w AS (
           SELECT doc_id AS media_id, i AS win_idx,
                  substring(text, CAST(i * 32 + 1 AS INTEGER), 64) AS win
           FROM docs,
                unnest(range(CAST(greatest(floor((octet_length(encode(text)) - 64) / 32.0) + 1, 1) AS BIGINT))) AS t(i))
         SELECT media_id, CAST(win_idx AS INTEGER) AS win_idx,
                CAST(length(win) AS INTEGER) AS win_len,
                CAST(list_aggregate(list_transform(range(length(win)),
                    i -> ascii(substring(win, CAST(i + 1 AS INTEGER), 1))), 'sum') AS BIGINT) AS byte_sum,
                floor((CAST(list_aggregate(list_transform(range(length(win)),
                    i -> ascii(substring(win, CAST(i + 1 AS INTEGER), 1))), 'sum') AS DOUBLE)
                  / length(win)) * 10000.0 + 0.5) / 10000.0 AS byte_mean
         FROM w ORDER BY media_id, win_idx""",

    "url_canonicalize_dedup" ->
      """WITH u AS (SELECT doc_id,
             'HTTPS://CDN.Example.COM/doc/' || CAST(doc_id % 100 AS VARCHAR)
               || '?utm_source=' || source || '&lang=' || lang
               || '&utm_campaign=c' || CAST(doc_id % 7 AS VARCHAR)
               || '#sec' || CAST(doc_id % 5 AS VARCHAR) AS raw
           FROM documents),
         f AS (SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(raw, '#.*$', ''),
                 '[?&]utm_[A-Za-z_]*=[^&#]*', '', 'g'),
               '^([^?]*)&', '\1?') AS fixedq
           FROM u),
         c AS (SELECT doc_id,
             lower(regexp_extract(fixedq, '^([A-Za-z]+://[^/]+)', 1))
               || regexp_extract(fixedq, '^[A-Za-z]+://[^/]+(.*)$', 1) AS canonical_url
           FROM f)
         SELECT canonical_url, count(*) AS n_variants, min(doc_id) AS rep_doc
         FROM c GROUP BY canonical_url ORDER BY canonical_url""",

    "agg_theta_setops" ->
      // below nominal capacity theta is exact: the sketch set algebra
      // must equal DuckDB's exact distinct counts/intersections
      """SELECT
           (SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'click') AS n_click,
           (SELECT count(DISTINCT user_id) FROM events WHERE event_type = 'view') AS n_view,
           (SELECT count(DISTINCT e1.user_id) FROM events e1
            WHERE e1.event_type = 'click'
              AND e1.user_id IN (SELECT user_id FROM events WHERE event_type = 'view')) AS n_both,
           (SELECT count(DISTINCT e1.user_id) FROM events e1
            WHERE e1.event_type = 'click'
              AND e1.user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'view')) AS n_click_only""",

    "sql_session_variable" ->
      // the oracle inlines the variable's defining subquery — a variable
      // reference is semantically a folded constant (max*0.5 is exact in
      // binary doubles, so the threshold is bit-identical)
      """SELECT o_orderpriority, count(*) AS n_orders, min(o_orderkey) AS min_key
         FROM orders WHERE o_totalprice > (SELECT max(o_totalprice) * 0.5 FROM orders)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "sql_exec_immediate" ->
      // dynamic SQL + named parameter binding ≡ the inline literal query
      """SELECT c_mktsegment, count(*) AS n_cust, min(c_custkey) AS min_key
         FROM customer WHERE c_acctbal > 1000.0
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "sql_udf_scalar" ->
      // the UDF body inlined by hand — SQL UDFs are analysis-time macros
      """SELECT l_returnflag,
           round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
           count(*) AS n_items
         FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sql_udf_table" ->
      // the UDTF fan-out re-expressed as unnest: same per-row generator
      """SELECT tok, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         GROUP BY tok HAVING count(*) >= 5 ORDER BY tok""",

    "sql_scripting" ->
      // the WHILE loop unrolled: same left-to-right double accumulation
      // over the three per-year DECIMAL(18,4)-exact sums
      """SELECT CAST(1995 AS INT) AS y0, CAST(1997 AS INT) AS y1,
           round((SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  FROM orders WHERE year(o_orderdate) = 1995)
               + (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  FROM orders WHERE year(o_orderdate) = 1996)
               + (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                  FROM orders WHERE year(o_orderdate) = 1997), 4) AS total_price""",

    "source_partitioned_roundtrip" ->
      // the oracle aggregates the ORIGINAL parquet under the same
      // predicate: hash match ⇒ partitioned write/read lossless and the
      // directory pruning semantics-preserving
      """SELECT o_orderstatus, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
         FROM orders WHERE year(o_orderdate) = 1995
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "join_dpp_partitioned" ->
      // the runtime-pruned join restated as a static IN-subquery: a hash
      // match proves dynamic pruning only changed WHEN the partition set
      // was known, never WHAT qualified
      """SELECT year(o_orderdate) AS o_year, o_orderstatus,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
         FROM orders
         WHERE year(o_orderdate) IN
           (SELECT DISTINCT year(l_shipdate) FROM lineitem
            WHERE year(l_shipdate) IN (1995, 1996))
         GROUP BY 1, 2 ORDER BY o_year, o_orderstatus""",

    "layout_zorder_cluster" ->
      // the same Morton interleave in DuckDB operator syntax: bit i of
      // x → bit 2i, bit i of y → bit 2i+1; all-integer, exact match
      s"""WITH c AS (
           SELECT l_orderkey % 65536 AS xk, l_partkey % 65536 AS yk
           FROM lineitem),
         z AS (SELECT xk, yk,
           ${(0 until 16).map(i =>
             s"(((xk >> $i) & 1) << ${2 * i}) + (((yk >> $i) & 1) << ${2 * i + 1})")
             .mkString(" + ")} AS zv
           FROM c)
         SELECT zv // 16777216 AS bucket, count(*) AS n_rows,
           min(xk) AS min_x, max(xk) AS max_x,
           min(yk) AS min_y, max(yk) AS max_y
         FROM z GROUP BY 1 ORDER BY bucket""",

    "text_filter_funnel" ->
      // the four conjunctive survivor counts recomputed in one scan, then
      // unpivoted to stage rows — all-integer predicates, exact match
      """WITH f AS (
           SELECT count(*) AS s0,
             CAST(sum(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN n_chars >= 100 AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS s2,
             CAST(sum(CASE WHEN n_chars >= 100 AND lang = 'en'
               AND 20 * len(list_filter(string_split(text,' '),
                     t -> t IN ('the','a','of','and','is'))) >= len(string_split(text,' '))
               THEN 1 ELSE 0 END) AS BIGINT) AS s3,
             CAST(sum(CASE WHEN n_chars >= 100 AND lang = 'en'
               AND 20 * len(list_filter(string_split(text,' '),
                     t -> t IN ('the','a','of','and','is'))) >= len(string_split(text,' '))
               AND 5 * len(list_distinct(string_split(text,' '))) >= len(string_split(text,' '))
               THEN 1 ELSE 0 END) AS BIGINT) AS s4
           FROM documents)
         SELECT 1 AS stage_idx, 'min_length' AS stage, s0 AS n_in, s1 AS n_kept, s0 - s1 AS n_dropped FROM f
         UNION ALL SELECT 2, 'lang_en', s1, s2, s1 - s2 FROM f
         UNION ALL SELECT 3, 'stopword_floor', s2, s3, s2 - s3 FROM f
         UNION ALL SELECT 4, 'diversity_floor', s3, s4, s3 - s4 FROM f
         ORDER BY stage_idx""",

    "sample_domain_budget" ->
      // integer-exact budget math: tokens by separator counting, keep-rate
      // in sixteenths of the md5 hex-digit space, floor division throughout
      """WITH d AS (
           SELECT source,
             CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS toks,
             CAST(strpos('0123456789abcdef',
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS BIGINT) - 1 AS hv
           FROM documents),
         g AS (SELECT source, hv, count(*) AS n_docs,
                 CAST(sum(toks) AS BIGINT) AS n_toks
               FROM d GROUP BY 1, 2),
         t AS (SELECT CAST(sum(n_toks) AS BIGINT) AS total_toks,
                 count(DISTINCT source) AS n_src FROM g),
         s AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS src_toks,
                 CAST(sum(n_docs) AS BIGINT) AS src_docs FROM g GROUP BY 1),
         k AS (SELECT source, src_docs, src_toks,
                 CAST(least(16, ((total_toks // 2) // n_src * 16) // src_toks) AS BIGINT) AS keep_16
               FROM s, t)
         SELECT k.source, k.src_docs AS n_docs, k.src_toks AS n_tokens, k.keep_16,
           CAST(coalesce(sum(CASE WHEN g.hv < k.keep_16 THEN g.n_docs END), 0) AS BIGINT) AS n_docs_kept,
           CAST(coalesce(sum(CASE WHEN g.hv < k.keep_16 THEN g.n_toks END), 0) AS BIGINT) AS n_tokens_kept
         FROM k JOIN g ON g.source = k.source
         GROUP BY 1, 2, 3, 4 ORDER BY k.source""",

    "sql_identifier_clause" ->
      // the oracle hard-codes the table name the IDENTIFIER param binds
      """SELECT o_orderstatus, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "table_observe_metrics" ->
      // observation ≡ aggregation: the same QC metrics by a plain scan
      """SELECT count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           epoch_ms(min(l_shipdate)) AS min_ship_ms,
           epoch_ms(max(l_shipdate)) AS max_ship_ms
         FROM lineitem""",

    "cdc_state_reader" ->
      // the persisted streaming-aggregation state read back via the
      // statestore batch source must BE the batch aggregate of the log
      """SELECT user_id, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
         FROM events GROUP BY user_id ORDER BY user_id""",

    "sql_param_query" ->
      // the oracle inlines the bound parameter values — the gate thereby
      // proves parameter binding is semantically identical to literals
      """SELECT o_orderpriority, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders
         WHERE o_totalprice > 150000.0 AND o_orderstatus = 'F'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "sql_pipe_query" ->
      // the plain-SQL formulation: a hash match proves pipe syntax is
      // parse-time sugar over the identical relational plan
      """SELECT o_orderpriority, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders
         WHERE o_totalprice > 150000.0 AND o_orderstatus = 'F'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "cdc_stream_stateful_tws" -> latestStateSql,

    "cdc_stream_update_counts" ->
      // update mode's final emission per group = the full-log aggregate
      """SELECT event_type, count(*) AS n_events,
                round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    "xml_xpath_extract" ->
      // no XPath on the oracle side: every output recomputed from the
      // source columns (the xml_roundtrip argument), including the
      // repeated-element count and join
      """SELECT doc_id, lang AS x_lang,
                CAST(n_chars AS INTEGER) AS x_n,
                CAST(least(3, len(string_split(text, ' '))) AS INTEGER) AS n_tok_elems,
                array_to_string((string_split(text, ' '))[1:3], '|') AS toks_joined
         FROM documents ORDER BY doc_id""",

    "subquery_exists_select" ->
      """SELECT c_custkey, c_mktsegment,
                CAST(EXISTS(SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority = '1-URGENT') AS INTEGER) AS has_urgent,
                CAST(c_nationkey IN (SELECT n_nationkey FROM nation
                                     WHERE n_regionkey = 1) AS INTEGER) AS in_region1
         FROM customer c
         ORDER BY c_custkey""",

    "window_range_interval" ->
      // RANGE peers (exact-ts ties) share a frame on both engines, so no
      // tie order is needed; decimal sums follow the tumbling pattern
      """SELECT event_id, user_id,
                count(*) OVER w AS n_last_hour,
                round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 4) AS sum_last_hour
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "graph_triangle_count" ->
      // replay the identical construction: ≥2-support co-purchase
      // edges, (degree, id) orientation via row comparison, wedges at
      // the low endpoint, closure by a third edge join
      """WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
         pairs AS (SELECT a.p AS pa, b.p AS pb FROM po a
                   JOIN po b ON a.ok = b.ok AND a.p < b.p
                   GROUP BY 1, 2 HAVING count(*) >= 2),
         deg AS (SELECT v, count(*) AS d FROM
                   (SELECT pa AS v FROM pairs UNION ALL SELECT pb AS v FROM pairs) t
                 GROUP BY v),
         wd AS (SELECT pa, pb, da.d AS da, db.d AS db FROM pairs
                JOIN deg da ON da.v = pa JOIN deg db ON db.v = pb),
         o AS (SELECT CASE WHEN (da, pa) < (db, pb) THEN pa ELSE pb END AS lo,
                      CASE WHEN (da, pa) < (db, pb) THEN pb ELSE pa END AS hi,
                      CASE WHEN (da, pa) < (db, pb) THEN db ELSE da END AS dhi
               FROM wd),
         tri AS (SELECT count(*) AS n FROM o e1
                 JOIN o e2 ON e1.lo = e2.lo AND (e1.dhi, e1.hi) < (e2.dhi, e2.hi)
                 JOIN o e3 ON e3.lo = e1.hi AND e3.hi = e2.hi)
         SELECT (SELECT count(*) FROM deg) AS n_vertices,
                (SELECT count(*) FROM o) AS n_edges,
                (SELECT n FROM tri) AS n_triangles""",

    "source_json_corrupt_quarantine" ->
      // rebuild the quarantine report from the original table + the
      // deterministic corruption rule (event_id % 17 == 0 lines were
      // made unparseable): corrupt rows count under '_corrupt' with
      // zero parsed ids, everything else under its event_type
      """SELECT CASE WHEN event_id % 17 = 0 THEN '_corrupt' ELSE event_type END AS bucket,
                count(*) AS n_rows,
                count(CASE WHEN event_id % 17 <> 0 THEN event_id END) AS n_parsed
         FROM events GROUP BY 1 ORDER BY 1""",

    "layout_compact_files" ->
      // the oracle aggregates the ORIGINAL lineitem — a hash match
      // proves compaction rewrote the file layout, not the data (the
      // layout mechanics are asserted in BucketingSpec)
      """SELECT l_returnflag, count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "source_binaryfile_scan" ->
      // the oracle recomputes id/byte-length/digest from the ORIGINAL
      // documents table — a hash match proves the per-file binary
      // write/list/read cycle byte-lossless (corpus is UTF-8 text, so
      // DuckDB's md5 over the varchar hashes the same bytes Spark's
      // md5 hashes over the file content)
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
                md5(text) AS content_md5
         FROM documents ORDER BY doc_id""",

    "window_sliding_time" -> slidingSql,
    // the streaming sliding-window twin: complete-mode final state must
    // equal the batch sliding aggregate — proven through DuckDB
    "cdc_stream_sliding" -> slidingSql,

    "text_bpe_merges" ->
      // same three unrolled merge rounds as CTEs: distinct-word vocab →
      // space-delimited symbol strings → weighted pair counts → top
      // distinct-symbol pair (count DESC, a, b) → two-pass delimiter
      // replace → recount. replace() is left-to-right non-overlapping
      // in both engines, so the two-pass application is engine-exact.
      """WITH words AS (
           SELECT w.word AS word, count(*) AS wc
           FROM documents, unnest(string_split(text, ' ')) AS w(word)
           WHERE length(w.word) >= 2 GROUP BY 1),
         v0 AS (SELECT ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS s, wc FROM words),
         pc1 AS (
           SELECT x.t[CAST(r.i AS INTEGER)] AS a, x.t[CAST(r.i + 1 AS INTEGER)] AS b,
                  CAST(sum(x.wc) AS BIGINT) AS n
           FROM (SELECT string_split(trim(s), ' ') AS t, wc FROM v0) AS x,
                unnest(range(1, len(x.t))) AS r(i)
           GROUP BY 1, 2),
         t1 AS (SELECT a, b, n FROM pc1 WHERE a <> b ORDER BY n DESC, a, b LIMIT 1),
         v1 AS (SELECT replace(replace(s, ' '||a||' '||b||' ', ' '||a||b||' '),
                               ' '||a||' '||b||' ', ' '||a||b||' ') AS s, wc
                FROM v0, t1),
         pc2 AS (
           SELECT x.t[CAST(r.i AS INTEGER)] AS a, x.t[CAST(r.i + 1 AS INTEGER)] AS b,
                  CAST(sum(x.wc) AS BIGINT) AS n
           FROM (SELECT string_split(trim(s), ' ') AS t, wc FROM v1) AS x,
                unnest(range(1, len(x.t))) AS r(i)
           GROUP BY 1, 2),
         t2 AS (SELECT a, b, n FROM pc2 WHERE a <> b ORDER BY n DESC, a, b LIMIT 1),
         v2 AS (SELECT replace(replace(s, ' '||a||' '||b||' ', ' '||a||b||' '),
                               ' '||a||' '||b||' ', ' '||a||b||' ') AS s, wc
                FROM v1, t2),
         pc3 AS (
           SELECT x.t[CAST(r.i AS INTEGER)] AS a, x.t[CAST(r.i + 1 AS INTEGER)] AS b,
                  CAST(sum(x.wc) AS BIGINT) AS n
           FROM (SELECT string_split(trim(s), ' ') AS t, wc FROM v2) AS x,
                unnest(range(1, len(x.t))) AS r(i)
           GROUP BY 1, 2),
         t3 AS (SELECT a, b, n FROM pc3 WHERE a <> b ORDER BY n DESC, a, b LIMIT 1)
         SELECT * FROM (
           SELECT 1 AS merge_rank, a AS sym_a, b AS sym_b, n AS n_pairs FROM t1
           UNION ALL SELECT 2, a, b, n FROM t2
           UNION ALL SELECT 3, a, b, n FROM t3)
         ORDER BY merge_rank""",

    "mm_audio_silence" ->
      // same window construction as mm_audio_window; quiet flag is the
      // cross-multiplied integer energy test; islands via the
      // idx - row_number constant-within-run idiom
      """WITH docs AS (SELECT doc_id, text FROM documents
                       UNION ALL SELECT -1, ''),
         w AS (
           SELECT doc_id AS media_id, i AS win_idx,
                  substring(text, CAST(i * 32 + 1 AS INTEGER), 64) AS win
           FROM docs,
                unnest(range(CAST(greatest(floor((octet_length(encode(text)) - 64) / 32.0) + 1, 1) AS BIGINT))) AS t(i)),
         s AS (
           SELECT media_id, win_idx, CAST(length(win) AS BIGINT) AS win_len,
                  CAST(list_aggregate(list_transform(range(length(win)),
                      i -> ascii(substring(win, CAST(i + 1 AS INTEGER), 1))), 'sum') AS BIGINT) AS byte_sum
           FROM w WHERE length(win) > 0),
         q AS (
           SELECT media_id, win_idx, byte_sum,
                  win_idx - row_number() OVER
                    (PARTITION BY media_id ORDER BY win_idx) AS grp
           FROM s WHERE byte_sum <= 93 * win_len)
         SELECT media_id, CAST(min(win_idx) AS INTEGER) AS run_start,
                count(*) AS run_len,
                CAST(sum(byte_sum) AS BIGINT) AS run_byte_sum
         FROM q GROUP BY media_id, grp
         ORDER BY media_id, run_start""",

    "source_text_lines" ->
      // the oracle aggregates the ORIGINAL parquet — a hash match proves
      // the line-oriented text write/read/parse cycle lost nothing
      // (md5 digests pin content, not just lengths)
      """SELECT doc_id % 10 AS bucket, count(*) AS n_docs,
                CAST(sum(length(text)) AS BIGINT) AS sum_chars,
                min(md5(text)) AS min_md5,
                min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM documents GROUP BY 1 ORDER BY 1""",

    "layout_dynamic_overwrite" ->
      // rebuild the post-overwrite table from the original parquet:
      // only the 'O' partition's totals were doubled
      """SELECT o_orderstatus, count(*) AS n_orders,
                round(CAST(sum(CAST(CASE WHEN o_orderstatus = 'O'
                                         THEN o_totalprice * 2.0
                                         ELSE o_totalprice END
                                    AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
         FROM orders GROUP BY 1 ORDER BY 1""",

    "sql_udaf_typed" ->
      // the window/row_number twin of the constant-state top-3 UDAF;
      // boundary ties are sum-invariant (equal values, either pick)
      """WITH q AS (SELECT event_type,
                           CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vu
                    FROM events),
         r AS (SELECT event_type, vu, row_number() OVER
                 (PARTITION BY event_type ORDER BY vu DESC) AS rn
               FROM q)
         SELECT event_type,
                CAST(sum(CASE WHEN rn <= 3 THEN vu END) AS BIGINT) AS top3_vu,
                count(*) AS n_events
         FROM r GROUP BY event_type ORDER BY event_type""",

    "join_radius_grid" ->
      // identical grid construction in SQL (the triangle-count oracle
      // convention): quadratic point scatter, cell bucketing, 3x3
      // stencil equi-join, exact integer distance-squared verify
      """WITH p AS (
           SELECT event_id AS id,
                  ((event_id % 99991) * (event_id % 99991) * 3 + (event_id % 99991) * 7 + 11) % 99991 % 10000 AS x,
                  ((event_id % 99991) * (event_id % 99991) * 5 + (event_id % 99991) * 13 + 17) % 99991 % 10000 AS y
           FROM events WHERE event_id % 5 = 0),
         cells AS (SELECT id, x, y, x // 25 AS cx, y // 25 AS cy FROM p),
         stencil AS (
           SELECT c.id AS a_id, c.x AS ax, c.y AS ay,
                  c.cx + dx.d AS scx, c.cy + dy.d AS scy
           FROM cells c, (VALUES (-1), (0), (1)) AS dx(d),
                         (VALUES (-1), (0), (1)) AS dy(d))
         SELECT a_id, b.id AS b_id,
                (ax - b.x) * (ax - b.x) + (ay - b.y) * (ay - b.y) AS dist2
         FROM stencil a JOIN cells b
           ON a.scx = b.cx AND a.scy = b.cy AND a.a_id < b.id
         WHERE (ax - b.x) * (ax - b.x) + (ay - b.y) * (ay - b.y) <= 625
         ORDER BY a_id, b_id""",

    "ts_gapfill_interpolate" ->
      // same anchored grid + IGNORE NULLS frame windows + integer
      // interpolation; // and Spark div are the verified truncating pair
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS us, event_id, value,
                  epoch_us(ts) // 3600000000 AS h
           FROM events WHERE user_id % 50 = 0),
         known AS (
           SELECT user_id, h, CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vu
           FROM (SELECT *, row_number() OVER
                   (PARTITION BY user_id, h ORDER BY us DESC, event_id DESC) AS rn
                 FROM ev)
           WHERE rn = 1),
         grid AS (
           SELECT b.user_id, CAST(g.h AS BIGINT) AS h
           FROM (SELECT user_id, min(h) AS h0, max(h) AS h1
                 FROM known GROUP BY 1) b,
                unnest(range(b.h0, b.h1 + 1)) AS g(h)),
         j AS (
           SELECT g.user_id, g.h, k.vu,
             last_value(k.vu IGNORE NULLS) OVER
               (PARTITION BY g.user_id ORDER BY g.h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN k.vu IS NOT NULL THEN g.h END IGNORE NULLS) OVER
               (PARTITION BY g.user_id ORDER BY g.h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             first_value(k.vu IGNORE NULLS) OVER
               (PARTITION BY g.user_id ORDER BY g.h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN k.vu IS NOT NULL THEN g.h END IGNORE NULLS) OVER
               (PARTITION BY g.user_id ORDER BY g.h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
           FROM grid g LEFT JOIN known k USING (user_id, h))
         SELECT user_id, h AS hour_bucket,
                CASE WHEN vu IS NOT NULL THEN vu
                     ELSE pv + ((nv - pv) * (h - ph)) // (nh - ph) END AS vu_fill,
                vu IS NULL AS interpolated
         FROM j ORDER BY user_id, hour_bucket""",

    "layout_cached_scan" ->
      // the oracle reads the ORIGINAL parquet — a hash match proves the
      // in-memory cache changed the physical source, never the values
      """SELECT c_mktsegment, n_name, count(*) AS n_cust,
                round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "cdc_stream_state_ttl" -> stateTtlSql,
    // the state-API-v2 timer twin shares the oracle VERBATIM: a hash
    // match proves event-time eviction is semantics-identical across
    // flatMapGroupsWithState timeouts and transformWithState timers
    "cdc_stream_tws_ttl" -> stateTtlSql,

    "cdc_stream_tws_topk" ->
      // batch window top-3 twin of the incremental ListState
      // maintenance: per user the 3 highest (value, event_id) events
      """SELECT user_id, CAST(rn AS INTEGER) AS rank, event_id,
                round(value, 4) AS value
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn <= 3 ORDER BY user_id, rank""",

    "cdc_stream_tws_counts" ->
      // batch GROUP BY twin of the entry-wise MapState counters
      """SELECT user_id, event_type, count(*) AS n_events
         FROM events GROUP BY user_id, event_type
         ORDER BY user_id, event_type""",

    "sql_group_by_all" ->
      // the explicit form GROUP BY ALL / ORDER BY ALL / lateral aliases
      // must resolve to — keys listed positionally, every derived
      // column written out (the avg repeats inside the CASE; Spark's
      // lateral alias chain is analysis-time sugar over exactly this).
      // Integer-only hashed surface: exact 1e-4 BIGINT units for the
      // sum, HALF_UP avg as (2p+q)//(2q) — no double anywhere, so no
      // DuckDB-build 1-ulp divergence (the r10 driver mismatch).
      """WITH g AS (
           -- HUGEINT (int128) intermediates: DuckDB's // on DECIMAL
           -- rides double division (1-ulp hazard), on HUGEINT it is
           -- exact integer division — the twin of Spark's DECIMAL(38,0)
           -- DIV path, same headroom class
           SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderstatus,
                  count(*) AS n_orders,
                  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 10000 AS DECIMAL(38,0)) AS HUGEINT) AS sum_e4
           FROM orders GROUP BY 1, 2)
         SELECT o_year, o_orderstatus, n_orders,
                CAST(sum_e4 AS BIGINT) AS sum_price_e4,
                CAST((2 * sum_e4 + n_orders) // (2 * n_orders) AS BIGINT) AS avg_price_e4,
                CASE WHEN CAST((2 * sum_e4 + n_orders) // (2 * n_orders) AS BIGINT) >= 1500000000
                     THEN 'high' ELSE 'low' END AS price_band
         FROM g ORDER BY 1, 2""",

    "text_sentence_split" ->
      // identical synth-punctuation + split + per-sentence stats; RE2
      // 'g' replace is the same left-to-right non-overlapping scan
      """WITH d AS (SELECT doc_id,
                           regexp_replace(text, ' the ', '. ', 'g') AS t
                    FROM documents),
            s AS (SELECT doc_id,
                         list_filter(regexp_split_to_array(t, '[.!?]+\s+'),
                                     x -> length(x) > 0) AS sents
                  FROM d)
         SELECT doc_id, md5(sents[1]) AS first_sent_md5,
                CAST(len(sents) AS BIGINT) AS n_sentences,
                CAST(list_aggregate(list_transform(sents, x -> length(x)), 'max') AS INTEGER) AS max_sent_chars,
                CAST(list_aggregate(list_transform(sents, x -> length(x)), 'sum') AS BIGINT) AS sum_sent_chars
         FROM s WHERE len(sents) > 0 ORDER BY doc_id""",

    "agg_grouping_id" ->
      // the bitmask recomputed as 2·grouping(a) + grouping(b) —
      // engine-independent arithmetic over the same cube; '~' stands in
      // for the rolled-up NULL so a real value can never collide
      """SELECT CAST(2 * grouping(o_orderstatus) + grouping(o_orderpriority) AS INTEGER) AS level_id,
                CAST(grouping(o_orderstatus) AS INTEGER) AS status_rolled,
                CAST(grouping(o_orderpriority) AS INTEGER) AS priority_rolled,
                coalesce(o_orderstatus, '~') AS orderstatus,
                coalesce(o_orderpriority, '~') AS orderpriority,
                count(*) AS n_orders
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)
         HAVING 2 * grouping(o_orderstatus) + grouping(o_orderpriority) > 0
         ORDER BY level_id, orderstatus, orderpriority""",

    "map_str_to_map" ->
      // recompute every output from the SOURCE columns — the parse must
      // exactly invert the construction (url_parse_funcs pattern)
      """SELECT doc_id,
                'lang|len|src' AS keys_sorted,
                lang, source AS src,
                CAST(length(text) AS INTEGER) AS text_len,
                3 AS n_keys
         FROM documents ORDER BY doc_id""",

    "source_json_multiline" ->
      // aggregate the ORIGINAL table — a hash match proves the
      // pretty-printed-array render/parse cycle lossless
      """SELECT o_orderstatus, count(*) AS n_orders,
                count(DISTINCT o_custkey) AS n_cust,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM orders GROUP BY 1 ORDER BY 1""",

    "window_session_dynamic" ->
      // running-max islands twin of dynamic-gap session merging: an
      // event extends the session iff it starts BEFORE the running max
      // of (ts + its own gap); equality starts a new session (half-open
      // gap windows). 15 min for purchases, 45 min otherwise.
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS u,
                  CASE WHEN event_type = 'purchase'
                       THEN 900000000 ELSE 2700000000 END AS gap,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vu
           FROM events),
         m AS (
           SELECT *, max(u + gap) OVER
             (PARTITION BY user_id ORDER BY u, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
           FROM e),
         s AS (
           SELECT *, sum(CASE WHEN prev_end IS NULL OR u >= prev_end
                              THEN 1 ELSE 0 END) OVER
             (PARTITION BY user_id ORDER BY u, event_id) AS sid
           FROM m)
         SELECT user_id, min(u) AS session_start_us,
                CAST(max(u + gap) AS BIGINT) AS session_end_us,
                count(*) AS n_events, CAST(sum(vu) AS BIGINT) AS sum_vu
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, session_start_us""",

    "table_transpose" ->
      // the transposed report restated: one UNION ALL branch per metric
      // row, statuses as columns — row order pinned by the key sort
      """WITH base AS (
           SELECT o_orderstatus,
                  CAST(count(*) AS DOUBLE) AS n_orders,
                  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
                  CAST(min(o_orderkey) AS DOUBLE) AS min_key
           FROM orders GROUP BY o_orderstatus)
         SELECT key, F, O, P FROM (
           SELECT 'min_key' AS key,
                  max(CASE WHEN o_orderstatus = 'F' THEN min_key END) AS F,
                  max(CASE WHEN o_orderstatus = 'O' THEN min_key END) AS O,
                  max(CASE WHEN o_orderstatus = 'P' THEN min_key END) AS P
           FROM base
           UNION ALL
           SELECT 'n_orders',
                  max(CASE WHEN o_orderstatus = 'F' THEN n_orders END),
                  max(CASE WHEN o_orderstatus = 'O' THEN n_orders END),
                  max(CASE WHEN o_orderstatus = 'P' THEN n_orders END)
           FROM base
           UNION ALL
           SELECT 'sum_price',
                  max(CASE WHEN o_orderstatus = 'F' THEN sum_price END),
                  max(CASE WHEN o_orderstatus = 'O' THEN sum_price END),
                  max(CASE WHEN o_orderstatus = 'P' THEN sum_price END)
           FROM base)
         ORDER BY key""",

    "ts_downsample_ohlc" ->
      // first_value/last_value window twin over the identical
      // (ts, event_id) total order; values 1e-4 quantized to integers
      """WITH t AS (
           SELECT user_id,
                  epoch_us(ts) // 3600000000 AS hour_bucket,
                  CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS vu,
                  first_value(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) OVER w AS open_u,
                  last_value(CAST(floor(value * 10000.0 + 0.5) AS BIGINT)) OVER w AS close_u
           FROM events WHERE user_id % 50 = 0
           WINDOW w AS (PARTITION BY user_id, epoch_us(ts) // 3600000000
                        ORDER BY epoch_us(ts), event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
         SELECT user_id, hour_bucket,
                CAST(min(open_u) AS BIGINT) AS open_u,
                CAST(min(close_u) AS BIGINT) AS close_u,
                CAST(max(vu) AS BIGINT) AS high_u,
                CAST(min(vu) AS BIGINT) AS low_u,
                count(*) AS n_ticks
         FROM t GROUP BY user_id, hour_bucket
         ORDER BY user_id, hour_bucket""",

    "sql_analyze_stats" ->
      // recompute the EXACT stats ANALYZE collected — a hash match
      // proves the optimizer's inputs (row count, col min/max, nulls)
      // describe the data truthfully
      """SELECT count(*) AS row_count,
                min(o_custkey) AS min_custkey,
                max(o_custkey) AS max_custkey,
                CAST(count(*) - count(o_custkey) AS BIGINT) AS null_custkey
         FROM orders""",

    "typed_sorted_streaks" ->
      // lag/cumsum islands twin of the sorted-iterator fold: a
      // non-increase starts a new island; longest island per user
      """WITH e AS (
           SELECT user_id, value,
                  row_number() OVER w AS rn,
                  lag(value) OVER w AS pv
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         g AS (
           SELECT user_id, rn,
                  sum(CASE WHEN pv IS NULL OR value <= pv THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY rn) AS grp
           FROM e),
         runs AS (SELECT user_id, grp, count(*) AS len
                  FROM g GROUP BY user_id, grp)
         SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
                CAST(sum(len) AS BIGINT) AS n_events
         FROM runs GROUP BY user_id ORDER BY user_id""",

    "typed_cogroup_sorted" ->
      // union + lag twin of the two-iterator merge scan: the merged
      // (ts, event_id) order is total (event_id unique), so "purchase
      // immediately preceded by a click" is exact on both engines
      """WITH m AS (
           SELECT user_id, event_type,
                  lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS pt
           FROM events WHERE event_type IN ('purchase', 'click'))
         SELECT user_id,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
                CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
                CAST(sum(CASE WHEN event_type = 'purchase' AND pt = 'click'
                         THEN 1 ELSE 0 END) AS BIGINT) AS click_then_purchase
         FROM m GROUP BY user_id ORDER BY user_id""",

    "layout_rebalance_write" ->
      // the oracle aggregates the ORIGINAL table — a hash match proves
      // the AQE-rebalanced rewrite moved bytes, never values
      """SELECT l_returnflag, count(*) AS n_rows,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "cdc_stream_join_full" ->
      // finalized-horizon twin, BOTH null sides: a null-click purchase
      // finalizes when the watermark passes p_ts (as in the left
      // outer); a null-purchase click only when it passes c_ts + 1h
      // (its matches lie in its future) — per-side horizons from the
      // same end-of-replay watermark
      """WITH p AS (SELECT event_id AS p_id, ts AS p_ts, user_id AS p_user
                    FROM events WHERE event_type = 'purchase'),
            c AS (SELECT event_id AS c_id, ts AS c_ts, user_id AS c_user
                    FROM events WHERE event_type = 'click'),
            wm AS (SELECT least((SELECT max(epoch_us(p_ts)) FROM p),
                                (SELECT max(epoch_us(c_ts)) FROM c))
                          - 3600000000 AS w)
         SELECT p.p_id AS purchase_event_id, c.c_id AS click_event_id
         FROM p FULL JOIN c
           ON p.p_user = c.c_user
          AND epoch_us(c.c_ts) BETWEEN epoch_us(p.p_ts) - 3600000000 AND epoch_us(p.p_ts)
         WHERE (p.p_id IS NOT NULL AND c.c_id IS NOT NULL)
            OR (c.c_id IS NULL AND epoch_us(p.p_ts) < (SELECT w FROM wm))
            OR (p.p_id IS NULL AND epoch_us(c.c_ts) + 3600000000 < (SELECT w FROM wm))
         ORDER BY purchase_event_id NULLS FIRST, click_event_id NULLS FIRST""",

    "cdc_stream_join_semi" ->
      // batch semi-join twin, NO horizon restriction: every candidate
      // click lies in the purchase's past hour and the replay is
      // event-time-ordered, so streaming emits exactly the batch result
      """SELECT p.event_id AS purchase_event_id, p.user_id,
                epoch_us(p.ts) AS p_ts_us
         FROM events p
         WHERE p.event_type = 'purchase' AND EXISTS (
           SELECT 1 FROM events c
           WHERE c.event_type = 'click' AND c.user_id = p.user_id
             AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts)
         ORDER BY purchase_event_id""",

    "sql_column_default" ->
      // rebuild both writer populations with the declared defaults as
      // literals — DEFAULT resolution ≡ write-time constant injection
      """WITH def AS (
           SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS p,
                  'backfill' AS channel, 0 AS pb
           FROM orders WHERE o_orderkey % 3 = 0
           UNION ALL
           SELECT o_orderkey, CAST(o_totalprice AS DOUBLE), 'live',
                  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
           FROM orders WHERE o_orderkey % 3 = 1)
         SELECT channel, CAST(pb AS INTEGER) AS priority_boost,
                count(*) AS n_orders, min(o_orderkey) AS min_key,
                CAST(sum(CAST(p AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM def GROUP BY 1, 2 ORDER BY 1, 2""",

    "vec_kmeans_lloyd" ->
      // same integer micro-unit Lloyd loop as CTEs: quantize once,
      // per-dim equi-join distances (HUGEINT sums), truncating integer
      // centroid means (integer // ≡ Spark div, both toward zero), two
      // iterations + final assignment. Bit-exact: no float math after
      // the quantize.
      """WITH e AS (
           SELECT vec_id, CAST(r.i AS INTEGER) AS dim,
                  CAST(floor(CAST(embedding[CAST(r.i + 1 AS INTEGER)] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
           FROM embeddings, unnest(range(len(embedding))) AS r(i)),
         c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, dim, x AS cu FROM e WHERE vec_id < 8),
         a1 AS (SELECT vec_id, cid FROM (
             SELECT e.vec_id, c.cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY sum((e.x - c.cu) * (e.x - c.cu)), c.cid) AS rn
             FROM e JOIN c0 c USING (dim) GROUP BY e.vec_id, c.cid)
           WHERE rn = 1),
         c1 AS (SELECT a.cid, e.dim, CAST(sum(e.x) // count(*) AS BIGINT) AS cu
                FROM a1 a JOIN e USING (vec_id) GROUP BY a.cid, e.dim),
         a2 AS (SELECT vec_id, cid FROM (
             SELECT e.vec_id, c.cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY sum((e.x - c.cu) * (e.x - c.cu)), c.cid) AS rn
             FROM e JOIN c1 c USING (dim) GROUP BY e.vec_id, c.cid)
           WHERE rn = 1),
         c2 AS (SELECT a.cid, e.dim, CAST(sum(e.x) // count(*) AS BIGINT) AS cu
                FROM a2 a JOIN e USING (vec_id) GROUP BY a.cid, e.dim),
         a3 AS (SELECT vec_id, cid, dist FROM (
             SELECT e.vec_id, c.cid, sum((e.x - c.cu) * (e.x - c.cu)) AS dist,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY sum((e.x - c.cu) * (e.x - c.cu)), c.cid) AS rn
             FROM e JOIN c2 c USING (dim) GROUP BY e.vec_id, c.cid)
           WHERE rn = 1),
         l1 AS (SELECT cid AS cluster_id, CAST(sum(abs(cu)) AS BIGINT) AS centroid_l1
                FROM c2 GROUP BY cid)
         SELECT a.cid AS cluster_id, count(*) AS n_vec, min(a.vec_id) AS min_vec_id,
                CAST(sum(CAST(a.dist // 1000000 AS BIGINT)) AS BIGINT) AS wss_ppm,
                any_value(l1.centroid_l1) AS centroid_l1
         FROM a3 a JOIN l1 ON a.cid = l1.cluster_id
         GROUP BY a.cid ORDER BY cluster_id""",

    "sim_range_search" ->
      // same ordered float->double accumulation as sim_topk_cosine;
      // the radius test compares the ROUNDED similarity on both sides
      """WITH p AS (SELECT vec_id AS probe_id, embedding AS pe
                    FROM embeddings WHERE vec_id < 3)
         SELECT probe_id, vec_id, cos_sim FROM (
           SELECT p.probe_id, e.vec_id,
             round(
               list_aggregate(list_transform(list_zip(e.embedding, p.pe),
                 t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), 'sum')
               / (sqrt(list_aggregate(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                  * sqrt(list_aggregate(list_transform(p.pe,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4) AS cos_sim
           FROM embeddings e, p WHERE e.vec_id <> p.probe_id)
         WHERE cos_sim >= 0.2 ORDER BY probe_id, vec_id""",

    "layout_bucketed_join" ->
      // the oracle joins/aggregates the ORIGINAL parquet — a hash match
      // proves the bucketed layout changed only the plan (no exchange
      // below the join), never the data
      """SELECT o_orderpriority, count(*) AS n_orders,
                CAST(sum(n_items) AS BIGINT) AS n_items,
                round(CAST(sum(rev) AS DOUBLE), 4) AS revenue
         FROM (SELECT o_orderkey, o_orderpriority,
                      sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS rev,
                      count(*) AS n_items
               FROM orders JOIN lineitem ON o_orderkey = l_orderkey
               GROUP BY 1, 2)
         GROUP BY 1 ORDER BY 1""",

    "source_orc_roundtrip" ->
      // the oracle aggregates the ORIGINAL parquet — a hash match proves
      // the ORC write/read cycle lost nothing
      """SELECT o_orderstatus, count(*) AS n_orders,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "source_csv_roundtrip" ->
      // the oracle aggregates the ORIGINAL parquet — a hash match proves
      // the CSV text write/read cycle lost nothing, including the NTZ
      // timestamp surviving its ISO text form (min/max epoch columns)
      """SELECT o_orderstatus, count(*) AS n_orders,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
                epoch_us(min(o_orderdate)) AS min_date_us,
                epoch_us(max(o_orderdate)) AS max_date_us
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "text_bpe_pair_counts" ->
      // same vocab-then-pairs construction in SQL: distinct-word counts,
      // lateral unnest of each word's adjacent 2-grams, weighted sum
      """SELECT pair, n_pairs, n_vocab FROM (
           WITH words AS (
             SELECT w.word AS word, count(*) AS wc
             FROM documents, unnest(string_split(text, ' ')) AS w(word)
             WHERE length(w.word) >= 2
             GROUP BY 1
           ), pairs AS (
             SELECT substring(word, CAST(r.i AS INTEGER), 2) AS pair, wc
             FROM words, unnest(range(1, length(word))) AS r(i)
           )
           SELECT pair, CAST(sum(wc) AS BIGINT) AS n_pairs, count(*) AS n_vocab
           FROM pairs GROUP BY pair
           ORDER BY n_pairs DESC, pair LIMIT 20
         ) ORDER BY pair""",

    "source_avro_roundtrip" ->
      // the oracle aggregates the ORIGINAL parquet — a hash match proves
      // the Avro binary encode/decode cycle lost nothing across two
      // longs, a string and an IEEE double
      """SELECT o_orderstatus, count(*) AS n_orders,
                count(DISTINCT o_custkey) AS n_cust,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "array_edit_ops" ->
      // array_position: Spark returns 0 when missing, DuckDB NULL →
      // coalesce; intersect count = membership filter on the distinct
      // set (the Spark∩DuckDB semantics intersection)
      """SELECT doc_id,
                CAST(len(flatten([ (string_split(text,' '))[1:2],
                                   (string_split(text,' '))[3:4] ])) AS INTEGER) AS n_flat,
                CAST(len(list_filter(string_split(text,' '), t -> t != 'the')) AS INTEGER) AS n_no_the,
                CAST(coalesce(list_position(string_split(text,' '), 'the'), 0) AS BIGINT) AS pos_the,
                lang || ',' || lang || ',' || lang AS lang3,
                CAST(len(list_filter(list_distinct(string_split(text,' ')),
                    t -> t IN ('the','a','of','and','is'))) AS INTEGER) AS n_stop_distinct
         FROM documents ORDER BY doc_id""",

    "agg_try_arith" ->
      // try_* ≡ plain arithmetic on clean in-range data — the gate
      // asserts exactly that equivalence
      """SELECT l_returnflag,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS try_sum_price,
                round(CAST(avg(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS try_avg_price,
                CAST(max(l_quantity) AS BIGINT) + 1 AS try_add_maxq,
                count(*) * 2 AS try_double_count
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "join_asof_tolerance" ->
      // same unconditional frame lookup as join_asof_attribution, the
      // 24 h (86 400 000 000 µs) tolerance applied per-row after it;
      // NULL click_ts_us makes the CASE predicate NULL → ELSE arm, the
      // same null-condition fallthrough Spark's when/otherwise takes
      """SELECT event_id AS purchase_event_id, user_id,
                CAST(CASE WHEN epoch_us(ts) - click_ts_us <= 86400000000
                     THEN 1 ELSE 0 END AS INTEGER) AS in_window,
                CASE WHEN epoch_us(ts) - click_ts_us <= 86400000000
                     THEN click_event_id END AS attr_click_id,
                CASE WHEN epoch_us(ts) - click_ts_us <= 86400000000
                     THEN epoch_us(ts) - click_ts_us END AS attr_gap_us
         FROM (
           SELECT *,
             last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_event_id,
             last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts_us
           FROM events)
         WHERE event_type = 'purchase'
         ORDER BY purchase_event_id""",

    "string_mask_funcs" ->
      // DuckDB has no mask(): the twin restates the per-class mapping as
      // regexp_replace chains. Default classes upper→X/lower→x/digit→n
      // (other kept); the custom-class call only ever sees the phone's
      // [0-9-] domain, so digit→0 then '-'→'#' is the full mapping. The
      // positional redact (the OVERLAY shape) is the same splice.
      """WITH c AS (
           SELECT c_custkey, c_name,
                  printf('%02d-%03d-%04d', c_nationkey,
                         c_custkey % 1000, c_custkey % 10000) AS phone
           FROM customer)
         SELECT c_custkey,
                regexp_replace(regexp_replace(regexp_replace(
                  c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
                  '[0-9]', 'n', 'g') AS name_masked,
                regexp_replace(regexp_replace(phone, '[0-9]', '0', 'g'),
                  '-', '#', 'g') AS phone_masked,
                substr(phone, 1, 3) || '***' || substr(phone, 7, 5) AS phone_redact
         FROM c ORDER BY c_custkey""",

    "ts_timezone_funcs" ->
      // tzdb-independent twin by design (the operator doc): Asia/Kolkata
      // is a fixed +05:30 on the modern event clock and the other zone
      // is the explicit offset -08:00, so both projections are exact
      // interval shifts — no ICU/tzdb lookup on the oracle side
      """SELECT event_id,
                epoch_us(ts + INTERVAL '330' MINUTE) AS ist_us,
                CAST(hour(ts + INTERVAL '330' MINUTE) AS INTEGER) AS ist_hour,
                CAST(CAST(ts + INTERVAL '330' MINUTE AS DATE) AS VARCHAR) AS ist_date,
                epoch_us(ts - INTERVAL '8' HOUR) AS pst_us,
                CAST(hour(ts - INTERVAL '8' HOUR) AS INTEGER) AS pst_hour
         FROM events WHERE event_id % 37 = 0 ORDER BY event_id""",

    "num_format_funcs" ->
      // format('{:,}') / printf are DuckDB's spellings of Spark's
      // format_number/to_char/format_string; every formatted value is
      // integer-driven (doubles quantized through the DECIMAL(18,2)
      // cast first) so the string surfaces are engine-identical. The
      // to_char→to_number round-trip is the key itself by construction.
      """SELECT p_partkey,
                format('{:,}', p_partkey * 131 + 7) AS grouped,
                printf('%07d', p_partkey) AS pad7,
                p_partkey AS roundtrip,
                format('{:,}', CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS cents_grouped,
                printf('%05d|%s', p_partkey, p_brand) AS tagged
         FROM part ORDER BY p_partkey""",

    "agg_corr_covar" ->
      // identical exact-decimal moments, identical final IEEE double
      // arithmetic (each op correctly rounded), identical HALF_UP
      // 4-place quantization — the agg_regression twin recipe
      """WITH m AS (
           SELECT l_linestatus, count(*) AS n,
                  CAST(sum(CAST(l_discount * 100 AS DECIMAL(18,4))) AS DOUBLE) AS sx,
                  CAST(sum(CAST(l_tax * 100 AS DECIMAL(18,4))) AS DOUBLE) AS sy,
                  CAST(CAST(sum(CAST(CAST(l_discount * 100 AS DECIMAL(18,4))
                    * CAST(l_tax * 100 AS DECIMAL(18,4)) AS DECIMAL(28,8)))
                    AS DECIMAL(28,4)) AS DOUBLE) AS sxy,
                  CAST(CAST(sum(CAST(CAST(l_discount * 100 AS DECIMAL(18,4))
                    * CAST(l_discount * 100 AS DECIMAL(18,4)) AS DECIMAL(28,8)))
                    AS DECIMAL(28,4)) AS DOUBLE) AS sxx,
                  CAST(CAST(sum(CAST(CAST(l_tax * 100 AS DECIMAL(18,4))
                    * CAST(l_tax * 100 AS DECIMAL(18,4)) AS DECIMAL(28,8)))
                    AS DECIMAL(28,4)) AS DOUBLE) AS syy
           FROM lineitem GROUP BY 1)
         SELECT l_linestatus, n,
                sign((CAST(n AS DOUBLE) * sxy - sx * sy)
                  / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                       * (CAST(n AS DOUBLE) * syy - sy * sy)))
                  * (floor(abs((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                         * (CAST(n AS DOUBLE) * syy - sy * sy))) * 10000.0 + 0.5)
                  / 10000.0) AS corr_xy,
                sign((CAST(n AS DOUBLE) * sxy - sx * sy)
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                  * (floor(abs((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) * 10000.0 + 0.5)
                  / 10000.0) AS covar_samp,
                sign((CAST(n AS DOUBLE) * sxy - sx * sy)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                  * (floor(abs((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) * 10000.0 + 0.5)
                  / 10000.0) AS covar_pop
         FROM m ORDER BY l_linestatus""",

    "text_html_strip" ->
      // identical synthesized markup, identical strip/unescape/collapse
      // chain; DuckDB regexp_replace needs the 'g' flag for the
      // all-occurrence semantics Spark has by default
      """WITH h AS (
           SELECT doc_id,
                  '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
                  || regexp_replace(text, ' the ', ' &amp; ', 'g')
                  || '</p><footer>&copy; ' || source
                  || ' &lt;eof&gt;</footer></body></html>' AS html
           FROM documents),
         c AS (
           SELECT doc_id,
                  trim(regexp_replace(
                    replace(replace(replace(replace(
                      regexp_replace(html, '<[^>]*>', ' ', 'g'),
                      '&lt;', '<'), '&gt;', '>'), '&copy;', '(c)'), '&amp;', '&'),
                    ' +', ' ', 'g')) AS clean
           FROM h)
         SELECT doc_id, md5(clean) AS clean_md5,
                CAST(length(clean) AS INTEGER) AS clean_len,
                CAST(len(string_split(clean, ' ')) AS INTEGER) AS n_tokens
         FROM c ORDER BY doc_id""",

    "text_readability" ->
      // identical synth punctuation + vowel-group syllable estimator;
      // the Flesch expression is the same fixed IEEE double tree over
      // integer counts, quantized HALF_UP before the band thresholds
      """WITH t AS (
           SELECT doc_id, regexp_replace(text, ' the ', '. ', 'g') AS t
           FROM documents),
         c AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(t, '\. ')) + 1 AS BIGINT) AS n_sentences,
                  CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
                  CAST(len(regexp_extract_all(lower(t), '[aeiouy]+')) AS BIGINT) AS n_syllables
           FROM t),
         s AS (
           SELECT *, sign(206.835
                  - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                  - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
                  * (floor(abs(206.835
                  - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                  - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
                  * 10000.0 + 0.5) / 10000.0) AS flesch
           FROM c)
         SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
                CASE WHEN flesch >= 80.0 THEN 'easy'
                     WHEN flesch >= 55.0 THEN 'medium'
                     ELSE 'hard' END AS band
         FROM s ORDER BY doc_id""",

    "sql_select_except" ->
      // DuckDB's spelling of the same star-minus feature; the driver's
      // name-sorted hash makes the differing column orders equivalent
      """SELECT * EXCLUDE (o_orderdate, o_orderpriority),
                CAST(year(o_orderdate) AS INTEGER) AS o_year
         FROM orders
         WHERE o_totalprice > 400000
         ORDER BY o_orderkey""",

    "cdc_stream_union" ->
      // batch twin of the two-source fan-in: the same filtered
      // projections unioned, then the hourly (window, type) aggregate —
      // complete mode makes the streaming final state the full answer
      """WITH u AS (
           SELECT ts, event_type, value FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT ts, event_type, 0.0 AS value FROM events WHERE event_type = 'click')
         SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, event_type,
                count(*) AS n_events,
                round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
         FROM u GROUP BY 1, 2 ORDER BY bucket_ms, event_type""",

    "agg_skew_kurtosis" ->
      // identical exact decimal raw moments, identical fixed IEEE
      // central-moment tree (x^1.5 spelled m2*sqrt(m2) on both sides —
      // libm pow is not correctly rounded), identical HALF_UP r4
      """WITH m AS (
           SELECT l_returnflag, count(*) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s1,
                  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS s2,
                  CAST(sum(CAST(l_quantity * l_quantity * l_quantity
                    AS DECIMAL(28,8))) AS DOUBLE) AS s3,
                  CAST(sum(CAST(l_quantity * l_quantity * l_quantity * l_quantity
                    AS DECIMAL(28,8))) AS DOUBLE) AS s4
           FROM lineitem GROUP BY 1),
         c AS (
           SELECT l_returnflag, n,
                  s1 / CAST(n AS DOUBLE) AS mean,
                  s2 / CAST(n AS DOUBLE) - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS m2,
                  s3 / CAST(n AS DOUBLE)
                    - 3.0 * (s1 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE))
                    + 2.0 * ((s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))) AS m3,
                  s4 / CAST(n AS DOUBLE)
                    - 4.0 * (s1 / CAST(n AS DOUBLE)) * (s3 / CAST(n AS DOUBLE))
                    + 6.0 * ((s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))) * (s2 / CAST(n AS DOUBLE))
                    - 3.0 * (((s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
                           * ((s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))) AS m4
           FROM m)
         SELECT l_returnflag, n,
                floor(mean * 10000.0 + 0.5) / 10000.0 AS mean_qty,
                sign(m3 / (m2 * sqrt(m2)))
                  * (floor(abs(m3 / (m2 * sqrt(m2))) * 10000.0 + 0.5) / 10000.0)
                  AS skewness,
                sign(m4 / (m2 * m2) - 3.0)
                  * (floor(abs(m4 / (m2 * m2) - 3.0) * 10000.0 + 0.5) / 10000.0)
                  AS kurtosis_ex
         FROM c ORDER BY l_returnflag""",

    "ts_calendar_features" ->
      // weekday ≡ isodow-1 (Monday-based ISO pair — dayofweek is
      // 1=Sunday in Spark but 0=Sunday in DuckDB, the trap the operator
      // doc pins); weekofyear is ISO in both
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
                CAST(CASE WHEN isodow(o_orderdate) - 1 >= 5 THEN 1 ELSE 0 END
                  AS INTEGER) AS is_weekend,
                count(*) AS n_orders,
                count(DISTINCT weekofyear(o_orderdate)) AS n_weeks,
                CAST(min(isodow(o_orderdate) - 1) AS INTEGER) AS min_wd,
                CAST(max(isodow(o_orderdate) - 1) AS INTEGER) AS max_wd,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS sum_price
         FROM orders GROUP BY 1, 2, 3 ORDER BY o_year, o_quarter, is_weekend""",

    "source_parquet_merge_schema" ->
      // closed-form twin from the base table: v1 = even keys (no
      // evolved columns → NULLs under mergeSchema), v2 = odd keys with
      // year + band populated exactly as the staging derives them
      """SELECT o_orderstatus,
                count(*) AS n_rows,
                count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_with_year,
                count(CASE WHEN o_orderkey % 2 = 1 AND o_totalprice > 200000.0
                           THEN 1 END) AS n_big,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
                  AS sum_price,
                min(o_orderkey) AS min_key
         FROM orders GROUP BY 1 ORDER BY o_orderstatus""",

    "text_vocab_novelty" ->
      // same distinct-token explode → first-seer min → join-back shape
      """WITH toks AS (
           SELECT DISTINCT doc_id, tok FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM documents)),
         first_seen AS (
           SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY 1)
         SELECT t.doc_id,
                count(*) AS n_vocab,
                count(CASE WHEN f.first_doc = t.doc_id THEN 1 END) AS n_novel,
                floor(CAST(count(CASE WHEN f.first_doc = t.doc_id THEN 1 END) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS novelty
         FROM toks t JOIN first_seen f USING (tok)
         GROUP BY t.doc_id ORDER BY t.doc_id""",

    "dedup_template_hash" ->
      // identical token-length shape digest over the first 10 tokens
      """WITH s AS (
           SELECT doc_id,
                  md5(array_to_string(list_transform(
                    string_split(text, ' ')[1:10],
                    x -> CAST(length(x) AS VARCHAR)), ' ')) AS template_md5
           FROM documents)
         SELECT template_md5, count(*) AS n_docs, min(doc_id) AS canonical_doc
         FROM s GROUP BY 1 HAVING count(*) > 1 ORDER BY template_md5""",

    "cdc_stream_windowed_append" ->
      // the tumbling aggregate restricted to the finalized horizon
      // H = max(ts) − 1 h: append mode emits exactly the windows the
      // watermark closed; both engines apply the identical strict
      // integer predicate (window end µs < H µs)
      """WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events)
         SELECT * FROM (
           SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, event_type,
                  count(*) AS n_events,
                  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
           FROM events GROUP BY 1, 2)
         WHERE (bucket_ms + 3600000) * 1000 < (SELECT m FROM mx) - 3600000000
         ORDER BY bucket_ms, event_type""",

    "agg_map_collect" ->
      // the sorted-key JSON rendering is the canonical map surface:
      // string_agg ORDER BY key rebuilds exactly Spark's to_json of the
      // sorted-entries map (counts render as bare integers in both)
      """WITH c AS (
           SELECT user_id, event_type, count(*) AS cnt
           FROM events GROUP BY 1, 2)
         SELECT user_id,
                CAST(count(*) AS INTEGER) AS n_types,
                '{' || string_agg('"' || event_type || '":' || CAST(cnt AS VARCHAR),
                                  ',' ORDER BY event_type) || '}' AS type_counts_json
         FROM c GROUP BY user_id ORDER BY user_id""",

    "window_rolling_zscore" ->
      // identical decimal frame sums, identical IEEE z tree, identical
      // signed HALF_UP quantization, outlier gate on the quantized z
      """WITH f AS (
           SELECT event_id, user_id, value,
                  count(*) OVER w AS n_frame,
                  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sx,
                  CAST(CAST(sum(CAST(value * value AS DECIMAL(28,8))) OVER w
                    AS DECIMAL(28,4)) AS DOUBLE) AS sxx
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         z AS (
           SELECT event_id, user_id, n_frame,
                  CASE WHEN (CAST(n_frame AS DOUBLE) * sxx - sx * sx) > 0.0
                        AND n_frame >= 3 THEN
                    sign((value - sx / CAST(n_frame AS DOUBLE))
                      / sqrt((CAST(n_frame AS DOUBLE) * sxx - sx * sx)
                           / (CAST(n_frame AS DOUBLE) * (CAST(n_frame AS DOUBLE) - 1.0))))
                    * (floor(abs((value - sx / CAST(n_frame AS DOUBLE))
                      / sqrt((CAST(n_frame AS DOUBLE) * sxx - sx * sx)
                           / (CAST(n_frame AS DOUBLE) * (CAST(n_frame AS DOUBLE) - 1.0))))
                      * 10000.0 + 0.5) / 10000.0)
                  END AS z
           FROM f)
         SELECT event_id, user_id, n_frame, z,
                CAST(CASE WHEN z IS NOT NULL AND abs(z) > 2.0 THEN 1 ELSE 0 END
                  AS INTEGER) AS is_outlier
         FROM z ORDER BY event_id""",

    "window_rolling_median" ->
      // quantile_disc(0.5) picks the LOWER middle — exactly the
      // (n+1) DIV 2 element pick on the Spark side; pure element
      // selection, no interpolation arithmetic to diverge
      """SELECT event_id, user_id,
                CAST(count(*) OVER w AS INTEGER) AS n_frame,
                round(quantile_disc(value, 0.5) OVER w, 4) AS rolling_median
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "graph_degree_distribution" ->
      // the dedup_ngram_jaccard pair CTE (same as the pagerank/LPA
      // twins), then endpoints → per-node degree → per-degree histogram
      """WITH sh AS MATERIALIZED (
           SELECT doc_id, list_distinct(list_transform(
             range(greatest(len(string_split(text,' ')) - 2, 1)),
             i -> array_to_string((string_split(text,' '))[i+1:i+3], ' '))) AS s
           FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS tok FROM sh),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id, a.n, b.n
           HAVING round(CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)), 4) >= 0.5),
         ends AS (SELECT doc_a AS node FROM pairs
                  UNION ALL SELECT doc_b AS node FROM pairs),
         deg AS (SELECT node, count(*) AS degree FROM ends GROUP BY node)
         SELECT degree, count(*) AS n_nodes, min(node) AS min_doc
         FROM deg GROUP BY degree ORDER BY degree""",

    "agg_entropy_gini" ->
      // identical per-class HALF_UP micro-unit quantization BEFORE the
      // (exact, integer) cohort sum — a raw double SUM would be
      // partition-order dependent on the Spark side
      """WITH c AS (
           SELECT user_id % 10 AS cohort, event_type, count(*) AS cnt
           FROM events GROUP BY 1, 2),
         t AS (
           SELECT cohort, cnt,
                  CAST(floor(-((CAST(cnt AS DOUBLE) / s) * ln(CAST(cnt AS DOUBLE) / s))
                    * 1000000.0 + 0.5) AS BIGINT) AS h_term_u,
                  CAST(floor(((CAST(cnt AS DOUBLE) / s) * (CAST(cnt AS DOUBLE) / s))
                    * 1000000.0 + 0.5) AS BIGINT) AS g_term_u
           FROM (SELECT *, CAST(sum(cnt) OVER (PARTITION BY cohort) AS DOUBLE) AS s
                 FROM c))
         SELECT cohort, count(*) AS n_types, CAST(sum(cnt) AS BIGINT) AS n_events,
                CAST(sum(h_term_u) AS DOUBLE) / 1000000.0 AS entropy_nats,
                1.0 - CAST(sum(g_term_u) AS DOUBLE) / 1000000.0 AS gini
         FROM t GROUP BY cohort ORDER BY cohort""",

    "sql_named_window" ->
      // the twin states the windows explicitly — the WINDOW clause is
      // Spark-side analysis sugar whose expansion this match proves;
      // lag and the running decimal sum ride the same (custkey,
      // date, orderkey) order
      """SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS rn,
                round(lag(o_totalprice) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey), 4) AS prev_price,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                  AS DOUBLE), 4) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "sql_lateral_view_explode" ->
      // unnest is DuckDB's generator spelling; same bounded histogram
      """SELECT CAST(length(tok) AS INTEGER) AS tok_len,
                count(*) AS n_tokens,
                count(DISTINCT tok) AS n_distinct
         FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         GROUP BY 1 ORDER BY tok_len""",

    "text_pmi_cooccur" ->
      // identical in-row ±2 skip-gram pair generation (list indexing
      // instead of element_at), identical exact counts, identical ln
      // tree quantized to signed micro-units (r6s mirror)
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
         p AS (SELECT doc_id, s, unnest(range(len(s))) AS i FROM t),
         pairs AS (
           SELECT s[i+1] AS a, s[i+2] AS b FROM p WHERE i+2 <= len(s)
           UNION ALL
           SELECT s[i+1] AS a, s[i+3] AS b FROM p WHERE i+3 <= len(s)),
         cxy AS (SELECT a, b, count(*) AS c_xy FROM pairs GROUP BY 1, 2),
         cx AS (SELECT a, count(*) AS c_x FROM pairs GROUP BY 1),
         cy AS (SELECT b, count(*) AS c_y FROM pairs GROUP BY 1),
         nt AS (SELECT count(*) AS n_pairs FROM pairs)
         SELECT a, b, c_xy,
                sign(ln((CAST(c_xy AS DOUBLE) * CAST(n_pairs AS DOUBLE))
                      / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))))
                * (floor(abs(ln((CAST(c_xy AS DOUBLE) * CAST(n_pairs AS DOUBLE))
                             / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))))
                    * 1000000.0 + 0.5) / 1000000.0) AS pmi
         FROM cxy JOIN cx USING (a) JOIN cy USING (b), nt
         WHERE c_xy >= 3 ORDER BY a, b""",

    "source_csv_malformed_permissive" ->
      // closed form of the synthesized corruption: every 7th key's line
      // is truncated (no price -> quarantined, key/status still parse),
      // every 13th key is lettered (quarantined, key null); the clean
      // sum re-rides the DECIMAL(18,2) text render both engines share
      """WITH base AS (
           SELECT o_orderstatus,
                  o_orderkey % 7 = 0 AS trunc,
                  o_orderkey % 13 = 0 AS badkey,
                  CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
                    AS DOUBLE) AS reparsed
           FROM orders)
         SELECT o_orderstatus,
                count(*) AS n_rows,
                count(CASE WHEN trunc OR badkey THEN 1 END) AS n_quarantined,
                count(CASE WHEN NOT badkey THEN 1 END) AS n_key_parsed,
                round(CAST(sum(CASE WHEN NOT trunc
                  THEN CAST(reparsed AS DECIMAL(18,4)) END) AS DOUBLE), 4)
                  AS sum_price_clean
         FROM base GROUP BY 1 ORDER BY o_orderstatus""",

    "window_drawdown" ->
      // running peak is an element pick (exact on both engines); the
      // ratio is one IEEE division + signed HALF_UP floor, identical op
      // trees; the new-peak flag is raw-double equality against the pick
      """SELECT event_id, user_id,
                floor(pk * 10000.0 + 0.5) / 10000.0 AS running_peak,
                sign(value / pk - 1.0)
                  * (floor(abs(value / pk - 1.0) * 10000.0 + 0.5) / 10000.0)
                  AS drawdown,
                CASE WHEN value = pk THEN 1 ELSE 0 END AS is_new_peak
         FROM (SELECT event_id, user_id, value,
                      max(value) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk
               FROM events)
         ORDER BY event_id""",

    "layout_partition_only_agg" ->
      // the oracle recomputes the per-year counts from the ORIGINAL
      // parquet; a hash match proves the partition-directory-only read
      // (empty ReadSchema, asserted in spec) loses nothing
      """SELECT year(o_orderdate) AS o_year, count(*) AS n_orders
         FROM orders GROUP BY 1 ORDER BY o_year""",

    "sql_filter_clause" ->
      // both engines implement SQL-standard FILTER; the money sum rides
      // the shared DECIMAL(18,4)->DOUBLE round used suite-wide
      """SELECT o_orderpriority,
                count(*) AS n_all,
                count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                        FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 4)
                  AS sum_f_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "text_vocab_coverage" ->
      // integer counts all the way to one BIGINT->DOUBLE cast, one IEEE
      // division and one HALF_UP floor — the exact Spark op tree
      """SELECT vocab_rank, tok, cnt,
                floor((CAST(cum_cnt AS DOUBLE) / CAST(total_cnt AS DOUBLE))
                      * 10000.0 + 0.5) / 10000.0 AS coverage
         FROM (SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INTEGER)
                        AS vocab_rank,
                      tok, cnt,
                      sum(cnt) OVER (ORDER BY cnt DESC, tok
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt,
                      sum(cnt) OVER () AS total_cnt
               FROM (SELECT tok, count(*) AS cnt
                     FROM (SELECT unnest(string_split(text, ' ')) AS tok
                           FROM documents)
                     GROUP BY tok))
         ORDER BY vocab_rank""",

    "graph_bfs_distance" -> bfsDistanceSql,

    "window_ratio_to_report" ->
      // exact DECIMAL(18,4) sums on both frames; IEEE touched only in
      // the two final divisions + the shared HALF_UP floor
      """SELECT o_custkey, o_orderkey,
                floor((o_totalprice / tot) * 10000.0 + 0.5) / 10000.0 AS share,
                floor((cum / tot) * 10000.0 + 0.5) / 10000.0 AS cum_share
         FROM (SELECT o_custkey, o_orderkey,
                      CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                        OVER (PARTITION BY o_custkey) AS DOUBLE) AS tot,
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                        OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE) AS cum
               FROM orders)
         ORDER BY o_custkey, o_orderkey""",

    "sample_poisson_bootstrap" ->
      // the byte is the same two md5 hex digits on both engines (Spark
      // spells it conv(substr,16,10), here digit-position arithmetic);
      // sums are cast off DuckDB's HUGEINT to match Spark's BIGINT
      """WITH d AS (
           SELECT lang, n_chars,
             (CASE WHEN b < 94 THEN 0 WHEN b < 188 THEN 1
                   WHEN b < 235 THEN 2 WHEN b < 251 THEN 3
                   ELSE 4 END) AS k
           FROM (SELECT lang, n_chars,
                   (strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)),1,1))-1)*16
                   + strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)),2,1))-1 AS b
                 FROM documents)),
         boot AS (SELECT lang, count(*) AS n_boot,
                         CAST(sum(n_chars) AS BIGINT) AS chars_boot
                  FROM (SELECT lang, n_chars, unnest(range(k))
                        FROM d WHERE k > 0)
                  GROUP BY lang),
         orig AS (SELECT lang, count(*) AS n_orig,
                         CAST(sum(n_chars) AS BIGINT) AS chars_orig
                  FROM d GROUP BY lang)
         SELECT o.lang, o.n_orig, o.chars_orig,
                coalesce(b2.n_boot, 0) AS n_boot,
                coalesce(b2.chars_boot, 0) AS chars_boot,
                floor((CAST(coalesce(b2.n_boot, 0) AS DOUBLE)
                       / CAST(o.n_orig AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
                  AS boot_ratio
         FROM orig o LEFT JOIN boot b2 ON o.lang = b2.lang
         ORDER BY o.lang""",

    "embed_drift_stats" ->
      // vec_label_centroids decimal-mean idiom per (dim, cohort); the
      // centroid cosine rides micro-unit BIGINT products (order-free
      // exact sums over the 64-row dim frame) — IEEE only in the final
      // division and the signed HALF_UP quantizes
      """WITH x AS (SELECT CAST(vec_id % 2 AS INTEGER) AS cohort,
                           unnest(range(len(embedding))) AS dim,
                           unnest(embedding) AS v
                    FROM embeddings),
         g AS (SELECT dim, cohort,
                      sum(CAST(v AS DECIMAL(20,10))) AS s, count(*) AS n
               FROM x GROUP BY dim, cohort),
         m AS (SELECT dim,
                 CAST(sum(CASE WHEN cohort = 0 THEN s END) AS DOUBLE)
                   / CAST(sum(CASE WHEN cohort = 0 THEN n END) AS DOUBLE)
                   AS mean_old,
                 CAST(sum(CASE WHEN cohort = 1 THEN s END) AS DOUBLE)
                   / CAST(sum(CASE WHEN cohort = 1 THEN n END) AS DOUBLE)
                   AS mean_new
               FROM g GROUP BY dim),
         q AS (SELECT dim, mean_old, mean_new,
                 CAST(sign(mean_old) * floor(abs(mean_old)*1000000.0 + 0.5)
                   AS BIGINT) AS qo,
                 CAST(sign(mean_new) * floor(abs(mean_new)*1000000.0 + 0.5)
                   AS BIGINT) AS qn
               FROM m)
         SELECT dim,
           sign(mean_old) * (floor(abs(mean_old)*10000.0 + 0.5)/10000.0)
             AS mean_old,
           sign(mean_new) * (floor(abs(mean_new)*10000.0 + 0.5)/10000.0)
             AS mean_new,
           sign(mean_new - mean_old)
             * (floor(abs(mean_new - mean_old)*10000.0 + 0.5)/10000.0) AS delta,
           sign(cosr) * (floor(abs(cosr)*10000.0 + 0.5)/10000.0) AS centroid_cos
         FROM (SELECT dim, mean_old, mean_new,
                 CAST(sum(qo*qn) OVER () AS DOUBLE)
                   / (sqrt(CAST(sum(qo*qo) OVER () AS DOUBLE))
                      * sqrt(CAST(sum(qn*qn) OVER () AS DOUBLE))) AS cosr
               FROM q)
         ORDER BY dim"""
  )
}
