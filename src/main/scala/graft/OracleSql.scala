package graft

/** DuckDB-runnable ANSI SQL oracles, one per SparkEntry.queries key.
  *
  * Contract (driver): each SQL runs in DuckDB over the same parquet
  * tables, columns are sorted by name before value hashing — so every
  * computed column is aliased identically here and in the Spark query.
  * Doubles are rounded in BOTH engines at the same precision to absorb
  * summation-order ulp drift.
  */
object OracleSql {

  val core: Map[String, String] = Map(
    "q01_pruned_agg" -> """
      SELECT l_returnflag,
             strftime(l_shipdate, '%Y') AS ship_year,
             strftime(l_shipdate, '%m') AS ship_month,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_purchase_amount,
             COUNT(l_quantity) AS count_of_purchase
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2, 3
    """,
    "q02_filtered_scan" -> """
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             l_extendedprice,
             strftime(l_shipdate, '%Y%m%d') AS ship_ymd
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                           AND TIMESTAMP '1995-12-31 00:00:00'
    """,
    "q03_denorm_join" -> """
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             l_extendedprice, l_discount, l_returnflag,
             strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
             o_custkey, o_orderstatus, o_orderpriority,
             c_name, c_mktsegment,
             n_name AS nation, r_name AS region_name
      FROM lineitem
      LEFT JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN customer ON o_custkey = c_custkey
      LEFT JOIN nation ON c_nationkey = n_nationkey
      LEFT JOIN region ON n_regionkey = r_regionkey
    """,
    "q04_cte_sql" -> """
      WITH cust_geo AS (
        SELECT c_custkey, c_mktsegment, n_name, r_name
        FROM customer
        LEFT JOIN nation ON c_nationkey = n_nationkey
        LEFT JOIN region ON n_regionkey = r_regionkey
      )
      SELECT r_name AS region_name,
             n_name AS nation,
             o_orderpriority,
             ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
             COUNT(l_quantity) AS count_of_purchase
      FROM lineitem
      LEFT JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN cust_geo ON o_custkey = c_custkey
      GROUP BY 1, 2, 3
    """,
    "q05_agg_then_join" -> """
      WITH per_order AS (
        SELECT l_orderkey,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS order_amount,
               COUNT(l_quantity) AS n_lines
        FROM lineitem GROUP BY 1
      )
      SELECT l_orderkey, order_amount, n_lines,
             o_custkey, c_name, c_mktsegment
      FROM per_order
      LEFT JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN customer ON o_custkey = c_custkey
    """,
    "q06_count_distinct" -> """
      SELECT event_type,
             COUNT(event_id) AS n_events,
             COUNT(DISTINCT user_id) AS n_users,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value
      FROM events GROUP BY 1
    """,
    "q07_kpi_arithmetic" -> """
      WITH agg AS (
        SELECT o_orderstatus,
               COUNT(o_orderkey) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS raw_amount
        FROM orders GROUP BY 1
      )
      SELECT o_orderstatus, n_orders, n_customers,
             ROUND(n_orders / n_customers, 4) AS orders_per_customer,
             ROUND(raw_amount / n_orders / 1000, 4) AS avg_order_k,
             ROUND(raw_amount / 1000000, 2) AS amount_mm
      FROM agg
    """,
    "q08_weekday" -> """
      SELECT isodow(o_orderdate) AS iso_dow,
             dayname(o_orderdate) AS day_of_week,
             COUNT(o_orderkey) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_amount
      FROM orders GROUP BY 1, 2
    """,
    "q09_multi_sort" -> """
      SELECT n_regionkey, n_name,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_amount,
             COUNT(l_quantity) AS count_of_purchase
      FROM lineitem
      LEFT JOIN orders ON l_orderkey = o_orderkey
      LEFT JOIN customer ON o_custkey = c_custkey
      LEFT JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
      ORDER BY n_regionkey ASC, total_amount DESC,
               count_of_purchase DESC, n_name ASC
    """,
    "q10_topk" -> """
      SELECT o_custkey,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1
      ORDER BY revenue DESC, o_custkey ASC
      LIMIT 10
    """,
    "q11_window_rank" -> """
      WITH per_part AS (
        SELECT p_brand, p_partkey, p_name,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3
      )
      SELECT p_brand, rank_in_brand, p_partkey, p_name, revenue
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY p_brand
                 ORDER BY revenue DESC, p_partkey ASC) AS rank_in_brand
        FROM per_part
      )
      WHERE rank_in_brand <= 3
    """,
    "q12_json_extract" -> """
      SELECT event_type,
             COUNT(CAST(json_extract_string(props, 'k') AS BIGINT))
               AS n_events,
             CAST(SUM(CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT) AS sum_k,
             ROUND(AVG(CAST(json_extract_string(props, 'k') AS BIGINT)), 4)
               AS avg_k
      FROM events GROUP BY 1
    """,
    "q13_anti_join" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderstatus = 'F')
    """,
    "q14_semi_join" -> """
      SELECT c_custkey, c_name
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    """,
    "q19_hourly_events" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type,
             COUNT(event_id) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value
      FROM events GROUP BY 1, 2
    """,
    // q189: identical rows to q19 — the point is that the SPARK side
    // produced them through a real Structured Streaming execution.
    "q189_streaming_hourly" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type,
             COUNT(event_id) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value
      FROM events GROUP BY 1, 2
    """,
    // q190: the stub video decode (48-byte non-overlapping frames, energy
    // as luma proxy), the |Δluma|*4 >= peak cut predicate, and the
    // shot-length recurrence restated over hex(encode(text)). Frame
    // positions are 1-indexed to match Spark's element_at.
    "q190_video_shots" -> """
      WITH m AS (
        SELECT doc_id AS media_id, hex(encode(text)) AS hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
      ), f AS (
        SELECT media_id, hx,
               CAST(CASE WHEN n_bytes >= 48 THEN (n_bytes - 48) // 48 + 1
                         ELSE 0 END AS INTEGER) AS n_frames
        FROM m
      ), e AS (
        SELECT media_id, n_frames,
               CASE WHEN n_frames > 0 THEN
                 list_transform(generate_series(0, n_frames - 1), fr ->
                   CAST(list_sum(list_transform(
                     generate_series(fr * 48, fr * 48 + 47), i ->
                       CAST((CAST(concat('0x',
                              substr(hx, CAST(i AS INTEGER) * 2 + 1, 2))
                              AS INTEGER) - 128) AS BIGINT)
                       * CAST((CAST(concat('0x',
                              substr(hx, CAST(i AS INTEGER) * 2 + 1, 2))
                              AS INTEGER) - 128) AS BIGINT)))
                     AS BIGINT))
               ELSE CAST([] AS BIGINT[]) END AS en
        FROM f
      ), s AS (
        SELECT media_id, n_frames, en,
               CASE WHEN n_frames > 1 THEN
                 list_concat([CAST(1 AS BIGINT)],
                   list_filter(generate_series(2, CAST(n_frames AS BIGINT)),
                     k -> abs(en[k] - en[k-1]) * 4 >= list_max(en)))
               WHEN n_frames = 1 THEN [CAST(1 AS BIGINT)]
               ELSE CAST([] AS BIGINT[]) END AS starts
        FROM e
      )
      SELECT media_id, n_frames,
             CAST(len(starts) AS INTEGER) AS n_shots,
             CAST(CASE WHEN len(starts) > 1 THEN starts[2]
                       ELSE -1 END AS INTEGER) AS first_cut,
             CAST(COALESCE(list_sum(list_transform(starts, k -> en[k])), 0)
                  AS BIGINT) AS sampled_energy,
             CAST(CASE WHEN n_frames > 0 THEN
               list_max(list_transform(generate_series(1, len(starts)), j ->
                 (CASE WHEN j = len(starts) THEN n_frames + 1
                       ELSE starts[j+1] END) - starts[j]))
             ELSE -1 END AS INTEGER) AS longest_shot
      FROM s
    """,
    // q191: the md5-lane HLL — bucket/rank/register/denominator all
    // integer-exact; the estimate divides the same precomputed double
    // literal by the same BIGINT, so the IEEE result is identical.
    "q191_hll_md5" -> """
      WITH d AS (
        SELECT DISTINCT event_type, user_id FROM events
      ), h AS (
        SELECT event_type,
               CAST(concat('0x', substr(md5(concat('q191_',
                 CAST(user_id AS VARCHAR))), 1, 2)) AS INTEGER) % 64
                 AS bucket,
               CAST(concat('0x', substr(md5(concat('q191_',
                 CAST(user_id AS VARCHAR))), 3, 13)) AS BIGINT) AS w
        FROM d
      ), b AS (
        SELECT event_type, bucket,
               MAX(CASE WHEN w = 0 THEN 53
                        ELSE 53 - length(bin(w)) END) AS m_b,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM h GROUP BY 1, 2
      ), g AS (
        SELECT event_type,
               CAST(SUM(n_users) AS BIGINT) AS exact_users,
               CAST(COUNT(*) AS BIGINT) AS nonempty,
               CAST(SUM(1::BIGINT << (53 - m_b)) AS BIGINT) AS d_ne
        FROM b GROUP BY 1
      )
      SELECT event_type, exact_users, nonempty,
             d_ne + (64 - nonempty) * (1::BIGINT << 53) AS denom_scaled,
             ROUND(2.6157483096520143e19 /
               CAST(d_ne + (64 - nonempty) * (1::BIGINT << 53) AS DOUBLE),
               2) AS hll_est
      FROM g
    """,
    // q192: gaps-and-islands reconstruction of session_window's
    // half-open-interval rule — a NEW session starts at raw diff
    // >= 30 min at MICROSECOND precision (session_window compares raw
    // event times; a second-truncated rule splits one boundary pair at
    // sf0.1 that the engine merges). q41's batch rule is the strict >
    // on truncated seconds; each matches its own engine.
    "q192_streaming_sessions" -> """
      WITH g AS (
        SELECT user_id, ts, event_id, value,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
        FROM events
      ), s AS (
        SELECT user_id, ts, value,
               CAST(SUM(CASE WHEN prev_ts IS NULL
                              OR epoch_us(ts) - epoch_us(prev_ts)
                                 >= 1800000000
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_seq
        FROM g
      )
      SELECT user_id,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             COUNT(*) AS n_events,
             date_diff('second', MIN(ts), MAX(ts)) AS duration_sec,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS session_value
      FROM s GROUP BY user_id, session_seq
    """,
    // q193: the plain join+agg — AQE's skew split changes scheduling,
    // never results, so the oracle is skew-oblivious.
    "q193_aqe_skew_join" -> """
      WITH fact AS (
        SELECT CASE WHEN l_orderkey % 10 < 8 THEN 1
                    ELSE l_suppkey END AS skew_key,
               l_extendedprice
        FROM lineitem
      )
      SELECT s_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM fact JOIN supplier ON skew_key = s_suppkey
      GROUP BY 1
    """,
    // q194: the rebalance split moves bytes between files, never rows —
    // the oracle states the same skewed-date rollup over the source.
    "q194_rebalance_write" -> """
      SELECT CASE WHEN day(ts) <= 24 THEN '2024-01-01'
                  ELSE strftime(ts, '%Y-%m-%d') END AS dt,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_value
      FROM events GROUP BY 1
    """,
    // q195: the duplicated feed collapses back to the original table
    // when streaming dedup is exact — same rows as q19/q189.
    "q195_streaming_dedup" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type,
             COUNT(event_id) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value
      FROM events GROUP BY 1, 2
    """,
    // q196: the stream-static broadcast enrich stated as a plain batch
    // left join against the per-user order rollup.
    "q196_stream_static_join" -> """
      WITH dim AS (
        SELECT o_custkey AS user_key, COUNT(*) AS n_orders
        FROM orders GROUP BY 1
      )
      SELECT event_type,
             (user_key IS NOT NULL) AS known_user,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_value
      FROM events LEFT JOIN dim ON user_id = user_key
      GROUP BY 1, 2
    """,
    // q199: the cogroup is semantically the full outer join of the two
    // per-user rollups; the in-group exact median is DuckDB's MEDIAN
    // (middle value, or the mean of the two middles).
    "q199_cogroup_align" -> """
      WITH e AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MEDIAN(value) AS median_value
        FROM events GROUP BY 1
      ), o AS (
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 2) AS total_spend
        FROM orders GROUP BY 1
      )
      SELECT COALESCE(user_id, o_custkey) AS user_id,
             COALESCE(n_events, 0) AS n_events,
             median_value,
             COALESCE(n_orders, 0) AS n_orders,
             COALESCE(total_spend, 0.0) AS total_spend
      FROM e FULL OUTER JOIN o ON user_id = o_custkey
    """,
    // q200: join order changes plans, never results — the oracle is
    // the same chain stated naturally.
    "q200_cbo_reorder" -> """
      SELECT n_name,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1
    """,
    // q201: the streaming-connector path reproduces q19's rows — the
    // hash holds only if offset bookkeeping loses and dups nothing.
    "q201_streaming_connector" -> """
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             event_type,
             COUNT(event_id) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value
      FROM events GROUP BY 1, 2
    """,
    // q197: gaps-and-islands at MILLISECOND precision (the engine's
    // state machine compares ms-truncated event times). A session with
    // a SUCCESSOR event is closed in-batch and emitted regardless of
    // the watermark, so the exclusion applies only to each user's LAST
    // session (truly open at end-of-stream): dropped iff its event-time
    // timeout (last + gap) never falls strictly behind the final
    // watermark (max ts − 10 min, ms-truncated).
    "q197_custom_state_sessions" -> """
      WITH g AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
        FROM events
      ), s AS (
        SELECT user_id, ts,
               CAST(SUM(CASE WHEN prev_ts IS NULL
                              OR epoch_ms(ts) - epoch_ms(prev_ts) >= 1800000
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_seq
        FROM g
      ), agg AS (
        SELECT user_id, session_seq,
               MIN(ts) AS st, MAX(ts) AS en,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, session_seq
      ), lastq AS (
        SELECT *, MAX(session_seq) OVER (PARTITION BY user_id)
                 AS last_seq
        FROM agg
      ), wm AS (
        SELECT MAX(epoch_ms(ts)) - 600000 AS w FROM events
      )
      SELECT user_id,
             strftime(st, '%Y-%m-%d %H:%M:%S') AS session_start,
             n_events,
             date_diff('second', st, en) AS duration_sec
      FROM lastq, wm
      WHERE session_seq < last_seq OR epoch_ms(en) + 1800000 < w
    """,
    // q198: the v2-connector round-trip is lossless, so the oracle is
    // the same audit stated over the original parquet table.
    "q198_eventlog_source" -> """
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MIN(event_id) AS min_event,
             MAX(epoch_us(ts)) AS max_ts_us,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_value
      FROM events GROUP BY 1
    """,
    // q202: the observed write-path metrics restated as a direct scan
    // aggregate — the whole point is the Spark side never ran one.
    "q202_observed_audit" -> """
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_value,
             MAX(value) AS max_value,
             MIN(event_id) AS min_event
      FROM events
    """,
    // q203: DuckDB's own JSON parser restates the variant extraction —
    // two independent JSON implementations agreeing on every value.
    "q203_variant_extract" -> """
      WITH k AS (
        SELECT event_type,
               CAST(json_extract_string(props, 'k') AS BIGINT) AS k
        FROM events
      )
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             MIN(k) AS min_k,
             MAX(k) AS max_k,
             CAST(COUNT(CASE WHEN k % 2 = 0 THEN 1 END) AS BIGINT)
               AS n_even
      FROM k WHERE k IS NOT NULL GROUP BY 1
    """,
    // q204: the exactly-once incremental view equals the batch
    // aggregate of everything ingested — that equality IS the query.
    "q204_incremental_view" -> """
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_value
      FROM events GROUP BY 1
    """,
    // q205-q208: the GraftTable format queries — each oracle states
    // the result over the ORIGINAL table, so a hash match proves the
    // manifest/snapshot/pruning/COW machinery lost and invented
    // nothing relative to plain parquet.
    "q205_format_snapshot" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q222: q216's statement — the SQL-level aggregate pushdown must
    // answer exactly what the manifest recorded.
    "q222_metadata_agg_sql" -> """
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(o_orderkey) AS min_o_orderkey,
             MAX(o_orderkey) AS max_o_orderkey,
             strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_date,
             strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date
      FROM orders
    """,
    // q221: the same statement as q205 — a table built purely through
    // the connector's write path must read back bit-identical.
    "q221_connector_write" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q219: the same statement as q205 — the connector read must be
    // bit-identical to the native-API read of the same table.
    "q219_connector_read" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q206: version 1 is, by construction, the pre-1997 commit.
    "q206_time_travel" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1 ORDER BY 1
    """,
    // q207: file skipping is a superset guarantee; the range filter is
    // the whole query, so the hash pins losslessness.
    "q207_pruned_read" -> """
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders
      WHERE o_orderkey BETWEEN 1000 AND 5000
      ORDER BY o_orderkey
    """,
    // q208: the COW delete must leave exactly the non-'R' rows of the
    // 1996 window.
    "q208_cow_delete" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS total_price,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
               AS DECIMAL(18,4)) AS DOUBLE) AS total_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_returnflag <> 'R'
      GROUP BY 1, 2 ORDER BY 1, 2
    """,
    // q209: the merged table must equal base-with-updates-applied plus
    // inserts — stated as one CASE over the original (×2 is IEEE-exact).
    "q209_merge_upsert" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(CASE
               WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                AND o_orderkey % 10 = 0
               THEN o_totalprice * 2 ELSE o_totalprice END
               AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q210: exactly-once streaming append — the replayed batch 0 must
    // be swallowed by the snapshot ledger, so the table equals a plain
    // aggregate of the source.
    "q210_streaming_table_sink" -> """
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_value
      FROM events GROUP BY 1 ORDER BY 1
    """,
    // q211: z-order changes the layout, never the answer — the hash
    // pins losslessness of the custkey-range scan over zone maps.
    "q211_zorder_prune" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_custkey BETWEEN 100 AND 200
      ORDER BY o_orderkey
    """,
    // q212: the v1→v3 file diff is, by construction, the 1997+ commits.
    "q212_incremental_changes" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1 ORDER BY 1
    """,
    // q223: q212's statement — the connector's readChangesFrom option
    // must plan exactly the 1997+ commits' files.
    "q223_connector_changes" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1 ORDER BY 1
    """,
    // q226: q208's statement — SQL DELETE through the catalog must
    // produce the same table the API-level COW delete does.
    "q226_sql_delete" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS total_price,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
               AS DOUBLE) AS DOUBLE) AS total_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_returnflag <> 'R'
      GROUP BY 1, 2 ORDER BY 1, 2
    """,
    // q225: q205's statement — name-based resolution through the
    // TableCatalog plugin must read exactly the table.
    "q225_catalog_read" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q224: q205's statement — the streaming read over version offsets
    // must deliver every commit exactly once.
    "q224_streaming_read" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q213: the old-writer half (even doc_id) must surface n_chars as
    // NULL after the merged read; count(n_chars) pins the placement.
    "q213_schema_evolution_fmt" -> """
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(CASE WHEN doc_id % 2 = 1 THEN n_chars END)
               AS BIGINT) AS n_with_chars,
             CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END)
               AS BIGINT) AS sum_chars
      FROM documents GROUP BY 1 ORDER BY 1
    """,
    // q214: the CDC-maintained view must equal the full recompute —
    // the oracle IS the full recompute, stated over the original.
    "q214_cdc_maintained_view" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q215: zone-map skipping under a composite predicate is pure
    // optimization — the answer must equal the plain WHERE.
    "q215_predicate_pruned_scan" -> """
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders
      WHERE (o_orderkey BETWEEN 1000 AND 3000
             OR o_orderkey BETWEEN 9000 AND 11000)
        AND o_orderstatus = 'F'
      ORDER BY o_orderkey
    """,
    // q216: the manifest's counts and envelopes must equal the direct
    // aggregates — no data file is read on the Spark side.
    "q216_metadata_agg" -> """
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(o_orderkey) AS min_o_orderkey,
             MAX(o_orderkey) AS max_o_orderkey,
             strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_date,
             strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date
      FROM orders
    """,
    // q218: the silver join through the lakehouse bronze must equal
    // the flat left-join chain over the originals; COUNT(r_name) pins
    // the nullability the left joins thread through.
    "q218_lakehouse_silver" -> """
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue,
             CAST(COUNT(r_name) AS BIGINT) AS n_with_region
      FROM lineitem
      LEFT JOIN orders   ON l_orderkey  = o_orderkey
      LEFT JOIN part     ON l_partkey   = p_partkey
      LEFT JOIN customer ON o_custkey   = c_custkey
      LEFT JOIN nation   ON c_nationkey = n_nationkey
      LEFT JOIN region   ON n_regionkey = r_regionkey
      GROUP BY 1 ORDER BY 1
    """,
    // q220: the sales_by_region gold mart, maintained as a GraftTable
    // through an initial load + an idempotent 1996 replaceWhere
    // re-run, must equal the mart restated flat over the originals.
    "q220_lakehouse_gold" -> """
      SELECT l_returnflag,
             strftime(l_shipdate, '%Y') AS ship_year,
             strftime(l_shipdate, '%m') AS ship_month,
             r_name, n_name,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS total_purchase_amount,
             CAST(COUNT(l_quantity) AS BIGINT) AS count_of_purchase
      FROM lineitem
      LEFT JOIN orders   ON l_orderkey  = o_orderkey
      LEFT JOIN part     ON l_partkey   = p_partkey
      LEFT JOIN customer ON o_custkey   = c_custkey
      LEFT JOIN nation   ON c_nationkey = n_nationkey
      LEFT JOIN region   ON n_regionkey = r_regionkey
      GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2, 3, 4, 5
    """,
    // q217: replace-where rebuilt 1997-1998 with doubled prices in one
    // snapshot; everything else must be untouched.
    "q217_replace_where" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(CASE
               WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
               THEN o_totalprice * 2 ELSE o_totalprice END
               AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q227: SQL MERGE INTO must equal the q209 API merge — one CASE
    // over the original orders (×2 is IEEE-exact).
    "q227_sql_merge" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(CASE
               WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                AND o_orderkey % 10 = 0
               THEN o_totalprice * 2 ELSE o_totalprice END
               AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q228: the connector replaceWhere option must equal the q217
    // API replaceWhere — same CASE oracle.
    "q228_connector_replace_where" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(CASE
               WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
               THEN o_totalprice * 2 ELSE o_totalprice END
               AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q229: the first-class streaming sink must land exactly the
    // source — same oracle shape as q210.
    "q229_streaming_write" -> """
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_value
      FROM events GROUP BY 1 ORDER BY 1
    """,
    // q238: the storage-partitioned join's result must equal the same
    // fact x dim join stated flat over the original events.
    "q238_spj_join" -> """
      WITH dim AS (
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1)
      SELECT e.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MIN(d.n_users) AS n_users,
             ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS total_value
      FROM events e JOIN dim d ON e.event_type = d.event_type
      GROUP BY 1 ORDER BY 1
    """,
    // q239: after RESTORE to the pre-corruption snapshot, the table
    // must read as exactly the original good slice.
    "q239_restore" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1 ORDER BY 1
    """,
    // q240: clustered CTAS + INSERT INTO must land exactly the source
    // rows; the windowed read states the same filter flat.
    "q240_clustered_insert" -> """
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS total_qty,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS total_price
      FROM lineitem
      WHERE l_orderkey BETWEEN 1000 AND 5000
      GROUP BY 1 ORDER BY 1
    """,
    // q241: the bloom-pruned point lookup must return exactly the
    // rows the flat predicate selects — the index only skips files.
    "q241_bloom_lookup" -> """
      SELECT o_orderkey, o_custkey, o_orderstatus,
             ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE),
               2) AS price
      FROM orders
      WHERE o_custkey IN (7, 123, 1001)
      ORDER BY o_orderkey
    """,
    // q242: after the CALL restore/compact/vacuum maintenance loop the
    // table must read as exactly the original lineitem projection.
    "q242_sql_procedures" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS total_qty,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS total_price
      FROM lineitem
      GROUP BY 1, 2 ORDER BY 1, 2
    """,
    // q243: the 3-dim z-ordered table must read as the flat filter —
    // re-clustering moves bytes, never values.
    "q243_zorder_3d" -> """
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS total_qty,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS total_price
      FROM lineitem
      WHERE l_suppkey BETWEEN 10 AND 25
      GROUP BY 1 ORDER BY 1
    """,
    // q244: the constrained insert's pass path must land every value
    // untouched — the guard only gates, never transforms.
    "q244_constrained_insert" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q245: the rename+widen evolution must not perturb a value —
    // the oracle replays the narrow float round-trip (REAL = float4)
    // the Spark table stored, then aggregates the original rows.
    "q245_schema_evolution" -> """
      SELECT c_mktsegment AS segment,
             CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(CAST(c_custkey AS BIGINT)) AS BIGINT) AS key_sum,
             ROUND(CAST(SUM(CAST(CAST(CAST(c_acctbal AS REAL) AS DOUBLE)
               AS DECIMAL(18,4))) AS DOUBLE), 2) AS bal_sum
      FROM customer GROUP BY 1 ORDER BY 1
    """,
    // q246: the tag pins the PRE-mutation snapshot — the aggregate
    // over VERSION AS OF 'baseline' must equal the original rows,
    // untouched by the later MOR delete and polluting append.
    "q246_tagged_snapshot" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q247: the STREAMED change feed's per-key net fold must land on
    // the live table — orders minus the MOR-deleted seventh keys.
    "q247_streaming_cdc" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_live
      FROM orders
      WHERE o_orderkey % 7 <> 0
      GROUP BY 1 ORDER BY 1
    """,
    // q248: a compaction inside the CDC window must be INVISIBLE —
    // the fold equals raw arithmetic over inserts/deletes alone; the
    // %35 keys (deleted then re-appended) are live once, the %5
    // non-%7 keys twice (UNION ALL keeps the multiplicity).
    "q248_cdc_compaction" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_live
      FROM (
        SELECT o_orderkey, o_orderdate FROM orders
        WHERE o_orderkey % 7 <> 0
        UNION ALL
        SELECT o_orderkey, o_orderdate FROM orders
        WHERE o_orderkey % 5 = 0)
      GROUP BY 1 ORDER BY 1
    """,
    // q249: merge CDC events by kind — matched rows as pre/post image
    // pairs (old and doubled balances), unmatched keys as inserts.
    "q249_cdc_merge_updates" -> """
      SELECT change_type,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(bal AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS bal_sum
      FROM (
        SELECT 'insert' AS change_type, c_acctbal AS bal
        FROM customer WHERE c_custkey % 100 = 0
        UNION ALL
        SELECT 'update_preimage', c_acctbal
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT 'update_postimage', c_acctbal * 2
        FROM customer WHERE c_custkey % 10 = 0)
      GROUP BY 1 ORDER BY 1
    """,
    // q250: after the predicate-scoped compaction of the low key band
    // the table must read as lineitem minus the MOR-deleted low-band
    // rows — the windowed fold drops DV'd rows and changes nothing
    // else.
    "q250_compact_where" -> """
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS qty_sum
      FROM lineitem
      WHERE NOT (l_orderkey % 10 = 0 AND l_orderkey <=
        (SELECT CAST(FLOOR(MAX(l_orderkey) / 2.0) AS BIGINT)
         FROM lineitem))
      GROUP BY 1 ORDER BY 1
    """,
    // q251: name-based table_changes — the (1, current] window holds
    // the %5 append as inserts and the %7 MOR delete as deletes; the
    // deleted set covers BOTH copies of %35 keys (original + appended).
    "q251_table_changes_named" -> """
      SELECT change_type,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(price AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS price_sum
      FROM (
        SELECT 'insert' AS change_type, o_totalprice AS price
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT 'delete', o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT 'delete', o_totalprice
        FROM orders WHERE o_orderkey % 35 = 0)
      GROUP BY 1 ORDER BY 1
    """,
    // q252: the bin-packed scan of ~240 micro files (minus the %11
    // MOR band) must read exactly orders minus that band — chained
    // readers lose/duplicate nothing, each DV slice applies once.
    "q252_packed_scan" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS price_sum
      FROM orders
      WHERE o_orderkey % 11 <> 0
      GROUP BY 1 ORDER BY 1
    """,
    // q253: one multi-row-group file scanned as byte-range splits
    // (minus the %13 MOR band) must read exactly lineitem minus that
    // band — ranges are disjoint/covering, DV ordinals stay global.
    "q253_split_scan" -> """
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS qty_sum
      FROM lineitem
      WHERE l_orderkey % 13 <> 0
      GROUP BY 1 ORDER BY 1
    """,
    // q254: draining the 5-commit backlog in >=3 rate-limited batches
    // must fold to exactly orders — no version lost at a batch
    // boundary, none replayed across one.
    "q254_rate_limited_stream" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders
      GROUP BY 1 ORDER BY 1
    """,
    // q255: the CDC-driven nightly curation pipeline (3 ingest
    // commits → change-feed stream → quarantine + incremental dedup
    // verdicts → index fold → mart upsert) must land EXACTLY on this
    // one-shot recomputation from raw documents: the duplicate
    // injection (every 7th doc re-posted in the last batch, every
    // 11th in its own), the quarantine rule, q168's verdict
    // precedence, and the merge-maintained per-language mart.
    "q255_cdc_curation" -> """
      WITH corpus AS (
        SELECT doc_id, text, lang, CAST(doc_id % 3 AS INT) AS b
        FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, lang, 2
        FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 2000000, text, lang, CAST(doc_id % 3 AS INT)
        FROM documents WHERE doc_id % 11 = 0
      ), d AS (
        SELECT doc_id, lang, b,
               CAST(length(text) AS BIGINT) AS nch,
               length(trim(text)) < 120 AS quar,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                 AS fp
        FROM corpus
      ), marked AS (
        SELECT *,
               MIN(b) OVER (PARTITION BY fp) AS min_b,
               MIN(doc_id) OVER (PARTITION BY fp, b) AS min_id_b
        FROM d WHERE NOT quar
      ), v AS (
        SELECT lang, nch,
               CASE WHEN b > min_b THEN 'dup_of_history'
                    WHEN doc_id > min_id_b THEN 'dup_in_batch'
                    ELSE 'novel' END AS status
        FROM marked
        UNION ALL
        SELECT lang, nch, 'quarantined' FROM d WHERE quar
      )
      SELECT lang,
             CAST(COUNT(*) FILTER (status = 'quarantined') AS BIGINT)
               AS n_quarantined,
             CAST(COUNT(*) FILTER (status = 'dup_of_history') AS BIGINT)
               AS n_dup_hist,
             CAST(COUNT(*) FILTER (status = 'dup_in_batch') AS BIGINT)
               AS n_dup_batch,
             CAST(COUNT(*) FILTER (status = 'novel') AS BIGINT)
               AS n_novel,
             CAST(COUNT(*) FILTER (status = 'novel') AS BIGINT)
               AS mart_docs,
             CAST(COALESCE(SUM(nch) FILTER (status = 'novel'), 0)
               AS BIGINT) AS mart_chars
      FROM v GROUP BY lang ORDER BY lang
    """,
    // q256: the CDC near-dup pipeline (3 ingest commits → change-feed
    // stream → MinHash-band verdicts against a persisted novel-only
    // band index → index fold → mart delta-merge) must land exactly
    // on this one-shot recomputation: the same md5 lanes/band keys as
    // q54/q55, the SEQUENTIAL novel-only index evolution unrolled
    // batch by batch (a doc colliding only with a non-novel doc of an
    // earlier batch stays novel — the index never held that doc), the
    // within-batch lowest-id-collision rule, and the delta-merged
    // per-language mart.
    "q256_cdc_neardup" -> """
      WITH corpus AS (
        SELECT doc_id, text, lang, CAST(doc_id % 3 AS INT) AS b
        FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text || ' near duplicate repost',
               lang, 2
        FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 2000000, 'forwarded note ' || text, lang,
               CAST(doc_id % 3 AS INT)
        FROM documents WHERE doc_id % 11 = 0
      ), t AS (
        SELECT doc_id, lang, b,
               CAST(length(text) AS BIGINT) AS nch,
               regexp_split_to_array(trim(text), '\s+') AS toks
        FROM corpus
      ), sh AS (
        SELECT doc_id, lang, b, nch,
               CASE WHEN len(toks) < 2
                    THEN [array_to_string(toks, ' ')]
                    ELSE list_distinct(list_transform(
                      range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1]))
               END AS s
        FROM t
      ), lanes AS (
        SELECT doc_id, lang, b, nch,
               [list_min(list_transform(s,
                  x -> md5(i::VARCHAR || '|' || x)))
                for i in generate_series(0, 15)] AS lanes
        FROM sh
      ), bands AS (
        SELECT doc_id, lang, b, nch, g.band,
               md5(array_to_string(
                 lanes[g.band * 4 + 1 : g.band * 4 + 4], ''))
                 AS band_key
        FROM lanes, generate_series(0, 3) AS g(band)
      ), batch_hit AS (
        SELECT x.doc_id, MIN(y.doc_id) AS batch_first
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.band = y.band
         AND x.band_key = y.band_key AND y.doc_id < x.doc_id
        GROUP BY x.doc_id
      ), v0 AS (
        SELECT d.doc_id, d.lang, d.nch,
               CASE WHEN bh.batch_first IS NOT NULL
                    THEN 'near_dup_in_batch' ELSE 'novel' END AS status
        FROM t d LEFT JOIN batch_hit bh USING (doc_id)
        WHERE d.b = 0
      ), idx0 AS (
        SELECT bd.band, bd.band_key, bd.doc_id AS canonical
        FROM bands bd JOIN v0 ON v0.doc_id = bd.doc_id
        WHERE v0.status = 'novel'
      ), h1 AS (
        SELECT p.doc_id, MIN(i.canonical) AS hist_canonical
        FROM bands p JOIN idx0 i
          ON p.band = i.band AND p.band_key = i.band_key
        WHERE p.b = 1 GROUP BY p.doc_id
      ), v1 AS (
        SELECT d.doc_id, d.lang, d.nch,
               CASE WHEN h.hist_canonical IS NOT NULL
                      THEN 'near_dup_of_history'
                    WHEN bh.batch_first IS NOT NULL
                      THEN 'near_dup_in_batch'
                    ELSE 'novel' END AS status
        FROM t d LEFT JOIN h1 h USING (doc_id)
        LEFT JOIN batch_hit bh USING (doc_id)
        WHERE d.b = 1
      ), idx1 AS (
        SELECT * FROM idx0
        UNION ALL
        SELECT bd.band, bd.band_key, bd.doc_id
        FROM bands bd JOIN v1 ON v1.doc_id = bd.doc_id
        WHERE v1.status = 'novel'
      ), h2 AS (
        SELECT p.doc_id, MIN(i.canonical) AS hist_canonical
        FROM bands p JOIN idx1 i
          ON p.band = i.band AND p.band_key = i.band_key
        WHERE p.b = 2 GROUP BY p.doc_id
      ), v2 AS (
        SELECT d.doc_id, d.lang, d.nch,
               CASE WHEN h.hist_canonical IS NOT NULL
                      THEN 'near_dup_of_history'
                    WHEN bh.batch_first IS NOT NULL
                      THEN 'near_dup_in_batch'
                    ELSE 'novel' END AS status
        FROM t d LEFT JOIN h2 h USING (doc_id)
        LEFT JOIN batch_hit bh USING (doc_id)
        WHERE d.b = 2
      ), v AS (
        SELECT * FROM v0 UNION ALL
        SELECT * FROM v1 UNION ALL
        SELECT * FROM v2
      )
      SELECT lang,
             CAST(COUNT(*) FILTER (status = 'near_dup_of_history')
               AS BIGINT) AS n_dup_hist,
             CAST(COUNT(*) FILTER (status = 'near_dup_in_batch')
               AS BIGINT) AS n_dup_batch,
             CAST(COUNT(*) FILTER (status = 'novel') AS BIGINT)
               AS n_novel,
             CAST(COUNT(*) FILTER (status = 'novel') AS BIGINT)
               AS mart_docs,
             CAST(COALESCE(SUM(nch) FILTER (status = 'novel'), 0)
               AS BIGINT) AS mart_chars
      FROM v GROUP BY lang ORDER BY lang
    """,
    // q257: the CDC SEMANTIC dedup pipeline (3 embedding batches →
    // change-feed stream → md5-plane LSH bucket probe → exact-cosine
    // verify at τ=0.30 → novel-only vector index fold → per-label
    // mart delta-merge) must land exactly on this recomputation:
    // q24's planes give both engines identical buckets, the cosine
    // is double-exact on identical inputs (re-posts are ×0.98/×1.02
    // double-scaled copies — bucket- and cosine-preserving), and the
    // sequential novel-only index evolution unrolls batch by batch
    // exactly as q256's oracle does.
    "q257_cdc_semdedup" -> """
      WITH corpus AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               CAST(vec_id % 3 AS INT) AS b
        FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> x * 0.98), 2
        FROM embeddings WHERE vec_id % 7 = 0
        UNION ALL
        SELECT vec_id + 2000000, label,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> x * 1.02),
               CAST(vec_id % 3 AS INT)
        FROM embeddings WHERE vec_id % 11 = 0
      ), planes AS (
        SELECT p, list_transform(range(0, 64), i ->
          CASE CAST(concat('0x', substring(md5(concat('q24_',
                 CAST(p AS VARCHAR), '_', CAST(i AS VARCHAR))), 1, 1))
               AS INT) % 4
            WHEN 0 THEN -3.0 WHEN 1 THEN -1.0 WHEN 2 THEN 1.0
            ELSE 3.0 END) AS pv
        FROM range(0, 4) t(p)
      ), n AS (
        SELECT vec_id, label, b, v,
               sqrt(list_dot_product(v, v)) AS nrm
        FROM corpus
      ), nb AS (
        SELECT n.vec_id, n.label, n.b, n.v, n.nrm, bkt.bucket
        FROM n JOIN (
          SELECT vec_id,
                 CAST(SUM(CASE WHEN list_dot_product(v, pv) >= 0
                               THEN 1 << p ELSE 0 END) AS BIGINT)
                   AS bucket
          FROM n CROSS JOIN planes GROUP BY vec_id) bkt
          USING (vec_id)
      ), batch_hit AS (
        SELECT DISTINCT x.vec_id
        FROM nb x JOIN nb y
          ON x.b = y.b AND x.bucket = y.bucket
         AND y.vec_id < x.vec_id
        WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) >= 0.30
      ), v0 AS (
        SELECT d.vec_id, d.label,
               CASE WHEN bh.vec_id IS NOT NULL
                    THEN 'near_dup_in_batch' ELSE 'novel' END AS status
        FROM nb d LEFT JOIN batch_hit bh ON bh.vec_id = d.vec_id
        WHERE d.b = 0
      ), idx0 AS (
        SELECT i.* FROM nb i JOIN v0 ON v0.vec_id = i.vec_id
        WHERE v0.status = 'novel'
      ), h1 AS (
        SELECT DISTINCT p.vec_id
        FROM nb p JOIN idx0 i ON p.bucket = i.bucket
        WHERE p.b = 1
          AND list_dot_product(p.v, i.v) / (p.nrm * i.nrm) >= 0.30
      ), v1 AS (
        SELECT d.vec_id, d.label,
               CASE WHEN h.vec_id IS NOT NULL
                      THEN 'near_dup_of_history'
                    WHEN bh.vec_id IS NOT NULL
                      THEN 'near_dup_in_batch'
                    ELSE 'novel' END AS status
        FROM nb d LEFT JOIN h1 h ON h.vec_id = d.vec_id
        LEFT JOIN batch_hit bh ON bh.vec_id = d.vec_id
        WHERE d.b = 1
      ), idx1 AS (
        SELECT * FROM idx0
        UNION ALL
        SELECT i.* FROM nb i JOIN v1 ON v1.vec_id = i.vec_id
        WHERE v1.status = 'novel'
      ), h2 AS (
        SELECT DISTINCT p.vec_id
        FROM nb p JOIN idx1 i ON p.bucket = i.bucket
        WHERE p.b = 2
          AND list_dot_product(p.v, i.v) / (p.nrm * i.nrm) >= 0.30
      ), v2 AS (
        SELECT d.vec_id, d.label,
               CASE WHEN h.vec_id IS NOT NULL
                      THEN 'near_dup_of_history'
                    WHEN bh.vec_id IS NOT NULL
                      THEN 'near_dup_in_batch'
                    ELSE 'novel' END AS status
        FROM nb d LEFT JOIN h2 h ON h.vec_id = d.vec_id
        LEFT JOIN batch_hit bh ON bh.vec_id = d.vec_id
        WHERE d.b = 2
      ), vv AS (
        SELECT * FROM v0 UNION ALL
        SELECT * FROM v1 UNION ALL
        SELECT * FROM v2
      )
      SELECT label,
             CAST(COUNT(*) FILTER (status = 'near_dup_of_history')
               AS BIGINT) AS n_dup_hist,
             CAST(COUNT(*) FILTER (status = 'near_dup_in_batch')
               AS BIGINT) AS n_dup_batch,
             CAST(COUNT(*) FILTER (status = 'novel') AS BIGINT)
               AS n_novel,
             CAST(COUNT(*) FILTER (status = 'novel') AS BIGINT)
               AS mart_vecs,
             CAST(COALESCE(SUM(64) FILTER (status = 'novel'), 0)
               AS BIGINT) AS mart_comps
      FROM vv GROUP BY label ORDER BY label
    """,
    // q237: the CDC insert/delete fold must land exactly on the live
    // table — counts over the original rows minus the deleted keys.
    "q237_cdc_mor" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_live
      FROM orders
      WHERE o_orderkey % 7 <> 0
      GROUP BY 1 ORDER BY 1
    """,
    // q235: SQL MERGE in MOR (position-delta) mode — q209's statement.
    "q235_sql_merge_mor" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(CASE
               WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                AND o_orderkey % 10 = 0
               THEN o_totalprice * 2 ELSE o_totalprice END
               AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q236: SQL UPDATE in MOR mode — q230's statement.
    "q236_sql_update_mor" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(CASE
               WHEN l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
               THEN l_quantity + 1000 ELSE l_quantity END
               AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2 ORDER BY 1, 2
    """,
    // q234: the MOR upsert must present exactly the table the COW
    // merge produces — q209's statement.
    "q234_mor_merge" -> """
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(CASE
               WHEN o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                AND o_orderkey % 10 = 0
               THEN o_totalprice * 2 ELSE o_totalprice END
               AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      FROM orders GROUP BY 1 ORDER BY 1
    """,
    // q232: the MERGE-ON-READ delete (deletion vector) must present
    // exactly the table the COW delete produces — q208's statement.
    "q232_mor_delete" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS total_price,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
               AS DECIMAL(18,4)) AS DOUBLE) AS total_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_returnflag <> 'R'
      GROUP BY 1, 2 ORDER BY 1, 2
    """,
    // q233: the connector read (by catalog name) of the DV'd table —
    // same statement; the hash pins the scan-path DV skip.
    "q233_mor_connector" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS total_price,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
               AS DECIMAL(18,4)) AS DOUBLE) AS total_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_returnflag <> 'R'
      GROUP BY 1, 2 ORDER BY 1, 2
    """,
    // q231: TIMESTAMP AS OF an instant recorded between the two
    // commits resolves v1 = the pre-1997 slice.
    "q231_timestamp_travel" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1 ORDER BY 1
    """,
    // q230: SQL UPDATE bumped 1996 quantities by 1000 — CASE over the
    // original lineitem window.
    "q230_sql_update" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(CASE
               WHEN l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
               THEN l_quantity + 1000 ELSE l_quantity END
               AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2 ORDER BY 1, 2
    """
  ).map { case (k, v) => k -> v.trim }

  /** Oracles for the text / dedup / similarity / multimodal surface.
    * Marker lists and formulas must stay in sync with
    * graft.functions.TextFunctions. */
  val text: Map[String, String] = Map(
    "q15_tokens_quality" -> """
      WITH d AS (
        SELECT doc_id, text,
               regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      )
      SELECT doc_id,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_unique_tokens,
             length(text) AS n_chars_actual,
             len(list_filter(toks, x -> list_contains(
               ['the','a','of','and','to','is','in','that','it','on'], x)))
               AS n_stopwords,
             ROUND(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 4)
               AS ttr,
             ROUND(least(len(toks) / 50.0, 1.0) *
                   (0.5 + 0.5 * (len(list_distinct(toks)) /
                                 CAST(len(toks) AS DOUBLE))), 4) AS quality
      FROM d
    """,
    "q16_langid" -> """
      WITH d AS (
        SELECT doc_id, lang,
               regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      ), s AS (
        SELECT doc_id, lang,
          len(list_filter(toks, x -> list_contains(
            ['the','and','of','to','a'], x))) AS sc_en,
          len(list_filter(toks, x -> list_contains(
            ['el','la','de','que','los'], x))) AS sc_es,
          len(list_filter(toks, x -> list_contains(
            ['der','die','und','das','ist'], x))) AS sc_de,
          len(list_filter(toks, x -> list_contains(
            ['le','les','et','des','une'], x))) AS sc_fr
        FROM d
      )
      SELECT lang,
             CASE
               WHEN sc_en >= greatest(sc_en, sc_es, sc_de, sc_fr)
                    AND sc_en > 0 THEN 'en'
               WHEN sc_es >= greatest(sc_en, sc_es, sc_de, sc_fr)
                    AND sc_es > 0 THEN 'es'
               WHEN sc_de >= greatest(sc_en, sc_es, sc_de, sc_fr)
                    AND sc_de > 0 THEN 'de'
               WHEN sc_fr >= greatest(sc_en, sc_es, sc_de, sc_fr)
                    AND sc_fr > 0 THEN 'fr'
               ELSE 'und'
             END AS lang_pred,
             COUNT(doc_id) AS n_docs
      FROM s GROUP BY 1, 2
    """,
    "q17_fingerprint" -> """
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
               AS fingerprint
      FROM documents
    """,
    "q18_exact_dedup" -> """
      SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
               AS fingerprint,
             MIN(doc_id) AS keep_doc_id,
             COUNT(doc_id) AS n_copies
      FROM documents GROUP BY 1
    """,
    "q22_ngram_jaccard" -> """
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      ), sh AS (
        SELECT doc_id,
               CASE WHEN len(toks) < 2
                    THEN [array_to_string(toks, ' ')]
                    ELSE list_distinct(list_transform(
                      range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1]))
               END AS s
        FROM t
      )
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             ROUND(len(list_intersect(a.s, b.s)) /
                   CAST(len(list_distinct(a.s || b.s)) AS DOUBLE), 4)
               AS jaccard
      FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id
    """,
    "q23_knn_bruteforce" -> """
      WITH n AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), s AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(c.v, q.v) / (c.nrm * q.nrm) AS cosine
        FROM n c JOIN n q ON q.vec_id < 10 AND c.vec_id <> q.vec_id
      )
      SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM s
      )
      WHERE rank <= 5
    """,
    "q24_ann_lsh" -> """
      WITH n AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), planes AS (
        SELECT p, list_transform(range(0, 64), i ->
          CASE CAST(concat('0x', substring(md5(concat('q24_',
                 CAST(p AS VARCHAR), '_', CAST(i AS VARCHAR))), 1, 1))
               AS INT) % 4
            WHEN 0 THEN -3.0 WHEN 1 THEN -1.0 WHEN 2 THEN 1.0
            ELSE 3.0 END) AS pv
        FROM range(0, 4) t(p)
      ), b AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN list_dot_product(v, pv) >= 0
                             THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        FROM n CROSS JOIN planes GROUP BY vec_id
      ), nb AS (
        SELECT n.vec_id, n.v, n.nrm, b.bucket FROM n JOIN b USING (vec_id)
      ), probes AS (
        SELECT unnest([0, 1, 2, 4, 8]) AS probe
      ), q AS (
        SELECT vec_id AS query_id, v AS qv, nrm AS qn,
               xor(bucket, probe) AS qb
        FROM nb CROSS JOIN probes WHERE vec_id < 10
      ), s AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_dot_product(c.v, q.qv) / (c.nrm * q.qn) AS cosine
        FROM nb c JOIN q ON c.bucket = q.qb AND c.vec_id <> q.query_id
      )
      SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM s
      )
      WHERE rank <= 5
    """,
    // q170: q24's md5 planes give both engines identical clusters; the
    // verdict is then plain windowed SQL over within-cluster pairs.
    "q170_semantic_dedup" -> """
      WITH n AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), planes AS (
        SELECT p, list_transform(range(0, 64), i ->
          CASE CAST(concat('0x', substring(md5(concat('q24_',
                 CAST(p AS VARCHAR), '_', CAST(i AS VARCHAR))), 1, 1))
               AS INT) % 4
            WHEN 0 THEN -3.0 WHEN 1 THEN -1.0 WHEN 2 THEN 1.0
            ELSE 3.0 END) AS pv
        FROM range(0, 4) t(p)
      ), b AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN list_dot_product(v, pv) >= 0
                             THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        FROM n CROSS JOIN planes GROUP BY vec_id
      ), nb AS (
        SELECT n.vec_id, n.v, n.nrm, b.bucket FROM n JOIN b USING (vec_id)
      ), m AS (
        SELECT d.vec_id, d.bucket, k.vec_id AS keep_id,
               list_dot_product(d.v, k.v) / (d.nrm * k.nrm) AS cosine
        FROM nb d JOIN nb k
          ON d.bucket = k.bucket AND k.vec_id < d.vec_id
        WHERE list_dot_product(d.v, k.v) / (d.nrm * k.nrm) >= 0.30
      )
      SELECT vec_id, bucket, keep_id AS dup_of,
             ROUND(cosine, 6) AS best_cosine, n_lower_matches
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY vec_id
                 ORDER BY cosine DESC, keep_id ASC) AS rk,
               COUNT(*) OVER (PARTITION BY vec_id) AS n_lower_matches
        FROM m
      )
      WHERE rk = 1
    """,
    // q175: same md5 planes as q170; history/batch split by md5 prefix;
    // verdict = best-cosine window over within-bucket cross pairs.
    "q175_incremental_semdedup" -> """
      WITH n AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), planes AS (
        SELECT p, list_transform(range(0, 64), i ->
          CASE CAST(concat('0x', substring(md5(concat('q24_',
                 CAST(p AS VARCHAR), '_', CAST(i AS VARCHAR))), 1, 1))
               AS INT) % 4
            WHEN 0 THEN -3.0 WHEN 1 THEN -1.0 WHEN 2 THEN 1.0
            ELSE 3.0 END) AS pv
        FROM range(0, 4) t(p)
      ), b AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN list_dot_product(v, pv) >= 0
                             THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        FROM n CROSS JOIN planes GROUP BY vec_id
      ), t AS (
        SELECT n.vec_id, n.v, n.nrm, b.bucket,
               substring(md5(CAST(n.vec_id AS VARCHAR)), 1, 2) < '80'
                 AS is_hist
        FROM n JOIN b USING (vec_id)
      ), m AS (
        SELECT bt.vec_id, h.vec_id AS hist_id,
               list_dot_product(bt.v, h.v) / (bt.nrm * h.nrm) AS cosine
        FROM t bt JOIN t h
          ON bt.bucket = h.bucket AND h.is_hist AND NOT bt.is_hist
        WHERE list_dot_product(bt.v, h.v) / (bt.nrm * h.nrm) >= 0.30
      )
      SELECT vec_id, hist_id AS dup_of_hist,
             ROUND(cosine, 6) AS best_cosine, n_collisions
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY vec_id
                 ORDER BY cosine DESC, hist_id ASC) AS rk,
               COUNT(*) OVER (PARTITION BY vec_id) AS n_collisions
        FROM m
      )
      WHERE rk = 1
    """,
    // q171: codebook from md5 nibbles; encode = argmin over the 16
    // codewords of ||w||^2 - 2*(x_s.w) (identical double trees — the
    // dots are in-order folds over the same slices); ADC adds the 8
    // subspace terms left-assoc, exactly Spark's reduce order.
    "q171_pq_ann" -> """
      WITH n AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), cw AS (
        SELECT s, k, list_transform(range(0, 8), i ->
          CASE CAST(concat('0x', substring(md5(concat('pq_',
                 CAST(s AS VARCHAR), '_', CAST(k AS VARCHAR), '_',
                 CAST(i AS VARCHAR))), 1, 1)) AS INT) % 4
            WHEN 0 THEN -0.3 WHEN 1 THEN -0.1 WHEN 2 THEN 0.1
            ELSE 0.3 END) AS w
        FROM range(0, 8) t(s) CROSS JOIN range(0, 16) u(k)
      ), cb AS (
        SELECT list(w ORDER BY s, k) AS cbl,
               list(list_dot_product(w, w) ORDER BY s, k) AS wwl
        FROM cw
      ), enc1 AS (
        SELECT vec_id, s, k AS code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY
                 list_dot_product(w, w)
                   - 2.0 * list_dot_product(v[s*8+1 : s*8+8], w) ASC,
                 k ASC) AS rk
        FROM n CROSS JOIN cw
      ), codes AS (
        SELECT vec_id, list(code ORDER BY s) AS c
        FROM enc1 WHERE rk = 1 GROUP BY vec_id
      ), encf AS (
        SELECT vec_id, c,
               wwl[c[1] + 1] + wwl[c[2] + 17] + wwl[c[3] + 33]
                 + wwl[c[4] + 49] + wwl[c[5] + 65] + wwl[c[6] + 81]
                 + wwl[c[7] + 97] + wwl[c[8] + 113] AS rnorm2
        FROM codes CROSS JOIN cb
      ), pairs AS (
        SELECT q.vec_id AS query_id, e.vec_id,
               ( list_dot_product(q.v[1:8],   cbl[e.c[1] + 1])
               + list_dot_product(q.v[9:16],  cbl[e.c[2] + 17])
               + list_dot_product(q.v[17:24], cbl[e.c[3] + 33])
               + list_dot_product(q.v[25:32], cbl[e.c[4] + 49])
               + list_dot_product(q.v[33:40], cbl[e.c[5] + 65])
               + list_dot_product(q.v[41:48], cbl[e.c[6] + 81])
               + list_dot_product(q.v[49:56], cbl[e.c[7] + 97])
               + list_dot_product(q.v[57:64], cbl[e.c[8] + 113])
               ) / (q.nrm * sqrt(e.rnorm2)) AS adc_cosine
        FROM encf e CROSS JOIN cb
        JOIN n q ON q.vec_id < 10 AND e.vec_id <> q.vec_id
      ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY adc_cosine DESC, vec_id ASC) AS rank
        FROM pairs
      )
      SELECT query_id, rank, r.vec_id AS neighbor_id,
             ROUND(adc_cosine, 6) AS adc_cosine,
             ROUND(list_dot_product(cv.v, qv.v) / (cv.nrm * qv.nrm), 6)
               AS cosine_exact
      FROM ranked r
      JOIN n cv ON cv.vec_id = r.vec_id
      JOIN n qv ON qv.vec_id = r.query_id
      WHERE rank <= 5
    """,
    "q31_cosine_neardup" -> """
      WITH n AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      )
      SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.30
    """,
    "q32_bpe_tokens" -> """
      WITH p AS (
        SELECT doc_id,
               regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')
                 AS pieces,
               length(regexp_split_to_array(trim(text), '\s+')) AS n_ws
        FROM documents
      )
      SELECT doc_id,
             CAST(length(pieces) AS INTEGER) AS n_pieces,
             CAST(list_sum(list_transform(pieces,
               x -> greatest(1, CAST(ceil(length(trim(x)) / 6.0) AS BIGINT))))
               AS BIGINT) AS n_bpe_tokens,
             CAST(n_ws AS BIGINT) AS n_ws_tokens
      FROM p
    """,
    "q33_media_preprocess" -> """
      WITH m AS (
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS n
        FROM documents
      ), d AS (
        SELECT media_id,
               CASE WHEN n % 3 = 0 THEN 'png'
                    WHEN n % 3 = 1 THEN 'jpeg'
                    ELSE 'webm' END AS format,
               CAST(n % 1920 + 1 AS INTEGER) AS width,
               CAST(n % 1080 + 1 AS INTEGER) AS height,
               CAST(n % 30 + 1 AS INTEGER) AS n_frames
        FROM m
      )
      SELECT media_id, format, width, height,
             CAST(floor(width * least(greatest(width, height), 512)
               / CAST(greatest(width, height) AS DOUBLE)) AS INTEGER)
               AS resize_w,
             CAST(floor(height * least(greatest(width, height), 512)
               / CAST(greatest(width, height) AS DOUBLE)) AS INTEGER)
               AS resize_h,
             n_frames,
             CAST((n_frames - 1) // 5 + 1 AS INTEGER) AS n_sampled_frames
      FROM d
    """,
    "q34_ann_ivf" -> """
      WITH n AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), cents AS (
        SELECT CAST(vec_id AS INTEGER) AS cent_id, v AS cv, nrm AS cnorm
        FROM n WHERE vec_id < 16
      ), cells AS (
        SELECT vec_id, v, nrm, cent_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY list_dot_product(v, cv) / (nrm * cnorm) DESC,
                          cent_id ASC) AS rk
        FROM n CROSS JOIN cents
      ), corpus AS (
        SELECT vec_id, v, nrm, cent_id FROM cells WHERE rk = 1
      ), probes AS (
        SELECT vec_id AS query_id, v AS qv, nrm AS q_norm, cent_id
        FROM cells WHERE vec_id < 10 AND rk <= 4
      ), scored AS (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               list_dot_product(c.v, p.qv) / (c.nrm * p.q_norm) AS cosine
        FROM corpus c JOIN probes p
          ON c.cent_id = p.cent_id AND c.vec_id <> p.query_id
      )
      SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored
      )
      WHERE rank <= 5
    """,
    "q36_rollup" -> """
      WITH d AS (
        SELECT l_returnflag, strftime(l_shipdate, '%Y') AS ship_year,
               l_extendedprice, l_quantity
        FROM lineitem
      )
      SELECT l_returnflag, ship_year,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS total_purchase_amount,
             COUNT(l_quantity) AS count_of_purchase,
             CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
             CAST(GROUPING(ship_year) AS INTEGER) AS g_year
      FROM d
      GROUP BY ROLLUP (l_returnflag, ship_year)
    """,
    "q35_trigram_langid" -> """
      WITH d AS (
        SELECT doc_id, lang,
               '_' || regexp_replace(lower(trim(text)), '\s+', '_', 'g')
                   || '_' AS t
        FROM documents
      ), g AS (
        SELECT doc_id, lang,
               list_distinct(CASE WHEN length(t) < 3 THEN []
                 ELSE [substring(t, i, 3)
                       for i in generate_series(1, length(t) - 2)]
                 END) AS tg
        FROM d
      ), s AS (
        SELECT doc_id, lang,
          length(list_intersect(tg, ['the','he_','_th','ing','and','_of'])) AS s_en,
          length(list_intersect(tg, ['_de','que','_la','os_','ent','cio'])) AS s_es,
          length(list_intersect(tg, ['der','ein','ich','sch','und','_di'])) AS s_de,
          length(list_intersect(tg, ['les','_le','ent','une','our','ait'])) AS s_fr
        FROM g
      ), p AS (
        SELECT doc_id, lang,
          CASE
            WHEN s_en = greatest(s_en, s_es, s_de, s_fr) AND s_en > 0 THEN 'en'
            WHEN s_es = greatest(s_en, s_es, s_de, s_fr) AND s_es > 0 THEN 'es'
            WHEN s_de = greatest(s_en, s_es, s_de, s_fr) AND s_de > 0 THEN 'de'
            WHEN s_fr = greatest(s_en, s_es, s_de, s_fr) AND s_fr > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred
        FROM s
      )
      SELECT lang, lang_pred, count(*) AS n_docs
      FROM p GROUP BY lang, lang_pred
    """,
    "q25_binary_meta" -> """
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text) AS sha256_hex,
             CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END AS has_content,
             CAST(octet_length(encode(text)) % 1920 + 1 AS BIGINT)
               AS fake_width,
             CAST(octet_length(encode(text)) % 1080 + 1 AS BIGINT)
               AS fake_height
      FROM documents
    """,
    "q169_incremental_neardup" -> """
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
                 AS is_hist
        FROM documents
      ), sh AS (
        SELECT doc_id, is_hist,
               CASE WHEN len(toks) < 2
                    THEN [array_to_string(toks, ' ')]
                    ELSE list_distinct(list_transform(
                      range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1]))
               END AS s
        FROM t
      ), lanes AS (
        SELECT doc_id, is_hist,
               [list_min(list_transform(s,
                  x -> md5(i::VARCHAR || '|' || x)))
                for i in generate_series(0, 15)] AS lanes
        FROM sh
      ), bands AS (
        SELECT doc_id, is_hist, b AS band,
               md5(array_to_string(lanes[b * 4 + 1 : b * 4 + 4], ''))
                 AS band_key
        FROM lanes, generate_series(0, 3) AS g(b)
      ), hist_index AS (
        SELECT doc_id AS hist_doc, band, band_key FROM (
          SELECT *, COUNT(*) OVER (PARTITION BY band, band_key)
                   AS bucket_size
          FROM bands WHERE is_hist
        ) WHERE bucket_size <= 50
      ), cand AS (
        SELECT DISTINCT p.doc_id, h.hist_doc
        FROM bands p JOIN hist_index h
          ON p.band = h.band AND p.band_key = h.band_key
        WHERE NOT p.is_hist
      ), j AS (
        SELECT c.doc_id, c.hist_doc,
               len(list_intersect(sb.s, sh2.s)) /
                 CAST(len(list_distinct(sb.s || sh2.s)) AS DOUBLE)
                 AS jaccard
        FROM cand c
        JOIN sh sb ON sb.doc_id = c.doc_id
        JOIN sh sh2 ON sh2.doc_id = c.hist_doc
      )
      SELECT doc_id,
             MIN(CASE WHEN jaccard = mx THEN hist_doc END) AS best_match,
             ROUND(mx, 4) AS best_jaccard,
             COUNT(*) AS n_hist_matches
      FROM (SELECT *, MAX(jaccard) OVER (PARTITION BY doc_id) AS mx
            FROM j WHERE jaccard >= 0.8)
      GROUP BY doc_id, mx
    """,
    "q168_incremental_dedup" -> """
      WITH d AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                 AS fp,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
                 AS is_hist
        FROM documents
      ), hist AS (
        SELECT fp, MIN(doc_id) AS hist_canonical FROM d
        WHERE is_hist GROUP BY fp
      ), batch AS (
        SELECT doc_id, fp FROM d WHERE NOT is_hist
      ), first_in_batch AS (
        SELECT fp, MIN(doc_id) AS batch_first FROM batch GROUP BY fp
      )
      SELECT b.doc_id, b.fp AS fingerprint,
             CASE WHEN h.hist_canonical IS NOT NULL THEN 'dup_of_history'
                  WHEN f.batch_first < b.doc_id THEN 'dup_in_batch'
                  ELSE 'novel' END AS status,
             CASE WHEN h.hist_canonical IS NOT NULL THEN h.hist_canonical
                  WHEN f.batch_first < b.doc_id THEN f.batch_first
                  END AS canonical_id
      FROM batch b
      LEFT JOIN hist h USING (fp)
      JOIN first_in_batch f USING (fp)
    """,
    "q26_simhash" -> (simhashSigCte + """
      SELECT a.doc_id, a.simhash,
             bit_count(xor(a.simhash, b.simhash)) AS hamming_next
      FROM sig a JOIN sig b ON a.doc_id + 1 = b.doc_id
    """)
  ).map { case (k, v) => k -> v.trim }

  /** The engine's 64-bit FNV-1a SimHash, reproduced exactly in DuckDB
    * SQL — the fold that was long declared "not SQL-expressible" is a
    * `list_reduce` over per-token code points (the corpus is ASCII, so
    * code points ARE the UTF-8 bytes the JVM hashes) with mod-2^64
    * arithmetic emulated in HUGEINT and the XOR-with-a-byte step
    * rewritten as low-byte arithmetic (h - h%256 + xor(h%256, b):
    * DuckDB's xor takes BIGINT, and only the low 8 bits can differ).
    * Signature bits then accumulate ±1 per token per position and the
    * HUGEINT result maps back to the JVM's signed long. Makes q26 and
    * q140 fully hash-checked. */
  private def simhashSigCte: String = """
      WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        FROM documents
      ), h AS (
        SELECT doc_id,
          list_reduce(
            list_prepend(14695981039346656037::HUGEINT,
              list_transform(range(1, length(t) + 1),
                i -> unicode(substring(t, i, 1))::HUGEINT)),
            (acc, b) -> ((acc - acc % 256 +
                xor((acc % 256)::BIGINT, b::BIGINT)::HUGEINT)
              * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
          ) AS th
        FROM tok
      ), bits AS (
        SELECT doc_id, j,
          SUM(CASE WHEN (th // CAST(power(2, j) AS HUGEINT)) % 2 = 1
                   THEN 1 ELSE -1 END) AS c
        FROM h CROSS JOIN range(0, 64) r(j)
        GROUP BY doc_id, j
      ), sig AS (
        SELECT doc_id,
          CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
                    THEN s - 18446744073709551616::HUGEINT ELSE s END
            AS BIGINT) AS simhash
        FROM (
          SELECT doc_id,
            SUM(CASE WHEN c > 0 THEN CAST(power(2, j) AS HUGEINT)
                     ELSE 0::HUGEINT END) AS s
          FROM bits GROUP BY doc_id
        )
      )
  """

  /** Oracles for the Athena-KPI-shaped queries (SURVEY §2.13). */
  val kpi: Map[String, String] = Map(
    "q27_weekday_hour" -> """
      SELECT isodow(ts) AS iso_dow,
             dayname(ts) AS day_of_week,
             hour(ts) AS hour_of_day,
             COUNT(event_id) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_value
      FROM events GROUP BY 1, 2, 3
    """,
    "q28_customer_monthly" -> """
      WITH agg AS (
        SELECT o_custkey,
               strftime(o_orderdate, '%Y-%m') AS order_month,
               COUNT(o_orderkey) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS revenue
        FROM orders GROUP BY 1, 2
      )
      SELECT o_custkey, order_month, n_orders, revenue,
             ROUND(revenue / n_orders, 4) AS avg_basket
      FROM agg
    """,
    "q30_deterministic_sample" -> """
      SELECT md5(text) AS sample_hash, doc_id
      FROM documents
      ORDER BY 1, 2
      LIMIT 32
    """,
    "q29_category_share" -> """
      WITH per_type AS (
        SELECT p_type,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
      )
      SELECT p_type, revenue,
             ROUND(revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,4)))
                                  OVER () AS DOUBLE), 6) AS revenue_share
      FROM per_type
    """
  ).map { case (k, v) => k -> v.trim }

  /** Round-2 analytic surface: as-of join, range join, dedup clustering,
    * window analytics, sessionization, set ops, CUBE, pivot, arg-max,
    * quantiles, TF-IDF. (q47 approx-distinct has no oracle — HLL
    * registers are implementation-specific.) */
  val round2: Map[String, String] = Map(
    "q37_asof_join" -> """
      WITH c AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
      ), p AS (
        SELECT user_id, ts AS pts, event_id AS purchase_event_id,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'
      )
      SELECT c.event_id, c.user_id,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
             p.purchase_event_id, p.purchase_value,
             date_diff('second', p.pts, c.ts) AS secs_since_purchase
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND c.ts >= p.pts
    """,
    "q38_range_join" -> """
      WITH bands(band, lo, hi) AS (VALUES
        ('p00_micro', 0.0, 25000.0),
        ('p01_small', 25000.0, 75000.0),
        ('p02_medium', 75000.0, 150000.0),
        ('p03_large', 150000.0, 300000.0),
        ('p04_jumbo', 300000.0, 500000.0))
      SELECT band, lo,
             COUNT(o_orderkey) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                   AS DOUBLE), 2) AS total_amount
      FROM orders JOIN bands
        ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY 1, 2
    """,
    "q39_dedup_clusters" -> """
      WITH RECURSIVE n AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.30
      ), e AS (
        SELECT va AS a, vb AS b FROM pairs
        UNION SELECT vb, va FROM pairs
      ), reach(src, dst) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
      ), lab AS (
        SELECT v.id, LEAST(v.id, MIN(r.dst)) AS cluster_id
        FROM (SELECT DISTINCT a AS id FROM e) v
        LEFT JOIN reach r ON r.src = v.id
        GROUP BY v.id
      )
      SELECT id AS vec_id, cluster_id,
             CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size
      FROM lab
    """,
    "q40_moving_window" -> """
      WITH daily AS (
        SELECT n_regionkey,
               strftime(o_orderdate, '%Y-%m-%d') AS day,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS day_revenue,
               COUNT(o_orderkey) AS n_orders
        FROM orders
        LEFT JOIN customer ON o_custkey = c_custkey
        LEFT JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
      )
      SELECT n_regionkey, day, day_revenue, n_orders,
             ROUND(day_revenue - LAG(day_revenue) OVER w, 2) AS delta,
             ROUND(CAST(SUM(CAST(day_revenue AS DECIMAL(18,4))) OVER w7
                   AS DOUBLE) / COUNT(day_revenue) OVER w7, 4)
               AS mov_avg_7d
      FROM daily
      WINDOW w AS (PARTITION BY n_regionkey ORDER BY day),
             w7 AS (PARTITION BY n_regionkey ORDER BY day
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    "q41_sessionize" -> """
      WITH g AS (
        SELECT user_id, ts, event_id, value,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
        FROM events
      ), s AS (
        SELECT user_id, ts, value,
               CAST(SUM(CASE WHEN prev_ts IS NULL
                              OR date_diff('second', prev_ts, ts) > 1800
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_seq
        FROM g
      )
      SELECT user_id, session_seq,
             COUNT(*) AS n_events,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             date_diff('second', MIN(ts), MAX(ts)) AS duration_sec,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS session_value
      FROM s GROUP BY 1, 2
    """,
    "q42_setops" -> """
      WITH b95 AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE year(o_orderdate) = 1995),
           b96 AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE year(o_orderdate) = 1996)
      SELECT 'both' AS tag, o_custkey
      FROM (SELECT * FROM b95 INTERSECT SELECT * FROM b96)
      UNION ALL
      SELECT 'only_1995' AS tag, o_custkey
      FROM (SELECT * FROM b95 EXCEPT SELECT * FROM b96)
      UNION ALL
      SELECT 'only_1996' AS tag, o_custkey
      FROM (SELECT * FROM b96 EXCEPT SELECT * FROM b95)
    """,
    "q43_cube" -> """
      SELECT l_returnflag, l_linestatus,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                   AS DOUBLE), 2) AS total_amount,
             COUNT(l_quantity) AS count_of_purchase,
             CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
             CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q44_pivot" -> """
      SELECT o_orderstatus,
             COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
               AS "1-URGENT",
             COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END)
               AS "2-HIGH",
             COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END)
               AS "3-MEDIUM",
             COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END)
               AS "4-NOT SPECIFIED",
             COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END)
               AS "5-LOW"
      FROM orders GROUP BY 1
    """,
    "q45_argmax" -> """
      WITH per_part AS (
        SELECT p_brand, p_partkey,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
      ), ranked AS (
        SELECT *,
          ROW_NUMBER() OVER (PARTITION BY p_brand
            ORDER BY revenue DESC, p_partkey DESC) AS rmax,
          ROW_NUMBER() OVER (PARTITION BY p_brand
            ORDER BY revenue ASC, p_partkey ASC) AS rmin
        FROM per_part
      )
      SELECT p_brand,
             MAX(CASE WHEN rmax = 1 THEN p_partkey END) AS top_partkey,
             MAX(CASE WHEN rmax = 1 THEN revenue END) AS top_revenue,
             MAX(CASE WHEN rmin = 1 THEN p_partkey END) AS bottom_partkey,
             MAX(CASE WHEN rmin = 1 THEN revenue END) AS bottom_revenue
      FROM ranked GROUP BY 1
    """,
    "q46_quantiles" -> """
      SELECT o_orderstatus,
             COUNT(o_orderkey) AS n_orders,
             ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
             ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
             ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90
      FROM orders GROUP BY 1
    """,
    "q54_minhash_md5" -> """
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      ), sh AS (
        SELECT doc_id,
               CASE WHEN len(toks) < 2
                    THEN [array_to_string(toks, ' ')]
                    ELSE list_distinct(list_transform(
                      range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1]))
               END AS s
        FROM t
      ), lanes AS (
        SELECT doc_id,
               [list_min(list_transform(s,
                  x -> md5(i::VARCHAR || '|' || x)))
                for i in generate_series(0, 15)] AS lanes
        FROM sh
      )
      SELECT doc_id, md5(array_to_string(lanes, '')) AS sig_digest
      FROM lanes
    """,
    "q55_lsh_pairs_md5" -> """
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      ), sh AS (
        SELECT doc_id,
               CASE WHEN len(toks) < 2
                    THEN [array_to_string(toks, ' ')]
                    ELSE list_distinct(list_transform(
                      range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1]))
               END AS s
        FROM t
      ), lanes AS (
        SELECT doc_id,
               [list_min(list_transform(s,
                  x -> md5(i::VARCHAR || '|' || x)))
                for i in generate_series(0, 15)] AS lanes
        FROM sh
      ), bands AS (
        SELECT doc_id, b AS band,
               md5(array_to_string(lanes[b * 4 + 1 : b * 4 + 4], ''))
                 AS band_key
        FROM lanes, generate_series(0, 3) AS g(b)
      ), sized AS (
        SELECT *, COUNT(*) OVER (PARTITION BY band, band_key)
                 AS bucket_size
        FROM bands
      ), small AS (
        SELECT doc_id, band, band_key FROM sized WHERE bucket_size <= 50
      ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM small a JOIN small b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
      ), j AS (
        SELECT CAST(floor(
                 len(list_intersect(sa.s, sb.s)) /
                 CAST(len(list_distinct(sa.s || sb.s)) AS DOUBLE) * 10)
               AS BIGINT) AS jaccard_decile
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.doc_a
        JOIN sh sb ON sb.doc_id = cand.doc_b
      )
      SELECT jaccard_decile, COUNT(*) AS n_pairs FROM j GROUP BY 1
    """,
    "q52_media_knn" -> """
      WITH m AS (
        SELECT doc_id AS media_id, octet_length(encode(text)) AS n
        FROM documents
      ), f AS (
        SELECT media_id,
               [((media_id * 31 + i * 7 + n) % 1000) / 1000.0 - 0.5
                for i in generate_series(0, 15)] AS v
        FROM m
      ), nf AS (
        SELECT media_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM f
      ), scored AS (
        SELECT q.media_id AS query_id, c.media_id AS neighbor_id,
               list_dot_product(c.v, q.v) / (c.nrm * q.nrm) AS cosine
        FROM nf c JOIN nf q
          ON q.media_id < 10 AND c.media_id <> q.media_id
      )
      SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored)
      WHERE rank <= 5
    """,
    "q51_salted_agg" -> """
      SELECT event_type,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_amount,
             COUNT(value) AS count_of_rows
      FROM events GROUP BY 1
    """,
    "q49_stratified_sample" -> """
      SELECT c_custkey, c_mktsegment, c_nationkey
      FROM customer
      WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 2) < '33'
    """,
    "q50_group_arrays" -> """
      WITH per_part AS (
        SELECT p_brand, p_partkey,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
      ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
                    ORDER BY revenue DESC, p_partkey ASC) AS rk
        FROM per_part
      )
      SELECT p_brand,
             string_agg(CAST(p_partkey AS VARCHAR), ',' ORDER BY rk)
               AS top_parts,
             ROUND(CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS top3_revenue
      FROM ranked WHERE rk <= 3 GROUP BY 1
    """,
    "q48_tfidf" -> """
      WITH toks AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents
      ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
      ), dfreq AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
      ), total AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf * (CAST(n_docs + 1 AS DOUBLE) /
                           CAST(df + 1 AS DOUBLE)), 4) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN total
        WHERE tf.doc_id < 50
      )
      SELECT doc_id, rank, term, tfidf FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, term ASC) AS rank
        FROM scored)
      WHERE rank <= 3
    """
  ).map { case (k, v) => k -> v.trim }

  /** Round-3 corpus-preparation surface (graft.operators.CorpusOps).
    * Word-3-gram construction mirrors TextFunctions.shingles exactly:
    * whitespace split of trimmed text, whole-text fallback under 3
    * tokens, i..i+2 windows otherwise. */
  val corpus: Map[String, String] = Map(
    "q56_boilerplate_spans" -> """
      WITH d AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      ), g AS (
        SELECT doc_id,
               unnest(CASE WHEN len(toks) < 3
                 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                        i -> array_to_string(toks[i:i+2], ' ')) END) AS span
        FROM d
      )
      SELECT span,
             COUNT(DISTINCT doc_id) AS n_docs,
             COUNT(*) AS n_occurrences
      FROM g GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    """,
    "q57_pii_mask" -> """
      SELECT c_custkey,
             regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked_name,
             length(c_name) -
               length(regexp_replace(c_name, '[0-9]', '', 'g'))
               AS n_digits_redacted
      FROM customer
    """,
    "q58_contamination" -> """
      WITH d AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      ), g AS (
        SELECT doc_id,
               unnest(list_distinct(CASE WHEN len(toks) < 3
                 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                        i -> array_to_string(toks[i:i+2], ' ')) END)) AS gram
        FROM d
      ), ev AS (
        SELECT DISTINCT gram FROM g WHERE doc_id % 100 = 0
      ), tr AS (
        SELECT doc_id, gram FROM g WHERE doc_id % 100 <> 0
      )
      SELECT tr.doc_id,
             COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN ev.gram IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_contaminated,
             ROUND(CAST(SUM(CASE WHEN ev.gram IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 4)
               AS contamination_share
      FROM tr LEFT JOIN ev ON tr.gram = ev.gram
      GROUP BY 1
    """,
    "q59_seq_packing" -> """
      WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_toks
        FROM documents
      ), c AS (
        SELECT doc_id, n_toks,
               COALESCE(CAST(SUM(n_toks) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT), 0) AS cum_before
        FROM t
      )
      SELECT CAST(FLOOR(cum_before / 512) AS BIGINT) AS pack_id,
             COUNT(*) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             MIN(doc_id) AS first_doc,
             MAX(doc_id) AS last_doc
      FROM c GROUP BY 1
    """,
    "q60_vocab_topk" -> """
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
      ), n AS (
        SELECT token, COUNT(*) AS n FROM toks GROUP BY 1
      )
      SELECT * FROM (
        SELECT token, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS rank
        FROM n)
      WHERE rank <= 50
    """,
    "q61_weighted_sample" -> """
      WITH p AS (
        SELECT doc_id, n_chars,
               CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) / CAST(n_chars AS DOUBLE) AS priority
        FROM documents
      )
      SELECT doc_id, n_chars, ROUND(priority, 4) AS priority
      FROM p ORDER BY priority ASC, doc_id ASC LIMIT 64
    """,
    "q62_repetition_stats" -> """
      WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
      ), pc AS (
        SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY 1, 2
      )
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_unique,
             ROUND(1 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 4) AS dup_ratio,
             ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 4) AS top_token_share
      FROM pc GROUP BY 1
    """,
    "q63_curriculum_buckets" -> """
      WITH t AS (
        SELECT doc_id, n_chars,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS n_toks
        FROM documents
      ), b AS (
        SELECT doc_id, n_chars, n_toks,
               CAST(NTILE(10) OVER (ORDER BY n_chars ASC, doc_id ASC)
                    AS BIGINT) AS bucket
        FROM t
      )
      SELECT bucket, COUNT(*) AS n_docs,
             MIN(n_chars) AS min_chars,
             MAX(n_chars) AS max_chars,
             ROUND(AVG(n_toks), 2) AS avg_tokens
      FROM b GROUP BY 1
    """,
    "q64_scd2_history" -> """
      WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type
        FROM events
      ), ch AS (
        SELECT user_id, event_type, ts, event_id FROM o
        WHERE prev_type IS NULL OR prev_type <> event_type
      )
      SELECT user_id, event_type,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
             strftime(LEAD(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S') AS valid_to
      FROM ch
    """,
    "q66_ann_rademacher" -> """
      WITH n AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), planes AS (
        SELECT p, list_transform(range(0, 64), i ->
          CASE WHEN CAST(concat('0x', substring(md5(
                 concat(CAST(p AS VARCHAR), '_', CAST(i AS VARCHAR))), 1, 1))
               AS INT) % 2 = 0 THEN 1.0 ELSE -1.0 END) AS pv
        FROM range(0, 6) t(p)
      ), b AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN list_dot_product(v, pv) > 0
                             THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        FROM n CROSS JOIN planes GROUP BY vec_id
      ), nb AS (
        SELECT n.vec_id, n.v, n.nrm, b.bucket FROM n JOIN b USING (vec_id)
      ), probes AS (
        SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS probe
      ), q AS (
        SELECT vec_id AS query_id, v AS qv, nrm AS qn,
               xor(bucket, probe) AS qb
        FROM nb CROSS JOIN probes WHERE vec_id < 10
      ), s AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_dot_product(c.v, q.qv) / (c.nrm * q.qn) AS cosine
        FROM nb c JOIN q ON c.bucket = q.qb AND c.vec_id <> q.query_id
      )
      SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM s
      )
      WHERE rank <= 5
    """,
    "q67_quantized_knn" -> """
      WITH n AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), m AS (
        SELECT vec_id, v, nrm,
               list_max(list_transform(v, x -> abs(x))) AS mx
        FROM n
      ), qz AS (
        SELECT vec_id, v, nrm,
               list_transform(v, x -> FLOOR(x * 127.0 / mx + 0.5)) AS qv
        FROM m
      ), nn AS (
        SELECT vec_id, v, nrm, qv,
               sqrt(list_dot_product(qv, qv)) AS qn
        FROM qz
      ), s AS (
        SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(c.qv, a.qv) / (c.qn * a.qn) AS qcosine,
               list_dot_product(c.v, a.v) / (c.nrm * a.nrm) AS cosine_exact
        FROM nn c JOIN nn a ON a.vec_id < 10 AND c.vec_id <> a.vec_id
      )
      SELECT query_id, rank, neighbor_id,
             ROUND(qcosine, 6) AS qcosine,
             ROUND(cosine_exact, 6) AS cosine_exact
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY qcosine DESC, neighbor_id ASC) AS rank
        FROM s
      )
      WHERE rank <= 5
    """,
    "q65_source_rollup" -> """
      WITH fp AS (
        SELECT doc_id, source, lang, n_chars,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        FROM documents
      ), c AS (
        SELECT f, COUNT(*) AS copies FROM fp GROUP BY 1
      )
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
             COUNT(DISTINCT lang) AS n_langs,
             ROUND(AVG(n_chars), 2) AS avg_chars
      FROM fp JOIN c USING (f)
      GROUP BY 1
    """
  ).map { case (k, v) => k -> v.trim }

  /** Round-3 profiling / OLAP-extras / collocation surface. */
  val round3b: Map[String, String] = Map(
    "q68_column_profile" -> """
      SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
             COUNT(*) - COUNT(o_orderkey) AS n_nulls,
             COUNT(DISTINCT o_orderkey) AS n_distinct,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
             CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
      FROM orders
      UNION ALL
      SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
             COUNT(DISTINCT o_custkey),
             CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
             COUNT(DISTINCT o_orderstatus),
             CAST(MIN(o_orderstatus) AS VARCHAR),
             CAST(MAX(o_orderstatus) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
             COUNT(DISTINCT o_totalprice),
             CAST(MIN(o_totalprice) AS VARCHAR),
             CAST(MAX(o_totalprice) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
             COUNT(DISTINCT o_orderdate),
             CAST(MIN(o_orderdate) AS VARCHAR),
             CAST(MAX(o_orderdate) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
             COUNT(DISTINCT o_orderpriority),
             CAST(MIN(o_orderpriority) AS VARCHAR),
             CAST(MAX(o_orderpriority) AS VARCHAR)
      FROM orders
    """,
    "q69_edit_distance" -> """
      WITH p AS (SELECT p_partkey, p_name, p_brand, p_size FROM part)
      SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
             a.p_name AS a_name, b.p_name AS b_name,
             levenshtein(a.p_name, b.p_name) AS edit_dist
      FROM p a JOIN p b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
    "q70_embedding_centroids" -> """
      SELECT label, i - 1 AS dim, COUNT(*) AS n_vecs,
             ROUND(CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE)
                                 AS DECIMAL(18,12))) AS DOUBLE)
                   / COUNT(*), 6) AS centroid
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
      GROUP BY 1, 2
    """,
    "q71_unpivot" -> """
      WITH wide AS (
        SELECT l_returnflag,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS sum_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS sum_price,
               CAST(COUNT(*) AS DOUBLE) AS n_rows
        FROM lineitem GROUP BY 1)
      SELECT * FROM wide
      UNPIVOT (value FOR measure IN (sum_qty, sum_price, n_rows))
    """,
    "q72_collocations" -> """
      WITH d AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      ), uni AS (
        SELECT unnest(toks) AS w FROM d
      ), c1 AS (
        SELECT w, COUNT(*) AS c FROM uni GROUP BY 1
      ), n AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_tokens FROM uni
      ), bi AS (
        SELECT unnest(list_transform(range(1, len(toks)),
                 i -> array_to_string(toks[i:i+1], ' '))) AS bigram
        FROM d WHERE len(toks) >= 2
      ), c12 AS (
        SELECT bigram, COUNT(*) AS c12 FROM bi
        GROUP BY 1 HAVING COUNT(*) >= 5
      ), scored AS (
        SELECT bigram, c12, a.c AS c1, b.c AS c2,
               ROUND(CAST(c12 AS DOUBLE) * n_tokens
                     / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)), 6)
                 AS lift
        FROM c12, n
        JOIN c1 a ON split_part(bigram, ' ', 1) = a.w
        JOIN c1 b ON split_part(bigram, ' ', 2) = b.w
      )
      SELECT bigram, c12, c1, c2, lift, rank FROM (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY lift DESC, bigram ASC) AS rank
        FROM scored)
      WHERE rank <= 50
    """,
    "q73_grouping_sets" -> """
      SELECT r_name, o_orderpriority,
             CAST(GROUPING(r_name) AS INT) AS g_region,
             CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                   AS DOUBLE), 2) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name),
                              (o_orderpriority), ())
    """,
    "q74_histogram" -> """
      WITH g AS (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS grand_total
        FROM orders
      ), b AS (
        SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
               COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS dec_rev
        FROM orders GROUP BY 1
      )
      SELECT bucket, bucket * 25000.0 AS lo, (bucket + 1) * 25000.0 AS hi,
             n_orders,
             ROUND(CAST(dec_rev AS DOUBLE), 2) AS revenue,
             ROUND(CAST(dec_rev AS DOUBLE) / grand_total, 6)
               AS revenue_share
      FROM b, g
    """,
    "q89_correlated_subquery" -> """
      SELECT o_orderpriority, COUNT(*) AS n_big
      FROM orders o
      WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
              (SELECT COUNT(*) FROM orders o2
               WHERE o2.o_custkey = o.o_custkey)
            > 2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,4)))
                   FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        AND EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)
      GROUP BY o_orderpriority
    """,
    "q87_ab_test" -> """
      WITH pu AS (
        SELECT user_id,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END) >= 14
                    THEN 1 ELSE 0 END AS converted,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                    THEN 'A' ELSE 'B' END AS variant
        FROM events GROUP BY user_id
      ), arms AS (
        SELECT variant, COUNT(*) AS n,
               CAST(SUM(converted) AS BIGINT) AS c
        FROM pu GROUP BY 1
      ), a AS (SELECT n AS n_a, c AS c_a FROM arms WHERE variant = 'A'),
         b AS (SELECT n AS n_b, c AS c_b FROM arms WHERE variant = 'B')
      SELECT n_a, c_a, n_b, c_b,
             ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
             ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
             ROUND((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
               / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b)), 6) AS z
      FROM a, b
    """,
    "q88_range_frame" -> """
      SELECT event_id, user_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             COUNT(*) OVER w AS n_last_hour,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w
                   AS DOUBLE), 2) AS value_last_hour
      FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY es
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    "q85_funnel" -> """
      WITH pud AS (
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS v_ts,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS c_ts,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
        FROM events GROUP BY 1, 2
      ), flags AS (
        SELECT day,
               CASE WHEN v_ts IS NOT NULL THEN 1 ELSE 0 END AS viewed,
               CASE WHEN v_ts IS NOT NULL AND c_ts > v_ts
                    THEN 1 ELSE 0 END AS clicked,
               CASE WHEN v_ts IS NOT NULL AND c_ts > v_ts AND p_ts > c_ts
                    THEN 1 ELSE 0 END AS purchased
        FROM pud
      )
      SELECT day,
             CAST(SUM(viewed) AS BIGINT) AS n_viewers,
             CAST(SUM(clicked) AS BIGINT) AS n_clickers,
             CAST(SUM(purchased) AS BIGINT) AS n_purchasers,
             ROUND(CAST(SUM(clicked) AS DOUBLE) / SUM(viewed), 4)
               AS click_rate,
             ROUND(CAST(SUM(purchased) AS DOUBLE) / SUM(viewed), 4)
               AS purchase_rate
      FROM flags GROUP BY 1 HAVING SUM(viewed) > 0
    """,
    "q86_retention_cohorts" -> """
      WITH fw AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_wk
        FROM events GROUP BY 1
      ), act AS (
        SELECT DISTINCT e.user_id, date_trunc('week', ts) AS wk, cohort_wk
        FROM events e JOIN fw ON e.user_id = fw.user_id
      ), counts AS (
        SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
               (epoch(wk)::BIGINT - epoch(cohort_wk)::BIGINT) // 604800
                 AS weeks_later,
               COUNT(DISTINCT user_id) AS n_active
        FROM act GROUP BY 1, 2
      ), sizes AS (
        SELECT cohort_week, n_active AS cohort_size
        FROM counts WHERE weeks_later = 0
      )
      SELECT cohort_week, weeks_later, n_active, cohort_size,
             ROUND(CAST(n_active AS DOUBLE) / cohort_size, 4) AS retention
      FROM counts JOIN sizes USING (cohort_week)
    """,
    // q172: the lexical leg re-derives q83's BM25 ranking; the PRF
    // centroid adds the 3 lowest-rank lexical vectors WITH embeddings
    // in rank order and divides once (identical IEEE tree to the Spark
    // literal — and the same with-embeddings seed rule, which matters
    // when embedding coverage is partial); RRF contributions are
    // single divides of exact integer ranks added lex-then-sem.
    "q172_hybrid_rrf" -> """
      WITH stats AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS dl
        FROM documents
      ), corpus AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM stats
      ), tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents
      ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok
        WHERE term IN ('join', 'vector', 'filter') GROUP BY 1, 2
      ), dfreq AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
      ), sc AS (
        SELECT tf.doc_id, tf.term,
               (CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE))
                 * (tf * (1.2 + 1.0))
                 / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl)))
                 AS tscore
        FROM tf
        JOIN dfreq USING (term)
        JOIN stats USING (doc_id), corpus
      ), byDoc AS (
        SELECT doc_id,
               SUM(CASE WHEN term = 'join' THEN tscore ELSE 0.0 END)
                 AS s_join,
               SUM(CASE WHEN term = 'vector' THEN tscore ELSE 0.0 END)
                 AS s_vector,
               SUM(CASE WHEN term = 'filter' THEN tscore ELSE 0.0 END)
                 AS s_filter
        FROM sc GROUP BY 1
      ), lex AS (
        SELECT doc_id, rank AS rank_lex FROM (
          SELECT doc_id,
                 ROW_NUMBER() OVER (
                   ORDER BY ROUND(s_join + s_vector + s_filter, 6) DESC,
                            doc_id ASC) AS rank
          FROM byDoc)
        WHERE rank <= 30
      ), n AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), seedv AS (
        SELECT n.v,
               ROW_NUMBER() OVER (ORDER BY rank_lex ASC) AS sr
        FROM lex JOIN n ON n.vec_id = lex.doc_id
      ), cent AS (
        SELECT list_transform(range(1, 65),
                 j -> (v1[j] + v2[j] + v3[j]) / 3.0) AS c
        FROM (SELECT
          (SELECT v FROM seedv WHERE sr = 1) AS v1,
          (SELECT v FROM seedv WHERE sr = 2) AS v2,
          (SELECT v FROM seedv WHERE sr = 3) AS v3)
      ), sem AS (
        SELECT doc_id, rank_sem FROM (
          SELECT vec_id AS doc_id,
                 ROW_NUMBER() OVER (
                   ORDER BY list_dot_product(v, c)
                              / (nrm * sqrt(list_dot_product(c, c))) DESC,
                            vec_id ASC) AS rank_sem
          FROM n CROSS JOIN cent)
        WHERE rank_sem <= 30
      ), fused AS (
        SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
               rank_lex, rank_sem,
               COALESCE(1.0 / (60 + rank_lex), 0.0)
                 + COALESCE(1.0 / (60 + rank_sem), 0.0) AS rrf
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
      )
      SELECT doc_id, rank, ROUND(rrf, 9) AS rrf_score,
             CAST(COALESCE(rank_lex, 0) AS BIGINT) AS rank_lex,
             CAST(COALESCE(rank_sem, 0) AS BIGINT) AS rank_sem
      FROM (
        SELECT *, ROW_NUMBER() OVER (
                 ORDER BY rrf DESC, doc_id ASC) AS rank
        FROM fused)
      WHERE rank <= 20
    """,
    "q84_inverted_index" -> """
      WITH td AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents
      )
      SELECT term, COUNT(*) AS df,
             array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
      FROM td GROUP BY 1 HAVING COUNT(*) >= 50
    """,
    "q82_chunking" -> """
      WITH d AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      ), starts AS (
        SELECT doc_id, toks,
               unnest(range(0, len(toks), 24)) AS start_tok
        FROM d
      )
      SELECT doc_id, CAST(start_tok // 24 AS INT) AS chunk_idx, start_tok,
             len(toks[start_tok + 1 : start_tok + 32]) AS n_in_chunk,
             md5(array_to_string(toks[start_tok + 1 : start_tok + 32], ' '))
               AS chunk_hash
      FROM starts
    """,
    "q83_bm25" -> """
      WITH stats AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS dl
        FROM documents
      ), corpus AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM stats
      ), tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents
      ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok
        WHERE term IN ('join', 'vector', 'filter') GROUP BY 1, 2
      ), dfreq AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
      ), sc AS (
        SELECT tf.doc_id, tf.term,
               (CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE))
                 * (tf * (1.2 + 1.0))
                 / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl)))
                 AS tscore
        FROM tf
        JOIN dfreq USING (term)
        JOIN stats USING (doc_id), corpus
      ), byDoc AS (
        SELECT doc_id,
               SUM(CASE WHEN term = 'join' THEN tscore ELSE 0.0 END)
                 AS s_join,
               SUM(CASE WHEN term = 'vector' THEN tscore ELSE 0.0 END)
                 AS s_vector,
               SUM(CASE WHEN term = 'filter' THEN tscore ELSE 0.0 END)
                 AS s_filter
        FROM sc GROUP BY 1
      )
      SELECT doc_id, rank, score FROM (
        SELECT doc_id,
               ROUND(s_join + s_vector + s_filter, 6) AS score,
               ROW_NUMBER() OVER (
                 ORDER BY ROUND(s_join + s_vector + s_filter, 6) DESC,
                          doc_id ASC) AS rank
        FROM byDoc)
      WHERE rank <= 20
    """,
    "q80_dataset_split" -> """
      WITH d AS (
        SELECT *, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b
        FROM documents
      )
      SELECT CASE WHEN b < 'cc' THEN 'train'
                  WHEN b < 'e6' THEN 'val'
                  ELSE 'test' END AS split,
             COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                  AS BIGINT) AS n_tokens,
             COUNT(DISTINCT source) AS n_sources,
             ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars
      FROM d GROUP BY 1
    """,
    "q81_full_outer" -> """
      WITH o AS (
        SELECT o_custkey AS user_id, COUNT(*) AS n_orders
        FROM orders GROUP BY 1
      ), e AS (
        SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1
      )
      SELECT COALESCE(o.user_id, e.user_id) AS user_id,
             COALESCE(n_orders, 0) AS n_orders,
             COALESCE(n_events, 0) AS n_events,
             CASE WHEN o.user_id IS NULL THEN 'events_only'
                  WHEN e.user_id IS NULL THEN 'orders_only'
                  ELSE 'both' END AS presence
      FROM o FULL OUTER JOIN e ON o.user_id = e.user_id
    """,
    "q79_salted_join" -> """
      WITH dim AS (
        SELECT o_custkey AS user_id, COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS lifetime_value
        FROM orders GROUP BY 1
      )
      SELECT event_type, COUNT(*) AS n_events,
             COUNT(n_orders) AS n_matched,
             ROUND(CAST(SUM(CAST(COALESCE(lifetime_value, 0.0)
                   AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_lifetime
      FROM events LEFT JOIN dim USING (user_id)
      GROUP BY 1
    """,
    "q78_date_spine" -> """
      WITH monthly AS (
        SELECT n_regionkey, strftime(o_orderdate, '%Y-%m') AS month,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS revenue
        FROM orders
        LEFT JOIN customer ON o_custkey = c_custkey
        LEFT JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
      ), bounds AS (
        SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
               date_trunc('month', MAX(o_orderdate)) AS hi
        FROM orders
      ), spine AS (
        SELECT strftime(m, '%Y-%m') AS month, r_regionkey
        FROM bounds, UNNEST(generate_series(lo, hi, INTERVAL 1 MONTH))
               AS t(m), region
      )
      SELECT spine.r_regionkey, spine.month AS month,
             COALESCE(n_orders, 0) AS n_orders,
             COALESCE(revenue, 0.0) AS revenue,
             COALESCE(last_value(revenue IGNORE NULLS) OVER
               (PARTITION BY spine.r_regionkey ORDER BY spine.month
                ROWS UNBOUNDED PRECEDING), 0.0) AS carry_revenue
      FROM spine
      LEFT JOIN monthly ON spine.month = monthly.month
                       AND spine.r_regionkey = monthly.n_regionkey
    """,
    "q76_bpe_merge_step" -> """
      WITH v AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        FROM documents
      ), vocab AS (
        SELECT word, COUNT(*) AS freq FROM v
        WHERE length(word) >= 2 GROUP BY 1
      ), pairs AS (
        SELECT substring(word, i, 2) AS pair,
               CAST(SUM(freq) AS BIGINT) AS pair_count
        FROM vocab, unnest(range(1, length(word))) AS t(i)
        GROUP BY 1
      )
      SELECT pair, pair_count, rank FROM (
        SELECT *, ROW_NUMBER() OVER
                 (ORDER BY pair_count DESC, pair ASC) AS rank
        FROM pairs)
      WHERE rank <= 20
    """,
    "q77_heavy_hitters" -> """
      WITH c AS (
        SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY 1
      ), t AS (
        SELECT CAST(SUM(n_rows) AS BIGINT) AS n_total FROM c
      ), r AS (
        SELECT user_id, n_rows,
               CAST(ROW_NUMBER() OVER
                 (ORDER BY n_rows DESC, user_id ASC) AS INT) AS rank
        FROM c
      )
      SELECT rank, user_id, n_rows,
             ROUND(CAST(n_rows AS DOUBLE) / n_total, 6) AS share,
             ROUND(CAST(SUM(n_rows) OVER
                     (ORDER BY n_rows DESC, user_id ASC
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / n_total, 6)
               AS cum_share
      FROM r, t WHERE rank <= 20
    """,
    "q75_segment_percentiles" -> """
      SELECT c_custkey, c_mktsegment, c_acctbal,
             ROUND(percent_rank() OVER w, 6) AS pct_rank,
             ROUND(cume_dist() OVER w, 6) AS cume,
             CAST(ntile(10) OVER w AS INT) AS decile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal, c_custkey)
    """
  ).map { case (k, v) => k -> v.trim }

  /** Statistical / behavioral analytics pack (operators.Stats). */
  val stats: Map[String, String] = Map(
    "q90_point_in_time" -> """
      WITH st AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events WHERE event_type <> 'purchase'
      ), changes AS (
        SELECT user_id, ts, event_type AS state
        FROM st WHERE prev IS NULL OR prev <> event_type
      ), probes AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
      )
      SELECT p.event_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             p.value, c.state,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS state_since,
             date_diff('second', c.ts, p.ts) AS secs_in_state
      FROM probes p ASOF LEFT JOIN changes c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "q91_markov_transitions" -> """
      WITH tr AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
      ), c AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2
      )
      SELECT from_type, to_type, n,
             ROUND(CAST(n AS DOUBLE) / SUM(n) OVER
                     (PARTITION BY from_type), 6) AS p
      FROM c
    """,
    "q92_zscore_anomaly" -> """
      WITH monthly AS (
        SELECT n_regionkey AS region,
               strftime(o_orderdate, '%Y-%m') AS month,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
      ), st AS (
        SELECT region, COUNT(*) AS n_months,
               SUM(CAST(revenue AS DECIMAL(18,4))) AS s1,
               -- DECIMAL(19,4): int128 storage so the product (exactly
               -- 8 fractional digits, precision 38) can't overflow the
               -- int64 path DECIMAL(18) would take.
               SUM(CAST(revenue AS DECIMAL(19,4))
                   * CAST(revenue AS DECIMAL(19,4))) AS s2
        FROM monthly GROUP BY 1
      ), mv AS (
        SELECT region,
               CAST(s1 AS DOUBLE) / n_months AS mean,
               CAST(s2 AS DOUBLE) / n_months
                 - (CAST(s1 AS DOUBLE) / n_months)
                   * (CAST(s1 AS DOUBLE) / n_months) AS variance
        FROM st
      ), z AS (
        SELECT m.region, m.month, m.revenue,
               ROUND(mean, 2) AS mean_revenue,
               CASE WHEN variance > 0
                    THEN ROUND((m.revenue - mean) / sqrt(variance), 4)
               END AS z
        FROM monthly m JOIN mv USING (region)
      )
      SELECT region, month, revenue, mean_revenue, z,
             (abs(z) > 2.0) AS is_anomaly
      FROM z
    """,
    "q93_chi2_contingency" -> """
      WITH cells AS (
        SELECT r_name, o_orderpriority, COUNT(*) AS observed
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2
      ), m AS (
        SELECT *,
               SUM(observed) OVER (PARTITION BY r_name) AS row_total,
               SUM(observed) OVER (PARTITION BY o_orderpriority) AS col_total,
               SUM(observed) OVER () AS grand
        FROM cells
      ), e AS (
        SELECT r_name, o_orderpriority, observed,
               CAST(row_total * col_total AS DOUBLE) / grand AS expected
        FROM m
      )
      SELECT r_name, o_orderpriority, observed,
             ROUND(expected, 4) AS expected,
             ROUND((observed - expected) * (observed - expected)
                   / expected, 6) AS chi2_contrib
      FROM e
    """,
    "q94_copurchase_pairs" -> """
      WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      )
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             COUNT(*) AS n_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      ORDER BY n_orders DESC, p1, p2 LIMIT 50
    """,
    "q105_correlation_audit" -> """
      WITH comp AS (
        SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS c
        FROM embeddings,
             UNNEST(generate_series(1, len(embedding))) AS g(i)
      ), stats AS (
        SELECT dim, COUNT(*) AS n,
               CAST(SUM(CAST(c AS DECIMAL(18,12))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(c * c AS DECIMAL(28,20))) AS DOUBLE) AS s2
        FROM comp GROUP BY 1
      ), mv AS (
        SELECT dim, s1 / n AS mean,
               s2 / n - (s1 / n) * (s1 / n) AS variance
        FROM stats
      ), cr AS (
        SELECT a.dim AS dim_i, b.dim AS dim_j, COUNT(*) AS n,
               CAST(SUM(CAST(a.c * b.c AS DECIMAL(28,20))) AS DOUBLE)
                 AS sxy
        FROM comp a JOIN comp b
          ON a.vec_id = b.vec_id AND a.dim < b.dim
        GROUP BY 1, 2
      ), cov AS (
        SELECT dim_i, dim_j, n,
               sxy / n - mi.mean * mj.mean AS cov,
               (sxy / n - mi.mean * mj.mean)
                 / sqrt(mi.variance * mj.variance) AS corr
        FROM cr JOIN mv mi ON dim_i = mi.dim
        JOIN mv mj ON dim_j = mj.dim
        WHERE mi.variance > 0 AND mj.variance > 0
      )
      SELECT dim_i, dim_j, n AS n_vecs,
             ROUND(cov, 8) AS cov, ROUND(corr, 6) AS corr
      FROM cov
      ORDER BY abs(corr) DESC, dim_i, dim_j LIMIT 20
    """,
    "q104_ngram_generate" -> """
      WITH arrs AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS arr
        FROM documents
      ), tri AS (
        SELECT arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS ngram
        FROM arrs, UNNEST(generate_series(1, len(arr) - 2)) AS g(i)
        WHERE len(arr) >= 3
      )
      SELECT ngram, COUNT(*) AS n FROM tri
      GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20
    """,
    "q103_supplier_topk" -> """
      WITH per_sup AS (
        SELECT n_name, s_suppkey, s_name,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2, 3
      ), rk AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
                    ORDER BY revenue DESC, s_suppkey) AS rn
        FROM per_sup
      )
      SELECT n_name, s_suppkey, s_name, revenue, n_lines
      FROM rk WHERE rn <= 3
    """,
    "q102_prefix_jaccard" -> """
      WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents WHERE doc_id < 500
      ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1
      ), sh AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        FROM tok a JOIN tok b
          ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT doc_a, doc_b, shared, sa.n AS n_a, sb.n AS n_b,
             ROUND(CAST(shared AS DOUBLE) / (sa.n + sb.n - shared), 6)
               AS jaccard
      FROM sh JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE shared * 39 >= (sa.n + sb.n) * 19
    """,
    "q101_pagerank" -> """
      WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      ), edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      ), deg AS (
        SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1
      ), nn AS (SELECT COUNT(*) AS n FROM deg),
      r0 AS (
        SELECT src AS node, CAST(1.0 AS DOUBLE) / n AS r FROM deg, nn
      ), c1 AS (
        SELECT e.dst,
               SUM(CAST(FLOOR(r / d.deg * 1e12) AS BIGINT)) AS s
        FROM edges e JOIN r0 ON e.src = r0.node
        JOIN deg d ON e.src = d.src GROUP BY 1
      ), r1 AS (
        SELECT d.src AS node,
               CAST(0.15 AS DOUBLE) / n + CAST(0.85 AS DOUBLE)
                 * (COALESCE(CAST(s AS BIGINT), 0) / 1e12) AS r
        FROM deg d CROSS JOIN nn LEFT JOIN c1 ON d.src = c1.dst
      ), c2 AS (
        SELECT e.dst,
               SUM(CAST(FLOOR(r / d.deg * 1e12) AS BIGINT)) AS s
        FROM edges e JOIN r1 ON e.src = r1.node
        JOIN deg d ON e.src = d.src GROUP BY 1
      ), r2 AS (
        SELECT d.src AS node,
               CAST(0.15 AS DOUBLE) / n + CAST(0.85 AS DOUBLE)
                 * (COALESCE(CAST(s AS BIGINT), 0) / 1e12) AS r
        FROM deg d CROSS JOIN nn LEFT JOIN c2 ON d.src = c2.dst
      ), c3 AS (
        SELECT e.dst,
               SUM(CAST(FLOOR(r / d.deg * 1e12) AS BIGINT)) AS s
        FROM edges e JOIN r2 ON e.src = r2.node
        JOIN deg d ON e.src = d.src GROUP BY 1
      ), r3 AS (
        SELECT d.src AS node,
               CAST(0.15 AS DOUBLE) / n + CAST(0.85 AS DOUBLE)
                 * (COALESCE(CAST(s AS BIGINT), 0) / 1e12) AS r
        FROM deg d CROSS JOIN nn LEFT JOIN c3 ON d.src = c3.dst
      )
      SELECT r3.node AS part, deg.deg AS degree,
             ROUND(r * 1e6, 6) AS rank_ppm
      FROM r3 JOIN deg ON r3.node = deg.src
      ORDER BY rank_ppm DESC, part LIMIT 25
    """,
    "q100_grouped_regression" -> """
      WITH monthly AS (
        SELECT n_regionkey AS region,
               (year(o_orderdate) * 12 + month(o_orderdate)) AS month_idx,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
      ), m0 AS (
        SELECT region, MIN(month_idx) AS m0 FROM monthly GROUP BY 1
      ), m AS (
        SELECT monthly.region, COUNT(*) AS n,
               CAST(SUM(CAST(month_idx - m0 AS DECIMAL(9,0))) AS DOUBLE)
                 AS sxd,
               CAST(SUM(CAST(revenue AS DECIMAL(15,2))) AS DOUBLE)
                 AS syd,
               CAST(SUM(CAST(month_idx - m0 AS DECIMAL(9,0))
                        * CAST(revenue AS DECIMAL(15,2))) AS DOUBLE)
                 AS sxyd,
               CAST(SUM(CAST(month_idx - m0 AS DECIMAL(9,0))
                        * CAST(month_idx - m0 AS DECIMAL(9,0))) AS DOUBLE)
                 AS sxxd
        FROM monthly JOIN m0 ON monthly.region = m0.region
        GROUP BY 1
      )
      SELECT region, n AS n_months,
             ROUND((n * sxyd - sxd * syd)
                   / (n * sxxd - sxd * sxd), 6) AS slope,
             ROUND((syd - (n * sxyd - sxd * syd)
                          / (n * sxxd - sxd * sxd) * sxd) / n, 4)
               AS intercept
      FROM m
    """,
    "q98_winsorize" -> """
      WITH b AS (
        SELECT c_mktsegment,
               quantile_cont(c_acctbal, 0.05) AS p05,
               quantile_cont(c_acctbal, 0.95) AS p95
        FROM customer GROUP BY 1
      )
      SELECT c.c_mktsegment,
             COUNT(*) AS n_customers,
             CAST(SUM(CASE WHEN c_acctbal < p05 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clipped_low,
             CAST(SUM(CASE WHEN c_acctbal > p95 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clipped_high,
             ROUND(MIN(p05), 2) AS p05,
             ROUND(MIN(p95), 2) AS p95,
             ROUND(CAST(SUM(CAST(GREATEST(p05, LEAST(p95, c_acctbal))
                   AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4)
               AS winsorized_mean
      FROM customer c JOIN b ON c.c_mktsegment = b.c_mktsegment
      GROUP BY 1
    """,
    "q99_time_weighted" -> """
      WITH iv AS (
        SELECT user_id, value,
               CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT)
                 - CAST(floor(epoch(ts)) AS BIGINT) AS dur
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
      SELECT user_id,
             COUNT(*) AS n_intervals,
             CAST(SUM(dur) AS BIGINT) AS total_secs,
             ROUND(CAST(SUM(CAST(value * dur AS DECIMAL(28,4)))
                   AS DOUBLE) / SUM(dur), 4) AS twa_value
      FROM iv WHERE dur IS NOT NULL
      GROUP BY 1
    """,
    "q97_topk_per_group" -> """
      WITH rk AS (
        SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
      )
      SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice
      FROM rk WHERE rn <= 3
    """,
    "q96_quality_report" -> """
      WITH w AS (
        SELECT COUNT(*) AS n_rows,
               SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                 AS not_null_custkey,
               SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END)
                 AS positive_totalprice,
               SUM(CASE WHEN NOT (o_orderpriority IN ('1-URGENT',
                   '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'))
                   THEN 1 ELSE 0 END) AS valid_priority,
               SUM(CASE WHEN NOT (o_orderdate BETWEEN '1990-01-01'
                   AND '2005-12-31') THEN 1 ELSE 0 END) AS date_in_range,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS unique_orderkey
        FROM orders
      ), fk AS (
        SELECT COUNT(*) AS v
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        WHERE o_custkey IS NOT NULL AND c_custkey IS NULL
      ), tall AS (
        SELECT 'not_null_custkey' AS check_name, n_rows,
               CAST(not_null_custkey AS BIGINT) AS n_violations FROM w
        UNION ALL SELECT 'positive_totalprice', n_rows,
               CAST(positive_totalprice AS BIGINT) FROM w
        UNION ALL SELECT 'valid_priority', n_rows,
               CAST(valid_priority AS BIGINT) FROM w
        UNION ALL SELECT 'date_in_range', n_rows,
               CAST(date_in_range AS BIGINT) FROM w
        UNION ALL SELECT 'unique_orderkey', n_rows,
               CAST(unique_orderkey AS BIGINT) FROM w
        UNION ALL SELECT 'fk_customer', n_rows, CAST(v AS BIGINT)
               FROM w, fk
      )
      SELECT check_name, n_rows, n_violations,
             ROUND(CAST(n_violations AS DOUBLE) / n_rows, 6)
               AS violation_rate,
             (n_violations = 0) AS passed
      FROM tall
    """,
    "q95_rolling_distinct" -> """
      WITH pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
      ), ex AS (
        SELECT CAST(UNNEST(generate_series(d, d + 6, INTERVAL 1 DAY))
                    AS DATE) AS day,
               user_id
        FROM pairs
      ), bounds AS (
        SELECT MIN(d) AS lo, MAX(d) AS hi FROM pairs
      )
      SELECT strftime(day, '%Y-%m-%d') AS day,
             COUNT(DISTINCT user_id) AS n_users_7d
      FROM ex, bounds WHERE day BETWEEN lo AND hi
      GROUP BY 1
    """,
    "q106_item_similarity" -> """
      WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      ), deg AS (
        SELECT l_partkey, COUNT(*) AS deg FROM items GROUP BY 1
      ), pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_co
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
      )
      SELECT p1, p2, n_co, d1.deg AS d1, d2.deg AS d2,
             ROUND(CAST(n_co AS DOUBLE) /
                   sqrt(CAST(d1.deg * d2.deg AS DOUBLE)), 6) AS cosine
      FROM pairs
      JOIN deg d1 ON p1 = d1.l_partkey
      JOIN deg d2 ON p2 = d2.l_partkey
      ORDER BY CAST(n_co AS DOUBLE) /
               sqrt(CAST(d1.deg * d2.deg AS DOUBLE)) DESC, p1, p2
      LIMIT 50
    """,
    "q107_frequent_triples" -> """
      WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      )
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
             COUNT(*) AS n_orders
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      JOIN items c ON b.l_orderkey = c.l_orderkey
                  AND b.l_partkey < c.l_partkey
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
      ORDER BY n_orders DESC, p1, p2, p3 LIMIT 30
    """,
    "q108_mad_anomaly" -> """
      WITH spend AS (
        SELECT c_mktsegment, c_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
      ), med AS (
        SELECT c_mktsegment, quantile_cont(spend, 0.5) AS med
        FROM spend GROUP BY 1
      ), dev AS (
        SELECT s.c_mktsegment, spend, med, abs(spend - med) AS absdev
        FROM spend s JOIN med m ON s.c_mktsegment = m.c_mktsegment
      ), mad AS (
        SELECT c_mktsegment, quantile_cont(absdev, 0.5) AS mad
        FROM dev GROUP BY 1
      )
      SELECT d.c_mktsegment,
             COUNT(*) AS n_customers,
             ROUND(MIN(med), 4) AS median_spend,
             ROUND(MIN(m.mad), 4) AS mad,
             CAST(SUM(CASE WHEN absdev / (1.4826 * m.mad) > 3.5
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
             ROUND(MAX(absdev / (1.4826 * m.mad)), 6) AS max_robust_z
      FROM dev d JOIN mad m ON d.c_mktsegment = m.c_mktsegment
      GROUP BY 1 ORDER BY 1
    """,
    "q109_linear_interp" -> """
      WITH monthly AS (
        SELECT c_nationkey AS nation,
               year(o_orderdate) * 12 + month(o_orderdate) AS mi,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                     AS DOUBLE), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
        GROUP BY 1, 2
      ), bounds AS (
        SELECT year(MIN(o_orderdate)) * 12 + month(MIN(o_orderdate)) AS lo,
               year(MAX(o_orderdate)) * 12 + month(MAX(o_orderdate)) AS hi
        FROM orders
      ), spine AS (
        SELECT t.mi, n_nationkey AS nation
        FROM bounds, UNNEST(generate_series(lo, hi)) AS t(mi), nation
      ), j AS (
        SELECT spine.nation, spine.mi, monthly.revenue
        FROM spine LEFT JOIN monthly
          ON spine.nation = monthly.nation AND spine.mi = monthly.mi
      ), w AS (
        SELECT nation, mi, revenue,
          last_value(revenue IGNORE NULLS) OVER
            (PARTITION BY nation ORDER BY mi
             ROWS UNBOUNDED PRECEDING) AS prev_v,
          last_value(CASE WHEN revenue IS NOT NULL THEN mi END
                     IGNORE NULLS) OVER
            (PARTITION BY nation ORDER BY mi
             ROWS UNBOUNDED PRECEDING) AS prev_mi,
          first_value(revenue IGNORE NULLS) OVER
            (PARTITION BY nation ORDER BY mi
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
          first_value(CASE WHEN revenue IS NOT NULL THEN mi END
                      IGNORE NULLS) OVER
            (PARTITION BY nation ORDER BY mi
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_mi
        FROM j
      )
      SELECT nation, mi, revenue IS NOT NULL AS observed,
             -- explicit floor-round: identical IEEE tree to the Spark
             -- side (ROUND(double) disagrees between engines at
             -- decimal boundaries an interpolant can land on)
             FLOOR((CASE
               WHEN revenue IS NOT NULL THEN revenue
               WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                 prev_v + (next_v - prev_v) *
                   (CAST(mi - prev_mi AS DOUBLE) /
                    CAST(next_mi - prev_mi AS DOUBLE))
               ELSE COALESCE(prev_v, next_v, 0.0) END) * 10000 + 0.5)
               / 10000 AS revenue_filled
      FROM w
    """,
    "q110_embedding_outliers" -> """
      WITH comp AS (
        SELECT vec_id, label, i - 1 AS dim,
               CAST(embedding[i] AS DOUBLE) AS c
        FROM embeddings,
             UNNEST(generate_series(1, len(embedding))) AS g(i)
      ), cent AS (
        SELECT label, dim,
               CAST(SUM(CAST(c AS DECIMAL(18,12))) AS DOUBLE)
                 / COUNT(*) AS cd
        FROM comp GROUP BY 1, 2
      ), d AS (
        SELECT comp.label, vec_id,
               CAST(SUM(CAST((c - cd) * (c - cd) AS DECIMAL(28,20)))
                    AS DOUBLE) AS dist2
        FROM comp JOIN cent
          ON comp.label = cent.label AND comp.dim = cent.dim
        GROUP BY 1, 2
      )
      SELECT label, vec_id, ROUND(dist2, 8) AS dist2
      FROM d ORDER BY dist2 DESC, vec_id LIMIT 50
    """,
    "q111_purchase_intervals" -> """
      WITH iv AS (
        SELECT o_custkey,
               datediff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS gap
        FROM orders
      )
      SELECT c_mktsegment,
             COUNT(*) AS n_intervals,
             MIN(gap) AS min_days,
             MAX(gap) AS max_days,
             ROUND(CAST(CAST(SUM(gap) AS BIGINT) AS DOUBLE) / COUNT(*), 6)
               AS mean_days,
             ROUND(quantile_cont(gap, 0.5), 4) AS median_days
      FROM iv JOIN customer ON o_custkey = c_custkey
      WHERE gap IS NOT NULL
      GROUP BY 1 ORDER BY 1
    """,
    "q112_first_touch" -> """
      WITH ev AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS es
        FROM events
      ), p AS (
        SELECT event_id AS p_id, user_id, es AS p_es
        FROM ev WHERE event_type = 'purchase'
      ), tch AS (
        SELECT user_id, event_type AS t_type, es AS t_es,
               event_id AS t_id
        FROM ev WHERE event_type <> 'purchase'
      ), attributed AS (
        SELECT p_id,
               COALESCE(arg_min(t_type,
                 lpad(CAST(t_es AS VARCHAR), 12, '0') ||
                 lpad(CAST(t_id AS VARCHAR), 12, '0')), 'none')
                 AS first_touch
        FROM p LEFT JOIN tch ON p.user_id = tch.user_id
             AND t_es >= p_es - 604800 AND t_es < p_es
        GROUP BY 1
      )
      SELECT first_touch, COUNT(*) AS n_purchases,
             ROUND(CAST(COUNT(*) AS DOUBLE) /
                   (SELECT COUNT(*) FROM attributed), 6) AS credit_share
      FROM attributed GROUP BY 1 ORDER BY 1
    """,
    "q113_activity_streaks" -> """
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
      ), isl AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id
                 ORDER BY d) AS INTEGER) AS anchor
        FROM days
      )
      SELECT user_id, strftime(MIN(d), '%Y-%m-%d') AS streak_start,
             strftime(MAX(d), '%Y-%m-%d') AS streak_end,
             COUNT(*) AS streak_days
      FROM isl GROUP BY user_id, anchor
      ORDER BY streak_days DESC, user_id, streak_start LIMIT 25
    """,
    "q114_mixture_diagnostics" -> """
      WITH counts AS (
        SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
      ), totals AS (
        SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
               COUNT(*) AS n_langs, MAX(n) AS top_n
        FROM counts GROUP BY 1
      )
      SELECT c.source,
             MIN(n_docs) AS n_docs,
             MIN(n_langs) AS n_langs,
             arg_min(lang, lpad(CAST(n_docs - n AS VARCHAR), 12, '0')
               || lang) AS top_lang,
             ROUND(CAST(MIN(top_n) AS DOUBLE) / MIN(n_docs), 6)
               AS top_share,
             ROUND(1.0 - CAST(SUM(CAST(
               (CAST(n AS DOUBLE) / n_docs) *
               (CAST(n AS DOUBLE) / n_docs) AS DECIMAL(28,20)))
               AS DOUBLE), 6) AS gini
      FROM counts c JOIN totals t ON c.source = t.source
      GROUP BY 1 ORDER BY 1
    """,
    "q115_leakage_matrix" -> """
      WITH d AS (
        SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      ), g AS (
        SELECT source,
               unnest(list_distinct(CASE WHEN len(toks) < 3
                 THEN [array_to_string(toks, ' ')]
                 ELSE list_transform(range(1, len(toks) - 1),
                        i -> array_to_string(toks[i:i+2], ' ')) END))
                 AS gram
        FROM d
      ), sg AS (
        SELECT DISTINCT source, gram FROM g
      )
      SELECT a.source AS src_a, b.source AS src_b,
             COUNT(*) AS n_shared_grams
      FROM sg a JOIN sg b ON a.gram = b.gram AND a.source < b.source
      GROUP BY 1, 2
      ORDER BY n_shared_grams DESC, src_a, src_b LIMIT 50
    """,
    "q116_distribution_drift" -> """
      WITH pop AS (
        SELECT year(o_orderdate) AS yr, o_totalprice AS v
        FROM orders WHERE year(o_orderdate) IN (1995, 1996)
      ), grid AS (
        SELECT quantile_cont(v,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
        FROM pop
      ), b AS (
        SELECT i AS decile, qs[i] AS boundary
        FROM grid, UNNEST(generate_series(1, 9)) AS t(i)
      )
      SELECT decile, ROUND(boundary, 4) AS boundary,
             ROUND(CAST(SUM(CASE WHEN yr = 1995 AND v <= boundary
                       THEN 1 ELSE 0 END) AS DOUBLE)
                   / SUM(CASE WHEN yr = 1995 THEN 1 ELSE 0 END), 6)
               AS cdf_1995,
             ROUND(CAST(SUM(CASE WHEN yr = 1996 AND v <= boundary
                       THEN 1 ELSE 0 END) AS DOUBLE)
                   / SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END), 6)
               AS cdf_1996,
             ROUND(abs(
               CAST(SUM(CASE WHEN yr = 1995 AND v <= boundary
                    THEN 1 ELSE 0 END) AS DOUBLE)
                 / SUM(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) -
               CAST(SUM(CASE WHEN yr = 1996 AND v <= boundary
                    THEN 1 ELSE 0 END) AS DOUBLE)
                 / SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END)), 6)
               AS cdf_gap
      FROM pop, b
      GROUP BY decile, boundary
      ORDER BY decile
    """,
    "q117_lorenz_gini" -> """
      WITH spend AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        FROM orders GROUP BY 1
      ), ranked AS (
        SELECT o_custkey, x,
               row_number() OVER (ORDER BY x, o_custkey) AS i,
               CAST(ntile(10) OVER (ORDER BY x, o_custkey) AS BIGINT)
                 AS decile
        FROM spend
      ), g AS (
        SELECT COUNT(*) AS n,
               SUM(x) AS sx,
               2.0 * CAST(SUM(CAST(x AS DECIMAL(18,2)) * i) AS DOUBLE) /
                 (COUNT(*) * CAST(SUM(x) AS DOUBLE)) -
                 CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*) AS gini_raw
        FROM ranked
      ), d AS (
        SELECT decile, COUNT(*) AS n_customers, SUM(x) AS dx
        FROM ranked GROUP BY 1
      )
      SELECT decile, n_customers,
             ROUND(CAST(dx AS DOUBLE), 2) AS decile_spend,
             ROUND(CAST(SUM(dx) OVER (ORDER BY decile
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(sx AS DOUBLE), 6) AS cum_share,
             ROUND(gini_raw, 6) AS gini
      FROM d, g
      ORDER BY decile
    """,
    "q118_cuped" -> """
      WITH cut AS (
        SELECT CAST(MIN(ts) AS DATE) + 15 AS cut FROM events
      ), per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) < cut
                 THEN CAST(value AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS x,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) >= cut
                 THEN CAST(value AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS y,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                 < '8' THEN 'A' ELSE 'B' END AS arm
        FROM events, cut
        GROUP BY user_id, cut
      ), m0 AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*) AS mx,
               CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*) AS my,
               CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE)
                 / COUNT(*) AS mxy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE)
                 / COUNT(*) AS mxx
        FROM per_user
      ), m AS (
        SELECT mx, (mxy - mx * my) / (mxx - mx * mx) AS theta FROM m0
      )
      SELECT arm, COUNT(*) AS n_users,
             ROUND(CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*), 6) AS mean_y,
             ROUND(CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*)
               - MIN(theta) *
                 (CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) - MIN(mx)), 6) AS mean_y_cuped,
             ROUND(MIN(theta), 6) AS theta
      FROM per_user, m
      GROUP BY arm ORDER BY arm
    """,
    "q119_path_mining" -> """
      WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS es
        FROM events
      ), s1 AS (
        SELECT *, CASE WHEN lag(es) OVER w IS NULL
                         OR es - lag(es) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_sess
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), s2 AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                  AS session_seq
        FROM s1
      ), p AS (
        SELECT event_type AS step1,
               lead(event_type, 1) OVER w2 AS step2,
               lead(event_type, 2) OVER w2 AS step3
        FROM s2 WINDOW w2 AS (PARTITION BY user_id, session_seq
                              ORDER BY ts, event_id)
      )
      SELECT step1, step2, step3, COUNT(*) AS n_paths
      FROM p WHERE step2 IS NOT NULL AND step3 IS NOT NULL
      GROUP BY 1, 2, 3
      ORDER BY n_paths DESC, step1, step2, step3 LIMIT 20
    """
  ).map { case (k, v) => k -> v.trim }

  /** Scale-pattern pack: every oracle here is the PLAIN form of the
    * query — sketches and manifests prune execution, never change
    * answers, so DuckDB needs no knowledge of them. */
  val scale: Map[String, String] = Map(
    "q120_bloom_join" -> """
      SELECT o_orderpriority, COUNT(*) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING'
                            AND c_acctbal > 7500)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """,
    "q121_sketch_heavy_hitters" -> """
      WITH thr AS (
        SELECT GREATEST(1, COUNT(*) // 250) AS t FROM events
      )
      SELECT user_id, COUNT(*) AS n_events
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY user_id
      HAVING COUNT(*) >= (SELECT t FROM thr)
      ORDER BY n_events DESC, user_id
    """,
    "q122_array_fold" -> """
      SELECT vec_id,
             CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)
               AS n_pos,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(embedding, x -> abs(x))),
               (a, b) -> a + b) AS l1,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(embedding, x -> x * x)),
               (a, b) -> a + b) AS l2sq,
             CAST(list_sort(embedding, 'DESC')[1] AS DOUBLE)
               + CAST(list_sort(embedding, 'DESC')[2] AS DOUBLE)
               + CAST(list_sort(embedding, 'DESC')[3] AS DOUBLE)
               AS top3_sum
      FROM embeddings
      ORDER BY l1 DESC, vec_id
      LIMIT 100
    """,
    "q123_incremental_agg" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             o_orderpriority,
             COUNT(*) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE) / COUNT(*), 6) AS avg_price,
             MIN(o_orderdate) AS first_order,
             MAX(o_orderdate) AS last_order
      FROM orders
      GROUP BY 1, 2
      ORDER BY 1, 2
    """,
    "q124_zonemap_skipping" -> """
      SELECT l_returnflag, COUNT(*) AS n_rows,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS sum_qty
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1995-06-01 00:00:00'
                           AND TIMESTAMP '1995-08-31 00:00:00'
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """,
    "q125_skyline" -> """
      SELECT b.p_partkey, b.p_retailprice, b.p_size
      FROM part b
      WHERE NOT EXISTS (
        SELECT 1 FROM part a
        WHERE a.p_retailprice <= b.p_retailprice
          AND a.p_size >= b.p_size
          AND (a.p_retailprice < b.p_retailprice
               OR a.p_size > b.p_size))
      ORDER BY b.p_retailprice, b.p_partkey
    """,
    "q126_rfm" -> """
      WITH anchor AS (SELECT max(o_orderdate) AS a FROM orders),
      per_cust AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate),
                 (SELECT a FROM anchor)) AS recency,
               COUNT(*) AS freq,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
        FROM orders GROUP BY o_custkey
      ), q AS (
        SELECT *,
               NTILE(5) OVER (ORDER BY recency, o_custkey) AS r_q,
               NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
               NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
        FROM per_cust
      )
      SELECT r_q, f_q, m_q, COUNT(*) AS n_customers,
             ROUND(CAST(SUM(monetary) AS DOUBLE), 2) AS total_monetary
      FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q127_theil_sen" -> """
      WITH monthly AS (
        SELECT r_name,
               (year(o_orderdate) * 12 + month(o_orderdate)) AS m,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS y
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2
      ), slopes AS (
        SELECT a.r_name,
               (b.y - a.y) / CAST(b.m - a.m AS DOUBLE) AS slope
        FROM monthly a JOIN monthly b
          ON a.r_name = b.r_name AND a.m < b.m
      )
      SELECT r_name, COUNT(*) AS n_pairs,
             ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
      FROM slopes GROUP BY r_name ORDER BY r_name
    """,
    "q128_table_checksum" -> """
      WITH h AS (
        SELECT c_mktsegment,
               CAST(concat('0x', substr(md5(concat_ws('|',
                 coalesce(CAST(c_custkey AS VARCHAR), '∅'),
                 coalesce(c_name, '∅'),
                 coalesce(CAST(c_nationkey AS VARCHAR), '∅'),
                 coalesce(c_mktsegment, '∅'))), 1, 15)) AS BIGINT) AS hv
        FROM customer
      )
      SELECT c_mktsegment, COUNT(*) AS n_rows,
             CAST(CAST(SUM(hv) AS DECIMAL(38,0)) AS VARCHAR) AS sum_hash,
             bit_xor(hv) AS xor_hash
      FROM h GROUP BY 1 ORDER BY 1
    """,
    "q129_nested_pruning" -> """
      SELECT event_type, COUNT(*) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS sum_value
      FROM events
      WHERE event_type IS NOT NULL AND event_type <> 'purchase'
      GROUP BY event_type
      ORDER BY event_type
    """,
    "q130_balanced_sample" -> """
      SELECT lang, rk, doc_id, substr(md5(text), 1, 12) AS pick_hash
      FROM (
        SELECT lang, doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY md5(text), doc_id) AS rk
        FROM documents)
      WHERE rk <= 20
      ORDER BY lang, rk
    """,
    "q176_padding_audit" -> """
      WITH lens AS (
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                 AS len
        FROM documents
      ), a AS (
        SELECT CAST((ROW_NUMBER() OVER (ORDER BY doc_id ASC) - 1) // 32
                 AS BIGINT) AS batch, len
        FROM lens
      ), ab AS (
        SELECT batch, COUNT(*) AS n_seqs,
               CAST(SUM(len) AS BIGINT) AS real_tokens,
               MAX(len) AS batch_max
        FROM a GROUP BY 1
      ), astat AS (
        SELECT 'arrival' AS strategy, COUNT(*) AS n_batches,
               CAST(SUM(real_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(batch_max * n_seqs - real_tokens) AS BIGINT)
                 AS padded_tokens
        FROM ab
      ), b AS (
        SELECT CAST((ROW_NUMBER() OVER (ORDER BY len ASC, doc_id ASC) - 1)
                 // 32 AS BIGINT) AS batch, len
        FROM lens
      ), bb AS (
        SELECT batch, COUNT(*) AS n_seqs,
               CAST(SUM(len) AS BIGINT) AS real_tokens,
               MAX(len) AS batch_max
        FROM b GROUP BY 1
      ), bstat AS (
        SELECT 'length_sorted' AS strategy, COUNT(*) AS n_batches,
               CAST(SUM(real_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(batch_max * n_seqs - real_tokens) AS BIGINT)
                 AS padded_tokens
        FROM bb
      )
      SELECT strategy, n_batches, total_tokens, padded_tokens,
             ROUND(padded_tokens /
               CAST(total_tokens + padded_tokens AS DOUBLE), 6)
               AS waste_share
      FROM (SELECT * FROM astat UNION ALL SELECT * FROM bstat)
      ORDER BY strategy
    """,
    // q177: the md5-derived luminance grid, fixed-threshold bits, and
    // 16-bit band packing are integer-exact in both engines; the oracle
    // verifies by BRUTE-FORCE all-pairs Hamming, so a hash match proves
    // the Spark side's pigeonhole banding loses no pair on the data.
    "q177_phash_neardup" -> """
      WITH m AS (
        SELECT doc_id AS media_id, sha256(text) AS sha FROM documents
      ), px AS (
        SELECT media_id, v, i,
          CASE WHEN i < 2 * v
            THEN (CAST(concat('0x', substring(md5(concat(sha, ':',
                   CAST(i AS VARCHAR))), 1, 2)) AS INTEGER) + 128) % 256
            ELSE CAST(concat('0x', substring(md5(concat(sha, ':',
                   CAST(i AS VARCHAR))), 1, 2)) AS INTEGER)
          END AS pixel
        FROM m, range(3) t(v), range(64) s(i)
      ), bands AS (
        SELECT media_id, v, i // 16 AS band,
          CAST(SUM(CASE WHEN pixel > 128
                        THEN CAST(power(2, i % 16) AS INTEGER)
                        ELSE 0 END) AS INTEGER) AS bv
        FROM px GROUP BY 1, 2, 3
      ), fp AS (
        SELECT media_id, v, media_id * 3 + v AS vid,
          MAX(CASE WHEN band = 0 THEN bv END) AS b0,
          MAX(CASE WHEN band = 1 THEN bv END) AS b1,
          MAX(CASE WHEN band = 2 THEN bv END) AS b2,
          MAX(CASE WHEN band = 3 THEN bv END) AS b3
        FROM bands GROUP BY 1, 2
      )
      SELECT a.media_id AS media_a, a.v AS variant_a,
             b.media_id AS media_b, b.v AS variant_b,
             bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
             bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
               AS hamming,
             CAST(a.media_id = b.media_id AS INTEGER) AS same_media
      FROM fp a JOIN fp b ON a.vid < b.vid
      WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
            bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
    """,
    // q181: the oracle reads the PARQUET originals while Spark audits
    // its ORC read-back — a hash match proves the cross-format round
    // trip lost nothing.
    "q181_orc_roundtrip" -> """
      WITH d AS (
        SELECT CAST(concat('0x', substr(md5(concat_ws('|',
                 coalesce(CAST(doc_id AS VARCHAR), '∅'),
                 coalesce(md5(text), '∅'),
                 coalesce(lang, '∅'),
                 coalesce(source, '∅'),
                 coalesce(CAST(n_chars AS VARCHAR), '∅'))), 1, 15))
                 AS BIGINT) AS hv,
               n_chars
        FROM documents
      ), o AS (
        SELECT CAST(concat('0x', substr(md5(concat_ws('|',
                 coalesce(CAST(o_orderkey AS VARCHAR), '∅'),
                 coalesce(CAST(o_custkey AS VARCHAR), '∅'),
                 coalesce(o_orderstatus, '∅'),
                 coalesce(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '∅'),
                 coalesce(o_orderpriority, '∅'))), 1, 15))
                 AS BIGINT) AS hv,
               CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
      )
      SELECT 'documents' AS "table", COUNT(*) AS n_rows,
             CAST(CAST(SUM(hv) AS DECIMAL(38,0)) AS VARCHAR) AS sum_hash,
             bit_xor(hv) AS xor_hash,
             CAST(SUM(n_chars) AS BIGINT) AS value_sum
      FROM d
      UNION ALL
      SELECT 'orders', COUNT(*),
             CAST(CAST(SUM(hv) AS DECIMAL(38,0)) AS VARCHAR),
             bit_xor(hv), CAST(SUM(cents) AS BIGINT)
      FROM o
      ORDER BY "table"
    """,
    // q182: like q181, the oracle reads the PARQUET originals while
    // Spark audits its JSON read-back — a hash match proves the
    // JSON-lines cycle (timestamp rendering, double rendering, embedded
    // JSON re-escaping) lost nothing.
    "q182_json_roundtrip" -> """
      WITH d AS (
        SELECT CAST(concat('0x', substr(md5(concat_ws('|',
                 coalesce(CAST(doc_id AS VARCHAR), '∅'),
                 coalesce(md5(text), '∅'),
                 coalesce(lang, '∅'),
                 coalesce(source, '∅'),
                 coalesce(CAST(n_chars AS VARCHAR), '∅'))), 1, 15))
                 AS BIGINT) AS hv,
               n_chars
        FROM documents
      ), e AS (
        SELECT CAST(concat('0x', substr(md5(concat_ws('|',
                 coalesce(CAST(event_id AS VARCHAR), '∅'),
                 coalesce(CAST(epoch_us(ts) AS VARCHAR), '∅'),
                 coalesce(CAST(user_id AS VARCHAR), '∅'),
                 coalesce(event_type, '∅'),
                 coalesce(CAST(CAST(FLOOR(value * 1000) AS BIGINT)
                   AS VARCHAR), '∅'),
                 coalesce(md5(props), '∅'))), 1, 15))
                 AS BIGINT) AS hv,
               CAST(FLOOR(value * 1000) AS BIGINT) AS mills
        FROM events
      )
      SELECT 'documents' AS "table", COUNT(*) AS n_rows,
             CAST(CAST(SUM(hv) AS DECIMAL(38,0)) AS VARCHAR) AS sum_hash,
             bit_xor(hv) AS xor_hash,
             CAST(SUM(n_chars) AS BIGINT) AS value_sum
      FROM d
      UNION ALL
      SELECT 'events', COUNT(*),
             CAST(CAST(SUM(hv) AS DECIMAL(38,0)) AS VARCHAR),
             bit_xor(hv), CAST(SUM(mills) AS BIGINT)
      FROM e
      ORDER BY "table"
    """,
    // q183: the stub PCM decode (byte → recentered sample) and the
    // framing/energy arithmetic restated over hex(encode(text)).
    "q183_audio_frames" -> """
      WITH m AS (
        SELECT doc_id AS media_id,
               hex(encode(text)) AS hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_samples
        FROM documents
      ), f AS (
        SELECT media_id, n_samples,
               CASE WHEN n_samples >= 64
                    THEN CAST((n_samples - 64) // 32 + 1 AS INTEGER)
                    ELSE 0 END AS n_frames,
               hx
        FROM m
      ), e AS (
        SELECT media_id, n_samples, n_frames,
               CASE WHEN n_frames > 0 THEN
                 list_transform(generate_series(0, n_frames - 1), fr ->
                   CAST(list_sum(list_transform(
                     generate_series(fr * 32, fr * 32 + 63), i ->
                       CAST((CAST(concat('0x',
                              substr(hx, CAST(i AS INTEGER) * 2 + 1, 2))
                              AS INTEGER) - 128) AS BIGINT)
                       * CAST((CAST(concat('0x',
                              substr(hx, CAST(i AS INTEGER) * 2 + 1, 2))
                              AS INTEGER) - 128) AS BIGINT)))
                     AS BIGINT))
               ELSE CAST([] AS BIGINT[]) END AS en
        FROM f
      )
      SELECT media_id, n_samples, n_frames,
             COALESCE(CAST(list_sum(en) AS BIGINT), 0) AS total_energy,
             CASE WHEN n_frames > 0 THEN list_max(en)
                  ELSE -1 END AS peak_energy,
             CASE WHEN n_frames > 0
                  THEN CAST(list_position(en, list_max(en)) - 1 AS BIGINT)
                  ELSE -1 END AS peak_frame,
             CASE WHEN n_frames > 0
                  THEN len(list_filter(en, x -> x * 2 >= list_max(en)))
                  ELSE 0 END AS n_loud
      FROM e
    """,
    // q188: same null injection + left join stated directly; the
    // NULL-nation row is the bypassed anonymous traffic.
    "q188_null_skew_join" -> """
      WITH o AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE o_custkey END AS cust_fk,
               o_totalprice
        FROM orders
      )
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
      FROM o LEFT JOIN customer ON cust_fk = c_custkey
      GROUP BY 1
    """,
    // q187: the oracle aggregates the parquet originals — a hash match
    // proves the per-generation declared reads + cast + union lost no
    // row or value to the type conflict.
    "q187_resolve_choice" -> """
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
               AS sum_mills,
             CAST(COUNT(CASE WHEN value IS NULL THEN 1 END) AS BIGINT)
               AS n_null_value
      FROM events
      GROUP BY 1
    """,
    // q186: integer micro-unit TF-IDF weights (ratio-idf — no ln, so
    // the float path into FLOOR is pure IEEE and engine-exact) make
    // every aggregate exact; the inverted-index join reproduces
    // bit-identically.
    "q186_allpairs_tfidf" -> """
      WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents
      ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
      ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
      ), nn AS (SELECT COUNT(*) AS n FROM documents),
      w AS (
        SELECT t.doc_id, t.term,
               CAST(FLOOR(t.tf * ((nn.n + 1.0) / (d.df + 1.0))
                 * 1000000) AS BIGINT) AS wi
        FROM tf t JOIN df d USING (term), nn
        WHERE d.df * 4 <= nn.n
      ), nrm AS (
        SELECT doc_id, CAST(SUM(wi * wi) AS BIGINT) AS sn
        FROM w GROUP BY 1
      ), dt AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(SUM(a.wi * b.wi) AS BIGINT) AS dp
        FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT doc_a, doc_b,
             ROUND(dp / (sqrt(na.sn) * sqrt(nb.sn)), 6) AS cosine
      FROM dt
      JOIN nrm na ON doc_a = na.doc_id
      JOIN nrm nb ON doc_b = nb.doc_id
      WHERE dp / (sqrt(na.sn) * sqrt(nb.sn)) >= 0.5
    """,
    // q185: the oracle restates which rows each writer generation
    // holds; a hash match proves the mergeSchema read misaligned
    // nothing and surfaced the missing column as NULL exactly where
    // the old writer ran.
    "q185_schema_evolution" -> """
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'old' ELSE 'new' END AS batch,
             CASE WHEN doc_id % 2 = 0 THEN '∅'
                  ELSE coalesce(lang, '∅') END AS lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents
      GROUP BY 1, 2
    """,
    // q184: q39's recursive transitive closure + q15's quality formula;
    // the canonical member falls out of a per-cluster window rank.
    "q184_canonical_dedup" -> """
      WITH RECURSIVE n AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
        FROM embeddings
      ), pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.30
      ), e AS (
        SELECT va AS a, vb AS b FROM pairs
        UNION SELECT vb, va FROM pairs
      ), reach(src, dst) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
      ), lab AS (
        SELECT v.id, LEAST(v.id, MIN(r.dst)) AS cluster_id
        FROM (SELECT DISTINCT a AS id FROM e) v
        LEFT JOIN reach r ON r.src = v.id
        GROUP BY v.id
      ), mem AS (
        SELECT l.cluster_id, d.doc_id, d.n_chars,
               ROUND(least(len(toks) / 50.0, 1.0) *
                     (0.5 + 0.5 * (len(list_distinct(toks)) /
                                   CAST(len(toks) AS DOUBLE))), 4)
                 AS quality
        FROM lab l
        JOIN (SELECT doc_id, n_chars,
                     regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents) d
          ON d.doc_id = l.id
      ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY cluster_id
                    ORDER BY quality DESC, doc_id ASC) AS rn
        FROM mem
      ), agg AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(n_chars) AS BIGINT) AS bytes_total,
               MIN(quality) AS min_quality
        FROM mem GROUP BY 1
      )
      SELECT r.cluster_id, a.n_members, r.doc_id AS canonical_doc,
             r.quality AS canonical_quality, a.bytes_total,
             a.bytes_total - r.n_chars AS bytes_saved, a.min_quality
      FROM ranked r JOIN agg a USING (cluster_id)
      WHERE r.rn = 1
    """,
    "q180_quantile_sketch" -> """
      WITH lens AS (
        SELECT source,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS l
        FROM documents
      ), counts AS (
        SELECT source, CAST(len(bin(l + 1)) - 1 AS INTEGER) AS bucket,
               COUNT(*) AS cnt, MAX(l) AS bmax
        FROM lens GROUP BY 1, 2
      ), cum AS (
        SELECT source, bucket, cnt, bmax,
               SUM(cnt) OVER (PARTITION BY source ORDER BY bucket
                 ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY source) AS n,
               CAST(power(2, bucket + 1) AS BIGINT) - 2 AS ub
        FROM counts
      )
      SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_docs,
             COUNT(*) AS n_buckets, MAX(bmax) AS max_len,
             MIN(CASE WHEN cum * 100 >= n * 50 THEN ub END) AS p50_ub,
             MIN(CASE WHEN cum * 100 >= n * 90 THEN ub END) AS p90_ub,
             MIN(CASE WHEN cum * 100 >= n * 99 THEN ub END) AS p99_ub
      FROM cum GROUP BY source ORDER BY source
    """,
    "q178_shard_plan" -> """
      WITH d AS (
        SELECT source, doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS tokens,
               md5(text) AS h
        FROM documents
      ), sh AS (
        SELECT *, CAST(concat('0x', substring(h, 1, 2)) AS INTEGER) % 16
                 AS shard
        FROM d
      ), per AS (
        SELECT shard, COUNT(*) AS n_docs,
               CAST(SUM(tokens) AS BIGINT) AS n_tokens,
               COUNT(DISTINCT source) AS n_sources,
               MIN(concat(h, '/', CAST(doc_id AS VARCHAR))) AS order_min,
               MAX(concat(h, '/', CAST(doc_id AS VARCHAR))) AS order_max,
               CAST(SUM(CAST(concat('0x', substring(h, 1, 8)) AS BIGINT))
                 AS BIGINT) AS content_checksum
        FROM sh GROUP BY 1
      ), t AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM per
      )
      SELECT shard, n_docs, n_tokens, n_sources,
             ROUND(CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE),
               6) AS token_share,
             order_min, order_max, content_checksum
      FROM per, t ORDER BY shard
    """,
    // q179: the allocation CTEs restate q159's; the fractional-epoch
    // draw is a salted-md5 threshold, content-stable in both engines.
    "q179_epoch_schedule" -> """
      WITH per AS (
        SELECT source,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                 AS BIGINT) AS tokens,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1
      ), w AS (
        SELECT *, CAST(FLOOR(sqrt(CAST(tokens AS DOUBLE)) * 1e6) AS BIGINT)
                 AS w
        FROM per
      ), t AS (
        SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(w) AS BIGINT) AS total_w
        FROM w
      ), a AS (
        SELECT source, tokens,
               CAST(LEAST(((total_tokens // 2) * w) // total_w, tokens * 4)
                 AS BIGINT) AS alloc_tokens
        FROM w, t
      ), sched AS (
        SELECT source, tokens, alloc_tokens,
               CAST(alloc_tokens // tokens AS BIGINT) AS full_epochs,
               CAST(((alloc_tokens % tokens) * 1000000) // tokens AS BIGINT)
                 AS frac_ppm
        FROM a
      ), dt AS (
        SELECT source,
               CAST(len(regexp_split_to_array(trim(text), '\s+'))
                 AS BIGINT) AS dtok,
               CAST(concat('0x', substring(md5(text || '|q179'), 1, 8))
                 AS BIGINT) % 1000000 AS u
        FROM documents
      ), picks AS (
        SELECT dt.source, COUNT(*) AS n_docs_sampled,
               CAST(SUM(dtok) AS BIGINT) AS sampled_tokens
        FROM dt JOIN sched ON dt.source = sched.source
        WHERE u < frac_ppm GROUP BY 1
      )
      SELECT sched.source, tokens, alloc_tokens, full_epochs, frac_ppm,
             COALESCE(n_docs_sampled, 0) AS n_docs_sampled,
             CAST(COALESCE(sampled_tokens, 0) AS BIGINT) AS sampled_tokens,
             CAST(full_epochs * tokens + COALESCE(sampled_tokens, 0)
               AS BIGINT) AS scheduled_tokens
      FROM sched LEFT JOIN picks ON sched.source = picks.source
      ORDER BY sched.source
    """,
    "q131_session_window" -> """
      WITH ev AS (
        SELECT user_id, ts, event_id, value, epoch_us(ts) AS eu
        FROM events
      ), s1 AS (
        SELECT *, CASE WHEN lag(eu) OVER w IS NULL
                         OR eu - lag(eu) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), s2 AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                  AS sess
        FROM s1
      )
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             COUNT(*) AS n_events,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS session_value
      FROM s2 GROUP BY user_id, sess
      ORDER BY user_id, session_start
    """,
    "q132_weighted_median" -> """
      WITH byprice AS (
        SELECT l_returnflag, l_extendedprice AS price,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2
      ), c AS (
        SELECT *,
               SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price
                 ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS total_w
        FROM byprice
      )
      SELECT l_returnflag,
             CAST(MIN(total_w) AS BIGINT) AS total_weight,
             MIN(price) AS weighted_median_price
      FROM c WHERE cumw * 2 >= total_w
      GROUP BY 1 ORDER BY 1
    """,
    "q133_listagg" -> """
      SELECT r_name,
             COUNT(n_name) AS n_nations,
             string_agg(n_name, '|' ORDER BY n_name) AS nations
      FROM (
        SELECT DISTINCT r.r_name, n.n_name
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
      ) pairs
      GROUP BY r_name
      ORDER BY r_name
    """,
    "q134_rendezvous" -> """
      WITH cand AS (
        SELECT doc_id, n_chars, k.shard,
               md5(concat(CAST(doc_id AS VARCHAR), ':',
                 CAST(k.shard AS VARCHAR))) AS h
        FROM documents, (SELECT unnest(range(8)) AS shard) k
      ), win AS (
        SELECT doc_id, n_chars, arg_max(shard, h) AS shard
        FROM cand GROUP BY doc_id, n_chars
      )
      SELECT shard, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM win GROUP BY shard ORDER BY shard
    """,
    "q135_snapshot_diff" -> """
      WITH old AS (
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
      ), new_snap AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 100.0
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM old WHERE c_custkey % 97 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_acctbal, c_mktsegment
        FROM old WHERE c_custkey % 101 = 0
      ), diff AS (
        SELECT coalesce(o.c_custkey, n.c_custkey) AS key,
               CASE WHEN n.c_custkey IS NULL THEN 'removed'
                    WHEN o.c_custkey IS NULL THEN 'added'
                    WHEN o.c_acctbal <> n.c_acctbal
                      OR o.c_name <> n.c_name
                      OR o.c_mktsegment <> n.c_mktsegment THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old o FULL OUTER JOIN new_snap n
          ON o.c_custkey = n.c_custkey
      )
      SELECT status, COUNT(*) AS n_keys,
             CAST(SUM(key) AS BIGINT) AS key_sum
      FROM diff GROUP BY status ORDER BY status
    """,
    "q136_cumulative_distinct" -> """
      WITH ev AS (
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events
      ), fm AS (
        SELECT user_id, min(day) AS first_day FROM ev GROUP BY user_id
      ), daily_new AS (
        SELECT first_day AS day, COUNT(*) AS n_new
        FROM fm GROUP BY first_day
      ), daily_active AS (
        SELECT day, COUNT(*) AS n_active
        FROM (SELECT DISTINCT user_id, day FROM ev) GROUP BY day
      )
      SELECT a.day, a.n_active,
             coalesce(n.n_new, 0) AS n_new,
             a.n_active - coalesce(n.n_new, 0) AS n_returning,
             CAST(SUM(coalesce(n.n_new, 0)) OVER (ORDER BY a.day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_users
      FROM daily_active a LEFT JOIN daily_new n ON a.day = n.day
      ORDER BY a.day
    """,
    "q137_quarantine_audit" -> """
      WITH dirty AS (
        SELECT event_id,
               CASE WHEN event_id % 11 = 0 THEN substr(props, 1, 3)
                    WHEN event_id % 13 = 0 THEN '{"k": "oops"}'
                    WHEN event_id % 17 = 0 THEN '{"x": 1}'
                    ELSE props END AS props
        FROM events
      ), parsed AS (
        -- objects-only, matching Spark's from_json(MapType): scalar or
        -- array JSON parses to NULL there, so it must classify as
        -- invalid_json here too (json_valid alone accepts scalars).
        -- CASE guards json_type: it errors on malformed input.
        SELECT event_id,
               CASE WHEN NOT jv THEN NULL
                    ELSE json_extract_string(props, 'k') END AS kraw, jv
        FROM (
          SELECT event_id, props,
                 CASE WHEN NOT json_valid(props) THEN FALSE
                      WHEN json_type(props) <> 'OBJECT' THEN FALSE
                      ELSE TRUE END AS jv
          FROM dirty)
      ), classed AS (
        SELECT event_id, TRY_CAST(kraw AS BIGINT) AS kval,
               CASE WHEN NOT jv THEN 'invalid_json'
                    WHEN kraw IS NULL THEN 'missing_key'
                    WHEN TRY_CAST(kraw AS BIGINT) IS NULL
                      THEN 'non_numeric_value'
                    ELSE 'ok' END AS status
        FROM parsed
      )
      SELECT status, COUNT(*) AS n_events,
             CAST(SUM(event_id) AS BIGINT) AS id_sum,
             CAST(coalesce(SUM(kval), 0) AS BIGINT) AS k_total
      FROM classed GROUP BY status ORDER BY status
    """,
    "q138_feature_hashing" -> """
      WITH tok AS (
        SELECT doc_id, w
        FROM (SELECT doc_id,
                unnest(regexp_split_to_array(trim(text), '\s+')) AS w
              FROM documents)
        WHERE length(w) > 0
      ), per_doc AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(w), 1, 7)) AS BIGINT) % 32
                 AS dim,
               COUNT(*) AS cnt
        FROM tok GROUP BY 1, 2
      )
      SELECT dim, CAST(SUM(cnt) AS BIGINT) AS total_count,
             COUNT(*) AS n_docs_nonzero,
             CAST(MAX(cnt) AS BIGINT) AS max_doc_count
      FROM per_doc GROUP BY dim ORDER BY dim
    """,
    "q139_class_weights" -> """
      WITH per_label AS (
        SELECT label, COUNT(*) AS n_examples
        FROM embeddings GROUP BY label
      ), totals AS (
        SELECT CAST(SUM(n_examples) AS BIGINT) AS n_total,
               COUNT(*) AS n_classes
        FROM per_label
      )
      SELECT label, n_examples,
             ROUND(CAST(n_total AS DOUBLE) / (n_classes * n_examples), 6)
               AS class_weight
      FROM per_label, totals
      ORDER BY label
    """,
    // brute-force all-pairs Hamming scan: the engine runs the banded
    // equi-join, so a hash match against this PROVES the pigeonhole
    // banding loses no pair on the data (q102's oracle pattern)
    "q140_simhash_pairs" -> (simhashSigCte + """
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """),
    "q141_asof_tolerance" -> """
      WITH p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
      ), v AS (
        SELECT user_id, ts AS vts, event_id AS view_id FROM events
        WHERE event_type = 'view'
      ), m AS (
        SELECT p.event_id, p.user_id, p.ts, v.view_id, v.vts,
               date_diff('second', v.vts, p.ts) AS secs
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND v.vts <= p.ts
      )
      SELECT event_id, user_id,
             CASE WHEN secs <= 7200 THEN view_id END AS view_id,
             CASE WHEN secs <= 7200 THEN secs END AS secs_since_view,
             (vts IS NOT NULL AND secs > 7200) AS stale_dropped
      FROM m ORDER BY event_id
    """,
    "q142_bucketed_join" -> """
      SELECT o_orderpriority, COUNT(*) AS n_lines,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """,
    "q143_proportional_allocation" -> """
      WITH sizes AS (
        SELECT lang, COUNT(*) AS n_stratum FROM documents GROUP BY lang
      ), tot AS (
        SELECT CAST(SUM(n_stratum) AS BIGINT) AS n_total FROM sizes
      ), q0 AS (
        SELECT lang, n_stratum,
               (100 * n_stratum) // n_total AS base,
               (100 * n_stratum) % n_total AS rem
        FROM sizes, tot
      ), q1 AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS seat_rank,
               CAST(SUM(base) OVER () AS BIGINT) AS total_base
        FROM q0
      ), quotas AS (
        SELECT lang, n_stratum,
               CAST(base + CASE WHEN seat_rank <= 100 - total_base
                 THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM q1
      ), ranked AS (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                 ORDER BY md5(text), doc_id) AS rk
        FROM documents
      )
      SELECT r.lang, q.n_stratum, q.quota, r.rk, r.doc_id
      FROM ranked r JOIN quotas q ON r.lang = q.lang
      WHERE r.rk <= q.quota
      ORDER BY r.lang, r.rk
    """,
    "q144_bounce_analysis" -> """
      WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS es
        FROM events
      ), s1 AS (
        SELECT *, CASE WHEN lag(es) OVER w IS NULL
                         OR es - lag(es) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_sess
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), s2 AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                  AS session_seq
        FROM s1
      ), sess AS (
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               arg_min(event_type, concat_ws(':',
                 lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0'),
                 lpad(CAST(event_id AS VARCHAR), 12, '0'))) AS entry_type,
               arg_max(event_type, concat_ws(':',
                 lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0'),
                 lpad(CAST(event_id AS VARCHAR), 12, '0'))) AS exit_type
        FROM s2 GROUP BY user_id, session_seq
      )
      SELECT entry_type, COUNT(*) AS n_sessions,
             ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*), 6) AS bounce_rate,
             ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
               AS avg_session_events,
             ROUND(CAST(SUM(CASE WHEN entry_type = exit_type
               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS same_exit_rate
      FROM sess GROUP BY entry_type ORDER BY entry_type
    """,
    "q145_interval_merge" -> """
      WITH iv AS (
        SELECT o_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS start_d,
               CAST(o_orderdate AS DATE) + 7 AS end_d
        FROM orders
      ), m AS (
        SELECT *,
               MAX(end_d) OVER (PARTITION BY o_custkey
                 ORDER BY start_d, end_d, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max_end
        FROM iv
      ), flagged AS (
        SELECT *, CASE WHEN prev_max_end IS NULL
                         OR start_d > prev_max_end
                  THEN 1 ELSE 0 END AS new_island
        FROM m
      ), islanded AS (
        SELECT *, SUM(new_island) OVER (PARTITION BY o_custkey
                    ORDER BY start_d, end_d, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS island_seq
        FROM flagged
      ), islands AS (
        SELECT o_custkey, island_seq, COUNT(*) AS n_orders,
               MIN(start_d) AS island_start, MAX(end_d) AS island_end
        FROM islanded GROUP BY o_custkey, island_seq
      )
      SELECT o_custkey, CAST(SUM(n_orders) AS BIGINT) AS n_orders,
             COUNT(*) AS n_islands,
             CAST(SUM(island_end - island_start) AS BIGINT)
               AS covered_days,
             MAX(island_end - island_start) AS longest_island_days
      FROM islands GROUP BY o_custkey
    """,
    "q146_hourly_entropy" -> """
      WITH hist AS (
        SELECT event_type, EXTRACT(hour FROM ts) AS hod,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
      ), p AS (
        SELECT event_type, n,
               CAST(n AS DOUBLE) /
                 CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
                 AS p
        FROM hist
      )
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_events,
             COUNT(*) AS n_active_hours,
             ROUND(-SUM(p * ln(p)), 6) AS entropy_nats,
             ROUND(-SUM(p * ln(p)) / ln(24.0), 6) AS evenness
      FROM p GROUP BY event_type ORDER BY event_type
    """,
    "q147_triangle_count" -> """
      WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      ), edges AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
      ), tri AS (
        SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        FROM edges e1
        JOIN edges e2 ON e1.p2 = e2.p1
        JOIN edges e3 ON e1.p1 = e3.p1 AND e2.p2 = e3.p2
      ), per_part AS (
        SELECT part, COUNT(*) AS n_triangles FROM (
          SELECT a AS part FROM tri UNION ALL
          SELECT b FROM tri UNION ALL
          SELECT c FROM tri
        ) GROUP BY part
      ), deg AS (
        SELECT part, COUNT(*) AS degree FROM (
          SELECT p1 AS part FROM edges UNION ALL
          SELECT p2 FROM edges
        ) GROUP BY part
      )
      SELECT t.part, t.n_triangles, d.degree
      FROM per_part t JOIN deg d ON t.part = d.part
      ORDER BY n_triangles DESC, degree DESC, t.part ASC LIMIT 25
    """,
    "q148_fk_integrity" -> """
      SELECT fk, CAST(SUM(n) AS BIGINT) AS n_child,
             CAST(SUM(CASE WHEN hit IS NULL THEN n ELSE 0 END) AS BIGINT)
               AS n_orphan_rows,
             CAST(SUM(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_orphan_keys
      FROM (
        SELECT 'customer.c_nationkey->nation' AS fk, k, n, hit FROM
          (SELECT CAST(c_nationkey AS BIGINT) AS k, COUNT(*) AS n
           FROM customer GROUP BY 1) c
          LEFT JOIN (SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS k,
                     1 AS hit FROM nation) p USING (k)
        UNION ALL
        SELECT 'events.user_id->customer', k, n, hit FROM
          (SELECT CAST(user_id AS BIGINT) AS k, COUNT(*) AS n
           FROM events GROUP BY 1) c
          LEFT JOIN (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS k,
                     1 AS hit FROM customer) p USING (k)
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders', k, n, hit FROM
          (SELECT CAST(l_orderkey AS BIGINT) AS k, COUNT(*) AS n
           FROM lineitem GROUP BY 1) c
          LEFT JOIN (SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS k,
                     1 AS hit FROM orders) p USING (k)
        UNION ALL
        SELECT 'lineitem.l_partkey->part', k, n, hit FROM
          (SELECT CAST(l_partkey AS BIGINT) AS k, COUNT(*) AS n
           FROM lineitem GROUP BY 1) c
          LEFT JOIN (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS k,
                     1 AS hit FROM part) p USING (k)
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier', k, n, hit FROM
          (SELECT CAST(l_suppkey AS BIGINT) AS k, COUNT(*) AS n
           FROM lineitem GROUP BY 1) c
          LEFT JOIN (SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS k,
                     1 AS hit FROM supplier) p USING (k)
        UNION ALL
        SELECT 'nation.n_regionkey->region', k, n, hit FROM
          (SELECT CAST(n_regionkey AS BIGINT) AS k, COUNT(*) AS n
           FROM nation GROUP BY 1) c
          LEFT JOIN (SELECT DISTINCT CAST(r_regionkey AS BIGINT) AS k,
                     1 AS hit FROM region) p USING (k)
        UNION ALL
        SELECT 'orders.o_custkey->customer', k, n, hit FROM
          (SELECT CAST(o_custkey AS BIGINT) AS k, COUNT(*) AS n
           FROM orders GROUP BY 1) c
          LEFT JOIN (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS k,
                     1 AS hit FROM customer) p USING (k)
        UNION ALL
        SELECT 'supplier.s_nationkey->nation', k, n, hit FROM
          (SELECT CAST(s_nationkey AS BIGINT) AS k, COUNT(*) AS n
           FROM supplier GROUP BY 1) c
          LEFT JOIN (SELECT DISTINCT CAST(n_nationkey AS BIGINT) AS k,
                     1 AS hit FROM nation) p USING (k)
      ) GROUP BY fk ORDER BY fk
    """,
    "q149_cusum_changepoint" -> """
      WITH m AS (
        SELECT r_name,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2
      ), w AS (
        SELECT r_name, mon,
               ROW_NUMBER() OVER (PARTITION BY r_name ORDER BY mon) AS i,
               SUM(rev) OVER (PARTITION BY r_name ORDER BY mon
                 ROWS UNBOUNDED PRECEDING) AS run,
               CAST(SUM(rev) OVER (PARTITION BY r_name) AS DOUBLE) AS tot,
               COUNT(*) OVER (PARTITION BY r_name) AS nm
        FROM m
      ), c AS (
        SELECT r_name, mon, nm,
               tot / CAST(nm AS DOUBLE) AS mean,
               CAST(run AS DOUBLE)
                 - CAST(i AS DOUBLE) * (tot / CAST(nm AS DOUBLE)) AS cusum
        FROM w
      ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY r_name
                    ORDER BY ABS(cusum) DESC, mon ASC) AS rk
        FROM c
      )
      SELECT r_name, mon AS cp_month, CAST(nm AS BIGINT) AS n_months,
             ROUND(mean, 2) AS mean_monthly,
             ROUND(cusum, 2) AS cusum_at_cp
      FROM r WHERE rk = 1 ORDER BY r_name
    """,
    "q150_copurchase_recs" -> """
      WITH cp AS (
        SELECT DISTINCT o_custkey, l_partkey
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      ), items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      ), pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_co
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
      ), edges AS (
        SELECT p1 AS src, p2 AS dst, n_co FROM pairs
        UNION ALL
        SELECT p2, p1, n_co FROM pairs
      ), scored AS (
        SELECT s.o_custkey, e.dst,
               CAST(SUM(e.n_co) AS BIGINT) AS score,
               COUNT(*) AS n_paths
        FROM (SELECT * FROM cp WHERE o_custkey % 100 = 7) s
        JOIN edges e ON s.l_partkey = e.src
        GROUP BY 1, 2
      ), unseen AS (
        SELECT sc.* FROM scored sc
        LEFT JOIN cp ON cp.o_custkey = sc.o_custkey
                    AND cp.l_partkey = sc.dst
        WHERE cp.l_partkey IS NULL
      ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY score DESC, n_paths DESC, dst ASC) AS rec_rank
        FROM unseen
      )
      SELECT o_custkey, dst AS rec_partkey, score, n_paths, rec_rank
      FROM r WHERE rec_rank <= 5 ORDER BY o_custkey, rec_rank
    """,
    "q151_unigram_lm" -> """
      WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
      ), vocab AS (
        SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1
      ), tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS t_total FROM vocab
      ), surprise AS (
        SELECT t.doc_id,
               CAST(FLOOR(-ln(CAST(v.cnt AS DOUBLE)
                 / CAST(tot.t_total AS DOUBLE)) * 1e9) AS BIGINT)
                 AS surprise_nn
        FROM toks t JOIN vocab v ON t.token = v.token, tot
      )
      SELECT doc_id, COUNT(*) AS n_tokens,
             ROUND(CAST(CAST(SUM(surprise_nn) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e9, 6)
               AS avg_neg_log_prob
      FROM surprise GROUP BY doc_id ORDER BY doc_id
    """,
    "q152_mix_shift" -> """
      WITH base AS (
        SELECT c_mktsegment,
               EXTRACT(year FROM o_orderdate) AS y, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE EXTRACT(year FROM o_orderdate) IN (1995, 2000)
      ), seg AS (
        SELECT c_mktsegment,
               CAST(SUM(CASE WHEN y = 1995 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_a,
               CAST(SUM(CASE WHEN y = 2000 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_b,
               SUM(CAST(CASE WHEN y = 1995 THEN o_totalprice ELSE 0.0 END
                 AS DECIMAL(18,4))) AS rev_a,
               SUM(CAST(CASE WHEN y = 2000 THEN o_totalprice ELSE 0.0 END
                 AS DECIMAL(18,4))) AS rev_b
        FROM base GROUP BY 1
      ), d AS (
        SELECT c_mktsegment, n_a, n_b,
               CAST(n_a AS DOUBLE)
                 / CAST(SUM(n_a) OVER () AS DOUBLE) AS share_a,
               CAST(n_b AS DOUBLE)
                 / CAST(SUM(n_b) OVER () AS DOUBLE) AS share_b,
               CAST(rev_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS avg_a,
               CAST(rev_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS avg_b
        FROM seg
      )
      SELECT c_mktsegment, n_a, n_b,
             ROUND(share_a, 6) AS share_a,
             ROUND(share_b, 6) AS share_b,
             ROUND(avg_a, 2) AS avg_order_a,
             ROUND(avg_b, 2) AS avg_order_b,
             ROUND(share_a * (avg_b - avg_a), 6) AS value_effect,
             ROUND((share_b - share_a) * avg_b, 6) AS mix_effect,
             ROUND(share_b * avg_b - share_a * avg_a, 6) AS total_effect
      FROM d ORDER BY c_mktsegment
    """,
    "q153_transition_dwell" -> """
      WITH g AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS gap_us
        FROM events
      )
      SELECT prev_type, event_type,
             COUNT(*) AS n_transitions,
             ROUND(CAST(CAST(SUM(gap_us) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e6, 6) AS mean_s,
             ROUND(quantile_cont(gap_us, 0.5) / 1e6, 6) AS median_s,
             ROUND(quantile_cont(gap_us, 0.9) / 1e6, 6) AS p90_s
      FROM g WHERE prev_type IS NOT NULL
      GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q154_decile_gains" -> """
      WITH byc AS (
        SELECT o_custkey,
               SUM(CAST(CASE WHEN EXTRACT(year FROM o_orderdate) <= 1999
                 THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,4)))
                 AS past_rev,
               SUM(CAST(CASE WHEN EXTRACT(year FROM o_orderdate) = 2000
                 THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,4)))
                 AS next_rev
        FROM orders
        WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1995 AND 2000
        GROUP BY 1
        HAVING SUM(CAST(CASE WHEN EXTRACT(year FROM o_orderdate) <= 1999
          THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,4))) > 0
      ), dec AS (
        SELECT *, NTILE(10) OVER (ORDER BY past_rev DESC, o_custkey ASC)
                 AS decile
        FROM byc
      ), pd AS (
        SELECT decile, COUNT(*) AS n_customers,
               SUM(past_rev) AS past_dec, SUM(next_rev) AS next_dec
        FROM dec GROUP BY 1
      ), cum AS (
        SELECT *,
               SUM(next_dec) OVER (ORDER BY decile
                 ROWS UNBOUNDED PRECEDING) AS cum_next,
               SUM(next_dec) OVER () AS tot_next
        FROM pd
      )
      SELECT decile, n_customers,
             ROUND(CAST(past_dec AS DOUBLE), 2) AS past_revenue,
             ROUND(CAST(next_dec AS DOUBLE), 2) AS next_revenue,
             ROUND(CAST(next_dec AS DOUBLE) / CAST(tot_next AS DOUBLE), 6)
               AS capture,
             ROUND(CAST(cum_next AS DOUBLE) / CAST(tot_next AS DOUBLE), 6)
               AS cum_capture,
             ROUND(CAST(cum_next AS DOUBLE) / CAST(tot_next AS DOUBLE)
               / (CAST(decile AS DOUBLE) / 10.0), 6) AS cum_lift
      FROM cum ORDER BY decile
    """,
    "q155_km_retention" -> """
      WITH s AS (
        SELECT user_id, ts, event_id, epoch_us(ts) AS eu,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_eu
        FROM events
      ), marked AS (
        SELECT *, CASE WHEN prev_eu IS NULL
                        OR eu - prev_eu > 1800000000
                  THEN 1 ELSE 0 END AS new_s
        FROM s
      ), g AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                  AS sid
        FROM marked
      ), sess AS (
        SELECT user_id, sid, MIN(eu) AS st, MAX(eu) AS en
        FROM g GROUP BY 1, 2
      ), e AS (
        SELECT MAX(epoch_us(ts)) AS end_us FROM events
      ), life AS (
        SELECT (en - st) // 60000000 AS minute,
               COUNT(*) AS n_leaving,
               CAST(SUM(CASE WHEN en <= end_us - 1800000000
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_died
        FROM sess, e GROUP BY 1
      ), risk AS (
        SELECT *, CAST(SUM(n_leaving) OVER (ORDER BY minute
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS BIGINT) AS n_at_risk
        FROM life
      ), steps AS (
        SELECT *, CAST(FLOOR(ln(1.0 - CAST(n_died AS DOUBLE)
                    / CAST(n_at_risk AS DOUBLE)) * 1e9) AS BIGINT)
                  AS step_nn
        FROM risk WHERE n_died > 0 AND n_died < n_at_risk
      ), c AS (
        SELECT *, CAST(SUM(step_nn) OVER (ORDER BY minute
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_nn
        FROM steps
      )
      SELECT minute, n_at_risk, n_died, n_leaving,
             ROUND(CAST(cum_nn AS DOUBLE) / 1e9, 6) AS log_survival,
             ROUND(exp(CAST(cum_nn AS DOUBLE) / 1e9), 6) AS survival
      FROM c ORDER BY minute
    """,
    "q156_seasonal_index" -> """
      WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders GROUP BY 1
      ), w AS (
        SELECT mon, rev,
               SUM(rev) OVER (ORDER BY mon
                 ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS core,
               lag(rev, 6) OVER (ORDER BY mon) AS lo,
               lead(rev, 6) OVER (ORDER BY mon) AS hi
        FROM m
      ), r AS (
        SELECT mon,
               CAST(FLOOR(CAST(rev AS DOUBLE)
                 / ((CAST(core AS DOUBLE) + CAST(lo + hi AS DOUBLE) / 2.0)
                    / 12.0) * 1e9) AS BIGINT) AS ratio_nn
        FROM w WHERE lo IS NOT NULL AND hi IS NOT NULL
      )
      SELECT EXTRACT(month FROM mon) AS calendar_month,
             COUNT(*) AS n_obs,
             ROUND(CAST(CAST(SUM(ratio_nn) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e9, 6) AS seasonal_index
      FROM r GROUP BY 1 ORDER BY 1
    """,
    // q157 stages supplier into Derby and reads it back over JDBC; the
    // round trip is lossless (BIGINT/INTEGER/DOUBLE exact), so the
    // oracle is simply the same aggregate on the parquet table.
    "q157_jdbc_source" -> """
      SELECT s_nationkey, COUNT(*) AS n_suppliers,
             ROUND(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_bal
      FROM supplier WHERE s_acctbal > 0
      GROUP BY 1 ORDER BY 1
    """,
    "q158_dup_passage" -> """
      WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents
      ), g AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, len(toks) - 3),
                 i -> md5(array_to_string(toks[i:i+4], ' '))))) AS gh
        FROM t WHERE len(toks) >= 5
      ), c AS (
        SELECT gh, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1
      )
      SELECT g.doc_id, COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_grams,
             ROUND(CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS dup_coverage
      FROM g JOIN c USING (gh)
      GROUP BY 1 ORDER BY 1
    """,
    "q159_mix_planner" -> """
      WITH per AS (
        SELECT source,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
                 AS BIGINT) AS tokens,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1
      ), w AS (
        SELECT *, CAST(FLOOR(sqrt(CAST(tokens AS DOUBLE)) * 1e6) AS BIGINT)
                 AS w
        FROM per
      ), t AS (
        SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(w) AS BIGINT) AS total_w
        FROM w
      ), a AS (
        SELECT source, tokens, n_docs, w, total_w,
               ((total_tokens // 2) * w) // total_w AS alloc_raw
        FROM w, t
      )
      SELECT source, tokens, n_docs,
             ROUND(CAST(w AS DOUBLE) / CAST(total_w AS DOUBLE), 6)
               AS weight_share,
             CAST(LEAST(alloc_raw, tokens * 4) AS BIGINT) AS alloc_tokens,
             ROUND(CAST(LEAST(alloc_raw, tokens * 4) AS DOUBLE)
               / CAST(tokens AS DOUBLE), 4) AS epochs,
             alloc_raw > tokens * 4 AS capped
      FROM a ORDER BY source
    """,
    "q160_source_dedup_health" -> """
      WITH fp AS (
        SELECT source, doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
      ), sp AS (
        SELECT fp, COUNT(DISTINCT source) AS n_sources FROM fp GROUP BY 1
      )
      SELECT source, COUNT(*) AS n_docs,
             COUNT(DISTINCT f.fp) AS n_fingerprints,
             ROUND(1.0 - CAST(COUNT(DISTINCT f.fp) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate,
             CAST(SUM(CASE WHEN n_sources >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cross_source_docs
      FROM fp f JOIN sp USING (fp)
      GROUP BY 1 ORDER BY 1
    """,
    "q161_leakage_safe_split" -> """
      WITH fp AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
      ), g AS (
        SELECT fp, MIN(doc_id) AS rep FROM fp GROUP BY 1
      ), gs AS (
        SELECT fp,
               CASE WHEN CAST(concat('0x', substr(
                      md5(concat('split_', CAST(rep AS VARCHAR))), 1, 7))
                      AS BIGINT) % 1000 < 100
                    THEN 'val' ELSE 'train' END AS split
        FROM g
      ), tagged AS (
        SELECT f.doc_id, f.fp, split FROM fp f JOIN gs USING (fp)
      ), v AS (
        SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS violations
        FROM (SELECT fp, COUNT(DISTINCT split) AS ns
              FROM tagged GROUP BY 1)
      )
      SELECT split, COUNT(*) AS n_docs,
             COUNT(DISTINCT fp) AS n_fingerprints, violations
      FROM tagged, v GROUP BY 1, violations ORDER BY 1
    """,
    // q162's partitioned layout + runtime pruning change the plan, not
    // the answer: the oracle is the same year-dim join computed flat.
    "q162_dpp_join" -> """
      WITH dim AS (SELECT DISTINCT year(o_orderdate) AS y FROM orders),
           probe AS (SELECT y FROM dim WHERE y IN (1995, 1996))
      SELECT o_orderpriority, COUNT(*) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
               2) AS revenue
      FROM orders o JOIN probe t ON year(o.o_orderdate) = t.y
      GROUP BY 1 ORDER BY 1
    """,
    // identical recursion runs natively in DuckDB (// is integer div)
    "q163_recursive_hierarchy" -> """
      WITH RECURSIVE walk AS (
        SELECT c_custkey AS k, c_custkey AS cur, 0 AS depth FROM customer
        UNION ALL
        SELECT k, cur // 10, depth + 1 FROM walk WHERE cur >= 10
      )
      SELECT cur AS root, COUNT(*) AS n_customers,
             MAX(depth) AS max_depth,
             CAST(SUM(k) AS BIGINT) AS key_sum
      FROM walk WHERE cur < 10
      GROUP BY cur ORDER BY root
    """,
    "q173_k_anonymity" -> """
      WITH cls AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000.0) AS INTEGER) AS bal_band,
               COUNT(*) AS k,
               COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                   ELSE 'pos' END) AS l_div
        FROM customer GROUP BY 1, 2, 3
      ), total AS (SELECT COUNT(*) AS n_total FROM customer)
      SELECT k, COUNT(*) AS n_classes,
             CAST(SUM(k) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(k) AS BIGINT) / CAST(n_total AS DOUBLE), 6)
               AS row_share,
             CAST(SUM(CASE WHEN l_div = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_homogeneous
      FROM cls, total GROUP BY k, n_total ORDER BY k
    """,
    "q174_deletion_audit" -> """
      WITH del AS (
        SELECT c_custkey AS del_key FROM customer
        WHERE substring(md5(concat('forget_',
                CAST(c_custkey AS VARCHAR))), 1, 2) < '05'
      ), aff AS (
        SELECT o_orderkey, del_key FROM orders JOIN del
          ON o_custkey = del_key
      ), affk AS (SELECT DISTINCT o_orderkey FROM aff),
      resid AS (
        SELECT
          (SELECT COUNT(*) FROM
            (SELECT o_custkey FROM orders
             WHERE o_custkey NOT IN (SELECT del_key FROM del)) t
           WHERE o_custkey IN (SELECT del_key FROM del))
          + (SELECT COUNT(*) FROM
              (SELECT l_orderkey FROM lineitem
               WHERE l_orderkey NOT IN (SELECT o_orderkey FROM affk)) t
             WHERE l_orderkey IN (SELECT o_orderkey FROM affk))
          AS residual_rows
      ), stats AS (
        SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
               COUNT(*) AS n_deleted_keys FROM del
        UNION ALL
        SELECT 'orders', COUNT(*), COUNT(DISTINCT del_key) FROM aff
        UNION ALL
        SELECT 'lineitem',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM affk)),
               (SELECT COUNT(DISTINCT del_key) FROM aff)
      )
      SELECT tbl AS "table", n_rows, n_deleted_keys, residual_rows
      FROM stats, resid ORDER BY tbl
    """
  ).map { case (k, v) => k -> v.trim }

  // q164–q167: the retail golden path. The inputs are NOT the sf
  // tables — graft.operators.RetailQueries stages the Spark-parsed seed
  // dims + the synthesized purchase fact as parquet during Verify, and
  // these oracles read those exact files, so both engines consume
  // byte-identical rows. ONE constant owns the path — the SQL is
  // interpolated at dump time, so the oracle always points wherever
  // RetailQueries actually staged.
  private val retailStage = graft.operators.RetailQueries.StageDir
  private def rp(table: String): String =
    s"read_parquet('$retailStage/$table/*.parquet')"
  // customer ⟕ zipcode — the reference's enriched customer dim; the 21
  // duplicated short_zipcodes fan out here exactly as in
  // RetailPipeline.customerWithZipcode.
  private val retailCz = s"""
      cz AS (
        SELECT c.customer_id, c.sex, c.age_group, c.residence,
               z.zipcode, z.province_city, z.province_city_eng,
               z.city_county, z.city_county_eng, z.eup_myeon,
               z.eup_myeon_eng, z.road_nm, z.road_nm_eng
        FROM ${rp("customer")} c
        LEFT JOIN ${rp("zipcode")} z ON c.residence = z.short_zipcode
      )"""
  // purchase ⟕ products_info (4-col composite key) ⟕ cz — T1 silver.
  private val retailSilver = s"""
      silver AS (
        SELECT p.affiliate, p.purchase_year, p.purchase_month,
               p.purchase_date, p.purchase_time, p.amount,
               p.division_cd, pi.main_category_desc, pi.sub_category_desc,
               cz.age_group, cz.province_city, cz.city_county
        FROM ${rp("purchase")} p
        LEFT JOIN ${rp("products_info")} pi
          ON p.affiliate = pi.affiliate
         AND p.division_cd = pi.division_cd
         AND p.main_category_cd = pi.main_category_cd
         AND p.sub_category_cd = pi.sub_category_cd
        LEFT JOIN cz ON p.customer_id = cz.customer_id
      )"""

  val retail: Map[String, String] = Map(
    "q164_retail_datetime" -> s"""
      WITH $retailCz, $retailSilver
      SELECT affiliate, purchase_year, purchase_month,
             substring(purchase_date, 7, 2) AS purchase_day,
             dayname(strptime(purchase_date, '%Y%m%d')) AS day_of_week,
             purchase_time,
             ROUND(CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_purchase_amount,
             COUNT(amount) AS count_of_purchase
      FROM silver
      GROUP BY 1, 2, 3, 4, 5, 6
      ORDER BY 1, 2, 3, 4, 6
    """,
    "q165_retail_ageproducts" -> s"""
      WITH $retailCz, $retailSilver
      SELECT affiliate, purchase_year, purchase_month, age_group,
             division_cd, main_category_desc, sub_category_desc,
             ROUND(CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_purchase_amount,
             COUNT(amount) AS count_of_purchase
      FROM silver
      GROUP BY 1, 2, 3, 4, 5, 6, 7
      ORDER BY 1, 2, 3, 4, 5, 6, 7
    """,
    "q166_retail_residence" -> s"""
      WITH $retailCz, $retailSilver
      SELECT affiliate, purchase_year, purchase_month,
             province_city, city_county,
             ROUND(CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_purchase_amount,
             COUNT(amount) AS count_of_purchase
      FROM silver
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY 1, 2, 3, total_purchase_amount DESC, count_of_purchase DESC
    """,
    // aggregate the RAW fact, THEN join the enriched dim — the fan-out
    // duplicates per-customer aggregate rows, exactly as the reference.
    "q167_retail_customer" -> s"""
      WITH $retailCz, per AS (
        SELECT customer_id, affiliate, purchase_year, purchase_month,
               ROUND(CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE), 2)
                 AS total_purchase_amount,
               COUNT(amount) AS count_of_purchase
        FROM ${rp("purchase")}
        GROUP BY 1, 2, 3, 4
      )
      SELECT per.customer_id, per.affiliate, per.purchase_year,
             per.purchase_month, per.total_purchase_amount,
             per.count_of_purchase,
             cz.sex, cz.age_group, cz.residence, cz.zipcode,
             cz.province_city, cz.province_city_eng, cz.city_county,
             cz.city_county_eng, cz.eup_myeon, cz.eup_myeon_eng,
             cz.road_nm, cz.road_nm_eng
      FROM per LEFT JOIN cz ON per.customer_id = cz.customer_id
      ORDER BY 1, 2, 3, 4
    """
  ).map { case (k, v) => k -> v.trim }

  val all: Map[String, String] =
    core ++ text ++ kpi ++ round2 ++ corpus ++ round3b ++ stats ++ scale ++
      retail
}
