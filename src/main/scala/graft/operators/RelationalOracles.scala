package graft.operators

/** DuckDB-dialect oracle SQL for every query in [[Relational.all]].
  * The driver registers each parquet table under its bare name and
  * hash-compares our parquet output with these results, sorting columns by
  * name — so aliases here match the Spark side exactly, and every query
  * carries a total ORDER BY.
  *
  * NOTE on `events.ts`: the parquet encoding has varied across testdata
  * generations (TIMESTAMP(NANOS) vs plain timestamp[us]). DuckDB coerces
  * either to µs TIMESTAMP natively, and `Tables.events` normalizes every
  * supported encoding to µs-exact session-zone TIMESTAMP (UTC sessions),
  * so epoch_us(ts) here agrees with unix_micros on the Spark side for all
  * of them.
  */
object RelationalOracles {
  private val D2 = "DECIMAL(18,2)"
  private val D4 = "DECIMAL(18,4)"
  private val discPrice =
    s"CAST(CAST(l_extendedprice AS $D2) * (CAST(1 AS $D2) - CAST(l_discount AS $D2)) AS $D4)"

  private val base: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(CAST(sum(CAST(l_quantity AS $D2)) AS $D2) AS DOUBLE) AS sum_qty,
         |  CAST(CAST(sum(CAST(l_extendedprice AS $D2)) AS $D2) AS DOUBLE) AS sum_base_price,
         |  CAST(CAST(sum($discPrice) AS $D4) AS DOUBLE) AS sum_disc_price,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber, CAST(CAST(l_extendedprice AS $D2) AS DOUBLE) AS price, l_returnflag
         |FROM lineitem
         |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 10
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_join_agg" ->
      s"""SELECT n_name, CAST(CAST(sum($discPrice) AS $D4) AS DOUBLE) AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q4_sort_limit" ->
      s"""SELECT o_orderkey, CAST(CAST(o_totalprice AS $D2) AS DOUBLE) AS totalprice
         |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q5_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "q6_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q7_anti_join" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q8_set_ops" ->
      """SELECT 'intersect' AS op, n FROM
        |  ((SELECT c_nationkey AS n FROM customer) INTERSECT (SELECT s_nationkey AS n FROM supplier)) t1
        |UNION ALL
        |SELECT 'except' AS op, n FROM
        |  ((SELECT c_nationkey AS n FROM customer) EXCEPT (SELECT s_nationkey AS n FROM supplier)) t2
        |ORDER BY op, n""".stripMargin,

    "q9_running_sum" ->
      s"""SELECT user_id, event_id,
         |  CAST(CAST(sum(CAST(value AS $D2)) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS $D2) AS DOUBLE) AS running_sum
         |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q10_rank_topn" ->
      s"""SELECT o_custkey, rn, o_orderkey, totalprice FROM (
         |  SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS $D2) AS DOUBLE) AS totalprice,
         |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
         |  FROM orders) t
         |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q11_window_global" ->
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS w_start,
         |  count(*) AS n_events, CAST(CAST(sum(CAST(value AS $D2)) AS $D2) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin,

    "q12_window_keyed" ->
      s"""SELECT epoch_us(date_trunc('hour', ts)) AS w_start,
         |  epoch_us(date_trunc('hour', ts)) + 3600000000 AS w_end,
         |  event_type, count(*) AS n_events, CAST(CAST(sum(CAST(value AS $D2)) AS $D2) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin,

    "q13_count_window" ->
      s"""SELECT user_id, win_id, count(*) AS n, CAST(CAST(sum(v) AS $D2) AS DOUBLE) AS sum_value FROM (
         |  SELECT user_id, CAST(value AS $D2) AS v,
         |    (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 2 AS win_id
         |  FROM events) t
         |GROUP BY user_id, win_id HAVING count(*) = 2
         |ORDER BY user_id, win_id""".stripMargin,

    "q14_mapwithstate_ttl" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS us, ts, CAST(value AS $D2) AS v,
         |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |              > ${Relational.TtlMicros}
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |sess AS (
         |  SELECT event_id, user_id, us, v,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
         |  FROM e)
         |SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id,
         |  CAST(CAST(sum(v) OVER (PARTITION BY user_id, session_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS $D2) AS DOUBLE) AS running_value
         |FROM sess ORDER BY user_id, event_id""".stripMargin,

    "q15_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  CAST(CAST(sum(CAST(l_quantity AS $D2)) AS $D2) AS DOUBLE) AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,

    "q16_scalar_funcs" ->
      s"""SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_name, 1, 8) AS name8,
         |  CAST(length(p_name) AS BIGINT) AS name_len,
         |  concat_ws('|', p_brand, p_type) AS brand_type,
         |  CAST(p_size % 7 AS BIGINT) AS size_mod,
         |  CASE WHEN p_retailprice > 1500 THEN 'hi' ELSE 'lo' END AS price_band,
         |  CAST(CAST(p_retailprice AS $D2) AS DOUBLE) AS retail
         |FROM part ORDER BY p_partkey""".stripMargin,

    "q17_conditional_agg" ->
      s"""SELECT user_id,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         |  CAST(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS $D2) ELSE CAST(0 AS $D2) END) AS $D2) AS DOUBLE) AS purchase_value
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q18_date_agg" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
         |  count(*) AS n_orders, CAST(CAST(sum(CAST(o_totalprice AS $D2)) AS $D2) AS DOUBLE) AS sum_price
         |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,

    "q19_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS cus FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.us, c.cus AS last_click_us
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.us > c.cus
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q20_grouping_sets" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  CAST(CAST(sum(CAST(l_quantity AS $D2)) AS $D2) AS DOUBLE) AS sum_qty, count(*) AS n
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
         |ORDER BY returnflag, linestatus""".stripMargin,

    "q21_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, CAST(value AS DECIMAL(18,2)) AS v,
        |    -- >= not >: Spark session windows are [ts, ts+gap), so a gap of
        |    -- exactly the duration starts a new session
        |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s AS (
        |  SELECT user_id, us, v,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM e)
        |SELECT user_id, min(us) AS session_start_us, count(*) AS n_events,
        |  CAST(CAST(sum(v) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q22_sliding_window" ->
      s"""WITH e AS (SELECT epoch_us(ts) AS us, CAST(value AS $D2) AS v FROM events),
         |w AS (
         |  -- 1h window / 15min slide: each event is in exactly 4
         |  -- epoch-aligned windows, starts (us//slide - i)*slide, i=0..3
         |  SELECT ((us // 900000000) - i) * 900000000 AS w_start, v
         |  FROM e, range(4) t(i))
         |SELECT w_start, count(*) AS n_events, CAST(CAST(sum(v) AS $D2) AS DOUBLE) AS sum_value
         |FROM w GROUP BY w_start ORDER BY w_start""".stripMargin,

    "q23_interval_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS c_user, epoch_us(ts) AS c_us FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, count(c.c_us) AS n_clicks_1h
        |FROM p LEFT JOIN c
        |  ON p.user_id = c.c_user AND c.c_us < p.us AND c.c_us >= p.us - 3600000000
        |GROUP BY p.event_id, p.user_id, p.us
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q24_ordered_label" ->
      """WITH r AS (
        |  SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT event_type,
        |  string_agg(CAST(event_id AS VARCHAR), '-' ORDER BY rn) AS label,
        |  count(*) AS n
        |FROM r WHERE rn <= 3 GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q25_scalar_subquery" ->
      s"""SELECT c_custkey, c_mktsegment,
         |  CAST(CAST((SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS $D2) AS DOUBLE) AS max_order
         |FROM customer ORDER BY c_custkey""".stripMargin,

    "q26_cube" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  CAST(CAST(sum(CAST(l_quantity AS $D2)) AS $D2) AS DOUBLE) AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,

    "q27_unpivot" ->
      s"""SELECT p_partkey, measure, CAST(CAST(value AS $D2) AS DOUBLE) AS value FROM (
         |  SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
         |  UNION ALL
         |  SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value FROM part) u
         |ORDER BY p_partkey, measure""".stripMargin,

    "q28_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q38_percentile_interp" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.37), 6) AS p37_qty,
        |  round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.63), 6) AS p63_qty,
        |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.37), 6) AS p37_price,
        |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.63), 6) AS p63_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q39_pivot" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
         |  CAST(CAST(sum(CASE WHEN event_type = 'click' THEN CAST(value AS $D2) END) AS $D2) AS DOUBLE) AS click,
         |  CAST(CAST(sum(CASE WHEN event_type = 'error' THEN CAST(value AS $D2) END) AS $D2) AS DOUBLE) AS error,
         |  CAST(CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS $D2) END) AS $D2) AS DOUBLE) AS purchase,
         |  CAST(CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(value AS $D2) END) AS $D2) AS DOUBLE) AS signup,
         |  CAST(CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS $D2) END) AS $D2) AS DOUBLE) AS "view"
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q29_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  ntile(4) OVER w AS quartile,
        |  dense_rank() OVER w AS drank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q30_full_outer" ->
      """WITH big AS (
        |  SELECT o_custkey, count(*) AS n_big_orders
        |  FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey),
        |bld AS (
        |  SELECT c_custkey, CAST(1 AS BIGINT) AS in_building
        |  FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT coalesce(o_custkey, c_custkey) AS custkey,
        |  coalesce(n_big_orders, 0) AS n_big_orders,
        |  coalesce(in_building, 0) AS in_building
        |FROM big FULL OUTER JOIN bld ON o_custkey = c_custkey
        |ORDER BY custkey""".stripMargin,

    "q31_count_distinct" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(DISTINCT month(o_orderdate)) AS n_months,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q32_asof_native" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS view_us FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.us, v.view_us
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.us > v.view_us
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    // the PLAIN join: proves the Spark side's salting is semantically
    // invisible (salt only routes rows across reducers)
    "q33_salted_join" ->
      s"""SELECT c_mktsegment,
         |  CAST(CAST(sum(CAST(o_totalprice AS $D2)) AS $D2) AS DOUBLE) AS sum_price,
         |  count(*) AS n_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q34_asof_forward" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS view_us FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.us, v.view_us
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.us < v.view_us
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    "q35_asof_left" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS view_us FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.us, v.view_us
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.us > v.view_us
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    // tolerance: the as-of match per left row is unique, so bounding it
    // to 1h == ASOF LEFT JOIN with the matched time nulled out when it
    // misses the tolerance
    "q36_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS view_us FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.us,
        |  CASE WHEN p.us - v.view_us <= 3600000000 THEN v.view_us END AS view_us
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.us > v.view_us
        |ORDER BY p.user_id, p.event_id""".stripMargin,

    // multi-key: equality on (user_id, event_type) before the time
    // inequality; only the matched TIME is selected so same-timestamp
    // ties hash identically whichever tied row each engine picked
    "q37_asof_multikey" ->
      """WITH l AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
        |r AS (SELECT user_id AS r_user, event_type AS r_type, epoch_us(ts) AS prev_us FROM events)
        |SELECT l.event_id, l.user_id, l.event_type, l.us, r.prev_us
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.r_user AND l.event_type = r.r_type AND l.us > r.prev_us
        |ORDER BY l.user_id, l.event_id""".stripMargin,

    // CDC merge: the change set is derived from the base so both engines
    // construct it identically; change keys are unique by construction
    // (deletes exclude update keys), delete rows drop, change side wins
    "q42_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders),
        |mk AS (SELECT ((max(o_orderkey) // 1000000000) + 1) * 1000000000 AS off
        |       FROM base),
        |changes AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |         CAST(price + 100 AS DECIMAL(18,2)) AS price, 'upsert' AS op
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + off, o_custkey, 'N', price, 'upsert'
        |  FROM base, mk WHERE o_orderkey % 17 = 0
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |         CAST(NULL AS DECIMAL(18,2)), 'delete'
        |  FROM base WHERE o_orderkey % 13 = 0 AND o_orderkey % 10 <> 0)
        |SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
        |       coalesce(c.o_custkey, b.o_custkey) AS o_custkey,
        |       coalesce(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
        |       CAST(coalesce(c.price, b.price) AS DOUBLE) AS price
        |FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
        |WHERE c.op IS NULL OR c.op <> 'delete'
        |ORDER BY o_orderkey""".stripMargin,

    // SCD2: lead() closes each version; strftime mirrors Spark's
    // date_format at the ISO gate boundary
    "q44_scd2" ->
      """SELECT o_custkey,
        |  o_orderkey AS version_key,
        |  o_orderstatus AS status,
        |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
        |  coalesce(
        |    strftime(lead(o_orderdate) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |      '%Y-%m-%d'),
        |    '9999-12-31') AS valid_to,
        |  CAST(CASE WHEN lead(o_orderdate) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM orders
        |ORDER BY o_custkey, valid_from, version_key""".stripMargin,

    // TPC-H Q5 shape: local-supplier regional revenue; the date
    // predicate mirrors the Spark datediff bounds ([1996-01-01,
    // 1997-01-01) on the timestamp axis)
    "q46_regional_revenue" ->
      s"""SELECT n_name,
         |  CAST(CAST(sum($discPrice) AS $D4) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    // TPC-H Q18 shape: large-volume customers — the HAVING-filtered
    // per-order aggregate feeds the join; the filter compares the same
    // D2→DOUBLE value Spark filters on, and total_qty is reused instead
    // of re-joining lineitem (identical result, one fact scan)
    "q47_top_qty_customers" ->
      s"""WITH big AS (
         |  SELECT l_orderkey,
         |    CAST(CAST(sum(CAST(l_quantity AS $D2)) AS $D2) AS DOUBLE) AS total_qty
         |  FROM lineitem GROUP BY 1)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
         |  CAST(CAST(o_totalprice AS $D2) AS DOUBLE) AS totalprice, total_qty
         |FROM big
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE total_qty > 300
         |ORDER BY totalprice DESC, o_orderdate ASC, o_orderkey ASC
         |LIMIT 100""".stripMargin,

    // TPC-H Q17 shape (all brands): per-partkey aggregate joined back
    // to the fact; the 0.2·avg threshold is the integer-exact
    // cross-multiplied form, no float division on either engine
    "q48_small_qty_revenue" ->
      s"""WITH ps AS (
         |  SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
         |         count(*) AS n_li
         |  FROM lineitem GROUP BY 1)
         |SELECT p_brand,
         |  CAST(CAST(sum(CAST(l_extendedprice AS $D2)) AS $D2) AS DOUBLE) AS small_qty_revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN ps USING (l_partkey)
         |JOIN part ON p_partkey = l_partkey
         |WHERE CAST(l_quantity AS BIGINT) * 5 * n_li < sum_qty
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // ROLLUP: detail + per-year subtotal + grand total in one pass;
    // GROUPING() disambiguates subtotal NULLs, first argument most
    // significant in both engines; NULLS FIRST explicit (DuckDB
    // defaults NULLS LAST on ASC, Spark NULLS FIRST)
    "q49_rollup" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderpriority,
         |  CAST(CAST(sum(CAST(o_totalprice AS $D2)) AS $D2) AS DOUBLE) AS revenue,
         |  count(*) AS n_orders,
         |  CAST(GROUPING(year(o_orderdate), o_orderpriority) AS BIGINT) AS gid
         |FROM orders
         |GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
         |ORDER BY gid, o_year NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    // funnel: chained conditional mins (first view, first click after
    // it, first purchase after that), per-cohort stage counts; strict >
    // on µs-exact timestamps keeps stage boundaries deterministic
    "q50_funnel" ->
      """WITH tv AS (SELECT user_id, min(ts) AS tv FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |tc AS (SELECT e.user_id, min(e.ts) AS tc
        |       FROM events e JOIN tv USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > tv.tv GROUP BY 1),
        |tp AS (SELECT e.user_id, min(e.ts) AS tp
        |       FROM events e JOIN tc USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > tc.tc GROUP BY 1)
        |SELECT CAST(u.user_id % 10 AS BIGINT) AS cohort,
        |  count(*) AS n_users,
        |  count(tv.tv) AS n_viewed,
        |  count(tc.tc) AS n_clicked_after_view,
        |  count(tp.tp) AS n_purchased_after_click
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN tv USING (user_id)
        |LEFT JOIN tc USING (user_id)
        |LEFT JOIN tp USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Q21 shape: the oracle deliberately keeps the textbook correlated
    // EXISTS / NOT EXISTS formulation (both subqueries correlate to the
    // same fact) — the Spark side runs the rewritten per-order-stats
    // window plan, so the hash match proves the rewrite's equivalence
    "q51_exclusive_fault" ->
      """WITH f AS (SELECT DISTINCT l_orderkey, l_suppkey
        |           FROM lineitem WHERE l_returnflag = 'R')
        |SELECT s.s_name, count(*) AS n_orders
        |FROM f JOIN supplier s ON f.l_suppkey = s.s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = f.l_orderkey
        |                AND l2.l_suppkey <> f.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = f.l_orderkey
        |                    AND l3.l_suppkey <> f.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY 1 ORDER BY n_orders DESC, s_name ASC LIMIT 20""".stripMargin,

    // triangles: identical hash-sampled (DOULION) subgraph, counted via
    // the id-ordered 3-way edge join (each triangle a<b<c once) — a
    // different once-per-triangle scheme than the Spark side's degree
    // orientation, so the hash match proves the orientation machinery,
    // not just the arithmetic
    "q55_triangles" -> {
      import graft.operators.Relational.TriangleSampleMod
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ae AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        |      FROM d a JOIN d b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |e AS (SELECT pa, pb FROM ae
        |      WHERE CAST('0x' || substring(md5(
        |          CAST(pa AS VARCHAR) || '|' || CAST(pb AS VARCHAR)), 1, 8)
        |        AS BIGINT) % """.stripMargin + TriangleSampleMod + """ = 0),
        |deg AS (SELECT v, count(*) AS dg FROM (
        |        SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e)
        |        GROUP BY v)
        |SELECT (SELECT count(*) FROM ae) AS n_edges,
        |  (SELECT count(*) FROM e) AS n_edges_sampled,
        |  CAST((SELECT sum((dg * (dg - 1)) // 2) FROM deg) AS BIGINT)
        |    AS n_wedges_sampled,
        |  (SELECT count(*) FROM e e1
        |   JOIN e e2 ON e1.pb = e2.pa
        |   JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
        |    AS n_triangles_sampled""".stripMargin
    },

    // co-occurrence: the oracle keeps the textbook fact self-join on
    // orderkey; the Spark side aggregates baskets first and generates
    // pairs map-side — the hash proves the rewrite
    "q54_copurchase" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_orders
        |FROM d a JOIN d b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, pa ASC, pb ASC LIMIT 20""".stripMargin,

    // transition matrix: identical lag window with the (ts, event_id)
    // tiebreak, '_start' for first events
    "q58_transitions" ->
      """WITH t AS (SELECT
        |    COALESCE(lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id), '_start')
        |      AS prev_type,
        |    event_type AS cur_type
        |  FROM events)
        |SELECT prev_type, cur_type, count(*) AS n
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // median/MAD anomaly rule on exact integer cents; quantile_cont is
    // the interpolation twin of the Spark percentile fold
    "q59_anomaly_mad" ->
      """WITH v AS (SELECT event_type,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS vi
        |  FROM events),
        |m AS (SELECT event_type, quantile_cont(vi, 0.5) AS med
        |      FROM v GROUP BY 1),
        |d AS (SELECT v.event_type, abs(v.vi - m.med) AS adev, m.med
        |      FROM v JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |       FROM d GROUP BY 1)
        |SELECT d.event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN d.adev > md.mad * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  round(any_value(d.med) / 100.0, 6) AS median_value,
        |  round(any_value(md.mad) / 100.0, 6) AS mad_value
        |FROM d JOIN md USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // gaps and islands: day − row_number is constant within an island;
    // integer epoch days on both engines
    // frequent triples: the textbook THREE-way self-join the Spark
    // side's bounded comprehension replaces — hash equality proves the
    // rewrite
    "q68_frequent_triples" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS pa, b.l_partkey AS pb, c.l_partkey AS pc,
        |  count(*) AS n_orders
        |FROM d a
        |JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |JOIN d c ON b.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
        |GROUP BY 1, 2, 3
        |ORDER BY n_orders DESC, pa ASC, pb ASC, pc ASC LIMIT 20""".stripMargin,

    // top journey paths: the same (ts, event_id) per-user total order
    // as q58; both leads over one window, exact distinct-user reach
    "q69_path_topk" ->
      """WITH p AS (SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT e1, e2, e3, count(*) AS n_paths,
        |  count(DISTINCT user_id) AS n_users
        |FROM p WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, e1 ASC, e2 ASC, e3 ASC LIMIT 20""".stripMargin,

    // k-core: replay the FIXED peeling rounds as a materialized CTE
    // chain (the q61 iterative-replay recipe; rounds past the fixpoint
    // are no-ops, so fixed-round equality needs no convergence proof)
    "q70_kcore" -> {
      import graft.operators.Relational.{KcoreK, KcoreRounds}
      val rounds = (0 until KcoreRounds).map { i =>
        s"""k$i AS MATERIALIZED (SELECT v FROM (
           |    SELECT v, count(*) AS d FROM (
           |      SELECT pa AS v FROM e$i UNION ALL SELECT pb AS v FROM e$i)
           |    GROUP BY v) WHERE d >= $KcoreK),
           |e${i + 1} AS MATERIALIZED (SELECT pa, pb FROM e$i
           |  WHERE pa IN (SELECT v FROM k$i) AND pb IN (SELECT v FROM k$i))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH s0 AS MATERIALIZED (
         |  SELECT l_partkey, lead(l_partkey) OVER (
         |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS pb0
         |  FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT LEAST(l_partkey, pb0) AS pa,
         |    GREATEST(l_partkey, pb0) AS pb
         |  FROM s0 WHERE pb0 IS NOT NULL AND l_partkey <> pb0),
         |$rounds,
         |cd AS (SELECT v, count(*) AS core_deg FROM (
         |    SELECT pa AS v FROM e$KcoreRounds
         |    UNION ALL SELECT pb AS v FROM e$KcoreRounds) GROUP BY v),
         |st AS (SELECT count(*) AS n_core_nodes,
         |    CAST(COALESCE(sum(core_deg), 0) AS BIGINT) AS sum_core_deg
         |  FROM cd),
         |top AS (SELECT v, core_deg FROM cd
         |  ORDER BY core_deg DESC, v ASC LIMIT 50)
         |SELECT top.v AS part, top.core_deg, st.n_core_nodes,
         |  st.sum_core_deg
         |FROM top, st
         |ORDER BY core_deg DESC, part ASC""".stripMargin
    },

    // stickiness: q64's WAU CTEs + a DAU aggregate on the same distinct
    // base; ratio as exact integer ppm, zero-WAU days report 0
    "q72_stickiness" -> {
      import graft.operators.Relational.{AssocPpm, WauWindowDays}
      s"""WITH a AS (
         |  SELECT DISTINCT user_id,
         |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
         |  FROM events),
         |dd AS (SELECT day, count(*) AS dau FROM a GROUP BY 1),
         |c AS (
         |  SELECT DISTINCT user_id, day + g AS wday
         |  FROM a CROSS JOIN
         |    (SELECT unnest(range(0, $WauWindowDays)) AS g)),
         |n AS (SELECT wday, count(*) AS wau FROM c GROUP BY 1),
         |sp AS (SELECT unnest(range((SELECT min(day) FROM a),
         |  (SELECT max(day) FROM a) + 1)) AS wday)
         |SELECT CAST(sp.wday AS BIGINT) AS day,
         |  CAST(coalesce(dd.dau, 0) AS BIGINT) AS dau,
         |  CAST(coalesce(n.wau, 0) AS BIGINT) AS wau,
         |  CAST(CASE WHEN coalesce(n.wau, 0) = 0 THEN 0
         |    ELSE (coalesce(dd.dau, 0) * $AssocPpm) // n.wau END
         |    AS BIGINT) AS stickiness_ppm
         |FROM sp LEFT JOIN n ON sp.wday = n.wday
         |LEFT JOIN dd ON sp.wday = dd.day
         |ORDER BY 1""".stripMargin
    },

    // gap-fill: packed struct argmax for the daily close (lexicographic
    // on both engines), last_value IGNORE NULLS forward fill over the
    // per-user calendar spine, exact integer cents
    "q74_gap_fill" -> {
      import graft.operators.Relational.GapFillUserMod
      s"""WITH e AS (
         |  SELECT user_id,
         |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         |    epoch_us(ts) AS us, event_id,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE user_id % $GapFillUserMod = 0),
         |d AS MATERIALIZED (SELECT user_id, day,
         |    (max({'us': us, 'eid': event_id, 'cents': cents})).cents
         |      AS close_cents
         |  FROM e GROUP BY 1, 2),
         |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
         |u AS (SELECT DISTINCT user_id FROM d),
         |sp AS (SELECT u.user_id, unnest(range(b.d0, b.d1 + 1)) AS day
         |  FROM u, b),
         |f AS (SELECT sp.user_id, sp.day, d.close_cents,
         |    last_value(d.close_cents IGNORE NULLS) OVER (
         |      PARTITION BY sp.user_id ORDER BY sp.day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         |  FROM sp LEFT JOIN d ON sp.user_id = d.user_id AND sp.day = d.day)
         |SELECT user_id, CAST(day AS BIGINT) AS day,
         |  CAST(filled AS BIGINT) AS filled_cents,
         |  CAST(CASE WHEN close_cents IS NOT NULL THEN 1 ELSE 0 END
         |    AS BIGINT) AS observed
         |FROM f WHERE filled IS NOT NULL
         |ORDER BY user_id, day""".stripMargin
    },

    // EWMA: the BIGINT fixed-point recurrence replayed as a recursive
    // CTE stepping per-user row_number — sequential fold order is the
    // per-user day order on both engines; non-negative closes make
    // DuckDB's flooring // equal Spark's truncating div
    "q75_ewma" -> {
      import graft.operators.Relational.{EwmaNum, EwmaDen, EwmaAnomalyPpm}
      s"""WITH RECURSIVE e AS (
         |  SELECT user_id,
         |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         |    epoch_us(ts) AS us, event_id,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events),
         |d AS MATERIALIZED (SELECT user_id, day,
         |    (max({'us': us, 'eid': event_id, 'cents': cents})).cents
         |      AS close_cents
         |  FROM e GROUP BY 1, 2),
         |r AS MATERIALIZED (SELECT user_id, day, close_cents,
         |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
         |  FROM d),
         |rec AS (
         |  SELECT user_id, rn, day, close_cents, close_cents AS s
         |  FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.user_id, r.rn, r.day, r.close_cents,
         |    ($EwmaNum * r.close_cents + ${EwmaDen - EwmaNum} * rec.s)
         |      // $EwmaDen
         |  FROM rec JOIN r
         |    ON r.user_id = rec.user_id AND r.rn = rec.rn + 1),
         |dev AS (SELECT user_id, day, close_cents, s,
         |    lag(s) OVER (PARTITION BY user_id ORDER BY day) AS prev
         |  FROM rec)
         |SELECT user_id, CAST(day AS BIGINT) AS day, close_cents,
         |  CAST(s AS BIGINT) AS ewma_cents,
         |  CAST(CASE WHEN prev IS NOT NULL AND
         |      (abs(close_cents - prev) * 1000000) // greatest(prev, 1)
         |        > $EwmaAnomalyPpm
         |    THEN 1 ELSE 0 END AS BIGINT) AS anomaly
         |FROM dev ORDER BY user_id, day""".stripMargin
    },

    // Inter-arrival gaps: lag over the same total per-user order
    // (us, event_id); gaps cast to DOUBLE and re-united µs → s before
    // quantile_cont so both engines interpolate the same doubles at a
    // magnitude where round-6 clears IEEE last-bit divergence
    "q76_interarrival" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |    event_id FROM events),
        |g AS (SELECT event_type,
        |    CAST(us - lag(us) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS DOUBLE) / 1000000.0 AS gap_s
        |  FROM e)
        |SELECT event_type,
        |  round(quantile_cont(gap_s, 0.5), 6) AS p50_gap_s,
        |  round(quantile_cont(gap_s, 0.9), 6) AS p90_gap_s,
        |  round(quantile_cont(gap_s, 0.99), 6) AS p99_gap_s
        |FROM g WHERE gap_s IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the watermark-driven emitter's gate: its output multiset equals
    // the batch lag() gaps regardless of arrival order — the oracle is
    // just that SQL, totally ordered by (event_type, gap_us)
    "q76_gaps_watermarked" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |    event_id FROM events),
        |g AS (SELECT event_type,
        |    us - lag(us) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS gap_us
        |  FROM e)
        |SELECT event_type, CAST(gap_us AS BIGINT) AS gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |ORDER BY event_type, gap_us""".stripMargin,

    // Leave-one-out target encoding: all-BIGINT cents arithmetic over
    // non-negative values, so DuckDB's flooring // equals Spark's
    // truncating div; sums CAST to BIGINT (HUGEINT render rule)
    "q77_target_encode" -> {
      import graft.operators.Relational.TargetEncodeM
      s"""WITH e AS (SELECT event_id, event_type,
         |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         |t AS (SELECT event_type, CAST(sum(cents) AS BIGINT) AS t_sum,
         |    count(*) AS t_n FROM e GROUP BY 1),
         |g AS (SELECT CAST((CAST(sum(cents) AS BIGINT)) // count(*)
         |    AS BIGINT) AS prior_cents FROM e)
         |SELECT e.event_id, e.event_type, e.cents, g.prior_cents,
         |  CAST(CASE WHEN t_n > 1 THEN (t_sum - cents) // (t_n - 1)
         |    ELSE prior_cents END AS BIGINT) AS loo_cents,
         |  CAST((t_sum - cents + $TargetEncodeM * prior_cents)
         |    // (t_n - 1 + $TargetEncodeM) AS BIGINT) AS loo_smooth_cents
         |FROM e JOIN t USING (event_type) CROSS JOIN g
         |ORDER BY event_id""".stripMargin
    },

    // Quantile binning: boundaries selected by exact rank (type-1
    // quantiles — actual BIGINT values, no interpolation), assignment
    // by strict BIGINT comparison; rank→value is tie-proof
    "q78_quantile_bins" -> {
      import graft.operators.Relational.QuantileBinCount
      s"""WITH e AS (SELECT event_id, event_type,
         |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         |r AS (SELECT event_type, cents,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY cents, event_id) AS rn
         |  FROM e),
         |c AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1),
         |t AS (SELECT event_type, k,
         |    (n * k) // $QuantileBinCount AS target_rn
         |  FROM c, range(1, $QuantileBinCount) s(k)),
         |bounds AS (SELECT r.event_type, t.k, r.cents AS b
         |  FROM r JOIN t ON r.event_type = t.event_type
         |    AND r.rn = t.target_rn)
         |SELECT e.event_id, e.event_type, e.cents,
         |  CAST(1 + count(*) FILTER (WHERE e.cents > bounds.b) AS BIGINT)
         |    AS bin
         |FROM e JOIN bounds ON e.event_type = bounds.event_type
         |GROUP BY e.event_id, e.event_type, e.cents
         |ORDER BY e.event_id""".stripMargin
    },

    // A/B chi-square: salted md5 arm assignment replayed exactly;
    // margins → expected cells → statistic all in BIGINT // (the h32
    // value is non-negative, so % 2 == pmod)
    "q81_ab_chisq" -> {
      import graft.operators.Relational.AbConvertPurchases
      s"""WITH u AS (SELECT user_id,
        |    CASE WHEN count(*) FILTER (WHERE event_type = 'purchase')
        |      >= $AbConvertPurchases THEN 1 ELSE 0 END AS converted
        |  FROM events GROUP BY 1),
        |a AS (SELECT
        |    CAST('0x' || substring(
        |      md5('exp1|' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      % 2 AS arm,
        |    converted FROM u),
        |m AS (SELECT
        |    CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
        |    CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_b
        |  FROM a),
        |e AS (SELECT *,
        |    (n_a * (conv_a + conv_b)) // (n_a + n_b) AS e_ac,
        |    (n_a * ((n_a - conv_a) + (n_b - conv_b))) // (n_a + n_b) AS e_an,
        |    (n_b * (conv_a + conv_b)) // (n_a + n_b) AS e_bc,
        |    (n_b * ((n_a - conv_a) + (n_b - conv_b))) // (n_a + n_b) AS e_bn
        |  FROM m)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  CAST((conv_a * 1000000) // n_a AS BIGINT) AS conv_a_ppm,
        |  CAST((conv_b * 1000000) // n_b AS BIGINT) AS conv_b_ppm,
        |  CAST(
        |    ${Relational.chisqCellSql("conv_a", "e_ac", "//")}
        |    + ${Relational.chisqCellSql("(n_a - conv_a)", "e_an", "//")}
        |    + ${Relational.chisqCellSql("conv_b", "e_bc", "//")}
        |    + ${Relational.chisqCellSql("(n_b - conv_b)", "e_bn", "//")}
        |    AS BIGINT) AS chisq_ppm
        |FROM e""".stripMargin
    },

    // Two-sample KS: scaled-integer CDF gap over the merged distinct
    // support — counts and floor divisions only
    "q83_ks_test" ->
      """WITH e AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |m AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
        |c AS (SELECT event_type, cents,
        |    CAST(sum(CASE WHEN day <= mid THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
        |    CAST(sum(CASE WHEN day > mid THEN 1 ELSE 0 END) AS BIGINT) AS c_live
        |  FROM e, m GROUP BY 1, 2),
        |k AS (SELECT event_type,
        |    sum(c_ref) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ref,
        |    sum(c_live) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_live,
        |    sum(c_ref) OVER (PARTITION BY event_type) AS n_ref,
        |    sum(c_live) OVER (PARTITION BY event_type) AS n_live
        |  FROM c)
        |SELECT event_type,
        |  CAST(max(n_ref) AS BIGINT) AS n_ref,
        |  CAST(max(n_live) AS BIGINT) AS n_live,
        |  CAST(max(abs((cum_ref * 1000000) // greatest(n_ref, 1)
        |    - (cum_live * 1000000) // greatest(n_live, 1))) AS BIGINT) AS ks_ppm
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    // the TEXTBOOK correlated form on purpose: the oracle re-states the
    // per-part aggregate as two correlated scalar subqueries per outer
    // row — hash equality proves the Spark side's declared
    // decorrelation (one aggregate + join-back) computes exactly it
    "q85_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
        |  FROM lineitem)
        |SELECT p.p_brand,
        |  CAST(count(*) AS BIGINT) AS n_small,
        |  CAST(sum(l.price_c) AS DOUBLE) / 100.0 AS lost_revenue
        |FROM li l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.qty_c * 5 *
        |    (SELECT count(*) FROM li l2 WHERE l2.l_partkey = l.l_partkey)
        |  < (SELECT sum(l2.qty_c) FROM li l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Mann-Whitney U / AUC over DOUBLED midranks: a tied group on
    // combined ranks [a, b] has 2*midrank = a + b = 2*cum_le - n_v + 1,
    // so ranks, U and the AUC ppm all stay in exact BIGINT algebra
    "q84_mann_whitney" ->
      """WITH e AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |m AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
        |c AS (SELECT event_type, cents,
        |    CAST(sum(CASE WHEN day <= mid THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
        |    CAST(sum(CASE WHEN day > mid THEN 1 ELSE 0 END) AS BIGINT) AS c_live
        |  FROM e, m GROUP BY 1, 2),
        |w AS (SELECT event_type, c_ref, c_live,
        |    sum(c_ref + c_live) OVER (PARTITION BY event_type ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_le,
        |    sum(c_ref) OVER (PARTITION BY event_type) AS n_ref,
        |    sum(c_live) OVER (PARTITION BY event_type) AS n_live
        |  FROM c),
        |a AS (SELECT event_type, CAST(max(n_ref) AS BIGINT) AS n_ref,
        |    CAST(max(n_live) AS BIGINT) AS n_live,
        |    CAST(sum(c_live * (2 * cum_le - (c_ref + c_live) + 1)) AS BIGINT)
        |      AS r_live_x2
        |  FROM w GROUP BY 1),
        |u AS (SELECT event_type, n_ref, n_live,
        |    r_live_x2 - n_live * (n_live + 1) AS u_live_x2 FROM a)
        |SELECT event_type, n_ref, n_live, u_live_x2,
        |  CASE WHEN n_ref = 0 OR n_live = 0 THEN NULL ELSE
        |    CAST((u_live_x2 // (2 * n_ref * n_live)) * 1000000
        |      + ((u_live_x2 % (2 * n_ref * n_live)) * 1000000)
        |        // (2 * n_ref * n_live) AS BIGINT) END AS auc_ppm
        |FROM u ORDER BY event_type""".stripMargin,

    // Composed drift panel: the q79/q83/q84 blocks as renamed CTEs over
    // the SHARED e/m split, joined per type (the curation_pipeline
    // composed-oracle discipline)
    "report_drift_panel" -> {
      import graft.operators.Relational.QuantileBinCount
      s"""WITH e AS (SELECT event_id, event_type,
         |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         |m AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
         |ref AS (SELECT e.* FROM e, m WHERE day <= mid),
         |live AS (SELECT e.* FROM e, m WHERE day > mid),
         |rr AS (SELECT event_type, cents,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY cents, event_id) AS rn FROM ref),
         |c AS (SELECT event_type, count(*) AS n FROM ref GROUP BY 1),
         |t AS (SELECT event_type, k,
         |    (n * k) // $QuantileBinCount AS target_rn
         |  FROM c, range(1, $QuantileBinCount) s(k)),
         |bounds AS (SELECT rr.event_type, t.k, rr.cents AS b
         |  FROM rr JOIN t ON rr.event_type = t.event_type
         |    AND rr.rn = t.target_rn),
         |rb AS (SELECT r2.event_id, r2.event_type,
         |    1 + count(*) FILTER (WHERE r2.cents > b.b) AS bin
         |  FROM ref r2 JOIN bounds b ON r2.event_type = b.event_type
         |  GROUP BY r2.event_id, r2.event_type),
         |lb AS (SELECT l2.event_id, l2.event_type,
         |    1 + count(*) FILTER (WHERE l2.cents > b.b) AS bin
         |  FROM live l2 JOIN bounds b ON l2.event_type = b.event_type
         |  GROUP BY l2.event_id, l2.event_type),
         |rc AS (SELECT event_type, bin, count(*) AS r_c FROM rb GROUP BY 1, 2),
         |oc AS (SELECT event_type, bin, count(*) AS o_c FROM lb GROUP BY 1, 2),
         |tot AS (SELECT rt.event_type, rt.R, lt.L FROM
         |    (SELECT event_type, CAST(sum(r_c) AS BIGINT) AS R
         |      FROM rc GROUP BY 1) rt
         |  JOIN (SELECT event_type, CAST(sum(o_c) AS BIGINT) AS L
         |      FROM oc GROUP BY 1) lt ON rt.event_type = lt.event_type),
         |j AS (SELECT event_type, bin,
         |    coalesce(r_c, 0) AS r_c, coalesce(o_c, 0) AS o_c
         |  FROM rc FULL OUTER JOIN oc USING (event_type, bin)),
         |f AS (SELECT j.event_type, r_c, o_c, R, L,
         |    (L * r_c) // R AS e
         |  FROM j JOIN tot USING (event_type)),
         |chi AS (SELECT event_type,
         |    CAST(sum(${Relational.chisqCellSql("o_c", "e", "//")})
         |      AS BIGINT) AS chisq_ppm
         |  FROM f GROUP BY 1),
         |vc AS (SELECT event_type, cents,
         |    CAST(sum(CASE WHEN day <= mid THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
         |    CAST(sum(CASE WHEN day > mid THEN 1 ELSE 0 END) AS BIGINT) AS c_live
         |  FROM e, m GROUP BY 1, 2),
         |kk AS (SELECT event_type,
         |    sum(c_ref) OVER (PARTITION BY event_type ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ref,
         |    sum(c_live) OVER (PARTITION BY event_type ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_live,
         |    sum(c_ref) OVER (PARTITION BY event_type) AS n_ref,
         |    sum(c_live) OVER (PARTITION BY event_type) AS n_live
         |  FROM vc),
         |ks AS (SELECT event_type,
         |    CAST(max(n_ref) AS BIGINT) AS n_ref,
         |    CAST(max(n_live) AS BIGINT) AS n_live,
         |    CAST(max(abs((cum_ref * 1000000) // greatest(n_ref, 1)
         |      - (cum_live * 1000000) // greatest(n_live, 1))) AS BIGINT)
         |      AS ks_ppm
         |  FROM kk GROUP BY 1),
         |uw AS (SELECT event_type, c_ref, c_live,
         |    sum(c_ref + c_live) OVER (PARTITION BY event_type ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_le,
         |    sum(c_ref) OVER (PARTITION BY event_type) AS n_ref,
         |    sum(c_live) OVER (PARTITION BY event_type) AS n_live
         |  FROM vc),
         |ua AS (SELECT event_type, CAST(max(n_ref) AS BIGINT) AS n_ref,
         |    CAST(max(n_live) AS BIGINT) AS n_live,
         |    CAST(sum(c_live * (2 * cum_le - (c_ref + c_live) + 1)) AS BIGINT)
         |      AS r_live_x2
         |  FROM uw GROUP BY 1),
         |uu AS (SELECT event_type, n_ref, n_live,
         |    r_live_x2 - n_live * (n_live + 1) AS u_live_x2 FROM ua)
         |SELECT ks.event_type, ks.n_ref, ks.n_live, ks.ks_ppm,
         |  uu.u_live_x2,
         |  CASE WHEN uu.n_ref = 0 OR uu.n_live = 0 THEN NULL ELSE
         |    CAST((u_live_x2 // (2 * uu.n_ref * uu.n_live)) * 1000000
         |      + ((u_live_x2 % (2 * uu.n_ref * uu.n_live)) * 1000000)
         |        // (2 * uu.n_ref * uu.n_live) AS BIGINT) END AS auc_ppm,
         |  chi.chisq_ppm
         |FROM ks JOIN uu USING (event_type) JOIN chi USING (event_type)
         |ORDER BY event_type""".stripMargin
    },

    // Survival table: closed-window KM collapses to exact count
    // ratios — lifetime histogram + reverse-cumulative at-risk counts
    "q82_survival" ->
      """WITH life AS (
        |  SELECT user_id,
        |    max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
        |      - min(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
        |      AS lifetime
        |  FROM events GROUP BY 1),
        |h AS (SELECT lifetime, CAST(count(*) AS BIGINT) AS n_end
        |      FROM life GROUP BY 1),
        |r AS (SELECT lifetime, n_end,
        |    CAST(sum(n_end) OVER (ORDER BY lifetime DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_risk,
        |    CAST(sum(n_end) OVER () AS BIGINT) AS n_users
        |  FROM h)
        |SELECT CAST(lifetime AS BIGINT) AS lifetime, n_risk, n_end,
        |  CAST(((n_risk - n_end) * 1000000) // n_users AS BIGINT) AS surv_ppm
        |FROM r ORDER BY lifetime""".stripMargin,

    // Sequence motifs: ordered string_agg over the same total order;
    // replace-trick counting is leftmost-non-overlapping in both
    // engines; // over non-negative multiples of len(m) is exact
    "q80_sequence_motifs" -> {
      import graft.operators.Relational.SequenceMotifs
      val occ = SequenceMotifs.map(m =>
        s"(length(sq) - length(replace(sq, '$m', ''))) // ${m.length} AS occ_$m")
        .mkString(",\n        |    ")
      val rows = SequenceMotifs.map(m =>
        s"""SELECT '$m' AS motif,
           |  CAST(count(*) FILTER (WHERE occ_$m > 0) AS BIGINT) AS users_hit,
           |  CAST(sum(occ_$m) AS BIGINT) AS occurrences FROM occ""")
        .mkString("\n        |UNION ALL\n        |")
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
         |    substring(event_type, 1, 1) AS ini FROM events),
         |s AS (SELECT user_id,
         |    string_agg(ini, '' ORDER BY us, event_id) AS sq
         |  FROM e GROUP BY 1),
         |occ AS (SELECT user_id,
         |    $occ
         |  FROM s)
         |$rows
         |ORDER BY motif""".stripMargin
    },

    // Feature drift: reference-half decile bounds (exact rank), both
    // halves binned, exact scaled-integer chi-square — all BIGINT //
    // over non-negatives, sums CAST (HUGEINT render rule)
    "q79_drift_chisq" -> {
      import graft.operators.Relational.QuantileBinCount
      s"""WITH e AS (SELECT event_id, event_type,
         |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         |m AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
         |ref AS (SELECT e.* FROM e, m WHERE day <= mid),
         |live AS (SELECT e.* FROM e, m WHERE day > mid),
         |rr AS (SELECT event_type, cents,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY cents, event_id) AS rn FROM ref),
         |c AS (SELECT event_type, count(*) AS n FROM ref GROUP BY 1),
         |t AS (SELECT event_type, k,
         |    (n * k) // $QuantileBinCount AS target_rn
         |  FROM c, range(1, $QuantileBinCount) s(k)),
         |bounds AS (SELECT rr.event_type, t.k, rr.cents AS b
         |  FROM rr JOIN t ON rr.event_type = t.event_type
         |    AND rr.rn = t.target_rn),
         |rb AS (SELECT r2.event_id, r2.event_type,
         |    1 + count(*) FILTER (WHERE r2.cents > b.b) AS bin
         |  FROM ref r2 JOIN bounds b ON r2.event_type = b.event_type
         |  GROUP BY r2.event_id, r2.event_type),
         |lb AS (SELECT l2.event_id, l2.event_type,
         |    1 + count(*) FILTER (WHERE l2.cents > b.b) AS bin
         |  FROM live l2 JOIN bounds b ON l2.event_type = b.event_type
         |  GROUP BY l2.event_id, l2.event_type),
         |rc AS (SELECT event_type, bin, count(*) AS r_c FROM rb GROUP BY 1, 2),
         |oc AS (SELECT event_type, bin, count(*) AS o_c FROM lb GROUP BY 1, 2),
         |tot AS (SELECT rt.event_type, rt.R, lt.L FROM
         |    (SELECT event_type, CAST(sum(r_c) AS BIGINT) AS R
         |      FROM rc GROUP BY 1) rt
         |  JOIN (SELECT event_type, CAST(sum(o_c) AS BIGINT) AS L
         |      FROM oc GROUP BY 1) lt ON rt.event_type = lt.event_type),
         |j AS (SELECT event_type, bin,
         |    coalesce(r_c, 0) AS r_c, coalesce(o_c, 0) AS o_c
         |  FROM rc FULL OUTER JOIN oc USING (event_type, bin)),
         |f AS (SELECT j.event_type, r_c, o_c, R, L,
         |    (L * r_c) // R AS e
         |  FROM j JOIN tot USING (event_type))
         |SELECT event_type, CAST(max(R) AS BIGINT) AS n_ref,
         |  CAST(max(L) AS BIGINT) AS n_live,
         |  CAST(sum(${Relational.chisqCellSql("o_c", "e", "//")})
         |    AS BIGINT) AS chisq_ppm
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Feature hashing: portable md5-derived h32 replayed exactly;
    // Spark dayofweek is 1=Sunday..7, DuckDB's is 0=Sunday..6 → +1
    "feature_hash" -> {
      import graft.operators.Relational.FeatureHashBuckets
      s"""WITH f AS (
         |  SELECT unnest(['type:' || event_type,
         |      'dow:' || CAST(dayofweek(ts) + 1 AS VARCHAR),
         |      'cohort:' || CAST(user_id % 100 AS VARCHAR)]) AS feature,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events)
         |SELECT (CAST('0x' || substring(md5(feature), 1, 8) AS BIGINT))
         |    % $FeatureHashBuckets AS bucket,
         |  count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // BFS reachability: same half-edge CTEs as q71, each hop replayed
    // as a MATERIALIZED frontier/cumulative pair; empty hops drop out
    // via the n_nodes > 0 filter exactly as the batch early-exit does
    "q73_bfs_reach" -> {
      import graft.operators.Relational.BfsRounds
      val rounds = (1 to BfsRounds).map { i =>
        s"""r$i AS MATERIALIZED (SELECT DISTINCT h.v FROM h
           |  JOIN r${i - 1} ON h.u = r${i - 1}.v
           |  WHERE h.v NOT IN (SELECT v FROM c${i - 1})),
           |c$i AS MATERIALIZED (
           |  SELECT v FROM c${i - 1} UNION SELECT v FROM r$i)""".stripMargin
      }.mkString(",\n")
      val perDist = (0 to BfsRounds).map { i =>
        s"""SELECT CAST($i AS BIGINT) AS dist, count(*) AS n_nodes,
           |  CAST(coalesce(sum(v), 0) AS BIGINT) AS sum_v FROM r$i""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH s0 AS MATERIALIZED (
         |  SELECT l_partkey, lead(l_partkey) OVER (
         |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS pb0
         |  FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT LEAST(l_partkey, pb0) AS pa,
         |    GREATEST(l_partkey, pb0) AS pb
         |  FROM s0 WHERE pb0 IS NOT NULL AND l_partkey <> pb0),
         |h AS MATERIALIZED (
         |  SELECT pa AS u, pb AS v FROM e0
         |  UNION ALL SELECT pb AS u, pa AS v FROM e0),
         |d AS (SELECT u AS v, count(*) AS deg FROM h GROUP BY 1),
         |r0 AS MATERIALIZED (SELECT v FROM d
         |  ORDER BY deg DESC, v ASC LIMIT 1),
         |c0 AS MATERIALIZED (SELECT v FROM r0),
         |$rounds
         |SELECT dist, n_nodes, sum_v FROM (
         |$perDist)
         |WHERE n_nodes > 0 ORDER BY dist""".stripMargin
    },

    // neighborhood jaccard: same edge/degree CTEs as q70's base, the
    // top-node filter totally ordered by (deg desc, v asc), ratio as
    // exact integer ppm — BIGINT div on both engines
    "q71_neighbor_jaccard" -> {
      import graft.operators.Relational.{AssocPpm, JaccardTopNodes}
      s"""WITH s0 AS MATERIALIZED (
         |  SELECT l_partkey, lead(l_partkey) OVER (
         |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS pb0
         |  FROM lineitem),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT LEAST(l_partkey, pb0) AS pa,
         |    GREATEST(l_partkey, pb0) AS pb
         |  FROM s0 WHERE pb0 IS NOT NULL AND l_partkey <> pb0),
         |h AS MATERIALIZED (
         |  SELECT pa AS u, pb AS v FROM e0
         |  UNION ALL SELECT pb AS u, pa AS v FROM e0),
         |d AS MATERIALIZED (SELECT u AS v, count(*) AS deg FROM h GROUP BY 1),
         |top AS MATERIALIZED (SELECT v FROM d
         |  ORDER BY deg DESC, v ASC LIMIT $JaccardTopNodes),
         |ta AS MATERIALIZED (SELECT u, v FROM h
         |  WHERE v IN (SELECT v FROM top)),
         |c AS (SELECT a.v AS pa, b.v AS pb, count(*) AS n_common
         |  FROM ta a JOIN ta b ON a.u = b.u AND a.v < b.v
         |  GROUP BY 1, 2)
         |SELECT c.pa, c.pb, c.n_common, da.deg AS da, db.deg AS db,
         |  CAST(($AssocPpm * c.n_common) // (da.deg + db.deg - c.n_common)
         |    AS BIGINT) AS jac_ppm
         |FROM c JOIN d da ON c.pa = da.v JOIN d db ON c.pb = db.v
         |ORDER BY jac_ppm DESC, pa ASC, pb ASC LIMIT 20""".stripMargin
    },

    // LTV triangle: identical integer month/cohort arithmetic,
    // cumulative sum over the tiny (cohort, age) frame, exact cents
    "q67_ltv_triangle" -> {
      import graft.operators.Relational.LtvHorizonMonths
      s"""WITH b AS (
         |  SELECT o_custkey,
         |    year(o_orderdate) * 12 + month(o_orderdate) AS mth,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |c AS (SELECT *, min(mth) OVER (PARTITION BY o_custkey) AS cohort
         |  FROM b),
         |f AS (SELECT o_custkey, cohort, mth - cohort AS age, cents
         |  FROM c WHERE mth - cohort <= $LtvHorizonMonths),
         |sz AS (SELECT cohort, count(DISTINCT o_custkey) AS cohort_size
         |  FROM f GROUP BY 1),
         |r AS (SELECT cohort, age, CAST(sum(cents) AS BIGINT) AS rev_cents
         |  FROM f GROUP BY 1, 2),
         |cum AS (SELECT cohort, age,
         |  CAST(sum(rev_cents) OVER (PARTITION BY cohort ORDER BY age
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_cents
         |  FROM r)
         |SELECT CAST(cum.cohort AS BIGINT) AS cohort,
         |  CAST(age AS BIGINT) AS age, sz.cohort_size, cum_cents,
         |  CAST(cum_cents // sz.cohort_size AS BIGINT) AS ltv_cents_per_cust
         |FROM cum JOIN sz USING (cohort) ORDER BY 1, 2""".stripMargin
    },

    // association rules: q54's pair counts + per-item basket counts,
    // ratios as exact integer ppm (BIGINT div on both engines)
    "q66_assoc_rules" -> {
      import graft.operators.Relational.AssocPpm
      s"""WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |p AS (
         |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
         |  FROM d a JOIN d b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2
         |  ORDER BY n_ab DESC, pa ASC, pb ASC LIMIT 20),
         |i AS (SELECT l_partkey, count(*) AS n_item FROM d GROUP BY 1),
         |t AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM d)
         |SELECT p.pa, p.pb, p.n_ab,
         |  CAST((p.n_ab * $AssocPpm) // t.n_baskets AS BIGINT) AS support_ppm,
         |  CAST((p.n_ab * $AssocPpm) // ia.n_item AS BIGINT) AS conf_ab_ppm,
         |  CAST((p.n_ab * $AssocPpm) // ib.n_item AS BIGINT) AS conf_ba_ppm,
         |  CAST((p.n_ab * t.n_baskets * $AssocPpm) // (ia.n_item * ib.n_item)
         |    AS BIGINT) AS lift_ppm
         |FROM p JOIN i ia ON p.pa = ia.l_partkey
         |  JOIN i ib ON p.pb = ib.l_partkey
         |  CROSS JOIN t
         |ORDER BY p.n_ab DESC, p.pa ASC, p.pb ASC""".stripMargin
    },

    // RFM: identical total-ordered ntile(4) windows (metric desc,
    // custkey asc — both engines split ties the same way), exact cents
    "q65_rfm" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
        |      AS last_day,
        |    count(*) AS n_orders,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS m_cents
        |  FROM orders GROUP BY 1),
        |q AS (
        |  SELECT *,
        |    ntile(4) OVER (ORDER BY last_day DESC, o_custkey ASC) AS r_q,
        |    ntile(4) OVER (ORDER BY n_orders DESC, o_custkey ASC) AS f_q,
        |    ntile(4) OVER (ORDER BY m_cents DESC, o_custkey ASC) AS m_q
        |  FROM pc)
        |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
        |  CAST(m_q AS BIGINT) AS m_q, count(*) AS n_customers,
        |  CAST(sum(m_cents) AS BIGINT) AS segment_cents
        |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // rolling WAU: identical bounded 7-day expansion + distinct +
    // calendar spine; all integer epoch-day arithmetic
    "q64_rolling_wau" -> {
      import graft.operators.Relational.WauWindowDays
      s"""WITH a AS (
         |  SELECT DISTINCT user_id,
         |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
         |  FROM events),
         |c AS (
         |  SELECT DISTINCT user_id, day + g AS wday
         |  FROM a CROSS JOIN
         |    (SELECT unnest(range(0, $WauWindowDays)) AS g)),
         |n AS (SELECT wday, count(*) AS n_active FROM c GROUP BY 1),
         |sp AS (SELECT unnest(range((SELECT min(day) FROM a),
         |  (SELECT max(day) FROM a) + 1)) AS wday)
         |SELECT CAST(sp.wday AS BIGINT) AS day,
         |  CAST(coalesce(n.n_active, 0) AS BIGINT) AS wau
         |FROM sp LEFT JOIN n ON sp.wday = n.wday
         |ORDER BY 1""".stripMargin
    },

    // session-scoped funnel: identical gap rule (strict >, 30-min µs),
    // session-id running sum, and three chained per-session min()
    // windows; integer µs everywhere
    "q63_session_funnel" -> {
      import graft.operators.Relational.TtlMicros
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
         |  FROM events),
         |s AS (
         |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
         |      OR us - lag(us) OVER w > $TtlMicros THEN 1 ELSE 0 END AS new_sess
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s2 AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
         |    ORDER BY us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM s),
         |t1 AS (
         |  SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
         |    OVER ws AS tv
         |  FROM s2 WINDOW ws AS (PARTITION BY user_id, session_id)),
         |t2 AS (
         |  SELECT *, min(CASE WHEN event_type = 'click' AND us > tv
         |      THEN us END) OVER ws AS tc
         |  FROM t1 WINDOW ws AS (PARTITION BY user_id, session_id)),
         |t3 AS (
         |  SELECT *, min(CASE WHEN event_type = 'purchase' AND us > tc
         |      THEN us END) OVER ws AS tp
         |  FROM t2 WINDOW ws AS (PARTITION BY user_id, session_id)),
         |p AS (
         |  SELECT user_id, session_id, min(tv) AS tv, min(tc) AS tc,
         |    min(tp) AS tp
         |  FROM t3 GROUP BY 1, 2)
         |SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
         |  count(*) AS n_sessions, count(tv) AS n_viewed,
         |  count(tc) AS n_clicked_after_view,
         |  count(tp) AS n_purchased_after_click
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // last-touch attribution: identical strictly-before window (ROWS …
    // 1 PRECEDING over the same (us, event_id) total order), µs lag
    // floored to integer seconds so sums are exact BIGINTs
    "q62_attribution" -> {
      import graft.operators.Relational.AttributionLookbackUs
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
         |  FROM events),
         |t AS (
         |  SELECT *,
         |    last_value(CASE WHEN event_type IN ('view', 'click')
         |        THEN event_type END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_type,
         |    last_value(CASE WHEN event_type IN ('view', 'click')
         |        THEN us END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_us
         |  FROM e),
         |p AS (
         |  SELECT CASE WHEN t_us IS NULL OR us - t_us > $AttributionLookbackUs
         |      THEN 'none' ELSE t_type END AS attribution,
         |    CASE WHEN t_us IS NULL OR us - t_us > $AttributionLookbackUs
         |      THEN 0 ELSE (us - t_us) // 1000000 END AS lag_s
         |  FROM t WHERE event_type = 'purchase')
         |SELECT attribution, count(*) AS n_purchases,
         |  CAST(sum(lag_s) AS BIGINT) AS total_lag_s
         |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // PageRank: the SECOND oracle that replays an iterative algorithm
    // end to end (the kcenter recipe) — one MATERIALIZED CTE triple
    // (contribution sum, dangling mass, damped recombination) per
    // round; every operation is BIGINT fixed-point (rank div degree,
    // (85·mass) div 100), so sums are order-independent and both
    // engines land on identical integers
    "q61_pagerank" -> {
      import graft.operators.Relational.{PagerankScale, PagerankIters}
      val iters = (1 to PagerankIters).map { i =>
        s"""c$i AS MATERIALIZED (
           |  SELECT e.pb AS part, CAST(sum(r.r // o.deg) AS BIGINT) AS s
           |  FROM edges e JOIN odeg o ON e.pa = o.pa
           |    JOIN r${i - 1} r ON e.pa = r.part
           |  GROUP BY e.pb),
           |d$i AS MATERIALIZED (
           |  SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dang
           |  FROM r${i - 1} r LEFT JOIN odeg o ON r.part = o.pa
           |  WHERE o.pa IS NULL),
           |r$i AS MATERIALIZED (
           |  SELECT n.part,
           |    CAST((($PagerankScale // p.n) * 15) // 100
           |      + (85 * (coalesce(c.s, 0) + (d.dang // p.n))) // 100
           |      AS BIGINT) AS r
           |  FROM nodes n CROSS JOIN p CROSS JOIN d$i d
           |    LEFT JOIN c$i c ON n.part = c.part)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS MATERIALIZED (
         |  SELECT l_partkey AS pa,
         |    lead(l_partkey) OVER (PARTITION BY l_orderkey
         |      ORDER BY l_linenumber, l_partkey) AS pb
         |  FROM lineitem),
         |edges AS MATERIALIZED (
         |  SELECT DISTINCT pa, pb FROM seq
         |  WHERE pb IS NOT NULL AND pa <> pb),
         |nodes AS MATERIALIZED (SELECT DISTINCT l_partkey AS part FROM lineitem),
         |odeg AS MATERIALIZED (SELECT pa, count(*) AS deg FROM edges GROUP BY 1),
         |p AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
         |r0 AS MATERIALIZED (
         |  SELECT part, CAST($PagerankScale // p.n AS BIGINT) AS r
         |  FROM nodes CROSS JOIN p),
         |$iters
         |SELECT part, r AS rank_scaled FROM r$PagerankIters
         |ORDER BY r DESC, part ASC LIMIT 100""".stripMargin
    },

    "q60_active_islands" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |i AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS island
        |  FROM d),
        |runs AS (SELECT user_id, island, count(*) AS len
        |         FROM i GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin,

    // retention cohorts: integer epoch-day // 7 weeks on both engines
    "q57_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS wk0 FROM a GROUP BY 1)
        |SELECT CAST(f.wk0 AS BIGINT) AS wk0,
        |  CAST(a.wk - f.wk0 AS BIGINT) AS k,
        |  count(*) AS n_users
        |FROM a JOIN f USING (user_id)
        |WHERE a.wk - f.wk0 <= 3
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // DQ audit: each rule mirrored as a scalar-subquery pair
    "dq_checks" ->
      """SELECT * FROM (
        |SELECT 'lineitem_orphan_order' AS rule,
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |    AS n_violations,
        |  (SELECT count(*) FROM lineitem) AS n_checked
        |UNION ALL
        |SELECT 'orders_duplicate_key',
        |  (SELECT count(*) FROM (SELECT o_orderkey FROM orders
        |    GROUP BY 1 HAVING count(*) > 1)),
        |  (SELECT count(*) FROM orders)
        |UNION ALL
        |SELECT 'lineitem_null_quantity',
        |  (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL),
        |  (SELECT count(*) FROM lineitem)
        |UNION ALL
        |SELECT 'lineitem_nonpositive_quantity',
        |  (SELECT count(*) FROM lineitem WHERE l_quantity <= 0),
        |  (SELECT count(*) FROM lineitem)
        |UNION ALL
        |SELECT 'orders_status_domain',
        |  (SELECT count(*) FROM orders
        |   WHERE o_orderstatus NOT IN ('O', 'F', 'P')),
        |  (SELECT count(*) FROM orders)
        |UNION ALL
        |SELECT 'customer_missing_nation',
        |  (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
        |  (SELECT count(*) FROM customer)
        |) ORDER BY rule""".stripMargin,

    // funnel latency: q50's chained-min CTEs feeding quantile_cont on
    // exact integer-µs diffs (the q28 bit-exact interpolation parity)
    "q56_funnel_latency" ->
      """WITH tv AS (SELECT user_id, min(ts) AS tv FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |tc AS (SELECT e.user_id, min(e.ts) AS tc
        |       FROM events e JOIN tv USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > tv.tv GROUP BY 1),
        |lat AS (SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
        |        CAST(epoch_us(tc.tc) - epoch_us(tv.tv) AS DOUBLE) AS lat_us
        |        FROM tv JOIN tc USING (user_id))
        |SELECT cohort, count(*) AS n_converted,
        |  round(quantile_cont(lat_us, 0.5) / 1000000.0, 6) AS p50_s,
        |  round(quantile_cont(lat_us, 0.9) / 1000000.0, 6) AS p90_s
        |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin,

    // JSON extraction: DuckDB's json_extract_string mirrors the schema'd
    // from_json field read; TRY_CAST mirrors Spark's from_json(LongType)
    // null-on-unparseable semantics (plain CAST would raise in DuckDB)
    "q53_json_extract" ->
      """WITH e AS (SELECT event_type,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, count(k) AS n_with_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    // Q22 shape: integer-cents balances, cross-multiplied average
    // threshold (cents·n_pos > sum_pos — no double division or
    // order-dependent double sum on either engine), NOT EXISTS against
    // the recent-orders fact
    "q52_idle_capital" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |           FROM customer),
        |st AS (SELECT sum(cents) AS s_pos, count(*) AS n_pos
        |       FROM c WHERE cents > 0)
        |SELECT c_nationkey, count(*) AS n_customers,
        |  CAST(sum(cents) AS DOUBLE) / 100.0 AS total_bal
        |FROM c, st
        |WHERE cents * n_pos > s_pos
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= DATE '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // PIT join: DuckDB's native ASOF JOIN against the end-of-day
    // dimension (arg_max = Spark's max_by; DATE subtraction = datediff)
    "q45_pit_join" ->
      s"""WITH dim AS (
         |  SELECT o_custkey AS d_cust,
         |         date_diff('day', DATE '1970-01-01', o_orderdate) AS d_days,
         |         arg_max(o_orderstatus, o_orderkey) AS d_status
         |  FROM orders GROUP BY 1, 2),
         |facts AS (
         |  SELECT date_diff('day', DATE '1970-01-01', l.l_shipdate) AS ship_days,
         |         $discPrice AS rev, o.o_custkey
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |pit AS (
         |  SELECT f.rev, d.d_status
         |  FROM facts f ASOF JOIN dim d
         |    ON f.o_custkey = d.d_cust AND f.ship_days >= d.d_days)
         |SELECT d_status, count(*) AS n_items,
         |  CAST(CAST(sum(rev) AS $D4) AS DOUBLE) AS revenue
         |FROM pit GROUP BY 1 ORDER BY 1""".stripMargin,

    // Morton interleave of (u16, t16) — 32 exact BIGINT shift/mask terms
    "q43_zorder" -> {
      val terms = (0 until 16).map { i =>
        s"((u16 >> $i) & 1) * ${1L << (2 * i)} + ((t16 >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString("\n|    + ")
      s"""WITH b AS (
         |  SELECT event_id, user_id, epoch_us(ts) // 60000000 AS tb FROM events),
         |st AS (SELECT min(user_id) AS umin, max(user_id) AS umax,
         |              min(tb) AS tmin, max(tb) AS tmax FROM b),
         |e AS (
         |  SELECT event_id,
         |    ((user_id - umin) * 65535) // greatest(umax - umin, 1) AS u16,
         |    ((tb - tmin) * 65535) // greatest(tmax - tmin, 1) AS t16
         |  FROM b, st)
         |SELECT event_id, u16, t16,
         |  ($terms) AS z
         |FROM e ORDER BY z, event_id""".stripMargin
    },
  )

  /** The salted sessionization gate shares q14's oracle by construction:
    * the recipe is exact, so the outputs must hash-match the same SQL. */
  val all: Map[String, String] = base +
    ("q40_session_salted" -> base("q14_mapwithstate_ttl")) +
    // band refinement is exact by construction — same oracle as the
    // sort-based path it replaces for giant groups
    ("q41_percentile_band" -> base("q28_percentile"))
}
