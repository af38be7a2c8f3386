package graft.queries

/** DuckDB-runnable oracle SQL for every query in [[RelationalQueries]]
  * (SURVEY.md §2.9, validated row-identical Spark↔DuckDB at sf0.01/sf0.1
  * on 2026-08-12). Column aliases here must match the Spark-side output
  * column names exactly — the driver sorts columns by name before
  * hashing values.
  */
object OracleSql {

  /** Oracles written in DuckDB-only dialect (list lambdas / unnest /
    * list(DISTINCT)) — correct for the DuckDB gate but not runnable
    * verbatim on Spark, so SqlParitySpec's double-entry check skips
    * them (their Spark-side semantics are covered by the DuckDB oracle
    * itself plus the per-operator unit specs). Everything else in
    * [[all]] must stay engine-portable. */
  val duckOnlyDialect: Set[String] = Set("q29_token_explode", "q32_string_agg",
    // 3-arg date_diff / date+int / strpos are DuckDB spellings
    "q36_date_functions", "q37_string_functions", "q39_range_frame",
    // DATE + int / arg_min / bool_or are DuckDB spellings
    "q40_date_spine_gapfill", "q42_map_functions",
    // list_* lambda spellings are DuckDB-only (Spark: transform/filter/
    // aggregate — exercised natively by RelationalQueries.q45)
    "q45_array_lambdas",
    // index lambda / {} struct / list_* / l[i] indexing are DuckDB
    // spellings (Spark: posexplode / array_* / get — exercised
    // natively by RelationalQueries.q47-q49)
    "q47_posexplode", "q48_array_setops", "q49_regexp_extract_all")

  val all: Map[String, String] = Map(
    "q01_scan_project_sort" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "q02_filter_string_funcs" ->
      """SELECT c_custkey, upper(trim(c_name)) AS nm, length(c_name) AS ln
        |FROM customer WHERE c_acctbal > 1000 AND c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,

    "q03_regex_trycast" ->
      """SELECT p_partkey, regexp_extract(p_type, '[A-Z]+', 0) AS ty,
        |       CASE WHEN try_cast(p_brand AS DOUBLE) IS NULL THEN 1 ELSE 0 END AS nonnum
        |FROM part WHERE p_name LIKE '%a%' AND p_size BETWEEN 10 AND 30
        |ORDER BY p_partkey""".stripMargin,

    "q04_join_chain_agg" ->
      """SELECT n.n_name, count(*) AS c
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |GROUP BY n.n_name ORDER BY c DESC, n.n_name""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q06_semi_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q07_hash_agg_decimal" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       count(*) AS n
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q08_conditional_count" ->
      """SELECT o_orderpriority,
        |       CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS big,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q09_count_distinct" ->
      "SELECT count(DISTINCT o_custkey) AS u FROM orders",

    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""".stripMargin,

    "q11_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey, grouping(c_mktsegment) AS g, count(*) AS n
        |FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY g, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin,

    "q12_row_number_lastwins" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q13_topk_limit" ->
      """SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 25""".stripMargin,

    "q14_lag_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |       lag(o_orderkey) OVER (PARTITION BY o_custkey
        |                             ORDER BY o_orderdate, o_orderkey) AS prev_ok
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q15_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q16_union_all" ->
      """SELECT k FROM (SELECT c_custkey AS k FROM customer
        |               UNION ALL SELECT s_suppkey AS k FROM supplier) t
        |ORDER BY k LIMIT 100""".stripMargin,

    "q17_except" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
        |EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F' ORDER BY k""".stripMargin,

    "q18_intersect" ->
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k""".stripMargin,

    "q19_decorrelated_lookup" ->
      """SELECT c.c_custkey,
        |       (SELECT max(o.o_orderkey) FROM orders o
        |         WHERE o.o_custkey = c.c_custkey) AS last_ok
        |FROM customer c ORDER BY c.c_custkey""".stripMargin,

    "q20_json_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '[0-9]+', 0) AS INT) AS k
        |FROM events WHERE event_type IN ('purchase','signup') ORDER BY event_id""".stripMargin,

    "q21_tumbling_window" ->
      """SELECT CAST(CAST(ts AS DATE) AS STRING) AS d, event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |FROM events GROUP BY CAST(ts AS DATE), event_type
        |ORDER BY d, event_type""".stripMargin,

    "q22_sessionization" ->
      """SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n FROM (
        |  SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (SELECT user_id, ts, event_id,
        |               CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |                                       ORDER BY ts, event_id) IS NULL
        |                         OR ts > lag(ts) OVER (PARTITION BY user_id
        |                                       ORDER BY ts, event_id) + INTERVAL '1' HOUR
        |                    THEN 1 ELSE 0 END AS new_s
        |        FROM events) a) b
        |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q23_exact_dedup_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q24_theta_join" ->
      """SELECT r.r_regionkey, count(*) AS n
        |FROM region r JOIN nation n ON n.n_regionkey <= r.r_regionkey
        |GROUP BY r.r_regionkey ORDER BY r.r_regionkey""".stripMargin,

    "q25_doc_stats" ->
      """SELECT lang, count(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars,
        |       count(DISTINCT source) AS srcs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q26_length_bucketing" ->
      """SELECT CAST(FLOOR(n_chars / 100) AS INT) AS bucket, count(*) AS n
        |FROM documents WHERE text LIKE '%spark%'
        |GROUP BY CAST(FLOOR(n_chars / 100) AS INT)
        |ORDER BY bucket""".stripMargin,

    "q27_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q28_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_cnt,
        |       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_cnt,
        |       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q29_token_explode" ->
      s"""WITH t AS (
         |  SELECT unnest(${ExtensionQueries.wordsSql("text")}) AS token
         |  FROM documents)
         |SELECT token, count(*) AS n FROM t GROUP BY token
         |HAVING count(*) >= (SELECT count(*) FROM documents)
         |ORDER BY token""".stripMargin,

    "q30_percentile_cont" ->
      """SELECT o_orderpriority,
        |       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p50,
        |       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p90,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q31_arg_max" ->
      """SELECT o_orderpriority, o_orderkey AS best_ok,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS best_price
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders) t
        |WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin,

    "q32_string_agg" ->
      """SELECT lang, array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
        |       count(*) AS n
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q33_full_outer_join" ->
      """SELECT coalesce(a.k, b.k) AS k,
        |       CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL THEN 'both'
        |            WHEN a.k IS NOT NULL THEN 'left' ELSE 'right' END AS side
        |FROM (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING') a
        |FULL OUTER JOIN (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'P') b
        |ON a.k = b.k
        |ORDER BY k""".stripMargin,

    "q34_rank_distribution" ->
      """SELECT c_custkey, c_mktsegment,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd,
        |       ntile(4) OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q35_frame_navigation" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_orderkey) OVER w AS first_ok,
        |       nth_value(o_orderkey, 2) OVER w AS second_ok,
        |       last_value(o_orderkey) OVER w AS last_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // EXTRACT returns BIGINT in DuckDB, INT in Spark — cast each field.
    // The +30d value compares as an ISO string (DATE renders differently
    // across client paths); CAST(date AS VARCHAR) is ISO in DuckDB.
    "q36_date_functions" ->
      """SELECT o_orderkey,
        |       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
        |       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
        |       CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
        |       CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
        |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // strpos is DuckDB's 1-based/0-absent instr; both engines' split_part
    // and left share semantics on ASCII fixture strings.
    "q37_string_functions" ->
      """SELECT p_partkey,
        |       lpad(p_brand, 12, '*') AS lp,
        |       rpad(p_brand, 12, '-') AS rp,
        |       reverse(p_name) AS rev,
        |       repeat(substr(p_type, 1, 3), 2) AS rep,
        |       replace(p_name, ' ', '_') AS und,
        |       CAST(strpos(p_name, 'a') AS INT) AS pos_a,
        |       left(p_name, 5) AS l5,
        |       split_part(p_type, ' ', 1) AS sp1
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q38_set_ops_all" ->
      """SELECT 'ex' AS op, k FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O') a
        |UNION ALL
        |SELECT 'in' AS op, k FROM (
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O') b
        |ORDER BY op, k""".stripMargin,

    "q39_range_frame" ->
      """SELECT o_custkey, o_orderkey, CAST(d AS INT) AS d,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |         PARTITION BY o_custkey ORDER BY d
        |         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail30
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS d
        |      FROM orders) t
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // DuckDB's DATE + int is the date_add spelling; CAST(date AS VARCHAR)
    // is ISO. The recursive spine and the decimal-until-the-end sum
    // replay the engine's plan shape exactly.
    "q40_date_spine_gapfill" ->
      """WITH RECURSIVE spine(n) AS (
        |  SELECT 0 UNION ALL SELECT n + 1 FROM spine WHERE n < 34
        |),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS cnt,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY CAST(ts AS DATE)
        |)
        |SELECT CAST(DATE '2024-01-01' + n AS VARCHAR) AS d,
        |       CAST(coalesce(cnt, 0) AS BIGINT) AS n_events,
        |       CAST(coalesce(v, 0) AS DOUBLE) AS v
        |FROM spine LEFT JOIN daily ON daily.day = DATE '2024-01-01' + n
        |ORDER BY d""".stripMargin,

    "q41_unpivot_long" ->
      """SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'retail' AS measure, CAST(p_retailprice AS DOUBLE) AS val
        |FROM part
        |ORDER BY p_partkey, measure""".stripMargin,

    // The engine answers through map lookups; the oracle replays the
    // same values relationally (orderkeys are unique per customer, so
    // the map semantics collapse to arg_min / membership).
    "q42_map_functions" ->
      """SELECT o_custkey,
        |       CAST(count(*) AS INT) AS n_orders,
        |       arg_min(o_orderstatus, o_orderkey) AS first_status,
        |       CAST(bool_or(o_orderkey = 1) AS INT) AS has_ok1
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q43_join_funnel_topk" ->
      """SELECT l_orderkey,
        |       CAST(CAST(o_orderdate AS DATE) AS STRING) AS odate,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q44_six_table_join" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    // list lambdas mirror Spark's transform/filter/aggregate; the fold
    // stays in integer space (order-insensitive sum of lengths) and the
    // distinct list is sorted before joining, so both engines agree
    // bit-for-bit.
    "q45_array_lambdas" ->
      """SELECT p_partkey,
        |       CAST(len(string_split(p_name, ' ')) AS INT) AS nw,
        |       CAST(coalesce(list_sum(list_transform(
        |              list_filter(string_split(p_name, ' '),
        |                          w -> length(w) > 4),
        |              w -> length(w))), 0) AS BIGINT) AS chars_long,
        |       array_to_string(list_sort(list_distinct(
        |         string_split(p_name, ' '))), ',') AS uniq
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q46_correlated_scalar" ->
      """SELECT c_custkey,
        |       (SELECT count(*) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |       (SELECT CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0)
        |               AS DOUBLE)
        |        FROM orders o WHERE o.o_custkey = c.c_custkey) AS spend
        |FROM customer c
        |WHERE c_acctbal > 9000.0
        |ORDER BY c_custkey""".stripMargin,

    // DuckDB has no WITH ORDINALITY; the index lambda (1-based,
    // shifted to posexplode's 0-based pos) is the equivalent.
    "q47_posexplode" ->
      """SELECT p_partkey, CAST(u.pos AS INTEGER) AS pos, u.word AS word
        |FROM (SELECT p_partkey,
        |             unnest(list_transform(string_split(p_name, ' '),
        |                                   (x, i) -> {'pos': i - 1, 'word': x})) AS u
        |      FROM part WHERE p_partkey < 50) t
        |ORDER BY p_partkey, pos""".stripMargin,

    // Both engines dedup set-op results but order differently — sorted
    // arrays are the contract (q48 scaladoc). DuckDB lacks
    // list_except: distinct + not-contains filter is the equivalent.
    "q48_array_setops" ->
      """SELECT p_partkey,
        |  coalesce(array_to_string(list_sort(list_intersect(string_split(p_name, ' '),
        |    ['red','blue','green','small','ring','bolt'])), ','), '') AS known,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(string_split(p_name, ' ')),
        |    x -> NOT list_contains(['red','blue','green','small','ring','bolt'], x))), ','), '') AS novel,
        |  CAST(len(list_intersect(string_split(p_name, ' '),
        |    ['red','blue','green','small','ring','bolt'])) AS INTEGER) AS n_known,
        |  CAST(len(list_filter(list_distinct(string_split(p_name, ' ')),
        |    x -> NOT list_contains(['red','blue','green','small','ring','bolt'], x))) AS INTEGER) AS n_novel
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q49_regexp_extract_all" ->
      """SELECT c_custkey, CAST(len(r) AS INTEGER) AS n_runs,
        |       r[1] AS first_run, r[len(r)] AS last_run,
        |       coalesce(array_to_string(r, ','), '') AS all_runs
        |FROM (SELECT c_custkey, regexp_extract_all(c_name, '[1-9]+') AS r
        |      FROM customer WHERE c_custkey < 200) t
        |ORDER BY c_custkey""".stripMargin,

    // CROSS JOIN LATERAL parses verbatim in Spark and DuckDB — one
    // portable text serves the oracle AND the SqlParitySpec double
    // entry; only the view names differ from the declared impl.
    "q50_lateral_topn" ->
      """SELECT r.r_name, l.n_name, l.n_customers
        |FROM region r CROSS JOIN LATERAL (
        |  SELECT n.n_name, CAST(count(c.c_custkey) AS BIGINT) AS n_customers
        |  FROM nation n JOIN customer c
        |    ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey = r.r_regionkey
        |  GROUP BY n.n_name
        |  ORDER BY n_customers DESC, n.n_name LIMIT 2) l
        |ORDER BY r_name, n_customers DESC, n_name""".stripMargin,
  )
}
