package graft.queries

/** Spark-dialect SQL twins (round-10 verdict item 4).
  *
  * Every `q_*` oracle is ANSI SQL the driver runs in DuckDB; 94 of them
  * parse unchanged through `spark.sql`. The remaining 68 use DuckDB-only
  * dialect (list_* functions, `//`, HUGEINT, 1-based `arr[i]`, UNNEST,
  * ASOF JOIN, ORDER BY inside aggregates, backslash-verbatim string
  * literals). This registry carries a Spark-parsable twin for each of
  * those, producing a frame IDENTICAL to the DataFrame implementation —
  * so a SQL-first user can run the engine's whole query surface as SQL
  * text on Spark (SqlParitySpec census gate: 162/162 parse + match).
  *
  * Dialect mapping notes (recurring patterns):
  *   - list_transform/filter/sort/distinct/... -> transform/filter/
  *     array_sort/array_distinct; len -> size; arr[i] -> element_at
  *     (both 1-based); arr[a:b] -> slice(arr, a, b-a+1)
  *   - unnest(x) -> explode(x) / LATERAL VIEW [pos]explode
  *   - range(a, b) (end-exclusive) -> sequence(a, b-1) (inclusive)
  *   - list_reduce(list_prepend(seed, xs), f) -> aggregate(xs, seed, f)
  *   - list(x ORDER BY k) -> transform(array_sort(collect_list(
  *     struct(k, x))), s -> s.x)  (deterministic fold order preserved,
  *     so FP folds stay bit-identical)
  *   - string_agg(x, sep ORDER BY x) -> array_join(array_sort(
  *     collect_list(x)), sep)
  *   - a // b -> a div b; x::BIGINT -> CAST; HUGEINT -> DECIMAL(38,0)
  *   - epoch_us(ts) -> unix_micros(cast(ts as timestamp));
  *     make_timestamp(us) -> timestamp_micros(us)
  *   - DuckDB string literals keep backslashes verbatim; Spark consumes
  *     them as escapes -> regex literals are backslash-doubled
  *   - CAST('0x'||hex AS BIGINT) -> CAST(conv(hex, 16, 10) AS BIGINT)
  *   - ASOF LEFT JOIN -> LEFT JOIN + row_number() latest-match pick
  *   - DuckDB dayofweek is 0=Sunday, Spark 1=Sunday -> +5 vs +6 shift
  *   - graft_normalize (the engine-registered codegen expression) stands
  *     in for strip_accents(nfc_normalize(...))+lower+collapse, which it
  *     implements exactly (NormalizeText scaladoc)
  */
object SparkDialect {
  /** name -> Spark-parsable SQL, frame-identical to the DataFrame impl. */
  val twins: Map[String, String] = Map(
    "q_agg_collect_sorted" ->
      """SELECT n_name, array_join(array_sort(collect_list(s_name)), ',') AS names
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_agg_median_cont" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
        |  ((CASE WHEN (CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4))) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4))) - FLOOR(ABS(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS DECIMAL(5,4)) AS DOUBLE))) / COUNT(*) AS median_cont
        |FROM r WHERE rn = (n+1) div 2 OR rn = (n+2) div 2
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(size(embedding) AS INT) AS dim,
        |  array_join(transform(slice(embedding, 1, 4),
        |    x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS STRING)), ',') AS head4_q,
        |  CAST(element_at(embedding, 1) AS DOUBLE) AS first_el,
        |  CAST(array_max(embedding) AS DOUBLE) AS el_max,
        |  CAST(array_min(embedding) AS DOUBLE) AS el_min,
        |  array_join(transform(embedding,
        |    x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 2 * 1000000) AS BIGINT) AS STRING)), ',') AS doubled_q,
        |  CAST(size(filter(embedding, x -> x > 0)) AS INT) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS plus30,
        |  CAST(date_diff(DAY, CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_2000,
        |  CAST((dayofweek(o_orderdate) + 5) % 7 AS INT) AS dow_iso
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_dedup_incremental" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source, md5(text) AS h,
        |    array_distinct(split(text, ' ')) AS toks
        |  FROM documents),
        |corpus AS (SELECT * FROM d
        |  WHERE substr(md5(CAST(doc_id AS STRING)), 1, 1) < '8'),
        |batch  AS (SELECT * FROM d
        |  WHERE substr(md5(CAST(doc_id AS STRING)), 1, 1) >= '8'),
        |ex AS (SELECT DISTINCT b.doc_id FROM batch b
        |       JOIN corpus c ON b.h = c.h),
        |nr AS (SELECT DISTINCT b.doc_id FROM batch b
        |       JOIN corpus c ON b.lang = c.lang AND b.source = c.source
        |         AND 3 * size(array_intersect(b.toks, c.toks))
        |             >= size(b.toks) + size(c.toks)
        |       WHERE b.doc_id NOT IN (SELECT doc_id FROM ex))
        |SELECT b.lang, COUNT(*) AS n_batch,
        |  CAST(SUM(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN nr.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_near,
        |  CAST(SUM(CASE WHEN ex.doc_id IS NULL AND nr.doc_id IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |FROM batch b
        |LEFT JOIN ex ON b.doc_id = ex.doc_id
        |LEFT JOIN nr ON b.doc_id = nr.doc_id
        |GROUP BY b.lang ORDER BY b.lang""".stripMargin,
    "q_dedup_ngram" ->
      """WITH t AS (
        |  SELECT lang, source, doc_id,
        |    array_distinct(transform(sequence(1, (size(split(text, ' ')) - 1) - 1),
        |      i -> element_at(split(text, ' '), i) || ' ' || element_at(split(text, ' '), i+1)
        |           || ' ' || element_at(split(text, ' '), i+2))) AS sh
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / (size(a.sh) + size(b.sh) - size(array_intersect(a.sh, b.sh))) AS jac3
        |  FROM t a JOIN t b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT d1, d2, jac3 FROM p WHERE jac3 >= 0.05
        |ORDER BY d1, d2""".stripMargin,
    "q_dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, source,
        |    explode(array_distinct(split(text, ' '))) AS tok
        |  FROM documents),
        |th AS (SELECT doc_id, lang, source, aggregate(transform(filter(split(tok, ''), c -> c != ''), c -> CAST(ascii(c) AS BIGINT)), CAST(7 AS BIGINT), (a, b) -> (a * 31 + b) % 2147483647) AS h FROM tok),
        |sh AS (
        |  SELECT doc_id, lang, source,
        |    (CASE WHEN SUM(CASE WHEN (h >> 0) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 0) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 1) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 1) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 2) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 2) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 3) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 3) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 4) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 4) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 5) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 5) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 6) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 6) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 7) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 7) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 8) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 8) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 9) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 9) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 10) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 10) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 11) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 11) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 12) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 12) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 13) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 13) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 14) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 14) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 15) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 15) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 16) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 16) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 17) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 17) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 18) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 18) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 19) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 19) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 20) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 20) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 21) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 21) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 22) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 22) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 23) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 23) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 24) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 24) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 25) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 25) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 26) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 26) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 27) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 27) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 28) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 28) ELSE 0 END) + (CASE WHEN SUM(CASE WHEN (h >> 29) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS BIGINT) << 29) ELSE 0 END) AS simhash
        |  FROM th GROUP BY doc_id, lang, source)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(bit_count((a.simhash ^ b.simhash)) AS INT) AS hamming
        |FROM sh a JOIN sh b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE bit_count((a.simhash ^ b.simhash)) <= 4
        |ORDER BY d1, d2""".stripMargin,
    "q_dedup_span" ->
      """WITH toks AS (
        |  SELECT doc_id, split(text, ' ') AS t FROM documents),
        |spans AS (
        |  SELECT doc_id, array_join(slice(t, p, 8), ' ') AS span
        |  FROM (SELECT * FROM toks WHERE size(t) >= 8) tk
        |  LATERAL VIEW explode(sequence(1, size(t) - 7, 4)) u AS p),
        |f AS (
        |  SELECT doc_id,
        |    CASE WHEN MIN(doc_id) OVER (PARTITION BY span)
        |           <> MAX(doc_id) OVER (PARTITION BY span)
        |         THEN 1 ELSE 0 END AS is_dup
        |  FROM spans),
        |per_doc AS (
        |  SELECT doc_id, COUNT(*) AS n_spans,
        |         CAST(SUM(is_dup) AS BIGINT) AS dup_spans
        |  FROM f GROUP BY doc_id)
        |SELECT doc_id, n_spans, dup_spans,
        |       CAST(dup_spans AS DOUBLE) / n_spans AS dup_frac
        |FROM per_doc WHERE dup_spans > 0
        |ORDER BY dup_frac DESC, doc_id LIMIT 100""".stripMargin,
    "q_embed_centroid" ->
      """SELECT label, pos,
        |  aggregate(transform(array_sort(collect_list(struct(vec_id, v))), s -> s.v),
        |    CAST(0 AS DOUBLE), (a, b) -> a + b) / COUNT(*) AS centroid
        |FROM (
        |  SELECT label, vec_id, CAST(e AS DOUBLE) AS v, pos
        |  FROM embeddings LATERAL VIEW posexplode(embedding) x AS pos, e)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q_embed_quantize" ->
      """SELECT vec_id, scale,
        |  array_join(transform(embedding, x ->
        |    CAST(floor(CAST(x AS DOUBLE) * 127.0 / scale + 0.5) AS BIGINT)),
        |    ',') AS qvec
        |FROM (
        |  SELECT vec_id, embedding,
        |    greatest(array_max(transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS scale
        |  FROM embeddings)
        |ORDER BY vec_id""".stripMargin,
    "q_event_attribution" ->
      """WITH a AS (
        |  SELECT event_type, value,
        |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
        |              ) IGNORE NULLS
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ch
        |  FROM events)
        |SELECT COALESCE(ch, 'none') AS channel, COUNT(*) AS n_purchases,
        |  ((CASE WHEN (CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))) - FLOOR(ABS(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS DECIMAL(5,4)) AS DOUBLE))) AS revenue
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,
    "q_event_paths" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff(MICROSECOND, lag(ts) OVER w, ts) > 43200000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o),
        |tri AS (
        |  SELECT event_type AS t1,
        |    LEAD(event_type, 1) OVER ws AS t2,
        |    LEAD(event_type, 2) OVER ws AS t3
        |  FROM s
        |  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id)),
        |cnt AS (
        |  SELECT t1, t2, t3, COUNT(*) AS n FROM tri
        |  WHERE t3 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT t1, t2, t3, n FROM cnt
        |ORDER BY n DESC, t1, t2, t3 LIMIT 10""".stripMargin,
    "q_feature_hash" ->
      """WITH t AS (
        |  SELECT doc_id, transform(split(text, ' '),
        |    tok -> aggregate(transform(filter(split(tok, ''), c -> c != ''), c -> CAST(ascii(c) AS BIGINT)), CAST(7 AS BIGINT), (a, b) -> (a * 31 + b) % 2147483647) % 16) AS bks
        |  FROM documents)
        |SELECT doc_id,
        |  array_join(transform(sequence(0, 15),
        |    b -> size(filter(bks, x -> x = b))), ',') AS fvec
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_hierarchy_flatten" ->
      """WITH RECURSIVE h AS (
        |  SELECT s_suppkey AS node, s_suppkey AS root, 0 AS depth
        |  FROM supplier WHERE s_suppkey < 3
        |  UNION ALL
        |  SELECT s.s_suppkey, h.root, h.depth + 1
        |  FROM supplier s JOIN h ON s.s_suppkey  div  3 = h.node
        |  WHERE s.s_suppkey >= 3)
        |SELECT node, root, depth FROM h ORDER BY node""".stripMargin,
    "q_hierarchy_subtree" ->
      """WITH RECURSIVE anc AS (
        |  SELECT s_suppkey AS node, s_suppkey  div  3 AS anc
        |  FROM supplier WHERE s_suppkey >= 3
        |  UNION ALL
        |  SELECT a.node, s.s_suppkey  div  3
        |  FROM anc a JOIN supplier s ON a.anc = s.s_suppkey
        |  WHERE s.s_suppkey >= 3),
        |agg AS (
        |  SELECT anc, COUNT(*) AS n, SUM(node) AS ks
        |  FROM anc GROUP BY anc)
        |SELECT s.s_suppkey AS node,
        |  CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_desc,
        |  CAST(COALESCE(agg.ks, 0) AS BIGINT) AS desc_key_sum
        |FROM supplier s LEFT JOIN agg ON s.s_suppkey = agg.anc
        |ORDER BY node""".stripMargin,
    "q_join_asof" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT * FROM events WHERE event_type = 'view'),
        |j AS (
        |  SELECT p.event_id, p.user_id, p.ts AS purchase_ts, v.ts AS view_ts,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY v.ts DESC NULLS LAST) AS rn
        |  FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts < p.ts)
        |SELECT event_id, user_id, purchase_ts, view_ts,
        |  unix_micros(cast(purchase_ts as timestamp))
        |    - unix_micros(cast(view_ts as timestamp)) AS lag_us
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_join_overlap" ->
      """WITH bands AS (
        |  SELECT i AS band_id,
        |    CAST(i * 25000 AS DOUBLE) AS blo,
        |    CAST(i * 25000 + 40000 AS DOUBLE) AS bhi
        |  FROM (SELECT explode(sequence(0, 19)) AS i)),
        |ords AS (
        |  SELECT o_orderkey, o_totalprice - 5000 AS olo,
        |    o_totalprice + 5000 AS ohi
        |  FROM orders)
        |SELECT band_id, COUNT(*) AS n_overlap,
        |  ((CASE WHEN (CAST(SUM(CAST((ohi - olo) AS DECIMAL(18,4))) AS DECIMAL(18,4))) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(CAST(SUM(CAST((ohi - olo) AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(CAST(SUM(CAST((ohi - olo) AS DECIMAL(18,4))) AS DECIMAL(18,4))) - FLOOR(ABS(CAST(SUM(CAST((ohi - olo) AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS DECIMAL(5,4)) AS DOUBLE))) AS sum_width
        |FROM bands b JOIN ords o
        |  ON b.blo <= o.ohi AND o.olo <= b.bhi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q_join_range" ->
      """WITH bands AS (
        |  SELECT i AS band_id,
        |    CAST(i * 25000 AS DOUBLE) AS lo,
        |    CAST(i * 25000 + 40000 AS DOUBLE) AS hi
        |  FROM (SELECT explode(sequence(0, 19)) AS i))
        |SELECT band_id, COUNT(*) AS n_orders,
        |  ((CASE WHEN (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4))) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4))) - FLOOR(ABS(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS DECIMAL(5,4)) AS DOUBLE))) AS band_value
        |FROM bands b JOIN orders o
        |  ON o.o_totalprice >= b.lo AND o.o_totalprice <= b.hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(get_json_object(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_knn_vote" ->
      """WITH n AS (
        |  SELECT vec_id, embedding, label, aggregate(zip_with(embedding, embedding, (u, v) -> CAST(u AS DOUBLE) * CAST(v AS DOUBLE)), 0D, (s, t) -> s + t) AS nrm
        |  FROM embeddings),
        |knn AS (
        |  SELECT a_id, b_label FROM (
        |    SELECT a.vec_id AS a_id, b.label AS b_label,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY aggregate(zip_with(a.embedding, b.embedding, (u, v) -> CAST(u AS DOUBLE) * CAST(v AS DOUBLE)), 0D, (s, t) -> s + t) / (sqrt(a.nrm) * sqrt(b.nrm)) DESC,
        |                 b.vec_id) AS rnk
        |    FROM n a JOIN n b ON b.vec_id != a.vec_id
        |    WHERE a.vec_id < 100) t
        |  WHERE rnk <= 5),
        |votes AS (
        |  SELECT a_id, b_label, COUNT(*) AS votes,
        |    row_number() OVER (PARTITION BY a_id ORDER BY COUNT(*) DESC, b_label) AS vr
        |  FROM knn GROUP BY a_id, b_label)
        |SELECT a_id, b_label AS pred_label, votes
        |FROM votes WHERE vr = 1 ORDER BY a_id""".stripMargin,
    "q_map_funcs" ->
      """SELECT 'k' AS key, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_v
        |FROM events
        |ORDER BY key""".stripMargin,
    "q_math" ->
      """SELECT o_orderkey,
        |  round(o_totalprice) AS rounded,
        |  CAST(floor(o_totalprice) AS BIGINT) AS fl,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS ce,
        |  abs(o_totalprice - 100000) AS dist,
        |  pow(2, o_orderkey % 10) AS p2,
        |  sqrt(o_orderkey) AS sq,
        |  o_orderkey % 7 AS m7,
        |  CAST(sign(o_totalprice - 100000) AS INT) AS sgn,
        |  o_orderkey & 255 AS band,
        |  o_orderkey | 16 AS bor,
        |  (o_orderkey ^ 85) AS bxor
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS `F`,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS `O`,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS `P`
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_profile_table" ->
      """SELECT col_name, n, n_null, ndv, min_s, max_s FROM (
        |  SELECT 'o_orderkey' AS col_name, COUNT(*) AS n,
        |    CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
        |    COUNT(DISTINCT o_orderkey) AS ndv,
        |    CAST(MIN(o_orderkey) AS STRING) AS min_s,
        |    CAST(MAX(o_orderkey) AS STRING) AS max_s
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', COUNT(*),
        |    CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
        |    COUNT(DISTINCT o_custkey),
        |    CAST(MIN(o_custkey) AS STRING), CAST(MAX(o_custkey) AS STRING)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*),
        |    CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
        |    COUNT(DISTINCT o_orderstatus),
        |    CAST(MIN(o_orderstatus) AS STRING), CAST(MAX(o_orderstatus) AS STRING)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', COUNT(*),
        |    CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
        |    COUNT(DISTINCT CAST(o_orderdate AS DATE)),
        |    CAST(MIN(CAST(o_orderdate AS DATE)) AS STRING),
        |    CAST(MAX(CAST(o_orderdate AS DATE)) AS STRING)
        |  FROM orders) t
        |ORDER BY col_name""".stripMargin,
    "q_regex" ->
      """SELECT p_partkey, p_brand,
        |  CAST(regexp_extract(p_brand, '#(\\d+)$', 1) AS INT) AS brand_num,
        |  regexp_replace(p_name, '[aeiou]', '') AS no_vowels
        |FROM part
        |WHERE regexp_like(p_brand, '#1\\d$')
        |ORDER BY p_partkey""".stripMargin,
    "q_sample_group" ->
      """SELECT lang, source, doc_id, rk FROM (
        |  SELECT lang, source, doc_id,
        |    row_number() OVER (PARTITION BY lang, source
        |      ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY lang, source, rk""".stripMargin,
    "q_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff(MICROSECOND, lag(ts) OVER w, ts) > 43200000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  ((CASE WHEN (CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))) - FLOOR(ABS(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS DECIMAL(5,4)) AS DOUBLE))) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_sim_cosine_topk" ->
      """WITH n AS (
        |  SELECT vec_id, embedding, aggregate(zip_with(embedding, embedding, (u, v) -> CAST(u AS DOUBLE) * CAST(v AS DOUBLE)), 0D, (s, t) -> s + t) AS nrm
        |  FROM embeddings)
        |SELECT a_id, b_id, rnk, sim FROM (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    aggregate(zip_with(a.embedding, b.embedding, (u, v) -> CAST(u AS DOUBLE) * CAST(v AS DOUBLE)), 0D, (s, t) -> s + t) / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY aggregate(zip_with(a.embedding, b.embedding, (u, v) -> CAST(u AS DOUBLE) * CAST(v AS DOUBLE)), 0D, (s, t) -> s + t) / (sqrt(a.nrm) * sqrt(b.nrm)) DESC,
        |               b.vec_id) AS rnk
        |  FROM n a JOIN n b ON b.vec_id != a.vec_id
        |  WHERE a.vec_id < 100) t
        |WHERE rnk <= 5
        |ORDER BY a_id, rnk""".stripMargin,
    "q_sim_embed_neardup" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    aggregate(zip_with(embedding, embedding, (u, v) -> CAST(u AS DOUBLE) * CAST(v AS DOUBLE)), 0D, (s, t) -> s + t) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS v1, b.vec_id AS v2,
        |  aggregate(zip_with(a.embedding, b.embedding, (u, v) -> CAST(u AS DOUBLE) * CAST(v AS DOUBLE)), 0D, (s, t) -> s + t)
        |    / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |ORDER BY sim DESC, v1, v2 LIMIT 20""".stripMargin,
    "q_split_kfold" ->
      """SELECT fold, COUNT(*) AS n_docs,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM (
        |  SELECT source, lang, aggregate(transform(filter(split(source, ''), c -> c != ''), c -> CAST(ascii(c) AS BIGINT)), CAST(7 AS BIGINT), (a, b) -> (a * 31 + b) % 2147483647) % 5 AS fold
        |  FROM documents)
        |GROUP BY fold ORDER BY fold""".stripMargin,
    "q_split_train_test" ->
      """SELECT split, lang, n_docs,
        |  CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS share
        |FROM (
        |  SELECT CASE WHEN substr(md5(CAST(doc_id AS STRING)), 1, 2) < 'cd'
        |           THEN 'train' ELSE 'test' END AS split,
        |    lang, COUNT(*) AS n_docs
        |  FROM documents GROUP BY 1, 2)
        |ORDER BY split, lang""".stripMargin,
    "q_stat_regression" ->
      """WITH c AS (
        |  SELECT l_linenumber,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |a AS (
        |  SELECT l_linenumber, COUNT(*) AS n,
        |    CAST(SUM(x) AS DECIMAL(38,0)) AS sx, CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
        |    CAST(SUM(x*y) AS DECIMAL(38,0)) AS sxy, CAST(SUM(x*x) AS DECIMAL(38,0)) AS sxx
        |  FROM c GROUP BY l_linenumber),
        |f AS (
        |  SELECT l_linenumber, n, sx, sy,
        |    CAST(n AS DECIMAL(38,0))*sxy - sx*sy AS num,
        |    CAST(n AS DECIMAL(38,0))*sxx - sx*sx AS den
        |  FROM a)
        |SELECT l_linenumber, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN num < 0 THEN -((-num * 1000000)  div  den)
        |            ELSE (num * 1000000)  div  den END AS BIGINT) AS slope_e6,
        |  CAST(CASE WHEN sy*den - num*sx < 0
        |            THEN -((-(sy*den - num*sx) * 100)  div  (CAST(n AS DECIMAL(38,0))*den))
        |            ELSE ((sy*den - num*sx) * 100)  div  (CAST(n AS DECIMAL(38,0))*den)
        |       END AS BIGINT) AS intercept_e2
        |FROM f ORDER BY l_linenumber""".stripMargin,
    "q_dedup_minhash" ->
      """WITH w AS (
        |  SELECT DISTINCT doc_id, explode(split(text, ' ')) AS tok
        |  FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    aggregate(filter(split(tok, ''), c -> c != ''),
        |      CAST(7 AS BIGINT),
        |      (a, c) -> (a * 31 + ascii(c)) % 2147483647) AS h
        |  FROM w),
        |mh AS (
        |  SELECT doc_id,
        |    MIN((h * 31 + 7) % 1000000007) AS m1,
        |    MIN((h * 37 + 11) % 1000000007) AS m2,
        |    MIN((h * 41 + 13) % 1000000007) AS m3,
        |    MIN((h * 43 + 17) % 1000000007) AS m4,
        |    MIN((h * 47 + 19) % 1000000007) AS m5,
        |    MIN((h * 53 + 23) % 1000000007) AS m6,
        |    MIN((h * 59 + 29) % 1000000007) AS m7,
        |    MIN((h * 61 + 31) % 1000000007) AS m8
        |  FROM th GROUP BY doc_id),
        |b AS (
        |  SELECT 1 AS band, m1 AS s1, m2 AS s2, m3 AS s3, m4 AS s4
        |  FROM mh
        |  UNION ALL
        |  SELECT 2, m5, m6, m7, m8 FROM mh),
        |g AS (
        |  SELECT band, s1, s2, s3, s4, COUNT(*) AS sz
        |  FROM b GROUP BY 1, 2, 3, 4, 5)
        |SELECT CAST(band AS BIGINT) AS band,
        |  CAST(sz AS BIGINT) AS bucket_size,
        |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  CAST(COUNT(*) * sz * (sz - 1) / 2 AS BIGINT)
        |    AS n_candidate_pairs
        |FROM g GROUP BY band, sz
        |ORDER BY band, bucket_size""".stripMargin,
    "q_dedup_overlap" ->
      """WITH f AS (
        |  SELECT DISTINCT source,
        |    md5(array_join(array_sort(array_distinct(
        |      split(text, ' '))), ' ')) AS fp
        |  FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
        |GROUP BY a.source, b.source
        |ORDER BY src_a, src_b""".stripMargin,
    "q_text_tvd" ->
      """WITH t AS (
        |  SELECT source, explode(split(text, ' ')) AS tok
        |  FROM documents),
        |st AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2),
        |tt AS (
        |  SELECT tok, SUM(c) AS nt FROM st GROUP BY tok),
        |g2 AS (
        |  SELECT tok, nt, SUM(nt) OVER () AS n FROM tt),
        |ks AS (
        |  SELECT source, SUM(c) AS k FROM st GROUP BY source),
        |grid AS (
        |  SELECT ks.source, ks.k, g2.tok, g2.nt, g2.n,
        |    COALESCE(st.c, 0) AS c
        |  FROM ks CROSS JOIN g2
        |  LEFT JOIN st ON st.source = ks.source AND st.tok = g2.tok)
        |SELECT source, CAST(MAX(k) AS BIGINT) AS n_tokens,
        |  CAST(SUM(ABS(n * c - k * nt)) AS BIGINT) AS tv_num,
        |  CAST(MAX(2 * n * k) AS BIGINT) AS tv_den,
        |  CAST(SUM(ABS(n * c - k * nt)) AS DOUBLE)
        |    / CAST(MAX(2 * n * k) AS DOUBLE) AS tv_distance
        |FROM grid GROUP BY source ORDER BY source""".stripMargin,
    "q_text_keyness" ->
      """WITH t AS (
        |  SELECT source, explode(split(text, ' ')) AS tok
        |  FROM documents),
        |st AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2),
        |tt AS (
        |  SELECT tok, CAST(SUM(c) AS BIGINT) AS nt FROM st GROUP BY tok),
        |g2 AS (
        |  SELECT tok, nt, CAST(SUM(nt) OVER () AS BIGINT) AS n FROM tt),
        |ks AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS k FROM st
        |  GROUP BY source),
        |cell AS (
        |  SELECT st.source, st.tok, st.c, g2.nt, g2.n, ks.k,
        |    CAST(g2.n * st.c - ks.k * g2.nt AS BIGINT) AS dev
        |  FROM st JOIN g2 ON st.tok = g2.tok
        |  JOIN ks ON st.source = ks.source),
        |sc AS (
        |  SELECT source, tok, c, nt, dev,
        |    CAST(n AS DOUBLE) * CAST(dev AS DOUBLE) * CAST(dev AS DOUBLE)
        |      / (CAST(k AS DOUBLE) * CAST(n - k AS DOUBLE)
        |        * CAST(nt AS DOUBLE) * CAST(n - nt AS DOUBLE))
        |      AS chi2_keyness
        |  FROM cell WHERE dev > 0),
        |r AS (
        |  SELECT source, tok, c, nt, dev, chi2_keyness,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY chi2_keyness DESC, tok) AS BIGINT) AS rnk
        |  FROM sc)
        |SELECT source, rnk, tok, c AS n_in_source, nt AS n_in_corpus,
        |  dev AS dev_num, chi2_keyness
        |FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,
    "q_stat_cuped" ->
      """WITH m AS (
        |  SELECT o_custkey AS k,
        |    SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |      THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |      ELSE 0 END) AS x,
        |    SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
        |      THEN CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |      ELSE 0 END) AS y
        |  FROM orders GROUP BY o_custkey),
        |a AS (
        |  SELECT k % 2 AS arm, COUNT(*) AS n_a, SUM(x) AS sx_a,
        |    SUM(y) AS sy_a,
        |    SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx_a,
        |    SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy_a
        |  FROM m GROUP BY k % 2),
        |g AS (
        |  SELECT arm, n_a, sx_a, sy_a,
        |    SUM(n_a) OVER () AS n, SUM(sx_a) OVER () AS sx,
        |    SUM(sy_a) OVER () AS sy, SUM(sxx_a) OVER () AS sxx,
        |    SUM(sxy_a) OVER () AS sxy
        |  FROM a),
        |d AS (
        |  SELECT arm, n_a, sx_a, sy_a, n, sx,
        |    (CAST(n AS DECIMAL(38,0)) * sxy
        |      - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000 AS th_num,
        |    CAST(n AS DECIMAL(38,0)) * sxx
        |      - CAST(sx AS DECIMAL(38,0)) * sx AS th_den
        |  FROM g),
        |t AS (
        |  SELECT arm, n_a, sx_a, sy_a, n, sx,
        |    CASE WHEN th_den = 0 THEN NULL
        |      WHEN th_num < 0 THEN CAST(-((-th_num) div th_den) AS BIGINT)
        |      ELSE CAST(th_num div th_den AS BIGINT) END AS theta_micro
        |  FROM d)
        |SELECT arm, CAST(n_a AS BIGINT) AS n_units,
        |  CAST(sx_a AS BIGINT) AS x_cents, CAST(sy_a AS BIGINT) AS y_cents,
        |  theta_micro,
        |  CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS y_mean,
        |  CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    - CAST(theta_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)
        |      * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |         - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS y_adj
        |FROM t ORDER BY arm""".stripMargin,
    "q_stat_spearman" ->
      """WITH r AS (
        |  SELECT l_linenumber,
        |    ROW_NUMBER() OVER (PARTITION BY l_linenumber
        |      ORDER BY l_quantity, l_orderkey, l_partkey, l_suppkey) AS rx,
        |    ROW_NUMBER() OVER (PARTITION BY l_linenumber
        |      ORDER BY l_extendedprice, l_orderkey, l_partkey, l_suppkey) AS ry
        |  FROM lineitem),
        |a AS (
        |  SELECT l_linenumber, COUNT(*) AS n,
        |    CAST(SUM((rx - ry) * (rx - ry)) AS DECIMAL(38,0)) AS sd2
        |  FROM r GROUP BY l_linenumber),
        |f AS (
        |  SELECT l_linenumber, n,
        |    (CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) - 1)
        |      - 6 * sd2) * 1000000 AS num,
        |    CAST(n AS DECIMAL(38,0)) * (CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) - 1)
        |      AS den
        |  FROM a)
        |SELECT l_linenumber, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN num < 0 THEN -((-num)  div  den) ELSE num  div  den END
        |       AS BIGINT) AS rho_e6
        |FROM f ORDER BY l_linenumber""".stripMargin,
    "q_stat_winsorize" ->
      """WITH ranked AS (
        |  SELECT l_suppkey, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_suppkey) AS n
        |  FROM lineitem),
        |w AS (
        |  SELECT l_suppkey, l_extendedprice, n,
        |    MAX(CASE WHEN rn = (5*n+99) div 100 THEN l_extendedprice END)
        |      OVER (PARTITION BY l_suppkey) AS lo,
        |    MAX(CASE WHEN rn = (95*n+99) div 100 THEN l_extendedprice END)
        |      OVER (PARTITION BY l_suppkey) AS hi
        |  FROM ranked)
        |SELECT l_suppkey, MAX(n) AS n,
        |  COUNT(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
        |             THEN 1 END) AS n_clipped,
        |  MIN(lo) AS lo, MIN(hi) AS hi,
        |  ((CASE WHEN (CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4))) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4))) - FLOOR(ABS(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS DECIMAL(5,4)) AS DOUBLE))) AS sum_raw,
        |  ((CASE WHEN (CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, lo), hi) AS DECIMAL(18,4))) AS DECIMAL(18,4))) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, lo), hi) AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, lo), hi) AS DECIMAL(18,4))) AS DECIMAL(18,4))) - FLOOR(ABS(CAST(SUM(CAST(LEAST(GREATEST(l_extendedprice, lo), hi) AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS DECIMAL(5,4)) AS DOUBLE))) AS sum_wins
        |FROM w GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    "q_str_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up_name,
        |  lower(p_brand) AS lo_brand,
        |  substring(p_name, 1, 8) AS name8,
        |  trim(p_name) AS trimmed,
        |  concat_ws('|', p_brand, p_name) AS joined,
        |  lpad(p_brand, 12, '*') AS padded,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  replace(p_name, ' ', '_') AS snake,
        |  element_at(split(p_name, ' '), 1) AS first_tok
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_table_checksum" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(CAST(conv(substr(md5(
        |    l_orderkey || '|' || l_linenumber || '|' || l_returnflag || '|' ||
        |    l_linestatus || '|' || CAST(CAST(l_shipdate AS DATE) AS STRING) || '|' ||
        |    CAST(CAST(l_quantity AS DECIMAL(12,4)) AS STRING)), 1, 15), 16, 10)
        |    AS BIGINT) AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS STRING) AS checksum
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_text_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id, split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, explode(transform(sequence(1, (size(tk) - 1) - 1),
        |    i -> element_at(tk, i) || ' ' || element_at(tk, i+1) || ' ' || element_at(tk, i+2))) AS gram
        |  FROM t)
        |SELECT gram, COUNT(*) AS n_total, COUNT(DISTINCT doc_id) AS n_docs
        |FROM g GROUP BY gram
        |ORDER BY n_total DESC, gram LIMIT 50""".stripMargin,
    "q_text_chunk" ->
      """SELECT doc_id, CAST((start - 1)  div  40 AS BIGINT) AS chunk_id,
        |  CAST(size(slice(toks, start, (start + 49) - (start) + 1)) AS BIGINT) AS n_tok,
        |  array_join(slice(toks, start, (start + 49) - (start) + 1), ' ') AS chunk_text
        |FROM (
        |  SELECT doc_id, toks,
        |    explode(sequence(1, greatest(size(toks), 1), 40)) AS start
        |  FROM (SELECT doc_id, split(text, ' ') AS toks
        |        FROM documents))
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q_text_contamination" ->
      """WITH tok AS (SELECT doc_id, split(text, ' ') AS toks
        |             FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    element_at(toks, i) || ' ' || element_at(toks, i+1) || ' ' || element_at(toks, i+2) || ' ' ||
        |    element_at(toks, i+3) || ' ' || element_at(toks, i+4) AS gram
        |  FROM tok, LATERAL (SELECT explode(
        |    sequence(1, size(toks) - 4)) AS i) g),
        |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 10)
        |SELECT g.doc_id, COUNT(*) AS n_shared
        |FROM grams g JOIN bench b ON g.gram = b.gram
        |WHERE g.doc_id >= 10
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "q_text_diversity" ->
      """WITH tok AS (SELECT doc_id, explode(split(text, ' ')) AS w
        |             FROM documents),
        |cnt AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_tok,
        |  COUNT(*) AS n_types,
        |  CAST(MAX(c) AS BIGINT) AS top_count,
        |  1.0e0 - CAST(SUM(c * c) AS DOUBLE) /
        |    (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS simpson
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      """WITH tk AS (
        |  SELECT doc_id, split(text, ' ') AS toks FROM documents),
        |pos AS (
        |  SELECT doc_id, i, element_at(toks, i) AS tok
        |  FROM tk, LATERAL (SELECT explode(sequence(1, size(toks))) AS i) g)
        |SELECT doc_id,
        |  CAST(SUM(i * aggregate(transform(filter(split(tok, ''), c -> c != ''), c -> CAST(ascii(c) AS BIGINT)), CAST(7 AS BIGINT), (a, b) -> (a * 31 + b) % 2147483647)) % 1000000007 AS BIGINT) AS fp
        |FROM pos GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_jaccard_pairs" ->
      """WITH t AS (
        |  SELECT lang, source, doc_id,
        |    array_distinct(split(text, ' ')) AS toks
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(size(array_intersect(a.toks, b.toks)) AS DOUBLE)
        |      / (size(a.toks) + size(b.toks) - size(array_intersect(a.toks, b.toks))) AS jac
        |  FROM t a JOIN t b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT d1, d2, jac FROM p
        |WHERE jac >= 0.5
        |ORDER BY d1, d2""".stripMargin,
    "q_text_langid" ->
      """WITH tri AS (
        |  SELECT doc_id, lang,
        |    explode(transform(sequence(1, (length(text) - 1) - 1),
        |                          i -> substring(text, i, 3))) AS tg
        |  FROM documents),
        |prof AS (
        |  SELECT lang, tg FROM (
        |    SELECT lang, tg, row_number() OVER (PARTITION BY lang
        |      ORDER BY COUNT(*) DESC, tg) AS rn
        |    FROM tri GROUP BY lang, tg) p
        |  WHERE rn <= 10),
        |docset AS (SELECT DISTINCT doc_id, tg FROM tri),
        |score AS (
        |  SELECT d.doc_id, p.lang, COUNT(*) AS ov
        |  FROM docset d JOIN prof p ON d.tg = p.tg
        |  GROUP BY d.doc_id, p.lang),
        |pred AS (
        |  SELECT doc_id, lang AS pred_lang, ov,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY ov DESC, lang) AS rn
        |  FROM score)
        |SELECT doc_id, pred_lang, ov FROM pred WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q_text_lm_score" ->
      """WITH tok AS (SELECT doc_id, split(text, ' ') AS toks
        |             FROM documents),
        |bg AS (SELECT doc_id, element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2
        |       FROM tok, LATERAL (SELECT explode(
        |         sequence(1, size(toks) - 1)) AS i) g),
        |c2 AS (SELECT w1, w2, COUNT(*) AS cbg FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, COUNT(*) AS cpre FROM bg GROUP BY w1),
        |d AS (SELECT b.doc_id, COUNT(*) AS n_bigrams,
        |        CAST(SUM(c2.cbg) AS BIGINT) AS num,
        |        CAST(SUM(c1.cpre) AS BIGINT) AS den
        |      FROM bg b JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
        |                JOIN c1 ON b.w1 = c1.w1
        |      GROUP BY b.doc_id)
        |SELECT doc_id, n_bigrams, num, den,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS lm_score
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_text_normalize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN replace(text, 'a', 'á')
        |         WHEN doc_id % 3 = 1 THEN upper(text)
        |         ELSE text END AS raw
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, raw, graft_normalize(raw) AS norm
        |  FROM d)
        |SELECT doc_id, length(norm) AS norm_len,
        |  CASE WHEN norm = raw THEN 0 ELSE 1 END AS changed,
        |  md5(norm) AS h
        |FROM n ORDER BY doc_id""".stripMargin,
    "q_text_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang, doc_id % 64 AS shard,
        |    CAST(size(split(text, ' ')) AS BIGINT) AS toks
        |  FROM documents),
        |c AS (
        |  SELECT lang, shard, toks,
        |    SUM(toks) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT lang, shard,
        |  CAST(FLOOR(CAST(cum - toks AS DOUBLE) / 2048.0e0) AS BIGINT) AS bin_id,
        |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY lang, shard, FLOOR(CAST(cum - toks AS DOUBLE) / 2048.0e0)
        |ORDER BY lang, shard, bin_id""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(n_chars - (size(split(text, ' ')) - 1) AS DOUBLE)
        |    / size(split(text, ' ')) AS avg_tok_len,
        |  CAST(size(filter(split(text, ' '),
        |       t -> t IN ('join', 'hash', 'row'))) AS DOUBLE)
        |    / size(split(text, ' ')) AS stop_ratio,
        |  CAST(size(split(text, ' ')) AS DOUBLE) / 100
        |    - CAST(size(filter(split(text, ' '),
        |         t -> t IN ('join', 'hash', 'row'))) AS DOUBLE)
        |      / size(split(text, ' ')) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_redact" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || ' Contact user' || CAST(doc_id AS STRING) || '@example.com'
        |      || CASE WHEN doc_id % 4 = 0 THEN ' cc admin.team+x@example.org' ELSE '' END
        |      || CASE WHEN doc_id % 2 = 0 THEN ' or +1-555-' ||
        |              lpad(CAST(doc_id % 10000 AS STRING), 4, '0') ELSE '' END
        |      || ' today.' AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  size(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0)) AS n_emails,
        |  size(regexp_extract_all(raw, '\\+1-555-[0-9]{4}', 0)) AS n_phones,
        |  md5(regexp_replace(regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>'),
        |                     '\\+1-555-[0-9]{4}', '<PHONE>')) AS h
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_text_repetition" ->
      """SELECT doc_id,
        |  CAST(size(toks) AS BIGINT) AS n_tok,
        |  CAST(size(toks) - size(array_distinct(toks)) AS DOUBLE) / size(toks)
        |    AS dup_word_frac,
        |  CASE WHEN size(bg) > 0
        |    THEN CAST(size(bg) - size(array_distinct(bg)) AS DOUBLE) / size(bg)
        |    ELSE 0.0 END AS dup_bigram_frac
        |FROM (
        |  SELECT doc_id, toks,
        |    CASE WHEN size(toks) >= 2
        |      THEN transform(sequence(1, (size(toks)) - 1),
        |             i -> element_at(toks, i) || ' ' || element_at(toks, i + 1))
        |      ELSE array() END AS bg
        |  FROM (SELECT doc_id, split(text, ' ') AS toks
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "q_text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, explode(split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT doc_id, term, tf, df, score, rn FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(tf.tf * n.n AS DOUBLE) / df.df AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.term) AS rn
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n) t
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "q_text_token_count" ->
      """SELECT lang,
        |  CAST(SUM(size(split(text, ' '))) AS BIGINT) AS ws_tokens,
        |  CAST(SUM(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))) AS BIGINT) AS re_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_tokens_tf" ->
      """SELECT token, COUNT(*) AS cnt
        |FROM (SELECT explode(split(text, ' ')) AS token FROM documents) t
        |GROUP BY token
        |ORDER BY cnt DESC, token
        |LIMIT 20""".stripMargin,
    "q_time_ewma" ->
      """SELECT user_id, COUNT(*) AS n,
        |  aggregate(transform(array_sort(collect_list(struct(ts, event_id, value))),
        |    s -> s.value), CAST(0 AS DOUBLE), (a, b) -> a / 2 + b / 2) AS ewma
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_time_gapfill" ->
      """WITH e AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket
        |  FROM events WHERE event_type = 'click'),
        |a AS (SELECT bucket, COUNT(*) AS cnt FROM e GROUP BY bucket),
        |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM e),
        |s AS (SELECT explode(sequence(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM b)
        |SELECT s.bucket, COALESCE(a.cnt, CAST(0 AS BIGINT)) AS cnt
        |FROM s LEFT JOIN a ON s.bucket = a.bucket
        |ORDER BY s.bucket""".stripMargin,
    "q_time_interp" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, value
        |  FROM events WHERE event_type = 'purchase' AND user_id < 5),
        |a AS (SELECT user_id, bucket, max(value) AS v FROM e GROUP BY user_id, bucket),
        |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM e),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s AS (SELECT u.user_id, explode(sequence(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |      FROM b, u),
        |g AS (
        |  SELECT s.user_id, s.bucket, a.v,
        |    row_number() OVER (PARTITION BY s.user_id ORDER BY s.bucket) AS i
        |  FROM s LEFT JOIN a ON s.user_id = a.user_id AND s.bucket = a.bucket),
        |sel AS (
        |  SELECT user_id, bucket, v, i,
        |    last_value(v) IGNORE NULLS OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN i END) IGNORE NULLS OVER wp AS pi,
        |    first_value(v) IGNORE NULLS OVER wf AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN i END) IGNORE NULLS OVER wf AS ni
        |  FROM g
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY user_id ORDER BY i
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, bucket,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) *
        |         (CAST(i - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE)) END AS interp
        |FROM sel ORDER BY user_id, bucket""".stripMargin,
    "q_time_locf" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, value
        |  FROM events WHERE event_type = 'purchase' AND user_id < 5),
        |a AS (SELECT user_id, bucket, max(value) AS v FROM e GROUP BY user_id, bucket),
        |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM e),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s AS (SELECT user_id, explode(sequence(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |      FROM b, u)
        |SELECT s.user_id, s.bucket,
        |  last_value(v) IGNORE NULLS OVER (PARTITION BY s.user_id ORDER BY s.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM s LEFT JOIN a ON s.user_id = a.user_id AND s.bucket = a.bucket
        |ORDER BY 1, 2""".stripMargin,
    "q_time_rolling_distinct" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |vis AS (
        |  SELECT user_id, day + CAST(k AS INTEGER) AS vday
        |  FROM ud, (SELECT explode(sequence(0, (7) - 1)) AS k) ks),
        |spine AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS vday
        |          FROM events)
        |SELECT CAST(s.vday AS TIMESTAMP) AS day,
        |       COUNT(DISTINCT v.user_id) AS u7
        |FROM spine s JOIN vis v ON v.vday = s.vday
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q_time_to_next" ->
      """WITH seq AS (
        |  SELECT user_id, event_type, ts, unix_micros(cast(ts as timestamp)) AS us,
        |    MIN(CASE WHEN event_type = 'view' THEN unix_micros(cast(ts as timestamp)) END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS next_view_us
        |  FROM events)
        |SELECT CAST(hour(ts) AS INTEGER) AS hh, COUNT(*) AS n_purchases,
        |  COUNT(next_view_us) AS n_matched,
        |  CAST(SUM(next_view_us - us) AS BIGINT) AS sum_latency_us,
        |  CAST(SUM(next_view_us - us) AS DOUBLE) / COUNT(next_view_us)
        |    AS mean_latency_us
        |FROM seq WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY hh""".stripMargin,
    "q_tpch_q11" ->
      """WITH ps0 AS (
        |  SELECT p_partkey, (p_partkey*7 + i*13) % (SELECT COUNT(*) FROM supplier) AS sk
        |  FROM part, (SELECT explode(sequence(0,3)) AS i)),
        |partsupp AS (
        |  SELECT p_partkey AS ps_partkey, sk AS ps_suppkey,
        |    CAST((p_partkey*23 + sk*31) % 9999 + 1 AS INTEGER) AS ps_availqty,
        |    CAST((p_partkey*17 + sk*13) % 99900 + 100 AS BIGINT) / 100.0 AS ps_supplycost
        |  FROM ps0),
        |natps AS (
        |  SELECT ps_partkey,
        |    CAST(CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty
        |      AS DECIMAL(18,4)) AS val
        |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7')
        |SELECT ps_partkey, ((CASE WHEN (value) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(value)) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(value) - FLOOR(ABS(value)) AS DECIMAL(5,4)) AS DOUBLE))) AS value
        |FROM (
        |  SELECT ps_partkey, CAST(SUM(val) AS DECIMAL(18,4)) AS value
        |  FROM natps GROUP BY ps_partkey
        |  HAVING SUM(val) * 10000 > (SELECT SUM(val) FROM natps))
        |ORDER BY value DESC, ps_partkey""".stripMargin,
    "q_tpch_q16" ->
      """WITH ps0 AS (
        |  SELECT p_partkey, (p_partkey*7 + i*13) % (SELECT COUNT(*) FROM supplier) AS sk
        |  FROM part, (SELECT explode(sequence(0,3)) AS i)),
        |partsupp AS (
        |  SELECT p_partkey AS ps_partkey, sk AS ps_suppkey,
        |    CAST((p_partkey*23 + sk*31) % 9999 + 1 AS INTEGER) AS ps_availqty,
        |    CAST((p_partkey*17 + sk*13) % 99900 + 100 AS BIGINT) / 100.0 AS ps_supplycost
        |  FROM ps0)
        |SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND ps_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q2" ->
      """WITH ps0 AS (
        |  SELECT p_partkey, (p_partkey*7 + i*13) % (SELECT COUNT(*) FROM supplier) AS sk
        |  FROM part, (SELECT explode(sequence(0,3)) AS i)),
        |partsupp AS (
        |  SELECT p_partkey AS ps_partkey, sk AS ps_suppkey,
        |    CAST((p_partkey*23 + sk*31) % 9999 + 1 AS INTEGER) AS ps_availqty,
        |    CAST((p_partkey*17 + sk*13) % 99900 + 100 AS BIGINT) / CAST(100.0 AS DOUBLE) AS ps_supplycost
        |  FROM ps0),
        |eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |cand AS (
        |  SELECT p_partkey, p_brand, ps_supplycost, s_name, s_acctbal, n_name
        |  FROM part JOIN partsupp ON p_partkey = ps_partkey
        |  JOIN eu ON ps_suppkey = s_suppkey
        |  WHERE p_size <= 10 AND p_type = 'STANDARD')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
        |FROM cand JOIN (
        |  SELECT p_partkey AS m_partkey, MIN(ps_supplycost) AS min_cost
        |  FROM cand GROUP BY p_partkey) ON p_partkey = m_partkey
        |WHERE ps_supplycost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q_tpch_q20" ->
      """WITH ps0 AS (
        |  SELECT p_partkey, (p_partkey*7 + i*13) % (SELECT COUNT(*) FROM supplier) AS sk
        |  FROM part, (SELECT explode(sequence(0,3)) AS i)),
        |partsupp AS (
        |  SELECT p_partkey AS ps_partkey, sk AS ps_suppkey,
        |    CAST((p_partkey*23 + sk*31) % 9999 + 1 AS INTEGER) AS ps_availqty,
        |    CAST((p_partkey*17 + sk*13) % 99900 + 100 AS BIGINT) / 100.0 AS ps_supplycost
        |  FROM ps0)
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'AMERICA' AND s_suppkey IN (
        |  SELECT ps_suppkey FROM partsupp
        |  JOIN part ON p_partkey = ps_partkey
        |  JOIN (
        |    SELECT l_partkey, l_suppkey,
        |      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |        AS DECIMAL(18,4)) AS shipped
        |    FROM lineitem
        |    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY l_partkey, l_suppkey)
        |    ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |  WHERE p_name LIKE 'blue%'
        |    AND CAST(ps_availqty AS DECIMAL(18,4)) > shipped * 100)
        |ORDER BY s_name""".stripMargin,
    "q_tpch_q9" ->
      """WITH ps0 AS (
        |  SELECT p_partkey, (p_partkey*7 + i*13) % (SELECT COUNT(*) FROM supplier) AS sk
        |  FROM part, (SELECT explode(sequence(0,3)) AS i)),
        |partsupp AS (
        |  SELECT p_partkey AS ps_partkey, sk AS ps_suppkey,
        |    CAST((p_partkey*23 + sk*31) % 9999 + 1 AS INTEGER) AS ps_availqty,
        |    CAST((p_partkey*17 + sk*13) % 99900 + 100 AS BIGINT) / 100.0 AS ps_supplycost
        |  FROM ps0)
        |SELECT nation, o_year, ((CASE WHEN (profit) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(profit)) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(profit) - FLOOR(ABS(profit)) AS DECIMAL(5,4)) AS DOUBLE))) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) *
        |        (1 - CAST(l_discount AS DECIMAL(19,4))) -
        |        CAST(ps_supplycost AS DECIMAL(18,4)) *
        |        CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS profit
        |  FROM lineitem
        |  JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  WHERE p_name LIKE 'red%'
        |  GROUP BY n_name, YEAR(o_orderdate))
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q_udtf_bigrams" ->
      """WITH tk AS (SELECT split(text, ' ') AS toks FROM documents)
        |SELECT bigram, COUNT(*) AS cnt FROM (
        |  SELECT element_at(toks, i) || ' ' || element_at(toks, i + 1) AS bigram
        |  FROM tk, LATERAL (SELECT explode(sequence(1, size(toks) - 1)) AS i) g) b
        |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,
    "q_window_lag_lead" ->
      """SELECT user_id, event_id, ts,
        |  date_diff(MICROSECOND, lag(ts) OVER w, ts) AS gap_us,
        |  lead(event_type) OVER w AS next_type
        |FROM events
        |WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_window_median_sliding" ->
      """SELECT user_id, event_id, value,
        |  element_at(win, CAST((size(win) + 1) div 2 AS INT)) AS med7
        |FROM (
        |  SELECT user_id, event_id, value,
        |    array_sort(collect_list(value) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        |  FROM events)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_window_range_frame" ->
      """SELECT user_id, event_id, cnt_24h, ((CASE WHEN (sum_24h) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(sum_24h)) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(sum_24h) - FLOOR(ABS(sum_24h)) AS DECIMAL(5,4)) AS DOUBLE))) AS sum_24h FROM (
        |  SELECT user_id, event_id,
        |    COUNT(*) OVER w AS cnt_24h,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4)) AS sum_24h
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY unix_micros(cast(ts as timestamp))
        |               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)) t
        |ORDER BY user_id, event_id""".stripMargin,
    "q_window_sliding_batch" ->
      """WITH b AS (
        |  SELECT event_type, value,
        |    timestamp_micros((unix_micros(cast(ts as timestamp))  div  1800000000) * 1800000000 - k * 1800000000) AS ws
        |  FROM events, (SELECT explode(array(0, 1)) AS k) ks)
        |SELECT ws AS window_start, event_type, COUNT(*) AS cnt, ((CASE WHEN (CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))) < 0 THEN -1.0e0 ELSE 1.0e0 END) * (CAST(CAST(FLOOR(ABS(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS BIGINT) AS DOUBLE) + CAST(CAST(ABS(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))) - FLOOR(ABS(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)))) AS DECIMAL(5,4)) AS DOUBLE))) AS sum_value
        |FROM b
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    // novelty: string_split -> split, toks[i] -> element_at, the
    // LATERAL generate_series row expansion -> LATERAL VIEW
    // explode(sequence) (both 1-based, both end-inclusive)
    "q_text_novelty" ->
      """WITH tk AS (
        |  SELECT doc_id, split(text, ' ') AS toks
        |  FROM documents WHERE size(split(text, ' ')) > 1),
        |bg AS (
        |  SELECT DISTINCT doc_id,
        |    concat(element_at(toks, i), ' ', element_at(toks, i + 1)) AS bg
        |  FROM tk LATERAL VIEW explode(sequence(1, size(toks) - 1)) g AS i),
        |f AS (
        |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY bg) AS first_doc
        |  FROM bg)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS novelty_share
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // zipf: string_split -> split, unnest -> explode (same window text)
    "q_text_zipf" ->
      """WITH t AS (
        |  SELECT explode(split(text, ' ')) AS term FROM documents),
        |c AS (
        |  SELECT term, COUNT(*) AS cnt FROM t WHERE term <> ''
        |  GROUP BY term),
        |r AS (
        |  SELECT term, cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rnk,
        |    SUM(cnt) OVER () AS total,
        |    SUM(cnt) OVER (ORDER BY cnt DESC, term
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM c)
        |SELECT CAST(rnk AS BIGINT) AS rnk, term, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(rnk * cnt AS BIGINT) AS zipf_product,
        |  CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
        |FROM r WHERE rnk <= 30 ORDER BY rnk""".stripMargin,
    // collocation: string_split -> split, toks[i] -> element_at, the
    // LATERAL generate_series expansion -> LATERAL VIEW explode(sequence)
    "q_text_collocation" ->
      """WITH tk AS (
        |  SELECT doc_id, split(text, ' ') AS toks FROM documents
        |  WHERE size(split(text, ' ')) > 1),
        |u AS (
        |  SELECT w, COUNT(*) AS c FROM (
        |    SELECT explode(toks) AS w FROM tk) t
        |  WHERE w <> '' GROUP BY w),
        |b AS (
        |  SELECT w1, w2, COUNT(*) AS cab FROM (
        |    SELECT element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2
        |    FROM tk LATERAL VIEW explode(sequence(1, size(toks) - 1)) g AS i
        |  ) p
        |  WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2),
        |nt AS (SELECT CAST(SUM(c) AS BIGINT) AS nu FROM u),
        |nb AS (SELECT CAST(SUM(cab) AS BIGINT) AS nbi FROM b),
        |j AS (
        |  SELECT b.w1, b.w2, b.cab, u1.c AS ca, u2.c AS cb, nt.nu, nb.nbi
        |  FROM b JOIN u u1 ON b.w1 = u1.w JOIN u u2 ON b.w2 = u2.w
        |  CROSS JOIN nt CROSS JOIN nb)
        |SELECT w1, w2, CAST(cab AS BIGINT) AS n_ab,
        |  CAST(ca AS BIGINT) AS n_a, CAST(cb AS BIGINT) AS n_b,
        |  (CAST(cab AS DOUBLE) / CAST(nbi AS DOUBLE)) /
        |    ((CAST(ca AS DOUBLE) / CAST(nu AS DOUBLE)) *
        |     (CAST(cb AS DOUBLE) / CAST(nu AS DOUBLE))) AS lift
        |FROM j ORDER BY n_ab DESC, w1, w2 LIMIT 20""".stripMargin,
    // hapax: string_split -> split, unnest -> explode
    "q_text_hapax" ->
      """WITH t AS (
        |  SELECT source, explode(split(text, ' ')) AS w
        |  FROM documents),
        |c AS (
        |  SELECT source, w, COUNT(*) AS c FROM t WHERE w <> ''
        |  GROUP BY source, w)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS vocab,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  CAST(SUM(c) AS BIGINT) AS tokens,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS hapax_share
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // chi-square: HUGEINT -> tightly-capped DECIMAL(38,0), // -> div
    // (scale-0 decimals never round — they only overflow loudly, so the
    // truncated rationals stay exact)
    "q_stat_chi2" ->
      """WITH ob AS (
        |  SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS o
        |  FROM lineitem GROUP BY rf, ls),
        |m AS (
        |  SELECT rf, ls, o,
        |    CAST(SUM(o) OVER (PARTITION BY rf) AS DECIMAL(38,0)) AS r,
        |    CAST(SUM(o) OVER (PARTITION BY ls) AS DECIMAL(38,0)) AS c,
        |    CAST(SUM(o) OVER () AS DECIMAL(38,0)) AS n
        |  FROM ob),
        |t AS (
        |  SELECT rf, ls, o, r, c, n, n * o - r * c AS dev FROM m)
        |SELECT rf AS l_returnflag, ls AS l_linestatus,
        |  CAST(o AS BIGINT) AS n_obs,
        |  CAST((r * c) div n AS BIGINT) AS expected_trunc,
        |  CAST((dev * dev * 1000000) div (n * r * c) AS BIGINT)
        |    AS chi2_term_e6
        |FROM t ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_stat_benford" ->
      """WITH v AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)
        |    AS cents
        |  FROM orders)
        |SELECT CAST(SUBSTRING(CAST(cents AS STRING), 1, 1) AS BIGINT)
        |    AS digit,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM v GROUP BY 1 ORDER BY digit""".stripMargin,
    "q_event_anomaly" ->
      """WITH b AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, COUNT(*) AS m,
        |    CAST(SUM(n) AS DECIMAL(38,0)) AS s,
        |    CAST(SUM(n * n) AS DECIMAL(38,0)) AS q
        |  FROM b GROUP BY event_type)
        |SELECT b.event_type, b.h AS hour, CAST(b.n AS BIGINT) AS n,
        |  CAST((CAST(st.m AS DECIMAL(38,0)) * b.n - st.s)
        |       * (CAST(st.m AS DECIMAL(38,0)) * b.n - st.s)
        |       - 9 * (CAST(st.m AS DECIMAL(38,0)) * st.q - st.s * st.s)
        |       AS BIGINT) AS margin
        |FROM b JOIN st ON b.event_type = st.event_type
        |WHERE (CAST(st.m AS DECIMAL(38,0)) * b.n - st.s)
        |      * (CAST(st.m AS DECIMAL(38,0)) * b.n - st.s)
        |      > 9 * (CAST(st.m AS DECIMAL(38,0)) * st.q - st.s * st.s)
        |ORDER BY b.event_type, hour""".stripMargin,
    "q_agg_hhi" ->
      """WITH c AS (
        |  SELECT l_linestatus AS st, l_suppkey,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS DECIMAL(16,0)) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |a AS (
        |  SELECT st, COUNT(*) AS n_supp, SUM(q) AS s,
        |    SUM(CAST(q * q AS DECIMAL(33,0))) AS q2
        |  FROM c GROUP BY st)
        |SELECT st AS l_linestatus, CAST(n_supp AS BIGINT) AS n_supp,
        |  CAST((q2 * 1000000) div (s * s) AS BIGINT) AS hhi_e6
        |FROM a ORDER BY st""".stripMargin,
    "q_stat_mannwhitney" ->
      """WITH s AS (
        |  SELECT l_linestatus AS st,
        |    CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS isa
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        |h AS (
        |  SELECT st, v, SUM(isa) AS ca, COUNT(*) AS c
        |  FROM s GROUP BY st, v),
        |r AS (
        |  SELECT st, ca, c,
        |    COALESCE(SUM(c) OVER (PARTITION BY st ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM h),
        |agg AS (
        |  SELECT st,
        |    CAST(SUM(ca) AS BIGINT) AS n1,
        |    CAST(SUM(c - ca) AS BIGINT) AS n2,
        |    CAST(SUM(CAST(ca * (2 * cum + c + 1) AS DECIMAL(25,0)))
        |      AS DECIMAL(38,0)) AS r1x2
        |  FROM r GROUP BY st)
        |SELECT st AS l_linestatus, n1, n2,
        |  CAST(r1x2 - CAST(n1 AS DECIMAL(19,0)) * (n1 + 1) AS BIGINT) AS u1_x2
        |FROM agg ORDER BY l_linestatus""".stripMargin,
    "q_url_normalize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'HTTP://Site' || CAST((doc_id div 4) % 13 AS STRING)
        |        || '.COM:80/docs/' || CAST((doc_id div 4) % 7 AS STRING)
        |        || '?b=2&a=1#frag'
        |      WHEN 1 THEN 'http://site' || CAST((doc_id div 4) % 13 AS STRING)
        |        || '.com/docs/' || CAST((doc_id div 4) % 7 AS STRING) || '?a=1&b=2'
        |      WHEN 2 THEN 'HTTPS://Site' || CAST((doc_id div 4) % 13 AS STRING)
        |        || '.COM:443/docs/' || CAST((doc_id div 4) % 7 AS STRING)
        |        || '/?a=1&b=2'
        |      ELSE 'https://site' || CAST((doc_id div 4) % 13 AS STRING)
        |        || '.com/docs/' || CAST((doc_id div 4) % 7 AS STRING) || '/'
        |    END AS url
        |  FROM documents),
        |q AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(nf, '^([A-Za-z]+)://', 1)) AS scheme,
        |    regexp_replace(nf, '^[A-Za-z]+://', '') AS rest
        |  FROM (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM d)),
        |r AS (
        |  SELECT doc_id, scheme,
        |    lower(regexp_replace(regexp_extract(rest, '^([^/?]+)', 1),
        |                         ':(80|443)$', '')) AS host,
        |    substring(rest,
        |      length(regexp_extract(rest, '^([^/?]+)', 1)) + 1) AS pathq
        |  FROM q),
        |c AS (
        |  SELECT doc_id, scheme, host,
        |    regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
        |                   '/+$', '') AS path,
        |    array_join(array_sort(split(
        |      regexp_extract(pathq, '[?](.*)$', 1), '&')), '&') AS sq
        |  FROM r),
        |n AS (
        |  SELECT doc_id, scheme || '://' || host || path ||
        |    CASE WHEN sq <> '' THEN '?' || sq ELSE '' END AS canon
        |  FROM c)
        |SELECT canon, COUNT(*) AS n_docs,
        |  CAST(MIN(doc_id) AS BIGINT) AS keeper,
        |  CAST(SUM(doc_id) AS BIGINT) AS doc_sum
        |FROM n GROUP BY canon HAVING COUNT(*) > 1
        |ORDER BY canon""".stripMargin,
    // readability: len -> size, 2-arg regexp_extract_all -> 3-arg with
    // explicit group 0 (Spark's default group index is 1)
    "q_text_readability" ->
      """WITH d AS (
        |  SELECT source,
        |    size(regexp_extract_all(text, '[^ ]+', 0)) AS w,
        |    size(regexp_extract_all(text, '[.!?]+', 0)) AS st,
        |    size(regexp_extract_all(lower(text), '[aeiou]+', 0)) AS vg
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(w) AS BIGINT) AS words,
        |  CAST(SUM(st) AS BIGINT) AS sentences,
        |  CAST(SUM(vg) AS BIGINT) AS vowel_groups,
        |  CAST(206.835 AS DOUBLE)
        |    - CAST(1.015 AS DOUBLE) * (CAST(SUM(w) AS DOUBLE)
        |        / CAST(GREATEST(SUM(st), 1) AS DOUBLE))
        |    - CAST(84.6 AS DOUBLE) * (CAST(SUM(vg) AS DOUBLE)
        |        / CAST(GREATEST(SUM(w), 1) AS DOUBLE)) AS flesch
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q_sketch_cms" ->
      """WITH k AS (
        |  SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |b AS (
        |  SELECT rr.r, pk, c,
        |    CAST(conv(substr(md5(CAST(rr.r AS STRING) || ':'
        |      || CAST(pk AS STRING)), 1, 8), 16, 10) AS BIGINT)
        |      % 256 AS bkt
        |  FROM k CROSS JOIN (SELECT explode(array(0, 1, 2, 3)) AS r) rr),
        |cnt AS (
        |  SELECT r, bkt, CAST(SUM(c) AS BIGINT) AS counter
        |  FROM b GROUP BY r, bkt),
        |top AS (
        |  SELECT pk, c FROM k ORDER BY c DESC, pk LIMIT 10),
        |est AS (
        |  SELECT t.pk, t.c AS true_cnt,
        |    CAST(MIN(cnt.counter) AS BIGINT) AS est_cnt
        |  FROM top t
        |  JOIN b ON b.pk = t.pk
        |  JOIN cnt ON cnt.r = b.r AND cnt.bkt = b.bkt
        |  GROUP BY t.pk, t.c)
        |SELECT pk AS l_partkey, true_cnt, est_cnt,
        |  CAST(est_cnt - true_cnt AS BIGINT) AS overcount
        |FROM est ORDER BY true_cnt DESC, l_partkey""".stripMargin,
    "q_text_burstiness" ->
      """WITH tk AS (
        |  SELECT doc_id, w
        |  FROM documents LATERAL VIEW explode(split(text, ' ')) t AS w),
        |tw AS (
        |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tk WHERE w <> '' GROUP BY 1, 2),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |top AS (
        |  SELECT w, CAST(SUM(c) AS BIGINT) AS tf,
        |    CAST(SUM(c * c) AS BIGINT) AS tf2,
        |    CAST(COUNT(*) AS BIGINT) AS df
        |  FROM tw GROUP BY w
        |  ORDER BY SUM(c) DESC, w LIMIT 20)
        |SELECT w AS term, df, tf, tf2, n_docs,
        |  CAST(n_docs * tf2 - tf * tf AS BIGINT) AS var_num,
        |  CAST(n_docs * tf2 - tf * tf AS DOUBLE)
        |    / CAST(n_docs * tf AS DOUBLE) AS fano
        |FROM top CROSS JOIN nd ORDER BY tf DESC, term""".stripMargin,
    "q_embed_pq" ->
      """WITH e AS (
        |  SELECT vec_id, pos + 1 AS i,
        |    CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS q
        |  FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, x),
        |sv AS (
        |  SELECT vec_id, CAST((i - 1) div 16 AS BIGINT) AS sub,
        |    CAST(SUM(q) AS BIGINT) AS ssum,
        |    CAST(SUM(CASE WHEN (i - 1) % 2 = 0 THEN q ELSE -q END)
        |      AS BIGINT) AS asum,
        |    CAST(SUM(q * q) AS BIGINT) AS sqsum
        |  FROM e GROUP BY 1, 2),
        |a AS (
        |  SELECT vec_id, sub, sqsum,
        |    GREATEST(ssum, -ssum, asum, -asum) AS best,
        |    CAST(CASE WHEN ssum = GREATEST(ssum, -ssum, asum, -asum)
        |           THEN 0
        |         WHEN -ssum = GREATEST(ssum, -ssum, asum, -asum) THEN 1
        |         WHEN asum = GREATEST(ssum, -ssum, asum, -asum) THEN 2
        |         ELSE 3 END AS BIGINT) AS code
        |  FROM sv)
        |SELECT sub, code, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |  CAST(SUM(CAST(sqsum - 2 * 50000 * best
        |    + 16 * CAST(50000 AS BIGINT) * 50000 AS DECIMAL(25,0)))
        |    AS BIGINT) AS err_sum
        |FROM a GROUP BY sub, code ORDER BY sub, code""".stripMargin,
    "q_sketch_hll" ->
      """WITH k AS (SELECT DISTINCT l_partkey AS pk FROM lineitem),
        |h AS (
        |  SELECT CAST(conv(substr(md5(CAST(pk AS STRING)), 1, 15), 16, 10)
        |    AS BIGINT) AS hv
        |  FROM k),
        |r AS (SELECT hv % 64 AS bucket, hv div 64 AS w FROM h),
        |g AS (
        |  SELECT bucket,
        |    CASE WHEN w = 0 THEN CAST(55 AS BIGINT)
        |         ELSE CAST(length(bin(w & -w)) AS BIGINT) END AS rho
        |  FROM r),
        |m AS (
        |  SELECT bucket, CAST(MAX(rho) AS BIGINT) AS register
        |  FROM g GROUP BY bucket)
        |SELECT bucket, register,
        |  CAST(shiftleft(CAST(1 AS BIGINT), CAST(60 - register AS INT))
        |    AS BIGINT) AS inv_term
        |FROM m ORDER BY bucket""".stripMargin,
    "q_sim_lsh" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(pos AS BIGINT) AS i,
        |    CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS q
        |  FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, x),
        |d AS (
        |  SELECT vec_id, j,
        |    CAST(SUM(CASE WHEN bit_count(i & CAST(j + 1 AS BIGINT)) % 2 = 0
        |      THEN q ELSE -q END) AS BIGINT) AS dot
        |  FROM e LATERAL VIEW explode(sequence(0, 15)) jj AS j
        |  GROUP BY vec_id, j),
        |sg AS (
        |  SELECT vec_id, CAST(j div 4 AS BIGINT) AS band,
        |    CAST(SUM(CASE WHEN dot >= 0 THEN
        |      CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
        |        ELSE 8 END
        |      ELSE 0 END) AS BIGINT) AS sig
        |  FROM d GROUP BY vec_id, j div 4),
        |c AS (
        |  SELECT band, sig, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM sg GROUP BY band, sig)
        |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  CAST(SUM(cnt) AS BIGINT) AS n_vecs,
        |  CAST(MAX(cnt) AS BIGINT) AS max_bucket,
        |  CAST(SUM(cnt * (cnt - 1)) AS BIGINT) AS cand_pairs_x2
        |FROM c GROUP BY band ORDER BY band""".stripMargin,
    "q_text_heaps" ->
      """WITH tk AS (
        |  SELECT doc_id, split(text, ' ') AS toks FROM documents),
        |bg AS (
        |  SELECT doc_id, w
        |  FROM tk LATERAL VIEW explode(
        |    CASE WHEN size(toks) >= 2 THEN
        |      transform(sequence(1, size(toks) - 1),
        |        i -> concat(toks[i - 1], ' ', toks[i]))
        |    ELSE array() END) t AS w),
        |td AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS toks
        |  FROM bg GROUP BY doc_id),
        |ft AS (
        |  SELECT w, CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |  FROM bg GROUP BY w),
        |mx AS (SELECT CAST(MAX(doc_id) AS BIGINT) AS m FROM documents),
        |ck AS (
        |  SELECT CAST(jj.j AS BIGINT) AS j,
        |    CAST((m * jj.j - (m * jj.j) % 10) / 10 AS BIGINT) AS ckpt
        |  FROM mx CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),
        |    (9),(10)) AS jj(j)),
        |v AS (
        |  SELECT ck.j, ck.ckpt,
        |    CAST(SUM(CASE WHEN ft.first_doc <= ck.ckpt THEN 1 ELSE 0 END)
        |      AS BIGINT) AS vocab
        |  FROM ft CROSS JOIN ck GROUP BY ck.j, ck.ckpt),
        |tkc AS (
        |  SELECT ck.j,
        |    CAST(SUM(CASE WHEN td.doc_id <= ck.ckpt THEN td.toks
        |      ELSE 0 END) AS BIGINT) AS tokens,
        |    CAST(SUM(CASE WHEN td.doc_id <= ck.ckpt THEN 1 ELSE 0 END)
        |      AS BIGINT) AS docs_n
        |  FROM td CROSS JOIN ck GROUP BY ck.j)
        |SELECT v.j, v.ckpt, tkc.docs_n, tkc.tokens, v.vocab
        |FROM v JOIN tkc ON v.j = tkc.j ORDER BY v.j""".stripMargin,
    "q_sketch_kmv" ->
      """WITH k AS (SELECT DISTINCT l_partkey AS pk FROM lineitem),
        |h AS (
        |  SELECT CAST(conv(substr(md5(CAST(pk AS STRING)), 1, 15), 16, 10)
        |    AS BIGINT) AS hv
        |  FROM k),
        |t AS (SELECT hv FROM h ORDER BY hv LIMIT 64)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY hv) AS BIGINT) AS r, hv
        |FROM t ORDER BY r""".stripMargin,
    "q_sketch_bloom" ->
      """WITH mem AS (SELECT DISTINCT s_suppkey AS k FROM supplier),
        |mb AS (
        |  SELECT DISTINCT CAST(conv(substr(md5(CAST(rr.r AS STRING) || ':'
        |    || CAST(k AS STRING)), 1, 8), 16, 10) AS BIGINT)
        |    % 65536 AS bit
        |  FROM mem CROSS JOIN (SELECT explode(array(0, 1)) AS r) rr),
        |pr AS (SELECT DISTINCT c_custkey AS k FROM customer),
        |pb AS (
        |  SELECT k, rr.r AS r,
        |    CAST(conv(substr(md5(CAST(rr.r AS STRING) || ':'
        |      || CAST(k AS STRING)), 1, 8), 16, 10) AS BIGINT)
        |      % 65536 AS bit
        |  FROM pr CROSS JOIN (SELECT explode(array(0, 1)) AS r) rr),
        |hit AS (
        |  SELECT pb.k, CAST(COUNT(*) AS BIGINT) AS nhit
        |  FROM pb JOIN mb ON pb.bit = mb.bit GROUP BY pb.k),
        |claimed AS (SELECT k FROM hit WHERE nhit = 2),
        |tm AS (SELECT pr.k FROM pr JOIN mem ON pr.k = mem.k)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM mem) AS BIGINT) AS n_members,
        |  CAST((SELECT COUNT(*) FROM mb) AS BIGINT) AS n_bits_set,
        |  CAST((SELECT COUNT(*) FROM pr) AS BIGINT) AS n_probes,
        |  CAST((SELECT COUNT(*) FROM claimed) AS BIGINT) AS n_claimed,
        |  CAST((SELECT COUNT(*) FROM tm) AS BIGINT) AS n_true_members,
        |  CAST((SELECT COUNT(*) FROM claimed)
        |    - (SELECT COUNT(*) FROM tm) AS BIGINT)
        |    AS n_false_positives""".stripMargin,
    "q_stat_kappaw" ->
      """WITH cls AS (
        |  SELECT CASE WHEN n_chars < 250 THEN 1
        |           WHEN n_chars < 400 THEN 2 ELSE 3 END AS a,
        |    CASE WHEN size(split(text, ' ')) < 45 THEN 1
        |         WHEN size(split(text, ' ')) < 75 THEN 2
        |         ELSE 3 END AS b
        |  FROM documents),
        |c AS (
        |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM cls GROUP BY a, b),
        |grid AS (
        |  SELECT aa.a, bb.b, COALESCE(c.o, 0) AS o
        |  FROM (VALUES (1),(2),(3)) AS aa(a)
        |  CROSS JOIN (VALUES (1),(2),(3)) AS bb(b)
        |  LEFT JOIN c ON c.a = aa.a AND c.b = bb.b),
        |w AS (
        |  SELECT a, b, o,
        |    CAST(SUM(o) OVER (PARTITION BY a) AS BIGINT) AS r_tot,
        |    CAST(SUM(o) OVER (PARTITION BY b) AS BIGINT) AS c_tot,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM grid)
        |SELECT CAST(a AS BIGINT) AS class_chars,
        |  CAST(b AS BIGINT) AS class_tokens,
        |  o AS observed, r_tot, c_tot, n,
        |  CAST((a - b) * (a - b) AS BIGINT) AS wgt,
        |  CAST((a - b) * (a - b) * o AS BIGINT) AS wo_term,
        |  CAST((a - b) * (a - b) * r_tot * c_tot AS BIGINT) AS wrc_term
        |FROM w ORDER BY class_chars, class_tokens""".stripMargin
  )
}
