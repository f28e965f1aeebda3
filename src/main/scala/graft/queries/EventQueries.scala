package graft.queries

import graft.core.{Dsl, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.10 event-stream operators — batch twins (hash-matched).
  * The true Structured Streaming versions live in graft.streaming and are
  * asserted equal to these results in StreamingSpec (§5.2.4).
  *
  * Scale story: tumbling/sliding buckets are pure hash-aggregates on
  * (bucket, type) — linear, shuffle-light; sessionization partitions by
  * user_id so per-partition state is one user's (sorted) event stream, the
  * same layout `session_window` + RocksDB state store uses in streaming.
  */
object EventQueries {
  import Dsl._

  val all: Seq[Q] = Seq(
    Q("q_window_tumbling_batch",
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
         |  COUNT(*) AS cnt, ${d2dSql(dsumSql("value"))} AS sum_value
         |FROM events
         |GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(expr("CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ)").as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), d2d(dsum(col("value"))).as("sum_value"))
        .orderBy("bucket", "event_type")
    },

    // OHLC downsampling (the financial-bars shape: per-period open /
    // high / low / close from a tick stream). Open/close come from
    // rank-1 rows under (ts, event_id) total order — first()/last() are
    // banned (partition-order-dependent), min/max of the rank-1
    // conditional is deterministic in both engines; high/low are plain
    // extrema. Values pass through untouched (no double arithmetic), so
    // parity is exact. One window per (day, type) partition key — the
    // high-cardinality even shuffle — plus a combinable final agg.
    Q("q_time_ohlc",
      """SELECT day, event_type,
        |  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  COUNT(*) AS n_ticks
        |FROM (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    event_type, value,
        |    row_number() OVER (PARTITION BY date_trunc('day', ts), event_type
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY date_trunc('day', ts), event_type
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |GROUP BY day, event_type ORDER BY day, event_type""".stripMargin) { (s, d) =>
      val day = expr("CAST(date_trunc('day', ts) AS TIMESTAMP_NTZ)")
      val wA = Window.partitionBy(day, col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val wD = Window.partitionBy(day, col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(day.as("day"), col("event_type"), col("value"),
          row_number().over(wA).as("rn_a"),
          row_number().over(wD).as("rn_d"))
        .groupBy("day", "event_type")
        .agg(max(when(col("rn_a") === 1, col("value"))).as("open"),
          max("value").as("high"), min("value").as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"),
          count(lit(1)).as("n_ticks"))
        .orderBy("day", "event_type")
    },

    // 1h windows sliding 30min — every event lands in exactly 2 buckets.
    // Spark uses the native window() generator; the oracle explodes each
    // event to its two bucket starts in epoch-µs arithmetic.
    Q("q_window_sliding_batch",
      s"""WITH b AS (
         |  SELECT event_type, value,
         |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - k * 1800000000) AS ws
         |  FROM events, (SELECT unnest([0, 1]) AS k) ks)
         |SELECT ws AS window_start, event_type, COUNT(*) AS cnt, ${d2dSql(dsumSql("value"))} AS sum_value
         |FROM b
         |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), d2d(dsum(col("value"))).as("sum_value"))
        .select(expr("CAST(window.start AS TIMESTAMP_NTZ)").as("window_start"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // Gaps-and-islands: longest consecutive-active-day streak per user.
    // Island key = day − row_number (constant within a consecutive run);
    // the window partitions by user (high cardinality, scale-safe).
    // DATE stays internal; the streak start emits as midnight TIMESTAMP.
    Q("q_window_streak",
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |isl AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS island
        |  FROM days),
        |strk AS (
        |  SELECT user_id, COUNT(*) AS streak_len, MIN(day) AS start_day
        |  FROM isl GROUP BY user_id, island)
        |SELECT user_id, streak_len, CAST(start_day AS TIMESTAMP) AS streak_start FROM (
        |  SELECT user_id, streak_len, start_day,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY streak_len DESC, start_day) AS rn
        |  FROM strk) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val wD = Window.partitionBy("user_id").orderBy("day")
      val isl = days.withColumn("island",
        date_sub(col("day"), row_number().over(wD)))
      val strk = isl.groupBy("user_id", "island")
        .agg(count(lit(1)).as("streak_len"), min("day").as("start_day"))
      val wS = Window.partitionBy("user_id")
        .orderBy(col("streak_len").desc, col("start_day"))
      strk.withColumn("rn", row_number().over(wS))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("streak_len"),
          col("start_day").cast("timestamp_ntz").as("streak_start"))
        .orderBy("user_id")
    },

    // Gap-filled hourly series: dense time spine (sequence over the global
    // [min,max] hour range — bounded by calendar time, not rows; the
    // 1-row bounds agg broadcasts) left-joined to the bucket counts with
    // zero fill. The standard dashboard/feature-engineering shape.
    Q("q_time_gapfill",
      """WITH e AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket
        |  FROM events WHERE event_type = 'click'),
        |a AS (SELECT bucket, COUNT(*) AS cnt FROM e GROUP BY bucket),
        |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM e),
        |s AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM b)
        |SELECT s.bucket, COALESCE(a.cnt, CAST(0 AS BIGINT)) AS cnt
        |FROM s LEFT JOIN a ON s.bucket = a.bucket
        |ORDER BY s.bucket""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).filter(col("event_type") === "click")
        .select(expr("CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ)").as("bucket"))
      val agg = ev.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      val spine = ev.agg(min("bucket").as("lo"), max("bucket").as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("bucket"))
      spine.join(agg, Seq("bucket"), "left")
        .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("bucket")
    },

    // Last-observation-carried-forward (the financial-facts carry rule:
    // a fact reported in period P holds for every later period until
    // re-reported). Hourly spine per entity (bounded user set × global
    // span), sparse observations joined on, then a per-entity
    // ignore-nulls last() window fills forward; buckets before the first
    // observation stay NULL in both engines. max(value) per bucket keeps
    // the observation deterministic (avg would sum doubles in
    // partition order). The window partitions by user — no global sort;
    // the spine build is a one-row span broadcast (scalar-probe pattern).
    Q("q_time_locf",
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, value
        |  FROM events WHERE event_type = 'purchase' AND user_id < 5),
        |a AS (SELECT user_id, bucket, max(value) AS v FROM e GROUP BY user_id, bucket),
        |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM e),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |      FROM b, u)
        |SELECT s.user_id, s.bucket,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM s LEFT JOIN a ON s.user_id = a.user_id AND s.bucket = a.bucket
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("user_id") < 5)
        .select(col("user_id"),
          expr("CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ)").as("bucket"),
          col("value"))
      val a = e.groupBy("user_id", "bucket").agg(max("value").as("v"))
      val span = e.agg(min("bucket").as("lo"), max("bucket").as("hi"))
      val spine = e.select("user_id").distinct()
        .crossJoin(broadcast(span))
        .select(col("user_id"),
          explode(expr("sequence(lo, hi, interval 1 hour)")).as("bucket"))
      val w = Window.partitionBy("user_id").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(a, Seq("user_id", "bucket"), "left")
        .select(col("user_id"), col("bucket"),
          last(col("v"), ignoreNulls = true).over(w).as("filled"))
        .orderBy("user_id", "bucket")
    },

    // Linear interpolation between knots on the same hourly spine as
    // q_time_locf — the other standard gap-fill policy. The interpolation
    // fraction is computed from integer GRID POSITIONS (row_number), not
    // timestamps, so `(i−iₚ)/(iₙ−iₚ)` is a single exact-operand IEEE
    // division and `prev + (next−prev)·frac` is the identical three-op
    // tree in both engines (Dsl discipline: never round, share the tree).
    // Edges hold flat (leading rows take the first knot, trailing the
    // last). Scale: one window exchange per user partition; the spine
    // explode is row-local off a one-row broadcast span.
    Q("q_time_interp",
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, value
        |  FROM events WHERE event_type = 'purchase' AND user_id < 5),
        |a AS (SELECT user_id, bucket, max(value) AS v FROM e GROUP BY user_id, bucket),
        |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM e),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s AS (SELECT u.user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        |      FROM b, u),
        |g AS (
        |  SELECT s.user_id, s.bucket, a.v,
        |    row_number() OVER (PARTITION BY s.user_id ORDER BY s.bucket) AS i
        |  FROM s LEFT JOIN a ON s.user_id = a.user_id AND s.bucket = a.bucket),
        |sel AS (
        |  SELECT user_id, bucket, v, i,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER wp AS pi,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER wf AS ni
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
        |FROM sel ORDER BY user_id, bucket""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .filter(col("event_type") === "purchase" && col("user_id") < 5)
        .select(col("user_id"),
          expr("CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ)").as("bucket"),
          col("value"))
      val a = e.groupBy("user_id", "bucket").agg(max("value").as("v"))
      val span = e.agg(min("bucket").as("lo"), max("bucket").as("hi"))
      val spine = e.select("user_id").distinct()
        .crossJoin(broadcast(span))
        .select(col("user_id"),
          explode(expr("sequence(lo, hi, interval 1 hour)")).as("bucket"))
      val wOrd = Window.partitionBy("user_id").orderBy("bucket")
      val wp = Window.partitionBy("user_id").orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id").orderBy("i")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val g = spine.join(a, Seq("user_id", "bucket"), "left")
        .withColumn("i", row_number().over(wOrd).cast("bigint"))
      val frac = (col("i") - col("pi")).cast("double") /
        (col("ni") - col("pi")).cast("double")
      g.withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
        .withColumn("pi",
          last(when(col("v").isNotNull, col("i")), ignoreNulls = true).over(wp))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wf))
        .withColumn("ni",
          first(when(col("v").isNotNull, col("i")), ignoreNulls = true).over(wf))
        .select(col("user_id"), col("bucket"),
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) * frac)
            .as("interp"))
        .orderBy("user_id", "bucket")
    },

    // Streak detection (gaps-and-islands on VALUE direction): per user,
    // maximal runs of strictly-increasing event values — the engagement
    // "win streak" primitive. Break flag via lag, island id via running
    // sum of breaks, then per-island lengths roll up to (longest streak,
    // #streaks ≥ 3). Both windows and the island aggregate ride ONE
    // hash(user_id) exchange; doubles compare bit-identically (raw
    // fixture values, no arithmetic). Strict increase ⇒ ties break runs,
    // so the answer is order-unambiguous even with duplicate values.
    Q("q_window_streak_value",
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(value) OVER w IS NULL
        |           OR value <= lag(value) OVER w THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT user_id,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM o),
        |runs AS (
        |  SELECT user_id, island, COUNT(*) AS len
        |  FROM g GROUP BY user_id, island)
        |SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
        |  CAST(SUM(CASE WHEN len >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_long
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("brk",
          when(lag(col("value"), 1).over(w).isNull ||
            col("value") <= lag(col("value"), 1).over(w), 1).otherwise(0))
        .withColumn("island", sum(col("brk")).over(run))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max(col("len")).cast("long").as("max_streak"),
          sum(when(col("len") >= 3, 1).otherwise(0)).cast("long")
            .as("n_long"))
        .orderBy("user_id")
    },

    // Gap-based sessionization (12h inactivity, FIXTURES-calibrated):
    // new-session flag via lag, session id via running sum — the classic
    // batch-SQL formulation, identical in both engines.
    Q("q_sessionize",
      s"""WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('microsecond', lag(ts) OVER w, ts) > 43200000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  ${d2dSql("CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))")} AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("is_new",
          when(lag(col("ts"), 1).over(w).isNull ||
            expr("timestampdiff(MICROSECOND, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)") > 43200000000L, 1)
            .otherwise(0))
        .withColumn("sid", sum(col("is_new")).over(wRun))
        .groupBy("user_id", "sid")
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          d2d(sum(col("value").cast(D18)).cast(D18)).as("sum_value"))
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .orderBy("user_id", "session_start")
    },

    // Ordered conversion funnel: view -> click -> purchase, each stage
    // anchored at the user's EARLIEST event strictly after the previous
    // stage (min-ts chaining — deterministic, unlike "any path" funnels).
    // All three stage frames hash-partition on user_id, so Catalyst reuses
    // one exchange across the chain; the per-stage aggregates are
    // map-side-combinable. At 100 TB this is the standard funnel shape:
    // no global sort, no per-user event collection, state per user is one
    // timestamp per stage. Output is integer counts only — parity-exact.
    Q("q_event_funnel",
      """WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS stage_idx, 'view' AS stage, COUNT(*) AS users FROM v
        |  UNION ALL SELECT 2, 'click', COUNT(*) FROM c
        |  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p)
        |ORDER BY stage_idx""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("users"))
        .select(lit(1).as("stage_idx"), lit("view").as("stage"), col("users"))
        .unionAll(c.agg(count(lit(1)).as("users"))
          .select(lit(2).as("stage_idx"), lit("click").as("stage"), col("users")))
        .unionAll(p.agg(count(lit(1)).as("users"))
          .select(lit(3).as("stage_idx"), lit("purchase").as("stage"), col("users")))
        .orderBy("stage_idx")
    },

    // Cohort retention matrix: users grouped by first-activity day, then
    // distinct-active-day counts at each day offset — the activation/
    // retention curve every usage-analytics stack computes. Two frames,
    // both hash-partitioned on user_id (first-touch agg + distinct
    // activity days), one co-partitioned join, then a small (cohort,
    // offset) rollup. Integer/date outputs only — parity-exact; datediff
    // is exact integer day arithmetic in both engines.
    Q("q_event_retention",
      """WITH f AS (SELECT user_id,
        |             CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
        |           FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id,
        |        CAST(date_trunc('day', ts) AS DATE) AS active_day FROM events)
        |SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
        |  CAST(a.active_day - f.cohort_day AS BIGINT) AS day_offset,
        |  COUNT(*) AS active_users
        |FROM f JOIN a ON f.user_id = a.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val f = ev.groupBy("user_id")
        .agg(expr("CAST(date_trunc('day', MIN(ts)) AS DATE)").as("cohort_day"))
      val a = ev.select(col("user_id"),
        expr("CAST(date_trunc('day', ts) AS DATE)").as("active_day")).distinct()
      f.join(a, "user_id")
        // DATE internally (exact integer day arithmetic); TIMESTAMP_NTZ on
        // the output wire — parquet DATE reads back as python objects in
        // the harness's pandas compare, NTZ as datetime64 (the
        // tumbling-batch bucket precedent).
        .groupBy(col("cohort_day").cast("timestamp_ntz").as("cohort_day"),
          datediff(col("active_day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(count(lit(1)).as("active_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // Exponentially-weighted moving average per entity, α = 1/2: the
    // smoothing fold y ← y/2 + x/2 over the time-ordered series. α is
    // deliberately dyadic — halving a double is EXACT (exponent
    // decrement, no rounding), so the only rounded op per step is one
    // add, executed in the identical sequence by both engines via the
    // ordered-fold pattern (the q_embed_centroid precedent: DuckDB
    // list_reduce over list(… ORDER BY), Spark aggregate over the
    // sorted collected array) ⇒ bit-identical. General-α EWMA would
    // compound a rounded multiply per step — same determinism, kept
    // dyadic for clarity. Per-entity collect is bounded by entity
    // cardinality; the unbounded-stream twin — one (count, ewma) pair of
    // mapGroupsWithState state per key — is [[graft.streaming.StreamOps
    // .ewmaStream]] (s_stream_ewma), gated BIT-equal to this fold in
    // StreamingSpec. That construction, not this collect, is the 100 TB
    // form.
    Q("q_time_ewma",
      """SELECT user_id, COUNT(*) AS n,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list(value ORDER BY ts, event_id)),
        |    (a, b) -> a / 2 + b / 2) AS ewma
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          aggregate(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
            lit(0.0),
            (acc, x) => acc / lit(2) + x.getField("value") / lit(2)).as("ewma"))
        .orderBy("user_id")
    },

    // SCD2 dimension build (slowly-changing-dimension type 2): collapse
    // each customer's order-priority history to its CHANGE points, then
    // version the survivors with [valid_from, valid_to) ranges —
    // valid_to NULL marks the current version. The north-star ETL shape
    // (an XBRL fact's amendment history versions identically).
    //
    // Plan: both windows partition by o_custkey, and the change-filter
    // between them preserves hash partitioning AND sort order — the
    // whole build is ONE exchange + one sort, the second window rides
    // the same layout free (pinned in PlanSpec: shuffle=2 incl. the
    // output orderBy, no second sort-exchange). version_key (the source
    // row id) makes the output ordering total when several versions of
    // one customer share a date.
    Q("q_scd2_orders",
      """WITH chg AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
        |    LAG(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev_p
        |  FROM orders),
        |ver AS (
        |  SELECT o_custkey, o_orderpriority,
        |    CAST(o_orderdate AS TIMESTAMP) AS valid_from,
        |    o_orderkey AS version_key
        |  FROM chg WHERE prev_p IS NULL OR prev_p <> o_orderpriority)
        |SELECT o_custkey, o_orderpriority, valid_from,
        |  LEAD(valid_from) OVER (PARTITION BY o_custkey
        |    ORDER BY valid_from, version_key) AS valid_to,
        |  version_key
        |FROM ver
        |ORDER BY o_custkey, valid_from, version_key""".stripMargin) { (s, d) =>
      val byCust = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      val byVer = Window.partitionBy("o_custkey")
        .orderBy("valid_from", "version_key")
      Tables.orders(s, d)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        .withColumn("prev_p", lag(col("o_orderpriority"), 1).over(byCust))
        .filter(col("prev_p").isNull ||
          col("prev_p") =!= col("o_orderpriority"))
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_orderdate").as("valid_from"),
          col("o_orderkey").as("version_key"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(byVer))
        .orderBy("o_custkey", "valid_from", "version_key")
        .select("o_custkey", "o_orderpriority", "valid_from", "valid_to",
          "version_key")
    },

    // Lag-1 autocorrelation of the daily event-volume series, with the
    // Pearson pieces emitted as EXACT integers (q_stat_regression's
    // design): r = cov_num / √(varx_num·vary_num) is one caller-side
    // sqrt over bitwise-checkable BIGINTs — the seasonality probe every
    // ingest monitor runs on its arrival counts.
    //
    // Scale shape: the only row-scale work is the map-side-combinable
    // per-day count; the LEAD window and the final sums run over the DAY
    // spine (30 rows at the fixtures; calendar-bounded at any corpus
    // size). The day bucket never leaves the query, so no timestamp
    // rebasing is involved. LONG products hold to ~10⁹ events/day over a
    // 30-year spine; DECIMAL(38,0) beyond.
    Q("q_time_autocorr",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT x, LEAD(x) OVER (ORDER BY day) AS y FROM d)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
        |    AS cov_num,
        |  CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT)
        |    AS varx_num,
        |  CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS BIGINT)
        |    AS vary_num
        |FROM p WHERE y IS NOT NULL""".stripMargin) { (s, d) =>
      val days = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .agg(count(lit(1)).as("x"))
      val p = days
        .select(col("x"), lead(col("x"), 1).over(Window.orderBy("day")).as("y"))
        .where(col("y").isNotNull)
      p.agg(count(lit(1)).as("cnt"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("cnt").cast("long").as("n"),
          (col("cnt") * col("sxy") - col("sx") * col("sy"))
            .cast("long").as("cov_num"),
          (col("cnt") * col("sxx") - col("sx") * col("sx"))
            .cast("long").as("varx_num"),
          (col("cnt") * col("syy") - col("sy") * col("sy"))
            .cast("long").as("vary_num"))
    },

    // Month-of-year seasonality profile of order volume and revenue —
    // the calendar fingerprint behind staffing/capacity planning. The
    // share column is the cross-engine-safe double ratio: both operands
    // are d2d-emitted exact decimals, so the single IEEE divide is
    // bit-identical in both engines.
    //
    // Scale shape: one map-combinable month aggregate (12 cells at any
    // sf) — the only row-scale pass; the global-share window runs on the
    // 12-row month spine (aggregate-bounded exemption).
    Q("q_time_seasonality",
      s"""WITH m AS (
        |  SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
        |    COUNT(*) AS n,
        |    ${Dsl.dsumSql("o_totalprice")} AS rev
        |  FROM orders GROUP BY 1)
        |SELECT mo AS month_of_year, CAST(n AS BIGINT) AS n_orders,
        |  ${Dsl.d2dSql("rev")} AS revenue,
        |  ${Dsl.d2dSql("rev")} /
        |    ${Dsl.d2dSql("CAST(SUM(rev) OVER () AS DECIMAL(18,4))")}
        |    AS rev_share
        |FROM m ORDER BY month_of_year""".stripMargin) { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy(month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n"), Dsl.dsum(col("o_totalprice")).as("rev"))
      m.select(col("mo").as("month_of_year"),
          col("n").cast("long").as("n_orders"),
          Dsl.d2d(col("rev")).as("revenue"),
          (Dsl.d2d(col("rev")) /
            Dsl.d2d(sum(col("rev")).over(Window.partitionBy()).cast(Dsl.D18)))
            .as("rev_share"))
        .orderBy("month_of_year")
    },

    // CUSUM changepoint scan over the daily event-volume series: the
    // cumulative deviation from the series mean, kept EXACT by scaling
    // through the day count (CUSUM_k = Σ_{d≤k}(n·x_d − T) = n·cum_k −
    // T·k — all integers, no mean division), with the max-|CUSUM| day
    // flagged as the level-shift candidate (Page 1954's statistic in its
    // offline form, public literature). The monitoring counterpart to
    // q_time_anomaly's pointwise z-scores: CUSUM accumulates small
    // persistent shifts that per-point tests miss.
    //
    // Scale shape: the row-scale work is the map-combinable per-day
    // count; every window (running sum, row index, global max) runs on
    // the day spine — calendar-bounded (≤31 rows at the fixtures, ~4k
    // rows for a decade of 100 TB ingest). n·cum stays exact in LONG to
    // ~10¹⁴ events over a 10⁴-day spine; loud ANSI overflow beyond.
    Q("q_time_changepoint",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    COUNT(*) AS x
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT day, x,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
        |    CAST(SUM(x) OVER () AS BIGINT) AS t,
        |    CAST(SUM(x) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
        |  FROM d),
        |s AS (SELECT day, x, n * cum - t * i AS cusum FROM c)
        |SELECT day, CAST(x AS BIGINT) AS n_events,
        |  CAST(cusum AS BIGINT) AS cusum_scaled,
        |  CAST(CASE WHEN ABS(cusum) = MAX(ABS(cusum)) OVER () THEN 1
        |            ELSE 0 END AS BIGINT) AS is_changepoint
        |FROM s ORDER BY day""".stripMargin) { (s, d) =>
      val dayFrame = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.operators.ExactStats.cusumScaled(dayFrame, "day", "x")
        .select(col("day"), col("x").cast("long").as("n_events"),
          col("cusum").cast("long").as("cusum_scaled"),
          col("is_peak").as("is_changepoint"))
        .orderBy("day")
    },

    // High-water-mark drawdown of the daily revenue series: for each
    // day, how far below the best-day-so-far it sits (exact cents), with
    // the worst drawdown flagged — the "is volume decaying" monitor in
    // its finance formulation (running max + distance, no FP).
    //
    // Scale shape: one map-side-combinable day aggregate; the running
    // max, global max and flag are windows over the calendar-bounded day
    // spine (~2.4k rows for the 1995–2001 fixture horizon; a decade of
    // any corpus stays ≤4k).
    Q("q_time_drawdown",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT day, cents,
        |    MAX(cents) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM d)
        |SELECT day, cents AS day_cents, CAST(peak AS BIGINT) AS peak_cents,
        |  CAST(peak - cents AS BIGINT) AS drawdown_cents,
        |  CAST(CASE WHEN peak - cents = MAX(peak - cents) OVER () THEN 1
        |            ELSE 0 END AS BIGINT) AS is_max_drawdown
        |FROM r ORDER BY day""".stripMargin) { (s, d) =>
      val dayFrame = Tables.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).cast("timestamp_ntz")
          .as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
      val spine = Window.orderBy("day")
      val r = dayFrame.select(col("day"), col("cents"),
        max(col("cents")).over(
          spine.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("peak"))
      r.select(col("day"), col("cents").as("day_cents"),
          col("peak").cast("long").as("peak_cents"),
          (col("peak") - col("cents")).cast("long").as("drawdown_cents"),
          when(col("peak") - col("cents") ===
            max(col("peak") - col("cents")).over(Window.partitionBy()), 1L)
            .otherwise(0L).as("is_max_drawdown"))
        .orderBy("day")
    },

    // Month-over-month growth of order volume and revenue — the board
    // chart: monthly totals on the integer year·12+month index, the
    // previous month by LAG over the month spine, and growth as the
    // bit-identical double ratio of exact cent integers (first month's
    // growth is NULL in both engines).
    //
    // Scale shape: one ≤80-cell month aggregate; LAG rides the month
    // spine. Cents stay exact in LONG to ~9·10¹⁶ dollars/month.
    Q("q_time_mom_growth",
      """WITH m AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT m, n, cents,
        |    LAG(cents) OVER (ORDER BY m) AS prev
        |  FROM m)
        |SELECT m AS month_idx, CAST(n AS BIGINT) AS n_orders,
        |  cents AS rev_cents, CAST(prev AS BIGINT) AS prev_cents,
        |  CAST(cents - prev AS DOUBLE) / CAST(prev AS DOUBLE) AS mom_growth
        |FROM p ORDER BY month_idx""".stripMargin) { (s, d) =>
      val mIdx = (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long")
      val m = Tables.orders(s, d)
        .groupBy(mIdx.as("m"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long").as("cents"))
      m.select(col("m"), col("n"), col("cents"),
          lag(col("cents"), 1).over(Window.orderBy("m")).as("prev"))
        .select(col("m").as("month_idx"), col("n").cast("long").as("n_orders"),
          col("cents").as("rev_cents"), col("prev").cast("long").as("prev_cents"),
          ((col("cents") - col("prev")).cast("double")
            / col("prev").cast("double")).as("mom_growth"))
        .orderBy("month_idx")
    },

    // Day-of-month × hour-of-day activity heatmap — the ops-dashboard
    // staple: event count, exact value sum (2-decimal fixture values
    // through DECIMAL → d2d) and the bit-identical double share of total
    // per cell. EXTRACT(DAY/HOUR) parses in BOTH dialects (DOW does not:
    // the numbering disagrees cross-engine — Spark 1=Sunday, DuckDB
    // 0=Sunday — so the profile is keyed on calendar day instead).
    //
    // Scale shape: ONE map-side-combinable aggregate down to ≤744 cells;
    // the share window rides those cells (strict-lint exempt).
    Q("q_time_heatmap",
      s"""WITH c AS (
        |  SELECT CAST(EXTRACT(DAY FROM ts) AS BIGINT) AS dom,
        |    CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hod,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT dom, hod, CAST(n AS BIGINT) AS n_events,
        |  ${Dsl.d2dSql("v")} AS value_sum,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS share
        |FROM c ORDER BY dom, hod""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(dayofmonth(col("ts")).cast("long").as("dom"),
          hour(col("ts")).cast("long").as("hod"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(Dsl.D18)).cast(Dsl.D18).as("v"))
      c.select(col("dom"), col("hod"), col("n").cast("long").as("n_events"),
          Dsl.d2d(col("v")).as("value_sum"),
          (col("n").cast("double")
            / sum(col("n")).over(Window.partitionBy()).cast("double"))
            .as("share"))
        .orderBy("dom", "hod")
    },

    // Forecast-baseline evaluation (MASE, Hyndman & Koehler 2006): how
    // much better is the weekly-seasonal naive forecast x̂_t = x_{t−7}
    // than the plain naive x̂_t = x_{t−1} on the daily event-volume
    // series? Both absolute-error sums are exact integers over the SAME
    // term domain (days where both lags exist), and MASE is their one
    // IEEE divide — the forecastability screen run before any model
    // spend. mase < 1 ⇒ the series has exploitable weekly structure.
    //
    // Scale shape: the row-scale work is the map-combinable per-day
    // count; the lag windows ride the calendar-bounded day spine
    // (single-partition BY DESIGN — the cusumScaled contract: the spine
    // is ~30 rows here, ≤4k for a decade). Row-offset LAG equals
    // calendar-offset lag because the fixture spine is gapless
    // (FIXTURES.md: events cover every day); a gappy corpus must
    // gap-fill first (q_time_gapfill) — documented contract, and the
    // errors stay exact either way.
    Q("q_time_forecast_eval",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |l AS (
        |  SELECT x,
        |    LAG(x, 1) OVER (ORDER BY day) AS x1,
        |    LAG(x, 7) OVER (ORDER BY day) AS x7
        |  FROM d)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  CAST(SUM(ABS(x - x1)) AS BIGINT) AS sae_naive,
        |  CAST(SUM(ABS(x - x7)) AS BIGINT) AS sae_seasonal,
        |  CASE WHEN SUM(ABS(x - x1)) = 0 THEN NULL
        |    ELSE CAST(SUM(ABS(x - x7)) AS DOUBLE)
        |      / CAST(SUM(ABS(x - x1)) AS DOUBLE) END AS mase
        |FROM l WHERE x1 IS NOT NULL AND x7 IS NOT NULL""".stripMargin) {
      (s, d) =>
      val days = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz")
          .as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
      val w = Window.orderBy("day")
      days
        .select(col("x"), lag(col("x"), 1).over(w).as("x1"),
          lag(col("x"), 7).over(w).as("x7"))
        .where(col("x1").isNotNull && col("x7").isNotNull)
        .agg(count(lit(1)).cast("long").as("n_terms"),
          sum(abs(col("x") - col("x1"))).cast("long").as("sae_naive"),
          sum(abs(col("x") - col("x7"))).cast("long").as("sae_seasonal"))
        .selectExpr("n_terms", "sae_naive", "sae_seasonal",
          "CASE WHEN sae_naive = 0 THEN NULL" +
            " ELSE CAST(sae_seasonal AS DOUBLE)" +
            " / CAST(sae_naive AS DOUBLE) END AS mase")
    },

    // Burstiness screen: the index of dispersion (variance-to-mean
    // ratio) of each event type's daily volume — ≈1 for a Poisson
    // (memoryless) arrival process, ≫1 for bursty traffic; the
    // monitoring statistic behind rate-limit and capacity alarms. The
    // ratio is the exact integer rational (d·Σx² − T²)/((d−1)·T)
    // (sample variance over mean with the d/(d−1) factors cancelled
    // through), emitted as BIGINT pieces plus the one-divide double.
    //
    // Scale shape: the (type, day) count is the only row-scale exchange
    // (map-side combinable); the per-type rollup is 5 × calendar cells.
    // LONG arithmetic holds to ~3·10⁹ events/day·type; loud beyond.
    Q("q_time_dispersion",
      """WITH d AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
        |      AS day,
        |    COUNT(*) AS x
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(x) AS BIGINT) AS n_events,
        |  CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT)
        |    AS disp_num,
        |  CAST((COUNT(*) - 1) * SUM(x) AS BIGINT) AS disp_den,
        |  CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE)
        |    / CAST((COUNT(*) - 1) * SUM(x) AS DOUBLE) AS dispersion
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("x").as("t"),
          sum(col("x") * col("x")).as("sxx"))
        .selectExpr("event_type", "CAST(cnt AS BIGINT) AS n_days",
          "CAST(t AS BIGINT) AS n_events",
          "CAST(cnt * sxx - t * t AS BIGINT) AS disp_num",
          "CAST((cnt - 1) * t AS BIGINT) AS disp_den",
          "CAST(cnt * sxx - t * t AS DOUBLE)" +
            " / CAST((cnt - 1) * t AS DOUBLE) AS dispersion")
        .orderBy("event_type")
    },

    // Product-analytics stickiness (the DAU/MAU idiom, per event type):
    // average daily active users over the horizon divided by the
    // horizon's total active users — how much of the audience returns
    // daily. stickiness = user_days/(n_days·mau), one IEEE divide on
    // exact counts.
    //
    // Scale shape: the distinct (type, day, user) frame is the one
    // row-scale exchange; the per-type rollup runs its two COUNT
    // (DISTINCT)s as a bounded expand over that deduped frame (pairs-
    // bounded, 2× — the grouping-sets idiom), never over raw events.
    Q("q_event_stickiness",
      """WITH du AS (
        |  SELECT DISTINCT event_type,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
        |  FROM events)
        |SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS user_days,
        |  CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau,
        |  CAST(COUNT(*) AS DOUBLE)
        |    / CAST(COUNT(DISTINCT day) * COUNT(DISTINCT user_id) AS DOUBLE)
        |    AS stickiness
        |FROM du GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
          col("user_id"))
        .distinct()
        .groupBy("event_type")
        .agg(count(lit(1)).as("ud"),
          countDistinct(col("day")).as("nd"),
          countDistinct(col("user_id")).as("mau"))
        .selectExpr("event_type", "CAST(ud AS BIGINT) AS user_days",
          "CAST(nd AS BIGINT) AS n_days", "CAST(mau AS BIGINT) AS mau",
          "CAST(ud AS DOUBLE) / CAST(nd * mau AS DOUBLE) AS stickiness")
        .orderBy("event_type")
    },

    // Autocorrelation-function profile of the daily volume series, lags
    // 1–14: per lag the EXACT Pearson pieces (n·Σxy − ΣxΣy numerator
    // and both variance numerators over the lag's pair domain) — the
    // q_time_autocorr design swept across a lag spine in ONE query;
    // acf_k = cov/√(va·vb) stays caller-side (no sqrt in oracles). The
    // weekly cycle shows as a lag-7/14 peak; the series' memory length
    // falls out of where the profile dies.
    //
    // Scale shape: the day count is the one row-scale exchange; the
    // lag pairs come from a band self-join of the ~30-row day spine
    // (≤14·|spine| pairs — calendar-bounded metadata at any corpus
    // size), and the per-lag rollup is a ≤14-key aggregate.
    Q("q_time_acf",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |i AS (SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM d),
        |p AS (
        |  SELECT b.rn - a.rn AS lag, a.x AS xa, b.x AS xb
        |  FROM i a JOIN i b ON b.rn > a.rn AND b.rn - a.rn <= 14)
        |SELECT lag AS lag_days, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(COUNT(*) * SUM(xa * xb) - SUM(xa) * SUM(xb) AS BIGINT)
        |    AS cov_num,
        |  CAST(COUNT(*) * SUM(xa * xa) - SUM(xa) * SUM(xa) AS BIGINT)
        |    AS var_a_num,
        |  CAST(COUNT(*) * SUM(xb * xb) - SUM(xb) * SUM(xb) AS BIGINT)
        |    AS var_b_num
        |FROM p GROUP BY lag ORDER BY lag_days""".stripMargin) { (s, d) =>
      val days = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz")
          .as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
      val i = days.select(col("x"),
        row_number().over(Window.orderBy("day")).cast("long").as("rn"))
        // the spine feeds both self-join sides — checkpoint so the
        // events scan runs once (the theilSen caller contract)
        .localCheckpoint()
      val a = i.toDF("xa", "rna")
      val b = i.toDF("xb", "rnb")
      a.join(broadcast(b),
          col("rnb") > col("rna") && col("rnb") - col("rna") <= 14)
        .select((col("rnb") - col("rna")).as("lag"), col("xa"), col("xb"))
        .groupBy("lag")
        .agg(count(lit(1)).as("cnt"), sum("xa").as("sa"),
          sum("xb").as("sb"), sum(col("xa") * col("xb")).as("sab"),
          sum(col("xa") * col("xa")).as("saa"),
          sum(col("xb") * col("xb")).as("sbb"))
        .selectExpr("lag AS lag_days", "CAST(cnt AS BIGINT) AS n_pairs",
          "CAST(cnt * sab - sa * sb AS BIGINT) AS cov_num",
          "CAST(cnt * saa - sa * sa AS BIGINT) AS var_a_num",
          "CAST(cnt * sbb - sb * sb AS BIGINT) AS var_b_num")
        .orderBy("lag_days")
    },

    // Audience-overlap matrix: for every event-type pair, how many
    // users do both, with the exact Jaccard |A∩B|/|A∪B| — the
    // feature-audience overlap report product analytics runs before
    // bundling features. Intersections are exact user counts; the
    // union denominator is inclusion–exclusion; one IEEE divide.
    //
    // Scale shape: the distinct (user, type) frame is the one
    // row-scale exchange; pair expansion is ROW-LOCAL over each user's
    // ≤5-type set (the BasketPairs discipline — never a user-frame
    // self-join), totals are a ≤5-key rollup and the rule assembly
    // joins broadcast. The oracle's self-join form is the same math.
    Q("q_event_overlap",
      """WITH du AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |tt AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nu
        |  FROM du GROUP BY 1),
        |p AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM du a JOIN du b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ta AS type_a, tb AS type_b, n_both,
        |  t1.nu AS n_a, t2.nu AS n_b,
        |  CAST(n_both AS DOUBLE)
        |    / CAST(t1.nu + t2.nu - n_both AS DOUBLE) AS jaccard
        |FROM p JOIN tt t1 ON ta = t1.event_type
        |  JOIN tt t2 ON tb = t2.event_type
        |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
      val sets = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(array_sort(collect_set(col("event_type"))).as("ts"))
        // pair expansion and the type totals both ride this frame
        .localCheckpoint()
      // posexplode + tail-slice explode: two codegen GENERATEs instead
      // of the interpreted flatten∘transform∘struct lambda chain (the
      // CoTradeGraph.edges rewrite, ~35 % faster warm); `ts` is a
      // sorted SET, so the tail slice is exactly the strictly-greater
      // partner set — identical pair multiset
      val p = sets
        .select(posexplode(col("ts")).as(Seq("__i", "ta")), col("ts"))
        .select(col("ta"),
          explode(slice(col("ts"), col("__i") + lit(2), size(col("ts"))))
            .as("tb"))
        .groupBy(col("ta"), col("tb"))
        .agg(count(lit(1)).cast("long").as("n_both"))
      val tt = sets.select(explode(col("ts")).as("t"))
        .groupBy("t").agg(count(lit(1)).cast("long").as("nu"))
      p.join(broadcast(tt.toDF("t1", "n_a")), col("ta") === col("t1"))
        .join(broadcast(tt.toDF("t2", "n_b")), col("tb") === col("t2"))
        .selectExpr("ta AS type_a", "tb AS type_b", "n_both", "n_a",
          "n_b",
          "CAST(n_both AS DOUBLE)" +
            " / CAST(n_a + n_b - n_both AS DOUBLE) AS jaccard")
        .orderBy("type_a", "type_b")
    },

    // Rolling 28-day OLS revenue trend: per day, the exact regression
    // slope pieces over the trailing four weeks of daily revenue (the
    // "is growth bending" monitor, a window-frame sweep instead of one
    // global fit). All sums ride ONE named window frame; the slope is
    // the exact rational (n·Σxy − ΣxΣy)/(n·Σxx − Σx²) on the integer
    // day index and exact cents, plus the one-divide double. Partial
    // leading windows are dropped (n = 28 only) so every row is a
    // full-support estimate.
    //
    // Scale shape: the day rollup is the one row-scale exchange; the
    // frame windows ride the calendar-bounded spine (~2.4k rows at the
    // fixture horizon). LONG products hold to ~10¹⁴ daily cents.
    Q("q_time_rolling_trend",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)) * 100) AS BIGINT)
        |      AS y
        |  FROM orders GROUP BY 1),
        |i AS (
        |  SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS x FROM d),
        |w AS (
        |  SELECT day,
        |    COUNT(*) OVER win AS n,
        |    SUM(x) OVER win AS sx, SUM(y) OVER win AS sy,
        |    SUM(x * y) OVER win AS sxy, SUM(x * x) OVER win AS sxx
        |  FROM i
        |  WINDOW win AS (ORDER BY x ROWS BETWEEN 27 PRECEDING
        |    AND CURRENT ROW))
        |SELECT day,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day
        |FROM w WHERE n = 28 ORDER BY day""".stripMargin) { (s, d) =>
      val days = Tables.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate"))
          .cast("timestamp_ntz").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(14,2)") * 100)
          .cast("long").as("y"))
      val i = days.select(col("day"), col("y"),
        row_number().over(Window.orderBy("day")).cast("long").as("x"))
      val win = Window.orderBy("x").rowsBetween(-27, 0)
      i.select(col("day"),
          count(lit(1)).over(win).as("n"),
          sum("x").over(win).as("sx"), sum("y").over(win).as("sy"),
          sum(col("x") * col("y")).over(win).as("sxy"),
          sum(col("x") * col("x")).over(win).as("sxx"))
        .where(col("n") === 28)
        .selectExpr("day",
          "CAST(n * sxy - sx * sy AS BIGINT) AS slope_num",
          "CAST(n * sxx - sx * sx AS BIGINT) AS slope_den",
          "CAST(n * sxy - sx * sy AS DOUBLE)" +
            " / CAST(n * sxx - sx * sx AS DOUBLE)" +
            " AS slope_cents_per_day")
        .orderBy("day")
    },

    // RSI-14 (relative strength index) over daily order revenue — the
    // momentum oscillator every market-data stack ships (Cutler's
    // simple-average form, which is window arithmetic; Wilder's EWMA
    // form is q_time_ewma's recursion). Day-over-day revenue diffs
    // split into up/down moves in EXACT cents; the 14-day rolling sums
    // are integers and RSI = 100·up/(up+dn) is one IEEE divide (NULL
    // on a 14-day flat stretch, identically in both engines). Emitted
    // only where the window holds 14 real diffs.
    //
    // Scale shape: one map-side-combinable day rollup, then every
    // window (lag + two rolling sums + the count guard) rides the
    // calendar-bounded day spine in ONE ordered pass — the strict-lint
    // aggregate-bounded exemption. Cents sums hold in BIGINT to ~10¹⁴
    // revenue-cents/day; loud beyond.
    Q("q_time_rsi",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |i AS (
        |  SELECT day, rev - LAG(rev) OVER (ORDER BY day) AS diff FROM d),
        |w AS (
        |  SELECT day,
        |    CAST(SUM(GREATEST(diff, 0)) OVER (ORDER BY day
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS up_sum,
        |    CAST(SUM(GREATEST(-diff, 0)) OVER (ORDER BY day
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS dn_sum,
        |    CAST(COUNT(diff) OVER (ORDER BY day
        |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_diffs
        |  FROM i)
        |SELECT day, up_sum, dn_sum,
        |  CAST(100 * up_sum AS DOUBLE)
        |    / CAST(NULLIF(up_sum + dn_sum, 0) AS DOUBLE) AS rsi
        |FROM w WHERE n_diffs = 14 ORDER BY day""".stripMargin) { (s, d) =>
      val days = Tables.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).cast("timestamp_ntz")
          .as("day"))
        .agg(sum((col("o_totalprice").cast("decimal(14,2)") * 100)
          .cast("long")).cast("long").as("rev"))
      val i = days.select(col("day"),
        (col("rev") - lag("rev", 1).over(Window.orderBy("day"))).as("diff"))
      val win = Window.orderBy("day").rowsBetween(-13, 0)
      i.select(col("day"),
          sum(greatest(col("diff"), lit(0L))).over(win).cast("long")
            .as("up_sum"),
          sum(greatest(-col("diff"), lit(0L))).over(win).cast("long")
            .as("dn_sum"),
          count(col("diff")).over(win).cast("long").as("n_diffs"))
        .where(col("n_diffs") === 14)
        .selectExpr("day", "up_sum", "dn_sum",
          "CAST(100 * up_sum AS DOUBLE)" +
            " / CAST(NULLIF(up_sum + dn_sum, 0) AS DOUBLE) AS rsi")
        .orderBy("day")
    },

    // Lagged CROSS-correlation between two regions' monthly order
    // volumes (does AMERICA lead ASIA?) — q_time_acf's machinery
    // pointed across two series instead of one. Both series come out
    // of ONE pivoted month rollup (no series join), and per lag
    // ℓ ∈ [0, 6] the exact Pearson pieces n·Σxy − Σx·Σy over the
    // (x_t, y_t+ℓ) pairs are integers; ρ_ℓ = cov/√(vx·vy) stays
    // caller-side (no sqrt in oracles). Lag 0 is the contemporaneous
    // correlation.
    //
    // Scale shape: the fact joins two BROADCAST dims (customer is the
    // larger; at warehouse scale bucket it instead), then one
    // map-side-combinable month rollup; the ≤80-row month spine
    // self-joins broadcast. Count products hold in BIGINT to ~10⁹
    // orders/month; loud beyond.
    Q("q_time_ccf",
      """WITH b AS (
        |  SELECT o.o_orderdate, n.n_regionkey AS r
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  WHERE n.n_regionkey IN (1, 2)),
        |m AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
        |    CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS xa,
        |    CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS yb
        |  FROM b GROUP BY 1),
        |i AS (
        |  SELECT xa, yb, ROW_NUMBER() OVER (ORDER BY mo) AS rn FROM m),
        |p AS (
        |  SELECT b2.rn - a.rn AS lag, a.xa AS x, b2.yb AS y
        |  FROM i a JOIN i b2 ON b2.rn >= a.rn AND b2.rn - a.rn <= 6)
        |SELECT lag AS lag_months, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT)
        |    AS cov_num,
        |  CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT)
        |    AS var_x_num,
        |  CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS BIGINT)
        |    AS var_y_num
        |FROM p GROUP BY lag ORDER BY lag_months""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_regionkey").isin(1, 2))
      val m = base
        .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mo"))
        .agg(sum(when(col("n_regionkey") === 1, 1L).otherwise(0L))
            .cast("long").as("xa"),
          sum(when(col("n_regionkey") === 2, 1L).otherwise(0L))
            .cast("long").as("yb"))
      val i = m.select(col("xa"), col("yb"),
        row_number().over(Window.orderBy("mo")).cast("long").as("rn"))
        // the month spine feeds both self-join sides — checkpoint so
        // the orders scan runs once (the q_time_acf caller contract)
        .localCheckpoint()
      val a = i.toDF("x", "yba", "rna")
      val b2 = i.toDF("xab", "y", "rnb")
      a.join(broadcast(b2),
          col("rnb") >= col("rna") && col("rnb") - col("rna") <= 6)
        .select((col("rnb") - col("rna")).as("lag"), col("x"), col("y"))
        .groupBy("lag")
        .agg(count(lit(1)).as("cnt"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .selectExpr("lag AS lag_months", "CAST(cnt AS BIGINT) AS n_pairs",
          "CAST(cnt * sxy - sx * sy AS BIGINT) AS cov_num",
          "CAST(cnt * sxx - sx * sx AS BIGINT) AS var_x_num",
          "CAST(cnt * syy - sy * sy AS BIGINT) AS var_y_num")
        .orderBy("lag_months")
    },

    // Anchored VWAP — the execution-quality benchmark (month-to-date
    // volume-weighted average price in cents per quantity-hundredth):
    // daily (pv, vol) pieces in exact cents/hundredths, cumulated with
    // a month-partitioned running window; vwap_c is the single exact
    // divide. Month anchoring keeps every window frame calendar-bounded
    // AND gives the shuffle a partition key (months parallelize, unlike
    // one global running window).
    //
    // Scale shape: one map-side-combinable day rollup (the row-scale
    // exchange); the running window rides the ≤31-row month frame.
    // Cents sums hold in BIGINT to ~10¹⁴ rows/day; loud beyond.
    Q("q_time_vwap",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
        |    CAST(EXTRACT(YEAR FROM l_shipdate) * 12
        |      + EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS m,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS pv,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS vol
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT day, pv, vol,
        |  CAST(SUM(pv) OVER w AS BIGINT) AS cum_pv,
        |  CAST(SUM(vol) OVER w AS BIGINT) AS cum_vol,
        |  CAST(SUM(pv) OVER w AS DOUBLE)
        |    / CAST(SUM(vol) OVER w AS DOUBLE) AS vwap_c
        |FROM d
        |WINDOW w AS (PARTITION BY m ORDER BY day ROWS UNBOUNDED PRECEDING)
        |ORDER BY day""".stripMargin) { (s, d) =>
      val days = Tables.lineitem(s, d)
        .groupBy(date_trunc("day", col("l_shipdate")).cast("timestamp_ntz")
            .as("day"),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .cast("long").as("m"))
        .agg(sum((col("l_extendedprice").cast("decimal(14,2)") * 100)
            .cast("long")).cast("long").as("pv"),
          sum((col("l_quantity").cast("decimal(12,2)") * 100)
            .cast("long")).cast("long").as("vol"))
      val w = Window.partitionBy("m").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      days.select(col("day"), col("pv"), col("vol"),
          sum("pv").over(w).cast("long").as("cum_pv"),
          sum("vol").over(w).cast("long").as("cum_vol"))
        .selectExpr("day", "pv", "vol", "cum_pv", "cum_vol",
          "CAST(cum_pv AS DOUBLE) / CAST(cum_vol AS DOUBLE) AS vwap_c")
        .orderBy("day")
    },

    // Bollinger pieces — the rolling mean±k·σ band under the no-sqrt
    // oracle discipline: 7-day rolling count sum and sum-of-squares on
    // the daily order-volume series, with the variance NUMERATOR
    // emitted exactly (var_num_x49 = 7·Σx² − (Σx)² = 49·σ²_pop, ≥ 0 by
    // Cauchy–Schwarz — StressSpec pins it) and the band center as the
    // single divide. band = mean ± k·√(var_num)/7 is caller-side.
    // Volume (not revenue) keeps x² in BIGINT to ~10⁹ orders/day.
    //
    // Scale shape: one map-side-combinable day rollup; the rolling
    // window rides the calendar-bounded day frame (global ORDER BY day
    // over ≤2.5k rows at ANY corpus size — the q_time_rsi contract).
    Q("q_time_bollinger",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day, cnt,
        |    CAST(COUNT(*) OVER w7 AS BIGINT) AS n_win,
        |    CAST(SUM(cnt) OVER w7 AS BIGINT) AS roll_sum,
        |    CAST(SUM(cnt * cnt) OVER w7 AS BIGINT) AS roll_sumsq
        |  FROM d
        |  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
        |    AND CURRENT ROW))
        |SELECT day, cnt, roll_sum,
        |  CAST(7 * roll_sumsq - roll_sum * roll_sum AS BIGINT)
        |    AS var_num_x49,
        |  CAST(roll_sum AS DOUBLE) / 7.0e0 AS mean7
        |FROM w WHERE n_win = 7 ORDER BY day""".stripMargin) { (s, d) =>
      val days = Tables.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).cast("timestamp_ntz")
          .as("day"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val w7 = Window.orderBy("day").rowsBetween(-6, 0)
      days.select(col("day"), col("cnt"),
          count(lit(1)).over(w7).cast("long").as("n_win"),
          sum("cnt").over(w7).cast("long").as("roll_sum"),
          sum(col("cnt") * col("cnt")).over(w7).cast("long")
            .as("roll_sumsq"))
        .where(col("n_win") === 7)
        .selectExpr("day", "cnt", "roll_sum",
          "CAST(7 * roll_sumsq - roll_sum * roll_sum AS BIGINT)" +
            " AS var_num_x49",
          "CAST(roll_sum AS DOUBLE) / 7.0e0 AS mean7")
        .orderBy("day")
    },

    // Stochastic oscillator %K — where does today sit in the 14-day
    // revenue range? (lo ≤ rev ≤ hi by construction; 0 ≤ %K ≤ 100, NULL
    // on a degenerate flat window — both laws StressSpec pins.) The
    // rolling MIN/MAX pieces are exact cents; %K is the single exact
    // divide over them. %D (the 3-day SMA of %K) is caller-side.
    //
    // Scale shape: the q_time_rsi contract — one map-side-combinable
    // day rollup, then windows on the calendar-bounded day frame.
    Q("q_time_stochastic",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day, rev,
        |    CAST(MIN(rev) OVER w14 AS BIGINT) AS lo,
        |    CAST(MAX(rev) OVER w14 AS BIGINT) AS hi,
        |    CAST(COUNT(*) OVER w14 AS BIGINT) AS n_win
        |  FROM d
        |  WINDOW w14 AS (ORDER BY day ROWS BETWEEN 13 PRECEDING
        |    AND CURRENT ROW))
        |SELECT day, rev, lo, hi,
        |  CAST(100 * (rev - lo) AS DOUBLE)
        |    / CAST(NULLIF(hi - lo, 0) AS DOUBLE) AS k_pct
        |FROM w WHERE n_win = 14 ORDER BY day""".stripMargin) { (s, d) =>
      val days = Tables.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).cast("timestamp_ntz")
          .as("day"))
        .agg(sum((col("o_totalprice").cast("decimal(14,2)") * 100)
          .cast("long")).cast("long").as("rev"))
      val w14 = Window.orderBy("day").rowsBetween(-13, 0)
      days.select(col("day"), col("rev"),
          min("rev").over(w14).cast("long").as("lo"),
          max("rev").over(w14).cast("long").as("hi"),
          count(lit(1)).over(w14).cast("long").as("n_win"))
        .where(col("n_win") === 14)
        .selectExpr("day", "rev", "lo", "hi",
          "CAST(100 * (rev - lo) AS DOUBLE)" +
            " / CAST(NULLIF(hi - lo, 0) AS DOUBLE) AS k_pct")
        .orderBy("day")
    },

    // On-balance volume — the cumulative flow indicator: each day's
    // order count (the "volume", an exact integer) is added when daily
    // revenue rose day-over-day, subtracted when it fell, skipped when
    // flat or on the first day. Every piece is an exact BIGINT: the
    // cents-scaled revenue drives only the three-way sign, so OBV is
    // bit-stable with no FP anywhere (signed_vol partitions into
    // {-vol, 0, +vol} and |obv| ≤ total volume — both laws StressSpec
    // pins).
    //
    // Scale shape: the q_time_rsi contract — one map-side-combinable
    // day rollup is the only row-scale exchange; lag and the running
    // sum ride the calendar-bounded day frame.
    Q("q_time_obv",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev,
        |    CAST(COUNT(*) AS BIGINT) AS vol
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day, rev, vol, LAG(rev) OVER (ORDER BY day) AS prev
        |  FROM d),
        |sv AS (
        |  SELECT day, rev, vol,
        |    CAST(CASE WHEN prev IS NULL THEN 0
        |         WHEN rev > prev THEN vol
        |         WHEN rev < prev THEN -vol ELSE 0 END AS BIGINT)
        |      AS signed_vol
        |  FROM w)
        |SELECT day, rev, vol, signed_vol,
        |  CAST(SUM(signed_vol) OVER (ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
        |FROM sv ORDER BY day""".stripMargin) { (s, d) =>
      val days = Tables.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).cast("timestamp_ntz")
          .as("day"))
        .agg(sum((col("o_totalprice").cast("decimal(14,2)") * 100)
            .cast("long")).cast("long").as("rev"),
          count(lit(1)).cast("long").as("vol"))
      val w = Window.orderBy("day")
      val sv = days
        .withColumn("prev", lag("rev", 1).over(w))
        .withColumn("signed_vol",
          when(col("prev").isNull, 0L)
            .when(col("rev") > col("prev"), col("vol"))
            .when(col("rev") < col("prev"), -col("vol"))
            .otherwise(0L).cast("long"))
      sv.select(col("day"), col("rev"), col("vol"), col("signed_vol"),
          sum("signed_vol").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long").as("obv"))
        .orderBy("day")
    },

    // Aroon oscillator pieces — days since the 14-day revenue high/low:
    // the rolling ARGMAX under the encoded-integer discipline (no
    // max_by, whose tie rule is engine-specific): rev*100000 + idx is
    // a single exact BIGINT whose MAX recovers the highest revenue
    // with LATEST-index tiebreak and whose MIN recovers the lowest
    // revenue with EARLIEST-index tiebreak — both deterministic in
    // both engines. days_since ∈ [0, 13] and aroon ∈ [0, 100] with
    // {up, down} covering {high today, low today} (StressSpec pins
    // all three). idx < 100000 (a ~274-year daily calendar) and
    // rev < 9.2e13 cents/day are the loud encode bounds.
    //
    // Scale shape: the q_time_rsi contract — one map-side-combinable
    // day rollup; row_number and the 14-day extrema windows ride the
    // calendar-bounded day frame.
    Q("q_time_aroon",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |i AS (
        |  SELECT day, rev,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS idx
        |  FROM d),
        |w AS (
        |  SELECT day, rev, idx,
        |    CAST(COUNT(*) OVER w14 AS BIGINT) AS n_win,
        |    CAST(MAX(rev * 100000 + idx) OVER w14 AS BIGINT) AS hi_enc,
        |    CAST(MIN(rev * 100000 + idx) OVER w14 AS BIGINT) AS lo_enc
        |  FROM i
        |  WINDOW w14 AS (ORDER BY idx ROWS BETWEEN 13 PRECEDING
        |    AND CURRENT ROW))
        |SELECT day, rev,
        |  CAST(idx - (hi_enc % 100000) AS BIGINT) AS days_since_high,
        |  CAST(idx - (lo_enc % 100000) AS BIGINT) AS days_since_low,
        |  CAST(100 * (14 - (idx - (hi_enc % 100000))) AS DOUBLE) / 14.0e0
        |    AS aroon_up,
        |  CAST(100 * (14 - (idx - (lo_enc % 100000))) AS DOUBLE) / 14.0e0
        |    AS aroon_down
        |FROM w WHERE n_win = 14 ORDER BY day""".stripMargin) { (s, d) =>
      val days = Tables.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).cast("timestamp_ntz")
          .as("day"))
        .agg(sum((col("o_totalprice").cast("decimal(14,2)") * 100)
          .cast("long")).cast("long").as("rev"))
      val i = days.withColumn("idx",
        row_number().over(Window.orderBy("day")).cast("long"))
      val w14 = Window.orderBy("idx").rowsBetween(-13, 0)
      i.select(col("day"), col("rev"), col("idx"),
          count(lit(1)).over(w14).cast("long").as("n_win"),
          max(col("rev") * 100000 + col("idx")).over(w14).cast("long")
            .as("hi_enc"),
          min(col("rev") * 100000 + col("idx")).over(w14).cast("long")
            .as("lo_enc"))
        .where(col("n_win") === 14)
        .selectExpr("day", "rev",
          "CAST(idx - (hi_enc % 100000) AS BIGINT) AS days_since_high",
          "CAST(idx - (lo_enc % 100000) AS BIGINT) AS days_since_low",
          "CAST(100 * (14 - (idx - (hi_enc % 100000))) AS DOUBLE) / 14.0e0" +
            " AS aroon_up",
          "CAST(100 * (14 - (idx - (lo_enc % 100000))) AS DOUBLE) / 14.0e0" +
            " AS aroon_down")
        .orderBy("day")
    },

    // Rescaled-range pieces — the Hurst-exponent measurement at three
    // block widths (8/16/32 days): within each full block, the
    // w-scaled cumulative deviation cd_j = w·prefix_j − pos_j·S is an
    // EXACT integer (= w·(prefix_j − j·mean)), its range r_xw = max −
    // min is the scaled R, and the block variance numerator
    // w·Σx² − S² = w²·σ²_pop is exact by Cauchy–Schwarz. R/S per
    // block = r_xw / √var_num — caller-side; H is the slope of mean
    // log(R/S) on log w. Block ids use the exactly-divisible division
    // trick (idx−1−(idx−1)%w)/w — the quotient is integral, so the
    // double divide is exact in both engines. var_num = 0 ⇒ r_xw = 0
    // (constant block) — StressSpec pins it with the non-negativity
    // and block-size laws.
    //
    // Scale shape: one map-side-combinable day rollup; the ×3 width
    // expansion and all block windows ride the calendar-bounded day
    // frame, partitioned by (w, blk) — parallel across blocks.
    Q("q_time_hurst",
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |i AS (
        |  SELECT day, x,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS idx
        |  FROM d),
        |b AS (
        |  SELECT ww.w AS w,
        |    CAST((idx - 1 - (idx - 1) % ww.w) / ww.w AS BIGINT) AS blk,
        |    idx, x
        |  FROM i CROSS JOIN (VALUES (8), (16), (32)) AS ww(w)),
        |p AS (
        |  SELECT w, blk, x,
        |    CAST(SUM(x) OVER (PARTITION BY w, blk ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS pre,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY w, blk ORDER BY idx)
        |      AS BIGINT) AS pos,
        |    CAST(SUM(x) OVER (PARTITION BY w, blk) AS BIGINT) AS s,
        |    CAST(SUM(x * x) OVER (PARTITION BY w, blk) AS BIGINT) AS ssq,
        |    CAST(COUNT(*) OVER (PARTITION BY w, blk) AS BIGINT) AS n
        |  FROM b),
        |r AS (
        |  SELECT w, blk, s, ssq,
        |    CAST(MAX(w * pre - pos * s) - MIN(w * pre - pos * s)
        |      AS BIGINT) AS r_xw
        |  FROM p WHERE n = w GROUP BY w, blk, s, ssq)
        |SELECT CAST(w AS BIGINT) AS w, blk, s, r_xw,
        |  CAST(w * ssq - s * s AS BIGINT) AS var_num_xw2
        |FROM r ORDER BY w, blk""".stripMargin) { (s, d) =>
      import s.implicits._
      val days = Tables.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).cast("timestamp_ntz")
          .as("day"))
        .agg(count(lit(1)).cast("long").as("x"))
      val i = days.withColumn("idx",
        row_number().over(Window.orderBy("day")).cast("long"))
      val widths = Seq(8L, 16L, 32L).toDF("w")
      val b = i.crossJoin(broadcast(widths))
        .selectExpr("w",
          "CAST((idx - 1 - (idx - 1) % w) / w AS BIGINT) AS blk",
          "idx", "x")
      val wb = Window.partitionBy("w", "blk")
      val p = b.select(col("w"), col("blk"), col("x"),
        sum("x").over(wb.orderBy("idx")
          .rowsBetween(Window.unboundedPreceding, 0)).cast("long")
          .as("pre"),
        row_number().over(wb.orderBy("idx")).cast("long").as("pos"),
        sum("x").over(wb).cast("long").as("s"),
        sum(col("x") * col("x")).over(wb).cast("long").as("ssq"),
        count(lit(1)).over(wb).cast("long").as("n"))
      p.where(col("n") === col("w"))
        .groupBy("w", "blk", "s", "ssq")
        .agg((max(col("w") * col("pre") - col("pos") * col("s"))
          - min(col("w") * col("pre") - col("pos") * col("s")))
          .cast("long").as("r_xw"))
        .selectExpr("CAST(w AS BIGINT) AS w", "blk", "s", "r_xw",
          "CAST(w * ssq - s * s AS BIGINT) AS var_num_xw2")
        .orderBy("w", "blk")
    }
  )
}
