package graft.queries

import graft.core.{Dsl, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Higher-order analytics idioms a SECDB-style analyst runs daily over the
  * fact tables: interval-union coverage (gaps-and-islands), Markov
  * transition matrices, deterministic hash sampling, last-touch
  * attribution, top-N concentration, and rate-anomaly flagging.
  *
  * Scale story (common to all six): every query is one hash shuffle on a
  * high-cardinality key (suppkey / user_id / orderkey-hash) followed by
  * metadata-sized post-aggregation. Window passes are always partitioned
  * by that key — no global single-task sort touches data-sized frames;
  * the only unpartitioned frames are post-aggregate outputs bounded by
  * the key domain (25 transition pairs, ~720 hourly buckets, 25 nations).
  */
object InsightQueries {
  import Dsl._

  /** Deterministic total order for lineitem interval rows — ties in
    * (start, end) are broken by the full physical key so both engines
    * compute the identical running maximum (FIXTURES.md: full rows are
    * distinct at sf0.01; (orderkey, linenumber, partkey) collides only
    * once at sf0.001, where the colliding rows are identical anyway).
    */
  private val ivOrder = Seq("s", "e", "l_orderkey", "l_linenumber", "l_partkey")

  val all: Seq[Q] = Seq(
    // Interval-union coverage (gaps-and-islands): per supplier, merge the
    // overlapping shipment windows [shipdate, shipdate + quantity days]
    // into maximal islands and report how many islands and how many total
    // covered days. The island test is the classic running-max sweep:
    // a row opens a new island iff its start exceeds the max end seen so
    // far; islands are contiguous by construction, so each contributes
    // exactly (max end − min start) days. All arithmetic is integer date
    // math — exact in both engines.
    //
    // Scale shape: ONE shuffle (hash by l_suppkey), per-key sorted window
    // sweep (each supplier's group is task-sized at any sf), then two
    // combinable aggregations that reuse the window's hash layout.
    Q("q_interval_coverage",
      """WITH iv AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS s,
        |         CAST(l_shipdate AS DATE) + CAST(l_quantity AS INTEGER) AS e,
        |         l_orderkey, l_linenumber, l_partkey
        |  FROM lineitem),
        |m AS (
        |  SELECT *, MAX(e) OVER (PARTITION BY l_suppkey
        |      ORDER BY s, e, l_orderkey, l_linenumber, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM iv),
        |g AS (
        |  SELECT *, SUM(CASE WHEN prevmax IS NULL OR s > prevmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY l_suppkey
        |            ORDER BY s, e, l_orderkey, l_linenumber, l_partkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM g0) ,
        |isl AS (
        |  SELECT l_suppkey, island, MAX(e) - MIN(s) AS d
        |  FROM g GROUP BY 1, 2)
        |SELECT l_suppkey, COUNT(*) AS n_islands,
        |       CAST(SUM(d) AS BIGINT) AS covered_days
        |FROM isl GROUP BY l_suppkey ORDER BY l_suppkey"""
        .stripMargin.replace("FROM g0", "FROM m")) { (s, d) =>
      val iv = Tables.lineitem(s, d)
        .select(col("l_suppkey"), to_date(col("l_shipdate")).as("s"),
          date_add(to_date(col("l_shipdate")),
            col("l_quantity").cast("int")).as("e"),
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      val w = Window.partitionBy("l_suppkey")
        .orderBy(ivOrder.map(col): _*)
      val swept = iv
        .withColumn("prevmax",
          max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("isNew",
          when(col("prevmax").isNull || col("s") > col("prevmax"), 1)
            .otherwise(0))
        .withColumn("island",
          sum(col("isNew")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      swept.groupBy("l_suppkey", "island")
        .agg(datediff(max(col("e")), min(col("s"))).as("d"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("d")).cast("long").as("covered_days"))
        .orderBy("l_suppkey")
    },

    // Markov transition matrix over the event stream: per user, the
    // (state → next state) counts under the (ts, event_id) total order,
    // plus each transition's probability within its source state. The
    // probability is a ratio of two exact BIGINT counts through one IEEE
    // division — bit-identical across engines. Output is the 5×5 =
    // ≤25-row matrix (metadata-sized at any sf).
    //
    // Hourly-volume anomaly detection with EXACT arithmetic: flag the
    // (event_type, hour) buckets whose count sits > 3σ from that type's
    // hourly mean. The z-test z² > 9 rewrites to pure integer algebra —
    //   (m·n − S)² > 9·(m·Q − S²),  S = Σn, Q = Σn², m = #hours —
    // so there is NO sqrt, NO division, NO float anywhere: both engines
    // compare the same integers (HUGEINT / capped DECIMAL(38,0); exact
    // for totals up to ~10¹⁸ buckets·count², loud overflow beyond).
    // Scale: one (type, hour) count aggregate, a ≤|types| stats rollup
    // broadcast back, a row-local predicate — no window over the fact,
    // no second scan.
    Q("q_event_anomaly",
      """WITH b AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, COUNT(*) AS m,
        |    CAST(SUM(n) AS HUGEINT) AS s, CAST(SUM(n * n) AS HUGEINT) AS q
        |  FROM b GROUP BY event_type)
        |SELECT b.event_type, b.h AS hour, CAST(b.n AS BIGINT) AS n,
        |  CAST((CAST(st.m AS HUGEINT) * b.n - st.s)
        |       * (CAST(st.m AS HUGEINT) * b.n - st.s)
        |       - 9 * (CAST(st.m AS HUGEINT) * st.q - st.s * st.s)
        |       AS BIGINT) AS margin
        |FROM b JOIN st ON b.event_type = st.event_type
        |WHERE (CAST(st.m AS HUGEINT) * b.n - st.s)
        |      * (CAST(st.m AS HUGEINT) * b.n - st.s)
        |      > 9 * (CAST(st.m AS HUGEINT) * st.q - st.s * st.s)
        |ORDER BY b.event_type, hour""".stripMargin) { (s, d) =>
      val D = "decimal(19,0)"
      val b = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"))
        .agg(count(lit(1)).as("n"))
      val st = b.groupBy(col("event_type").as("et"))
        .agg(count(lit(1)).as("m"),
          sum(col("n").cast(D)).as("s"),
          sum((col("n") * col("n")).cast(D)).as("q"))
      val dev = col("m").cast(D) * col("n").cast(D) - col("s")
      val bound = lit(9).cast(D) * (col("m").cast(D) * col("q")
        - col("s") * col("s"))
      b.join(broadcast(st), col("event_type") === col("et"))
        .withColumn("margin", (dev * dev - bound).cast("long"))
        .filter(dev * dev > bound)
        .select(col("event_type"), col("h").as("hour"),
          col("n").cast("long").as("n"), col("margin"))
        .orderBy("event_type", "hour")
    },

    // Scale shape: one shuffle on user_id for the lead() pass (per-user
    // groups are task-sized), one map-side-combinable count over ≤25
    // keys, and a window over the 25-row aggregate.
    Q("q_event_transitions",
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |t AS (
        |  SELECT from_type, to_type, COUNT(*) AS cnt
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, cnt,
        |  CAST(cnt AS DOUBLE) /
        |    CAST(SUM(cnt) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
        |FROM t ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
      val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val t = Tables.events(s, d)
        .select(col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(wSeq).as("to_type"))
        .where(col("to_type").isNotNull)
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("cnt"))
      t.withColumn("prob",
          col("cnt").cast("double") /
            sum(col("cnt")).over(Window.partitionBy("from_type"))
              .cast("double"))
        .orderBy("from_type", "to_type")
    },

    // Deterministic hash sampling: a reproducible ~3.7% Bernoulli sample
    // of orders selected by Knuth multiplicative hashing on the primary
    // key — the sampling primitive that lets two independent runs (or two
    // engines) agree row-for-row on the sample, unlike rand(). Pure
    // int64 arithmetic (max key · 2654435761 ≪ 2⁶³), identical in both
    // engines. The filter is pushdown-eligible row-local work; the
    // aggregate is map-side combinable over 5 priority groups.
    Q("q_sample_hash",
      s"""SELECT o_orderpriority, COUNT(*) AS n_sampled,
         |  ${d2dSql(dsumSql("o_totalprice"))} AS sum_sampled
         |FROM orders
         |WHERE (o_orderkey * 2654435761) % 1000 < 37
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
        Tables.orders(s, d)
          .where((col("o_orderkey") * lit(2654435761L)) % 1000 < 37)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_sampled"),
            d2d(dsum(col("o_totalprice"))).as("sum_sampled"))
          .orderBy("o_orderpriority")
    },

    // Systematic PPS (probability-proportional-to-size) sampling — the
    // WEIGHTED sampling primitive a training-data pipeline needs when
    // documents carry quality weights (here: balance cents shifted
    // positive): walk the cumulative weight in a
    // deterministic key order and take every crossing of a fixed
    // weight grid (step = ⌊W/500⌋), so a row's inclusion count is
    // EXACTLY proportional to its weight (heavy rows can be drawn more
    // than once — true PPS multiplicity). All-integer: cumulative
    // sums, the grid, and the crossing count are exact, so the whole
    // sample is oracle-hashed — no RNG, no transcendentals (the
    // u^(1/w) exponential-race form can't cross-engine-hash; this one
    // can, and it's the form survey sampling actually ships).
    //
    // Scale shape: the running weight is the standard TWO-PASS
    // distributed prefix sum — key space bucketed, one partitioned
    // running sum per bucket, bucket offsets via a window over the
    // aggregate-bounded bucket totals, broadcast back. No global
    // single-task window anywhere (strict-mode lint-clean); prefix
    // sums are associative, so the result is bit-identical to the
    // oracle's one global window.
    Q("q_sample_weighted",
      """WITH c AS (
        |  SELECT c_custkey AS k, c_mktsegment AS seg,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100001 AS w
        |  FROM customer),
        |cum AS (SELECT k, seg, w, SUM(w) OVER (ORDER BY k) AS cw FROM c),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM c),
        |st AS (SELECT CAST((tw - tw % 500) / 500 AS BIGINT) AS step FROM tot),
        |sel AS (
        |  SELECT k, seg, w,
        |    CAST((cw - cw % step) / step AS BIGINT)
        |      - CAST(((cw - w) - (cw - w) % step) / step AS BIGINT) AS m
        |  FROM cum CROSS JOIN st)
        |SELECT seg, CAST(SUM(m) AS BIGINT) AS n_sampled,
        |  CAST(SUM(m * w) AS BIGINT) AS w_sampled,
        |  CAST(SUM(m * k) AS BIGINT) AS key_sum
        |FROM sel WHERE m > 0 GROUP BY seg ORDER BY seg""".stripMargin) {
      (s, d) =>
        val c = Tables.customer(s, d)
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
            ((col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(12, 2))
              * 100).cast("long") + 100001).as("w"))
        val local = c
          .withColumn("bkt", ((col("k") - col("k") % 1024) / 1024).cast("long"))
          .withColumn("lcw",
            sum("w").over(Window.partitionBy("bkt").orderBy("k")))
        val offs = local.groupBy("bkt").agg(sum("w").as("bw"))
          .withColumn("off", coalesce(sum("bw").over(
            Window.orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("bkt", "off")
        val cum = local.join(broadcast(offs), "bkt")
          .withColumn("cw", col("lcw") + col("off"))
        val st = broadcast(c.agg(
          ((sum("w") - sum("w") % 500) / 500).cast("long").as("step")))
        def grid(x: org.apache.spark.sql.Column) =
          ((x - x % col("step")) / col("step")).cast("long")
        cum.crossJoin(st)
          .withColumn("m", grid(col("cw")) - grid(col("cw") - col("w")))
          .where(col("m") > 0)
          .groupBy("seg")
          .agg(sum("m").cast("long").as("n_sampled"),
            sum(col("m") * col("w")).cast("long").as("w_sampled"),
            sum(col("m") * col("k")).cast("long").as("key_sum"))
          .orderBy("seg")
    },

    // Last-touch attribution: each purchase is attributed to the most
    // recent PRECEDING non-purchase event of the same user (the
    // marketing-channel question). last(... IGNORE NULLS) over the
    // (ts, event_id)-ordered preceding frame is deterministic under the
    // total order; purchases with no prior touch land in 'none'.
    //
    // Scale shape: one shuffle on user_id, per-user window sweep, then a
    // ≤5-row combinable aggregate. At 100 TB this is the streaming
    // flatMapGroupsWithState shape; batch keeps the same partitioning.
    Q("q_event_attribution",
      s"""WITH a AS (
         |  SELECT event_type, value,
         |    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
         |               IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ch
         |  FROM events)
         |SELECT COALESCE(ch, 'none') AS channel, COUNT(*) AS n_purchases,
         |  ${d2dSql(dsumSql("value"))} AS revenue
         |FROM a WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY channel""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("event_type"), col("value"),
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w).as("ch"))
        .where(col("event_type") === "purchase")
        .groupBy(coalesce(col("ch"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          d2d(dsum(col("value"))).as("revenue"))
        .orderBy("channel")
    },

    // Top-N concentration: per nation, what share of order revenue comes
    // from its top-5 customers (revenue ties broken by custkey so both
    // engines pick the same five). Internal arithmetic stays exact
    // DECIMAL; the share is one IEEE division of the two d2d-converted
    // exact sums — bit-identical.
    //
    // Scale shape: customer is a broadcast dim onto the orders fact; the
    // per-customer rollup shuffles once on (nation, custkey); the window
    // runs per nation over ≤|customers-per-nation| aggregated rows; the
    // final aggregate is 25 rows.
    Q("q_agg_topn_share",
      """WITH rev AS (
        |  SELECT c_nationkey, c_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS r
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |    ORDER BY r DESC, c_custkey) AS rn
        |  FROM rev),
        |agg AS (
        |  SELECT c_nationkey, COUNT(*) AS n_cust,
        |    CAST(SUM(r) AS DECIMAL(18,4)) AS total_r,
        |    CAST(SUM(CASE WHEN rn <= 5 THEN r ELSE 0 END) AS DECIMAL(18,4)) AS top5_r
        |  FROM rk GROUP BY 1)
        |SELECT c_nationkey, n_cust, %TOT% AS total_rev, %TOP% AS top5_rev,
        |  %TOP% / %TOT% AS top5_share
        |FROM agg ORDER BY c_nationkey""".stripMargin
        .replace("%TOT%", Dsl.d2dSql("total_r"))
        .replace("%TOP%", Dsl.d2dSql("top5_r"))) { (s, d) =>
      val rev = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey", "c_custkey")
        .agg(dsum(col("o_totalprice")).as("r"))
      val rk = rev.withColumn("rn",
        row_number().over(Window.partitionBy("c_nationkey")
          .orderBy(col("r").desc, col("c_custkey"))))
      rk.groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("r")).cast(D18).as("total_r"),
          sum(when(col("rn") <= 5, col("r")).otherwise(lit(0))).cast(D18)
            .as("top5_r"))
        .select(col("c_nationkey"), col("n_cust"),
          d2d(col("total_r")).as("total_rev"),
          d2d(col("top5_r")).as("top5_rev"),
          (d2d(col("top5_r")) / d2d(col("total_r"))).as("top5_share"))
        .orderBy("c_nationkey")
    },

    // Rate-anomaly flagging: hourly event-count buckets whose rate
    // exceeds 2× the corpus mean. The threshold test is the integer
    // cross-multiply cnt·n_hours > 2·total — NO floating-point compare
    // anywhere near the decision boundary, so the flagged set is exact in
    // both engines; the reported ratio is one IEEE division of exact
    // int64 products. Stats come from a broadcast one-row aggregate (the
    // SizeProbe idiom), not a global window.
    Q("q_time_anomaly",
      """WITH h AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
        |    COUNT(*) AS cnt
        |  FROM events GROUP BY 1),
        |st AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
        |              COUNT(*) AS n_hours FROM h)
        |SELECT bucket, cnt,
        |  CAST(cnt * n_hours AS DOUBLE) / CAST(total AS DOUBLE) AS rate_ratio
        |FROM h, st
        |WHERE cnt * n_hours > 2 * total
        |ORDER BY bucket""".stripMargin) { (s, d) =>
      val h = Tables.events(s, d)
        .groupBy(expr("CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ)")
          .as("bucket"))
        .agg(count(lit(1)).as("cnt"))
      val st = h.agg(sum(col("cnt")).cast("long").as("total"),
        count(lit(1)).as("n_hours"))
      h.crossJoin(broadcast(st))
        .where(col("cnt") * col("n_hours") > col("total") * 2)
        .select(col("bucket"), col("cnt"),
          ((col("cnt") * col("n_hours")).cast("double") /
            col("total").cast("double")).as("rate_ratio"))
        .orderBy("bucket")
    },

    // Co-occurrence lift between event types at user-day granularity:
    // lift(a,b) = P(a∧b) / (P(a)·P(b)) over the user-day universe — the
    // association-mining primitive (PMI without the banned log). The
    // numerator/denominator are exact BIGINT products (n_ab·n_userdays ≪
    // 2⁶³) through one IEEE division — bit-identical.
    //
    // Scale shape: NO self-join, and ONE pass over the data. The first
    // shuffle builds per-(user, day) sorted type-sets (collect_set over a
    // bounded 5-value domain ⇒ O(1) per-key state). Then a single
    // row-local explode emits a TAGGED union — the ≤C(5,2)=10 pair
    // structs, the ≤5 singleton structs (tb NULL), and one universe
    // marker (both NULL) — so ONE ≤16-key aggregation produces n_ab, n_a
    // AND the user-day count together; numerator and denominators are
    // filters over that one tally frame (its exchange is reused, not
    // recomputed), joined back broadcast. The oracle's
    // distinct-self-join twin would shuffle a pair frame and scan the
    // events three times; this plan scans once and never puts per-user
    // pairs on the wire.
    Q("q_event_lift",
      """WITH ut AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    event_type
        |  FROM events),
        |p AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS n_ab
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.day = b.day
        |   AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |na AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
        |u AS (SELECT COUNT(*) AS nu
        |      FROM (SELECT DISTINCT user_id, day FROM ut))
        |SELECT ta, tb, n_ab,
        |  CAST(n_ab * nu AS DOUBLE) / CAST(x.n * y.n AS DOUBLE) AS lift
        |FROM p, u
        |JOIN na x ON p.ta = x.event_type
        |JOIN na y ON p.tb = y.event_type
        |ORDER BY ta, tb""".stripMargin) { (s, d) =>
      val sets = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sort_array(collect_set(col("event_type"))).as("tset"))
      val tally = sets.select(explode(expr(
          """concat(
            |  flatten(transform(tset, (x, i) ->
            |    transform(slice(tset, i + 2, size(tset)),
            |              y -> struct(x AS ta, y AS tb)))),
            |  transform(tset, x ->
            |    struct(x AS ta, CAST(NULL AS STRING) AS tb)),
            |  array(struct(CAST(NULL AS STRING) AS ta,
            |               CAST(NULL AS STRING) AS tb)))""".stripMargin))
          .as("p"))
        .groupBy(col("p.ta").as("ta"), col("p.tb").as("tb"))
        .agg(count(lit(1)).as("c"))
        // ≤16-row tally: materialize once (the SizeProbe/checkpoint idiom,
        // eager — documented construction-time job) so the three filter
        // branches below reread a tiny cached frame instead of re-running
        // the data-sized sets shuffle per branch
        .localCheckpoint()
      val pairs = tally.where(col("ta").isNotNull && col("tb").isNotNull)
        .select(col("ta"), col("tb"), col("c").as("n_ab"))
      val na = tally.where(col("ta").isNotNull && col("tb").isNull)
        .select(col("ta").as("event_type"), col("c").as("n"))
      val nu = tally.where(col("ta").isNull && col("tb").isNull)
        .select(col("c").as("nu"))
      pairs.crossJoin(broadcast(nu))
        .join(broadcast(na.select(col("event_type").as("ta"),
          col("n").as("n_a"))), "ta")
        .join(broadcast(na.select(col("event_type").as("tb"),
          col("n").as("n_b"))), "tb")
        .select(col("ta"), col("tb"), col("n_ab"),
          ((col("n_ab") * col("nu")).cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("lift"))
        .orderBy("ta", "tb")
    },

    // Forward as-of: time from each purchase to the SAME user's next
    // 'view' event (re-engagement latency), bucketed by purchase hour of
    // day. The forward match is min-over-the-following-frame of the
    // conditional epoch — the mirror of the backward as-of join, kept in
    // one per-user window pass (no join at all). Latency sums are exact
    // int64 µs; the mean is one IEEE division of exact operands.
    //
    // Scale shape: one shuffle on user_id for the window, then a 24-key
    // combinable aggregate and the output sort.
    Q("q_time_to_next",
      """WITH seq AS (
        |  SELECT user_id, event_type, ts, epoch_us(ts) AS us,
        |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
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
        |GROUP BY 1 ORDER BY hh""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("event_type"), col("ts"),
          expr("unix_micros(cast(ts as timestamp))").as("us"),
          min(when(col("event_type") === "view",
            expr("unix_micros(cast(ts as timestamp))"))).over(w)
            .as("next_view_us"))
        .where(col("event_type") === "purchase")
        .groupBy(hour(col("ts")).as("hh"))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("next_view_us")).as("n_matched"),
          sum(col("next_view_us") - col("us")).cast("long")
            .as("sum_latency_us"),
          (sum(col("next_view_us") - col("us")).cast("double") /
            count(col("next_view_us"))).as("mean_latency_us"))
        .orderBy("hh")
    },

    // Rolling 7-day distinct purchasing users per day (the DAU/WAU
    // retention-dashboard shape). Exact sliding COUNT DISTINCT is
    // non-decomposable, so the scale plan is the bounded-expansion
    // rewrite: each distinct (user, purchase-day) row is exploded to the
    // ≤7 spine days it is visible in (a fixed ×7 blowup of an
    // already-deduped frame — linear, shuffle on the spine day), then a
    // plain two-level distinct count per day. The spine is the set of
    // active days, so no dense calendar join is needed.
    Q("q_time_rolling_distinct",
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |vis AS (
        |  SELECT user_id, day + CAST(k AS INTEGER) AS vday
        |  FROM ud, (SELECT unnest(range(0, 7)) AS k) ks),
        |spine AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS vday
        |          FROM events)
        |SELECT CAST(s.vday AS TIMESTAMP) AS day,
        |       COUNT(DISTINCT v.user_id) AS u7
        |FROM spine s JOIN vis v ON v.vday = s.vday
        |GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val ud = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val vis = ud.select(col("user_id"),
        explode(expr("transform(sequence(0, 6), k -> date_add(day, k))"))
          .as("vday"))
      val spine = ev.select(to_date(col("ts")).as("vday")).distinct()
      spine.join(vis, "vday")
        .groupBy(col("vday").cast("timestamp_ntz").as("day"))
        .agg(countDistinct(col("user_id")).as("u7"))
        .orderBy("day")
    },

    // Gini coefficient of revenue concentration per nation — exact, via
    // the positional identity G = Σ(2i−n−1)·x(i) / (n·Σx) over revenues
    // sorted ascending (ties broken by custkey ⇒ the numerator is
    // invariant under tie order only up to equal x values, which is
    // exactly when it doesn't matter). Numerator and denominator stay
    // DECIMAL end-to-end; one double division at the end.
    //
    // Scale shape: broadcast dim onto the fact, one (nation, cust)
    // rollup shuffle, per-nation window over the aggregated frame, and a
    // 25-row output.
    Q("q_agg_gini",
      """WITH rev AS (
        |  SELECT c_nationkey, c_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS r
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                       ORDER BY r, c_custkey) AS i,
        |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n
        |  FROM rev)
        |SELECT c_nationkey, MAX(n) AS n_cust,
        |  %NUM% / (MAX(n) * %DEN%) AS gini
        |FROM rk GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
        .replace("%NUM%", Dsl.d2dSql(
          "CAST(SUM(CAST(CAST(2*i - n - 1 AS DECIMAL(10,0)) * r AS DECIMAL(28,4))) AS DECIMAL(28,4))"))
        .replace("%DEN%", Dsl.d2dSql("CAST(SUM(r) AS DECIMAL(18,4))"))) {
      (s, d) =>
        val rev = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_nationkey", "c_custkey")
          .agg(dsum(col("o_totalprice")).as("r"))
        val w = Window.partitionBy("c_nationkey")
        val rk = rev
          .withColumn("i", row_number().over(w.orderBy(col("r"), col("c_custkey"))))
          .withColumn("n", count(lit(1)).over(w))
        rk.groupBy("c_nationkey")
          .agg(max(col("n")).as("n_cust"),
            sum(((col("i") * 2 - col("n") - 1).cast(DecimalType(10, 0)) *
              col("r")).cast(DecimalType(28, 4))).cast(DecimalType(28, 4))
              .as("num"),
            sum(col("r")).cast(D18).as("den"))
          .select(col("c_nationkey"), col("n_cust"),
            (d2d(col("num")) / (col("n_cust") * d2d(col("den")))).as("gini"))
          .orderBy("c_nationkey")
    },

    // Session path analysis: the 10 most common 3-step event paths
    // within 12h-gap sessions (the "how do users actually move" query).
    // Session ids come from the same lag/gap cumsum as q_sessionize;
    // trigrams from two leads inside the (user, session) window. The
    // trigram domain is ≤5³=125 keys ⇒ the count frame is metadata-sized
    // and the top-10 fuses to TakeOrderedAndProject (no global sort).
    //
    // Scale shape: ONE data shuffle on user_id — the session window and
    // the trigram window share the identical (user-prefixed)
    // partitioning and sort order, so the second window adds no
    // exchange; the only other exchange is the map-side-combined ≤125-key
    // trigram count.
    Q("q_event_paths",
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('microsecond', lag(ts) OVER w, ts) > 43200000000
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
        |ORDER BY n DESC, t1, t2, t3 LIMIT 10""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = Tables.events(s, d)
        .withColumn("is_new",
          when(lag(col("ts"), 1).over(w).isNull ||
            expr("timestampdiff(MICROSECOND, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)") > 43200000000L, 1)
            .otherwise(0))
        .withColumn("sid", sum(col("is_new")).over(wRun))
      val ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
      sess.select(col("event_type").as("t1"),
          lead(col("event_type"), 1).over(ws).as("t2"),
          lead(col("event_type"), 2).over(ws).as("t3"))
        .where(col("t3").isNotNull)
        .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(10)
    },

    // Pareto concentration: the smallest number of top customers covering
    // ≥80% of each nation's revenue ("how few accounts are the business").
    // The 80% test is the exact decimal cross-multiply 5·cum ≥ 4·total —
    // no FP at the decision boundary, so k80 is exact in both engines.
    //
    // Scale shape: like q_stat_winsorize, ALL window passes (ordered
    // cumsum, rank, unordered total/count) share one per-nation exchange
    // over the already-aggregated per-customer frame; the final rollup
    // reuses that layout. One data shuffle (the per-customer rollup).
    Q("q_agg_pareto",
      """WITH rev AS (
        |  SELECT c_nationkey, c_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS r
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                       ORDER BY r DESC, c_custkey) AS i,
        |    CAST(SUM(r) OVER (PARTITION BY c_nationkey
        |      ORDER BY r DESC, c_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DECIMAL(18,4)) AS cum,
        |    CAST(SUM(r) OVER (PARTITION BY c_nationkey)
        |      AS DECIMAL(18,4)) AS tot,
        |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n
        |  FROM rev)
        |SELECT c_nationkey, MAX(n) AS n_cust,
        |  MIN(CASE WHEN 5*cum >= 4*tot THEN i END) AS k80
        |FROM rk GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) {
      (s, d) =>
        val rev = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select("c_custkey", "c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_nationkey", "c_custkey")
          .agg(dsum(col("o_totalprice")).as("r"))
        val wN = Window.partitionBy("c_nationkey")
        val wOrd = wN.orderBy(col("r").desc, col("c_custkey"))
        rev
          .withColumn("i", row_number().over(wOrd))
          .withColumn("cum", sum(col("r"))
            .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)).cast(D18))
          .withColumn("tot", sum(col("r")).over(wN).cast(D18))
          .withColumn("n", count(lit(1)).over(wN))
          .groupBy("c_nationkey")
          .agg(max(col("n")).as("n_cust"),
            min(when(col("cum") * 5 >= col("tot") * 4, col("i")))
              .cast("long").as("k80"))
          .orderBy("c_nationkey")
    },

    // Rolling positional median of each user's trailing-7-event values —
    // the robust smoothing pass (median filter) for noisy per-entity
    // series. Median = the middle element of the SORTED trailing window
    // at position (w+1) div 2 — values pass through untouched (no
    // arithmetic), so parity is exact. The bounded 7-row frame keeps the
    // collect O(1) per row.
    //
    // Scale shape: one shuffle on user_id; the sliding collect is
    // row-local within the sorted per-user partition.
    Q("q_window_median_sliding",
      """SELECT user_id, event_id, value,
        |  win[(length(win)+1)//2] AS med7
        |FROM (
        |  SELECT user_id, event_id, value,
        |    list_sort(list(value) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
        |  FROM events)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          sort_array(collect_list(col("value")).over(w)).as("win"))
        .select(col("user_id"), col("event_id"), col("value"),
          element_at(col("win"), ((size(col("win")) + 1) / 2).cast("int"))
            .as("med7"))
        .orderBy("user_id", "event_id")
    },

    // File-provenance scan (the lineage primitive): per-parquet-file row
    // counts and sizes from the hidden _metadata struct — how a 100 TB
    // table audit attributes bad rows back to their source files without
    // a separate manifest store. Capability-only: DuckDB has no _metadata
    // twin; InsightSpec gates it against the filesystem listing.
    Q.cap("cap_scan_metadata") { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("_metadata.file_name").as("file_name"),
          col("_metadata.file_size").as("file_size"))
        .groupBy("file_name", "file_size")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("file_name")
    },

    // LTTB downsampling of each event-type value series to ≤32 visually
    // representative points (fixed-anchor parallel variant — see
    // operators/Lttb.scala for the algorithm and determinism contract).
    // Capability-only: the triangle-area argmax has no tractable DuckDB
    // twin; InsightSpec gates it against a driver-side reference
    // implementation point-for-point.
    Q.cap("cap_time_lttb") { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        col("value"), col("event_id"))
      graft.operators.Lttb
        .downsample(ev, "event_type", "us", "value", "event_id", 32)
        .orderBy("event_type", "bucket")
    },

    // Market-basket pair mining: the top-20 brand pairs most often
    // bought together in one order — the frequent-itemset primitive
    // (k = 2) behind co-purchase recommendations. Exact counts, total
    // tie-break (count DESC, then both brands) so the LIMIT cut is
    // deterministic.
    //
    // Scale shape: the per-order distinct-brand frame is the only
    // row-scale shuffle (hash on l_orderkey); the pair generator is a
    // SELF-join on that same key, so it reuses the co-partitioned layout
    // with BOUNDED fan-out — ≤C(25,2) = 300 pairs/order because the
    // brand domain is 25 (real orders carry ≤7 items), i.e. linear in
    // orders at any sf, never quadratic in rows. The part lookup shuffles
    // on p_partkey (a dimension 1/30 the fact size; too big to broadcast
    // at 100 TB, AQE may still elect it at small sf). The pair rollup is
    // ≤300 keys → map-side combine → TakeOrdered(20) on metadata.
    Q("q_basket_pairs",
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS k, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT a.brand AS brand_a, b2.brand AS brand_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM b a JOIN b b2 ON a.k = b2.k AND a.brand < b2.brand
        |GROUP BY a.brand, b2.brand
        |ORDER BY n_orders DESC, brand_a, brand_b
        |LIMIT 20""".stripMargin) { (s, d) =>
      val baskets = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("k"), col("p_brand").as("brand"))
      graft.operators.BasketPairs.topPairs(baskets, "k", "brand", 20)
        .select(col("item_a").as("brand_a"), col("item_b").as("brand_b"),
          col("n_baskets").as("n_orders"))
    },

    // Customer-lifecycle churn matrix: per month, how many customers were
    // active, and of those how many were retained (active last month),
    // new (first month ever) or resurrected (a gap) — the subscription-
    // analytics staple. The month is an INTEGER index (year·12 + month),
    // so the lag comparison is pure integer arithmetic on both engines —
    // no interval math, no timestamp in the output.
    //
    // Scale shape: the distinct (month, customer) frame is the only
    // row-scale shuffle; the LAG window re-keys on customer (groups are
    // months-per-customer — task-sized at any sf) and the rollup is
    // calendar-bounded (≤80 month keys). Churned-out counts are the
    // complement (active(m) − retained(m+1)) — derivable from this
    // output, not a second pass.
    Q("q_agg_churn",
      """WITH mc AS (
        |  SELECT DISTINCT
        |    CAST(EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
        |    o_custkey AS c
        |  FROM orders),
        |l AS (
        |  SELECT m, c, LAG(m) OVER (PARTITION BY c ORDER BY m) AS pm
        |  FROM mc)
        |SELECT m AS month_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_active,
        |  CAST(SUM(CASE WHEN pm = m - 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_retained,
        |  CAST(SUM(CASE WHEN pm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(SUM(CASE WHEN pm IS NOT NULL AND pm < m - 1 THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_resurrected
        |FROM l GROUP BY m ORDER BY month_idx""".stripMargin) { (s, d) =>
      val mc = Tables.orders(s, d)
        .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("m"),
          col("o_custkey").as("c"))
        .distinct()
      val l = mc.withColumn("pm",
        lag(col("m"), 1).over(Window.partitionBy("c").orderBy("m")))
      l.groupBy("m")
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("pm") === col("m") - 1, 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("pm").isNull, 1L).otherwise(0L)).as("n_new"),
          sum(when(col("pm").isNotNull && col("pm") < col("m") - 1, 1L)
            .otherwise(0L)).as("n_resurrected"))
        .select(col("m").as("month_idx"), col("n_active"),
          col("n_retained"), col("n_new"), col("n_resurrected"))
        .orderBy("month_idx")
    },

    // Cohort-LTV triangle: customers grouped by FIRST-order month, each
    // cohort's order count, active-customer count and exact revenue per
    // month of age — the lifetime-value report subscription analytics is
    // built on. Month arithmetic stays on the integer index; revenue is
    // the exact DECIMAL sum emitted through d2d (Dsl contract).
    //
    // Scale shape: the cohort label is an UNORDERED window min over
    // hash(custkey) — ONE row-scale shuffle (no first-order groupBy +
    // self-join back, which would shuffle orders twice); the (cohort,
    // age) rollup is calendar²-bounded (≤80² cells) and the distinct-
    // customer count inside it re-uses the rollup exchange.
    Q("q_agg_cohort_ltv",
      s"""WITH x AS (
        |  SELECT
        |    MIN(CAST(EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) AS BIGINT))
        |      OVER (PARTITION BY o_custkey) AS cohort,
        |    CAST(EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
        |    o_custkey AS c, o_totalprice AS p
        |  FROM orders)
        |SELECT cohort, m - cohort AS age,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(COUNT(DISTINCT c) AS BIGINT) AS n_customers,
        |  ${Dsl.d2dSql(Dsl.dsumSql("p"))} AS revenue
        |FROM x GROUP BY cohort, m ORDER BY cohort, age""".stripMargin) {
      (s, d) =>
        val mIdx = (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long")
        val x = Tables.orders(s, d).select(
          min(mIdx).over(Window.partitionBy("o_custkey")).as("cohort"),
          mIdx.as("m"), col("o_custkey").as("c"), col("o_totalprice").as("p"))
        x.groupBy("cohort", "m")
          .agg(count(lit(1)).as("n_orders"),
            countDistinct(col("c")).as("n_customers"),
            Dsl.d2d(Dsl.dsum(col("p"))).as("revenue"))
          .select(col("cohort"), (col("m") - col("cohort")).as("age"),
            col("n_orders"), col("n_customers"), col("revenue"))
          .orderBy("cohort", "age")
    },

    // RFM segmentation — the classic customer-value matrix: every
    // customer scored on Recency (months since last order vs the dataset
    // horizon), Frequency (order count) and Monetary (exact decimal
    // revenue), then bucketed into fixed semantic bands and rolled up per
    // (R,F,M) cell. Fixed VALUE thresholds, not quantiles, on purpose:
    // quantile banding needs a global rank pass (scale-hostile and
    // re-shuffles the whole frame); value bands are map-combinable and —
    // as in production RFM — stable across refreshes. Month arithmetic
    // stays on the integer year*12+month index (the cross-engine-safe
    // date math idiom).
    //
    // Scale shape: ONE orders-sized exchange (the custkey aggregate,
    // partial+final); the dataset horizon is a 1-row broadcast; the
    // (R,F,M) rollup is ≤27 cells. LONG counts, DECIMAL(18,4) money,
    // d2d on emit.
    Q("q_rfm_segment",
      s"""WITH c AS (
        |  SELECT o_custkey,
        |    MAX(CAST(EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) AS BIGINT)) AS last_m,
        |    COUNT(*) AS f,
        |    ${Dsl.dsumSql("o_totalprice")} AS m_sum
        |  FROM orders GROUP BY o_custkey),
        |h AS (
        |  SELECT MAX(CAST(EXTRACT(YEAR FROM o_orderdate) * 12
        |    + EXTRACT(MONTH FROM o_orderdate) AS BIGINT)) AS now_m
        |  FROM orders),
        |r AS (
        |  SELECT
        |    CASE WHEN now_m - last_m <= 6 THEN 'r1_active'
        |         WHEN now_m - last_m <= 24 THEN 'r2_warm'
        |         ELSE 'r3_cold' END AS r_band,
        |    CASE WHEN f >= 15 THEN 'f1_frequent'
        |         WHEN f >= 8 THEN 'f2_regular'
        |         ELSE 'f3_rare' END AS f_band,
        |    CASE WHEN m_sum >= 2000000 THEN 'm1_heavy'
        |         WHEN m_sum >= 1000000 THEN 'm2_mid'
        |         ELSE 'm3_light' END AS m_band,
        |    f, m_sum
        |  FROM c CROSS JOIN h)
        |SELECT r_band, f_band, m_band,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(f) AS BIGINT) AS n_orders,
        |  ${Dsl.d2dSql("CAST(SUM(m_sum) AS DECIMAL(18,4))")} AS revenue
        |FROM r GROUP BY r_band, f_band, m_band
        |ORDER BY r_band, f_band, m_band""".stripMargin) { (s, d) =>
      val mIdx = (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long")
      val o = Tables.orders(s, d)
      val c = o.groupBy("o_custkey")
        .agg(max(mIdx).as("last_m"), count(lit(1)).as("f"),
          Dsl.dsum(col("o_totalprice")).as("m_sum"))
      val h = o.agg(max(mIdx).as("now_m"))
      c.crossJoin(broadcast(h))
        .select(
          when(col("now_m") - col("last_m") <= 6, "r1_active")
            .when(col("now_m") - col("last_m") <= 24, "r2_warm")
            .otherwise("r3_cold").as("r_band"),
          when(col("f") >= 15, "f1_frequent")
            .when(col("f") >= 8, "f2_regular")
            .otherwise("f3_rare").as("f_band"),
          when(col("m_sum") >= 2000000, "m1_heavy")
            .when(col("m_sum") >= 1000000, "m2_mid")
            .otherwise("m3_light").as("m_band"),
          col("f"), col("m_sum"))
        .groupBy("r_band", "f_band", "m_band")
        .agg(count(lit(1)).cast("long").as("n_customers"),
          sum(col("f")).cast("long").as("n_orders"),
          Dsl.d2d(sum(col("m_sum")).cast(D18)).as("revenue"))
        .orderBy("r_band", "f_band", "m_band")
    },

    // Customer-survival life table (Kaplan–Meier components): tenure =
    // months between a customer's first and last order; customers whose
    // last order is ≥3 months before the corpus horizon count as
    // CHURNED at that tenure, the rest as right-CENSORED. Per tenure
    // month: the at-risk count (reverse-cumulative — everyone whose
    // tenure reaches it), churn events, censorings, and the KM survival
    // factor (n−d)/n as ONE IEEE divide on exact integers. The running
    // KM product stays caller-side (a product of doubles has no
    // cross-engine-exact form; every factor here is exact).
    //
    // Scale shape: the per-customer (first, last) rollup is the ONE
    // row-scale exchange (map-side combinable min/max on the integer
    // month index); the 1-row horizon broadcasts back, and the tenure
    // histogram + reverse-cumulative window ride the calendar-bounded
    // tenure spine (≤80 rows at the fixture horizon, ≤ corpus months
    // anywhere).
    Q("q_time_lifetable",
      """WITH c AS (
        |  SELECT o_custkey AS k,
        |    CAST(MIN(EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate)) AS BIGINT) AS m0,
        |    CAST(MAX(EXTRACT(YEAR FROM o_orderdate) * 12
        |      + EXTRACT(MONTH FROM o_orderdate)) AS BIGINT) AS m1
        |  FROM orders GROUP BY o_custkey),
        |h AS (SELECT CAST(MAX(m1) AS BIGINT) AS hor FROM c),
        |t AS (
        |  SELECT m1 - m0 AS tenure,
        |    CASE WHEN m1 < hor - 2 THEN 1 ELSE 0 END AS churned
        |  FROM c CROSS JOIN h),
        |b AS (
        |  SELECT tenure, CAST(SUM(churned) AS BIGINT) AS n_churned,
        |    CAST(COUNT(*) - SUM(churned) AS BIGINT) AS n_censored
        |  FROM t GROUP BY tenure),
        |r AS (
        |  SELECT tenure, n_churned, n_censored,
        |    SUM(n_churned + n_censored) OVER (ORDER BY tenure DESC)
        |      AS n_at_risk
        |  FROM b)
        |SELECT tenure, CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |  n_churned, n_censored,
        |  CAST(n_at_risk - n_churned AS DOUBLE)
        |    / CAST(n_at_risk AS DOUBLE) AS km_factor
        |FROM r ORDER BY tenure""".stripMargin) { (s, d) =>
      val mm = (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long")
      val c = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("k"))
        .agg(min(mm).as("m0"), max(mm).as("m1"))
      val h = c.agg(max(col("m1")).as("hor"))
      val b = c.crossJoin(broadcast(h))
        .select((col("m1") - col("m0")).as("tenure"),
          when(col("m1") < col("hor") - 2, 1L).otherwise(0L).as("churned"))
        .groupBy("tenure")
        .agg(sum("churned").cast("long").as("n_churned"),
          (count(lit(1)) - sum("churned")).cast("long").as("n_censored"))
      val wRev = Window.orderBy(desc("tenure"))
        .rowsBetween(Window.unboundedPreceding, 0)
      b.select(col("tenure"), col("n_churned"), col("n_censored"),
          sum(col("n_churned") + col("n_censored")).over(wRev)
            .cast("long").as("n_at_risk"))
        .selectExpr("tenure", "n_at_risk", "n_churned", "n_censored",
          "CAST(n_at_risk - n_churned AS DOUBLE)" +
            " / CAST(n_at_risk AS DOUBLE) AS km_factor")
        .orderBy("tenure")
    },

    // Association rules over order baskets: the top-20 directed brand
    // rules a → b by confidence P(b|a), with lift P(ab)/(P(a)P(b)) —
    // the recommendation primitive one level above q_basket_pairs'
    // undirected counts. Confidence and lift are single IEEE divides
    // on exact < 2⁵³ integers; the LIMIT cut is total-ordered
    // (confidence DESC, then both brands).
    //
    // Scale shape: ONE row-scale shuffle — the per-basket distinct set
    // (operators/BasketPairs.rules; pair expansion row-local, ≤C(25,2)
    // pairs/order at the 25-brand domain). Supports and the basket
    // total are item-domain-bounded broadcasts; top-k fuses to
    // TakeOrdered. The oracle's self-join form is the same math on the
    // DuckDB side.
    Q("q_basket_rules",
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS k, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |nb AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS n FROM b),
        |s AS (
        |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS supp
        |  FROM b GROUP BY brand),
        |p AS (
        |  SELECT a.brand AS ba, b2.brand AS bb,
        |    CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM b a JOIN b b2 ON a.k = b2.k AND a.brand < b2.brand
        |  GROUP BY a.brand, b2.brand),
        |r AS (
        |  SELECT ba AS antecedent, bb AS consequent, n_both FROM p
        |  UNION ALL
        |  SELECT bb AS antecedent, ba AS consequent, n_both FROM p)
        |SELECT antecedent, consequent, n_both, sa.supp AS n_ante,
        |  CAST(n_both AS DOUBLE) / CAST(sa.supp AS DOUBLE) AS confidence,
        |  CAST(n_both * nb.n AS DOUBLE)
        |    / CAST(sa.supp * sc.supp AS DOUBLE) AS lift
        |FROM r JOIN s sa ON r.antecedent = sa.brand
        |  JOIN s sc ON r.consequent = sc.brand CROSS JOIN nb
        |ORDER BY confidence DESC, antecedent, consequent
        |LIMIT 20""".stripMargin) { (s, d) =>
      val baskets = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("k"), col("p_brand").as("brand"))
      graft.operators.BasketPairs.rules(baskets, "k", "brand", 20)
    }
  )
}
