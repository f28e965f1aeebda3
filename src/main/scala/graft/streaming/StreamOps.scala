package graft.streaming

import graft.core.Dsl
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY §2.10 Structured Streaming operators (s_* capability tier).
  *
  * Each op takes an unbounded DataFrame with the events schema
  * (event_id, ts, user_id, event_type, value, props) and returns the
  * streaming transform; StreamingSpec drives them from MemoryStream and
  * asserts equality with the batch twins in EventQueries.
  *
  * Scale story: state lives per key in the executor state store (RocksDB
  * in production) and is reclaimed by the watermark — tumbling state is
  * one row per (window, type); session state one open window per user;
  * dedup state one key per event_id inside the watermark horizon.
  */
object StreamOps {
  import Dsl._

  /** Watermarks require TIMESTAMP (LTZ): cast NTZ event time under the
    * pinned-UTC session (instant-preserving). */
  private def ltz(events: DataFrame): DataFrame =
    events.withColumn("ts", col("ts").cast("timestamp"))

  /** Tumbling 1h counts/sums with a 1h watermark (s_stream_tumbling).
    * Sums aggregate as exact DECIMAL, then emit through d2d — the same
    * output representation as the batch twin (Dsl scaladoc). */
  def tumblingCounts(events: DataFrame): DataFrame =
    ltz(events).withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value").cast(D18)).cast(D18).as("sum_dec"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("cnt"), d2d(col("sum_dec")).as("sum_value"))

  /** Per-user session windows with a 12h inactivity gap (s_stream_session). */
  def sessionAgg(events: DataFrame): DataFrame =
    ltz(events).withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "12 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(D18)).cast(D18).as("sum_dec"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), d2d(col("sum_dec")).as("sum_value"))

  /** File-drop ingest (s_stream_file): the daily-index incremental
    * pattern — `readStream` over a drop directory where each arriving
    * parquet file becomes a micro-batch, feeding the same tumbling
    * aggregation as the MemoryStream twin. At scale this is the archival
    * ingest loop: writers land daily files, the stream discovers them by
    * listing, and `maxFilesPerTrigger` bounds per-batch work. */
  def fileDropCounts(spark: org.apache.spark.sql.SparkSession, dir: String,
                     schema: org.apache.spark.sql.types.StructType): DataFrame =
    tumblingCounts(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(dir))

  /** Bounded-backlog file ingest for Trigger.AvailableNow catch-up runs
    * (s_stream_availablenow — the nightly batch-over-streaming-checkpoint
    * pattern): maxFilesPerTrigger=1 caps each micro-batch at one file, so
    * a 100 TB backlog drains as bounded units (no single giant batch to
    * spill or OOM), the query STOPS itself at backlog end, and the next
    * scheduled run resumes from the checkpoint ingesting only files that
    * arrived since — incremental, exactly-once, no always-on cluster. */
  def fileIngest(spark: org.apache.spark.sql.SparkSession, dir: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Exactly-once ingest: drop duplicate event_ids within the watermark
    * horizon (s_stream_dedup — the resubmitted-filing pattern). */
  def dedupStream(events: DataFrame): DataFrame =
    ltz(events).withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Content dedup within the watermark horizon (s_stream_dedup_text):
    * dropDuplicatesWithinWatermark on md5(text) — the resubmitted-filing
    * pattern keyed on CONTENT, not id, tying the batch dedup family
    * (q_dedup_exact / q_dedup_keep_best) to the streaming surface. A
    * resubmission with a fresh doc_id but identical text is dropped as
    * long as it arrives inside the horizon; state is one 32-hex key per
    * distinct text seen in the horizon, reclaimed by the watermark.
    * Expects (ts, text, ...) columns; passes every input column through. */
  def dedupTextStream(docs: DataFrame): DataFrame =
    docs.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .withColumn("__h", md5(col("text")))
      .dropDuplicatesWithinWatermark(Seq("__h"))
      .drop("__h")

  /** Streaming cleanse + CANONICAL content dedup (s_stream_cleanse): the
    * [[graft.operators.PretrainPipeline]] cleanse stage is a pure
    * projection — streaming-safe by construction — so the interesting
    * composition is deduping on the cleaned text: resubmissions that
    * differ only by case, accents, whitespace runs, or the PII that
    * redaction scrubs all canonicalize to the same `clean_text` and are
    * dropped, where raw-text md5 ([[dedupTextStream]]) would admit them.
    * State: one 32-hex key per distinct CANONICAL text in the horizon,
    * reclaimed by the watermark. */
  def cleanseStream(docs: DataFrame): DataFrame =
    graft.operators.PretrainPipeline
      .cleanse(docs.withColumn("ts", col("ts").cast("timestamp")))
      .withWatermark("ts", "1 hour")
      .withColumn("__h", md5(col("clean_text")))
      .dropDuplicatesWithinWatermark(Seq("__h"))
      .drop("__h")

  /** The COMPOSED streaming pretrain pipeline (s_stream_pipeline):
    * bounded file ingest → cleanse (pure projection: PII scrub +
    * graft_normalize canonicalization) → content dedup within the
    * watermark horizon (state: one md5 per distinct canonical text) →
    * quality floor (stateless filter). The streaming twin of
    * cap_pipeline_pretrain's batch funnel: each stage is individually
    * gated elsewhere; this composition proves they chain inside ONE
    * incremental query with a checkpoint — the continuous-corpus-
    * ingestion shape (new crawl drops land as files; the pipeline
    * resumes exactly-once and only ever processes the delta). */
  def pretrainStream(spark: org.apache.spark.sql.SparkSession, dir: String,
                     schema: org.apache.spark.sql.types.StructType,
                     minTokens: Int = 5): DataFrame =
    graft.operators.PretrainPipeline.qualityFloor(
      cleanseStream(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)),
      minTokens = minTokens)

  /** Streaming URL canonicalization + dup-group tally (s_stream_url):
    * [[graft.operators.UrlCanon.canonical]] is a pure projection
    * (streaming-safe by construction), and the group tally is an
    * incremental update-mode groupBy(canon) — state is ONE (count,
    * min-doc) pair per distinct canonical URL, exactly the batch
    * q_url_normalize aggregate maintained online. A crawl frontier
    * dedupes URLs this way: the state table IS the visited set. */
  def urlStream(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        graft.operators.UrlCanon.canonical(col("url")).as("canon"))
      .groupBy("canon")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).cast("long").as("keeper"),
        sum(col("doc_id")).cast("long").as("doc_sum"))

  /** Streaming per-window token entropy (s_stream_entropy): CHAINED
    * stateful aggregations — Spark 3.4+ allows a second windowed
    * aggregation over `window_time` of the first, so the classic
    * two-level entropy shape (token counts per window, then
    * H = log2 N − Σ c·log2 c / N re-aggregated per window) runs fully
    * incrementally in ONE streaming query: no foreachBatch escape hatch,
    * no driver recomputation. State = one count per (window, token) in
    * level 1 + one (n, s) pair per window in level 2, both reclaimed by
    * the watermark. The log-domain streaming member of the
    * [[graft.queries.EntropyQueries]] family; StreamingSpec gates the
    * closed windows against an in-JVM reference at 1e-9 relative (same
    * libm; only float summation ORDER differs across partitions). */
  def entropyStream(docs: DataFrame, windowLen: String = "1 day"): DataFrame = {
    val tok = docs.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", windowLen)
      .select(col("ts"), explode(split(col("text"), " ")).as("tok"))
    val counts = tok
      .groupBy(window(col("ts"), windowLen), col("tok"))
      .agg(count(lit(1)).as("c"))
    counts
      .groupBy(window(window_time(col("window")), windowLen))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c").cast("double") * log2(col("c"))).as("s"))
      .select(col("window.start").as("win_start"),
        col("n_tokens"),
        (log2(col("n_tokens")) - col("s") / col("n_tokens")).as("entropy"))
  }

  /** Streaming heavy hitters (s_stream_heavyhitters): per-window top
    * terms via the [[graft.operators.HeavyHitters]] SpaceSaving
    * aggregator running INSIDE the streaming aggregation — state per
    * window is the m-entry sketch buffer itself in the state store, not
    * a count per token. That is the 100 TB trade against
    * [[entropyStream]]'s exact per-(window, token) counts: state size is
    * fixed by m however wide the token domain grows, at the cost of the
    * sketch's documented overestimation bound. Windows are emitted
    * closed (append mode + watermark), so each sketch folds its whole
    * window before leaving the store. StreamingSpec gates with m ≥
    * vocabulary (sketch provably exact ⇒ bit-equal to batch counts) and
    * the SpaceSaving invariants under eviction pressure (small m). */
  def heavyHittersStream(docs: DataFrame, m: Int = 64,
                         windowLen: String = "1 day"): DataFrame =
    docs.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", windowLen)
      .select(col("ts"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.operators.HeavyHitters.heavyHitters(m)(col("tok")).as("sk"))
      .select(col("window.start").as("win_start"), explode(col("sk")).as("e"))
      .select(col("win_start"), col("e._1").as("term"),
        col("e._2").as("est_count"), col("e._3").as("max_err"))

  /** Custom keyed state via mapGroupsWithState (s_stream_state): running
    * per-user event count + decimal-cents value total, emitted per
    * micro-batch. The KeyValueGroupedDataset state API is the escape hatch
    * when window/session semantics don't fit; state is per-key in the
    * state store exactly like the built-in stateful operators. */
  def runningUserTotals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = ltz(events)
      .selectExpr("user_id", "CAST(ROUND(value * 100) AS BIGINT) AS cents")
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[(Long, Long)]) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0L))
          var c = c0; var sum = s0
          rows.foreach { r => c += 1; sum += r._2 }
          state.update((c, sum))
          (user, c, sum)
      }
      .toDF("user_id", "n_events", "cents_total")
  }

  /** Streaming as-of join (s_stream_asof): the flagship batch operator's
    * streaming twin — every purchase matched to the same user's latest
    * view STRICTLY before it. State per user is ONE long (the max view
    * time seen), the O(1)-state streaming analogue of AsOfJoinExec's
    * merge cursor. Within a micro-batch events fold in event-time order
    * with purchases before views at equal timestamps, and the `last <
    * purchase` guard keeps the strict `<` rule across micro-batch
    * boundaries — so with per-user event-time-ordered arrival (the
    * replay / ingest-loop case) the output equals the batch operator
    * exactly (StreamingSpec gates it against leftAsOfMerge). Late or
    * out-of-order views need the watermarked interval join
    * ([[purchaseViewJoin]]) instead — a semantic trade, not a hidden
    * approximation. */
  def asOfStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = ltz(events)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, Long, String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Option[Long])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[Long]) =>
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = Seq.newBuilder[(Long, Long, Long, Option[Long])]
          rows.toSeq
            .sortBy(r => (r._4, if (r._3 == "view") 1 else 0, r._2))
            .foreach { case (_, id, typ, us) =>
              if (typ == "view") { if (us > last) last = us }
              else if (typ == "purchase")
                out += ((id, user, us,
                  if (last != Long.MinValue && last < us) Some(last) else None))
            }
          if (last != Long.MinValue) state.update(last)
          out.result().iterator
      }
      .toDF("event_id", "user_id", "purchase_us", "view_us")
  }

  /** Session state for [[sessionTimeoutStream]]: start/last in event-time
    * micros plus the exact DECIMAL(18,4) value total as unscaled
    * ten-thousandths — FP-order-free, and re-emitted through the SAME
    * d2d expression tree as the batch twin (d2d is one ulp away from the
    * correctly-rounded conversion for some fractions — e.g. 2.97 — so a
    * "mathematically equal" different tree would NOT be bit-equal). */
  final case class SessTO(startUs: Long, lastUs: Long, n: Long, units: Long)

  /** Timeout-driven sessionization (s_stream_timeout): the
    * flatMapGroupsWithState + EventTimeTimeout formulation of
    * [[sessionAgg]] — the escape hatch when session semantics need
    * custom per-event logic the built-in session_window can't express
    * (here it reproduces session_window exactly, which is the point:
    * StreamingSpec gates it row-for-row against batch q_sessionize).
    * Within a batch, gaps > the threshold close sessions inline; the
    * LAST open session per user closes when the event-time watermark
    * passes last + gap and the state store fires hasTimedOut — state is
    * removed, so an idle user costs nothing after the timeout. The
    * timeout timestamp clamps to watermark+1 (setTimeoutTimestamp
    * rejects values at or behind the watermark — the backlog-replay
    * corner where last+gap is already in the past). */
  def sessionTimeoutStream(events: DataFrame, gapHours: Int = 12): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapHours.toLong * 3600L * 1000000L
    // the watermark COLUMN (ts) must survive into the typed frame —
    // projecting it into a derived long hides it from the event-time
    // timeout check; micros are derived inside the lambda instead
    val typed = ltz(events).withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"),
        // exact unscaled DECIMAL(18,4): decimal cast first, THEN the
        // exact x10000 — rounding v*10000 in FP could round differently
        expr("CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)").as("units"))
      .as[(Long, java.sql.Timestamp, Long)]
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessTO, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[SessTO]) =>
          def closed(s: SessTO) = (user, s.startUs, s.n, s.units)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(closed(s))
          } else {
            val out = Seq.newBuilder[(Long, Long, Long, Long)]
            var cur = state.getOption
            rows.toSeq.map { case (_, t, units) => (micros(t), units) }
              .sortBy(_._1).foreach { case (us, units) =>
              cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  cur = Some(SessTO(s.startUs, us, s.n + 1, s.units + units))
                case Some(s) =>
                  out += closed(s)
                  cur = Some(SessTO(us, us, 1L, units))
                case None =>
                  cur = Some(SessTO(us, us, 1L, units))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(math.max(
                (s.lastUs + gapUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
      .toDF("user_id", "start_us", "n_events", "units")
      .select(col("user_id"),
        expr("CAST(timestamp_micros(start_us) AS TIMESTAMP)").as("session_start"),
        col("n_events"),
        // rebuild the exact DECIMAL(18,4) (units x 0.0001 is an exact
        // decimal multiply) and convert through the SAME d2d tree as the
        // batch twin — bit-equality, not just mathematical equality
        d2d((col("units").cast(DecimalType(20, 0)) *
          lit(0.0001).cast(DecimalType(4, 4))).cast(D18)).as("sum_value"))
  }

  /** Streaming EWMA (s_stream_ewma): the SCALE form of q_time_ewma's
    * per-entity ordered fold. The batch query materializes each entity's
    * full history into one array via collect_list — bounded only by
    * entity cardinality, the one assumption in its 100 TB story. Here
    * state is ONE (count, ewma) pair per user in the state store, and
    * each micro-batch folds its rows in (event-time, event_id) order on
    * top of that state. The fold is the IDENTICAL IEEE sequence —
    * acc/2 + value/2 seeded at 0.0, the same order — so with per-user
    * event-time-ordered arrival (the replay / ingest-loop case, the
    * [[asOfStream]] contract) the final emitted row per user is
    * BIT-EQUAL to the batch fold (StreamingSpec gates it against
    * q_time_ewma via doubleToRawLongBits). Out-of-order arrival across
    * micro-batches would need watermark-horizon buffering instead — a
    * semantic trade, not a hidden approximation. */
  def ewmaStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = ltz(events)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[(Long, Double)]) =>
          var (n, ewma) = state.getOption.getOrElse((0L, 0.0))
          // (ts, event_id) order inside the batch = the batch fold's
          // array_sort(struct(ts, event_id, value)) order
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            n += 1; ewma = ewma / 2 + r._4 / 2
          }
          state.update((n, ewma))
          (user, n, ewma)
      }
      .toDF("user_id", "n", "ewma")
  }

  /** Streaming funnel (s_stream_funnel): the O(1)-state form of
    * q_event_funnel's three chained min-aggregates. State per user is
    * the stage cursor — up to three timestamps (first view, first
    * strictly-later click, first strictly-later purchase), nothing
    * else; each micro-batch folds its rows in (event-time, event_id)
    * order on top of it. With per-user event-time-ordered arrival (the
    * [[asOfStream]] contract) the first qualifying event the fold
    * meets IS the batch chain's MIN, so the per-user final stage
    * matches the batch frames exactly — StreamingSpec gates the three
    * stage counts against q_event_funnel. Out-of-order arrival across
    * micro-batches would need watermark-horizon buffering — the same
    * documented trade as [[ewmaStream]]. Emits (user_id, stage 0–3);
    * stage is monotone non-decreasing across emissions, so the
    * max-stage row per user is the final state under update mode. */
  def funnelStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = events.sparkSession
    import spark.implicits._
    val unset = Long.MinValue
    val typed = ltz(events)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), (Long, Int)](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[(Long, Long, Long)]) =>
          var (t1, t2, t3) = state.getOption.getOrElse((unset, unset, unset))
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            r._4 match {
              case "view" if t1 == unset => t1 = r._2
              case "click" if t1 != unset && t2 == unset && r._2 > t1 =>
                t2 = r._2
              case "purchase" if t2 != unset && t3 == unset && r._2 > t2 =>
                t3 = r._2
              case _ => ()
            }
          }
          state.update((t1, t2, t3))
          (user,
            if (t3 != unset) 3 else if (t2 != unset) 2
            else if (t1 != unset) 1 else 0)
      }
      .toDF("user_id", "stage")
  }

  /** Streaming cohort retention (s_stream_retention): the bounded-state
    * form of q_event_retention's two-frame join. State per user is ONE
    * epoch-day cohort long plus a CHUNKED activity bitmap — an
    * Array[Long] where chunk ci bit k set means "active on cohort day +
    * 64·ci + k". The array grows lazily to the user's OBSERVED horizon
    * and is capped at `maxDays` (default 2048 days ≈ 5.6 years = at most
    * 32 longs ≈ 256 B/user plus two counters — roaring-style compression
    * is unnecessary below ~10⁵ days). Activity at an offset beyond the
    * horizon (or before the cohort anchor: out-of-order arrival) is
    * NEVER silently lost — it increments the `dropped` counter, so a
    * corpus outliving the horizon is visible in the output (round-9
    * advice). Day bucketing uses the NTZ wall-clock date (to_date on
    * the raw column), matching the batch date_trunc exactly and
    * independent of session timezone; with per-user event-time-ordered
    * arrival the first event IS the cohort anchor (min ts). `n_events`
    * is strictly monotone per user, so "row with max n_events" = final
    * state under update-mode sinks. StreamingSpec gates the exploded
    * (cohort, offset) counts against the batch matrix and the >64-day
    * horizon + dropped accounting on a synthetic wide fixture. */
  def retentionStream(events: DataFrame, maxDays: Int = 2048): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    require(maxDays >= 1, s"maxDays must be positive: $maxDays")
    val spark = events.sparkSession
    import spark.implicits._
    val unset = Long.MinValue
    val typed = events
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Array[Long], Long, Long),
        (Long, Long, Array[Long], Long, Long)](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[(Long, Array[Long], Long, Long)]) =>
          var (cohort, chunks, nEvents, dropped) =
            state.getOption.getOrElse((unset, Array.empty[Long], 0L, 0L))
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            nEvents += 1
            if (cohort == unset) cohort = r._4
            val off = r._4 - cohort
            if (off >= 0 && off < maxDays) {
              val ci = (off / 64).toInt
              if (ci >= chunks.length)
                chunks = java.util.Arrays.copyOf(chunks, ci + 1)
              chunks(ci) |= 1L << (off % 64).toInt
            } else dropped += 1
          }
          state.update((cohort, chunks, nEvents, dropped))
          (user, cohort, chunks, nEvents, dropped)
      }
      .toDF("user_id", "cohort_day", "active_bits", "n_events", "dropped")
  }

  /** Streaming sequential-pattern counter (s_stream_pattern): the
    * O(1)-state twin of q_window_pattern's lag-window pass. State per
    * customer is exactly what the batch lag(1)/lag(2) window reads — the
    * last two order totals — plus the streak count and a monotone
    * per-customer row counter (`n_orders`, so "row with max n_orders" =
    * final state under update-mode sinks). A streak is counted when
    * three consecutive totals in (o_orderdate, o_orderkey) order are
    * strictly increasing, matching the batch filter `t > p1 AND p1 > p2`
    * exactly (NaN sentinels stand in for the lag nulls of the first two
    * rows). StreamingSpec gates the top-100 list against the registered
    * batch query row-for-row. */
  def patternStream(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = orders.sparkSession
    import spark.implicits._
    val typed = orders.select(
        col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_orderkey"),
        col("o_totalprice"))
      .as[(Long, Long, Long, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Double, Double, Long, Long), (Long, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        case (cust, rows, state: GroupState[(Double, Double, Long, Long)]) =>
          var (p1, p2, streaks, n) =
            state.getOption.getOrElse((Double.NaN, Double.NaN, 0L, 0L))
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            val t = r._4
            if (!p1.isNaN && !p2.isNaN && t > p1 && p1 > p2) streaks += 1
            p2 = p1; p1 = t; n += 1
          }
          state.update((p1, p2, streaks, n))
          (cust, streaks, n)
      }
      .toDF("o_custkey", "n_streaks", "n_orders")
  }

  /** Streaming last-touch attribution (s_stream_attribution): the
    * O(1)-state streaming form of q_event_attribution. State per user is
    * ONE value — the type of the most recent non-purchase event seen so
    * far; each micro-batch folds its rows in (event-time, event_id)
    * order on top of it and emits one (channel, value) row per purchase.
    * Under the per-user event-time-ordered arrival contract (the
    * [[asOfStream]] trade, documented there) the fold's running last
    * IS the batch window's LAST_VALUE(... IGNORE NULLS) over the
    * preceding frame, so the emitted rows aggregate to exactly the
    * batch twin's channel totals — StreamingSpec gates that equality
    * including the exact-decimal revenue sums. */
  def attributionStream(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = ltz(events)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[String, (Long, Long, String, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[String]) =>
          var last = state.getOption.getOrElse("none")
          val out =
            scala.collection.mutable.ArrayBuffer[(Long, Long, String, Double)]()
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            if (r._4 == "purchase") out += ((user, r._3, last, r._5))
            else last = r._4
          }
          state.update(last)
          out.iterator
      }
      .toDF("user_id", "event_id", "channel", "value")
  }

  /** Stream-stream event-time interval join (s_stream_join): each
    * purchase matched to the same user's views in the trailing 24 h —
    * the attribution-join shape. Both sides carry watermarks and the join
    * condition bounds event-time distance, so the state store retires a
    * view row as soon as no future purchase can reach back to it: state
    * is O(24 h of views per user), not unbounded. */
  def purchaseViewJoin(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = ltz(purchases)
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val v = ltz(views)
      .select(col("user_id").as("vu"), col("ts").as("vts"))
      .withWatermark("vts", "25 hours")
    p.join(v, col("user_id") === col("vu") &&
        col("vts") < col("pts") &&
        col("vts") >= col("pts") - expr("INTERVAL 24 HOURS"))
      .select(col("p_id"), col("user_id"), col("pts"), col("vts"))
  }

  /** LEFT OUTER stream-stream interval join (s_stream_join_outer): the
    * attribution join that must also SURFACE unattributed purchases —
    * the rows an inner join silently drops. Semantics are
    * watermark-driven: a purchase with no qualifying view is held in
    * state until the view-side watermark proves no future view can still
    * fall inside its trailing window, then emits with a NULL vts. Same
    * state bound as [[purchaseViewJoin]] (the outer row adds one held
    * purchase per pending window, reclaimed at watermark). */
  def purchaseViewJoinOuter(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = ltz(purchases)
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val v = ltz(views)
      .select(col("user_id").as("vu"), col("ts").as("vts"))
      .withWatermark("vts", "25 hours")
    p.join(v, col("user_id") === col("vu") &&
        col("vts") < col("pts") &&
        col("vts") >= col("pts") - expr("INTERVAL 24 HOURS"),
      "left_outer")
      .select(col("p_id"), col("user_id"), col("pts"), col("vts"))
  }

  /** Streaming CDC apply (s_stream_cdc): the O(1)-per-key streaming form
    * of q_cdc_apply's latest-wins materialization. State per key is ONE
    * (seq, op, price) triple — the key's current version; each
    * micro-batch folds its changelog rows in sequence order on top and
    * emits the new current version, so the materialized view (latest
    * emitted row per key, deletes filtered out) equals the batch
    * query's pre-aggregation view under ANY batch slicing — a version
    * chain split across micro-batches resolves identically because
    * max-seq is associative. Money rides as the exact 10⁻⁴-unscaled
    * long (`p_e4`): the state layer does no arithmetic, so no FP can
    * enter; the consumer rescales to DECIMAL. At 100 TB the state store
    * holds one triple per live key — the same footprint as the
    * key-partitioned batch window, but incremental. */
  def cdcStream(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = changes.sparkSession
    import spark.implicits._
    val typed = changes.select(col("k"), col("seq"), col("op"), col("p_e4"))
      .as[(Long, Int, String, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[(Int, String, Long), (Long, Int, String, Long)](
        GroupStateTimeout.NoTimeout) {
        case (k, rows, state: GroupState[(Int, String, Long)]) =>
          var cur = state.getOption.getOrElse((-1, "U", 0L))
          rows.foreach { r =>
            if (r._2 > cur._1) cur = (r._2, r._3, r._4)
          }
          state.update(cur)
          (k, cur._1, cur._2, cur._3)
      }
      .toDF("k", "seq", "op", "p_e4")
  }

  /** Streaming data-quality audit (s_stream_quality): per-rule RUNNING
    * (n_checked, n_violations) totals over everything ingested so far —
    * the publish gate of q_quality_rules turned into a live ingest
    * monitor. Delegates to the SAME one-pass operator as the batch form
    * ([[graft.operators.QualityAudit]]): a global conditional-sum
    * aggregate is streaming-legal as-is, so state is ONE row of R+1
    * counters regardless of corpus size (complete output mode; the
    * explode to rule rows is a stateless projection of that row). */
  def qualityAuditStream(events: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame =
    graft.operators.QualityAudit.audit(events, rules)

  /** Streaming A/B monitor (s_stream_abtest): running two-proportion z²
    * over event-level (variant = user parity, success = purchase) flags —
    * the live experiment readout. Delegates to the SAME arithmetic as the
    * batch operator ([[graft.operators.ExactStats.twoProportion]]): a
    * global conditional-sum aggregate is streaming-legal as-is, so state
    * is ONE row of four counters at any corpus size (complete mode; the
    * z² pieces are stateless projections of that row). The batch gate
    * (q_stat_proportion) tests per-USER conversion, which needs a second
    * aggregation level — streaming-illegal — so the live form monitors
    * event-level conversion and StreamingSpec gates it against the same
    * projection run as a batch. */
  def abTestStream(events: DataFrame): DataFrame =
    graft.operators.ExactStats.twoProportion(
      events.select((col("user_id") % 2).as("variant"),
        when(col("event_type") === "purchase", 1).otherwise(0)
          .as("success")),
      "variant", "success")

  /** foreachBatch JDBC upsert: idempotent incremental load keyed on the
    * natural key (s_stream_foreachbatch; the daily-increment DB pattern).
    *
    * DDL runs once on the driver (metadata-only); the DATA path is fully
    * distributed — each partition opens its own connection and ships
    * delete+insert pairs in JDBC batches (one DB round-trip per
    * [[JdbcBatchSize]] rows), the streaming twin of IncrementalLoad.
    * No driver collect: micro-batch size never hits driver memory. */
  val JdbcBatchSize = 500

  def jdbcUpsertBatch(url: String, table: String)(batch: DataFrame, batchId: Long): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val meta = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
      if (!meta.next()) {
        conn.createStatement().execute(
          s"CREATE TABLE $table (event_id BIGINT PRIMARY KEY, value DOUBLE)")
      }
    } finally conn.close()
    // One partition per key (repartition on the natural key) so the same
    // key never races two connections; within the partition, last write
    // wins via a keep-last pre-pass — a micro-batch may legitimately
    // carry the same key twice (the resubmitted-filing pattern), and a
    // delete-batch followed by an insert-batch would otherwise hit the
    // PRIMARY KEY twice.
    batch.select("event_id", "value")
      .repartition(col("event_id"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val lastByKey = new scala.collection.mutable.LinkedHashMap[Long, Double]
          it.foreach(r => lastByKey.put(r.getLong(0), r.getDouble(1)))
          val c = java.sql.DriverManager.getConnection(url)
          try {
            c.setAutoCommit(false)
            val del = c.prepareStatement(s"DELETE FROM $table WHERE event_id = ?")
            val ins = c.prepareStatement(s"INSERT INTO $table VALUES (?, ?)")
            var n = 0
            lastByKey.foreach { case (k, v) =>
              del.setLong(1, k); del.addBatch()
              ins.setLong(1, k); ins.setDouble(2, v); ins.addBatch()
              n += 1
              if (n % JdbcBatchSize == 0) { del.executeBatch(); ins.executeBatch() }
            }
            del.executeBatch(); ins.executeBatch()
            c.commit()
          } finally c.close()
        }
      }
  }

  /** Streaming corpus-novelty monitor (s_stream_novelty): per owner, the
    * RUNNING count of items whose corpus-wide FIRST occurrence was that
    * owner — q_text_novelty's n_novel as a live ingest signal ("is this
    * feed still adding new n-grams?"). Stateful pieces are exactly the
    * batch operator's two frames: dropDuplicates state is one row per
    * DISTINCT item (the item-partitioned window's input in the batch
    * shape) and the aggregate state is one counter per owner. First
    * occurrence is ARRIVAL-ordered here vs min-owner in the batch
    * operator — identical whenever ingest is owner-ordered (the
    * append-only corpus case the test drives). Complete output mode. */
  def noveltyStream(pairs: DataFrame, owner: String,
      item: String): DataFrame =
    pairs.dropDuplicates(item)
      .groupBy(col(owner))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_novel"))

  /** Streaming CUPED accumulator (s_stream_cuped): the per-arm exact
    * pieces (n, Σx, Σy, Σx², Σxy) over a live stream of unit-level
    * (arm, x, y) rows — [[graft.operators.ExactStats.cupedArms]] reused
    * VERBATIM: one groupBy is streaming-legal as-is, so state is ONE
    * counter row per arm at any corpus size (complete mode). θ and the
    * adjusted means are stateless arithmetic over the ≤|arms|-row
    * result — the dashboard computes them from this table exactly as
    * [[graft.operators.ExactStats.cuped]] does (the batch gate;
    * StreamingSpec checks both pieces and the derived θ). The batch
    * q_stat_cuped's per-CUSTOMER pre-aggregation is a second,
    * streaming-illegal level — the live form therefore monitors
    * whatever unit grain the stream carries, the same caveat as
    * s_stream_abtest. */
  def cupedStream(units: DataFrame, arm: String = "arm",
      x: String = "x", y: String = "y"): DataFrame =
    graft.operators.ExactStats.cupedArms(units, arm, x, y)

  /** Streaming calibration monitor (s_stream_calibration): the live
    * reliability table — per fixed score band the running count,
    * positives and observed rate over ingest, the drift alarm for a
    * deployed model's scores. [[graft.operators.ExactStats.calibration]]
    * reused VERBATIM: one banded conditional-sum aggregate is
    * streaming-legal as-is, so state is one counter row per band
    * (value-domain-bounded) at any corpus size; the rate columns are
    * stateless projections. Complete mode; gated against the batch
    * operator on everything ingested (StreamingSpec). */
  def calibrationStream(events: DataFrame): DataFrame =
    graft.operators.ExactStats.calibration(
      events.select(
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos")),
      "cents", "pos", 5000L)

  /** Streaming classifier monitor (s_stream_confusion): the live 2×2
    * confusion report — running TP/FP/FN/TN with precision/recall/F1
    * and the MCC pieces over ingest, the deployed-model health check.
    * [[graft.operators.ExactStats.confusion]] reused VERBATIM: one
    * global conditional-sum aggregate is streaming-legal as-is, so
    * state is ONE row of four counters at any corpus size (the derived
    * ratios are stateless projections). Complete mode; gated against
    * the batch operator on everything ingested (StreamingSpec). */
  def confusionStream(events: DataFrame): DataFrame =
    graft.operators.ExactStats.confusion(
      events.select(
        when((col("value").cast("decimal(12,2)") * 100).cast("long")
          >= 10000L, 1L).otherwise(0L).as("pred"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("actual")),
      "pred", "actual")

  /** Streaming HyperLogLog register table (s_stream_hll): the live
    * distinct-user counter — q_sketch_hll's register build running as a
    * streaming aggregation. State is AT MOST 64 rows (bucket → max rho)
    * at ANY ingest volume: this is the mergeable-sketch story made
    * literal — max() is the HLL merge, so the state store IS the
    * sketch, registers grow monotonically across micro-batches
    * (StreamingSpec pins monotonicity and batch equality), and the
    * caller reads a cardinality estimate off the table at any instant.
    * Complete mode, no watermark needed (the state is the 64-row
    * sketch itself, never reclaimed). */
  def hllStream(events: DataFrame): DataFrame =
    graft.operators.Sketches.hllRegisters(events, "user_id", m = 64)

  /** Streaming count–min counter table (s_stream_cms): q_sketch_cms's
    * 4×256 counter grid as a streaming aggregation over per-event user
    * keys. State is AT MOST 1024 rows at any ingest volume; counters
    * are monotone non-decreasing across micro-batches (sum-merge — the
    * CMS merge law, StreamingSpec-pinned) and MIN over a key's four
    * counters never undercounts its true event count (the one-sided
    * guarantee, preserved under streaming because addition commutes
    * with micro-batching). Complete mode, no watermark. */
  def cmsStream(events: DataFrame): DataFrame =
    graft.operators.Sketches.cmsCounters(events, "user_id",
      depth = 4, width = 256)

  /** Streaming bucketed KMV (s_stream_kmv): the live distinct-user
    * sketch as a ≤ 64-row (bucket, min_hv) state table. The bucketed
    * form exists exactly for this seam: the batch bottom-k needs a
    * total order (not a streaming aggregation), while per-bucket MIN
    * is a plain state update — the merge IS the update, minima only
    * ever decrease (monotone law StreamingSpec-pinned), and state size
    * is the sketch size at any ingest volume. Complete mode, no
    * watermark. */
  def kmvStream(events: DataFrame): DataFrame =
    graft.operators.Sketches.kmvBuckets(events, "user_id", k = 64)

  /** Streaming Bloom membership bits (s_stream_bloom): the live user
    * filter as a ≤ 4096-row (bit, n_hits) state table; sum-merge means
    * the bit set only grows, and membership never false-negatives —
    * every ingested user's hash bits are all present (both laws
    * StreamingSpec-pinned). 4096 bits / 2 hashes keeps the spec's
    * membership checks meaningful at fixture scale; production sizes
    * bits to the expected key volume exactly as in [[graft.operators.
    * Sketches.bloomBits]]. Complete mode, no watermark. */
  def bloomStream(events: DataFrame): DataFrame =
    graft.operators.Sketches.bloomHits(events, "user_id",
      bits = 4096, hashes = 2)

  /** Streaming HDR quantile-sketch state (s_stream_quantile): the
    * (bucket, n) log₂-histogram of event-value CENTS as a streaming
    * aggregation — the rank member of the streaming sketch family
    * (hll/cms/kmv/bloom cover cardinality/frequency/membership). The
    * state IS the sketch (≤ ~500 rows at any ingest volume), merge IS
    * count addition so no bucket ever shrinks (monotone law
    * StreamingSpec-pinned) and the final state equals the batch
    * sketch bit-for-bit — bucket assignment is all-integer row-local
    * math ([[graft.operators.Sketches.hdrBucket]]). Quantile reads
    * run over the state table via
    * [[graft.operators.Sketches.hdrQuantiles]], never the stream.
    * Complete mode, no watermark. */
  def quantileStream(events: DataFrame): DataFrame =
    graft.operators.Sketches.hdrCounters(
      events.select((col("value").cast(DecimalType(12, 2)) * 100)
        .cast("long").as("cents")), "cents")

  /** foreachBatch upsert into a [[graft.table.ManifestTable]]
    * (s_stream_table_sink): the streaming half of the lakehouse seam —
    * each micro-batch MERGEs latest-wins on `key` through
    * [[graft.table.ManifestTable.mergeBatch]], which records the batch
    * id in the snapshot log and makes a replayed batch a structural
    * no-op (exactly-once across foreachBatch retries, the same
    * txn-dedupe contract every transactional Spark sink documents).
    * A micro-batch may carry one key twice; mergeBatch's latest-wins
    * window resolves it deterministically only if a sequence column
    * orders them — callers needing intra-batch order pass pre-compacted
    * frames (StreamingSpec pins the replay and multi-batch laws). */
  def tableMergeBatch(dir: String, key: String, opCol: Option[String] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (graft.table.ManifestTable.latestVersion(spark, dir).isEmpty) {
      graft.table.ManifestTable.create(spark, dir,
        batch.limit(0).drop(opCol.toSeq: _*))
    }
    graft.table.ManifestTable.mergeBatch(spark, dir, batch, key, batchId, opCol)
    ()
  }

  /** Micro-batch READER for the manifest-table change feed
    * (s_stream_table_feed) — the table becomes a stream SOURCE, not
    * just a sink. The checkpointed snapshot VERSION is the stream
    * offset, persisted as one tiny file: each poll reads it, diffs
    * (checkpointed, head] via [[graft.table.ManifestTable.changes]],
    * hands the I/D delta (tagged `_as_of_version` = head) to
    * `onBatch`, and advances the checkpoint only AFTER onBatch
    * returns — at-least-once delivery, so onBatch must be idempotent
    * (exactly the foreachBatch sink contract; pair with
    * [[tableMergeBatch]] downstream for exactly-once end-to-end).
    * onBatch is NOT called when no commit landed since the offset.
    * Returns the checkpointed version after the poll.
    *
    * Scale shape: the delta is two group-by-all-columns aggregates
    * full-outer-joined (one exchange per side, no row-scale driver
    * state); reader progress is one version number in one file, so a
    * consumer can poll a 100 TB table from any single process. */
  def pollTableChanges(spark: org.apache.spark.sql.SparkSession, dir: String,
      checkpoint: String)(onBatch: (DataFrame, Long) => Unit): Long = {
    import org.apache.hadoop.fs.Path
    val cp = new Path(checkpoint)
    val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val since: Long =
      if (!fs.exists(cp)) 0L
      else {
        val in = fs.open(cp)
        val bytes = try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
          out.toByteArray
        } finally in.close()
        new String(bytes, "UTF-8").trim.toLong
      }
    graft.table.ManifestTable.latestVersion(spark, dir) match {
      case Some(head) if head > since =>
        val delta = graft.table.ManifestTable.changes(spark, dir, since, head)
          .withColumn("_as_of_version", lit(head))
        onBatch(delta, head)
        val out = fs.create(cp, true)
        try out.write(head.toString.getBytes("UTF-8")) finally out.close()
        head
      case _ => since
    }
  }
}
