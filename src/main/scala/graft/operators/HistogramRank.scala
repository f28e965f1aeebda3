package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe value-at-global-sort-position lookup (the primitive behind
  * exact percentiles and ntile boundaries).
  *
  * A `Window.partitionBy(group).orderBy(value)` row_number moves each
  * ENTIRE group into one task — with low-cardinality groups (order status:
  * 3) that is three serial sorts of the whole table at 100 TB. This
  * operator gets the same positional values with no global sort, and with
  * NO data-dependent constants: bucket bounds derive from aggregated
  * min/max statistics inside the lazy plan (a broadcast two-value frame),
  * so a domain shift or a skewed distribution cannot silently collapse the
  * histogram into one bucket (the round-2 hardcoded-width flaw).
  *
  * Size routing (mirror of [[SimHashBanding]]'s density routing, and for
  * the same reason measured in BENCH_r04: the histogram decomposition's
  * fixed multi-stage overhead only pays when a group is too large for one
  * sort task): per-group counts split rows into a `small` branch
  * (≤ `directMax` rows — the plain window-rank form, the cheapest exact
  * plan at that size) and a `large` branch (the histogram machinery).
  * Both plans are exact, so routing cannot change results — RankSpec
  * asserts window ≡ histogram ≡ routed. The routing statistic is probed
  * with ONE metadata-scale driver action (a count / a max over the
  * per-group stats aggregate) so that the all-small and all-large cases
  * emit exactly one plan with zero scaffolding — the round-5 fully-lazy
  * routing kept both branches in a checkpoint+union pipeline and its
  * fixed overhead (2 localCheckpoint barriers + a broadcast self-join)
  * dominated the small case it was built to make cheap (BENCH_r05
  * q_agg_percentile 1.99 s vs the plain window plan at ~0.6 s).
  *
  * Precondition: `valueCol` must be non-null. The window form sorts NULLs
  * first while the histogram's bucketOf sends them to the last bucket, so
  * with NULLs present the routed output would depend on group size; all
  * engine callers rank non-null fixture columns.
  *
  * Skew handling, by construction:
  *  - [[withGlobalRank]] decomposes rank = bucketOffset + valueOffset +
  *    tieRank. Offsets come from aggregated histograms (metadata-scale
  *    windows). Value groups larger than `hotGroup` — the 90 %-one-value
  *    pathology — are sub-bucketed ON THE FIRST TIE COLUMN with adaptive
  *    bounds, so even a single dominant value sorts in ~`buckets` parallel
  *    tasks instead of one (RankSpec's skew property test asserts this).
  *    Requires the first tie column to be near-unique within a value
  *    (true for any key column); the hot row→stats join relies on AQE
  *    skew-split for the dominant value's shuffle key.
  *  - [[valuesAtPositions]] sorts only buckets containing requested
  *    positions; single-valued buckets (where every row IS the answer)
  *    short-circuit with no sort at all, and multi-valued overfull buckets
  *    recurse one level with a `buckets`× finer histogram before any local
  *    sort happens.
  *
  * Equal-value ties are interchangeable by construction (ranks differ only
  * within runs of identical values), so the value at each position is
  * deterministic even though row order within a tie is not.
  */
object HistogramRank {

  /** Adaptive bucket id in [0, nb): equal-width over the aggregated
    * [lo, hi] domain; degenerate single-value domains collapse to bucket 0
    * (handled by the single-valued shortcut / tie split downstream). */
  private def bucketOf(v: Column, lo: Column, hi: Column, nb: Int): Column =
    when(hi > lo,
      least(floor((v.cast("double") - lo) / ((hi - lo) / nb)), lit(nb - 1)))
      .otherwise(lit(0)).cast("long")

  /** Global 1-based ascending rank for EVERY row, no global sort above
    * `directMax` rows. Order: (valueCol, tieCols...); `rankCol` is appended
    * to df's columns. Used by q_window_ntile; valuesAtPositions is the
    * sparse variant that only touches the buckets containing requested
    * positions. Inputs at or below `directMax` rows take the plain
    * single-task window rank (see the routing note in the object doc);
    * tests pin `directMax = 0` to force the histogram machinery. */
  def withGlobalRank(df: DataFrame, valueCol: String, tieCols: Seq[String],
                     rankCol: String, buckets: Int = 1024,
                     hotGroup: Int = 4096, keepBuckets: Boolean = false,
                     directMax: Long = 1L << 20): DataFrame = {
    require(tieCols.nonEmpty, "tie columns are required for a total order")
    // directMax bounds a deliberate single-task sort; cap it so a careless
    // caller cannot reintroduce the unbounded global sort this operator
    // exists to avoid (and slip past UnpartitionedWindowCheck's strict
    // gate via the constant partition key below)
    require(directMax <= (1L << 24),
      s"directMax $directMax exceeds the single-task sort ceiling 2^24")
    val ord = (valueCol +: tieCols).map(col)
    // routing probe: ONE count job picks exactly one plan (see object
    // doc); SizeProbe checkpoint-shares the scan on derived frames so the
    // probe never executes the input lineage twice
    val (n, shared) = graft.core.SizeProbe.count(df)
    if (n <= directMax) {
      // bounded ≤ directMax rows by the probe — the single-task sort is
      // the intent (cheapest exact plan at this size). The constant
      // partition key marks that deliberately, keeping
      // UnpartitionedWindowCheck's strict gate meaningful for unrouted
      // plans.
      val small = shared.withColumn("__all", lit(0))
        .withColumn(rankCol, row_number().over(
          Window.partitionBy("__all").orderBy(ord: _*)).cast("long"))
        .drop("__all")
      if (keepBuckets)
        small.withColumn("__hb", lit(0L)).withColumn("__tb", lit(0L))
      else small
    } else
      histogramRank(shared, valueCol, tieCols, rankCol, buckets, hotGroup, keepBuckets)
  }

  /** The histogram decomposition (large-input branch of withGlobalRank). */
  private def histogramRank(df: DataFrame, valueCol: String, tieCols: Seq[String],
                            rankCol: String, buckets: Int,
                            hotGroup: Int, keepBuckets: Boolean): DataFrame = {
    val v = col(valueCol)
    val tie1 = col(tieCols.head)
    val stats = df.agg(min(v.cast("double")).as("__glo"),
      max(v.cast("double")).as("__ghi"))
    // localCheckpoint: the bucketed rows feed the distinct-value histogram
    // AND the cold/hot rank branches — 3 full re-scans without the barrier
    val r = df.crossJoin(broadcast(stats))
      .withColumn("__hb", bucketOf(v, col("__glo"), col("__ghi"), buckets))
      .drop("__glo", "__ghi")
      .localCheckpoint(eager = false)
    // distinct-value stats: one combiner-friendly agg keyed (bucket, value)
    val dv = r.groupBy(col("__hb").as("__hb2"), v.as("__v"))
      .agg(count(lit(1)).as("__cnt"),
        min(tie1.cast("double")).as("__tlo"), max(tie1.cast("double")).as("__thi"))
    // bucket offsets: running sum over ≤ `buckets` aggregated rows
    val bc = dv.groupBy("__hb2").agg(sum("__cnt").as("__bcnt"))
    val wb = Window.orderBy("__hb2").rowsBetween(Window.unboundedPreceding, -1)
    val boff = bc.withColumn("__boff", coalesce(sum("__bcnt").over(wb), lit(0L)))
      .select("__hb2", "__boff")
    // value offsets inside each bucket: window over the bucket's DISTINCT
    // values (parallel per bucket; cardinality bounded by bucket width)
    val wv = Window.partitionBy("__hb2").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val voff = dv.withColumn("__vo", coalesce(sum("__cnt").over(wv), lit(0L)))
      .join(broadcast(boff), "__hb2")
      .select(col("__hb2"), col("__v"), col("__cnt"), col("__tlo"), col("__thi"),
        (col("__boff") + col("__vo")).as("__voff"))
    val j = r.join(voff, col("__hb") === col("__hb2") && v === col("__v"))
    val ord = (valueCol +: tieCols).map(col)
    // cold value groups (≤ hotGroup rows): plain local rank per (bucket, value)
    val cold = j.filter(col("__cnt") <= hotGroup)
      .withColumn("__tr", row_number().over(
        Window.partitionBy("__hb", "__v").orderBy(ord: _*)))
      .withColumn("__tb", lit(0L))
    // hot value groups: sub-bucket on the first tie column (adaptive bounds
    // from the same dv agg) — tieRank = tie-bucket offset + local rank
    val hot0 = j.filter(col("__cnt") > hotGroup)
      .withColumn("__tb", bucketOf(tie1, col("__tlo"), col("__thi"), buckets))
    val tc = hot0.groupBy(col("__v").as("__v3"), col("__tb").as("__tb3"))
      .agg(count(lit(1)).as("__tcnt"))
    val wt = Window.partitionBy("__v3").orderBy("__tb3")
      .rowsBetween(Window.unboundedPreceding, -1)
    val toff = tc.withColumn("__toff", coalesce(sum("__tcnt").over(wt), lit(0L)))
      .select("__v3", "__tb3", "__toff")
    val hot = hot0.join(toff, col("__v") === col("__v3") && col("__tb") === col("__tb3"))
      .withColumn("__tr", col("__toff") + row_number().over(
        Window.partitionBy("__v", "__tb").orderBy(ord: _*)))
      .drop("__v3", "__tb3", "__toff")
    val out = cold.unionByName(hot)
      .withColumn(rankCol, col("__voff") + col("__tr"))
      .drop("__hb2", "__v", "__cnt", "__tlo", "__thi", "__voff", "__tr")
    // keepBuckets: RankSpec observes the skew split (each (__hb, __tb) is
    // its own parallel sort partition)
    if (keepBuckets) out else out.drop("__hb", "__tb")
  }

  /** Values at the given per-group global ascending-sort positions.
    *
    * @param df        input rows
    * @param groupCol  grouping column name
    * @param valueCol  numeric column to rank by
    * @param positions tiny DataFrame of (group, pos) targets, 0-based;
    *                  broadcast to every stage (duplicate targets are fine —
    *                  they just emit duplicate output rows)
    * @param buckets   histogram fan-out per level
    * @param depth     recursion depth: multi-valued target buckets are
    *                  re-histogrammed (buckets× finer) this many levels
    *                  before a local sort
    * @param stats     optional precomputed per-group (groupCol, n, lo, hi)
    *                  row count + domain bounds — callers that already
    *                  aggregate per-group statistics (e.g. counts for
    *                  percentile positions) pass them here to drop one full
    *                  scan; recursion levels always compute their own
    * @param directMax groups at or below this many rows route to the plain
    *                  per-group window form (see the routing note in the
    *                  object doc); tests pin 0 to force the histogram path
    * @return (grp, pos, v) — one row per target position that exists;
    *         positions past the end of a group yield no row
    */
  def valuesAtPositions(df: DataFrame, groupCol: String, valueCol: String,
                        positions: DataFrame, buckets: Int = 1024,
                        depth: Int = 2,
                        stats: Option[DataFrame] = None,
                        directMax: Long = 1L << 20): DataFrame = {
    require(directMax <= (1L << 24),
      s"directMax $directMax exceeds the single-task sort ceiling 2^24")
    val r = df.select(col(groupCol).cast("string").as("grp"),
      col(valueCol).as("v"))
    val tgt = positions.toDF("__g0", "pos")
      .select(col("__g0").cast("string").as("grp"), col("pos").cast("long").as("pos"))
    val st = stats.map(_.toDF("__g0", "__n", "__lo", "__hi")
      .select(col("__g0").cast("string").as("grp"),
        col("__n").cast("long").as("__gn"),
        col("__lo").cast("double").as("__glo"),
        col("__hi").cast("double").as("__ghi")))
      .getOrElse(r.groupBy("grp").agg(count(lit(1)).as("__gn"),
        min(col("v").cast("double")).as("__glo"),
        max(col("v").cast("double")).as("__ghi")))
      .localCheckpoint(eager = false)
    // size routing: small groups take the plain per-group window rank (the
    // oracle's own shape; bounded ≤ directMax rows by the routing), large
    // groups the histogram machinery — both exact, RankSpec-gated. The
    // probe is ONE driver action over the metadata-scale stats frame (one
    // row per group), and it also materializes st's checkpoint for every
    // downstream broadcast; the all-small / all-large cases then emit a
    // single plan with no checkpoint+union scaffolding (see object doc).
    val probe = st.agg(min(col("__gn")).as("mn"), max(col("__gn")).as("mx")).head()
    val (mn, mx) =
      if (probe.isNullAt(1)) (0L, 0L) else (probe.getLong(0), probe.getLong(1))
    val out =
      if (mx <= directMax) {
        // all groups small: the oracle's own shape, nothing else
        r.withColumn("i", row_number().over(
            Window.partitionBy("grp").orderBy("v")).cast("long") - 1)
          .join(broadcast(tgt), Seq("grp"))
          .filter(col("i") === col("pos"))
          .select(col("grp"), col("pos"), col("v"))
      } else if (mn > directMax) {
        // all groups large: histogram only
        go(r, tgt, buckets, depth, Some(st.select("grp", "__glo", "__ghi")))
      } else {
        // mixed: both branches share one checkpointed sized scan
        val sized = r.join(broadcast(st.select("grp", "__gn")), "grp")
          .localCheckpoint(eager = false)
        val smallVals = sized.filter(col("__gn") <= directMax)
          .withColumn("i", row_number().over(
            Window.partitionBy("grp").orderBy("v")).cast("long") - 1)
          .join(broadcast(tgt), Seq("grp"))
          .filter(col("i") === col("pos"))
          .select(col("grp"), col("pos"), col("v"))
        val large = sized.filter(col("__gn") > directMax).select("grp", "v")
        smallVals.unionByName(
          go(large, tgt, buckets, depth,
            Some(st.filter(col("__gn") > directMax).select("grp", "__glo", "__ghi"))))
      }
    // groups travel internally as strings (recursion composes sub-group
    // keys); cast back at the end — string round-trip is the identity for
    // the string/integer/timestamp group keys this engine uses
    out.select(col("grp").cast(df.schema(groupCol).dataType).as("grp"),
      col("pos"), col("v"))
  }

  private def go(r: DataFrame, tgt: DataFrame, nb: Int, depth: Int,
                 statsIn: Option[DataFrame] = None): DataFrame = {
    val stats = statsIn.getOrElse(
      r.groupBy("grp").agg(min(col("v").cast("double")).as("__glo"),
        max(col("v").cast("double")).as("__ghi")))
    // broadcast: stats is one row per group — a plain join would shuffle
    // the whole table by the (low-cardinality) group key. localCheckpoint:
    // the bucketed rows feed the histogram AND both resolution branches
    // (plus recursion) — without the barrier each branch re-scans and
    // re-aggregates the source.
    val rb = r.join(broadcast(stats), "grp")
      .withColumn("hb", bucketOf(col("v"), col("__glo"), col("__ghi"), nb))
      .drop("__glo", "__ghi")
      .localCheckpoint(eager = false)
    val hist = rb.groupBy("grp", "hb").agg(count(lit(1)).as("cnt"),
      min("v").as("vlo"), max("v").as("vhi"))
    val wh = Window.partitionBy("grp").orderBy("hb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = hist.withColumn("off", coalesce(sum("cnt").over(wh), lit(0L)))
    val need = off.join(broadcast(tgt), Seq("grp"))
      .filter(col("pos") >= col("off") && col("pos") < col("off") + col("cnt"))
    // single-valued bucket: every row IS the positional value — no sort
    val direct = need.filter(col("vlo") === col("vhi"))
      .select(col("grp"), col("pos"), col("vlo").as("v"))
    val multi = need.filter(col("vlo") =!= col("vhi"))
    val resolved =
      if (depth <= 1) {
        val bkts = multi.select("grp", "hb", "off").distinct()
        val wl = Window.partitionBy("grp", "hb").orderBy("v")
        rb.join(broadcast(bkts), Seq("grp", "hb"))
          .withColumn("i", col("off") + row_number().over(wl) - 1)
          .join(broadcast(tgt), Seq("grp"))
          .filter(col("i") === col("pos"))
          .select(col("grp"), col("pos"), col("v"))
      } else {
        // recurse with a nb× finer histogram on just the target buckets
        val sub = multi.select("grp", "hb", "off").distinct()
          .withColumn("sgrp", concat_ws("\u0001", col("grp"), col("hb")))
        val subRows = rb.join(broadcast(sub.select("grp", "hb", "sgrp")),
            Seq("grp", "hb"))
          .select(col("sgrp").as("grp"), col("v"))
        val subTgt = multi
          .withColumn("sgrp", concat_ws("\u0001", col("grp"), col("hb")))
          .select(col("sgrp").as("grp"), (col("pos") - col("off")).as("pos"))
        go(subRows, subTgt, nb, depth - 1)
          .select(col("grp").as("sgrp"), col("pos").as("spos"), col("v"))
          .join(broadcast(sub), "sgrp")
          .select(col("grp"), (col("spos") + col("off")).as("pos"), col("v"))
      }
    direct.unionByName(resolved)
  }
}
