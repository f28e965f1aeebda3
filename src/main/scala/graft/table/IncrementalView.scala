package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over [[ManifestTable]]s —
  * the 100 TB answer to "keep this aggregate fresh": the view is
  * recomputed from the fact table ONCE ([[init]]), and every later
  * [[refresh]] costs changelog + view work, never another fact scan.
  *
  * The maintained view is `SELECT key, count(*) AS n, sum(c) AS sum_c …
  * GROUP BY key` — count plus any number of LONG-typed sums, the
  * self-maintainable aggregate family (each moves by a signed delta
  * under insert/delete, so no base-table lookback is ever needed;
  * min/max would need one and is out of scope). Sums are maintained in
  * exact integer units — callers scale decimals to fixed-point first
  * (the engine's e4 idiom), which also makes every refresh
  * bit-deterministic. avg is a derived column (`sum/n`), not state.
  *
  * The view IS a [[ManifestTable]], so it inherits the transactional
  * seam wholesale:
  *
  *  - '''Freshness is recorded in the view's own log''': each refresh
  *    commits through [[ManifestTable.mergeBatch]] with the FACT
  *    version as the batch id, so "view is current as of fact vN"
  *    rides the view's `lastBatch` high-water mark — one manifest
  *    read, no side files, and a crashed-and-retried refresh is a
  *    structural no-op (exactly-once maintenance for free).
  *  - '''Deltas come from the fact log, structurally''':
  *    [[ManifestTable.changesStructural]] between the recorded version
  *    and the fact head reads ONLY the files that changed hands (data
  *    files are immutable, so carried-over files can't hold changes) —
  *    the I/D changelog plus canceling pairs for a rewritten file's
  *    unchanged rows, which a signed delta sums away exactly. Works no
  *    matter HOW the fact moved — append, merge, delete, update,
  *    overwrite, even restore; compact's rewrites cancel to an all-zero
  *    delta.
  *  - '''The view stays queryable mid-refresh''' (snapshot isolation)
  *    and time-travels like any table.
  *
  * Refresh shape, per commit batch: the changelog aggregates down to
  * one signed delta row per touched group (map-side combinable); the
  * view is probed for those groups with a broadcast SEMI join (view
  * scan, no view shuffle — the delta is changelog-group-sized and
  * broadcastable by construction); old + delta produces the new group
  * rows, groups reaching n = 0 become MERGE deletes; the merge itself
  * rewrites only the view files whose key bounds hold touched groups.
  * Total cost ∝ |delta groups| + |touched view files| — at 100 TB the
  * fact table never re-enters the plan.
  *
  * Group keys must be non-null (MERGE's key contract); null-key fact
  * rows are filtered out of the delta, loudly documented here.
  */
object IncrementalView {

  private val CountCol = "n"
  private def sumCol(c: String) = s"sum_$c"

  /** One-time full compute: aggregate the fact head and create the
    * view table at `mvDir` (key-stats harvested so later merges prune;
    * `numFiles` range-partitioned files give the manifest tight,
    * disjoint key bounds). Records the fact version it reflects via an
    * immediate empty-source mergeBatch — the same freshness mark every
    * later refresh advances. */
  def init(spark: SparkSession, factDir: String, mvDir: String, key: String,
      sums: Seq[String], numFiles: Int = 8): ManifestTable.Snapshot = {
    val factHead = ManifestTable.snapshot(spark, factDir)
    val fact = ManifestTable.readVersion(spark, factDir, factHead.version)
    val aggs = count(lit(1)).as(CountCol) +:
      sums.map(c => sum(col(c)).cast("long").as(sumCol(c)))
    val mv = fact.where(col(key).isNotNull)
      .groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
    ManifestTable.create(spark, mvDir,
      mv.repartitionByRange(numFiles, col(key)), statsCols = Seq(key))
    val empty = mv.limit(0).withColumn("_op", lit("U"))
    ManifestTable.mergeBatch(spark, mvDir, empty, key,
      batchId = factHead.version, opCol = Some("_op"))
  }

  /** The signed per-group movement of an I/D changelog (`_change` ∈
    * ('I','D') as [[ManifestTable.changes]] emits): one combinable
    * aggregate, one row per touched group. Exposed for specs and for
    * callers maintaining non-table state. */
  def delta(changes: DataFrame, key: String, sums: Seq[String]): DataFrame = {
    val sign = when(col("_change") === "I", lit(1L)).otherwise(lit(-1L))
    val aggs = sum(sign).as("_d_n") +:
      sums.map(c => sum(sign * col(c)).cast("long").as(s"_d_${sumCol(c)}"))
    changes.where(col(key).isNotNull)
      .groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Bring the view up to the fact head. No-op (current view snapshot
    * back, no commit) when the view already reflects it; otherwise one
    * changelog-sized maintenance merge, committed exactly-once under
    * the fact version. Returns the view snapshot whose `lastBatch` is
    * the fact version it now reflects. */
  def refresh(spark: SparkSession, factDir: String, mvDir: String,
      key: String, sums: Seq[String]): ManifestTable.Snapshot = {
    val mvHead = ManifestTable.snapshot(spark, mvDir)
    val since = mvHead.lastBatch
    require(since >= 0L, s"view at $mvDir was not built by init() — no " +
      "fact-version mark to refresh from")
    val factHead = ManifestTable.snapshot(spark, factDir).version
    if (factHead <= since) return mvHead
    // all-zero movements (a rewritten-but-unchanged group, e.g. under
    // compact) are dropped: the maintenance merge then touches nothing
    // and the commit is purely the freshness-mark advance
    val zero = sums.foldLeft(col("_d_n") === 0L) { (acc, c) =>
      acc && col(s"_d_${sumCol(c)}") === 0L
    }
    val d = delta(
      ManifestTable.changesStructural(spark, factDir, since, factHead),
      key, sums)
      .where(!zero)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Touched old state: view scanned once, delta broadcast-semi-probed
    // (group-sized) — the view side never shuffles here, and the merge
    // below rewrites only its key-overlapping files.
    val state = ManifestTable.read(spark, mvDir)
      .join(broadcast(d.select(col(key))), Seq(key), "left_semi")
    val joined = d.join(state, Seq(key), "left")
    val newN = coalesce(col(CountCol), lit(0L)) + col("_d_n")
    val upserts = joined.select(
      col(key) +:
        newN.as(CountCol) +:
        sums.map { c =>
          (coalesce(col(sumCol(c)), lit(0L)) + col(s"_d_${sumCol(c)}"))
            .as(sumCol(c))
        } :+
        when(newN === 0L, lit("D")).otherwise(lit("U")).as("_op"): _*)
    try ManifestTable.mergeBatch(spark, mvDir, upserts, key,
      batchId = factHead, opCol = Some("_op"))
    finally d.unpersist()
  }
}
