package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.operators._

/** The library's one-stop user surface: every generic operator, grouped by
  * domain, each delegating to its implementation in [[graft.operators]]
  * (see the target's scaladoc for schema contracts and the 100 TB design
  * notes; ApiSpec drives each group through this facade).
  *
  * Three ways to consume the library:
  *   1. this facade — `Graft.dedup.semantic(embeddings, tau = 0.9)`;
  *   2. the SQL extension — `--conf spark.sql.extensions=graft.GraftExtensions`
  *      registers `graft_dot`/`graft_ngrams`/`graft_normalize`, the as-of
  *      join strategy, the range-join rewrite, and the window lint into
  *      any Spark deployment with no code changes;
  *   3. the contract registry — [[SparkEntry.queries]], 140+ named
  *      oracle-verified query implementations over the fixture schema.
  */
object Graft {

  /** Deduplication: exact, MinHash-LSH, SimHash, semantic (embedding),
    * span-level; connected-component survivor selection. */
  object dedup {
    /** Candidate near-dup pairs via MLlib MinHash-LSH banding. */
    def minhashPairs(documents: DataFrame, minJaccard: Double): DataFrame =
      MinHashDedup.candidatePairs(documents, minJaccard)
    /** Exact-Jaccard pairs via hashed-shingle postings (no all-pairs). */
    def jaccardPairs(documents: DataFrame, minJ: Double): DataFrame =
      InvertedJaccard.pairs(documents, minJ)
    /** 64-bit SimHash fingerprints for [[simhashPairs]] (bucketCols
      * append to the band key — e.g. Seq("lang", "source")). */
    def simhashFingerprints(docs: DataFrame,
                            bucketCols: Seq[String] = Nil): DataFrame =
      SimHashBanding.fingerprints64(docs, bucketCols)
    /** Hamming-banded near-dup pairs over fingerprints (density-routed). */
    def simhashPairs(fingerprints: DataFrame, maxHamming: Int): DataFrame =
      SimHashBanding.pairs(fingerprints, maxHamming)
    /** Embedding-cosine duplicate flags at threshold tau (PQ-coded
      * banding above the routing threshold; codecDir persists codebooks). */
    def semantic(embeddings: DataFrame, tau: Double, planes: Int = 16): DataFrame =
      SemanticDedup.flags(embeddings, tau, planes)
    /** Connected components over a (d1, d2) pair frame (pointer
      * jumping, log-diameter rounds); returns (v, lbl). */
    def components(pairs: DataFrame, maxIters: Int = 24): DataFrame =
      DedupGroups.components(pairs, maxIters)
    /** Keep one survivor per duplicate component. */
    def survivors(documents: DataFrame, pairs: DataFrame): DataFrame =
      DedupGroups.dropDuplicates(documents, pairs)
    /** Span-level (substring) duplicate coverage per doc. */
    def spanCoverage(docs: DataFrame, hashed: Boolean = true): DataFrame =
      SpanDedup.coverage(docs, hashed = hashed)
    /** 64-bit aHash perceptual fingerprints over a (doc_id, payload)
      * binary-image frame — output column is `simhash`, so it feeds
      * [[simhashPairs]]/[[components]] unchanged (image near-dup runs on
      * the text dedup machinery). */
    def perceptualHashes(withBinary: DataFrame): DataFrame =
      Multimodal.perceptualHashes(withBinary)
  }

  /** Similarity search over embedding columns: exact pruned top-k and the
    * IVF-PQ persisted-index path. */
  object sim {
    /** Exact global top-k cosine pairs (centroid triangle-inequality
      * pruning; anchorPred bounds the left side). */
    def topKPairs(embeddings: DataFrame, k: Int): DataFrame =
      ExactPairsTopK.topPairs(embeddings, k)
    /** All pairs at cosine ≥ tau, exact, centroid-pruned. */
    def thresholdPairs(embeddings: DataFrame, tau: Double): DataFrame =
      ExactPairsTopK.thresholdPairs(embeddings, tau)
    /** Build / persist / load / query the IVF-PQ ANN index — the index is
      * DATA (parquet), not driver state. */
    def buildIndex(embeddings: DataFrame, cells: Int = 8, m: Int = 8): IvfPq.IvfPqIndex =
      IvfPq.buildIndex(embeddings, cells, m)
    def saveIndex(index: IvfPq.IvfPqIndex, dir: String): Unit = IvfPq.save(index, dir)
    def loadIndex(spark: SparkSession, dir: String): IvfPq.IvfPqIndex =
      IvfPq.load(spark, dir)
    def query(index: IvfPq.IvfPqIndex, queries: DataFrame, k: Int,
              anchorPred: Column, nprobe: Int = 4): DataFrame =
      IvfPq.query(index, queries, k, anchorPred, nprobe)
    /** Top principal direction of the embedding corpus by distributed
      * power iteration (one scan per round; D-vector driver state). */
    def topComponent(embeddings: DataFrame, vecCol: String = "embedding",
                     iters: Int = 8): PowerIteration.TopComponent =
      PowerIteration.topComponent(embeddings, vecCol, iters)
  }

  /** Corpus cleansing and tokenizer training — the pretrain data path. */
  object text {
    /** normalize + PII-redact projection (idempotent; adds clean_text). */
    def cleanse(docs: DataFrame, textCol: String = "text"): DataFrame =
      PretrainPipeline.cleanse(docs, textCol)
    /** Drop docs whose span-dup fraction exceeds the threshold. */
    def dropSpanDups(docs: DataFrame, maxDupFrac: Double = 0.5): DataFrame =
      PretrainPipeline.dropSpanDups(docs, maxDupFrac = maxDupFrac)
    /** Aggregated word-frequency dict — BPE training input (ONE corpus pass). */
    def wordDict(docs: DataFrame, textCol: String = "text"): DataFrame =
      BpeTrain.wordDict(docs, textCol)
    /** Learn a BPE merge table from the dict (vocab-bounded shuffles). */
    def bpeTrain(words: DataFrame, numMerges: Int): Seq[BpeTrain.Merge] =
      BpeTrain.train(words, numMerges)
    /** Apply a learned merge table; adds bpe_tokens per row. */
    def bpeEncode(docs: DataFrame, merges: Seq[BpeTrain.Merge]): DataFrame =
      BpeTrain.encode(docs, merges)
    /** Whitespace token count (cross-engine-exact separator form). */
    def tokenCount(text: Column): Column = SequencePack.tokenCount(text)
    /** Pack rows into `capacity`-token training sequences ("concat then
      * chunk"): adds `chunk` = the sequence this row starts in, via the
      * two-pass distributed prefix sum (no single-task window). */
    def packChunks(df: DataFrame, orderCol: String, tokCol: String,
                   capacity: Long): DataFrame =
      SequencePack.assignChunks(df, orderCol, tokCol, capacity)
    /** Canonical form of a URL column (fragment stripped, scheme/host
      * lowercased, default ports and trailing slashes removed, query
      * params sorted) — the web-corpus dedup key. Pure column algebra. */
    def canonicalUrl(url: Column): Column = UrlCanon.canonical(url)
    /** Corpus novelty per owner over a distinct (owner, item) frame —
      * share of items first seen at that owner (min-owner wins). */
    def noveltyShare(pairs: DataFrame, owner: String, item: String): DataFrame =
      ExactStats.firstOccurrenceShare(pairs, owner, item)
  }

  /** Join shapes Spark lacks natively. */
  object joins {
    /** Single-pass partitioned-merge as-of join (latest right row ≤ left
      * time per key); also plannable via GraftExtensions' strategy. */
    def asOf(left: DataFrame, right: DataFrame,
             leftKeys: Seq[String], rightKeys: Seq[String],
             leftTime: String, rightTime: String): DataFrame =
      AsOfJoin.leftAsOfMergeAll(left, right, leftKeys, rightKeys, leftTime, rightTime)
    /** Skew-mitigated fact⨝dim equi-join (salted key spread). */
    def salted(big: DataFrame, small: DataFrame,
               bigKey: String, smallKey: String, salt: Int = 8): DataFrame =
      SaltedJoin.join(big, small, bigKey, smallKey, salt)
    /** Selective fact⨝dim join with the fact bloom-prefiltered by the dim
      * keys before its shuffle — row-identical to the plain join, shuffle
      * volume drops to matches + the fp tail. */
    def bloomPrefiltered(fact: DataFrame, dim: DataFrame,
                         factKey: String, dimKey: String,
                         expectedItems: Long = 1000000L): DataFrame =
      BloomJoin.prefiltered(fact, dim, factKey, dimKey, expectedItems)
    /** Record linkage: equi-blocked fuzzy self-pairs (key_a < key_b,
      * levenshtein ≤ maxDist) — a join, never a cartesian cross-score. */
    def fuzzyPairs(df: DataFrame, block: String, key: String, str: String,
                   maxDist: Int): DataFrame =
      FuzzyBlockJoin.selfPairs(df, block, key, str, maxDist)
  }

  /** Distribution statistics without global sorts. */
  object stats {
    /** Global rank per row via adaptive histogram offsets (no single-task
      * sort; skew-safe sub-bucketing). */
    def withGlobalRank(df: DataFrame, valueCol: String, tieCols: Seq[String],
                       rankCol: String = "rank"): DataFrame =
      HistogramRank.withGlobalRank(df, valueCol, tieCols, rankCol)
    /** SpaceSaving heavy-hitters aggregate column (top-m sketch). */
    def heavyHitters(m: Int): Column => Column = HeavyHitters.heavyHitters(m)
    /** Exact two-sample Kolmogorov–Smirnov numerator per group:
      * D = ks_num/(n1·n2), all-integer (quantize float values first). */
    def ksNumerator(df: DataFrame, group: String, value: String,
                    isFirst: String): DataFrame =
      ExactStats.ksNumerator(df, group, value, isFirst)
    /** Exact ROC-AUC as the fraction (auc_num_x2, auc_den) — midrank-tied
      * Mann–Whitney U, no floats. */
    def aucExact(df: DataFrame, score: String, pos: String): DataFrame =
      ExactStats.aucExact(df, score, pos)
    /** Top-k co-occurring item pairs across baskets (k = 2 frequent
      * itemsets, deterministic tie-break). */
    def basketPairs(df: DataFrame, basket: String, item: String,
                    k: Int): DataFrame =
      BasketPairs.topPairs(df, basket, item, k)
    /** Two-proportion z² A/B readout over unit-level (variant, success)
      * 0/1 flags: exact integer rational (z2_num, z2_den) plus the
      * one-divide double; NULL z² on degenerate experiments. */
    def twoProportion(df: DataFrame, variant: String,
                      success: String): DataFrame =
      ExactStats.twoProportion(df, variant, success)
    /** Theil–Sen robust slope of a pre-aggregated integral series: the
      * positional median of all pairwise slopes as the exact rational
      * (slope_num, slope_den) plus the one-divide double. */
    def theilSen(series: DataFrame, x: String, y: String): DataFrame =
      ExactStats.theilSen(series, x, y)
    /** Kendall tau-b per group over integer-quantized (x, y): exact
      * concordance counts off the joint value histogram (support², not
      * n², cell pairs); tau_b = 2·tau_num/√(den_x_x2·den_y_x2). */
    def kendallTau(df: DataFrame, group: String, x: String,
                   y: String): DataFrame =
      ExactStats.kendallTau(df, group, x, y)
    /** CUPED variance-reduced A/B readout over unit-level (arm, x, y)
      * with integral covariate/metric: per arm the raw and adjusted
      * means, θ exact-truncated to micros. */
    def cuped(df: DataFrame, arm: String, x: String, y: String): DataFrame =
      ExactStats.cuped(df, arm, x, y)
    /** Association rules a → b over baskets: top-k by confidence with
      * exact supports and single-divide lift. */
    def basketRules(df: DataFrame, basket: String, item: String,
                    k: Int): DataFrame =
      BasketPairs.rules(df, basket, item, k)
    /** Fixed-band score-calibration table over unit-level (score, pos)
      * with an integral score: per band count, positives, average score
      * and observed rate. Streaming-legal as-is. */
    def calibration(df: DataFrame, score: String, pos: String,
                    bandWidth: Long): DataFrame =
      ExactStats.calibration(df, score, pos, bandWidth)
    /** Binary-classifier confusion report over (pred, actual) 0/1
      * flags: exact 2×2 counts, precision/recall/F1 single divides,
      * MCC pieces. Streaming-legal as-is. */
    def confusion(df: DataFrame, pred: String, actual: String): DataFrame =
      ExactStats.confusion(df, pred, actual)
  }

  /** Re-identification-risk audits over quasi-identifier groupings. */
  object privacy {
    /** Per-QI-group size k: (qiCols..., k). Band caller-side. */
    def groupSizes(df: DataFrame, qiCols: Seq[String]): DataFrame =
      PrivacyAudit.groupSizes(df, qiCols)
    /** Per-QI-group size and sensitive-attribute diversity:
      * (qiCols..., k, l); l == 1 groups leak the attribute. */
    def groupDiversity(df: DataFrame, qiCols: Seq[String],
                       sensitive: String): DataFrame =
      PrivacyAudit.groupDiversity(df, qiCols, sensitive)
    /** Per-group counts with each unit's contribution capped —
      * sensitivity exactly `cap`, with raw totals and discarded mass. */
    def clippedCounts(df: DataFrame, group: String, unit: String,
                      cap: Long = 8L): DataFrame =
      DpRelease.clippedCounts(df, group, unit, cap)
    /** ε-DP count release: clipped count + seed-deterministic
      * Laplace(cap/ε) noise (reproducible, auditable draws). */
    def release(clipped: DataFrame, group: String, epsilon: Double,
                seed: String, cap: Long = 8L): DataFrame =
      DpRelease.release(clipped, group, epsilon, seed, cap)
  }

  /** Data-quality gates a snapshot publish runs first. */
  object quality {
    /** One-pass rule audit: (name, violation predicate) pairs in, one
      * (rule, n_checked, n_violations) row out per rule — zero-violation
      * rules included. */
    def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
      QualityAudit.audit(df, rules)
  }

  /** Iterative graph analytics as DataFrame iterations. */
  object graph {
    /** Damped PageRank over (src, dst) edges; every node must appear as
      * a src (symmetrize first if the graph can dangle). */
    def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame =
      PageRank.run(edges, iters, damping)
    /** Connected components over a (d1, d2) pair frame. */
    def components(pairs: DataFrame, maxIters: Int = 24): DataFrame =
      DedupGroups.components(pairs, maxIters)
    /** Flatten a parent-pointer forest to per-node (root, depth) by
      * pointer doubling (⌈log₂ depth⌉ rounds, no driver frontier);
      * throws on cycles instead of returning partial labels. Input
      * (v, parent) with roots encoded parent == v. */
    def flatten(nodes: DataFrame, maxIters: Int = 40): DataFrame =
      HierarchyFlatten.flatten(nodes, maxIters)
    /** The proper-ancestor closure (v, anc) by path doubling; Σdepth-sized
      * output — see the scaladoc for when [[flatten]] is the right tool.
      * Throws on cyclic input (self-pair detection). */
    def ancestors(nodes: DataFrame, maxIters: Int = 40): DataFrame =
      HierarchyFlatten.ancestors(nodes, maxIters)
  }

  /** Time-series shaping. */
  object time {
    /** Largest-Triangle-Three-Buckets downsampling to ≤ `buckets` points
      * per series — endpoints kept, interior picked by max triangle area,
      * one pass over window frames (no per-series driver loop). `x` is an
      * int64 ordinate (e.g. epoch micros), `tie` breaks equal x. */
    def lttb(series: DataFrame, key: String, x: String, y: String,
             tie: String, buckets: Int): DataFrame =
      Lttb.downsample(series, key, x, y, tie, buckets)
    /** Exact scaled CUSUM changepoint scan over a PRE-AGGREGATED series
      * (bucket the raw rows first — the windows run on that spine). */
    def cusum(series: DataFrame, order: String, value: String): DataFrame =
      ExactStats.cusumScaled(series, order, value)
  }

  /** Mergeable data sketches — fixed-size profiling summaries that
    * merge with plain SQL (max / sum / keep-k / union) across
    * partitions, days and sources, and run unchanged as streaming
    * aggregations (the merge is the state update). */
  object sketch {
    /** HyperLogLog register table over a key column (m buckets). */
    def hllRegisters(df: DataFrame, key: String, m: Int = 64): DataFrame =
      Sketches.hllRegisters(df, key, m)
    /** Raw harmonic cardinality estimate from a register table. */
    def hllEstimate(registers: DataFrame, m: Int = 64): Double =
      Sketches.hllEstimate(registers, m)
    /** Count–min counter grid; `weight` adds exactly (default 1/row). */
    def cmsCounters(df: DataFrame, key: String, depth: Int = 4,
                    width: Int = 256, weight: Option[String] = None): DataFrame =
      Sketches.cmsCounters(df, key, depth, width, weight)
    /** Never-undercounting point estimates for probe keys. */
    def cmsLookup(counters: DataFrame, probes: DataFrame, key: String,
                  depth: Int = 4, width: Int = 256): DataFrame =
      Sketches.cmsLookup(counters, probes, key, depth, width)
    /** The k smallest 60-bit key hashes, ranked — KMV supports set
      * algebra (union = merge-and-keep-k). */
    def kmv(df: DataFrame, key: String, k: Int = 64): DataFrame =
      Sketches.kmv(df, key, k)
    /** Unbiased KMV estimate; exact when NDV < k. */
    def kmvEstimate(sketch: DataFrame, k: Int = 64): Double =
      Sketches.kmvEstimate(sketch, k)
    /** Bloom bit set for a key column (union-mergeable). */
    def bloomBits(df: DataFrame, key: String, bits: Int = 65536,
                  hashes: Int = 2): DataFrame =
      Sketches.bloomBits(df, key, bits, hashes)
    /** Claimed-member keys — never false-negative. */
    def bloomProbe(bitsDf: DataFrame, probes: DataFrame, key: String,
                   bits: Int = 65536, hashes: Int = 2): DataFrame =
      Sketches.bloomProbe(bitsDf, probes, key, bits, hashes)
    /** Bucketed KMV — min hash per of k hash ranges: the
      * streaming-mergeable form (merge = per-bucket MIN). */
    def kmvBuckets(df: DataFrame, key: String, k: Int = 64): DataFrame =
      Sketches.kmvBuckets(df, key, k)
    /** Constant-factor MinCount estimate off a bucketed-KMV frame. */
    def kmvBucketsEstimate(sketch: DataFrame, k: Int = 64): Double =
      Sketches.kmvBucketsEstimate(sketch, k)
    /** Bloom bit histogram — the bit set as ONE aggregation (runs as a
      * streaming state update; a bit is present ⇔ n_hits ≥ 1). */
    def bloomHits(df: DataFrame, key: String, bits: Int = 65536,
                  hashes: Int = 2): DataFrame =
      Sketches.bloomHits(df, key, bits, hashes)
  }

  /** ACID tables: the minimal manifest-based transactional format
    * (atomic rename commit, snapshot log, time travel, key-pruned
    * MERGE) — see [[graft.table.ManifestTable]] for the protocol. */
  object table {
    import graft.table.ManifestTable
    /** Create at version 0 (fails if a log exists). `statsCols` turns
      * on per-file min/max footer stats (pruning + MERGE metadata);
      * `partitionCols` makes the table partitioned (values recorded
      * per file, columns stay in the data files); `constraints` are
      * CHECK predicates (name → SQL) enforced on every write. */
    def create(spark: SparkSession, dir: String, df: DataFrame,
               statsCols: Seq[String] = Nil,
               partitionCols: Seq[String] = Nil,
               constraints: Map[String, String] = Map.empty,
               bloomCols: Seq[String] = Nil): ManifestTable.Snapshot =
      ManifestTable.create(spark, dir, df, statsCols, partitionCols,
        constraints, bloomCols)
    /** Append-only commit (auto-retries version races). */
    def append(spark: SparkSession, dir: String, df: DataFrame): ManifestTable.Snapshot =
      ManifestTable.append(spark, dir, df)
    /** Atomic replace of the table contents. */
    def overwrite(spark: SparkSession, dir: String, df: DataFrame): ManifestTable.Snapshot =
      ManifestTable.overwrite(spark, dir, df)
    /** Latest-wins MERGE on `key` ('D' in `opCol` deletes); rewrites
      * only files whose key range overlaps the source. Source must
      * hold one row per key — pass `seqCol` for deterministic
      * intra-source resolution (highest sequence wins), otherwise a
      * duplicate-key source fails loudly before committing. */
    def merge(spark: SparkSession, dir: String, source: DataFrame,
              key: String, opCol: Option[String] = None,
              seqCol: Option[String] = None): ManifestTable.Snapshot =
      ManifestTable.merge(spark, dir, source, key, opCol, seqCol)
    /** The current snapshot. */
    def read(spark: SparkSession, dir: String): DataFrame =
      ManifestTable.read(spark, dir)
    /** The current snapshot with manifest-level file pruning: files
      * whose stats/partition bounds exclude `filter` are never
      * scanned; always equals `read(dir).where(filter)`. */
    def read(spark: SparkSession, dir: String, filter: Column): DataFrame =
      ManifestTable.read(spark, dir, filter)
    /** DELETE FROM … WHERE: rewrites only manifest-pruned files; NULL
      * predicates keep their rows (SQL semantics). */
    def delete(spark: SparkSession, dir: String, filter: Column): ManifestTable.Snapshot =
      ManifestTable.delete(spark, dir, filter)
    /** DELETE as a merge-on-read commit: deletion vectors instead of
      * file rewrites — cost ∝ deleted rows; reads subtract via a
      * broadcast anti-join; the next rewrite materializes. */
    def deleteVector(spark: SparkSession, dir: String, filter: Column): ManifestTable.Snapshot =
      ManifestTable.deleteVector(spark, dir, filter)
    /** REORG … PURGE: materialize all deletion vectors (rewrites only
      * DV-carrying files; vacuum then reclaims the vector files). */
    def purgeVectors(spark: SparkSession, dir: String): ManifestTable.Snapshot =
      ManifestTable.purgeVectors(spark, dir)
    /** UPDATE as merge-on-read: ONE atomic commit carrying the hiding
      * vector and the updated copies; cost ∝ matched rows. */
    def updateVector(spark: SparkSession, dir: String, filter: Column,
                     set: Map[String, Column]): ManifestTable.Snapshot =
      ManifestTable.updateVector(spark, dir, filter, set)
    /** UPDATE … SET … WHERE: touched-files-only rewrite; stats
      * re-harvested so pruning follows the new values. */
    def update(spark: SparkSession, dir: String, filter: Column,
               set: Map[String, Column]): ManifestTable.Snapshot =
      ManifestTable.update(spark, dir, filter, set)
    /** Time travel: the table as of `version`. */
    def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame =
      ManifestTable.readVersion(spark, dir, version)
    /** Time travel by wall clock: the table AS OF `tsMillis` (epoch
      * millis; commit stamps are strictly increasing, so unique). */
    def readAsOf(spark: SparkSession, dir: String, tsMillis: Long): DataFrame =
      ManifestTable.readAsOf(spark, dir, tsMillis)
    /** The latest snapshot with `_file` + `_commit_version` row
      * provenance (metadata-sized broadcast attribution). */
    def readWithMeta(spark: SparkSession, dir: String): DataFrame =
      ManifestTable.readWithMeta(spark, dir)
    /** ALTER TABLE DROP COLUMN: one metadata commit, tombstoned so
      * additive evolution cannot resurrect stale values. */
    def dropColumn(spark: SparkSession, dir: String, name: String): ManifestTable.Snapshot =
      ManifestTable.dropColumn(spark, dir, name)
    /** Shallow CLONE: zero-copy working table referencing the source's
      * files; copy-on-write isolated. Source vacuum invalidates clones. */
    def cloneTable(spark: SparkSession, srcDir: String, dstDir: String,
                   version: Option[Long] = None): ManifestTable.Snapshot =
      ManifestTable.cloneTable(spark, srcDir, dstDir, version)
    /** Standard SQL MERGE INTO: composite keys, ordered `WHEN MATCHED
      * [AND cond] THEN UPDATE/DELETE` + `WHEN NOT MATCHED [AND cond]
      * THEN INSERT` clauses; per-column interval pruning, touched-only
      * rewrite — see [[graft.table.MergeInto]]. */
    def mergeInto(spark: SparkSession, dir: String, source: DataFrame,
                  keys: Seq[String],
                  matched: Seq[graft.table.MergeInto.WhenMatched] = Nil,
                  notMatched: Seq[graft.table.MergeInto.WhenNotMatched] = Nil,
                  notMatchedBySource:
                    Seq[graft.table.MergeInto.WhenNotMatchedBySource] = Nil,
                  /** Additive MERGE schema evolution (`WITH SCHEMA
                    * EVOLUTION`): source-only columns widen the table
                    * in the SAME commit; pre-merge rows answer NULL. */
                  schemaEvolution: Boolean = false)
        : ManifestTable.Snapshot =
      graft.table.MergeInto(spark, dir, source, keys, matched, notMatched,
        notMatchedBySource, schemaEvolution)
    /** MERGE prepared against a frozen snapshot `version`, committed
      * under the optimistic rebase/conflict rules. */
    def mergeAt(spark: SparkSession, dir: String, version: Long,
                source: DataFrame, key: String,
                opCol: Option[String] = None,
                seqCol: Option[String] = None): ManifestTable.Snapshot =
      ManifestTable.mergeAt(spark, dir, version, source, key, opCol, seqCol)
    /** The snapshot log, oldest first. */
    def history(spark: SparkSession, dir: String): Seq[ManifestTable.Snapshot] =
      ManifestTable.history(spark, dir)
    /** Drop data outside the newest `keepLast` snapshots;
      * `retainMillis` additionally keeps every snapshot younger than
      * that age (the "retain 7 days" production contract). */
    def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1,
               retainMillis: Long = 0L): Long =
      ManifestTable.vacuum(spark, dir, keepLast, retainMillis)
    /** Bin-pack small files into ~`targetBytes` outputs (pure layout
      * commit; no-op below two small files). `zorderBy` = the
      * `OPTIMIZE ... ZORDER BY` pairing: packed files get tight,
      * prunable bounds on the named column(s) — two columns use the
      * Morton interleave. */
    def compact(spark: SparkSession, dir: String,
                smallBytes: Long = 32L << 20,
                targetBytes: Long = 128L << 20,
                zorderBy: Seq[String] = Nil,
                /** OPTIMIZE … WHERE: scope to files whose bounds may
                  * match (whole files, never row filtering). */
                where: Option[Column] = None): ManifestTable.Snapshot =
      ManifestTable.compact(spark, dir, smallBytes, targetBytes, zorderBy,
        where)
    /** Row-level changelog between two snapshots (multiset diff;
      * `_change` I/D). */
    def changes(spark: SparkSession, dir: String, from: Long, to: Long): DataFrame =
      ManifestTable.changes(spark, dir, from, to)
    /** Incremental delta after `sinceVersion`, tagged `_as_of_version`
      * for poll-checkpoint-repeat consumption. */
    def changesSince(spark: SparkSession, dir: String, sinceVersion: Long): DataFrame =
      ManifestTable.changesSince(spark, dir, sinceVersion)
    /** Exactly-once streaming MERGE: replaying a committed `batchId`
      * is a structural no-op (see StreamOps.tableMergeBatch). */
    def mergeBatch(spark: SparkSession, dir: String, source: DataFrame,
                   key: String, batchId: Long,
                   opCol: Option[String] = None,
                   seqCol: Option[String] = None): ManifestTable.Snapshot =
      ManifestTable.mergeBatch(spark, dir, source, key, batchId, opCol, seqCol)
    /** RESTORE … TO VERSION: metadata-only rollback commit (the old
      * file set re-published as the new head; history preserved). */
    def restore(spark: SparkSession, dir: String, version: Long): ManifestTable.Snapshot =
      ManifestTable.restore(spark, dir, version)
    /** One snapshot's manifest (head when None): row/byte totals and
      * per-file stats at the cost of one JSON read, zero data IO. */
    def snapshot(spark: SparkSession, dir: String,
                 version: Option[Long] = None): ManifestTable.Snapshot =
      ManifestTable.snapshot(spark, dir, version)
    /** Changelog from the manifests alone — reads only files that
      * changed hands (adds canceling I/D pairs for rewritten-but-
      * unchanged rows); cost ∝ touched files, not table size. */
    def changesStructural(spark: SparkSession, dir: String, from: Long,
                          to: Long): DataFrame =
      ManifestTable.changesStructural(spark, dir, from, to)
    /** Incrementally-maintained aggregate view (count + long sums per
      * key) stored AS a manifest table: init = one fact scan, every
      * refresh = changelog-priced, exactly-once under the fact
      * version. See [[graft.table.IncrementalView]]. */
    def viewInit(spark: SparkSession, factDir: String, mvDir: String,
                 key: String, sums: Seq[String],
                 numFiles: Int = 8): ManifestTable.Snapshot =
      graft.table.IncrementalView.init(spark, factDir, mvDir, key, sums, numFiles)
    /** Bring the view up to the fact head (no-op when fresh). */
    def viewRefresh(spark: SparkSession, factDir: String, mvDir: String,
                    key: String, sums: Seq[String]): ManifestTable.Snapshot =
      graft.table.IncrementalView.refresh(spark, factDir, mvDir, key, sums)
    /** Partition/stats spec evolution: future commits use the new
      * layout, existing files keep pruning by their own recorded
      * values — one metadata commit, no rewrite (compact() migrates
      * incrementally). */
    def alterLayout(spark: SparkSession, dir: String,
                    statsCols: Option[Seq[String]] = None,
                    partitionCols: Option[Seq[String]] = None,
                    bloomCols: Option[Seq[String]] = None): ManifestTable.Snapshot =
      ManifestTable.alterLayout(spark, dir, statsCols, partitionCols,
        bloomCols)
    /** Checkpoint health: (head version, last checkpointed version,
      * replay-suffix length a cold read pays) — the SQL twin is
      * `CALL <catalog>.system.detail(table => …)`. */
    def logHealth(spark: SparkSession, dir: String): (Long, Option[Long], Long) =
      ManifestTable.logHealth(spark, dir)
    /** ALTER TABLE ADD/DROP CONSTRAINT (adds validate existing data;
      * one metadata commit). */
    def alterConstraints(spark: SparkSession, dir: String,
                         add: Map[String, String] = Map.empty,
                         drop: Set[String] = Set.empty): ManifestTable.Snapshot =
      ManifestTable.alterConstraints(spark, dir, add, drop)
    /** The change feed as a real streaming SOURCE (version offsets,
      * per-commit I/D rows tagged `_commit_version`; manifest-priced
      * reads). See [[graft.sources.ChangeFeedSource]]. */
    def readChangeFeed(spark: SparkSession, dir: String,
                       startingVersion: Long = 0L): DataFrame =
      spark.readStream.format("graft-changefeed")
        .option("path", dir)
        .option("startingVersion", startingVersion.toString)
        .load()
  }

  /** Table maintenance: the operational layer of a partitioned store. */
  object maintain {
    /** Compact a splintered directory to evenly-sized files. */
    def compact(spark: SparkSession, in: String, out: String,
                targetFiles: Option[Int] = None): Compaction.Stats =
      Compaction.compact(spark, in, out, targetFiles = targetFiles)
    /** Write Z-ordered by two columns for multi-dim row-group pruning. */
    def writeZOrdered(df: DataFrame, dir: String, colA: String, colB: String,
                      files: Int = 8): Unit =
      ZOrderLayout.writeZOrdered(df, dir, colA, colB, files)
  }

  /** Sources beyond the Spark builtins. */
  object sources {
    import graft.sources.AvroSource
    /** Avro container files, block-splittable read (sync-marker
      * ranges) — see [[graft.sources.AvroSource]]. */
    def readAvro(spark: SparkSession, dir: String,
                 splitBytes: Long = 32L << 20): DataFrame =
      AvroSource.read(spark, dir, splitBytes)
    /** One deflate-compressed container file per partition. */
    def writeAvro(df: DataFrame, dir: String): Long =
      AvroSource.write(df, dir)
  }
}
