package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index exact Jaccard — the linear-shuffle formulation of the
  * bucketed pairwise join in q_text_jaccard_pairs.
  *
  * Instead of materializing every doc pair and intersecting token arrays,
  * explode to (token, doc) postings, self-join postings per token (the
  * candidate generation of a search index), and count shared tokens per
  * pair: |A∩B| = co-occurrence count, |A∪B| = |A|+|B|−|A∩B|. Pairs with
  * zero shared tokens never materialize. At 100 TB this shuffles postings
  * by token (skew-prone hot tokens are handled by dropping ultra-frequent
  * tokens — stopword-style — or salting); on this fixture's 30-word vocab
  * the dense co-occurrence makes the pairwise form competitive, but real
  * corpora are sparse and the index form wins. JaccardSpec asserts exact
  * pair-set equality with the pairwise query.
  */
object InvertedJaccard {

  /** Corpus-wide (d1, d2, jac) pairs with jac ≥ minJ — no bucket
    * constraint. The ground-truth twin for the corpus-wide MinHash-LSH
    * candidate generator (TextSpec measures its prune quality against
    * this). Same linear postings shape; only the join key shrinks to the
    * token alone. */
  def globalPairs(documents: DataFrame, minJ: Double): DataFrame =
    pairs(documents.withColumn("lang", lit("*")).withColumn("source", lit("*")), minJ)

  /** (d1, d2, jac) pairs with jac ≥ minJ, bucketed by (lang, source) like
    * the pairwise twin. */
  def pairs(documents: DataFrame, minJ: Double): DataFrame =
    impl(documents, minJ, salt = 1)

  /** Postings-join Jaccard over a PREBUILT distinct-set column instead of
    * whitespace tokens — the shingle (n-gram) variant used by
    * q_dedup_ngram. `sets` must carry (lang, source, doc_id, setCol); the
    * set elements become the posting keys, so the same linear shuffle
    * shape covers any set representation (tokens, shingles, hashes).
    * Long string elements (shingles) are xxhash64'd into 8-byte posting
    * keys before the shuffle — intersection counts are unchanged because
    * the hash is applied to DISTINCT elements per doc (deterministic;
    * a 64-bit collision within one doc pair's sets is ~n²/2⁶⁴ and the
    * fixture gate would catch it bitwise). Output: (d1, d2, jacCol). */
  def pairsFromSets(sets: DataFrame, setCol: String, minJ: Double,
                    jacCol: String): DataFrame =
    implSets(
      sets.withColumn("toks", transform(col(setCol), e => xxhash64(e)))
        .drop(setCol),
      minJ, salt = 1, jacCol)

  /** Batch×corpus postings join — the incremental-ingest near-dup
    * generator (q_dedup_incremental's 100 TB near stage, made a
    * construction instead of a reference). Same linear postings shuffle
    * as [[pairs]]: both sides explode to (bucket, token, doc) postings
    * and equi-join per token, so a (batch, corpus) pair materializes
    * ONLY if the docs share a token — the batch/corpus asymmetry
    * replaces the d1 < d2 triangle constraint of the self-join form.
    * Output (d1 = batch doc, d2 = corpus doc, jac ≥ minJ). Hot-token
    * skew: same story as [[pairsSalted]] — drop stopword-frequency
    * tokens before calling, or extend with the salt split if a corpus
    * demands it. JaccardSpec gates pair-set equality with the bucketed
    * all-pairs form on the parity-split fixture. */
  def crossPairs(batch: DataFrame, corpus: DataFrame,
                 minJ: Double): DataFrame = {
    def prep(df: DataFrame) = df
      .select(col("lang"), col("source"), col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .select(col("lang"), col("source"), col("doc_id"),
        size(col("toks")).as("n"), col("toks"))
      .localCheckpoint(eager = false) // barrier (see implSets)
    val bp = prep(batch).select(col("lang"), col("source"),
      col("doc_id").as("d1"), col("n").as("na"),
      explode(col("toks")).as("tok"))
    val cp = prep(corpus).select(col("lang").as("lb"), col("source").as("sb"),
      col("doc_id").as("d2"), col("n").as("nb"),
      explode(col("toks")).as("tokb"))
    bp.join(cp, col("lang") === col("lb") && col("source") === col("sb") &&
        col("tok") === col("tokb"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("ni"), first("na").as("na"), first("nb").as("nb"))
      .select(col("d1"), col("d2"),
        (col("ni").cast("double") / (col("na") + col("nb") - col("ni")))
          .as("jac"))
      .filter(col("jac") >= minJ)
      .orderBy("d1", "d2")
  }

  /** [[pairs]] with hot-token skew spreading: a token appearing in d docs
    * contributes d² co-occurrence work to ONE reducer (its shuffle key) —
    * the classic straggler when a stopword-like token hits 10⁶ postings at
    * 100 TB. Salting splits the A-side postings of every token `salt`
    * ways and replicates the B side, so the hot token's pair work spreads
    * over `salt` reducers. Bit-equal to [[pairs]] (JaccardSpec); total
    * work is unchanged — per-reducer share is what shrinks. For corpora
    * where ultra-frequent tokens carry no signal, drop them BEFORE calling
    * (stopword filter) — a semantic choice this operator does not make
    * silently. */
  def pairsSalted(documents: DataFrame, minJ: Double, salt: Int): DataFrame =
    impl(documents, minJ, salt)

  private def impl(documents: DataFrame, minJ: Double, salt: Int): DataFrame =
    implSets(documents.select(col("lang"), col("source"), col("doc_id"),
      array_distinct(split(col("text"), " ")).as("toks")), minJ, salt, "jac")

  private def implSets(t: DataFrame, minJ: Double, salt: Int,
                       jacCol: String): DataFrame = {
    // lineage barrier: materialize the set column once per row BEFORE the
    // self-join branches — otherwise InferFiltersFromConstraints +
    // CollapseProject clone the whole set-building expression tree into
    // pre-join Filters on BOTH sides, and whole-stage codegen recompiles
    // the giant lambda chain per stage (measured: sf0.001 ngram took 3.3 s
    // of pure plan overhead). localCheckpoint truncates the logical plan
    // to the materialized rows (executor-local storage — a deliberate
    // materialization point, like any indexing pass would be at 100 TB).
    val tm = t.select(col("lang"), col("source"), col("doc_id"),
        size(col("toks")).as("n"), col("toks"))
      .localCheckpoint(eager = false)
    // postings carry the owning set's size: the co-occurrence agg then has
    // |A| and |B| in-row (first() under the groupBy) — no sizes re-join
    val postings = tm.select(col("lang"), col("source"), col("doc_id"),
      col("n"), explode(col("toks")).as("tok"))
    val a0 = postings.select(col("lang"), col("source"), col("tok"),
      col("doc_id").as("d1"), col("n").as("na"))
    val b0 = postings.select(col("lang").as("lb"), col("source").as("sb"),
      col("tok").as("tokb"), col("doc_id").as("d2"), col("n").as("nb"))
    // row-local salt on A (any assignment is result-invariant), B replicated
    val (a, b, saltCond) =
      if (salt <= 1) (a0, b0, lit(true))
      else (
        a0.withColumn("_sa", pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int")),
        b0.withColumn("_sb", explode(sequence(lit(0), lit(salt - 1)))),
        col("_sa") === col("_sb"))
    a.join(b, col("lang") === col("lb") && col("source") === col("sb") &&
        col("tok") === col("tokb") && col("d1") < col("d2") && saltCond)
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("ni"), first("na").as("na"), first("nb").as("nb"))
      .select(col("d1"), col("d2"),
        (col("ni").cast("double") / (col("na") + col("nb") - col("ni"))).as(jacCol))
      .filter(col(jacCol) >= minJ)
      .orderBy("d1", "d2")
  }
}
