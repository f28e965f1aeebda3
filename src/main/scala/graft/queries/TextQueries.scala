package graft.queries

import graft.core.{Dsl, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.9 text / LLM-data-pipeline operators.
  *
  * Scale story (100 TB): exact pairwise Jaccard is bucketed by
  * (lang, source) — the quadratic blowup is bounded per bucket, and the
  * oracle-exact method doubles as ground truth for the MinHash-LSH path
  * (`cap_dedup_minhash`, [[graft.operators.MinHashDedup]]) which is the
  * linear-ish production method. Cosine top-k anchors on a bounded query
  * set (vec_id < 100) with broadcast anchors; the brute-force scan is the
  * correctness baseline for the LSH/IVF variants in graft.operators.
  *
  * All similarity scores are raw doubles from identical IEEE expression
  * trees (sequential index-order folds in both engines — probed bit-equal);
  * no rounding anywhere.
  */
object TextQueries {
  import Dsl._

  /** Spark-side sequential dot product over two float arrays in index
    * order: bit-identical to DuckDB's list_zip/list_sum fold. Uses the
    * codegen'd [[graft.functions.DotProduct]] expression (same accumulation
    * order as the higher-order `aggregate(zip_with(...))` form, ~3× faster
    * because it stays inside whole-stage codegen). */
  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.dot(a, b)
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  val all: Seq[Q] = Seq(
    // Exact dedup on md5(text), keep-min-doc_id; survivor flag via a window
    // so per-lang counts come out of one pass.
    Q("q_dedup_exact",
      """SELECT lang, COUNT(*) AS n_total,
        |  CAST(SUM(is_surv) AS BIGINT) AS n_surv,
        |  CAST(COUNT(*) - SUM(is_surv) AS BIGINT) AS n_removed
        |FROM (SELECT lang,
        |        CASE WHEN MIN(doc_id) OVER (PARTITION BY md5(text)) = doc_id
        |             THEN 1 ELSE 0 END AS is_surv
        |      FROM documents) t
        |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("is_surv",
          when(min(col("doc_id")).over(Window.partitionBy(md5(col("text")))) === col("doc_id"), 1)
            .otherwise(0))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(col("is_surv")).as("n_surv"),
          (count(lit(1)) - sum(col("is_surv"))).as("n_removed"))
        .orderBy("lang")
    },

    // TF-IDF-style term ranking with EXACT cross-engine math: idf as the
    // rational N/df instead of ln(N/df) (ln differs JVM-vs-libm by 1 ulp
    // — banned from oracles, Dsl scaladoc), so score = tf·N/df is one
    // integer product and one identical IEEE division. Monotone in the
    // log form for fixed tf ordering; top-3 terms per doc, deterministic
    // ties. Scale: tf/df are linear aggs; N broadcasts; the rank window
    // partitions by doc_id (high cardinality).
    //
    // Round 9 plan pass (the lm_score lesson): the old tf.groupBy/join
    // form consumed the tf frame twice with DIFFERENT column pruning, so
    // exchange reuse never fired and the tokenize+tf-agg subtree ran
    // TWICE, plus the df equi-join re-shuffled tf by term. df as a
    // window count over tf is the same number (tf rows per term) in ONE
    // linear pipeline: tf-agg → window(term) → window(doc_id) → sort —
    // single tokenize pass, no join, 4 exchanges (guard median 2.08 →
    // ~0.9 s). N rides a one-row broadcast as before.
    Q("q_text_tfidf",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT doc_id, term, tf, df, score, rn FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(tf.tf * n.n AS DOUBLE) / df.df AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.term) AS rn
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n) t
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
      val score = (col("tf") * col("n")).cast("double") / col("df")
      val w = Window.partitionBy("doc_id").orderBy(score.desc, col("term"))
      tf.crossJoin(broadcast(n))
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy("term")))
        .withColumn("score", score)
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rn")
        .orderBy("doc_id", "rn")
    },

    Q("q_text_tokens_tf",
      """SELECT token, COUNT(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token
        |ORDER BY cnt DESC, token
        |LIMIT 20""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)
    },

    Q("q_text_stats",
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  ${davgSql("n_chars")} AS avg_chars,
         |  COUNT(DISTINCT source) AS n_sources
         |FROM documents
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          davg(col("n_chars")).as("avg_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang")
    },

    // Pairwise exact Jaccard within (lang, source) buckets, J ≥ 0.5.
    // |A∪B| = |A|+|B|−|A∩B| from distinct token sets; the double division
    // of two ints is bit-identical across engines.
    Q("q_text_jaccard_pairs",
      """WITH t AS (
        |  SELECT lang, source, doc_id,
        |    list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jac
        |  FROM t a JOIN t b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT d1, d2, jac FROM p
        |WHERE jac >= 0.5
        |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      // Linear-scale postings form (token-keyed self-join; pairs sharing no
      // token never materialize). JaccardSpec asserts bit-equality with the
      // all-pairs bucket join the oracle SQL above spells out.
      graft.operators.InvertedJaccard.pairs(Tables.documents(s, d), minJ = 0.5)
    },

    // Brute-force exact cosine top-5 for anchor vectors vec_id < 100:
    // the correctness baseline for ANN. Norms are precomputed per side with
    // the same fold, so cos = dot/(sqrt(na)*sqrt(nb)) is one shared tree.
    Q("q_sim_cosine_topk",
      s"""WITH n AS (
         |  SELECT vec_id, embedding, ${dotSql("embedding", "embedding")} AS nrm
         |  FROM embeddings)
         |SELECT a_id, b_id, rnk, sim FROM (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.nrm) * sqrt(b.nrm)) DESC,
         |               b.vec_id) AS rnk
         |  FROM n a JOIN n b ON b.vec_id != a.vec_id
         |  WHERE a.vec_id < 100) t
         |WHERE rnk <= 5
         |ORDER BY a_id, rnk""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val n = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          dot(col("embedding"), col("embedding")).as("nrm"))
      val a = n.filter(col("vec_id") < 100)
        .select(col("vec_id").as("a_id"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = n.select(col("vec_id").as("b_id"), col("embedding").as("eb"), col("nrm").as("nb"))
      val sim = (dot(col("ea"), col("eb")) / (sqrt(col("na")) * sqrt(col("nb")))).as("sim")
      val w = Window.partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
      broadcast(a).join(b, col("b_id") =!= col("a_id"))
        .select(col("a_id"), col("b_id"), sim)
        .withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter(col("rnk") <= 5)
        .select("a_id", "b_id", "rnk", "sim")
        .orderBy("a_id", "rnk")
    },

    // 5-NN majority label vote over the q_sim_cosine_topk neighbor set;
    // tie → smaller label.
    Q("q_knn_vote",
      s"""WITH n AS (
         |  SELECT vec_id, embedding, label, ${dotSql("embedding", "embedding")} AS nrm
         |  FROM embeddings),
         |knn AS (
         |  SELECT a_id, b_label FROM (
         |    SELECT a.vec_id AS a_id, b.label AS b_label,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.nrm) * sqrt(b.nrm)) DESC,
         |                 b.vec_id) AS rnk
         |    FROM n a JOIN n b ON b.vec_id != a.vec_id
         |    WHERE a.vec_id < 100) t
         |  WHERE rnk <= 5),
         |votes AS (
         |  SELECT a_id, b_label, COUNT(*) AS votes,
         |    row_number() OVER (PARTITION BY a_id ORDER BY COUNT(*) DESC, b_label) AS vr
         |  FROM knn GROUP BY a_id, b_label)
         |SELECT a_id, b_label AS pred_label, votes
         |FROM votes WHERE vr = 1 ORDER BY a_id""".stripMargin) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val n = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), col("label"),
          dot(col("embedding"), col("embedding")).as("nrm"))
      val a = n.filter(col("vec_id") < 100)
        .select(col("vec_id").as("a_id"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = n.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("label").as("b_label"), col("nrm").as("nb"))
      val sim = dot(col("ea"), col("eb")) / (sqrt(col("na")) * sqrt(col("nb")))
      val wSim = Window.partitionBy("a_id").orderBy(sim.desc, col("b_id"))
      val knn = broadcast(a).join(b, col("b_id") =!= col("a_id"))
        .withColumn("rnk", row_number().over(wSim))
        .filter(col("rnk") <= 5)
        .select("a_id", "b_label")
      val wVote = Window.partitionBy("a_id").orderBy(col("votes").desc, col("b_label"))
      knn.groupBy("a_id", "b_label").agg(count(lit(1)).as("votes"))
        .withColumn("vr", row_number().over(wVote))
        .filter(col("vr") === 1)
        .select(col("a_id"), col("b_label").as("pred_label"), col("votes"))
        .orderBy("a_id")
    },

    // MinHash-LSH near-dup candidates (the 100 TB dedup path; exact Jaccard
    // above is its small-scale oracle — recall asserted in TextSpec).
    Q.cap("cap_dedup_minhash") { (s, d) =>
      graft.operators.MinHashDedup.candidatePairs(
        Tables.documents(s, d), minJaccard = 0.5)
    },

    // Multimodal column round-trip: typed embedding attached to documents,
    // written + re-read as parquet with the nested type intact. The
    // RETURNED frame is scalar-only (Appendix B: no ARRAY/MAP/STRUCT ever
    // reaches the harness) — dim + an exact integer checksum over the
    // round-tripped array prove the nested payload survived.
    Q.cap("cap_embed_column") { (s, d) =>
      val joined = Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
        .select("doc_id", "lang", "text", "embedding", "label")
      val tmp = graft.core.Scratch.dir("embed")
      joined.write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp)
        .select(col("doc_id"), col("lang"), col("label"),
          size(col("embedding")).as("dim"),
          aggregate(col("embedding"), lit(0L),
            (acc, x) => acc + floor(x.cast("double") * 1000000).cast("long"))
            .as("checksum"))
        .orderBy("doc_id")
    },

    // Duplicate-cluster size profile: the dedup-rate report every corpus
    // curation pass publishes — how many exact-content clusters exist at
    // each multiplicity (md5 keying, the q_dedup_exact discipline).
    // Correct in both regimes the fixture plants (FIXTURES.md: 0 dups at
    // sf0.01 → one all-singleton row; 8 at sf0.1 → a real size tail).
    //
    // Scale shape: the md5 rollup is the one row-scale exchange
    // (128-bit keys, no text moves); the size histogram is multiplicity-
    // bounded. Both aggregates combine map-side.
    Q("q_dedup_profile",
      """WITH g AS (
        |  SELECT md5(text) AS fp, COUNT(*) AS sz
        |  FROM documents GROUP BY md5(text))
        |SELECT CAST(sz AS BIGINT) AS cluster_size,
        |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
        |  CAST(sz * COUNT(*) AS BIGINT) AS n_docs
        |FROM g GROUP BY sz ORDER BY cluster_size""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("fp"))
        .agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").cast("long").as("cluster_size"))
        .agg(count(lit(1)).cast("long").as("n_clusters"))
        .selectExpr("cluster_size", "n_clusters",
          "CAST(cluster_size * n_clusters AS BIGINT) AS n_docs")
        .orderBy("cluster_size")
    },

    // Cross-source content-overlap matrix: for every source pair, how
    // many CONTENT fingerprints (md5 of the sorted distinct word set —
    // order- and repetition-insensitive, so rewordings of the same
    // vocabulary collide) appear in BOTH — the "are these two feeds
    // copying each other" contamination screen, one level above
    // per-document dedup.
    //
    // Scale shape: the distinct (fingerprint, source) frame is the one
    // row-scale exchange; pair expansion is ROW-LOCAL over each
    // fingerprint's ≤|sources| set (the BasketPairs discipline —
    // never a fingerprint self-join), and the matrix rollup is
    // |sources|²-bounded. Oracle says list_*/string_split (DuckDB);
    // the Spark twin says array_*/split.
    Q("q_dedup_overlap",
      """WITH f AS (
        |  SELECT DISTINCT source,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(text, ' '))), ' ')) AS fp
        |  FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
        |GROUP BY a.source, b.source
        |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
      val f = Tables.documents(s, d)
        .select(col("source"),
          md5(array_join(array_sort(array_distinct(
            split(col("text"), " "))), " ")).as("fp"))
        .distinct()
      // posexplode + tail-slice explode: codegen GENERATEs instead of
      // the interpreted flatten∘transform∘struct chain (CoTradeGraph
      // rewrite); `ss` is a sorted SET, so the slice is exactly the
      // strictly-greater partner set — identical pair multiset
      f.groupBy("fp")
        .agg(array_sort(collect_set(col("source"))).as("ss"))
        .select(posexplode(col("ss")).as(Seq("__i", "src_a")), col("ss"))
        .select(col("src_a"),
          explode(slice(col("ss"), col("__i") + lit(2), size(col("ss"))))
            .as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).cast("long").as("n_shared"))
        .orderBy("src_a", "src_b")
    }
  )
}
