package graft.queries

import graft.core.{Dsl, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust-statistics and data-management shapes that operate on exact
  * sorted positions and key-partitioned diffs — the cleanup passes an
  * analytics corpus runs before anything downstream trusts the numbers.
  */
object StatQueries {

  val all: Seq[Q] = Seq(
    // Winsorization (percentile clipping): per supplier, clip
    // l_extendedprice into [p05, p95] and report raw vs clipped exact
    // sums plus the clip count — the standard outlier-taming pass before
    // any mean-based statistic. Percentiles are POSITIONAL (disc):
    // threshold = value at sorted position ceil(q·n), computed with pure
    // integer arithmetic ((q·n+99) div 100) so both engines pick the
    // identical element — no interpolation, no FP position math. The
    // value at a sorted position is well-defined under ties regardless
    // of tie order, so row_number nondeterminism cannot leak out.
    //
    // Scale shape: ONE data shuffle. The window pass (partitioned by
    // l_suppkey — high-cardinality, each group task-sized at any sf)
    // computes rn AND the two thresholds as unordered window aggregates
    // over the SAME partitioning — no threshold join, no second scan of
    // the fact (the naive ranked⨝thresholds form re-scans and re-sorts
    // lineitem for the threshold branch; PlanSpec pins this one out).
    // The final groupBy reuses the window's hash layout. An all-rows
    // global winsorize would instead route through HistogramRank
    // (q_agg_percentile's path) — per-key grouping is the common
    // production form.
    Q("q_stat_winsorize",
      """WITH ranked AS (
        |  SELECT l_suppkey, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_suppkey) AS n
        |  FROM lineitem),
        |w AS (
        |  SELECT l_suppkey, l_extendedprice, n,
        |    MAX(CASE WHEN rn = (5*n+99)//100 THEN l_extendedprice END)
        |      OVER (PARTITION BY l_suppkey) AS lo,
        |    MAX(CASE WHEN rn = (95*n+99)//100 THEN l_extendedprice END)
        |      OVER (PARTITION BY l_suppkey) AS hi
        |  FROM ranked)
        |SELECT l_suppkey, MAX(n) AS n,
        |  COUNT(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
        |             THEN 1 END) AS n_clipped,
        |  MIN(lo) AS lo, MIN(hi) AS hi,
        |  %SUMRAW% AS sum_raw,
        |  %SUMWINS% AS sum_wins
        |FROM w GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin
        .replace("%SUMRAW%", Dsl.d2dSql(Dsl.dsumSql("l_extendedprice")))
        .replace("%SUMWINS%", Dsl.d2dSql(
          Dsl.dsumSql("LEAST(GREATEST(l_extendedprice, lo), hi)")))) {
      (s, d) =>
        val li = Tables.lineitem(s, d).select("l_suppkey", "l_extendedprice")
        val byKey = Window.partitionBy("l_suppkey")
        val ranked = li
          .withColumn("rn", row_number().over(byKey.orderBy("l_extendedprice")))
          .withColumn("n", count(lit(1)).over(byKey))
        val atPos = (q: Int) =>
          max(when(col("rn") === expr(s"($q*n+99) div 100"),
            col("l_extendedprice"))).over(byKey)
        val w = ranked
          .withColumn("lo", atPos(5))
          .withColumn("hi", atPos(95))
        val wins = least(greatest(col("l_extendedprice"), col("lo")), col("hi"))
        w.groupBy("l_suppkey")
          .agg(
            max(col("n")).as("n"),
            count(when(col("l_extendedprice") < col("lo") ||
              col("l_extendedprice") > col("hi"), 1)).as("n_clipped"),
            min(col("lo")).as("lo"), min(col("hi")).as("hi"),
            Dsl.d2d(Dsl.dsum(col("l_extendedprice"))).as("sum_raw"),
            Dsl.d2d(Dsl.dsum(wins)).as("sum_wins"))
          .orderBy("l_suppkey")
    },

    // Snapshot diff — the CDC/migration primitive: given two table
    // snapshots, classify every key as added / removed / changed /
    // unchanged and account for the value drift, in ONE key-partitioned
    // full-outer join (both sides hash-shuffled on the key — the only
    // shape that survives two 100 TB snapshots; no broadcast, no sort of
    // either snapshot). Snapshots derive deterministically from orders so
    // the oracle sees byte-identical inputs: snapshot A drops keys
    // divisible by 89, snapshot B drops keys divisible by 97 and bumps
    // the price of keys divisible by 11 by an exact key-dependent DECIMAL
    // amount (all arithmetic in DECIMAL(12,4) — no FP drift can enter the
    // changed/unchanged classification). key_sum fingerprints WHICH keys
    // landed in each class, not just how many.
    Q("q_snapshot_diff",
      """WITH a AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,4)) AS p
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |b AS (
        |  SELECT o_orderkey AS k,
        |    CAST(o_totalprice AS DECIMAL(12,4)) +
        |      CASE WHEN o_orderkey % 11 = 0
        |           THEN CAST(o_orderkey % 5 + 1 AS DECIMAL(12,4))
        |           ELSE CAST(0 AS DECIMAL(12,4)) END AS p
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |d AS (
        |  SELECT COALESCE(a.k, b.k) AS k,
        |    CASE WHEN a.k IS NULL THEN 'added'
        |         WHEN b.k IS NULL THEN 'removed'
        |         WHEN a.p <> b.p THEN 'changed'
        |         ELSE 'unchanged' END AS status,
        |    CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL THEN b.p - a.p
        |         ELSE CAST(0 AS DECIMAL(12,4)) END AS delta
        |  FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT status, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum,
        |  %DELTA% AS delta_sum
        |FROM d GROUP BY status ORDER BY status""".stripMargin
        .replace("%DELTA%", Dsl.d2dSql("SUM(delta)"))) { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(Dsl.DFac).as("p"))
      val a = o.filter(col("k") % 89 =!= 0)
      val b = o.filter(col("k") % 97 =!= 0)
        .withColumn("p", col("p") +
          when(col("k") % 11 === 0, (col("k") % 5 + 1).cast(Dsl.DFac))
            .otherwise(lit(0).cast(Dsl.DFac)))
        .withColumnRenamed("k", "bk").withColumnRenamed("p", "bp")
      a.join(b, col("k") === col("bk"), "full_outer")
        .select(
          coalesce(col("k"), col("bk")).as("dk"),
          when(col("k").isNull, "added")
            .when(col("bk").isNull, "removed")
            .when(col("p") =!= col("bp"), "changed")
            .otherwise("unchanged").as("status"),
          when(col("k").isNotNull && col("bk").isNotNull, col("bp") - col("p"))
            .otherwise(lit(0).cast(Dsl.DFac)).as("delta"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"),
          sum(col("dk")).cast("long").as("key_sum"),
          Dsl.d2d(sum(col("delta"))).as("delta_sum"))
        .orderBy("status")
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // quality-weighted subsampling — the pretrain "sample the corpus
    // proportional to doc quality" op. Each row gets priority
    // ln(u)/w with u a DETERMINISTIC md5-derived uniform (so the sample
    // is reproducible run to run and engine-checkable against the
    // in-JVM reference in SampleSpec); the k largest priorities are the
    // sample. Distributed shape: row-local priority + TakeOrdered top-k
    // — no shuffle of the corpus, no per-row RNG state. ln lives only in
    // this cap (banned from oracle SQL — libm divergence; SampleSpec is
    // same-JVM so equality is exact).
    Q.cap("cap_sample_weighted") { (s, d) =>
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("double") / lit(4503599627370496.0) // / 2^52 → uniform [0,1)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (log(u) / col("n_chars")).as("priority"))
        .orderBy(desc("priority"), col("doc_id"))
        .limit(100)
    }
  )
}
