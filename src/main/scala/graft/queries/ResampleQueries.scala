package graft.queries

import graft.core.{Dsl, Q, Tables}
import graft.core.Dsl.{d2d, d2dSql, dsum, dsumSql, hex6, hex6Sql}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Seeded resampling statistics — bootstrap confidence bounds and a
  * randomization (permutation-style) test — with every replicate drawn
  * from md5, so the "random" resamples are bit-identical in Spark and
  * DuckDB and the whole Monte-Carlo procedure is ORACLE-HASHED, not
  * tolerance-gated. The engines' native hex converters don't
  * cross-parse, so the seeded-uniform primitive is [[Dsl.hex6Sql]]
  * (positional ascii arithmetic over the first 6 md5 hex digits).
  *
  * Scale shape: a replicate spine (VALUES list — B rows) CROSS JOIN the
  * data is B·n rows flowing through one hash + one equi-join + one
  * combinable aggregate; no replicate ever materializes on the driver,
  * and B·n parallelizes like any fact-table scan. All statistics stay
  * in exact arithmetic: replicate MEANS are compared via their exact
  * DECIMAL sums (same n ⇒ same order), and mean DIFFERENCES via
  * cross-multiplied integer cents in DECIMAL(38,0) — no FP division
  * anywhere, which is what makes a Monte-Carlo procedure hashable at
  * all.
  */
object ResampleQueries {

  private val B = 32 // bootstrap replicates
  private val BP = 64 // permutation relabels

  private def valuesSpine(n: Int, col: String): String =
    (1 to n).map(i => s"($i)").mkString("(VALUES ", ",", s") AS t($col)")

  val all: Seq[Q] = Seq(

    // Bootstrap CI for the mean: B=32 replicates, each drawing n rows
    // WITH REPLACEMENT via idx = hex6(md5(r:pos)) % n + 1, joined back
    // to the ROW_NUMBER-indexed table. Because every replicate has
    // exactly n draws, ordering replicate MEANS ≡ ordering replicate
    // SUMS — so the emitted order statistics (ranks 2/16/31 of 32 ≈
    // 5th/50th/97th percentile) are exact DECIMAL sums, d2d'd. Row 0 is
    // the observed (non-resampled) sum. The ~0.9 % modulo bias of
    // 16⁶ % n is part of the DEFINED draw, identical in both engines.
    Q("q_stat_bootstrap",
      s"""WITH c AS (
        |  SELECT CAST(c_acctbal AS DECIMAL(12,2)) AS a,
        |    ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn
        |  FROM customer),
        |nn AS (SELECT COUNT(*) AS n FROM c),
        |reps AS (SELECT r FROM ${valuesSpine(B, "r")}),
        |hs AS (
        |  SELECT reps.r, md5(CONCAT(reps.r, ':', c.rn)) AS h
        |  FROM reps CROSS JOIN c),
        |draws AS (
        |  SELECT r, ${hex6Sql("h")} % nn.n + 1 AS idx
        |  FROM hs CROSS JOIN nn),
        |boots AS (
        |  SELECT d.r, ${dsumSql("c2.a")} AS s
        |  FROM draws d JOIN c c2 ON c2.rn = d.idx GROUP BY d.r),
        |ranked AS (
        |  SELECT s, CAST(ROW_NUMBER() OVER (ORDER BY s, r) AS BIGINT) AS rk
        |  FROM boots)
        |SELECT rk AS tag, ${d2dSql("s")} AS boot_sum
        |FROM ranked WHERE rk IN (2, 16, 31)
        |UNION ALL
        |SELECT CAST(0 AS BIGINT), ${d2dSql(dsumSql("a"))} FROM c
        |ORDER BY tag""".stripMargin) { (s, d) =>
      // the 1..n draw index is a GLOBAL rank — routed through
      // HistogramRank (size-routed: plain bounded sort here, histogram
      // decomposition at scale) instead of a single-task global window
      val c = graft.operators.HistogramRank.withGlobalRank(
          Tables.customer(s, d).select(col("c_custkey"),
            col("c_acctbal").cast(DecimalType(12, 2)).as("a")),
          "c_custkey", Seq("c_custkey"), "rn")
        .select(col("a"), col("rn"))
      val nF = broadcast(c.agg(count(lit(1)).as("n")))
      val reps = s.range(1, B + 1).select(col("id").as("r"))
      val hs = reps.crossJoin(c.select("rn"))
        .select(col("r"), md5(concat(col("r").cast("string"), lit(":"),
          col("rn").cast("string"))).as("h"))
      val draws = hs.crossJoin(nF)
        .select(col("r"), (hex6(col("h")) % col("n") + 1).as("idx"))
      val boots = draws
        .join(c.select(col("rn").as("idx"), col("a")), "idx")
        .groupBy("r").agg(dsum(col("a")).as("s"))
      val ranked = boots.select(col("s"),
        row_number().over(Window.orderBy(col("s"), col("r")))
          .cast("long").as("rk"))
      ranked.where(col("rk").isin(2L, 16L, 31L))
        .select(col("rk").as("tag"), d2d(col("s")).as("boot_sum"))
        .unionAll(c.agg(d2d(dsum(col("a"))).as("boot_sum"))
          .select(lit(0L).as("tag"), col("boot_sum")))
        .orderBy("tag")
    },

    // Randomization test for a mean difference (BUILDING-segment
    // account balance vs the rest): BP=64 seeded Bernoulli relabels,
    // each splitting the rows via hex6(md5(r:key)) % 2 and recomputing
    // the group sums/counts. Significance = how many relabeled
    // |mean diffs| reach the observed |mean diff| — compared WITHOUT
    // division via cross-multiplication in integer cents, promoted to
    // DECIMAL(38,0) exactly as the products near 1e26 require. Emits
    // the exceed count, B, and the observed sufficient statistics.
    Q("q_stat_permutation",
      s"""WITH c AS (
        |  SELECT c_custkey AS k,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
        |  FROM customer),
        |obs AS (
        |  SELECT CAST(SUM(CASE WHEN g = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(SUM(g) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN g = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0,
        |    CAST(SUM(1 - g) AS BIGINT) AS n0
        |  FROM c),
        |reps AS (SELECT r FROM ${valuesSpine(BP, "r")}),
        |hs AS (
        |  SELECT reps.r, c.cents, md5(CONCAT(reps.r, ':', c.k)) AS h
        |  FROM reps CROSS JOIN c),
        |rel AS (SELECT r, cents, ${hex6Sql("h")} % 2 AS g FROM hs),
        |perm AS (
        |  SELECT r,
        |    CAST(SUM(CASE WHEN g = 1 THEN cents ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(SUM(g) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN g = 0 THEN cents ELSE 0 END) AS BIGINT) AS s0,
        |    CAST(SUM(1 - g) AS BIGINT) AS n0
        |  FROM rel GROUP BY r)
        |SELECT
        |  CAST(SUM(CASE WHEN
        |    CAST(ABS(p.s1 * p.n0 - p.s0 * p.n1) AS DECIMAL(38,0))
        |      * CAST(o.n1 * o.n0 AS DECIMAL(38,0))
        |    >= CAST(ABS(o.s1 * o.n0 - o.s0 * o.n1) AS DECIMAL(38,0))
        |      * CAST(p.n1 * p.n0 AS DECIMAL(38,0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
        |  CAST(COUNT(*) AS BIGINT) AS n_reps,
        |  o.s1 AS obs_s1, o.n1 AS obs_n1, o.s0 AS obs_s0, o.n0 AS obs_n0
        |FROM perm p CROSS JOIN obs o
        |GROUP BY o.s1, o.n1, o.s0, o.n0""".stripMargin) { (s, d) =>
      val D38 = DecimalType(38, 0)
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("k"),
          (col("c_acctbal").cast(DecimalType(12, 2)) * 100)
            .cast("long").as("cents"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("g"))
      def stats(df: DataFrame, keys: Seq[String]): DataFrame =
        df.groupBy(keys.map(col): _*).agg(
          sum(when(col("g") === 1, col("cents")).otherwise(0L))
            .cast("long").as("s1"),
          sum(col("g")).cast("long").as("n1"),
          sum(when(col("g") === 0, col("cents")).otherwise(0L))
            .cast("long").as("s0"),
          sum(lit(1L) - col("g")).cast("long").as("n0"))
      val obs = broadcast(stats(c, Nil).select(
        col("s1").as("os1"), col("n1").as("on1"),
        col("s0").as("os0"), col("n0").as("on0")))
      val reps = s.range(1, BP + 1).select(col("id").as("r"))
      val rel = reps.crossJoin(c)
        .select(col("r"), col("cents"),
          (hex6(md5(concat(col("r").cast("string"), lit(":"),
            col("k").cast("string")))) % 2).as("g"))
      val perm = stats(rel, Seq("r"))
      perm.crossJoin(obs)
        .agg(
          sum(when(
            abs(col("s1") * col("n0") - col("s0") * col("n1")).cast(D38)
              * (col("on1") * col("on0")).cast(D38)
              >= abs(col("os1") * col("on0") - col("os0") * col("on1")).cast(D38)
              * (col("n1") * col("n0")).cast(D38), 1L).otherwise(0L))
            .cast("long").as("n_exceed"),
          count(lit(1)).as("n_reps"),
          first("os1").as("obs_s1"), first("on1").as("obs_n1"),
          first("os0").as("obs_s0"), first("on0").as("obs_n0"))
    }
  )
}
