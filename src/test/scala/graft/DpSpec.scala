package graft

import graft.operators.DpRelease
import org.apache.spark.sql.functions._

/** Laws of the seeded DP release mechanism (the ScalaTest-gated half of
  * the clip → scale → add story; the exact clipping half is oracle-gated
  * as q_privacy_clipped). */
class DpSpec extends SparkSuite {

  private def groups(n: Int) = {
    import spark.implicits._
    (1 to n).flatMap(g => Seq.fill(g % 13 + 1)(s"g$g")).toDF("grp")
      .withColumn("unit", monotonically_increasing_id() % 7)
  }

  private def rel(eps: Double, seed: String, n: Int = 40) =
    DpRelease.release(
      DpRelease.clippedCounts(groups(n), "grp", "unit", cap = 8L),
      "grp", eps, seed, cap = 8L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

  test("clippedCounts: clip bounds every unit at cap and accounts the " +
    "discarded mass exactly") {
    import spark.implicits._
    // unit u1 contributes 12 (clips to 8, loss 4); u2 contributes 3
    val df = (Seq.fill(12)(("a", "u1")) ++ Seq.fill(3)(("a", "u2")) ++
      Seq.fill(2)(("b", "u1"))).toDF("grp", "unit")
    val got = DpRelease.clippedCounts(df, "grp", "unit", cap = 8L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((11L, 15L, 2L, 4L))) // clipped, raw, units, loss
    assert(got("b") == ((2L, 2L, 1L, 0L)))
  }

  test("release is seed-deterministic and seed-sensitive") {
    val a = rel(1.0, "seed-A")
    val b = rel(1.0, "seed-A")
    val c = rel(1.0, "seed-B")
    assert(a == b, "same seed must reproduce the identical release")
    assert(a.exists { case (g, (_, n, _)) => c(g)._2 != n },
      "a different seed must move at least one noise draw")
  }

  test("noise scales exactly as 1/epsilon for a fixed seed") {
    val e1 = rel(1.0, "s")
    val e2 = rel(2.0, "s")
    e1.foreach { case (g, (_, n1, _)) =>
      assert(e2(g)._2 == n1 / 2.0, s"group $g: ${e2(g)._2} != ${n1 / 2.0}")
    }
  }

  test("released = clipped + noise, and every draw is finite") {
    rel(0.5, "fin", n = 200).foreach { case (g, (c, n, r)) =>
      assert(!n.isNaN && !n.isInfinite, s"non-finite draw for $g")
      assert(r == c.toDouble + n, s"released mismatch for $g")
    }
  }

  test("draw distribution matches Laplace(b = cap/eps): mean |noise| " +
    "near b, signs balanced, mean near zero") {
    val b = 8.0 // eps = 1, cap = 8
    val draws = rel(1.0, "dist", n = 500).values.map(_._2).toSeq
    assert(draws.size >= 400)
    val meanAbs = draws.map(math.abs).sum / draws.size
    assert(meanAbs > 0.75 * b && meanAbs < 1.25 * b,
      s"E|noise| = $meanAbs, expected ≈ $b")
    val posFrac = draws.count(_ > 0).toDouble / draws.size
    assert(posFrac > 0.4 && posFrac < 0.6, s"sign balance $posFrac")
    val mean = draws.sum / draws.size
    assert(math.abs(mean) < 0.25 * b, s"mean $mean not centered")
  }
}
