package graft

import graft.operators.DedupGroups
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Connected-component dedup grouping must match a union-find ground
  * truth — including transitive closure across pairs that never co-occur.
  */
class DedupSpec extends SparkSuite {

  private def unionFindMinLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val members = parent.keys.toSeq.groupBy(find)
    members.flatMap { case (_, vs) => val m = vs.min; vs.map(_ -> m) }.toMap
  }

  test("transitive chain collapses to one group; isolated docs untouched") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val comp = DedupGroups.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("doc_id")
    val kept = DedupGroups.dropDuplicates(docs, pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 99L))
  }

  test("pointer jumping converges on a 40-long chain within the round budget") {
    import spark.implicits._
    // plain one-hop propagation would need 39 rounds (> maxIters);
    // jumping halves chains per round → ~6
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("d1", "d2")
    val comp = DedupGroups.components(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 40 && comp.values.toSet == Set(0L))
  }

  test("components == union-find ground truth on real simhash pairs") {
    val pairs = SparkEntry.queries("q_dedup_simhash")(spark, sf("0.01"))
      .select("d1", "d2")
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = unionFindMinLabels(edges)
    val got = DedupGroups.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("cap_pipeline_clean: monotone retention through the cleaning stages") {
    val out = SparkEntry.queries("cap_pipeline_clean")(spark, sf("0.01"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet ==
      Set("0_raw", "1_quality", "2_exact_dedup", "3_neardup_dedup"))
    assert(out("0_raw") >= out("1_quality"))
    assert(out("1_quality") >= out("2_exact_dedup"))
    assert(out("2_exact_dedup") >= out("3_neardup_dedup"))
    assert(out("3_neardup_dedup") > 0)
    info(s"retention: $out")
  }

  test("cap_dedup_groups emits scalar per-group stats") {
    val out = SparkEntry.queries("cap_dedup_groups")(spark, sf("0.001"))
    assert(out.columns.toSeq == Seq("group_id", "n_docs", "max_doc"))
    assert(out.count() > 0)
    // every group's min member IS its id (canonical representative)
    assert(out.filter(col("group_id") > col("max_doc")).count() == 0)
  }
}
