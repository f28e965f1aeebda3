package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SpaceSaving heavy hitters as a typed [[Aggregator]] — the mergeable
  * top-k sketch for frequency estimation when the key domain is too wide
  * to groupBy exactly (the 100 TB "top terms / top URLs / hottest keys"
  * primitive).
  *
  * Why an Aggregator and not mapPartitions: Spark plans a typed
  * Aggregator like any other aggregate — a PARTIAL pass on the scan side
  * (each task folds its rows into one m-entry summary) and a FINAL merge
  * of one summary per task. Nothing data-sized crosses the wire: the
  * shuffle payload is #partitions × m entries, independent of row count.
  *
  * Merge rule (mergeable-summaries form): a key absent from one summary
  * may have occurred up to that summary's minimum count before eviction,
  * so its estimate contributes `min(other)` to both the merged count and
  * the merged error; the union is then truncated back to the m largest.
  * Invariants preserved end to end (and asserted in SketchSpec):
  * `est ≥ true ≥ est − err`, and any key whose true count exceeds the
  * largest reported error is guaranteed present in the summary.
  *
  * Determinism: ties break lexicographically on the key at every
  * eviction and truncation, but per-partition fold ORDER still shapes the
  * summary, so the sketch output (like any approximate sketch — see
  * cap_agg_approx) is gated by its invariants, not by a bit-equal oracle.
  */
object HeavyHitters {

  /** summary entry: estimated count + overestimation bound. */
  type Summary = Map[String, (Long, Long)]

  final class SpaceSavingAgg(m: Int)
      extends Aggregator[String, Summary, Seq[(String, Long, Long)]] {

    private def minCount(s: Summary): Long =
      if (s.size < m) 0L else s.valuesIterator.map(_._1).min

    override def zero: Summary = Map.empty

    override def reduce(s: Summary, key: String): Summary =
      s.get(key) match {
        case Some((c, e)) => s.updated(key, (c + 1, e))
        case None if s.size < m => s.updated(key, (1L, 0L))
        case None =>
          // evict the minimum-count entry (tie: lexicographically largest
          // key goes, so the surviving set is deterministic per fold order)
          val (evictKey, (minC, _)) =
            s.minBy { case (k, (c, _)) => (c, k) }(
              Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
          (s - evictKey).updated(key, (minC + 1, minC))
      }

    override def merge(a: Summary, b: Summary): Summary = {
      val minA = minCount(a)
      val minB = minCount(b)
      val union = (a.keySet ++ b.keySet).iterator.map { k =>
        val (ca, ea) = a.getOrElse(k, (minA, minA))
        val (cb, eb) = b.getOrElse(k, (minB, minB))
        k -> (ca + cb, ea + eb)
      }.toMap
      if (union.size <= m) union
      else union.toSeq
        .sortBy { case (k, (c, _)) => (-c, k) }
        .take(m).toMap
    }

    override def finish(s: Summary): Seq[(String, Long, Long)] =
      s.toSeq.map { case (k, (c, e)) => (k, c, e) }
        .sortBy { case (k, c, _) => (-c, k) }

    override def bufferEncoder: Encoder[Summary] =
      Encoders.kryo[Map[String, (Long, Long)]]
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form: `heavyHitters(16)(col("term"))` aggregates a string
    * column into the top-m sketch entries (array of structs — callers
    * explode and flatten before the frame leaves the engine). */
  def heavyHitters(m: Int): Column => Column = {
    val fn = udaf(new SpaceSavingAgg(m))
    c => fn(c)
  }
}
