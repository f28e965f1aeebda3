package graft.operators

import org.apache.spark.sql.DataFrame

/** Batch incremental upsert by natural key — the reference's daily-index
  * build pattern (new filings replace prior versions of the same
  * accession number; SURVEY §3.1 [R] incremental update).
  *
  * `incoming` wins on key collision; rows of `existing` with no incoming
  * replacement survive via anti-join. At 100 TB both sides shuffle on the
  * natural key once — or not at all if the warehouse table is bucketed on
  * it ([[BucketedLayout]]). The streaming twin is
  * [[graft.streaming.StreamOps.jdbcUpsertBatch]].
  */
object IncrementalLoad {

  def upsert(existing: DataFrame, incoming: DataFrame, key: String): DataFrame =
    incoming.unionByName(
      existing.join(incoming.select(key).distinct(), Seq(key), "left_anti"))
}
