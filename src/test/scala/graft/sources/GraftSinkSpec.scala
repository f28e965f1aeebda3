package graft.sources

import graft.SparkSuite
import graft.table.ManifestTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Laws of `writeStream.format("graft")`: each micro-batch is one
  * atomic table commit, replayed batch ids are structural no-ops
  * (exactly-once), merge mode rides mergeBatch, and the first batch
  * creates the table with the layout options. */
class GraftSinkSpec extends SparkSuite {

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"gsink_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("append mode: a real streaming query lands micro-batches as " +
    "commits; restart-style replay of a batch id is a no-op") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = freshDir("app")
    val ckpt = freshDir("app_ckpt")
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "v")
      .writeStream.format("graft")
      .option("path", dir).option("checkpointLocation", ckpt)
      .option("statsCols", "k")
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      val snap = ManifestTable.snapshot(spark, dir)
      assert(snap.statsCols == Seq("k"), "layout option applied at create")
      assert(ManifestTable.read(spark, dir).count() == 3L)
      assert(snap.lastBatch >= 1L, "high-water mark must track batch ids")
      // replay contract: re-delivering an already-committed id commits
      // nothing (the foreachBatch retry shape after a sink/offset crash)
      val replayed = ManifestTable.appendBatch(spark, dir,
        Seq((9L, "dup")).toDF("k", "v"), batchId = 0L)
      assert(replayed.version == snap.version,
        "replayed batch id must be a structural no-op")
      assert(ManifestTable.read(spark, dir).count() == 3L)
    } finally q.stop()
  }

  test("merge mode: latest-wins CDC per micro-batch with exactly-once " +
    "ids; 'D' op deletes") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = freshDir("mrg")
    val ckpt = freshDir("mrg_ckpt")
    val mem = MemoryStream[(Long, String, String)]
    val q = mem.toDF().toDF("k", "v", "_op")
      .writeStream.format("graft")
      .option("path", dir).option("checkpointLocation", ckpt)
      .option("mode", "merge").option("key", "k").option("opCol", "_op")
      .option("statsCols", "k")
      .start()
    try {
      mem.addData((1L, "a", "U"), (2L, "b", "U"))
      q.processAllAvailable()
      mem.addData((1L, "a2", "U"), (2L, "", "D"), (3L, "c", "U"))
      q.processAllAvailable()
      val got = ManifestTable.read(spark, dir)
        .select("k", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a2"), (3L, "c")),
        s"merge-mode sink must apply latest-wins CDC, got $got")
    } finally q.stop()
  }
}
