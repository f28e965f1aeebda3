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
      // the mark is scoped PER WRITER (txnAppId pattern): the sink
      // recorded the running query's id, not the table-global mark
      assert(snap.txns.size == 1 && snap.txns.values.head >= 1L,
        s"per-query high-water mark must track batch ids, got ${snap.txns}")
      val queryTxn = snap.txns.keys.head
      // replay contract: re-delivering an already-committed id UNDER
      // THE SAME WRITER commits nothing (the foreachBatch retry shape
      // after a sink/offset crash)
      val replayed = ManifestTable.appendBatch(spark, dir,
        Seq((9L, "dup")).toDF("k", "v"), batchId = 0L, Some(queryTxn))
      assert(replayed.version == snap.version,
        "replayed batch id must be a structural no-op")
      assert(ManifestTable.read(spark, dir).count() == 3L)
      // and a DIFFERENT writer restarting at batch 0 lands — the
      // pre-r15 global mark silently dropped it
      ManifestTable.appendBatch(spark, dir,
        Seq((10L, "other")).toDF("k", "v"), batchId = 0L, Some("other-q"))
      assert(ManifestTable.read(spark, dir).count() == 4L,
        "a second writer's batch 0 must not be dropped")
    } finally q.stop()
  }

  test("micro-batch commit cost is BATCH-sized, not table-sized: a " +
    "batch landing on a many-file table writes a KB-scale log record") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = freshDir("bcost")
    val ckpt = freshDir("bcost_ckpt")
    // pre-load the table with 40 live files — the streaming sink's
    // per-batch commit must not re-serialize their listing
    ManifestTable.create(spark, dir,
      (1L to 4000L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(40, org.apache.spark.sql.functions.col("k")),
      statsCols = Seq("k"))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "v")
      .writeStream.format("graft")
      .option("path", dir).option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((9001L, "b0"))
      q.processAllAvailable()
      mem.addData((9002L, "b1"))
      q.processAllAvailable()
    } finally q.stop()
    val lp = new org.apache.hadoop.fs.Path(dir, "_graft_log")
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sizes = fs.listStatus(lp)
      .map(s => s.getPath.getName -> s.getLen).toMap
    val createBytes = sizes("v00000000000000000000.json")
    Seq(1L, 2L).foreach { v =>
      val b = sizes(f"v$v%020d.json")
      assert(b < 4096, s"batch commit record is $b B — table-sized?")
      assert(b * 5 < createBytes,
        s"batch record $b B vs 40-file listing $createBytes B")
    }
    assert(ManifestTable.read(spark, dir).count() == 4002L)
  }

  test("maxFilesPerTrigger rate-limits the table source: a backlog " +
    "drains over several micro-batches instead of one, nothing lost") {
    import spark.implicits._
    val src = freshDir("rl_src")
    val dst = freshDir("rl_dst")
    val ckpt = freshDir("rl_ckpt")
    // backlog: 6 commits of one file each BEFORE the stream starts
    ManifestTable.create(spark, src,
      Seq((0L, "v0")).toDF("k", "v"), statsCols = Seq("k"))
    (1L to 5L).foreach { i =>
      ManifestTable.append(spark, src, Seq((i, s"v$i")).toDF("k", "v"))
    }
    val q = spark.readStream.format("graft")
      .option("path", src).option("startingVersion", "0")
      .option("maxFilesPerTrigger", "2").load()
      .writeStream.format("graft")
      .option("path", dst).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    // every row arrived…
    val got = ManifestTable.read(spark, dst).select("k").collect()
      .map(_.getLong(0)).toSet
    assert(got == (0L to 5L).toSet)
    // …across SEVERAL sink commits (each micro-batch is one commit;
    // 6 backlogged files at ≤2 per trigger ⇒ at least 3 batches)
    val appendCommits = ManifestTable.history(spark, dst)
      .count(_.operation.startsWith("append@batch="))
    assert(appendCommits >= 3,
      s"expected the backlog to drain over >=3 batches, got $appendCommits")
  }

  test("maxFilesPerTrigger rate-limits the CHANGEFEED source too: a " +
    "deep commit backlog (appends + a delete) drains over several " +
    "micro-batches with the full CDC row set intact") {
    import spark.implicits._
    val src = freshDir("rlcf_src")
    val sink = freshDir("rlcf_sink")
    val ckpt = freshDir("rlcf_ckpt")
    ManifestTable.create(spark, src,
      Seq((0L, "v0")).toDF("k", "v"), statsCols = Seq("k"))
    (1L to 4L).foreach { i =>
      ManifestTable.append(spark, src, Seq((i, s"v$i")).toDF("k", "v"))
    }
    ManifestTable.delete(spark, src, col("k") === 2L) // D + rewrite
    val q = spark.readStream.format("graft-changefeed")
      .option("path", src).option("maxFilesPerTrigger", "2").load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val feed = spark.read.parquet(sink)
    // net content: I-rows minus D-rows per key reproduce the post-v0
    // delta (startingVersion=0 streams deltas AFTER the create — the
    // documented horizon contract; k=0 is base content, read batch-side)
    val net = feed.groupBy("k", "v")
      .agg(sum(when(col("_change") === "I", 1).otherwise(-1)).as("n"))
      .where(col("n") > 0).select("k").collect().map(_.getLong(0)).toSet
    assert(net == Set(1L, 3L, 4L))
    // drained over SEVERAL micro-batches (≥3 for the changed files at ≤2)
    val batches = spark.read.json(s"$ckpt/offsets/*").count()
    assert(batches >= 3,
      s"changefeed backlog should drain over >=3 triggers, got $batches")
    // per-commit granularity survived the throttle (v1..v5)
    assert(feed.select("_commit_version").distinct().count() == 5L)
  }

  test("autoCompactAt keeps streaming ingest's file count bounded: the " +
    "breaching batch triggers one bin-packing commit, contents exact") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = freshDir("ac")
    val ckpt = freshDir("ac_ckpt")
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "v")
      .writeStream.format("graft")
      .option("path", dir).option("checkpointLocation", ckpt)
      .option("autoCompactAt", "4")
      .start()
    try {
      (0L until 10L).foreach { i =>
        mem.addData((i, s"b$i"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val head = ManifestTable.snapshot(spark, dir)
    assert(head.files.size < 10,
      s"auto-compaction must bound the file count, got ${head.files.size}")
    assert(ManifestTable.history(spark, dir)
      .exists(_.operation == "compact"),
      "a compact commit must appear in the history")
    assert(ManifestTable.read(spark, dir).count() == 10L)
    assert(ManifestTable.read(spark, dir).select("k").collect()
      .map(_.getLong(0)).toSet == (0L until 10L).toSet)
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

  test("readStream.format(graft): a table streams its appends " +
    "(manifest-priced); a rewrite commit fails the append-only " +
    "contract unless ignoreChanges; table->stream->table round trip") {
    import spark.implicits._
    val src = freshDir("ssrc")
    val dst = freshDir("sdst")
    val ckpt = freshDir("sckpt")
    ManifestTable.create(spark, src,
      (1L to 5L).map(i => (i, s"v$i")).toDF("k", "v"),
      statsCols = Seq("k"))
    // stream the SOURCE TABLE's appends into a SECOND graft table:
    // both ends of the pipeline are manifest tables
    val q = spark.readStream.format("graft")
      .option("path", src).option("startingVersion", "0").load()
      .writeStream.format("graft")
      .option("path", dst).option("checkpointLocation", ckpt)
      .option("statsCols", "k")
      .start()
    try {
      q.processAllAvailable()
      ManifestTable.append(spark, src,
        (6L to 8L).map(i => (i, s"v$i")).toDF("k", "v"))
      q.processAllAvailable()
      val got = ManifestTable.read(spark, dst).select("k").collect()
        .map(_.getLong(0)).toSet
      assert(got == (1L to 8L).toSet,
        s"dst table must hold every appended row, got $got")
    } finally q.stop()
    // a rewrite commit breaks the append-only contract loudly
    ManifestTable.delete(spark, src, col("k") === 2L)
    val q2 = spark.readStream.format("graft")
      .option("path", src).option("startingVersion", "0").load()
      .writeStream.format("memory").queryName("gsrc_fail")
      .option("checkpointLocation", freshDir("sckpt2")).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable(); q2.awaitTermination(10000)
    }
    q2.stop()
    assert(err.getMessage.contains("append-only") ||
      String.valueOf(err.getCause).contains("append-only"))
    // ignoreChanges streams the rewritten commit's added files
    val q3 = spark.readStream.format("graft")
      .option("path", src).option("startingVersion", "0")
      .option("ignoreChanges", "true").load()
      .writeStream.format("memory").queryName("gsrc_ok")
      .option("checkpointLocation", freshDir("sckpt3")).start()
    try {
      q3.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM gsrc_ok").head().getLong(0)
      assert(n >= 7L, s"ignoreChanges must stream through, got $n rows")
    } finally q3.stop()
  }
}
