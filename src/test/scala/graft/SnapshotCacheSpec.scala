package graft.table

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Laws of the BOUNDED plan-time metadata path (round-16 headline):
  * the per-(dir, version) snapshot cache, the columnar (parquet)
  * checkpoint, and their observability.
  *
  *  - ZERO-PARSE second read: planning against an UNCHANGED table
  *    reconstructs nothing — no checkpoint load, no delta parse (the
  *    read-counter law the round-15 verdict asked for); one commit
  *    later costs exactly one tiny delta parse;
  *  - the cache can never serve a DROPPED-and-RECREATED table the old
  *    content (the per-version file fingerprint in the key);
  *  - columnar checkpoints round-trip EVERY FileEntry field (stats,
  *    partition values, row groups) and reconstruction through one is
  *    identical to the pure delta-chain replay;
  *  - legacy single-JSON checkpoints (and pre-delta-log full-manifest
  *    v-files) still read — including the vacuumed-under-old-code
  *    layout with NO c-files and the early v-files gone, which must
  *    replay from the lowest RETAINED version, never from v0;
  *  - a failed checkpoint write is LOUD (counted + logged) and
  *    harmless (the table keeps reading; the replay suffix just grows
  *    until the next checkpoint lands);
  *  - exactly-once survives the global-mark → per-writer-txn upgrade:
  *    a pre-upgrade streaming query's first post-upgrade restart does
  *    not double-commit its replayed batch. */
class SnapshotCacheSpec extends SparkSuite {

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"snapcache_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def kv(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def content(dir: String): Set[(Long, String)] =
    ManifestTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def parses(): (Long, Long) =
    (graft.table.ManifestTable.checkpointLoads.get(),
      graft.table.ManifestTable.deltaParses.get())

  test("zero-parse second read: planning against an unchanged table " +
    "hits the snapshot cache — no checkpoint load, no delta parse; one " +
    "commit later costs exactly one delta parse") {
    val dir = freshDir("law")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a", 2L -> "b")),
      statsCols = Seq("k"))
    ManifestTable.append(spark, dir, kv(Seq(3L -> "c")))
    ManifestTable.clearSnapshotCache()
    assert(content(dir) == Set(1L -> "a", 2L -> "b", 3L -> "c")) // cold
    val (ck0, d0) = parses()
    assert(content(dir) == Set(1L -> "a", 2L -> "b", 3L -> "c")) // warm
    ManifestTable.snapshot(spark, dir) // and a catalog-style plan
    val (ck1, d1) = parses()
    assert(ck1 == ck0 && d1 == d0,
      s"second plan against an unchanged table parsed something: " +
        s"checkpoints +${ck1 - ck0}, deltas +${d1 - d0}")
    // one commit: publish seeds the cache, so even the NEXT read stays
    // parse-free; a cache cleared in between pays exactly one delta
    // (the warm-start probe finds the cached parent)
    ManifestTable.append(spark, dir, kv(Seq(4L -> "d")))
    val (ck2, d2) = parses()
    ManifestTable.snapshot(spark, dir)
    val (ck3, d3) = parses()
    assert(ck3 == ck2 && d3 == d2, "read after own commit reconstructed")
  }

  test("cache safety: a table dropped and recreated at the SAME path " +
    "never answers with the old content") {
    val dir = freshDir("recreate")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "old")))
    assert(content(dir) == Set(1L -> "old"))
    fs.delete(new Path(dir), true)
    ManifestTable.create(spark, dir, kv(Seq(2L -> "new")))
    assert(content(dir) == Set(2L -> "new"),
      "stale snapshot served for a recreated table")
    assert(ManifestTable.snapshot(spark, dir).files.nonEmpty)
  }

  test("columnar checkpoint: full field round-trip and legacy JSON " +
    "checkpoint compatibility") {
    val dir = freshDir("roundtrip")
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    try {
      hc.setInt("parquet.block.size", 16 * 1024)
      import spark.implicits._
      val df = (1L to 20000L).map(i => (i, i % 3, s"pad-$i-" + "x" * 32))
        .toDF("k", "p", "v")
      ManifestTable.create(spark, dir, df, statsCols = Seq("k"),
        partitionCols = Seq("p"))
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
    }
    // a DV and a rename so the seal's non-file metadata is exercised too
    ManifestTable.deleteVector(spark, dir, col("k") === 17L)
    ManifestTable.renameColumn(spark, dir, "v", "txt")
    val committed = ManifestTable.checkpoint(spark, dir)
    assert(committed.files.exists(_.rgs.size > 1),
      "fixture must have a multi-row-group file")
    assert(committed.files.forall(_.partitions.contains("p")))
    val lp = new Path(dir, "_graft_log")
    val seal = fs.listStatus(lp).map(_.getPath.getName)
      .filter(n => n.startsWith("c") && n.endsWith(".json"))
    assert(seal.nonEmpty, "no checkpoint seal written")
    assert(fs.listStatus(lp).map(_.getPath.getName)
      .exists(_.endsWith(".files.parquet")), "no columnar files listing")
    // cold reconstruction THROUGH the checkpoint
    ManifestTable.clearSnapshotCache()
    val viaCk = ManifestTable.snapshot(spark, dir)
    // pure delta-chain replay (checkpoint removed)
    seal.foreach(n => fs.delete(new Path(lp, n), false))
    fs.listStatus(lp).map(_.getPath.getName)
      .filter(_.endsWith(".files.parquet"))
      .foreach(n => fs.delete(new Path(lp, n), false))
    ManifestTable.clearSnapshotCache()
    val viaReplay = ManifestTable.snapshot(spark, dir)
    assert(viaCk == viaReplay,
      "checkpoint reconstruction diverged from the delta replay")
    // legacy single-JSON checkpoint at the same version still reads
    val legacy = ManifestTable.renderCheckpoint(viaReplay)
    val legacyName = f"c${viaReplay.version}%020d.json"
    val out = fs.create(new Path(lp, legacyName), true)
    try out.write(legacy.getBytes("UTF-8")) finally out.close()
    ManifestTable.clearSnapshotCache()
    val viaLegacy = ManifestTable.snapshot(spark, dir)
    assert(viaLegacy == viaReplay, "legacy JSON checkpoint diverged")
    // filesFrame matches the snapshot's file listing
    val fromFrame = ManifestTable.filesFrame(spark, dir)
      .select("path", "rows", "bytes").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromFrame ==
      viaReplay.files.map(f => (f.path, f.rows, f.bytes)).toSet)
  }

  test("pre-delta-log table vacuumed under the OLD code (no c-files, " +
    "early v-files gone) replays from the lowest retained full " +
    "manifest — and a missing-prefix DELTA log fails loudly") {
    val dir = freshDir("oldvac")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a")))
    ManifestTable.append(spark, dir, kv(Seq(2L -> "b")))
    ManifestTable.append(spark, dir, kv(Seq(3L -> "c")))
    ManifestTable.append(spark, dir, kv(Seq(4L -> "d")))
    val hist = ManifestTable.history(spark, dir)
    val lp = new Path(dir, "_graft_log")
    // rewrite every v-file as the OLD full-manifest wire format
    hist.foreach { s =>
      val out = fs.create(new Path(lp, f"v${s.version}%020d.json"), true)
      try out.write(ManifestTable.renderCheckpoint(s).getBytes("UTF-8"))
      finally out.close()
    }
    // old-code vacuum: early versions deleted, NO checkpoint anywhere
    fs.delete(new Path(lp, f"v${0L}%020d.json"), false)
    fs.delete(new Path(lp, f"v${1L}%020d.json"), false)
    ManifestTable.clearSnapshotCache()
    assert(content(dir) == Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    assert(ManifestTable.history(spark, dir).map(_.version) == Seq(2L, 3L))
    // negative: the same layout with DELTA v-files is unreconstructible
    // and must say so (never a silently short file list)
    val dir2 = freshDir("oldvac2")
    ManifestTable.create(spark, dir2, kv(Seq(1L -> "a")))
    ManifestTable.append(spark, dir2, kv(Seq(2L -> "b")))
    fs.delete(new Path(dir2, "_graft_log/" + f"v${0L}%020d.json"), false)
    ManifestTable.clearSnapshotCache()
    val e = intercept[RuntimeException](content(dir2))
    assert(e.getMessage.contains("not reconstructible"))
  }

  test("a failed checkpoint write is counted, logged and harmless: the " +
    "table keeps reading and lastCheckpoint exposes the stale horizon") {
    val dir = freshDir("ckfail")
    ManifestTable.create(spark, dir, kv(Seq(0L -> "r0")))
    // drive exactly to the checkpoint version (v16) with the seam armed
    val fails0 = ManifestTable.checkpointWriteFailures(dir)
    (1L to 16L).foreach { i =>
      if (i == 16L) ManifestTable.failNextCheckpoint = true
      ManifestTable.append(spark, dir, kv(Seq(i -> s"r$i")))
    }
    assert(ManifestTable.checkpointWriteFailures(dir) == fails0 + 1,
      "injected checkpoint failure was not counted against THIS table")
    assert(ManifestTable.lastCheckpoint(spark, dir).isEmpty,
      "no checkpoint should exist after the injected failure")
    ManifestTable.clearSnapshotCache()
    assert(content(dir).size == 17, "table must keep reading")
    // the maintenance hook heals it
    ManifestTable.checkpoint(spark, dir)
    assert(ManifestTable.lastCheckpoint(spark, dir).contains(16L))
  }

  test("exactly-once across the global-mark upgrade: a txn-scoped " +
    "replay of the batch a pre-upgrade writer just committed is a " +
    "no-op; the next batch lands") {
    val dir = freshDir("upgrade")
    ManifestTable.create(spark, dir, kv(Nil))
    // pre-upgrade writer: global mark only (txnId = None)
    ManifestTable.appendBatch(spark, dir, kv(Seq(1L -> "b5")), 5L, None)
    val head0 = ManifestTable.snapshot(spark, dir)
    assert(head0.lastBatch == 5L && head0.txns.isEmpty)
    // post-upgrade restart: Spark re-delivers the LAST batch, now with
    // the per-writer txn id — must not double-commit
    val replay = ManifestTable.appendBatch(spark, dir,
      kv(Seq(1L -> "b5")), 5L, Some("query-1"))
    assert(replay.version == head0.version, "upgrade replay double-committed")
    assert(content(dir) == Set(1L -> "b5"))
    // the next batch is new work and lands with its own mark
    val next = ManifestTable.appendBatch(spark, dir,
      kv(Seq(2L -> "b6")), 6L, Some("query-1"))
    assert(next.version == head0.version + 1)
    assert(next.txns.get("query-1").contains(6L))
    // a DIFFERENT writer's batch 5 is NOT a replay (head op mismatch)
    val other = ManifestTable.appendBatch(spark, dir,
      kv(Seq(3L -> "w2b5")), 5L, Some("query-2"))
    assert(other.version == next.version + 1,
      "a second writer's batch was wrongly dropped")
  }

  test("format protocol guard: an UNKNOWN record kind or a minReader " +
    "above this binary fails LOUDLY — never an empty listing served " +
    "as the table") {
    val fs = new Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def write(p: Path, s: String): Unit = {
      val out = fs.create(p, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    // unknown v-file kind (a future revision's record)
    val dir = freshDir("proto")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a")))
    ManifestTable.append(spark, dir, kv(Seq(2L -> "b")))
    val lp = new Path(dir, "_graft_log")
    write(new Path(lp, f"v${1L}%020d.json"),
      """{"kind":"delta-v9","version":1,"parent":0}""")
    ManifestTable.clearSnapshotCache()
    val e1 = intercept[IllegalStateException](content(dir))
    assert(e1.getMessage.contains("unknown record kind"))
    // minReader above SupportedReaderVersion: refused even though the
    // kind parses (the field is the forward-compat seam)
    val dir2 = freshDir("proto2")
    ManifestTable.create(spark, dir2, kv(Seq(1L -> "a")))
    val lp2 = new Path(dir2, "_graft_log")
    val v0 = new Path(lp2, f"v${0L}%020d.json")
    val txt = {
      val in = fs.open(v0)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
        bos.toString("UTF-8")
      } finally in.close()
    }
    write(v0, txt.replaceFirst("\"minReader\":1", "\"minReader\":99"))
    ManifestTable.clearSnapshotCache()
    val e2 = intercept[IllegalStateException](content(dir2))
    assert(e2.getMessage.contains("requires reader version 99"))
    // an unknown CHECKPOINT kind is refused the same way (a two-part
    // seal mis-read as a full listing was the round-16 ADVICE hazard)
    val dir3 = freshDir("proto3")
    ManifestTable.create(spark, dir3, kv(Seq(1L -> "a")))
    ManifestTable.checkpoint(spark, dir3)
    val c0 = new Path(new Path(dir3, "_graft_log"), f"c${0L}%020d.json")
    write(c0, """{"kind":"checkpoint-v9","version":0,"parent":-1}""")
    ManifestTable.clearSnapshotCache()
    val e3 = intercept[IllegalStateException](content(dir3))
    assert(e3.getMessage.contains("unknown kind"))
  }

  test("create() after an in-process drop purges the dir's cached " +
    "snapshots — a recreated table can never answer from the old one") {
    val dir = freshDir("recreate")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "old")))
    assert(content(dir) == Set(1L -> "old")) // warm the cache
    // out-of-band drop (no engine call sees it)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    fs.mkdirs(new Path(dir))
    ManifestTable.create(spark, dir, kv(Seq(2L -> "new")))
    assert(content(dir) == Set(2L -> "new"),
      "the recreated table must never serve the old table's snapshot")
  }
}
