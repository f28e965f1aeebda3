package graft.table

import graft.SparkSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Laws of the manifest table format: atomic visibility, conflict
  * detection, snapshot isolation / time travel, MERGE pruning +
  * idempotent replay, crash safety, vacuum. Everything runs against
  * fresh scratch dirs — no fixture dependence, so the laws hold at any
  * scale by construction (file counts and key ranges are what matter,
  * not row counts). */
class ManifestTableSpec extends SparkSuite {

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"mtable_$tag")
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

  test("create + read round-trips content; manifest carries exact row " +
    "counts and footer key stats") {
    val dir = freshDir("create")
    val df = kv((1L to 100L).map(i => i -> s"row$i"))
    val snap = ManifestTable.create(spark, dir, df.repartition(3),
      statsKey = Some("k"))
    assert(snap.version == 0L && snap.operation == "create")
    assert(snap.totalRows == 100L)
    assert(snap.files.nonEmpty && snap.files.forall(f => f.rows > 0))
    // footer stats present and jointly covering exactly [1, 100]
    assert(snap.files.forall(f => f.minKey.isDefined && f.maxKey.isDefined))
    assert(snap.files.map(_.minKey.get).min == 1L)
    assert(snap.files.map(_.maxKey.get).max == 100L)
    assert(content(dir) == (1L to 100L).map(i => (i, s"row$i")).toSet)
  }

  test("append accumulates; overwrite replaces; every old version stays " +
    "readable (time travel / snapshot isolation)") {
    val dir = freshDir("tt")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a", 2L -> "b")))
    ManifestTable.append(spark, dir, kv(Seq(3L -> "c")))
    ManifestTable.overwrite(spark, dir, kv(Seq(9L -> "z")))
    assert(ManifestTable.latestVersion(spark, dir).contains(2L))
    assert(content(dir) == Set(9L -> "z"))
    def at(v: Long) = ManifestTable.readVersion(spark, dir, v).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at(0) == Set(1L -> "a", 2L -> "b"))
    assert(at(1) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(at(2) == Set(9L -> "z"))
    val hist = ManifestTable.history(spark, dir)
    assert(hist.map(_.operation) == Seq("create", "append", "overwrite"))
    assert(hist.map(_.version) == Seq(0L, 1L, 2L))
    assert(hist.map(_.parent) == Seq(-1L, 0L, 1L))
  }

  test("commit is atomic putIfAbsent: the loser of a version race gets " +
    "ConcurrentCommitException and publishes nothing") {
    val dir = freshDir("race")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a")))
    val head = ManifestTable.history(spark, dir).last
    val w1 = head.copy(version = 1L, parent = 0L, operation = "overwrite")
    val w2 = head.copy(version = 1L, parent = 0L, operation = "append")
    ManifestTable.publish(spark, dir, w1) // winner
    val e = intercept[ManifestTable.ConcurrentCommitException] {
      ManifestTable.publish(spark, dir, w2) // loser
    }
    assert(e.getMessage.contains("v1"))
    // the winner's manifest is untouched and no tmp litter remains
    assert(ManifestTable.history(spark, dir).last.operation == "overwrite")
    val lp = new Path(dir, "_graft_log")
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(lp).exists(_.getPath.getName.startsWith(".tmp")))
  }

  test("append auto-retries past an interleaved commit") {
    val dir = freshDir("retry")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a")))
    // interleaved writer lands v1 directly
    val head = ManifestTable.history(spark, dir).last
    ManifestTable.publish(spark, dir,
      head.copy(version = 1L, parent = 0L, operation = "append"))
    val snap = ManifestTable.append(spark, dir, kv(Seq(2L -> "b")))
    assert(snap.version == 2L && content(dir) == Set(1L -> "a", 2L -> "b"))
  }

  test("a torn writer (sealed data dir, dot-tmp manifest, no rename) is " +
    "invisible: readers stay on the old snapshot") {
    val dir = freshDir("torn")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a", 2L -> "b")))
    // crash state: data staged, manifest only dot-tmp
    kv(Seq(7L -> "ghost")).write.parquet(s"$dir/data/torn-commit")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, "_graft_log/.tmp-v00000000000000000001.json-x")
    val out = fs.create(tmp, true)
    out.write("{\"version\":1,\"files\":[".getBytes("UTF-8")); out.close()
    assert(ManifestTable.latestVersion(spark, dir).contains(0L))
    assert(content(dir) == Set(1L -> "a", 2L -> "b"))
    // and the next real commit just works
    val snap = ManifestTable.append(spark, dir, kv(Seq(3L -> "c")))
    assert(snap.version == 1L)
    assert(content(dir) == Set(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("merge: latest-wins upsert + delete, file pruning leaves " +
    "non-overlapping files byte-identical, replay is content-idempotent") {
    import spark.implicits._
    val dir = freshDir("merge")
    // 4 range-partitioned files over k = 1..400 ⇒ disjoint key ranges
    val base = kv((1L to 400L).map(i => i -> s"v$i"))
      .repartitionByRange(4, col("k"))
    ManifestTable.create(spark, dir, base, statsKey = Some("k"))
    val v0 = ManifestTable.history(spark, dir).last
    assert(v0.files.size == 4)
    // upserts 10..20, deletes 50..60, one insert at 450: the [10, 450]
    // bounds span every file, so this test pins SEMANTICS (the tight
    // pruning law is the next test)
    val srcRows = (10L to 20L).map(i => (i, s"NEW$i", "U")) ++
      (50L to 60L).map(i => (i, "", "D")) :+ ((450L, "ins", "U"))
    val src = srcRows.toDF("k", "v", "_op")
    val v1 = ManifestTable.merge(spark, dir, src, "k", opCol = Some("_op"))
    val expect = ((1L to 400L).toSet -- (50L to 60L))
      .map(i => (i, if (i >= 10 && i <= 20) s"NEW$i" else s"v$i")) + (450L -> "ins")
    assert(content(dir) == expect)
    // replay: same source again ⇒ identical content, new version
    val v2 = ManifestTable.merge(spark, dir, src, "k", opCol = Some("_op"))
    assert(v2.version == v1.version + 1)
    assert(content(dir) == expect)
  }

  test("merge prunes by key bounds: files wholly outside the source " +
    "range carry over by reference") {
    import spark.implicits._
    val dir = freshDir("prune")
    val base = kv((1L to 400L).map(i => i -> s"v$i"))
      .repartitionByRange(4, col("k"))
    ManifestTable.create(spark, dir, base, statsKey = Some("k"))
    val v0 = ManifestTable.history(spark, dir).last
    // a tight changelog: keys 5..8 only ⇒ exactly ONE file overlaps
    val src = (5L to 8L).map(i => (i, s"N$i", "U")).toDF("k", "v", "_op")
    val v1 = ManifestTable.merge(spark, dir, src, "k", opCol = Some("_op"))
    val carried = v1.files.map(_.path).toSet
      .intersect(v0.files.map(_.path).toSet)
    assert(carried.size == 3,
      s"expected 3 of 4 files untouched, carried=$carried")
    assert(content(dir).count(_._2.startsWith("N")) == 4)
  }

  test("empty-result snapshots read back with schema intact") {
    val dir = freshDir("empty")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a")))
    import spark.implicits._
    val allDel = Seq((1L, "", "D")).toDF("k", "v", "_op")
    ManifestTable.merge(spark, dir, allDel, "k", opCol = Some("_op"))
    val df = ManifestTable.read(spark, dir)
    assert(df.count() == 0L)
    assert(df.schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("8 writers racing appends all land: the retry loop serializes " +
    "them into 8 distinct versions with no lost rows") {
    import java.util.concurrent.{Executors, TimeUnit}
    val dir = freshDir("race8")
    ManifestTable.create(spark, dir, kv(Seq(0L -> "base")))
    val pool = Executors.newFixedThreadPool(8)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (1 to 8).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit =
          try ManifestTable.append(spark, dir, kv(Seq(i.toLong -> s"w$i")),
            maxRetries = 32)
          catch { case t: Throwable => errs.add(t) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "race timed out")
    assert(errs.isEmpty, s"writers failed: ${errs.toArray.mkString(", ")}")
    assert(ManifestTable.latestVersion(spark, dir).contains(8L))
    assert(content(dir) == (0L to 8L).map(i =>
      i -> (if (i == 0) "base" else s"w$i")).toSet)
    val hist = ManifestTable.history(spark, dir)
    assert(hist.map(_.version) == (0L to 8L) &&
      hist.map(_.parent) == (-1L to 7L))
  }

  test("changesSince tags the delta with the head version (the poll-" +
    "checkpoint-repeat consumption contract)") {
    import spark.implicits._
    val dir = freshDir("since")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a")))
    ManifestTable.append(spark, dir, kv(Seq(2L -> "b")))
    ManifestTable.merge(spark, dir,
      Seq((1L, "A", "U")).toDF("k", "v", "_op"), "k", opCol = Some("_op"))
    val d = ManifestTable.changesSince(spark, dir, 0L)
    assert(d.columns.toSeq == Seq("k", "v", "_change", "_as_of_version"))
    val got = d.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == Set((1L, "a", "D", 2L), (1L, "A", "I", 2L),
      (2L, "b", "I", 2L)))
    assert(ManifestTable.changesSince(spark, dir, 2L).count() == 0L)
  }

  test("append evolves the schema additively: old files read with NULLs " +
    "in new columns, old snapshots keep their own schema, bad shapes throw") {
    import spark.implicits._
    val dir = freshDir("evolve")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a", 2L -> "b")))
    val snap = ManifestTable.append(spark, dir,
      Seq((3L, "c", 7.5)).toDF("k", "v", "w"))
    assert(snap.operation == "append")
    val live = ManifestTable.read(spark, dir)
    assert(live.schema.fieldNames.toSeq == Seq("k", "v", "w"))
    val got = live.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(7.5))))
    // time travel: v0 still reads with the schema it committed under
    assert(ManifestTable.readVersion(spark, dir, 0L).schema.fieldNames.toSeq
      == Seq("k", "v"))
    // non-additive shapes fail before staging any data
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, dir, Seq(9L).toDF("k")) // missing v
    }
    intercept[IllegalArgumentException] {
      ManifestTable.append(spark, dir,
        Seq((9L, 1, 0.0)).toDF("k", "v", "w")) // v: int != string
    }
    assert(ManifestTable.latestVersion(spark, dir).contains(1L),
      "failed appends must not commit")
  }

  test("compact bin-packs small files into one layout commit with " +
    "identical contents; under two small files it is a no-op") {
    val dir = freshDir("compact")
    ManifestTable.create(spark, dir,
      kv((1L to 50L).map(i => i -> s"v$i")).repartition(5),
      statsKey = Some("k"))
    val before = ManifestTable.history(spark, dir).last
    assert(before.files.size == 5)
    val snap = ManifestTable.compact(spark, dir)
    assert(snap.version == 1L && snap.operation == "compact")
    assert(snap.files.size == 1, s"expected 1 packed file, got ${snap.files.size}")
    assert(snap.totalRows == 50L)
    assert(content(dir) == (1L to 50L).map(i => (i, s"v$i")).toSet)
    // footer key stats survive the rewrite (MERGE pruning stays sound)
    assert(snap.files.forall(f => f.minKey.contains(1L) && f.maxKey.contains(50L)))
    // second compact: one small file left ⇒ structural no-op, no commit
    val again = ManifestTable.compact(spark, dir)
    assert(again.version == 1L)
    assert(ManifestTable.latestVersion(spark, dir).contains(1L))
  }

  test("changes() emits the multiset I/D changelog between two versions") {
    import spark.implicits._
    val dir = freshDir("changes")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a", 2L -> "b", 3L -> "c")))
    val src = Seq((2L, "B", "U"), (3L, "", "D"), (4L, "d", "U"))
      .toDF("k", "v", "_op")
    ManifestTable.merge(spark, dir, src, "k", opCol = Some("_op"))
    val got = ManifestTable.changes(spark, dir, 0L, 1L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // update 2 = D+I pair; delete 3 = D; insert 4 = I; 1 untouched
    assert(got == Set((2L, "b", "D"), (2L, "B", "I"), (3L, "c", "D"),
      (4L, "d", "I")))
    // self-diff is empty; reverse diff flips I and D
    assert(ManifestTable.changes(spark, dir, 1L, 1L).count() == 0L)
    val rev = ManifestTable.changes(spark, dir, 1L, 0L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(rev == got.map { case (k, v, c) =>
      (k, v, if (c == "I") "D" else "I") })
  }

  test("mergeBatch: a replayed batch id is a structural no-op (no new " +
    "version), distinct ids commit normally") {
    import spark.implicits._
    val dir = freshDir("mbatch")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a")))
    val b0 = Seq((2L, "b")).toDF("k", "v")
    val s1 = ManifestTable.mergeBatch(spark, dir, b0, "k", batchId = 0L)
    assert(s1.version == 1L && s1.operation == "merge@batch=0")
    // foreachBatch retry: same id replayed ⇒ the EXISTING snapshot back
    val s1b = ManifestTable.mergeBatch(spark, dir, b0, "k", batchId = 0L)
    assert(s1b.version == 1L)
    assert(ManifestTable.latestVersion(spark, dir).contains(1L))
    // next id commits
    val s2 = ManifestTable.mergeBatch(spark, dir,
      Seq((1L, "A")).toDF("k", "v"), "k", batchId = 1L)
    assert(s2.version == 2L)
    assert(content(dir) == Set(1L -> "A", 2L -> "b"))
  }

  test("vacuum drops orphaned and out-of-retention commits but never " +
    "the live snapshot") {
    val dir = freshDir("vacuum")
    ManifestTable.create(spark, dir, kv(Seq(1L -> "a")))
    ManifestTable.overwrite(spark, dir, kv(Seq(2L -> "b")))
    // orphan from a torn writer
    kv(Seq(9L -> "ghost")).write.parquet(s"$dir/data/orphan-commit")
    val deleted = ManifestTable.vacuum(spark, dir, keepLast = 1)
    assert(deleted > 0L)
    assert(content(dir) == Set(2L -> "b"))
    assert(ManifestTable.history(spark, dir).map(_.version) == Seq(1L))
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(dir, "data/orphan-commit")))
  }
}
