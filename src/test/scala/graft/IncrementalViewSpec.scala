package graft.table

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Laws of incremental view maintenance: incremental ≡ recompute under
  * every fact operation, refresh idempotence/exactly-once, the zero-IO
  * freshness mark, and the changelog-priced refresh shape. */
class IncrementalViewSpec extends SparkSuite {

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"ivm_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def fact(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "g", "c")
  }

  private def viewRows(mvDir: String): Map[Long, (Long, Long)] =
    ManifestTable.read(spark, mvDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def recompute(factDir: String): Map[Long, (Long, Long)] =
    ManifestTable.read(spark, factDir)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("c").cast("long").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("incremental ≡ recompute across merge, delete, update, append, " +
    "overwrite — including group birth and death") {
    import spark.implicits._
    val factDir = freshDir("fact")
    val mvDir = freshDir("mv")
    ManifestTable.create(spark, factDir,
      fact((1L to 60L).map(i => (i, i % 4, i * 10)))
        .repartitionByRange(3, col("k")),
      statsCols = Seq("k", "g"))
    IncrementalView.init(spark, factDir, mvDir, "g", Seq("c"), numFiles = 2)
    assert(viewRows(mvDir) == recompute(factDir))
    // merge: update half of group 1, delete group 2's low keys,
    // insert a brand-new group 9
    val chg = ((1L to 60L).filter(i => i % 4 == 1 && i < 30)
        .map(i => (i, 1L, i * 100, "U")) ++
      (1L to 60L).filter(i => i % 4 == 2 && i <= 20).map(i => (i, 2L, 0L, "D")) ++
      Seq((1000L, 9L, 7L, "U"), (1001L, 9L, 8L, "U")))
      .toDF("k", "g", "c", "_op")
    ManifestTable.merge(spark, factDir, chg, "k", opCol = Some("_op"))
    IncrementalView.refresh(spark, factDir, mvDir, "g", Seq("c"))
    assert(viewRows(mvDir) == recompute(factDir))
    // delete an entire group → its view row must VANISH (n=0 ⇒ 'D')
    ManifestTable.delete(spark, factDir, col("g") === 3L)
    IncrementalView.refresh(spark, factDir, mvDir, "g", Seq("c"))
    assert(!viewRows(mvDir).contains(3L))
    assert(viewRows(mvDir) == recompute(factDir))
    // update + append, caught up in ONE refresh over two commits
    ManifestTable.update(spark, factDir, col("g") === 0L,
      Map("c" -> (col("c") + 1L)))
    ManifestTable.append(spark, factDir, fact(Seq((2000L, 3L, 5L))))
    IncrementalView.refresh(spark, factDir, mvDir, "g", Seq("c"))
    assert(viewRows(mvDir)(3L) == ((1L, 5L)), "dead group reborn")
    assert(viewRows(mvDir) == recompute(factDir))
    // overwrite: the view follows a full replacement too
    ManifestTable.overwrite(spark, factDir,
      fact(Seq((1L, 5L, 50L), (2L, 5L, 60L), (3L, 6L, 70L))))
    IncrementalView.refresh(spark, factDir, mvDir, "g", Seq("c"))
    assert(viewRows(mvDir) == Map(5L -> ((2L, 110L)), 6L -> ((1L, 70L))))
  }

  test("refresh is exactly-once and no-op-aware: fresh view ⇒ no commit; " +
    "a replayed refresh ⇒ the same snapshot; compact ⇒ mark-only commit") {
    val factDir = freshDir("fact2")
    val mvDir = freshDir("mv2")
    ManifestTable.create(spark, factDir,
      fact((1L to 20L).map(i => (i, i % 2, i))), statsCols = Seq("k"))
    IncrementalView.init(spark, factDir, mvDir, "g", Seq("c"))
    val fresh = IncrementalView.refresh(spark, factDir, mvDir, "g", Seq("c"))
    val fresh2 = IncrementalView.refresh(spark, factDir, mvDir, "g", Seq("c"))
    assert(fresh.version == fresh2.version, "no-op refresh must not commit")
    ManifestTable.append(spark, factDir, fact(Seq((21L, 1L, 21L))))
    val r1 = IncrementalView.refresh(spark, factDir, mvDir, "g", Seq("c"))
    val r2 = IncrementalView.refresh(spark, factDir, mvDir, "g", Seq("c"))
    assert(r1.version == r2.version && r1.lastBatch == r2.lastBatch)
    assert(viewRows(mvDir) == recompute(factDir))
    // compact moves every fact row between files; the signed delta
    // cancels, so the refresh commit touches NO view data — only the
    // freshness mark advances (same file set, new lastBatch)
    val preFiles = ManifestTable.snapshot(spark, mvDir).files.map(_.path).toSet
    assert(ManifestTable.compact(spark, factDir).operation == "compact")
    val afterCompact =
      IncrementalView.refresh(spark, factDir, mvDir, "g", Seq("c"))
    assert(afterCompact.files.map(_.path).toSet == preFiles,
      "compact must not rewrite any view file")
    assert(afterCompact.lastBatch ==
      ManifestTable.snapshot(spark, factDir).version)
    assert(viewRows(mvDir) == recompute(factDir))
  }

  test("a view not built by init() refuses to refresh; null group keys " +
    "are excluded from the view") {
    val factDir = freshDir("fact3")
    val mvDir = freshDir("mv3")
    ManifestTable.create(spark, factDir,
      fact((1L to 10L).map(i => (i, i % 2, i))), statsCols = Seq("k"))
    // hand-made table without the freshness mark
    ManifestTable.create(spark, mvDir,
      fact(Seq((0L, 0L, 0L))).select(col("g"), lit(1L).as("n"),
        col("c").as("sum_c")))
    intercept[IllegalArgumentException] {
      IncrementalView.refresh(spark, factDir, mvDir, "g", Seq("c"))
    }
    // null keys: filtered from init and from deltas
    val factDir2 = freshDir("fact4")
    val mvDir2 = freshDir("mv4")
    ManifestTable.create(spark, factDir2,
      fact((1L to 10L).map(i => (i, i % 2, i)))
        .withColumn("g", when(col("k") <= 2L, lit(null)).otherwise(col("g"))),
      statsCols = Seq("k"))
    IncrementalView.init(spark, factDir2, mvDir2, "g", Seq("c"))
    assert(!viewRows(mvDir2).contains(0L) ||
      viewRows(mvDir2)(0L)._1 == (3L to 10L).count(_ % 2 == 0))
    assert(ManifestTable.read(spark, mvDir2).where(col("g").isNull).count() == 0L)
  }
}
