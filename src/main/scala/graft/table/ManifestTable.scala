package graft.table

import java.util.UUID

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Path}
import org.apache.hadoop.fs.Options.CreateOpts
import org.apache.parquet.column.statistics.LongStatistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Minimal manifest-based ACID table format — the transactional seam a
  * 100 TB warehouse needs (atomic commit, snapshot isolation, time
  * travel, MERGE) built from nothing but parquet data files + JSON
  * manifests, because no Delta/Iceberg connector jar ships in this
  * offline image. The protocol is the public log-structured design all
  * of them share:
  *
  *   - Data files land under `data/<commitUuid>/` via a normal Spark
  *     parquet write. A data file is INVISIBLE until some manifest
  *     references it, so a writer crash at any point before publish
  *     leaves readers on the old snapshot (no torn state to clean —
  *     just orphaned bytes for vacuum()).
  *   - A snapshot manifest `_graft_log/v%020d.json` lists every live
  *     file (table-root-relative) with row counts and optional
  *     min/max stats of one INT64 column, harvested from the parquet
  *     FOOTERS (no data read-back). The manifest carries the schema,
  *     so an empty table still reads with its schema.
  *   - Publish = write the manifest to a dot-tmp name, then a
  *     NO-OVERWRITE rename onto the versioned name via
  *     [[FileContext]] (Options.Rename defaults to NONE). On HDFS
  *     that rename is the atomic putIfAbsent every open table format
  *     uses as its commit primitive; exactly one of two racing
  *     committers for version v wins, the loser gets
  *     [[ConcurrentCommitException]]. (Object stores without atomic
  *     rename need a commit service in front — same as Delta.)
  *   - Readers list `_graft_log`, take the highest version (or the
  *     requested one — time travel), and scan exactly that file set.
  *     A reader never sees a half-commit: the manifest appears
  *     atomically and the files it names were sealed before it was
  *     written. Snapshot isolation falls out: a long scan keeps using
  *     its manifest's file list no matter how many commits land after.
  *
  * MERGE is the latest-wins CDC shape (the q_cdc_apply relational
  * form) scoped to the TOUCHED files only: a file is rewritten iff the
  * source contains at least one key inside its manifest [min, max]
  * (probed by one range join against the broadcast file-interval
  * table), untouched files carry over to the new snapshot by reference
  * — at 100 TB the rewrite cost is proportional to the touched data,
  * not the table. Re-applying the same source is content-idempotent
  * (latest-wins makes the second apply a no-op on the data).
  *
  * Scale shape: every commit is one distributed parquet write + a
  * metadata-sized footer sweep + one tiny JSON rename; MERGE adds one
  * key-partitioned window over (touched ∪ source) only. Nothing
  * row-scale ever reaches the driver (the one collect is the 1-row
  * source key-bounds probe).
  */
object ManifestTable {

  /** Two writers raced for the same snapshot version; the caller must
    * re-read the table state and retry its transaction. */
  final class ConcurrentCommitException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  /** One live data file: root-relative path, exact row count, byte
    * size, optional min/max of the stats column (both present or both
    * absent; absent ⇒ the file always survives MERGE pruning). */
  final case class FileEntry(path: String, rows: Long, bytes: Long,
      minKey: Option[Long], maxKey: Option[Long])

  /** One committed snapshot (the unit of time travel). */
  final case class Snapshot(version: Long, parent: Long, operation: String,
      statsKey: Option[String], schemaJson: String, files: Vector[FileEntry]) {
    def totalRows: Long = files.iterator.map(_.rows).sum
    def totalBytes: Long = files.iterator.map(_.bytes).sum
  }

  private val LogDir = "_graft_log"
  private val DataDir = "data"

  private def logPath(dir: String) = new Path(dir, LogDir)
  private def manifestName(v: Long) = f"v$v%020d.json"

  // ---------------------------------------------------------------- io

  private def conf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  private def listVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val lp = logPath(dir)
    val fs = lp.getFileSystem(conf(spark))
    if (!fs.exists(lp)) Seq.empty
    else fs.listStatus(lp).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .flatMap(n => scala.util.Try(n.drop(1).dropRight(5).toLong).toOption)
      .sorted
  }

  /** Highest committed snapshot version, if the table exists. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    listVersions(spark, dir).lastOption

  /** The full snapshot log, oldest first. */
  def history(spark: SparkSession, dir: String): Seq[Snapshot] =
    listVersions(spark, dir).map(v => readManifest(spark, dir, v))

  private def readManifest(spark: SparkSession, dir: String, v: Long): Snapshot = {
    val p = new Path(logPath(dir), manifestName(v))
    val fs = p.getFileSystem(conf(spark))
    val in = fs.open(p)
    val bytes = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      out.toByteArray
    } finally in.close()
    parseManifest(new String(bytes, "UTF-8"))
  }

  // ------------------------------------------------------ json codec
  // Hand-built JObject in, path-extraction out: no runtime reflection,
  // so the wire format is exactly what this file says it is.

  private def renderManifest(s: Snapshot): String = {
    val files = JArray(s.files.toList.map { f =>
      JObject(List(
        "path" -> JString(f.path),
        "rows" -> JLong(f.rows),
        "bytes" -> JLong(f.bytes)) ++
        f.minKey.map(v => "minKey" -> (JLong(v): JValue)).toList ++
        f.maxKey.map(v => "maxKey" -> (JLong(v): JValue)).toList)
    })
    val obj = JObject(List(
      "version" -> JLong(s.version),
      "parent" -> JLong(s.parent),
      "operation" -> JString(s.operation),
      "schema" -> JString(s.schemaJson),
      "files" -> files) ++
      s.statsKey.map(k => "statsKey" -> (JString(k): JValue)).toList)
    JsonMethods.compact(JsonMethods.render(obj))
  }

  private def jLong(v: JValue): Long = v match {
    case JLong(x) => x
    case JInt(x) => x.toLong
    case other => sys.error(s"manifest: expected integer, got $other")
  }

  private def parseManifest(text: String): Snapshot = {
    val j = JsonMethods.parse(text)
    val files = (j \ "files") match {
      case JArray(fs) => fs.toVector.map { f =>
        FileEntry(
          (f \ "path").values.toString,
          jLong(f \ "rows"),
          jLong(f \ "bytes"),
          (f \ "minKey").toOption.map(jLong),
          (f \ "maxKey").toOption.map(jLong))
      }
      case other => sys.error(s"manifest: files is $other")
    }
    Snapshot(
      jLong(j \ "version"),
      jLong(j \ "parent"),
      (j \ "operation").values.toString,
      (j \ "statsKey").toOption.map(_.values.toString),
      (j \ "schema").values.toString,
      files)
  }

  // ---------------------------------------------------- footer stats

  /** Exact (rows, bytes, min/max of `statsKey`) for one sealed parquet
    * file, from the FOOTER only — the same numbers the writer already
    * serialized; no data pages are read. Stats come back only when the
    * column is INT64 with non-null values in every row group (a partial
    * answer would make MERGE pruning unsound). */
  private def footerStats(c: Configuration, p: Path, statsKey: Option[String])
      : (Long, Option[(Long, Long)]) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, c))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.iterator.map(_.getRowCount).sum
      val mm = statsKey.flatMap { k =>
        val per = blocks.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == k).flatMap { cc =>
            cc.getStatistics match {
              case ls: LongStatistics if ls.hasNonNullValue =>
                Some((ls.getMin, ls.getMax))
              case _ => None
            }
          }
        }
        if (per.size != blocks.size || per.isEmpty) None
        else Some((per.iterator.map(_._1).min, per.iterator.map(_._2).max))
      }
      (rows, mm)
    } finally reader.close()
  }

  // -------------------------------------------------------- staging

  /** Write `df` as a sealed commit directory and return its manifest
    * entries. The Spark job's own output commit seals the directory;
    * nothing references it until OUR manifest rename succeeds. */
  private def stage(spark: SparkSession, dir: String, df: DataFrame,
      statsKey: Option[String]): Vector[FileEntry] = {
    val commitId = UUID.randomUUID().toString
    val rel = s"$DataDir/$commitId"
    val abs = new Path(dir, rel)
    df.write.parquet(abs.toString)
    val c = conf(spark)
    val fs = abs.getFileSystem(c)
    fs.listStatus(abs).toVector
      .filter { st =>
        val n = st.getPath.getName
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getPath.getName)
      .map { st =>
        val (rows, mm) = footerStats(c, st.getPath, statsKey)
        FileEntry(s"$rel/${st.getPath.getName}", rows, st.getLen,
          mm.map(_._1), mm.map(_._2))
      }
  }

  /** Atomic publish: dot-tmp write + no-overwrite rename. Exactly one
    * committer of version `s.version` wins ([table]-visible so the spec
    * can pin the race law deterministically). */
  private[table] def publish(spark: SparkSession, dir: String, s: Snapshot): Unit = {
    val lp = logPath(dir)
    val fc = FileContext.getFileContext(lp.toUri, conf(spark))
    val tmp = new Path(lp, s".tmp-${manifestName(s.version)}-${UUID.randomUUID()}")
    val dst = new Path(lp, manifestName(s.version))
    val out = fc.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      CreateOpts.createParent())
    try out.write(renderManifest(s).getBytes("UTF-8")) finally out.close()
    try fc.rename(tmp, dst) // Options.Rename.NONE: fails if dst exists
    catch {
      case NonFatal(e) =>
        try fc.delete(tmp, false) catch { case NonFatal(_) => () }
        throw new ConcurrentCommitException(
          s"snapshot v${s.version} already committed at $dst", e)
    }
  }

  // ------------------------------------------------------- commits

  /** Create the table at version 0 (fails if a log already exists). */
  def create(spark: SparkSession, dir: String, df: DataFrame,
      statsKey: Option[String] = None): Snapshot = {
    require(latestVersion(spark, dir).isEmpty,
      s"table already exists at $dir — use append/overwrite/merge")
    val files = stage(spark, dir, df, statsKey)
    val snap = Snapshot(0L, -1L, "create", statsKey, df.schema.json, files)
    publish(spark, dir, snap)
    snap
  }

  /** Append-only commit; auto-retries the version race (an append is
    * insensitive to what the concurrent commit did to OTHER files).
    *
    * Schema EVOLUTION, additive only: `df` may carry columns the table
    * doesn't have yet — the snapshot schema widens to (table columns in
    * their original order) ++ (new columns), and files written before
    * the widening read back with NULLs in the new columns (parquet
    * resolves the explicit read schema by name, so old files simply
    * lack them). Older snapshots keep their own schemaJson — time
    * travel returns each version with the schema it was committed
    * under. Missing table columns or a changed dataType throw before
    * any data is staged. */
  def append(spark: SparkSession, dir: String, df: DataFrame,
      maxRetries: Int = 5): Snapshot = {
    val base = current(spark, dir)
    evolveSchema(base, df) // fail fast, before any data is staged
    val files = stage(spark, dir, df, base.statsKey)
    var attempt = 0
    while (true) {
      val head = current(spark, dir)
      val snap = Snapshot(head.version + 1, head.version, "append",
        head.statsKey, evolveSchema(head, df), head.files ++ files)
      try { publish(spark, dir, snap); return snap }
      catch {
        case e: ConcurrentCommitException =>
          attempt += 1; if (attempt > maxRetries) throw e
      }
    }
    sys.error("unreachable")
  }

  /** The widened schema json for appending `df` onto `head` (additive
    * evolution; loud on anything else). */
  private def evolveSchema(head: Snapshot, df: DataFrame): String = {
    val table = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    val incoming = df.schema
    val byName = incoming.fields.map(f => f.name -> f).toMap
    table.fields.foreach { tf =>
      byName.get(tf.name) match {
        case None => throw new IllegalArgumentException(
          s"append: table column ${tf.name} missing from the frame " +
            "(evolution is additive only)")
        case Some(inf) if inf.dataType != tf.dataType =>
          throw new IllegalArgumentException(
            s"append: column ${tf.name} type ${inf.dataType} != table " +
              s"type ${tf.dataType}")
        case _ => ()
      }
    }
    val existing = table.fieldNames.toSet
    val added = incoming.fields.filterNot(f => existing(f.name))
      .map(_.copy(nullable = true))
    if (added.isEmpty) head.schemaJson
    else StructType(table.fields ++ added).json
  }

  /** Replace the table contents atomically (readers flip old→new with
    * no intermediate state). */
  def overwrite(spark: SparkSession, dir: String, df: DataFrame): Snapshot = {
    val head = current(spark, dir)
    val files = stage(spark, dir, df, head.statsKey)
    val snap = Snapshot(head.version + 1, head.version, "overwrite",
      head.statsKey, df.schema.json, files)
    publish(spark, dir, snap) // conflict ⇒ caller must re-read & re-run
    snap
  }

  private def current(spark: SparkSession, dir: String): Snapshot =
    latestVersion(spark, dir) match {
      case Some(v) => readManifest(spark, dir, v)
      case None => sys.error(s"no manifest table at $dir")
    }

  // --------------------------------------------------------- reads

  private def scan(spark: SparkSession, dir: String, snap: Snapshot): DataFrame = {
    val schema = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    if (snap.files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      spark.read.schema(schema)
        .parquet(snap.files.map(f => new Path(dir, f.path).toString): _*)
    }
  }

  /** Latest snapshot. */
  def read(spark: SparkSession, dir: String): DataFrame =
    scan(spark, dir, current(spark, dir))

  /** Time travel: the table exactly as of snapshot `version`. */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame =
    scan(spark, dir, readManifest(spark, dir, version))

  // --------------------------------------------------------- merge

  /** MERGE `source` into the table on `key`: latest-wins upsert, with
    * rows whose `opCol` (if any) equals 'D' deleted. Only files holding
    * at least one source key (by manifest [minKey, maxKey] containment)
    * are rewritten; the rest carry over by reference. Content-idempotent:
    * replaying the same source yields a byte-different but
    * value-identical table. Conflicts are NOT auto-retried (a racing
    * commit may have changed the very rows being merged). */
  def merge(spark: SparkSession, dir: String, source: DataFrame, key: String,
      opCol: Option[String] = None): Snapshot =
    mergeImpl(spark, dir, source, key, opCol, "merge")

  /** Exactly-once MERGE for streaming writers: the micro-batch id is
    * recorded in the snapshot's operation (`merge@batch=<id>`), and a
    * replay of an already-committed id returns the existing snapshot
    * WITHOUT committing — the foreachBatch retry contract (Spark may
    * re-run a batch after a failure between sink write and offset
    * commit). Idempotence is thus structural (version-log dedupe), not
    * merely content-level. */
  def mergeBatch(spark: SparkSession, dir: String, source: DataFrame,
      key: String, batchId: Long, opCol: Option[String] = None): Snapshot = {
    val tag = s"merge@batch=$batchId"
    history(spark, dir).find(_.operation == tag) match {
      case Some(done) => done
      case None => mergeImpl(spark, dir, source, key, opCol, tag)
    }
  }

  private def mergeImpl(spark: SparkSession, dir: String, source: DataFrame,
      key: String, opCol: Option[String], operation: String): Snapshot = {
    val head = current(spark, dir)
    val schema = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    val cols = schema.fieldNames.toSeq
    require(cols.contains(key), s"merge key $key not in table schema")

    // Per-file pruning probe: a file is touched iff at least one source
    // key falls inside its [minKey, maxKey] (files without stats are
    // always touched). The probe is one range join of the source keys
    // against the BROADCAST file-interval table (metadata-sized: one row
    // per data file) aggregated down to ≤ |files| ints at the driver —
    // strictly tighter than a single [lo, hi] interval, which a
    // changelog with one far-away key (the append-plus-update batch
    // shape) would blow up to the whole table.
    val statFiles = head.files.zipWithIndex.collect {
      case (f, i) if f.minKey.isDefined && f.maxKey.isDefined =>
        (i, f.minKey.get, f.maxKey.get)
    }
    val touchedIdx: Set[Int] =
      if (statFiles.isEmpty) Set.empty
      else {
        import spark.implicits._
        val ivals = statFiles.toDF("__fi", "__mn", "__mx")
        source.select(col(key).cast("long").as("__k"))
          .where(col("__k").isNotNull)
          .join(broadcast(ivals),
            col("__k") >= col("__mn") && col("__k") <= col("__mx"))
          .select("__fi").distinct().collect().map(_.getInt(0)).toSet
      }
    val (touched, untouched) = head.files.zipWithIndex.partition {
      case (f, i) => f.minKey.isEmpty || f.maxKey.isEmpty || touchedIdx(i)
    } match { case (t, u) => (t.map(_._1), u.map(_._1)) }

    val srcOp = opCol.map(col).getOrElse(lit("U"))
    val src = source.select(
      cols.map(col) :+ lit(1).as("_seq") :+ srcOp.as("_op"): _*)
    val base = scan(spark, dir,
        head.copy(files = touched))
      .select(cols.map(col) :+ lit(0).as("_seq") :+ lit("U").as("_op"): _*)
    val w = Window.partitionBy(key).orderBy(col("_seq").desc)
    val rewritten = base.unionAll(src)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("_op") =!= "D")
      .select(cols.map(col): _*)

    val staged =
      if (touched.isEmpty && source.isEmpty) Vector.empty
      else stage(spark, dir, rewritten, head.statsKey)
    val snap = Snapshot(head.version + 1, head.version, operation,
      head.statsKey, head.schemaJson, untouched ++ staged)
    publish(spark, dir, snap)
    snap
  }

  /** Rows that differ between two snapshots, as a changelog frame:
    * `_change` ∈ ('I', 'D') — a row present in `to` but not `from` is an
    * insert, the reverse a delete (an update appears as its D+I pair).
    * Multiset semantics via a count-compare (EXCEPT ALL shape): two
    * group-by-all-columns aggregates joined full-outer — one exchange
    * per side, no row-scale driver state. */
  def changes(spark: SparkSession, dir: String, from: Long, to: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = readVersion(spark, dir, from)
    val b = readVersion(spark, dir, to)
    val cols = a.schema.fieldNames.toSeq
    val ca = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__na"))
    val cb = b.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__nb"))
    ca.join(cb, cols, "full_outer")
      .select(cols.map(col) :+
        (coalesce(col("__nb"), lit(0L)) - coalesce(col("__na"), lit(0L)))
          .as("__d"): _*)
      .where(col("__d") =!= 0L)
      .select(cols.map(col) :+ explode(transform(
        sequence(lit(1L), abs(col("__d"))),
        _ => when(col("__d") > 0, lit("I")).otherwise(lit("D"))))
        .as("_change"): _*)
  }

  /** Incremental consumption feed: everything that changed after
    * `sinceVersion`, up to the current head (= changes(since, head)),
    * tagged with the head version so the consumer can checkpoint it and
    * ask again later — the batch-incremental CDC pattern (poll, process
    * the delta, persist `_as_of_version`, repeat) that needs no
    * streaming machinery. */
  def changesSince(spark: SparkSession, dir: String, sinceVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val head = current(spark, dir).version
    changes(spark, dir, sinceVersion, head)
      .withColumn("_as_of_version", lit(head))
  }

  // ------------------------------------------------------ compact

  /** Bin-pack small data files into larger ones: every file under
    * `smallBytes` is rewritten (one coalesced staged commit sized at
    * ~`targetBytes` per output file), files already at weight carry
    * over by reference. Contents are untouched — a pure layout commit,
    * the OPTIMIZE half of table maintenance (vacuum is the other).
    * No-op (returns the current snapshot, no new version) when fewer
    * than two small files exist. */
  def compact(spark: SparkSession, dir: String, smallBytes: Long = 32L << 20,
      targetBytes: Long = 128L << 20): Snapshot = {
    val head = current(spark, dir)
    val (small, big) = head.files.partition(_.bytes < smallBytes)
    if (small.size < 2) return head
    val schema = DataType.fromJson(head.schemaJson).asInstanceOf[StructType]
    val df =
      if (small.forall(_.rows == 0L))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema)
        .parquet(small.map(f => new Path(dir, f.path).toString): _*)
    val outFiles = math.max(1L,
      (small.iterator.map(_.bytes).sum + targetBytes - 1) / targetBytes).toInt
    val staged = stage(spark, dir, df.coalesce(outFiles), head.statsKey)
    val snap = Snapshot(head.version + 1, head.version, "compact",
      head.statsKey, head.schemaJson, big ++ staged)
    publish(spark, dir, snap)
    snap
  }

  // -------------------------------------------------------- vacuum

  /** Delete commit directories no longer referenced by the newest
    * `keepLast` snapshots (older snapshots become unreadable — the
    * usual retention trade). Safe against in-flight commits only if
    * `keepLast ≥ 1` and no writer is staging right now; production
    * would add an age threshold like every table format does. Returns
    * the number of data files deleted. */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): Long = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val versions = listVersions(spark, dir)
    val keep = versions.takeRight(keepLast).toSet
    val live = versions.filter(keep)
      .flatMap(v => readManifest(spark, dir, v).files.map(_.path))
      .map(p => p.split("/")(1)) // commit uuid component
      .toSet
    val dataRoot = new Path(dir, DataDir)
    val fs = dataRoot.getFileSystem(conf(spark))
    if (!fs.exists(dataRoot)) return 0L
    var deleted = 0L
    fs.listStatus(dataRoot).foreach { st =>
      if (st.isDirectory && !live.contains(st.getPath.getName)) {
        val files = fs.listStatus(st.getPath).count(_.getPath.getName.endsWith(".parquet"))
        fs.delete(st.getPath, true)
        deleted += files
      }
    }
    // drop manifests for vacuumed-away versions so history() stays honest
    versions.filterNot(keep).foreach { v =>
      fs.delete(new Path(logPath(dir), manifestName(v)), false)
    }
    deleted
  }
}
