package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, ProcedureCatalog, StagedTable, StagingTableCatalog, SupportsNamespaces, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{Dataset, Row}

import graft.table.ManifestTable

/** A DataSourceV2 TABLE CATALOG over a graft warehouse directory —
  * the full SQL-catalog surface on the manifest-table format:
  *
  * {{{
  * spark.sql.catalog.lake = graft.sources.GraftCatalog
  * spark.sql.catalog.lake.warehouse = /data/lake
  *
  * CREATE NAMESPACE lake.bronze;
  * CREATE TABLE lake.bronze.events (k BIGINT, v STRING)
  *   PARTITIONED BY (day) TBLPROPERTIES ('option.statsCols' = 'k');
  * CREATE TABLE lake.bronze.t2 AS SELECT ...;          -- CTAS
  * INSERT INTO lake.bronze.events VALUES ...;          -- atomic commit
  * SELECT * FROM lake.bronze.events VERSION AS OF 3;   -- time travel
  * SELECT * FROM lake.bronze.events TIMESTAMP AS OF '...';
  * DROP TABLE lake.bronze.events;
  * }}}
  *
  * Layout: `warehouse/<namespace dirs>/<table>` is the table root (one
  * manifest log + data under it) — a table IS its directory, no side
  * metastore, so every catalog operation is a filesystem listing or
  * one manifest read, and the same directory keeps working through
  * the Scala facade and `format("graft")` paths. Time travel maps to
  * [[ManifestTable.readVersion]]/`versionAsOf` (the DSv2 contract
  * hands timestamps in MICROseconds). Reads/writes resolve through
  * [[GraftTable]], so SQL gets the same manifest + row-group pruning
  * and the same commit protocol as everything else. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog {

  /** CHECK constraints are first-class on graft tables (enforced on
    * every write by [[ManifestTable]]), so the catalog advertises the
    * constraint-DDL capability: `ALTER TABLE t ADD CONSTRAINT n CHECK
    * (…)` / `DROP CONSTRAINT n` plan through [[alterTable]]. */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private var catalogName: String = _
  private var warehouse: Path = _

  private def spark: SparkSession = SparkSession.active
  private def fs = warehouse.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = new Path(Option(options.get("warehouse")).getOrElse(
      sys.error(s"graft catalog $name: set spark.sql.catalog.$name" +
        ".warehouse to the warehouse directory")))
  }

  override def name(): String = catalogName

  private def nsPath(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)(new Path(_, _))

  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), ident.name)

  private def isTable(p: Path): Boolean =
    fs.exists(new Path(p, "_graft_log"))

  // ------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(
      (catalogName +: namespace))
    fs.listStatus(p).filter(s => s.isDirectory && isTable(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tablePath(ident))

  private def graftTable(ident: Identifier,
      extra: Map[String, String]): GraftTable = {
    val dir = tablePath(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val opts = new CaseInsensitiveStringMap(
      (Map("path" -> dir.toString) ++ extra).asJava)
    new GraftTable(GraftTableProvider.resolve(spark, opts)._2.schema, opts)
  }

  override def loadTable(ident: Identifier): Table =
    graftTable(ident, Map.empty)

  /** `VERSION AS OF <v>` */
  override def loadTable(ident: Identifier, version: String): Table =
    graftTable(ident, Map("versionAsOf" -> version))

  /** `TIMESTAMP AS OF <ts>` — DSv2 hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    graftTable(ident,
      Map("timestampAsOf" -> (timestampMicros / 1000L).toString))

  private def parsePartitions(partitions: Array[Transform]): Seq[String] =
    partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case other => sys.error(
        s"graft catalog: only identity partitioning is supported, got $other")
    }

  private def csvProp(properties: JMap[String, String], k: String)
      : Seq[String] = {
    val props = properties.asScala
    props.get(TableCatalog.OPTION_PREFIX + k).orElse(props.get(k))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : Table = {
    val dir = tablePath(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    ManifestTable.create(spark, dir.toString, empty,
      statsCols = csvProp(properties, "statsCols"),
      partitionCols = parsePartitions(partitions),
      bloomCols = csvProp(properties, "bloomCols"))
    graftTable(ident, Map.empty)
  }

  /** Atomic CTAS (round-17 verdict #3): implementing the staging
    * catalog makes Spark route CREATE TABLE … AS SELECT through
    * stageCreate → write → commitStagedChanges, so the data files land
    * in the SAME version-0 commit — one commit + one footer sweep
    * instead of create-empty + append (two commits, two sweeps and a
    * DSv2 read-back per CTAS). The staged write reuses the normal
    * stage() building block; nothing is visible (no `_graft_log`
    * record) until commitStagedChanges publishes v0. */
  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : StagedTable = {
    val dir = tablePath(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(dir.getParent)
    new GraftStagedTable(dir.toString, schema,
      csvProp(properties, "statsCols"), parsePartitions(partitions),
      csvProp(properties, "bloomCols"))
  }

  /** REPLACE TABLE was never part of the declared surface (DROP +
    * CREATE is the supported spelling); refuse loudly rather than
    * half-replace. */
  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : StagedTable =
    throw new UnsupportedOperationException(
      "graft catalog: REPLACE TABLE is not supported — DROP TABLE then " +
        "CREATE TABLE (or restore/overwrite for data-only replacement)")

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : StagedTable =
    if (tableExists(ident)) stageReplace(ident, schema, partitions, properties)
    else stageCreate(ident, schema, partitions, properties)

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tablePath(ident).toString
    changes.foreach {
      case d: TableChange.DeleteColumn =>
        ManifestTable.dropColumn(spark, dir,
          d.fieldNames.mkString("."))
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "graft catalog: only top-level ADD COLUMN is supported")
        ManifestTable.addColumns(spark, dir, Seq(
          org.apache.spark.sql.types.StructField(
            a.fieldNames.head, a.dataType, nullable = true)))
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "graft catalog: only top-level RENAME COLUMN is supported")
        ManifestTable.renameColumn(spark, dir, r.fieldNames.head,
          r.newName)
      case ac: TableChange.AddConstraint => ac.constraint match {
        case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
          // one metadata commit; the engine validates EXISTING data
          // first and then enforces the predicate on every write
          ManifestTable.alterConstraints(spark, dir,
            add = Map(c.name -> c.predicateSql))
        case other => throw new UnsupportedOperationException(
          s"graft catalog: only CHECK constraints are enforced, got " +
            other.toDDL)
      }
      case dc: TableChange.DropConstraint =>
        val have = ManifestTable.snapshot(spark, dir).constraints
        if (!have.contains(dc.name) && dc.ifExists) ()
        else ManifestTable.alterConstraints(spark, dir,
          drop = Set(dc.name))
      case other => throw new UnsupportedOperationException(
        s"graft catalog: unsupported ALTER $other — use the Scala " +
          "facade for constraints/layout DDL")
    }
    graftTable(ident, Map.empty)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tablePath(ident)
    isTable(dir) && fs.delete(dir, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent0: Identifier)
      : Unit = {
    // Spark hands RENAME TO's target with the CATALOG name still in its
    // namespace (the target side is parser-resolved, not catalog-
    // resolved) — strip it, or the table silently moves into a
    // warehouse subdir named after the catalog. Disambiguation for a
    // warehouse with a GENUINE namespace named like the catalog
    // (`lake.lake.t`): prefer the literal namespace when it actually
    // exists AND the catalog-qualified reading does not (an existing
    // `lake/lake` dir with no existing `lake/` target parent is
    // unambiguous the other way); when both readings resolve, the
    // catalog-qualified one wins because that is what Spark's parser
    // produced for every unquoted RENAME TO.
    val stripped = Identifier.of(newIdent0.namespace.tail, newIdent0.name)
    val newIdent =
      if (!newIdent0.namespace.headOption.contains(catalogName)) newIdent0
      else if (namespaceExists(newIdent0.namespace) &&
        !namespaceExists(stripped.namespace)) newIdent0
      else stripped
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val dst = tablePath(newIdent)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(tablePath(oldIdent), dst))
      sys.error(s"graft catalog: rename $oldIdent -> $newIdent failed")
  }

  // -------------------------------------------------- procedures

  /** SQL maintenance entry points (round-15 verdict #3) — at 100 TB,
    * maintenance is run by schedulers speaking SQL, not Scala:
    *
    * {{{
    * CALL lake.system.compact(table => 'ns.t', small_mb => 32,
    *                          target_mb => 128);
    * CALL lake.system.zorder(table => 'ns.t', columns => 'a,b');
    * CALL lake.system.vacuum(table => 'ns.t', keep_last => 3,
    *                         retain_hours => 168);
    * CALL lake.system.purge_vectors(table => 'ns.t');
    * CALL lake.system.restore(table => 'ns.t', version => 4);
    * CALL lake.system.checkpoint(table => 'ns.t');
    * }}}
    *
    * Each is a thin binding onto the facade operation of the same name
    * (GraftCatalogSpec pins per-procedure that CALL ≡ facade on twin
    * tables), so SQL schedulers and Scala jobs share one maintenance
    * code path. The `table` argument is the catalog-relative
    * `namespace.table` string. */
  private def tableDirOf(table: String): String = {
    val parts = table.split('.').toSeq
    val ident = Identifier.of(parts.init.toArray, parts.last)
    val dir = tablePath(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    dir.toString
  }

  private def proc(pname: String, doc: String,
      params: Seq[ProcedureParameter])(
      body: InternalRow => Unit): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = doc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = pname
          override def description(): String = doc
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            body(input)
            java.util.Collections.emptyIterator[Scan]()
          }
        }
    }

  private def p(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()
  private def pd(n: String, t: DataType, d: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(d).build()
  private def str(r: InternalRow, i: Int): String =
    r.getUTF8String(i).toString

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftCatalog.ProcedureNames
      .map(n => Identifier.of(Array("system"), n)).toArray

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.isEmpty ||
      ident.namespace.sameElements(Array("system")),
      s"graft catalog: procedures live in the system namespace, got $ident")
    ident.name match {
      case "compact" => proc("compact",
        "bin-pack small files: compact(table, small_mb, target_mb, " +
          "predicate) — predicate scopes the compaction to files whose " +
          "bounds may match it (OPTIMIZE ... WHERE)",
        Seq(p("table", StringType), pd("small_mb", LongType, "32"),
          pd("target_mb", LongType, "128"),
          pd("predicate", StringType, "''"))) { r =>
        val pred = str(r, 3)
        ManifestTable.compact(spark, tableDirOf(str(r, 0)),
          smallBytes = r.getLong(1) << 20, targetBytes = r.getLong(2) << 20,
          where = if (pred.isEmpty) None
            else Some(org.apache.spark.sql.functions.expr(pred)))
      }
      case "zorder" => proc("zorder",
        "rewrite ALL files in Z-order: zorder(table, columns, target_mb)",
        Seq(p("table", StringType), p("columns", StringType),
          pd("target_mb", LongType, "128"))) { r =>
        val cols = str(r, 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        ManifestTable.compact(spark, tableDirOf(str(r, 0)),
          smallBytes = Long.MaxValue, targetBytes = r.getLong(2) << 20,
          zorderBy = cols)
      }
      case "vacuum" => proc("vacuum",
        "drop unreferenced files: vacuum(table, keep_last, retain_hours)",
        Seq(p("table", StringType), pd("keep_last", LongType, "1"),
          pd("retain_hours", LongType, "0"))) { r =>
        ManifestTable.vacuum(spark, tableDirOf(str(r, 0)),
          keepLast = r.getLong(1).toInt,
          retainMillis = r.getLong(2) * 3600L * 1000L)
      }
      case "purge_vectors" => proc("purge_vectors",
        "materialize all deletion vectors: purge_vectors(table)",
        Seq(p("table", StringType))) { r =>
        ManifestTable.purgeVectors(spark, tableDirOf(str(r, 0)))
      }
      case "restore" => proc("restore",
        "roll the table back to a version: restore(table, version)",
        Seq(p("table", StringType), p("version", LongType))) { r =>
        ManifestTable.restore(spark, tableDirOf(str(r, 0)), r.getLong(1))
      }
      case "checkpoint" => proc("checkpoint",
        "force a full log checkpoint: checkpoint(table)",
        Seq(p("table", StringType))) { r =>
        ManifestTable.checkpoint(spark, tableDirOf(str(r, 0)))
      }
      case "clone" => proc("clone",
        "zero-copy shallow clone: clone(table, target, version)",
        Seq(p("table", StringType), p("target", StringType),
          pd("version", LongType, "-1"))) { r =>
        val srcDir = tableDirOf(str(r, 0))
        val parts = str(r, 1).split('.').toSeq
        val dst = tablePath(Identifier.of(parts.init.toArray, parts.last))
        fs.mkdirs(dst.getParent)
        val v = r.getLong(2)
        ManifestTable.cloneTable(spark, srcDir, dst.toString,
          if (v < 0) None else Some(v))
      }
      case "history" => new UnboundProcedure {
        // the one procedure that RETURNS rows (DESCRIBE HISTORY):
        // the snapshot log as (version, operation, ts, files, rows,
        // bytes) through a LocalScan — metadata-sized by construction
        override def name(): String = "history"
        override def description(): String =
          "the table's snapshot log: history(table)"
        override def bind(inputType: StructType): BoundProcedure =
          new BoundProcedure {
            override def name(): String = "history"
            override def description(): String =
              "the table's snapshot log: history(table)"
            override def parameters(): Array[ProcedureParameter] =
              Array(p("table", StringType))
            override def isDeterministic: Boolean = false
            override def call(input: InternalRow)
                : java.util.Iterator[Scan] = {
              val snaps = ManifestTable.history(spark,
                tableDirOf(str(input, 0)))
              val schema = StructType(Seq(
                org.apache.spark.sql.types.StructField("version", LongType),
                org.apache.spark.sql.types.StructField("operation", StringType),
                org.apache.spark.sql.types.StructField("ts_millis", LongType),
                org.apache.spark.sql.types.StructField("n_files", LongType),
                org.apache.spark.sql.types.StructField("n_rows", LongType),
                org.apache.spark.sql.types.StructField("n_bytes", LongType)))
              val histRows = snaps.map { s =>
                InternalRow.fromSeq(Seq(s.version,
                  org.apache.spark.unsafe.types.UTF8String
                    .fromString(s.operation),
                  s.ts, s.files.size.toLong, s.totalRows, s.totalBytes))
              }.toArray
              val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
                override def rows(): Array[InternalRow] = histRows
                override def readSchema(): StructType = schema
              }
              java.util.Collections.singletonList(scan).iterator()
            }
          }
      }
      case "detail" => new UnboundProcedure {
        // DESCRIBE DETAIL (round-16 verdict #6): one row of snapshot
        // totals, layout/bloom spec, DV pressure and CHECKPOINT HEALTH
        // (last checkpoint + the replay suffix a cold read pays) — at
        // 100 TB, operators read table health through SQL, not Scala.
        override def name(): String = "detail"
        override def description(): String =
          "snapshot totals, spec, DV and checkpoint health: detail(table)"
        override def bind(inputType: StructType): BoundProcedure =
          new BoundProcedure {
            override def name(): String = "detail"
            override def description(): String =
              "snapshot totals, spec, DV and checkpoint health: detail(table)"
            override def parameters(): Array[ProcedureParameter] =
              Array(p("table", StringType))
            override def isDeterministic: Boolean = false
            override def call(input: InternalRow)
                : java.util.Iterator[Scan] = {
              val dir = tableDirOf(str(input, 0))
              val s = ManifestTable.snapshot(spark, dir)
              val (_, lastCk, replayLen) = ManifestTable.logHealth(spark, dir)
              def utf(x: String) =
                org.apache.spark.unsafe.types.UTF8String.fromString(x)
              val schema = StructType(Seq(
                org.apache.spark.sql.types.StructField("version", LongType),
                org.apache.spark.sql.types.StructField("operation", StringType),
                org.apache.spark.sql.types.StructField("ts_millis", LongType),
                org.apache.spark.sql.types.StructField("n_files", LongType),
                org.apache.spark.sql.types.StructField("n_rows", LongType),
                org.apache.spark.sql.types.StructField("n_bytes", LongType),
                org.apache.spark.sql.types.StructField("stats_cols", StringType),
                org.apache.spark.sql.types.StructField("partition_cols", StringType),
                org.apache.spark.sql.types.StructField("bloom_cols", StringType),
                org.apache.spark.sql.types.StructField("n_constraints", LongType),
                org.apache.spark.sql.types.StructField("dropped_cols", StringType),
                org.apache.spark.sql.types.StructField("renamed_cols", StringType),
                org.apache.spark.sql.types.StructField("n_dv_files", LongType),
                org.apache.spark.sql.types.StructField("max_dv_stack", LongType),
                org.apache.spark.sql.types.StructField("last_checkpoint", LongType),
                org.apache.spark.sql.types.StructField("replay_len", LongType),
                org.apache.spark.sql.types.StructField("ckpt_write_failures", LongType)))
              val row = InternalRow.fromSeq(Seq(
                s.version, utf(s.operation), s.ts,
                s.files.size.toLong, s.totalRows, s.totalBytes,
                utf(s.statsCols.mkString(",")),
                utf(s.partitionCols.mkString(",")),
                utf(s.bloomCols.mkString(",")),
                s.constraints.size.toLong,
                utf(s.dropped.mkString(",")),
                utf(s.renames.keys.toSeq.sorted.mkString(",")),
                s.dvs.count(_._2.nonEmpty).toLong,
                s.dvs.values.map(_.size).maxOption.getOrElse(0).toLong,
                lastCk.getOrElse(-1L), replayLen,
                // per-TABLE failure count: one sick table must not
                // inflate every table's health row
                graft.table.ManifestTable.checkpointWriteFailures(dir)))
              val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
                override def rows(): Array[InternalRow] = Array(row)
                override def readSchema(): StructType = schema
              }
              java.util.Collections.singletonList(scan).iterator()
            }
          }
      }
      case other => throw new UnsupportedOperationException(
        s"graft catalog: no procedure $other — available: " +
          GraftCatalog.ProcedureNames.mkString(", "))
    }
  }

  // --------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(warehouse)) Array.empty
    else fs.listStatus(warehouse)
      .filter(s => s.isDirectory && !isTable(s.getPath))
      .map(s => Array(s.getPath.getName))

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else {
      val p = nsPath(namespace)
      if (!fs.exists(p)) throw new NoSuchNamespaceException(
        (catalogName +: namespace))
      fs.listStatus(p).filter(s => s.isDirectory && !isTable(s.getPath))
        .map(s => namespace :+ s.getPath.getName)
    }
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(nsPath(namespace)) && !isTable(nsPath(namespace)))

  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      (catalogName +: namespace))
    Map("location" -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(
        (catalogName +: namespace))
    fs.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean)
      : Boolean = {
    val p = nsPath(namespace)
    if (!namespaceExists(namespace)) false
    else if (!cascade && fs.listStatus(p).nonEmpty)
      sys.error(s"graft catalog: namespace ${namespace.mkString(".")} " +
        "is not empty — use CASCADE")
    else fs.delete(p, true)
  }
}

/** The table a staged CTAS writes into before it exists: data files are
  * staged under the final table dir with NO log record (a table IS its
  * `_graft_log`, so nothing is visible), and version 0 is published
  * only by commitStagedChanges — Spark's atomic-CTAS protocol then
  * guarantees readers can never observe a half-created table, and
  * abort deletes the staged bytes. */
private[sources] class GraftStagedTable(dir: String,
    tableSchema: StructType, statsCols: Seq[String],
    partitionCols: Seq[String], bloomCols: Seq[String])
    extends StagedTable with SupportsWrite {

  private def spark: SparkSession = SparkSession.active
  @volatile private var staged: Vector[ManifestTable.FileEntry] =
    Vector.empty

  override def name(): String = s"graft.`$dir`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: Dataset[Row], overwrite: Boolean)
                : Unit =
              staged = ManifestTable.stageForCreate(spark, dir, data,
                statsCols, partitionCols, bloomCols)
          }
      }
    }

  override def commitStagedChanges(): Unit =
    ManifestTable.publishCreate(spark, dir, tableSchema.json,
      statsCols, partitionCols, bloomCols, staged)

  override def abortStagedChanges(): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    // staged paths are table-relative `data/<commitId>/…` — drop the
    // whole per-stage commit dirs, leaving no orphan bytes behind
    staged.map(f => f.path.split('/').take(2).mkString("/")).distinct
      .foreach { d =>
        val p = new Path(dir, d)
        p.getFileSystem(c).delete(p, true)
      }
  }
}

object GraftCatalog {
  /** The CALL surface, in `system` namespace. */
  val ProcedureNames: Seq[String] = Seq(
    "compact", "zorder", "vacuum", "purge_vectors", "restore",
    "checkpoint", "history", "clone", "detail")
}
