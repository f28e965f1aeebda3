package graft.sources

import scala.collection.immutable.{Map => IMap}

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.table.ManifestTable

/** The manifest table's change feed as a REAL Structured Streaming
  * source — `spark.readStream.format("graft-changefeed")
  * .option("path", dir).load()` — so a table plugs into the full
  * streaming surface (watermarks, windowed aggs, joins, any sink)
  * instead of only the poll loop ([[graft.streaming.StreamOps
  * .pollTableChanges]] remains the no-machinery alternative).
  *
  * Offsets ARE snapshot versions: `getOffset` is one manifest-listing
  * call, `getBatch(s, e]` unions the STRUCTURAL changelog of each
  * commit in the range — per-commit granularity, so every row carries
  * `_change` ('I'/'D') and `_commit_version` (the CDF shape). Reading
  * is manifest-priced: only files that changed hands in (s, e] are
  * scanned, never the table. Exactly-once falls out of the engine's
  * offset log: after a restart the checkpointed version is replayed
  * deterministically (manifests are immutable until vacuum; a vacuum
  * that outruns a lagging consumer fails the read loudly, the
  * standard retention trade).
  *
  * `startingVersion` (default 0) sets the horizon for the FIRST
  * batch: deltas after that version — consumers wanting the base
  * content read it batch-side first (same contract as the poll loop).
  * The schema is fixed at stream start (the head snapshot's, plus the
  * two change columns); additive evolution mid-stream surfaces after
  * a restart.
  */
class ChangeFeedSource(sqlContext: SQLContext, dir: String,
    startingVersion: Long, maxFilesPerTrigger: Option[Int] = None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit, ReadMaxFiles}

  private val spark = sqlContext.sparkSession
  private val tableSchema = ManifestTable.snapshot(spark, dir).schema

  override val schema: StructType = ChangeFeedSource.feedSchema(tableSchema)

  private def ver(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case so: SerializedOffset => LongOffset(so).offset
    case other => sys.error(s"graft-changefeed: alien offset $other")
  }

  override def getOffset: Option[V1Offset] =
    ManifestTable.latestVersion(spark, dir)
      .filter(_ > startingVersion).map(LongOffset.apply)

  /** ADMISSION CONTROL (`option("maxFilesPerTrigger", n)`), the CDC
    * twin of the append source's: a restart against a deep commit
    * backlog drains over micro-batches of ~n CHANGED-HANDS files
    * (added + removed effective content — exactly what getBatch will
    * scan) instead of landing the whole history in one batch. Whole
    * commits, always ≥ 1 per trigger; counted from one LAZY forward
    * replay over the admitted prefix only, no data IO. */
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(startOffset: V2Offset, limit: ReadLimit)
      : V2Offset = {
    ManifestTable.latestVersion(spark, dir).filter(_ > startingVersion) match {
      case None => null
      case Some(h) =>
        val from = Option(startOffset)
          .map(o => ver(o.asInstanceOf[V1Offset]) + 1)
          .getOrElse(startingVersion + 1)
        if (from > h) return Option(startOffset).orNull
        val end = limit match {
          case mf: ReadMaxFiles =>
            var taken = 0
            var endV = from // always include at least one commit
            ManifestTable.snapshotPairs(spark, dir, from, h)
              .takeWhile { case (prev, cur) =>
                def eff(s: ManifestTable.Snapshot) = s.files.map(f =>
                  f.path -> s.dvs.getOrElse(f.path, Vector.empty)).toMap
                val pEff = prev.map(eff).getOrElse(
                  Map.empty[String, Vector[String]])
                val cEff = eff(cur)
                val changed =
                  cur.files.count(f => !pEff.get(f.path).contains(cEff(f.path))) +
                    prev.map(_.files.count(f =>
                      !cEff.get(f.path).contains(pEff(f.path)))).getOrElse(0)
                val first = cur.version == from
                if (first || taken + changed <= mf.maxFiles()) {
                  taken += changed
                  endV = cur.version
                  true
                } else false
              }.foreach(_ => ())
            endV
          case _ => h
        }
        LongOffset(end)
    }
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    val to = ver(end)
    val cols = tableSchema.fieldNames.toSeq.map(col) :+
      col("_change") :+ col("_commit_version")
    val steps = ((from + 1) to to).map { v =>
      ManifestTable.changesStructural(spark, dir, v - 1, v)
        .withColumn("_commit_version", lit(v))
        .select(cols: _*)
    }
    val batch = steps.reduceOption(_ unionAll _).getOrElse(
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[org.apache.spark.sql.Row], schema))
    org.apache.spark.sql.GraftSqlBridge.streamingFrame(batch)
  }

  override def stop(): Unit = ()
}

object ChangeFeedSource {
  /** The feed's schema for a given table schema (exposed for sinks
    * that re-read the feed's files with an explicit schema). */
  def feedSchema(table: StructType): StructType =
    StructType(table.fields :+
      org.apache.spark.sql.types.StructField("_change", StringType,
        nullable = false) :+
      org.apache.spark.sql.types.StructField("_commit_version", LongType,
        nullable = false))
}

/** `.format("graft-changefeed")` registration (DataSourceRegister via
  * META-INF/services, or the fully-qualified class name). */
class ChangeFeedProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changefeed"

  private def dirOf(parameters: IMap[String, String]): String =
    parameters.getOrElse("path", sys.error(
      "graft-changefeed: option(\"path\", <table dir>) is required"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: IMap[String, String]): (String, StructType) =
    ("graft-changefeed", ChangeFeedSource.feedSchema(
      ManifestTable.snapshot(sqlContext.sparkSession,
        dirOf(parameters)).schema))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: IMap[String, String]): Source =
    new ChangeFeedSource(sqlContext, dirOf(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
      parameters.get("maxFilesPerTrigger").map(_.toInt))
}
