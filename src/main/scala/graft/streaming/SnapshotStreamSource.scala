package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.catalog.SnapshotTable

/** The snapshot table as a STRUCTURED STREAMING SOURCE — "stream the
  * table", the consumption mode that turns every committed append into a
  * micro-batch (Delta's signature streaming feature, served through
  * Spark's DSv1 `Source` seam like Delta's own DeltaSource):
  *
  *  - Offsets ARE version numbers. The commit protocol already totally
  *    orders versions and makes them immutable, so offset bookkeeping is
  *    free and restart-safe — no extra log, the table's `_log` is the
  *    stream's source of truth.
  *  - `getBatch(from, to)` is [[SnapshotTable.changesBetween]]: exactly
  *    the files committed in that version window, read through the
  *    ordinary scan path. Nothing is re-read and nothing is buffered —
  *    a micro-batch costs O(files added in the window).
  *  - Exactly-once delivery across restarts comes from Spark's offset log
  *    (committed version ranges are never re-delivered) on top of the
  *    table's own immutability.
  *
  * APPEND-ONLY tables, like [[SnapshotTable.changesBetween]] documents:
  * merge/compact rewrite files, which a file-level CDC would double-count
  * — the same contract Delta's source enforces with
  * ignoreChanges/ignoreDeletes. The exactly-once WRITE side is
  * [[SnapshotSink]]; together they close the loop: table → stream →
  * table with end-to-end exactly-once.
  *
  * Usage: `spark.readStream.format(classOf[SnapshotSourceProvider].getName)
  * .option("path", dir).load()`.
  */
class SnapshotStreamSource(sqlContext: SQLContext, dir: String,
    maxVersionsPerBatch: Option[Long] = None) extends Source {
  require(maxVersionsPerBatch.forall(_ >= 1L),
    s"maxVersionsPerBatch must be >= 1, got $maxVersionsPerBatch")

  private val spark = sqlContext.sparkSession
  private val schema0: StructType = {
    val m = SnapshotTable.currentManifest(spark, dir).getOrElse(throw new IllegalStateException(
      s"cannot stream from $dir: no committed snapshot (create the table first)"))
    StructType.fromDDL(m.schemaDdl.getOrElse(throw new IllegalStateException(
      s"cannot stream from $dir: manifest records no schema")))
  }

  // Rate limiting: the highest version this source has already SURFACED
  // (returned from getOffset, replayed through getBatch, or confirmed via
  // commit — the engine calls commit with the restored offset on restart,
  // which is what re-anchors the cap after a recovery). Without a cap, a
  // backfill over a long table history would arrive as one giant first
  // micro-batch; with it, the first offset advances at most
  // maxVersionsPerBatch versions per poll — Delta's maxFilesPerTrigger
  // idea, at version granularity.
  private var surfaced: Long = 0L

  override def schema: StructType = schema0

  override def getOffset: Option[Offset] = synchronized {
    SnapshotTable.versions(spark, dir).lastOption.map { cur =>
      val next = maxVersionsPerBatch.fold(cur)(k => math.min(cur, surfaced + k))
      surfaced = math.max(surfaced, next)
      LongOffset(next)
    }
  }

  // offsets arrive as LongOffset while running and as SerializedOffset
  // (raw json) after a restart; LongOffset's json is just the number
  private def version(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(version).getOrElse(0L)
    val to = version(end)
    synchronized { surfaced = math.max(surfaced, to) }
    val batch =
      if (from >= to) // recovery replay of an empty window
        SnapshotTable.read(spark, dir).limit(0)
      else SnapshotTable.changesBetween(spark, dir, from, to)
    org.apache.spark.sql.graftbridge.Bridge.asStreamingFrame(batch)
  }

  override def commit(end: Offset): Unit =
    synchronized { surfaced = math.max(surfaced, version(end)) }

  override def stop(): Unit = ()
}

/** DSv1 provider: `.format(classOf[SnapshotSourceProvider].getName)` +
  * `.option("path", dir)`.
  */
class SnapshotSourceProvider extends StreamSourceProvider {

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "snapshot stream source requires .option(\"path\", <table dir>)"))

  private def maxVersionsOf(parameters: Map[String, String]): Option[Long] =
    parameters.get("maxVersionsPerBatch").map(_.toLong)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("graft-snapshot", new SnapshotStreamSource(sqlContext, dirOf(parameters)).schema)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotStreamSource(sqlContext, dirOf(parameters), maxVersionsOf(parameters))
}
