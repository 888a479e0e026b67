package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.catalog.{ChangeFeed, SnapshotTable}

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
  * RETENTION CONTRACT: offsets are versions, so [[SnapshotTable.vacuum]]'s
  * `keepVersions` must stay >= the stream's worst-case checkpoint lag (in
  * versions). A checkpointed stream resuming from an offset whose manifest
  * vacuum expired fails LOUDLY with the `IllegalStateException` raised by
  * [[SnapshotTable.changesBetween]] — never a silent gap in delivery.
  *
  * SCHEMA CONTRACT: the source schema is pinned when the query starts.
  * Additive evolution under a running stream is tolerated — each batch is
  * projected back to the pinned columns (new columns surface only after a
  * restart, like Delta). A batch whose files DROP or RETYPE a pinned
  * column fails loudly with "restart the query" rather than emitting
  * frames that no longer match the declared schema.
  *
  * Usage: `spark.readStream.format(classOf[SnapshotSourceProvider].getName)
  * .option("path", dir).load()`. Rate limiting:
  * `maxVersionsPerBatch` bounds how many VERSIONS a micro-batch may span;
  * `maxFilesPerBatch` additionally bounds how many FILES it may deliver
  * (one version can carry arbitrarily many files — Delta's
  * maxFilesPerTrigger idea). Both caps always let at least one version
  * through, so an oversized commit surfaces alone instead of stalling.
  * `startingVersion` / `startingTimestamp` (mutually exclusive) skip the
  * older backfill on a FRESH query — checkpointed restarts keep their
  * recovered offsets, exactly like Delta.
  *
  * CHANGE-FEED MODE (`.option("readChangeFeed", "true")` +
  * `.option("changeFeedKeys", "k1,k2")` — Delta's streaming CDF analog):
  * each micro-batch is [[ChangeFeed.rowChanges]] over the version window
  * instead of the raw added files, so the APPEND-ONLY contract lifts —
  * merge/delete/update commits stream as row-level
  * `_change_type`/`_commit_version` changes (update pre+post images),
  * compactions pass as metadata-only silence, and the initial backfill
  * surfaces as plain inserts. The schema gains the two change columns;
  * everything else (version offsets, exactly-once recovery, rate caps,
  * vacuum-expiry loudness via rowChanges' own retention check, schema
  * pinning) behaves identically.
  */
class SnapshotStreamSource(sqlContext: SQLContext, dir: String,
    maxVersionsPerBatch: Option[Long] = None,
    maxFilesPerBatch: Option[Long] = None,
    changeFeedKeys: Option[Seq[String]] = None,
    // deliver changes from this VERSION onward (skip the older backfill);
    // resolved from startingTimestamp by the provider. Only a FRESH query
    // consults it — on checkpoint restart the engine drives getBatch with
    // the recovered offsets, exactly like Delta ignores startingVersion
    // once a checkpoint exists.
    startingVersion: Option[Long] = None) extends Source {
  require(maxVersionsPerBatch.forall(_ >= 1L),
    s"maxVersionsPerBatch must be >= 1, got $maxVersionsPerBatch")
  require(maxFilesPerBatch.forall(_ >= 1L),
    s"maxFilesPerBatch must be >= 1, got $maxFilesPerBatch")
  require(startingVersion.forall(_ >= 1L),
    s"startingVersion must be >= 1, got $startingVersion")

  require(changeFeedKeys.forall(_.nonEmpty),
    "changeFeedKeys must name at least one key column")

  private val spark = sqlContext.sparkSession
  private val schema0: StructType = {
    val m = SnapshotTable.currentManifest(spark, dir).getOrElse(throw new IllegalStateException(
      s"cannot stream from $dir: no committed snapshot (create the table first)"))
    StructType.fromDDL(m.schemaDdl.getOrElse(throw new IllegalStateException(
      s"cannot stream from $dir: manifest records no schema")))
  }
  changeFeedKeys.toSeq.flatten.foreach(k => require(schema0.fieldNames.contains(k),
    s"changeFeedKeys column '$k' not in snapshot schema " +
      schema0.fieldNames.mkString("[", ", ", "]")))

  /** The declared source schema: the table schema, plus the two change
    * columns in change-feed mode.
    */
  private val declared: StructType = changeFeedKeys.fold(schema0)(_ =>
    schema0.add(ChangeFeed.ChangeTypeCol, "string", nullable = false)
      .add(ChangeFeed.CommitVersionCol, "long", nullable = false))

  // Rate limiting: the highest version this source has already SURFACED
  // (returned from getOffset, replayed through getBatch, or confirmed via
  // commit — the engine calls commit with the restored offset on restart,
  // which is what re-anchors the cap after a recovery). Without a cap, a
  // backfill over a long table history would arrive as one giant first
  // micro-batch; with it, the first offset advances at most
  // maxVersionsPerBatch versions per poll — Delta's maxFilesPerTrigger
  // idea, at version granularity.
  //
  // Anchored at (earliest retained version - 1), NOT 0: on a table whose
  // early manifests vacuum expired, a 0-anchored cap would hand getBatch
  // an end offset below the earliest retained manifest and permanently
  // fail the stream on a missing manifest — while the very same stream
  // without rate limiting (offset = current) would have worked. The first
  // capped batch then starts from the oldest history that still exists,
  // exactly what the uncapped backfill delivers.
  // a fresh query's first batch window opens at (startingVersion - 1):
  // versions <= the anchor are never delivered.
  //
  // VACUUM COUPLING: the anchor's BASE manifest is (startingVersion - 1),
  // and changesBetween refuses any non-zero version vacuum expired. On a
  // vacuumed table, startingVersion == the earliest RETAINED version (or
  // a startingTimestamp predating retained history, which
  // versionSinceTimestamp resolves to it) would make the first getBatch
  // reference an expired base and permanently fail the stream — so a
  // pre-earliest anchor resolves to base 0 (the empty set): the first
  // batch is the full retained backfill, exactly what
  // versionSinceTimestamp's fallback contract documents ("starting empty
  // would silently DROP retained history"). Retained versions are a
  // contiguous suffix (vacuum expires a prefix), so "expired" is exactly
  // "below the earliest retained version"; an anchor AT or ABOVE it
  // stays as requested, and a future anchor just starts the stream empty.
  private val initialFrom: Long = {
    val raw = startingVersion.map(_ - 1L).getOrElse(0L)
    if (raw > 0L && SnapshotTable.versions(spark, dir).headOption.exists(raw < _)) 0L
    else raw
  }

  private var surfaced: Long = math.max(initialFrom,
    SnapshotTable.versions(spark, dir).headOption.map(_ - 1L).getOrElse(0L))

  override def schema: StructType = declared

  override def getOffset: Option[Offset] = synchronized {
    SnapshotTable.versions(spark, dir).lastOption.map { cur =>
      val vCap = maxVersionsPerBatch.fold(cur)(k => math.min(cur, surfaced + k))
      val next = maxFilesPerBatch match {
        case Some(mf) if vCap > surfaced =>
          SnapshotTable.capVersionByFiles(spark, dir, surfaced, vCap, mf)
        case _ => vCap
      }
      // never BELOW the anchor/high-water mark: with a future
      // startingVersion (anchor above the table's current version) the
      // raw `cur` would land in the offset log, and once the table grows
      // past the anchor a later getBatch(log, newer) would deliver the
      // pre-anchor versions the anchor contract promises to skip. Clamped,
      // the logged offset IS the anchor and the first real window opens
      // exactly there.
      val bounded = math.max(next, surfaced)
      surfaced = bounded
      LongOffset(bounded)
    }
  }

  // offsets arrive as LongOffset while running and as SerializedOffset
  // (raw json) after a restart; LongOffset's json is just the number
  private def version(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(version).getOrElse(initialFrom)
    val to = version(end)
    synchronized { surfaced = math.max(surfaced, to) }
    val batch = (from >= to, changeFeedKeys) match {
      case (true, _) => // recovery replay of an empty window
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared)
      case (false, Some(keys)) =>
        conform(ChangeFeed.rowChanges(spark, dir, from, to, keys))
      case (false, None) =>
        conform(SnapshotTable.changesBetween(spark, dir, from, to))
    }
    org.apache.spark.sql.graftbridge.Bridge.asStreamingFrame(batch)
  }

  /** Pin every batch to the schema declared at query start. changesBetween
    * reads with the window's LATEST manifest schema, so an additive
    * evolution mid-stream would otherwise hand Spark frames wider than the
    * source's declared schema — an analysis error (or worse, a silent
    * positional mismatch) far from its cause. Additive drift projects back
    * to the pinned columns; a dropped or retyped pinned column is a
    * contract violation and fails with instructions, not a stack trace.
    */
  private def conform(df: DataFrame): DataFrame = {
    if (df.schema == declared) df
    else {
      val have = df.schema.map(f => f.name -> f.dataType).toMap
      val broken = declared.filter(f => !have.get(f.name).contains(f.dataType))
      if (broken.nonEmpty) throw new IllegalStateException(
        s"snapshot table at $dir evolved incompatibly under a running stream " +
          s"(pinned column(s) ${broken.map(_.name).mkString(", ")} missing or retyped); " +
          "restart the query to pick up the new schema")
      df.select(declared.map(f => col(s"`${f.name}`")): _*)
    }
  }

  override def commit(end: Offset): Unit =
    synchronized { surfaced = math.max(surfaced, version(end)) }

  override def stop(): Unit = ()
}

/** DSv1 provider: `.format(classOf[SnapshotSourceProvider].getName)` +
  * `.option("path", dir)`. Optional rate limits:
  * `.option("maxVersionsPerBatch", k)` and `.option("maxFilesPerBatch", n)`.
  * Change-feed mode: `.option("readChangeFeed", "true")` +
  * `.option("changeFeedKeys", "k1,k2")`.
  */
class SnapshotSourceProvider extends StreamSourceProvider {

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "snapshot stream source requires .option(\"path\", <table dir>)"))

  private def keysOf(parameters: Map[String, String]): Option[Seq[String]] =
    if (!parameters.get("readChangeFeed").exists(_.toBoolean)) None
    else Some(parameters.getOrElse("changeFeedKeys", throw new IllegalArgumentException(
      "readChangeFeed requires .option(\"changeFeedKeys\", \"k1,k2\") — the row-identity " +
        "columns the per-commit diff joins on (the table's merge keys)"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq)

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("graft-snapshot",
      new SnapshotStreamSource(sqlContext, dirOf(parameters),
        changeFeedKeys = keysOf(parameters)).schema)

  /** `startingVersion` / `startingTimestamp` (mutually exclusive) skip
    * the older backfill: deliver changes from that version on, or from
    * the first commit stamped at-or-after the timestamp
    * ([[SnapshotTable.versionSinceTimestamp]]). Timestamps parse as epoch
    * millis, an ISO-8601 instant (`2024-01-01T00:00:00Z`), or
    * `yyyy-MM-dd HH:mm:ss` read as UTC — never the JVM default zone,
    * which would make the same checkpoint resolve differently per driver.
    */
  private def startOf(sqlContext: SQLContext,
      parameters: Map[String, String]): Option[Long] = {
    val sv = parameters.get("startingVersion").map(_.toLong)
    val st = parameters.get("startingTimestamp")
    require(sv.isEmpty || st.isEmpty,
      "startingVersion and startingTimestamp are mutually exclusive")
    sv.orElse(st.map { s =>
      SnapshotTable.versionSinceTimestamp(sqlContext.sparkSession,
        dirOf(parameters), parseTsMillis(s))
    })
  }

  private def parseTsMillis(s: String): Long =
    if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
    else scala.util.Try(java.time.Instant.parse(s).toEpochMilli).getOrElse {
      java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotStreamSource(sqlContext, dirOf(parameters),
      parameters.get("maxVersionsPerBatch").map(_.toLong),
      parameters.get("maxFilesPerBatch").map(_.toLong),
      keysOf(parameters),
      startOf(sqlContext, parameters))
}
