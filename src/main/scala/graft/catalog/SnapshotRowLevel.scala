package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL `UPDATE` and `MERGE INTO` (and non-filter-shaped `DELETE`) on the
  * snapshot table, through Spark's row-level-operation contract
  * (`SupportsRowLevelOperations`): the analyzer rewrites the command into a
  * group-based `ReplaceData` plan — read the affected groups, recompute
  * their rows, write replacements — and this operation supplies the two
  * halves Spark composes it from, GROUP = FILE:
  *
  *  - the SCAN ([[CowScanBuilder]]): Spark pushes the command's condition
  *    for GROUP PRUNING only, so the candidate set is the manifest entries
  *    whose per-file stats admit a matching row — the same
  *    [[FileStats.mayMatch]] walk [[SnapshotTable.delete]] prunes with —
  *    and the scan then reads ALL rows of those files (a row-level scan
  *    must: unmatched rows of a replaced group survive only by being read
  *    and rewritten). Files the stats exonerate are never read and move to
  *    the new snapshot by reference. The scan also serves the [[FileCol]]
  *    metadata column the operation requires (see below).
  *  - the WRITE ([[CowBatchWrite]]): a real DSv2 parquet batch write —
  *    executors stream `InternalRow`s through Spark's own parquet
  *    `OutputWriterFactory` into a fresh per-commit subdirectory
  *    (invisible until a manifest lists them), commit messages carry the
  *    file names, and the driver publishes ONE version that atomically
  *    swaps the scanned files for the rewritten ones through the OCC
  *    commit loop. Raced appends rebase and land; a raced rewrite of any
  *    scanned file is a [[SnapshotTable.SnapshotConflictException]]
  *    surfaced to the SQL user (Delta's ConcurrentAppend/DeleteRead
  *    discipline).
  *
  * The operation REQUIRES the `_file` metadata attribute
  * ([[SnapshotMetadata]]) — not optional plumbing: Spark's group-based
  * rewrite plan carries an operation-type column next to the data columns,
  * and the executor write task only projects rows down to the declared
  * write schema on the with-metadata path (`DataAndMetadataWritingSparkTask`
  * — the same reason Iceberg's copy-on-write scans always request `_file`).
  * Requiring `_file` keeps this engine on the contract Spark actually
  * exercises, and gives SQL users row provenance for free
  * (`SELECT _file, * FROM snap...`).
  *
  * Copy-on-write, not delta: merge-on-read delete vectors are a different
  * format contract; COW keeps every published version a plain parquet file
  * list, which the whole snapshot stack (time travel, change feed,
  * streaming source, FileIndex) already understands.
  *
  * At 100 TB the candidate-pruning step is the difference between an
  * `UPDATE … WHERE dt = yesterday` rewriting one day's files and rewriting
  * the table; a MERGE whose ON condition carries no literal bounds
  * rewrites every candidate file — the keyed Scala API
  * ([[SnapshotTable.merge]]) remains the surgical path for key-addressed
  * upserts.
  *
  * Extends the reference's full-table staging swap
  * (`scripts/oracle_to_snowflake.py:89-99` replaces whole tables) with
  * row-addressed SQL mutations the reference cannot express.
  */
private[graft] class SnapshotCowOperation(
    val spark: SparkSession, val dir: String, cmd: Command,
    /** The ANALYZED table's manifest — the exact snapshot the command was
      * resolved against. Every half of this operation (candidate pruning,
      * the scan, the commit's conflict base) uses this one manifest: a
      * commit landing between analysis and scan planning must surface as
      * an OCC rebase/conflict at commit time, never as the plan silently
      * reading a different snapshot (or schema) than the one it was
      * resolved for.
      */
    private[catalog] val pinnedManifest: SnapshotTable.Manifest)
  extends RowLevelOperation {

  /** What the scan planned; the write commits against exactly this. Set
    * WRITE-ONCE by the first build (the ReplaceData scan — always planned
    * before the write runs) and only ever NARROWED afterwards (the
    * runtime group filter); later builds cannot clobber it.
    */
  @volatile private[catalog] var planned: Option[PlannedRewrite] = None

  private[catalog] def pinPlanned(p: PlannedRewrite): Unit =
    synchronized { if (planned.isEmpty) planned = Some(p) }

  /** Narrow the rewrite set to entries whose (url-encoded, SparkPath-form)
    * absolute path is in `keep` — the representation the `_file` column
    * emits, so the comparison is exact even for paths with URI-escapable
    * characters.
    */
  private[catalog] def narrowPlanned(keep: Set[String], qualifiedDir: Path): Unit =
    synchronized {
      planned = planned.map(p => p.copy(rewrite = p.rewrite.filter(e =>
        keep.contains(SparkPath.fromPath(new Path(qualifiedDir, e.path)).toString))))
    }

  override def command(): Command = cmd

  override def description(): String =
    s"snapshot copy-on-write ${cmd.toString.toLowerCase} at $dir"

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(SnapshotMetadata.FileCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CowScanBuilder(this, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val op = this
    val schema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def description(): String = op.description()
        override def toBatch: BatchWrite = new CowBatchWrite(op, schema)
      }
    }
  }
}

/** The snapshot table's metadata-column surface: `_file`, the absolute
  * path of the data file each row lives in (Iceberg's column of the same
  * name). Row-level operations require it (see [[SnapshotCowOperation]]);
  * users get provenance queries.
  */
private[graft] object SnapshotMetadata {
  val FileCol = "_file"

  object FileColumn extends MetadataColumn {
    override def name: String = FileCol
    override def dataType: DataType = StringType
    override def isNullable: Boolean = false
    override def comment: String = "absolute path of the data file the row lives in"
  }
}

/** The manifest a row-level operation ran against, and the candidate
  * (to-be-replaced) entries its scan planned.
  */
private[catalog] case class PlannedRewrite(
    base: SnapshotTable.Manifest, rewrite: Seq[SnapshotTable.FileEntry])

/** Scan half of the copy-on-write operation. Pushed filters are GROUP
  * filters: they prune candidate FILES via manifest stats and are all
  * reported back as residual, never applied row-wise — the scan returns
  * every row of every candidate file, which the `ReplaceData` plan needs
  * to carry unmatched rows into the replacement files. The data read
  * itself is Spark's own parquet batch scan over a [[SnapshotFileIndex]]
  * restricted to the candidates (plus the `_file` tag), so column pruning
  * and vectorized-free row decode compose as in any other snapshot read.
  */
private[catalog] class CowScanBuilder(
    op: SnapshotCowOperation, options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  // the OPERATION-pinned snapshot: every builder Spark creates from this
  // operation (main scan, runtime-filter subquery, EXPLAIN re-plans) sees
  // the same manifest — candidate pruning, the read, and the commit's
  // conflict check can never disagree about the base
  private val manifest = op.pinnedManifest
  private val tableSchema: StructType =
    StructType.fromDDL(manifest.schemaDdl.getOrElse(throw new IllegalStateException(
      s"snapshot at ${op.dir} has no recorded schema; row-level SQL needs one")))

  private var groupFilters: Array[Filter] = Array.empty
  private var required: StructType =
    tableSchema.add(SnapshotMetadata.FileCol, StringType, nullable = false)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    groupFilters = filters
    filters // ALL residual: group pruning only, rows must not be dropped
  }

  // reported as "pushed" for EXPLAIN: the subset that can actually prune
  override def pushedFilters(): Array[Filter] =
    groupFilters.filter(f => V1FilterColumns.toColumn(f).isDefined)

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val qualified = SnapshotTable.qualifiedDir(op.spark, op.dir)
    // `_file` conditions address files DIRECTLY: equality/IN prune by path
    // identity (the provenance-driven surgical rewrite), any other shape
    // on `_file` prunes nothing; only data-column filters go through the
    // stats walk — resolving a `_file` reference there would fail, the
    // column exists in no data schema
    val (fileFilters, dataFilters) =
      groupFilters.partition(_.references.contains(SnapshotMetadata.FileCol))
    val statCandidates = dataFilters.flatMap(V1FilterColumns.toColumn(_))
      .reduceOption(_ && _) match {
      case Some(pred) => SnapshotTable.pruneEntries(op.spark, manifest, pred)
      case None => manifest.entries
    }
    val candidates = fileFilters.foldLeft(statCandidates) { (cur, f) =>
      import org.apache.spark.sql.sources.{EqualTo, In}
      val wanted: Option[Set[String]] = f match {
        case EqualTo(SnapshotMetadata.FileCol, v: String) => Some(Set(v))
        case In(SnapshotMetadata.FileCol, vs) =>
          Some(vs.collect { case s: String => s }.toSet)
        case _ => None // unsupported _file shape: prune nothing, stay correct
      }
      wanted.fold(cur)(paths => cur.filter { e =>
        val p = new Path(qualified, e.path)
        paths.contains(SparkPath.fromPath(p).toString) || paths.contains(p.toString)
      })
    }
    op.pinPlanned(PlannedRewrite(manifest, candidates))
    // runtime group filtering: Spark evaluates the command's MATCHING rows
    // as a subquery over the table's normal (stats-pruned) scan, collects
    // their distinct `_file` values, and narrows this scan to exactly those
    // files before partition planning — the commit below then swaps ONLY
    // files that truly contain matches (stats candidates without a single
    // matching row are never rewritten). The narrowed set reaches the
    // write through this callback, which can only NARROW the planned set
    // (never re-pin it), in the SparkPath string form `_file` emits.
    val narrow: Set[String] => Unit = keep => op.narrowPlanned(keep, qualified)
    val inner = new org.apache.spark.sql.graftbridge.FileAwareScanBuilder(op.spark,
      new SnapshotFileIndex(op.spark, op.dir, manifest.copy(entries = candidates)),
      tableSchema, options, SnapshotMetadata.FileCol, Some(narrow),
      // candidate files may carry merge-on-read deletion vectors: the
      // rewrite must carry only LIVE rows into the replacement files —
      // resurrection of DV-deleted rows is the classic MoR/COW mixing bug
      dvByPath = SnapshotTable.dvMap(op.spark, op.dir, candidates), tableDir = op.dir,
      // renamed columns read under their physical (stored) names
      mapping = SnapshotTable.mappingOf(Some(manifest)))
    inner.pruneColumns(required)
    inner.build() // no data filters pushed: candidate files are read whole
  }
}

/** Write half: executors write parquet, the driver swaps files in one OCC
  * commit. A task that never receives a row opens no file (a fully-deleted
  * candidate set publishes as pure removal); a zero-candidate no-match
  * operation publishes nothing at all.
  */
private[catalog] class CowBatchWrite(op: SnapshotCowOperation, writeSchema: StructType)
  extends BatchWrite {

  private val commitName = "c-" + java.util.UUID.randomUUID().toString.take(12)

  // the table's column mapping: executors write parquet under PHYSICAL
  // names (rows are positional — only the schema handed to the writer
  // changes), keeping every file in the table physical-named
  private val physicalWriteSchema: StructType = SnapshotTable.physicalSchema(
    writeSchema, SnapshotTable.mappingOf(Some(op.pinnedManifest)))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = op.spark
    // prepareWrite wires the full parquet write path (ParquetWriteSupport
    // schema + session compression/timestamp settings) into the job conf,
    // exactly as Spark's own file writes do — executors only need that
    // conf and the factory
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(spark, job, Map.empty,
      physicalWriteSchema)
    val qualified = SnapshotTable.qualifiedDir(spark, op.dir).toString
    CowWriterFactory(factory, new SerializableConfiguration(job.getConfiguration),
      qualified, commitName, physicalWriteSchema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val planned = op.planned.getOrElse(throw new IllegalStateException(
      "row-level write committed before its scan was planned"))
    val added = messages.collect { case CowCommitMessage(Some(rel), bytes) => (rel, bytes) }.toSeq
    // candidate set empty AND nothing written (e.g. a MERGE whose inserts
    // all filtered away): a true no-op, don't publish an empty version
    if (planned.rewrite.isEmpty && added.isEmpty) return
    // rewritten files land hash-clustered, not partition-routed (the
    // executor-direct write has no dynamic routing); partition-column
    // stats still bound them for pruning, and compaction restores the
    // one-value-per-file layout
    val entries = SnapshotTable.entriesFromFooters(op.spark, op.dir, added,
      physicalWriteSchema,
      priority = PartitionFields.cols(op.pinnedManifest.partitionCols.getOrElse(Seq.empty)))
    val removed = planned.rewrite.map(_.path).toSet
    // MERGE made insert-vs-update decisions against the pinned base: a
    // concurrently ADDED file may hold a key this merge just inserted, so
    // rebasing over it could commit duplicate keys — conflict instead (the
    // same discipline SnapshotTable.merge applies, dt-scoped there).
    // UPDATE/DELETE rebase safely: not touching concurrently appended rows
    // is the valid "this command ran first" serialization.
    SnapshotTable.commitRewrite(op.spark, op.dir,
      op.command().toString.toLowerCase, planned.base, removed, removed, entries,
      conflictOnAdds = op.command() == Command.MERGE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // every file of this write lives under the per-commit directory and no
    // manifest references it; drop the directory (stragglers an in-flight
    // zombie re-creates are unreferenced junk vacuum collects)
    val fs = SnapshotTable.fsFor(op.spark, op.dir)
    val d = new Path(op.dir, commitName)
    if (fs.exists(d)) fs.delete(d, true)
  }
}

/** Serializable executor-side writer factory: Spark's parquet
  * [[OutputWriterFactory]] + the job configuration it was prepared with.
  * Top-level case class so no driver state rides along.
  */
private[catalog] case class CowWriterFactory(
    factory: OutputWriterFactory, conf: SerializableConfiguration,
    qualifiedDir: String, commitName: String, schema: StructType)
  extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CowDataWriter(this, partitionId, taskId)
}

/** One task attempt's parquet writer. The file opens LAZILY on the first
  * row — empty partitions leave nothing behind — and is named by
  * (partitionId, taskId): taskId is attempt-unique, so a speculative twin
  * writes a different file and only the attempt the commit coordinator
  * blesses reports its file in a commit message (the loser's abort deletes
  * its own; a crashed zombie's file stays unreferenced until vacuum).
  */
private[catalog] class CowDataWriter(f: CowWriterFactory, partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private var writer: OutputWriter = null
  private var relPath: Option[String] = None
  private var closed = false

  private def ensureOpen(): Unit = if (writer == null) {
    val attempt = new TaskAttemptContextImpl(f.conf.value,
      new TaskAttemptID(new TaskID(new JobID(f.commitName, 0), TaskType.MAP, partitionId),
        (taskId & 0x7fffffff).toInt))
    val ext = f.factory.getFileExtension(attempt)
    // (partitionId, taskId) alone is NOT attempt-unique across SparkContexts:
    // taskIds restart at 0 with a new context, so a micro-batch replayed
    // after an unclean driver stop (abort never ran) would target the exact
    // path of the crashed attempt's leftover — and parquet's CREATE mode
    // refuses to overwrite, wedging the restarted query. A per-attempt
    // random token makes the leftover unreferenced junk vacuum collects,
    // while the epoch DIRECTORY stays deterministic for abort cleanup.
    val token = java.util.UUID.randomUUID().toString.take(8)
    val rel = f"${f.commitName}/part-$partitionId%05d-$taskId-$token$ext"
    relPath = Some(rel)
    writer = f.factory.newInstance(
      new Path(f.qualifiedDir, rel).toString, f.schema, attempt)
  }

  override def write(row: InternalRow): Unit = { ensureOpen(); writer.write(row) }

  private def closeWriter(): Unit = if (writer != null && !closed) {
    writer.close(); closed = true
  }

  override def commit(): WriterCommitMessage = {
    closeWriter()
    // stat the just-written file HERE, executor-side and in parallel
    // across tasks, so the driver's manifest build never re-stats files
    val bytes = relPath.fold(0L) { rel =>
      val p = new Path(f.qualifiedDir, rel)
      p.getFileSystem(f.conf.value).getFileStatus(p).getLen
    }
    CowCommitMessage(relPath, bytes)
  }

  override def abort(): Unit = {
    try closeWriter() catch { case _: Exception => () }
    relPath.foreach { rel =>
      val p = new Path(f.qualifiedDir, rel)
      val fs = p.getFileSystem(f.conf.value)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }

  override def close(): Unit = closeWriter()
}

/** Path (relative to the table dir) and size of one committed task's
  * output; None = the task saw no rows and wrote nothing.
  */
private[catalog] case class CowCommitMessage(relPath: Option[String], bytes: Long)
  extends WriterCommitMessage

/** DSv2 STREAMING write into the snapshot table —
  * `df.writeStream.toTable("snap.…")` with EXACTLY-ONCE epochs: executors
  * stream rows through the same parquet writer machinery as the row-level
  * write (lazy open, attempt-unique names, per-epoch invisible commit
  * directory), and each epoch commits through
  * [[SnapshotTable.appendEntriesExactlyOnce]] — the manifest's
  * (queryId → epochId) txn marker makes a crash-re-delivered micro-batch
  * a structural no-op, checked inside the OCC commit loop so racing
  * deliveries reduce to one commit. Readers see each micro-batch
  * atomically; a crash between data write and commit leaves only
  * unreferenced files for vacuum. Append output mode only: complete mode
  * would replace the table every epoch (use foreachBatch +
  * [[SnapshotTable.write]] if that is really wanted).
  */
private[catalog] class SnapshotStreamingWrite(
    spark: SparkSession, dir: String, queryId: String, writeSchema: StructType)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  // short stable id: epoch directories are derivable from (query, epoch)
  // alone, so abort can clean up without any driver state
  private val qid = queryId.replaceAll("[^0-9a-zA-Z]", "").take(12)

  // PHYSICAL write schema (see CowBatchWrite): the mapping is captured at
  // factory creation; a rename committing mid-epoch changes no physical
  // name of an existing column, so the epoch's files stay correct — and
  // an epoch carrying the rename's OLD logical name as a "new" column is
  // refused by the commit's reserved-physical guard, never silently bound
  private def physicalOf(s: StructType): StructType = SnapshotTable.physicalSchema(
    s, SnapshotTable.mappingOf(SnapshotTable.currentManifest(spark, dir)))

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val physical = physicalOf(writeSchema)
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, physical)
    SnapshotStreamWriterFactory(factory,
      new SerializableConfiguration(job.getConfiguration),
      SnapshotTable.qualifiedDir(spark, dir).toString, qid, physical,
      // PARTITION ROUTING for streaming epochs: bound per-row routing
      // expressions, so epoch files land one-partition-value-per-file
      // under the same `__p_…=`/`__pb_…=` directories the batch writers
      // use — which keeps manifest stats exact (lo == hi) and the
      // storage-partitioned-join layout PROVABLE under continuous
      // streaming ingest, instead of every epoch disabling SPJ until the
      // next compaction (the 100 TB steady-state concern)
      routing = RoutedEpochWriter.boundRouting(spark, dir, writeSchema))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val added = messages.collect {
      case CowCommitMessage(Some(rel), bytes) => Seq((rel, bytes))
      case RoutedCommitMessage(files) => files
    }.flatten.toSeq
    // empty epochs commit nothing: appends are idempotent, so not
    // advancing the marker is harmless and saves a version per idle tick
    if (added.isEmpty) return
    val entries = SnapshotTable.entriesFromFooters(spark, dir, added, physicalOf(writeSchema),
      priority = PartitionFields.cols(SnapshotTable.partitionColumns(spark, dir)))
    SnapshotTable.appendEntriesExactlyOnce(
      spark, dir, entries, writeSchema, appId = s"dsv2-$qid", batchId = epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = SnapshotTable.fsFor(spark, dir)
    val d = new Path(dir, SnapshotStreamWriterFactory.epochDirName(qid, epochId))
    if (fs.exists(d)) fs.delete(d, true)
  }
}

/** Executor-side factory for streaming epochs: same writers as the batch
  * path, pointed at a per-(query, epoch) commit directory. With a
  * partitioned table, rows route per-value through [[RoutedEpochWriter]].
  */
private[catalog] case class SnapshotStreamWriterFactory(
    factory: OutputWriterFactory, conf: SerializableConfiguration,
    qualifiedDir: String, qid: String, schema: StructType,
    routing: Seq[RouteField] = Seq.empty)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val inner = CowWriterFactory(factory, conf, qualifiedDir,
      SnapshotStreamWriterFactory.epochDirName(qid, epochId), schema)
    if (routing.isEmpty) new CowDataWriter(inner, partitionId, taskId)
    else new RoutedEpochWriter(inner, routing, partitionId, taskId)
  }
}

private[catalog] object SnapshotStreamWriterFactory {
  /** THE name of an epoch's commit directory — writers create it, abort
    * deletes it; one definition so they can never diverge.
    */
  def epochDirName(qid: String, epochId: Long): String = s"c-str-$qid-e$epochId"
}

/** One partition field's routing machinery for the streaming epoch
  * writer: the BOUND catalyst expression computing the routing value from
  * a data row (the SAME [[PartitionFields.routeColumn]] definition the
  * batch writers use — resolved once on the driver against the write
  * schema, serialized bound), the directory-marker name, and the value's
  * data type for rendering.
  */
private[catalog] case class RouteField(
    field: PartitionFields.Field,
    bound: org.apache.spark.sql.catalyst.expressions.Expression,
    dataType: org.apache.spark.sql.types.DataType)

private[catalog] object RoutedEpochWriter {

  /** Resolve + bind the routing expressions against `writeSchema` on the
    * driver (empty = unpartitioned table, routing disabled). One
    * definition: the Columns come from [[PartitionFields.routeColumn]],
    * run through the real analyzer, so the streaming router can never
    * disagree with the batch writers or the pruner.
    */
  def boundRouting(spark: SparkSession, dir: String,
      writeSchema: StructType): Seq[RouteField] = {
    val pcols = SnapshotTable.partitionColumns(spark, dir)
    if (pcols.isEmpty) return Seq.empty
    val fields = PartitionFields.parseAll(pcols)
    // every partitioned write must carry its partition columns — Spark's
    // insert resolution guarantees it for `toTable`, but check loudly
    val missing = fields.map(_.col).filterNot(c =>
      writeSchema.fieldNames.exists(_.equalsIgnoreCase(c)))
    if (missing.nonEmpty) throw new IllegalArgumentException(
      s"streaming write into partitioned table $dir: batch schema lacks partition " +
        s"column(s) ${missing.mkString(", ")}")
    def dtOf(c: String): org.apache.spark.sql.types.DataType =
      writeSchema.fields.find(_.name.equalsIgnoreCase(c)).get.dataType
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], writeSchema)
    val analyzed = empty.select(fields.map(f =>
        PartitionFields.routeColumn(f, dtOf(f.col))): _*)
      .queryExecution.analyzed
    val exprs = analyzed.expressions.map(e =>
      org.apache.spark.sql.catalyst.expressions.BindReferences.bindReference(
        e, analyzed.children.head.output))
    fields.zip(exprs).map { case (f, e) => RouteField(f, e, e.dataType) }
  }

  /** Render one routing value as its directory segment, or None when the
    * row cannot be routed safely — null values (the default-partition
    * case) and strings outside the conservative unescaped charset (Hive
    * path-escaping is the batch writer's job; diverging on an escape
    * would corrupt pruning). Unroutable rows land in the epoch root as
    * plain un-routed files — exactly the conservative degradation every
    * reader already handles.
    *
    * TIMESTAMPS render as their raw epoch-micros integer — zone-free,
    * collision-free, filesystem-safe — NOT the batch writer's session-tz
    * `yyyy-MM-dd HH%3Amm%3Ass` form. The divergence is safe because
    * identity directory names are pure layout artifacts: every reader
    * recovers identity values from footer stats (lo == hi), never from
    * `__p_` paths (unlike `__pb_`/`__pt_`/`__pr_` markers, whose forms ARE
    * parsed and therefore must match the batch writer exactly — they do,
    * because their routing expressions render integer ordinals). What
    * matters for SPJ provability is one VALUE per file, which any
    * injective rendering delivers.
    */
  def render(value: Any, dt: org.apache.spark.sql.types.DataType): Option[String] = {
    import org.apache.spark.sql.types._
    if (value == null) return None
    dt match {
      case IntegerType | LongType | ShortType | ByteType | BooleanType =>
        Some(value.toString)
      case TimestampType | TimestampNTZType =>
        Some(value.asInstanceOf[Long].toString + "us")
      case DateType =>
        Some(java.time.LocalDate.ofEpochDay(value.asInstanceOf[Int].toLong).toString)
      case StringType =>
        val s = value.toString
        if (s.nonEmpty && s != "__HIVE_DEFAULT_PARTITION__" &&
          s.forall(c => c.isLetterOrDigit && c < 128 || c == '_' || c == '-' || c == '.'))
          Some(s)
        else None
      case _ => None
    }
  }
}

/** Streaming-epoch writer for PARTITIONED tables: routes each row to a
  * per-partition-value file under the same `<dirCol>=<value>` directories
  * the batch writers' `partitionBy` produces, so epoch files carry exact
  * one-value stats (and bucket/temporal path markers) and the
  * storage-partitioned-join layout stays provable under continuous
  * ingest. At most [[RoutedEpochWriter.MaxOpenWriters]] files are open per
  * task; overflow closes the current set and continues with fresh files —
  * never a wrong route, only more (still single-value) files for the next
  * compaction to merge. Rows whose routing value cannot be rendered
  * safely fall back to one un-routed root file (conservative reads,
  * layout off until compaction — the pre-existing contract).
  *
  * SMALL-FILE BACKSTOP: past the open cap the LEAST-RECENTLY-OPENED
  * writer rotates out (its value reopens later as a fresh, still
  * single-value file), and past [[MaxFilesPerTask]] total files the task
  * stops routing entirely — remaining rows pool into the un-routed root
  * file. A task streaming hundreds of interleaved partition values is a
  * layout mismatch, and the correct degradation is the conservative
  * un-routed contract, never an unbounded spray of row-sized files.
  */
private[catalog] class RoutedEpochWriter(f: CowWriterFactory,
    routing: Seq[RouteField], partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val MaxOpenWriters = 16
  private val MaxFilesPerTask = 64
  private val open = scala.collection.mutable.LinkedHashMap[String, OutputWriter]()
  private val written = scala.collection.mutable.ArrayBuffer[String]()
  private var fileSeq = 0

  private lazy val attempt = new TaskAttemptContextImpl(f.conf.value,
    new TaskAttemptID(new TaskID(new JobID(f.commitName, 0), TaskType.MAP, partitionId),
      (taskId & 0x7fffffff).toInt))
  private lazy val ext = f.factory.getFileExtension(attempt)
  private lazy val projection =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(routing.map(_.bound))

  // rendering memo keyed by the projected routing values (UnsafeRow
  // equality is byte-based): one string build per DISTINCT value combo,
  // not per row — bounded so a pathological key domain cannot grow it
  private val subMemo = scala.collection.mutable.HashMap[InternalRow, String]()

  /** The row's routing subdirectory ("" = unroutable → epoch root). */
  private def subDir(row: InternalRow): String = {
    val values = projection(row) // REUSED row: copy only when memoizing
    subMemo.get(values) match {
      case Some(s) => s
      case None =>
        val s = renderSub(values)
        if (subMemo.size < 1024) subMemo.put(values.copy(), s)
        s
    }
  }

  private def renderSub(values: InternalRow): String = {
    val parts = routing.zipWithIndex.map { case (rf, i) =>
      val v = if (values.isNullAt(i)) null else values.get(i, rf.dataType)
      RoutedEpochWriter.render(v, rf.dataType) match {
        case Some(seg) => s"${rf.field.dirCol}=$seg"
        case None => return ""
      }
    }
    parts.mkString("/")
  }

  private def writerFor(rawSub: String): OutputWriter = {
    // file-cap degradation: stop routing, pool into the root file (the
    // root writer stays open through evictions via the re-lookup below)
    val sub = if (fileSeq >= MaxFilesPerTask) "" else rawSub
    open.get(sub) match {
      case Some(w) =>
        // true LRU: re-insert on hit so eviction hits the coldest value
        open.remove(sub); open(sub) = w
        w
      case None =>
        if (open.size >= MaxOpenWriters) {
          val eldest = open.head
          eldest._2.close()
          open.remove(eldest._1)
        }
        val token = java.util.UUID.randomUUID().toString.take(8)
        fileSeq += 1
        val rel = (if (sub.isEmpty) s"${f.commitName}" else s"${f.commitName}/$sub") +
          f"/part-$partitionId%05d-$taskId-$fileSeq-$token$ext"
        written += rel
        val w = f.factory.newInstance(new Path(f.qualifiedDir, rel).toString, f.schema, attempt)
        open(sub) = w
        w
    }
  }

  private def closeAll(): Unit = { open.values.foreach(_.close()); open.clear() }

  override def write(row: InternalRow): Unit = writerFor(subDir(row)).write(row)

  override def commit(): WriterCommitMessage = {
    closeAll()
    val fs = new Path(f.qualifiedDir).getFileSystem(f.conf.value)
    RoutedCommitMessage(written.toSeq.map { rel =>
      rel -> fs.getFileStatus(new Path(f.qualifiedDir, rel)).getLen })
  }

  override def abort(): Unit = {
    try closeAll() catch { case _: Exception => () }
    val fs = new Path(f.qualifiedDir).getFileSystem(f.conf.value)
    written.foreach { rel =>
      val p = new Path(f.qualifiedDir, rel)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }

  override def close(): Unit = closeAll()
}

/** Paths (relative to the table dir) and sizes of one routed task's
  * output files.
  */
private[catalog] case class RoutedCommitMessage(files: Seq[(String, Long)])
  extends WriterCommitMessage
