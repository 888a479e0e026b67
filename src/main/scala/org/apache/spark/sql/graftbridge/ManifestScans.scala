package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, In, Literal}
import org.apache.spark.sql.connector.expressions.{Expressions, LiteralValue, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, LocalScan, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.StructType

/** Runtime file pruning driven by the snapshot manifest's per-file column
  * stats: `cols` are the stats-covered columns the scan declares runtime-
  * filterable (so dynamic partition pruning targets them), and `prune`
  * answers "which qualified file paths may match these resolved catalyst
  * predicates" from the manifest — the same conservative translator the
  * planning-time FileIndex uses, now fed with values that only exist at
  * RUNTIME (a join's build side). Owned by the catalog layer; this package
  * only carries the closure to keep the bridge free of engine imports.
  */
case class StatPrune(cols: Array[String], prune: Seq[Expression] => Set[String])

/** The storage layout of a partitioned snapshot whose every data file
  * provably holds exactly one partition-value combination: `keys` are the
  * V2 clustering expressions (identity transforms for identity fields,
  * `bucket(n, col)` for bucket fields) and `keyByPath` maps each
  * qualified data-file path to its partition value as an [[InternalRow]]
  * in `keys` order (raw values for identity fields, bucket ids for
  * bucket fields). Derived from manifest stats / routing directories by
  * the catalog layer; coverage is PER FILE — a file whose value cannot
  * be proven is absent from `keyByPath` and plans as a plain partition,
  * so the storage-partitioned join applies exactly when every file a
  * given scan reads is covered — correctness never depends on this, it
  * only removes shuffles.
  */
case class KeyedLayout(
    keys: Seq[org.apache.spark.sql.connector.expressions.Expression],
    keyByPath: Map[String, InternalRow]) {
  lazy val numKeys: Int = keyByPath.values.toSet.size
}

/** A file-partition with its provable single partition value — what lets
  * Spark's storage-partitioned join machinery ([[HasPartitionKey]] +
  * [[KeyGroupedPartitioning]]) group tasks by value and elide the shuffle
  * when both join sides are co-partitioned snapshot tables.
  */
class KeyedFilePartition(index: Int, files: Array[PartitionedFile],
    private val key: InternalRow)
  extends FilePartition(index, files) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** The snapshot table's general-purpose read scan, wrapped over Spark's
  * own parquet scan with two scale capabilities the inner scan cannot
  * provide (both metadata-driven, both optional for correctness):
  *
  *  1. RUNTIME file pruning ([[SupportsRuntimeV2Filtering]]): dynamic
  *     partition pruning hands this scan the build side's join-key values
  *     after they are known; [[StatPrune]] turns them into a surviving
  *     file set via manifest stats, and partition planning drops every
  *     other file — the 100 TB star-join pattern (selective dimension →
  *     fact scan reads only matching files) with zero listing cost.
  *  2. STORAGE-PARTITIONED JOIN reporting ([[SupportsReportPartitioning]]):
  *     when a [[KeyedLayout]] proves one-partition-value-per-file, the
  *     scan reports [[KeyGroupedPartitioning]] over the identity partition
  *     columns and plans value-keyed file partitions, so a join of two
  *     co-partitioned snapshot tables on their partition keys runs with NO
  *     shuffle on either side (gated by Spark's own
  *     `spark.sql.sources.v2.bucketing.enabled`; with it off the keyed
  *     partitions plan and read exactly like plain ones).
  *
  * Reads delegate verbatim: the reader factory, columnar support, and
  * statistics are the inner parquet scan's own.
  */
class StatsNarrowedScan(spark: SparkSession, delegate: Scan,
    statPrune: StatPrune, keyed: Option[KeyedLayout])
  extends Scan with Batch with SupportsReportStatistics
  with SupportsRuntimeV2Filtering with SupportsReportPartitioning {

  @volatile private var surviving: Option[Set[String]] = None

  override def readSchema(): StructType = delegate.readSchema()

  override def toBatch: Batch = this

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    delegate.columnarSupportMode()

  override def outputPartitioning(): Partitioning = keyed match {
    case Some(k) => new KeyGroupedPartitioning(k.keys.toArray, k.numKeys)
    case None => new UnknownPartitioning(0)
  }

  override def filterAttributes(): Array[NamedReference] = {
    // only columns the PRUNED scan still outputs: Spark's dynamic-pruning
    // planner resolves these against the relation output and THROWS on a
    // column projection removed (a filter on a non-output column could
    // never be a join key anyway)
    val present = readSchema().fieldNames.toSet
    statPrune.cols.filter(present.contains).map(Expressions.column)
  }

  /** Runtime predicates → manifest prune. Narrowing is monotone across
    * calls (intersection), conservative per call (a predicate shape the
    * translator can't read prunes nothing), and NEVER required for
    * correctness — Spark re-applies every runtime filter on the rows.
    */
  override def filter(predicates: Array[Predicate]): Unit = {
    val exprs = predicates.iterator.flatMap(toCatalyst).toSeq
    if (exprs.nonEmpty) {
      val keep = statPrune.prune(exprs)
      surviving = Some(surviving.fold(keep)(_ intersect keep))
    }
  }

  /** `IN(col, v…)` / `= (col, v)` over a top-level column → the catalyst
    * shape [[graft.catalog.FileStats.mayMatch]] understands. None for
    * anything else — unrecognized never narrows.
    */
  private def toCatalyst(p: Predicate): Option[Expression] = {
    def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
        case _ => None
      }
    def lit(e: org.apache.spark.sql.connector.expressions.Expression): Option[Literal] =
      e match {
        case l: LiteralValue[_] => Some(Literal(l.value, l.dataType))
        case _ => None
      }
    p.name() match {
      case "IN" if p.children().length >= 2 =>
        for {
          n <- colName(p.children().head)
          vs <- Some(p.children().tail.flatMap(lit))
          if vs.length == p.children().length - 1
        } yield In(UnresolvedAttribute(n), vs.toSeq)
      case "=" if p.children().length == 2 =>
        for { n <- colName(p.children()(0)); v <- lit(p.children()(1)) }
          yield EqualTo(UnresolvedAttribute(n), v)
      case _ => None
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = delegate.toBatch.planInputPartitions()
    val narrowed: Array[InputPartition] = surviving match {
      case None => parts
      case Some(keep) =>
        parts.iterator.map {
          case fp: FilePartition => fp.files.filter(f => keep.contains(f.filePath.toString))
          case other => throw new IllegalStateException(
            s"cannot runtime-narrow non-file partition ${other.getClass.getName}")
        }.filter(_.nonEmpty).zipWithIndex
          .map { case (fs, i) => FilePartition(i, fs): InputPartition }.toArray
    }
    keyed match {
      case None => narrowed
      case Some(k) =>
        // regroup split files by partition value; bin-pack WITHIN each value
        // so small files share a task and huge values still split — with
        // v2 bucketing off these plan/read exactly like plain partitions,
        // with it on Spark groups same-key partitions into co-located tasks.
        // Files ABSENT from the layout (unprovable: a hash-clustered
        // overflow, an unrouted rewrite) plan as plain partitions alongside
        // the keyed ones — Spark's own all-partitions-keyed check then
        // decides per scan: all provable → storage-partitioned join; any
        // residual file surviving the pruning → graceful shuffle fallback.
        // So provability is decided on the files this scan actually reads,
        // not on the whole table.
        val files = narrowed.iterator.flatMap {
          case fp: FilePartition => fp.files
          case other => throw new IllegalStateException(
            s"cannot key non-file partition ${other.getClass.getName}")
        }.toSeq
        val maxSplit = FilePartition.maxSplitBytes(spark, files.map(_.length).sum)
        val (provable, residual) =
          files.partition(f => k.keyByPath.contains(f.filePath.toString))
        var idx = -1
        val keyedParts = provable.groupBy(f => k.keyByPath(f.filePath.toString))
          .iterator.flatMap { case (key, fs) =>
            FilePartition.getFilePartitions(spark, fs, maxSplit).map { fp =>
              idx += 1
              new KeyedFilePartition(idx, fp.files, key): InputPartition
            }
          }.toArray
        val residualParts = FilePartition.getFilePartitions(spark, residual, maxSplit)
          .map { fp => idx += 1; FilePartition(idx, fp.files): InputPartition }.toArray
        keyedParts ++ residualParts
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    delegate.toBatch.createReaderFactory()

  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }

  override def description(): String =
    s"StatsNarrowed(keyed=${keyed.isDefined}, ${delegate.description()})"
}

/** An aggregate answered ENTIRELY from the snapshot manifest: zero tasks,
  * zero file reads — `SELECT count(*) …` over a 100 TB table costs one
  * driver-side fold over metadata the commits already wrote, the same
  * query Snowflake answers from micro-partition metadata. Planned by
  * Spark as a [[LocalScan]] (a local table of the final aggregate rows);
  * the catalog layer only offers it when every value is PROVABLY exact
  * (see `graft.catalog.ManifestAgg`).
  */
class ManifestAggScan(schema: StructType, result: Array[InternalRow])
  extends LocalScan {
  override def rows(): Array[InternalRow] = result
  override def readSchema(): StructType = schema
  override def description(): String = s"ManifestAgg(rows=${result.length})"
}
