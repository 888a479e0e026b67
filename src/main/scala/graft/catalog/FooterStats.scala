package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.{BlockMetaData, ColumnPath}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.types._

/** Per-file (rows, column bounds, null counts) read from parquet FOOTERS —
  * metadata the writer already produced — so committing a snapshot never
  * re-scans the data it just wrote. This replaces [[SnapshotTable]]'s
  * former second Spark job per commit (a grouped full read of every new
  * file); Iceberg populates its manifests from exactly this footer
  * metadata. A footer read touches a few KB per file regardless of file
  * size, so commit cost is O(files) driver-side metadata at any table
  * scale.
  *
  * Conservative by construction, matching [[FileStats]]' contract: any
  * column whose footer stats are absent, undecodable, possibly unsound
  * (INT96 timestamps, float/double chunks that saw NaN), or missing from
  * any block yields NO ColStat — the file simply stays unprunable on that
  * column, never wrongly skippable. Bounds land in the same string domains
  * [[FileStats.aggsFor]] produced ("num" = double-parseable, "str" =
  * UTF-8-ordered text, dates as ISO strings, timestamps as epoch micros),
  * so manifests from either collector prune identically.
  */
object FooterStats {

  /** Footer-only stats for one parquet file: (row count, per-column stats
    * for the requested fields). `fields` should already be filtered to
    * [[FileStats.eligible]] types and capped at [[FileStats.MaxStatCols]].
    */
  def collect(conf: Configuration, file: Path,
      fields: Seq[StructField]): (Long, Map[String, FileStats.ColStat]) = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    val footer = try reader.getFooter finally reader.close()
    val blocks = footer.getBlocks.asScala.toSeq
    val rows = blocks.map(_.getRowCount).sum
    val stats = fields.flatMap(f => columnStat(blocks, f).map(f.name -> _)).toMap
    (rows, stats)
  }

  /** Fold one column's chunk statistics across all row groups; None the
    * moment anything is unknown or untrustworthy.
    */
  private def columnStat(blocks: Seq[BlockMetaData], f: StructField): Option[FileStats.ColStat] = {
    val path = ColumnPath.get(f.name)
    val kind = FileStats.kindOf(f.dataType)
    var nulls = 0L
    var lo: Option[String] = None
    var hi: Option[String] = None
    def less(a: String, b: String): Boolean =
      if (kind == "num") a.toDouble < b.toDouble else FileStats.cmpUtf8(a, b) < 0
    for (block <- blocks) {
      val chunk = block.getColumns.asScala.find(_.getPath == path)
        .getOrElse(return None) // column absent from a block: unknown
      val s = chunk.getStatistics
      if (s == null || !s.isNumNullsSet) return None
      nulls += s.getNumNulls
      if (s.hasNonNullValue) {
        val prim = chunk.getPrimitiveType
        val bLo = decode(f.dataType, prim, s.genericGetMin.asInstanceOf[AnyRef], loSide = true).getOrElse(return None)
        val bHi = decode(f.dataType, prim, s.genericGetMax.asInstanceOf[AnyRef], loSide = false).getOrElse(return None)
        if (lo.forall(less(bLo, _))) lo = Some(bLo)
        if (hi.forall(less(_, bHi))) hi = Some(bHi)
      }
    }
    // all-NULL columns carry empty bounds, like the scan-based collector
    val (tLo, tHi) =
      if (kind == "str") (lo.map(FileStats.truncLo), hi.map(FileStats.truncHi))
      else (lo, hi)
    Some(FileStats.ColStat(kind, tLo, tHi, nulls))
  }

  /** One footer bound into [[FileStats]]' string domain. None = this
    * physical/logical shape cannot be trusted into a bound.
    */
  private def decode(dt: DataType, prim: org.apache.parquet.schema.PrimitiveType,
      v: AnyRef, loSide: Boolean): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => v match {
      case n: java.lang.Number => Some(n.doubleValue.toString)
      case _ => None
    }
    case FloatType | DoubleType => v match {
      // parquet min/max comparisons ignore NaN, so a chunk that saw NaN can
      // carry bounds excluding it — and a `= NaN` predicate would then
      // wrongly prune. parquet-mr drops stats on NaN input, but that is a
      // writer detail; refuse NaN bounds here too.
      case n: java.lang.Number if !java.lang.Double.isNaN(n.doubleValue) =>
        Some(n.doubleValue.toString)
      case _ => None
    }
    case d: DecimalType => (v match {
      case b: Binary => Some(BigDecimal(BigInt(b.getBytes), d.scale))
      case i: java.lang.Integer => Some(BigDecimal(BigInt(i.longValue), d.scale))
      case l: java.lang.Long => Some(BigDecimal(BigInt(l.longValue), d.scale))
      case _ => None
    }).map(_.toDouble.toString)
    case BooleanType => v match {
      case b: java.lang.Boolean => Some(if (b) "1" else "0")
      case _ => None
    }
    case StringType => v match {
      case b: Binary => Some(b.toStringUsingUTF8)
      case _ => None
    }
    case DateType => v match {
      case i: java.lang.Integer => Some(java.time.LocalDate.ofEpochDay(i.longValue).toString)
      case _ => None
    }
    case TimestampType | TimestampNTZType => (v, prim.getLogicalTypeAnnotation) match {
      // the unit comes from the file's own annotation; INT96 timestamps
      // carry Binary stats and no timestamp annotation → None (their
      // footer stats are untrustworthy by spec)
      case (l: java.lang.Long, t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
        toMicros(l, t.getUnit, loSide).map(_.toString)
      case _ => None
    }
    case _ => None
  }

  /** Epoch count in `unit` → epoch micros, rounded OUTWARD (floor for lower
    * bounds, ceil for upper) so a converted bound still dominates every
    * value it summarizes.
    */
  private def toMicros(v: Long, unit: LogicalTypeAnnotation.TimeUnit,
      loSide: Boolean): Option[Long] = unit match {
    case LogicalTypeAnnotation.TimeUnit.MICROS => Some(v)
    case LogicalTypeAnnotation.TimeUnit.MILLIS => Some(Math.multiplyExact(v, 1000L))
    case LogicalTypeAnnotation.TimeUnit.NANOS =>
      Some(if (loSide) Math.floorDiv(v, 1000L) else -Math.floorDiv(-v, 1000L))
    case _ => None
  }
}
