package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.graftbridge.{KeyedLayout, StatPrune}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only planning derived from one committed manifest: the
  * storage-partitioned-join layout, the runtime-prune closure, and exact
  * manifest-answered aggregates. Everything here is EXACTNESS-GATED — a
  * value that cannot be proven bit-identical to what scanning the data
  * would produce yields None, and the scan falls back to reading files.
  * Two systematic sources of inexactness are guarded throughout:
  *
  *  - numeric bounds ride the manifest in the DOUBLE domain
  *    ([[FileStats.kindOf]] "num"), so long/timestamp values are trusted
  *    only below 2^53 (a |v| ≥ 2^53 can collide with a neighbor when
  *    rounded to double — and rounding any such v never lands below 2^53,
  *    so the strict bound is sufficient);
  *  - string bounds are TRUNCATED at [[FileStats.TruncLen]] code points
  *    (upper bounds padded past the truncation), so a bound at or beyond
  *    that length may not be an attained value and is refused.
  */
object ManifestPlanning {

  private val MaxExactDouble = 9007199254740992d // 2^53

  /** The [[StatPrune]] closure for a pinned manifest: declares every
    * column that at least one entry carries stats for (anything else can
    * never narrow), and prunes with the same conservative translator the
    * planning-time FileIndex uses.
    */
  def statPrune(spark: SparkSession, dir: String,
      m: SnapshotTable.Manifest, schema: StructType,
      // the table's column mapping: declared columns and incoming runtime
      // expressions carry LOGICAL names, footer stats key by PHYSICAL —
      // one name translation at each boundary and renamed columns keep
      // their runtime pruning
      mapping: Map[String, String] = Map.empty): StatPrune = {
    def phys(n: String): String = SnapshotTable.physicalName(mapping, n)
    val covered = schema.fields.iterator.map(_.name)
      .filter(n => m.entries.exists(_.stats.exists(_.contains(phys(n))))).toArray
    val qdir = qualified(spark, dir)
    def toPhysical(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression =
      if (mapping.isEmpty) e
      else e.transform {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          a.withName(phys(a.name))
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(phys(u.name))
      }
    StatPrune(covered, exprs =>
      SnapshotTable.pruneForFilters(m, exprs.map(toPhysical))
        .map(e => scanPathForm(qdir, e.path)).toSet)
  }

  /** The storage-partitioned-join layout, PER-FILE-provable: covers every
    * live file whose value for every partition field is exactly
    * recoverable — identity fields from stats (lo == hi, type-exact,
    * all-null files count as a null value), bucket fields from their
    * routing directory (`__pb_<n>_<col>=<id>`). Unprovable files — a
    * hash-clustered streaming overflow, a row-level rewrite — are simply
    * ABSENT from `keyByPath`: the scan plans them as plain (un-keyed)
    * partitions, and Spark's own all-partitions-keyed check decides
    * per SCAN whether the storage-partitioned join applies. So one
    * unrouted file no longer disables the layout table-wide — a query
    * whose planning-time pruning drops it still joins shuffle-free, and
    * only scans that actually READ the unprovable file fall back (until
    * the next compaction re-routes it). None only when the table has no
    * partition fields, no provable file at all, or a spec/schema
    * mismatch.
    */
  def keyedLayout(spark: SparkSession, dir: String,
      m: SnapshotTable.Manifest, schema: StructType,
      // clustering keys face the plan (LOGICAL names); identity-field
      // stats key by PHYSICAL names (partition columns are normally
      // unrenamed, but a spec set on a previously-renamed column differs)
      mapping: Map[String, String] = Map.empty): Option[KeyedLayout] = {
    val pcols = m.partitionCols.getOrElse(Seq.empty)
    if (pcols.isEmpty || m.entries.isEmpty) return None
    val fields: Seq[(PartitionFields.Field, StructField)] =
      PartitionFields.parseAll(pcols).map(pf =>
        pf -> schema.fields.find(_.name.equalsIgnoreCase(pf.col)).getOrElse(return None))
    val keys = fields.map {
      case (_: PartitionFields.Identity, f) =>
        org.apache.spark.sql.connector.expressions.Expressions.identity(f.name):
          org.apache.spark.sql.connector.expressions.Expression
      case (b: PartitionFields.Bucket, f) =>
        org.apache.spark.sql.connector.expressions.Expressions.bucket(b.n, f.name):
          org.apache.spark.sql.connector.expressions.Expression
      case (t: PartitionFields.Temporal, f) =>
        org.apache.spark.sql.connector.expressions.Expressions.apply(t.unit,
          org.apache.spark.sql.connector.expressions.Expressions.column(f.name)):
          org.apache.spark.sql.connector.expressions.Expression
      case (t: PartitionFields.Truncate, f) =>
        org.apache.spark.sql.connector.expressions.Expressions.apply("truncate",
          org.apache.spark.sql.connector.expressions.Expressions.literal(t.w),
          org.apache.spark.sql.connector.expressions.Expressions.column(f.name)):
          org.apache.spark.sql.connector.expressions.Expression
    }
    val qdir = qualified(spark, dir)
    // one file's key, when every field's value is provable for it; None
    // drops only THIS file from the layout, never the table
    def entryKey(e: SnapshotTable.FileEntry): Option[InternalRow] = {
      val values = fields.map {
        case (_: PartitionFields.Identity, f) =>
          fileValue(e, f, mapping).getOrElse(return None)
        case (b: PartitionFields.Bucket, _) =>
          PartitionFields.bucketIdFromPath(e.path, b).getOrElse(return None): Any
        case (t: PartitionFields.Temporal, _) =>
          PartitionFields.valueFromPath(e.path, t).getOrElse(return None): Any
        case (t: PartitionFields.Truncate, f) =>
          PartitionFields.truncValueFromPath(e.path, t, f.dataType).getOrElse(return None): Any
      }
      Some(new GenericInternalRow(values.toArray))
    }
    val byPath = m.entries.flatMap(e =>
      entryKey(e).map(k => scanPathForm(qdir, e.path) -> (k: InternalRow))).toMap
    if (byPath.isEmpty) None else Some(KeyedLayout(keys, byPath))
  }

  /** One file's single value for `f`, when provable: None kills the
    * layout. Some(null) is a genuine null partition value (the whole file
    * is null in that column).
    */
  private def fileValue(e: SnapshotTable.FileEntry, f: StructField,
      mapping: Map[String, String] = Map.empty): Option[Any] = {
    val s = e.stats.flatMap(_.get(SnapshotTable.physicalName(mapping, f.name)))
      .getOrElse(return None)
    (s.lo, s.hi) match {
      case (None, None) => if (s.nulls == e.rows) Some(null) else None
      case (Some(lo), Some(hi)) if s.nulls == 0 && lo == hi => exactValue(lo, f.dataType)
      case _ => None // mixed values, or nulls mingled with values
    }
  }

  /** A stat bound as the ATTAINED catalyst value of `dt`, when exact. */
  private def exactValue(bound: String, dt: DataType): Option[Any] = dt match {
    case StringType =>
      // at TruncLen the bound may be a truncation, not an attained value
      if (bound.codePointCount(0, bound.length) >= FileStats.TruncLen) None
      else Some(UTF8String.fromString(bound))
    case DateType =>
      scala.util.Try(java.time.LocalDate.parse(bound).toEpochDay.toInt: Any).toOption
    case BooleanType => scala.util.Try(bound.toDouble == 1.0: Any).toOption
    case ByteType => wholeIn(bound, Byte.MinValue, Byte.MaxValue).map(_.toByte: Any)
    case ShortType => wholeIn(bound, Short.MinValue, Short.MaxValue).map(_.toShort: Any)
    case IntegerType => wholeIn(bound, Int.MinValue, Int.MaxValue).map(_.toInt: Any)
    case LongType | TimestampType =>
      // bounds rode as doubles: exact only strictly below 2^53
      scala.util.Try(bound.toDouble).toOption
        .filter(d => d.isWhole && math.abs(d) < MaxExactDouble).map(_.toLong: Any)
    case _ => None // float/double (NaN excluded from bounds), decimal
                   // (double-rounded), timestamp_ntz (tz-shifted) — inexact
  }

  private def wholeIn(bound: String, lo: Long, hi: Long): Option[Double] =
    scala.util.Try(bound.toDouble).toOption
      .filter(d => d.isWhole && d >= lo && d <= hi)

  // ------------------------------------------------- manifest aggregates

  /** Answer a pushed aggregation from the manifest alone, when exact:
    * COUNT(*) / COUNT(col) / MIN(col) / MAX(col), optionally grouped by
    * identity partition columns (provable single-value files only). Zero
    * tasks — the 100 TB `SELECT count(*)` costs a driver-side metadata
    * fold, like Snowflake's micro-partition-metadata answer. With
    * deletion vectors present only COUNT(*) stays provable (live = rows −
    * deleted); everything else needs the surviving rows themselves.
    */
  def localAggregate(spark: SparkSession, dir: String,
      m: SnapshotTable.Manifest, schema: StructType,
      agg: Aggregation,
      // aggregation references and output columns are LOGICAL; every
      // stats lookup translates to the PHYSICAL key
      mapping: Map[String, String] = Map.empty): Option[(StructType, Array[InternalRow])] = {
    val hasDv = m.entries.exists(_.dv.isDefined)

    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case r: NamedReference if r.fieldNames.length == 1 =>
          schema.fields.find(_.name.equalsIgnoreCase(r.fieldNames.head))
        case _ => None
      }

    // grouping: IDENTITY partition columns with provable per-file values
    // (a bucket id is not a SQL-visible value, so bucket fields never
    // serve a GROUP BY)
    val idCols = PartitionFields.parseAll(m.partitionCols.getOrElse(Seq.empty))
      .collect { case PartitionFields.Identity(c) => c }
    val groupFields = agg.groupByExpressions.toSeq.map(e =>
      fieldOf(e).filter(f => idCols.exists(_.equalsIgnoreCase(f.name)))
        .getOrElse(return None))

    def statOf(e: SnapshotTable.FileEntry, f: StructField): Option[FileStats.ColStat] =
      e.stats.flatMap(_.get(SnapshotTable.physicalName(mapping, f.name)))

    // one evaluator per aggregate: fold a group's entries → catalyst value
    val evals: Seq[(StructField, Seq[SnapshotTable.FileEntry] => Any)] =
      agg.aggregateExpressions.toSeq.map { (fn: AggregateFunc) =>
        fn match {
          case _: CountStar =>
            (StructField("count_star", LongType, nullable = false),
              (es: Seq[SnapshotTable.FileEntry]) => es.map(SnapshotTable.liveRows).sum: Any)
          case c: Count if !c.isDistinct && !hasDv =>
            val f = fieldOf(c.column).getOrElse(return None)
            // null counts are exact in every stats-bearing entry
            if (!m.entries.forall(statOf(_, f).isDefined)) return None
            (StructField(s"count_${f.name}", LongType, nullable = false),
              (es: Seq[SnapshotTable.FileEntry]) =>
                es.map(e => e.rows - statOf(e, f).get.nulls).sum: Any)
          case mm @ (_: Min | _: Max) if !hasDv =>
            val isMin = mm.isInstanceOf[Min]
            val col = if (isMin) mm.asInstanceOf[Min].column else mm.asInstanceOf[Max].column
            val f = fieldOf(col).getOrElse(return None)
            val kind = scala.util.Try(FileStats.kindOf(f.dataType)).getOrElse(return None)
            // every entry must carry a stat whose relevant bound is either
            // absent-because-all-null or provably attained and exact
            val perEntry: Map[String, Option[(String, Any)]] = m.entries.map { e =>
              val s = statOf(e, f).getOrElse(return None)
              val b = if (isMin) s.lo else s.hi
              e.path -> (b match {
                case None => if (s.nulls == e.rows) None else return None
                case Some(bound) =>
                  Some(bound -> exactValue(bound, f.dataType).getOrElse(return None))
              })
            }.toMap
            def better(a: String, b: String): Boolean = {
              val c = if (kind == "num") java.lang.Double.compare(a.toDouble, b.toDouble)
                else FileStats.cmpUtf8(a, b)
              if (isMin) c < 0 else c > 0
            }
            (StructField(s"${if (isMin) "min" else "max"}_${f.name}", f.dataType,
              nullable = true),
              (es: Seq[SnapshotTable.FileEntry]) =>
                es.flatMap(e => perEntry(e.path))
                  .reduceOption((x, y) => if (better(x._1, y._1)) x else y)
                  .map(_._2).orNull: Any)
          case _ => return None // avg/sum/distinct/dv-blocked: not provable
        }
      }

    // group entries by provable partition value (empty grouping = one group)
    val groups: Seq[(Seq[Any], Seq[SnapshotTable.FileEntry])] =
      if (groupFields.isEmpty) Seq(Seq.empty[Any] -> m.entries)
      else {
        val keyed = m.entries.map { e =>
          groupFields.map(f => fileValue(e, f, mapping).getOrElse(return None)) -> e
        }
        keyed.groupBy(_._1).toSeq.map { case (k, es) => k -> es.map(_._2) }
      }

    val schemaOut = StructType(
      groupFields.map(f => f.copy(nullable = true)) ++ evals.map(_._1))
    val rows = groups.map { case (key, es) =>
      new GenericInternalRow((key ++ evals.map(_._2(es))).toArray): InternalRow
    }.toArray
    Some(schemaOut -> rows)
  }

  private def qualified(spark: SparkSession, dir: String): Path = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p)
  }

  /** A manifest-relative path in the EXACT string form scan-time
    * `PartitionedFile.filePath.toString` reports: URL-encoded SparkPath.
    * Raw `Path.toString` only coincides with it while paths carry no
    * URI-escapable characters — a Hive-escaped identity partition
    * directory (`__p_ts=1970-01-01 00%3A00%3A00`) diverges (`%20`/`%25`),
    * which would silently narrow scans to zero files and kill keyed
    * layouts on any such table.
    */
  private def scanPathForm(qdir: Path, rel: String): String =
    org.apache.spark.paths.SparkPath.fromPath(new Path(qdir, rel)).toString
}
