package graft.catalog

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{EmptyRow, Literal, XxHash64}
import org.apache.spark.sql.functions.{col, datediff, expr, lit, month, pmod, substring, to_date, xxhash64, year}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The snapshot partition spec's field model:
  *
  *  - IDENTITY fields — one directory per raw value (Hive/Iceberg
  *    identity);
  *  - BUCKET fields — one directory per `pmod(xxhash64(col), n)`
  *    (Iceberg's bucket transform, the layout for CO-LOCATED JOINS ON
  *    HIGH-CARDINALITY KEYS where identity partitioning would explode
  *    into one directory per key);
  *  - TEMPORAL fields — `years/months/days/hours(col)` (Iceberg's hidden
  *    time partitioning: the user filters on the RAW date/timestamp
  *    column and pruning still applies, because every transform is
  *    MONOTONE in the source value — a range predicate on the column maps
  *    to a range predicate on the transform ordinal);
  *  - TRUNCATE fields — `truncate(w,col)` (value floored to a multiple of
  *    `w` for integrals, a `w`-code-point prefix for strings — also
  *    monotone, so range pruning applies).
  *
  * Fields ride the manifest's existing `partitionCols` string list in an
  * ENCODED form — a plain column name for identity, `bucket(n,col)` /
  * `days(col)` / `truncate(w,col)` for transforms — so every manifest
  * ever written parses unchanged and all spec plumbing (commit
  * carry-forward, replace semantics, catalog surfacing) stays
  * string-shaped.
  *
  * Every transform has exactly ONE value definition, shared by three
  * consumers that must never disagree: the writer's routing Column, the
  * pruner's literal evaluation ([[transformValue]]), and the catalog's V2
  * functions ([[SnapshotFunctions]], what storage-partitioned joins
  * resolve). Bucket delegates all three to the seed-42 [[XxHash64]]
  * catalyst expression; temporal transforms are defined on the PHYSICAL
  * value (epoch days of a date, floorDiv of timestamp micros — never the
  * session time zone, so a reader in another zone prunes identically);
  * string truncation delegates both sides to
  * [[UTF8String#substringSQL]].
  */
private[graft] object PartitionFields {

  sealed trait Field {
    /** The underlying DATA column (what stats/validation care about). */
    def col: String
    /** Wire form inside `Manifest.partitionCols`. */
    def encoded: String
    /** The routing column partitionBy consumes (never lands in schemas). */
    def dirCol: String
  }

  final case class Identity(col: String) extends Field {
    def encoded: String = col
    def dirCol: String = SnapshotTable.PartDupPrefix + col
  }

  final case class Bucket(n: Int, col: String) extends Field {
    def encoded: String = s"bucket($n,$col)"
    // n is part of the marker: under PARTITION EVOLUTION a file routed as
    // bucket(8,k) must never be read back as a bucket(16,k) id — a bare
    // `__pb_k=` marker would alias the two and prune wrong files.
    //
    // MIGRATION NOTE: directories written by builds that predate the
    // n-in-marker format carry the legacy `__pb_<col>=` marker, which
    // this reader deliberately does NOT recognize — the legacy path does
    // not record its write-time bucket count, so after a spec evolution
    // its id would be read back in the wrong domain (exactly the
    // aliasing the new marker closes). Legacy files therefore degrade to
    // may-match-anything (pruning and the SPJ layout disable for them —
    // correctness never at stake) until a `compact()` rewrites them
    // under current-format markers; [[legacyBucketMarker]] makes the
    // degradation visible with a one-time WARN naming that migration.
    def dirCol: String = s"$BucketDirPrefix${n}_$col"
    private[catalog] def legacyMarker: String = s"$BucketDirPrefix$col="
  }

  /** `unit` ∈ years | months | days | hours; ordinals since the epoch
    * (1970 / 1970-01 / 1970-01-01 / 1970-01-01T00), negative before it.
    */
  final case class Temporal(unit: String, col: String) extends Field {
    def encoded: String = s"$unit($col)"
    def dirCol: String = s"$TemporalDirPrefix${unit}_$col"
  }

  final case class Truncate(w: Int, col: String) extends Field {
    def encoded: String = s"truncate($w,$col)"
    def dirCol: String = s"$TruncateDirPrefix${w}_$col"
  }

  /** Bucket routing directories: `c-…/__pb_<n>_<col>=<id>/part-….parquet`. */
  private[catalog] val BucketDirPrefix = "__pb_"
  /** Temporal routing directories: `c-…/__pt_days_<col>=<ord>/…`. */
  private[catalog] val TemporalDirPrefix = "__pt_"
  /** Truncate routing directories: `c-…/__pr_<w>_<col>=<v>/…`. */
  private[catalog] val TruncateDirPrefix = "__pr_"

  val TemporalUnits: Seq[String] = Seq("years", "months", "days", "hours")

  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*(.+?)\s*\)""".r
  private val TemporalRe = """(years|months|days|hours)\(\s*(.+?)\s*\)""".r
  private val TruncateRe = """truncate\(\s*(\d+)\s*,\s*(.+?)\s*\)""".r

  def parse(s: String): Field = s match {
    case BucketRe(n, c) =>
      val buckets = n.toInt
      require(buckets >= 1, s"bucket count must be >= 1 in '$s'")
      Bucket(buckets, c)
    case TemporalRe(unit, c) => Temporal(unit, c)
    case TruncateRe(w, c) =>
      val width = w.toInt
      require(width >= 1, s"truncate width must be >= 1 in '$s'")
      Truncate(width, c)
    case c => Identity(c)
  }

  def parseAll(pcols: Seq[String]): Seq[Field] = pcols.map(parse)

  /** Split a user-facing spec string (`"days(ts), bucket(8,k)"`) into
    * encoded fields — commas INSIDE a transform's parens don't split.
    */
  def splitSpec(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    out += cur.toString.trim
    out.filter(_.nonEmpty).toSeq
  }

  /** The underlying data columns of an encoded spec (for stats priority,
    * validation, and schema presence checks).
    */
  def cols(pcols: Seq[String]): Seq[String] = parseAll(pcols).map(_.col)

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  /** `floorDiv` as a catalyst-exact Column: the numerator is floored to
    * an exact multiple first, so SQL `div` (truncating) equals floor —
    * all in 64-bit integer arithmetic, no double rounding at any
    * magnitude (a plain `/` is a double divide, inexact past 2^53).
    */
  private def floorDivExpr(c: String, micros: Long): String =
    s"((unix_micros(`$c`) - pmod(unix_micros(`$c`), ${micros}L)) div ${micros}L)"

  /** The routing Column for one field — identity duplicates the value,
    * bucket computes the id (never NULL: xxhash64 folds a null input to
    * its seed, so null keys route to a stable bucket like any other),
    * temporal computes the epoch ordinal (null values route to the
    * default partition, recovered as may-match-anything), truncate floors
    * integrals to a multiple / strings to a code-point prefix.
    *
    * Temporal ordinals are TIME-ZONE-FREE by construction: dates use date
    * arithmetic (no zone exists), timestamps use `unix_micros` floor
    * division, and year/month ordinals derive from the UTC epoch day via
    * `date_add(DATE'1970-01-01', day)` — never `year(timestamp)`, whose
    * result shifts with the session zone and would let a reader in
    * another zone prune files the writer routed elsewhere.
    */
  def routeColumn(f: Field, dt: DataType): Column = f match {
    case Identity(c) => col(s"`$c`")
    case Bucket(n, c) => pmod(xxhash64(col(s"`$c`")), lit(n.toLong)).cast("int")
    case Temporal(unit, c) =>
      val day: Column = dt match {
        case DateType => datediff(col(s"`$c`"), to_date(lit("1970-01-01")))
        case _ => expr(floorDivExpr(c, MicrosPerDay)).cast("int")
      }
      unit match {
        case "days" => day.cast("int")
        case "hours" => expr(floorDivExpr(c, MicrosPerHour)).cast("int")
        case "years" =>
          (year(utcDate(day, dt, c)) - lit(1970)).cast("int")
        case "months" =>
          ((year(utcDate(day, dt, c)) - lit(1970)) * lit(12) +
            month(utcDate(day, dt, c)) - lit(1)).cast("int")
      }
    case Truncate(w, c) => dt match {
      case StringType => substring(col(s"`$c`"), 1, w)
      case LongType => col(s"`$c`") - pmod(col(s"`$c`"), lit(w.toLong))
      case _ => (col(s"`$c`") - pmod(col(s"`$c`"), lit(w))).cast("int")
    }
  }

  /** The calendar date of an epoch-day Column (dates pass through —
    * `year(DATE)` is zone-free; timestamps go through their UTC day).
    */
  private def utcDate(day: Column, dt: DataType, c: String): Column = dt match {
    case DateType => col(s"`$c`")
    case _ => org.apache.spark.sql.functions.date_add(to_date(lit("1970-01-01")), day)
  }

  /** The bucket id of one VALUE (catalyst-internal form) — evaluated
    * through the same [[XxHash64]] expression the routing column uses.
    */
  def bucketId(value: Any, dt: DataType, n: Int): Int = {
    val h = new XxHash64(Seq(Literal(value, dt))).eval(EmptyRow).asInstanceOf[Long]
    (((h % n) + n) % n).toInt
  }

  /** The TRANSFORM VALUE of one non-null catalyst value under a temporal
    * or truncate field — the literal-side twin of [[routeColumn]], exact
    * integer/epoch-day arithmetic mirroring the Column definitions
    * (parity asserted row-by-row by TemporalPartitionSpec). Returns the
    * catalyst-comparable form: `Int` ordinals for temporal, `Long`/`Int`
    * for integral truncate, [[UTF8String]] for string truncate.
    */
  def transformValue(value: Any, dt: DataType, f: Field): Option[Any] = f match {
    case Temporal(unit, _) =>
      val day: Long = (dt, value) match {
        case (DateType, d: Int) => d.toLong
        case (TimestampType, micros: Long) =>
          Math.floorDiv(micros, MicrosPerDay)
        case _ => return None
      }
      unit match {
        case "days" => Some(day.toInt)
        case "hours" => value match {
          case micros: Long => Some(Math.floorDiv(micros, MicrosPerHour).toInt)
          case _ => None
        }
        case "years" => Some(LocalDate.ofEpochDay(day).getYear - 1970)
        case "months" =>
          val ld = LocalDate.ofEpochDay(day)
          Some((ld.getYear - 1970) * 12 + ld.getMonthValue - 1)
      }
    case Truncate(w, _) => (dt, value) match {
      case (StringType, s: UTF8String) => Some(s.substringSQL(1, w))
      case (LongType, v: Long) => Some(v - Math.floorMod(v, w.toLong))
      case (IntegerType, v: Int) => Some(v - Math.floorMod(v, w))
      case (ShortType, v: Short) => Some(v - Math.floorMod(v.toInt, w))
      case (ByteType, v: Byte) => Some(v - Math.floorMod(v.toInt, w))
      case _ => None
    }
    case _ => None
  }

  /** Source types a temporal field accepts for `dt`: hours needs sub-day
    * resolution. TimestampNTZ is REFUSED: the routing column reads micros
    * through `unix_micros`, which would implicitly cast NTZ through the
    * session zone — exactly the zone-dependence these transforms exist to
    * avoid.
    */
  def temporalAccepts(unit: String, dt: DataType): Boolean = dt match {
    case DateType => unit != "hours"
    case TimestampType => true
    case _ => false
  }

  def truncateAccepts(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** A routed file's value for a directory-recovered field (`__pb_`/
    * `__pt_`/`__pr_` markers); None for files that did not route through
    * the layout (streaming epochs, row-level rewrites) — callers must
    * treat those as may-match-anything. The returned form matches
    * [[transformValue]]'s domain.
    *
    * Strings are recovered CONSERVATIVELY: dynamic-partition writes
    * Hive-escape special characters (`%xx`) and fold null/empty into the
    * default partition — a segment containing `%` or the default marker
    * yields None rather than an unescaping round-trip the pruner's
    * correctness would hang on.
    */
  def valueFromPath(path: String, f: Field): Option[Any] = {
    val marker = s"${f.dirCol}="
    val i = path.indexOf(marker)
    if (i < 0) return None
    val rest = path.substring(i + marker.length).takeWhile(_ != '/')
    if (rest.isEmpty || rest == "__HIVE_DEFAULT_PARTITION__") return None
    f match {
      case _: Bucket =>
        if (rest.forall(_.isDigit)) scala.util.Try(rest.toInt).toOption else None
      case _: Temporal => parseSignedInt(rest)
      case _ => None // truncate needs the stored type: truncValueFromPath
    }
  }

  private def parseSignedInt(s: String): Option[Int] = {
    val body = if (s.startsWith("-")) s.substring(1) else s
    if (body.nonEmpty && body.forall(_.isDigit)) scala.util.Try(s.toInt).toOption else None
  }

  /** [[valueFromPath]] for truncate needs the STORED type to pick the
    * numeric domain (and refuses escaped strings — see above).
    */
  def truncValueFromPath(path: String, f: Truncate, dt: DataType): Option[Any] = {
    val marker = s"${f.dirCol}="
    val i = path.indexOf(marker)
    if (i < 0) return None
    val rest = path.substring(i + marker.length).takeWhile(_ != '/')
    if (rest.isEmpty || rest == "__HIVE_DEFAULT_PARTITION__") return None
    dt match {
      case StringType =>
        if (rest.contains('%')) None else Some(UTF8String.fromString(rest))
      case LongType =>
        val body = if (rest.startsWith("-")) rest.substring(1) else rest
        if (body.nonEmpty && body.forall(_.isDigit)) scala.util.Try(rest.toLong).toOption
        else None
      case ByteType | ShortType | IntegerType => parseSignedInt(rest).map(v => v: Any)
      case _ => None
    }
  }

  /** A routed file's bucket id recovered from its directory path
    * (`__pb_<n>_<col>=<id>/`); None for files that did not route through
    * the bucket layout — callers must treat those as may-match-anything.
    * Legacy `__pb_<col>=` directories (pre-n-in-marker builds) stay
    * unrecognized by design (see [[Bucket.dirCol]]'s migration note) but
    * surface once per JVM as a WARN pointing at the compact() migration.
    */
  def bucketIdFromPath(path: String, f: Bucket): Option[Int] = {
    val id = valueFromPath(path, f).map(_.asInstanceOf[Int])
    if (id.isEmpty && path.contains(f.legacyMarker) && legacyWarned.add(f.col))
      log.warn(s"bucket-routed file '$path' carries the legacy '${f.legacyMarker}' marker " +
        s"(pre-evolution format): bucket pruning and the storage-partitioned-join layout " +
        s"are disabled for such files until compact() rewrites them under the " +
        s"'${f.dirCol}=' format")
    id
  }

  private val legacyWarned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
