package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Per-file column statistics and the predicate→skip translator — the
  * data-skipping half of [[SnapshotTable]], in miniature the same layer
  * Delta's `stats` JSON / Iceberg's manifest `lower_bounds`/`upper_bounds`
  * provide. The reference got file skipping implicitly from Snowflake's
  * micro-partition metadata (`README.md`'s warehouse does this server-side);
  * on a raw filesystem the manifest has to carry it.
  *
  * Design constraints, in order:
  *  1. Pruning must be CONSERVATIVE — a translator that cannot prove a file
  *     irrelevant keeps it. Every fallthrough in [[mayMatch]] returns true.
  *  2. The manifest must stay driver-sized at 100 TB: string bounds are
  *     truncated to [[TruncLen]] code points (lower bounds truncate soundly
  *     as-is; upper bounds pad with U+10FFFF so the truncated bound still
  *     dominates every value it summarizes — the Delta trick).
  *  3. Bound comparison must agree with Spark's. Spark orders strings by
  *     UTF-8 bytes; `java.lang.String.compareTo` orders by UTF-16 units,
  *     which disagrees for supplementary characters — so [[cmpUtf8]]
  *     compares the UTF-8 encodings unsigned instead.
  */
object FileStats {

  /** One column's per-file summary. `kind` is "num" (lo/hi parse as Double)
    * or "str" (UTF-8-lexicographic bounds; dates ride as ISO strings, whose
    * lexicographic order IS date order). `nulls` enables IsNull/IsNotNull
    * skipping. All-NULL columns carry empty bounds (`lo`/`hi` None).
    */
  case class ColStat(kind: String, lo: Option[String], hi: Option[String], nulls: Long)

  val TruncLen = 64
  /** Columns after the first [[MaxStatCols]] eligible ones get no stats —
    * manifests scale with file count, not schema width.
    */
  val MaxStatCols = 32

  /** Is min/max skipping meaningful (and cheap) for this type? Binary and
    * nested types are excluded: their bounds are big and rarely filtered on.
    */
  def eligible(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | DateType | TimestampType |
         TimestampNTZType | BooleanType => true
    case _ => false
  }

  /** The stat `kind` a column of this type collects into. */
  def kindOf(dt: DataType): String = dt match {
    case StringType | DateType => "str"
    case _ => "num" // numerics, timestamps (as epoch micros), booleans (as 0/1)
  }

  // ------------------------------------------------------------- compare

  /** Unsigned UTF-8 byte comparison — Spark's string order, not Java's. */
  private[graft] def cmpUtf8(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def cmp(kind: String, bound: String, v: String): Int =
    if (kind == "num") java.lang.Double.compare(bound.toDouble, v.toDouble)
    else cmpUtf8(bound, v)

  /** A comparable literal in the stat's domain: Some(numeric as string) for
    * "num", Some(string form) for "str"; None when the literal cannot be
    * aligned with the stat kind (→ caller keeps the file).
    */
  private def litKey(kind: String, l: Literal): Option[String] = {
    if (l.value == null) return None
    (kind, l.dataType) match {
      // a NaN literal compares false against any real bound, which would
      // wrongly prune files that DO hold NaN rows (bounds never cover NaN:
      // parquet footers exclude it, and a footer collector can't see it)
      case ("num", FloatType | DoubleType) if l.value.toString == "NaN" => None
      case ("num", _: NumericType) => Some(l.value.toString)
      case ("num", BooleanType) => Some(if (l.value == true) "1" else "0")
      case ("num", TimestampType | TimestampNTZType) => Some(l.value.toString) // micros
      case ("num", StringType) => scala.util.Try(l.value.toString.toDouble.toString).toOption
      case ("str", StringType) => Some(l.value.toString)
      case ("str", DateType) => // Catalyst stores DateType as epoch days
        Some(java.time.LocalDate.ofEpochDay(l.value.asInstanceOf[Int].toLong).toString)
      case _ => None
    }
  }

  // -------------------------------------------------------------- prune

  private def nameOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.name)
    // A resolved predicate may wrap the attribute in a cast. Skipping
    // through it is only sound when the cast is order-preserving AND the
    // cast domain matches the stat encoding ("num" bounds compare as
    // doubles): widening numeric→numeric casts qualify (including
    // decimal→double — decimal bounds are already stored through a double
    // cast). Anything else — narrowing (wraps), timestamp→long (rescales
    // micros to seconds), string parses — must NOT prune on raw column
    // bounds; returning None keeps the file (conservative contract).
    case c @ Cast(inner, to, _, _) if safeCastSkip(inner.dataType, to) => nameOf(inner)
    case _ => None
  }

  private def safeCastSkip(from: DataType, to: DataType): Boolean = (from, to) match {
    // DoubleType targets: exact for int/float inputs, and monotone for
    // long/decimal — and the stored bounds already live in the double
    // domain (collected through a double cast), so double(v) <= double(hi)
    // holds for every summarized v and the bound comparison agrees with
    // the predicate's own arithmetic.
    case (_: NumericType, DoubleType) => true
    // Exact integral widening never changes a value.
    case (f: NumericType, t: NumericType) if isExactIntegral(f) && isExactIntegral(t) =>
      org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(f, t)
    // FloatType targets are REFUSED even though Spark's canUpCast admits
    // int→float and long→float: float rounds |v| > 2^24, so CAST(col AS
    // FLOAT) can land ON or PAST the double-precision stored bound
    // (hi=16777219 → float(16777219)=16777220.0f matches a >= 16777220.0f
    // predicate the bound comparison would prune). Decimal targets are
    // refused for the same reason: scale coercion re-rounds values
    // relative to the double-stored bounds.
    case _ => false
  }

  private def isExactIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Fold every foldable subtree to a plain Literal. Analysis leaves
    * coercions around constants (`Cast("2024-01-01" AS DATE)`), which the
    * literal-shaped patterns in [[mayMatch]] would otherwise miss.
    */
  def normalize(e: Expression): Expression = e.transformUp {
    case f if f.foldable && !f.isInstanceOf[Literal] =>
      Literal(f.eval(org.apache.spark.sql.catalyst.expressions.EmptyRow), f.dataType)
  }

  /** Could ANY row of a file with these stats satisfy `pred`? Conservative:
    * anything the translator doesn't understand answers true. `rows` is the
    * file's row count (for IsNotNull against an all-NULL column).
    */
  def mayMatch(pred: Expression, stats: Map[String, ColStat], rows: Long): Boolean = {
    def bounds(attr: Expression): Option[(ColStat, String, String)] =
      for {
        n <- nameOf(attr); s <- stats.get(n); lo <- s.lo; hi <- s.hi
      } yield (s, lo, hi)

    def cmpLit(attr: Expression, l: Literal)(f: (ColStat, String, String, String) => Boolean): Boolean =
      bounds(attr) match {
        case Some((s, lo, hi)) => litKey(s.kind, l) match {
          case Some(v) => f(s, lo, hi, v)
          case None => true
        }
        case None => true
      }

    pred match {
      case And(l, r) => mayMatch(l, stats, rows) && mayMatch(r, stats, rows)
      case Or(l, r) => mayMatch(l, stats, rows) || mayMatch(r, stats, rows)

      case EqualTo(a, l: Literal) => cmpLit(a, l)((s, lo, hi, v) =>
        cmp(s.kind, lo, v) <= 0 && cmp(s.kind, hi, v) >= 0)
      case EqualTo(l: Literal, a) => mayMatch(EqualTo(a, l), stats, rows)
      case EqualNullSafe(a, l: Literal) if l.value != null =>
        mayMatch(EqualTo(a, l), stats, rows)

      case LessThan(a, l: Literal) => cmpLit(a, l)((s, lo, _, v) => cmp(s.kind, lo, v) < 0)
      case LessThanOrEqual(a, l: Literal) => cmpLit(a, l)((s, lo, _, v) => cmp(s.kind, lo, v) <= 0)
      case GreaterThan(a, l: Literal) => cmpLit(a, l)((s, _, hi, v) => cmp(s.kind, hi, v) > 0)
      case GreaterThanOrEqual(a, l: Literal) => cmpLit(a, l)((s, _, hi, v) => cmp(s.kind, hi, v) >= 0)
      // literal-on-the-left mirrors
      case LessThan(l: Literal, a) => mayMatch(GreaterThan(a, l), stats, rows)
      case LessThanOrEqual(l: Literal, a) => mayMatch(GreaterThanOrEqual(a, l), stats, rows)
      case GreaterThan(l: Literal, a) => mayMatch(LessThan(a, l), stats, rows)
      case GreaterThanOrEqual(l: Literal, a) => mayMatch(LessThanOrEqual(a, l), stats, rows)

      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => mayMatch(EqualTo(a, v.asInstanceOf[Literal]), stats, rows))
      case InSet(a, vs) =>
        // InSet holds raw values, not Literals; rebuild via the attr's type
        // when known, else keep the file
        a.resolved && vs.exists(v => mayMatch(EqualTo(a, Literal(v, a.dataType)), stats, rows)) ||
          !a.resolved

      case IsNull(a) =>
        nameOf(a).flatMap(stats.get).forall(_.nulls > 0)
      case IsNotNull(a) =>
        nameOf(a).flatMap(stats.get).forall(_.nulls < rows)

      case StartsWith(a, l: Literal) => cmpLit(a, l) { (s, lo, hi, v) =>
        // any string with prefix v lies in [v, v + maxChar*]: the file may
        // hold one iff hi >= v and lo <= v+maxChar-pad
        s.kind != "str" || (cmpUtf8(hi, v) >= 0 && cmpUtf8(lo, padMax(v)) <= 0)
      }

      case Not(IsNull(a)) => mayMatch(IsNotNull(a), stats, rows)
      case Not(IsNotNull(a)) => mayMatch(IsNull(a), stats, rows)

      case _ => true // unknown shape: never prune on it
    }
  }

  /** `v` extended so it upper-bounds every string having `v` as a prefix. */
  private def padMax(v: String): String =
    v + new String(Character.toChars(Character.MAX_CODE_POINT)) * 8

  // ------------------------------------------------------------ collect

  /** Truncate a collected LOWER bound: a prefix is ≤ the full string, so
    * plain truncation stays a valid lower bound.
    */
  private[graft] def truncLo(s: String): String =
    if (s.codePointCount(0, s.length) <= TruncLen) s
    else s.substring(0, s.offsetByCodePoints(0, TruncLen))

  /** Truncate a collected UPPER bound: plain truncation would UNDERSHOOT
    * (prefix < full string), so a truncated bound is padded with U+10FFFF
    * to re-dominate everything it summarizes.
    */
  private[graft] def truncHi(s: String): String =
    if (s.codePointCount(0, s.length) <= TruncLen) s
    else s.substring(0, s.offsetByCodePoints(0, TruncLen)) +
      new String(Character.toChars(Character.MAX_CODE_POINT)) * 8

  /** The stat-collection expression triple (lo, hi, nulls) for one column,
    * aligned with [[kindOf]]: numerics/booleans/timestamps collect through
    * a double/long cast, strings and dates through a string cast.
    */
  def aggsFor(f: StructField): Seq[Column] = {
    import org.apache.spark.sql.functions._
    val c = col(s"`${f.name}`")
    // min/max must run in the NATIVE ordering and only the result becomes a
    // string — min over string-casts would be lexicographic ("10" < "9")
    val projected: Column = f.dataType match {
      case StringType => c
      case DateType => c.cast("string") // ISO dates: string order = date order
      case TimestampType | TimestampNTZType => unix_micros(c.cast("timestamp"))
      case BooleanType => c.cast("int")
      case _: NumericType => c.cast("double")
      case other => throw new IllegalArgumentException(s"no stats for $other")
    }
    Seq(
      min(projected).cast("string").as(s"__lo_${f.name}"),
      max(projected).cast("string").as(s"__hi_${f.name}"),
      sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nulls_${f.name}"))
  }
}
