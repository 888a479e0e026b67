package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{EmptyRow, Literal, XxHash64}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
import org.apache.spark.sql.types.DataType

/** The snapshot partition spec's field model: IDENTITY fields (one
  * directory per raw value — Hive/Iceberg identity) and BUCKET fields
  * (one directory per `pmod(xxhash64(col), n)` — Iceberg's bucket
  * transform, the layout for CO-LOCATED JOINS ON HIGH-CARDINALITY KEYS
  * where identity partitioning would explode into one directory per key).
  *
  * Fields ride the manifest's existing `partitionCols` string list in an
  * ENCODED form — a plain column name for identity, `bucket(n,col)` for
  * bucket — so every manifest ever written parses unchanged and all
  * spec plumbing (commit carry-forward, replace semantics, catalog
  * surfacing) stays string-shaped.
  *
  * The bucket id is defined ONCE, as the catalyst expression
  * `pmod(xxhash64(col), n)` (seed-42 XxHash64, Spark's own function):
  * the writer routes with the Column form, the pruner and the catalog's
  * SQL `bucket` function evaluate the same [[XxHash64]] expression — so
  * write-time routing, point-lookup file pruning, and storage-partitioned
  * join keys can never disagree on a bucket.
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
    def dirCol: String = BucketDirPrefix + col
  }

  /** Bucket routing directories: `c-…/__pb_<col>=<id>/part-….parquet`. */
  private[catalog] val BucketDirPrefix = "__pb_"

  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*(.+?)\s*\)""".r

  def parse(s: String): Field = s match {
    case BucketRe(n, c) =>
      val buckets = n.toInt
      require(buckets >= 1, s"bucket count must be >= 1 in '$s'")
      Bucket(buckets, c)
    case c => Identity(c)
  }

  def parseAll(pcols: Seq[String]): Seq[Field] = pcols.map(parse)

  /** The underlying data columns of an encoded spec (for stats priority,
    * validation, and schema presence checks).
    */
  def cols(pcols: Seq[String]): Seq[String] = parseAll(pcols).map(_.col)

  /** The routing Column for one field — identity duplicates the value,
    * bucket computes the id (never NULL: xxhash64 folds a null input to
    * its seed, so null keys route to a stable bucket like any other).
    */
  def routeColumn(f: Field): Column = f match {
    case Identity(c) => col(s"`$c`")
    case Bucket(n, c) => pmod(xxhash64(col(s"`$c`")), lit(n.toLong)).cast("int")
  }

  /** The bucket id of one VALUE (catalyst-internal form) — evaluated
    * through the same [[XxHash64]] expression the routing column uses.
    */
  def bucketId(value: Any, dt: DataType, n: Int): Int = {
    val h = new XxHash64(Seq(Literal(value, dt))).eval(EmptyRow).asInstanceOf[Long]
    (((h % n) + n) % n).toInt
  }

  /** A routed file's bucket id recovered from its directory path
    * (`__pb_<col>=<id>/`); None for files that did not route through the
    * bucket layout (streaming epochs, row-level rewrites) — callers must
    * treat those as may-match-anything.
    */
  def bucketIdFromPath(path: String, f: Bucket): Option[Int] = {
    val marker = s"${f.dirCol}="
    val i = path.indexOf(marker)
    if (i < 0) return None
    val rest = path.substring(i + marker.length).takeWhile(_ != '/')
    if (rest.nonEmpty && rest.forall(_.isDigit)) scala.util.Try(rest.toInt).toOption
    else None
  }
}
