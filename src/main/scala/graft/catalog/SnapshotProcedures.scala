package graft.catalog

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The snapshot table's MAINTENANCE surface in pure SQL, as DSv2 stored
  * procedures (Spark 4's `CALL` statement — the seam Iceberg's
  * `CALL catalog.system.rewrite_data_files(...)` procedures use):
  *
  * {{{
  *   CALL snap.system.compact(table => '/w/ads/spend', target_file_bytes => 134217728)
  *   CALL snap.system.vacuum(table => 'ads.spend', keep_versions => 3)
  *   CALL snap.system.rollback(table => 'ads.spend', version => 4)
  * }}}
  *
  * `table` takes an absolute path or a dot-separated identifier under the
  * catalog root — the same addressing the table reads use. Each procedure
  * delegates to the transactional Scala implementation (the OCC commit
  * protocol, retention grace, layout preservation all apply verbatim) and
  * returns its outcome as a one-row result served by a driver-local scan.
  *
  * These are exactly the operations a 100 TB table needs on a schedule and
  * that previously required Scala: compaction bin-packs small commit files
  * toward the target size (layout-preserving), vacuum drops expired
  * versions + unreferenced files behind the in-flight-writer grace, and
  * rollback re-publishes an old version's file list as a NEW commit
  * (metadata-only at any size, bad commits stay in history).
  */
private[graft] object SnapshotProcedures {

  val Names: Seq[String] = Seq("compact", "vacuum", "rollback", "set_partition_spec")

  def forName(name: String, resolveDir: String => String): Option[UnboundProcedure] =
    name match {
      case "compact" => Some(new CompactProcedure(resolveDir))
      case "vacuum" => Some(new VacuumProcedure(resolveDir))
      case "rollback" => Some(new RollbackProcedure(resolveDir))
      case "set_partition_spec" => Some(new SetPartitionSpecProcedure(resolveDir))
      case _ => None
    }

  private def spark: SparkSession = SparkSession.active

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def paramWithDefault(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One-row result as a driver-local scan. */
  private def result(schema: StructType, values: Any*): JIterator[Scan] = {
    val row: InternalRow = new GenericInternalRow(values.toArray)
    Collections.singletonList[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = schema
    }).iterator()
  }

  private abstract class SnapshotProcedure(resolveDir: String => String)
    extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def dirOf(row: InternalRow): String = {
      val t = if (row.isNullAt(0)) null else row.getUTF8String(0)
      require(t != null, s"procedure $name requires a non-NULL 'table' argument")
      resolveDir(t.toString)
    }
    /** Every argument is semantically required (defaults fill omission, not
      * NULL): an explicit NULL must fail loudly, not decay to 0 — a NULL
      * grace_ms silently becoming "no grace" would let vacuum race
      * in-flight writers.
      */
    protected def requireSet(row: InternalRow, ordinal: Int, argName: String): Unit =
      require(!row.isNullAt(ordinal),
        s"procedure $name: argument '$argName' must not be NULL (omit it to use the default)")
  }

  private final class CompactProcedure(resolveDir: String => String)
    extends SnapshotProcedure(resolveDir) {
    override def name(): String = "compact"
    override def description(): String =
      "bin-pack the current snapshot's files toward target_file_bytes (one atomic commit); " +
        "only_files_below > 0 rewrites just the small/vectored tail (the 100 TB steady state); " +
        "zorder_by => 'a,b' additionally clusters the rewrite (OPTIMIZE ZORDER)"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      paramWithDefault("target_file_bytes", LongType, (128L * 1024 * 1024).toString),
      paramWithDefault("only_files_below", LongType, "-1"),
      paramWithDefault("zorder_by", StringType, "''"))
    override def call(input: InternalRow): JIterator[Scan] = {
      requireSet(input, 1, "target_file_bytes")
      requireSet(input, 2, "only_files_below")
      requireSet(input, 3, "zorder_by")
      val below = input.getLong(2) match {
        case b if b > 0 => Some(b)
        case _ => None
      }
      val zcols = input.getUTF8String(3).toString
        .split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val (in, out) = SnapshotTable.compact(spark, dirOf(input), input.getLong(1),
        onlyFilesBelow = below, zorderBy = zcols)
      result(StructType.fromDDL("files_before INT, files_after INT"), in, out)
    }
  }

  private final class VacuumProcedure(resolveDir: String => String)
    extends SnapshotProcedure(resolveDir) {
    override def name(): String = "vacuum"
    override def description(): String =
      "expire old versions and delete unreferenced files older than grace_ms; " +
        "dry_run => true reports the deletion plan (one row per path, kind ∈ " +
        "data|orphan|manifest|log) and deletes NOTHING"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      paramWithDefault("keep_versions", IntegerType, "2"),
      paramWithDefault("grace_ms", LongType, SnapshotTable.DefaultVacuumGraceMs.toString),
      paramWithDefault("dry_run", BooleanType, "false"))
    override def call(input: InternalRow): JIterator[Scan] = {
      requireSet(input, 1, "keep_versions")
      requireSet(input, 2, "grace_ms")
      requireSet(input, 3, "dry_run")
      if (input.getBoolean(3)) {
        val plan = SnapshotTable.vacuumDryRun(spark, dirOf(input),
          input.getInt(1), input.getLong(2))
        val schema = StructType.fromDDL("path STRING, kind STRING")
        val planRows = plan.map { case (p, k) =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(p), UTF8String.fromString(k))): InternalRow
        }.toArray
        Collections.singletonList[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = planRows
          override def readSchema(): StructType = schema
        }).iterator()
      } else {
        val deleted = SnapshotTable.vacuum(spark, dirOf(input),
          input.getInt(1), input.getLong(2))
        result(StructType.fromDDL("files_deleted INT"), deleted)
      }
    }
  }

  private final class RollbackProcedure(resolveDir: String => String)
    extends SnapshotProcedure(resolveDir) {
    override def name(): String = "rollback"
    override def description(): String =
      "re-publish an old version's file list + schema + txn markers as a NEW version"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("version", LongType))
    override def call(input: InternalRow): JIterator[Scan] = {
      requireSet(input, 1, "version")
      val newV = SnapshotTable.rollback(spark, dirOf(input), input.getLong(1))
      result(StructType.fromDDL("restored_version BIGINT, new_version BIGINT"),
        input.getLong(1), newV)
    }
  }

  /** PARTITION EVOLUTION: `CALL snap.system.set_partition_spec(table =>
    * …, spec => 'days(ts),bucket(8,k)')` — a metadata-only commit
    * ([[SnapshotTable.setPartitionSpec]]); `spec => ''` un-partitions.
    * Existing files keep their old layout (read conservatively) until the
    * next compaction re-routes them; new writes route by the new spec.
    */
  private final class SetPartitionSpecProcedure(resolveDir: String => String)
    extends SnapshotProcedure(resolveDir) {
    override def name(): String = "set_partition_spec"
    override def description(): String =
      "change the table's partition spec in place (metadata-only; '' un-partitions); " +
        "old files stay valid and the next compact re-routes them into the new layout"
    override def parameters(): Array[ProcedureParameter] = Array(
      param("table", StringType),
      param("spec", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      requireSet(input, 1, "spec")
      val spec = PartitionFields.splitSpec(input.getUTF8String(1).toString)
      val v = SnapshotTable.setPartitionSpec(spark, dirOf(input), spec)
      result(StructType.fromDDL("new_version BIGINT, spec STRING"),
        v, org.apache.spark.unsafe.types.UTF8String.fromString(spec.mkString(",")))
    }
  }
}
