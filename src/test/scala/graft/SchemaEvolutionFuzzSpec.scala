package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.SnapshotTable

/** Model-based fuzz over the schema-evolution surface: a deterministic
  * random walk of appends (sometimes widening, sometimes narrow), ADD /
  * DROP / RENAME COLUMN against one snapshot table, mirrored against an
  * in-memory model that tracks the LOGICAL schema, the logical→physical
  * mapping, and the physical tombstone set. After every mutation the
  * table readback must equal the model exactly — the property that
  * catches any resurrection path (a column silently re-bound to stale
  * physical bytes), lost mapping entries, or widening drift that a
  * hand-written case matrix would miss.
  */
class SchemaEvolutionFuzzSpec extends SparkSpec {

  private val ColPool = Vector("a", "b", "c", "d", "e", "f")

  test("random append/add/drop/rename walk matches the logical model at every step") {
    val dir = Files.createTempDirectory("graft-sefuzz").toString + "/t"
    val rnd = new Random(42)

    // model state: logical column order (id first, always present),
    // logical→physical map, tombstoned physical names, and rows as
    // (id → logical column → value or null)
    var schema: Vector[String] = Vector("id")
    var mapping: Map[String, String] = Map.empty
    var tombs: Set[String] = Set.empty
    var rows: Map[Long, Map[String, Any]] = Map.empty
    var nextId = 0L
    def phys(c: String): String = mapping.getOrElse(c, c)
    def reserved: Set[String] = (mapping.values ++ tombs).toSet

    def sparkSchema(cols: Vector[String]): StructType =
      StructType(cols.map(c => StructField(c, LongType, nullable = true)))

    def appendBatch(extraRaw: Option[String], dropCol: Option[String]): Unit = {
      val extra = extraRaw.filterNot(c => schema.exists(_.equalsIgnoreCase(c)))
      val batchCols = (schema.filterNot(dropCol.contains) ++ extra.toSeq).toVector
      val n = 5 + rnd.nextInt(10)
      val ids = (nextId until nextId + n).toVector
      nextId += n
      val data = ids.map { id =>
        Row.fromSeq(batchCols.map {
          case "id" => id
          case c => id * 31 + c.hashCode.toLong % 1000
        })
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 2), sparkSchema(batchCols))
      val widens = extra.exists(c => !schema.contains(c))
      if (widens && extra.exists(c => reserved.exists(_.equalsIgnoreCase(c)))) {
        // the widening path must refuse a reserved physical name
        val e = intercept[Exception] { SnapshotTable.append(spark, df, dir) }
        assert(e.getMessage.contains("occupied") || e.getMessage.contains("resurrect"),
          e.getMessage)
        nextId -= n // nothing landed
        return
      }
      SnapshotTable.append(spark, df, dir)
      if (widens) schema = schema ++ extra
      rows ++= ids.map { id =>
        id -> schema.map { c =>
          c -> (if (c == "id") (id: Any)
          else if (batchCols.contains(c)) (id * 31 + c.hashCode.toLong % 1000: Any)
          else null)
        }.toMap
      }
      // pre-existing rows read null for a freshly widened column
      if (widens) rows = rows.map { case (id, r) =>
        id -> (if (r.contains(extra.get)) r else r + (extra.get -> null))
      }
    }

    def check(step: Int): Unit = {
      val got = SnapshotTable.read(spark, dir)
      assert(got.columns.toVector == schema,
        s"step $step: schema ${got.columns.toVector} != model $schema " +
          s"(mapping $mapping, tombs $tombs)")
      val gotRows = got.collect().map { r =>
        val m = schema.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(i)) null else r.getLong(i): Any) }.toMap
        m("id").asInstanceOf[Long] -> m
      }.toMap
      assert(gotRows.size == rows.size, s"step $step: ${gotRows.size} rows != ${rows.size}")
      rows.foreach { case (id, expect) =>
        assert(gotRows(id) == expect,
          s"step $step, id $id: got ${gotRows(id)} expected $expect " +
            s"(mapping $mapping, tombs $tombs)")
      }
    }

    // seed the table
    appendBatch(None, None)
    check(0)

    (1 to 45).foreach { step =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // plain append, sometimes narrow
          val dropC = if (rnd.nextBoolean() && schema.length > 1)
            Some(schema(1 + rnd.nextInt(schema.length - 1))) else None
          appendBatch(None, dropC)
        case 4 | 5 => // widening append with a pool column
          appendBatch(Some(ColPool(rnd.nextInt(ColPool.length))), None)
        case 6 => // ALTER ADD
          val c = ColPool(rnd.nextInt(ColPool.length))
          if (schema.exists(_.equalsIgnoreCase(c))) {
            intercept[Exception] {
              SnapshotTable.addColumns(spark, dir, StructType.fromDDL(s"$c BIGINT")) }
          } else if (reserved.exists(_.equalsIgnoreCase(c))) {
            val e = intercept[Exception] {
              SnapshotTable.addColumns(spark, dir, StructType.fromDDL(s"$c BIGINT")) }
            assert(e.getMessage.contains("resurrect"), e.getMessage)
          } else {
            SnapshotTable.addColumns(spark, dir, StructType.fromDDL(s"$c BIGINT"))
            schema = schema :+ c
            rows = rows.map { case (id, r) => id -> (r + (c -> null)) }
          }
        case 7 => // DROP a random non-id column
          if (schema.length > 1) {
            val c = schema(1 + rnd.nextInt(schema.length - 1))
            SnapshotTable.dropColumn(spark, dir, c)
            tombs += phys(c)
            mapping -= c
            schema = schema.filterNot(_ == c)
            rows = rows.map { case (id, r) => id -> (r - c) }
          }
        case 8 | 9 => // RENAME a random non-id column to a pool name
          if (schema.length > 1) {
            val from = schema(1 + rnd.nextInt(schema.length - 1))
            val to = ColPool(rnd.nextInt(ColPool.length)) + "_r" + rnd.nextInt(3)
            if (schema.exists(_.equalsIgnoreCase(to))) {
              intercept[Exception] { SnapshotTable.renameColumn(spark, dir, from, to) }
            } else {
              SnapshotTable.renameColumn(spark, dir, from, to)
              mapping = (mapping - from + (to -> phys(from)))
                .filterNot { case (l, p) => l == p }
              schema = schema.map(c => if (c == from) to else c)
              rows = rows.map { case (id, r) =>
                id -> (r - from + (to -> r(from))) }
            }
          }
        case _ => ()
      }
      check(step)
    }

    // the engine's recorded mapping must agree with the model's
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.columnMapping.getOrElse(Map.empty) == mapping,
      s"engine mapping ${m.columnMapping} != model $mapping")
    assert(m.droppedCols.getOrElse(Seq.empty).toSet == tombs,
      s"engine tombstones ${m.droppedCols} != model $tombs")
  }
}
