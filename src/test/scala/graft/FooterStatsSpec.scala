package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{FileStats, FooterStats, SnapshotTable}

/** The footer-based stats collector against the scan-based reference
  * ([[FileStats.aggsFor]], the path snapshot commits used to run as a
  * second Spark job): identical row counts, null counts, and bounds (num
  * bounds compared as parsed doubles — representation may differ, ordering
  * must not) across every eligible type, including edge shapes (all-NULL
  * columns, bound-truncating long strings, negative decimals, timestamps).
  */
class FooterStatsSpec extends SparkSpec {
  import spark.implicits._

  test("footer stats match the scan-based reference collector on every eligible type") {
    val df = spark.range(0, 1000).select(
      col("id"),
      when(col("id") % 7 === 0, lit(null).cast("int"))
        .otherwise((col("id") % 100 - 50).cast("int")).as("i"),
      (col("id").cast("float") / 3.0f).as("f"),
      (col("id").cast("double") * -1.5).as("d"),
      (col("id").cast("decimal(12,2)") * -0.25).cast("decimal(12,2)").as("dec"),
      (col("id") % 2 === 0).as("b"),
      concat(lit("doc-"), lpad(col("id").cast("string"), 4, "0")).as("s"),
      concat(lit("long-"), col("id").cast("string"),
        lit("x" * 100)).as("slong"),
      date_add(to_date(lit("2024-01-01")), (col("id") % 90).cast("int")).as("dt"),
      to_timestamp(lit("2024-03-01 12:00:00")).plus(
        expr("make_interval(0, 0, 0, 0, 0, 0, id)")).as("ts"),
      lit(null).cast("long").as("alln"))
    val out = Files.createTempDirectory("graft-footer").toString + "/data"
    df.repartition(3).write.parquet(out)

    val statFields = df.schema.fields.filter(f => FileStats.eligible(f.dataType)).toSeq
    assert(statFields.map(_.name).toSet ==
      Set("id", "i", "f", "d", "dec", "b", "s", "slong", "dt", "ts", "alln"))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    assert(files.length == 3)

    files.foreach { st =>
      val (rows, got) = FooterStats.collect(conf, st.getPath, statFields)
      // reference: the old per-file Spark aggregation over the same file
      val one = spark.read.schema(df.schema).parquet(st.getPath.toString)
      val aggs = count(lit(1)).as("__rows") +: statFields.flatMap(FileStats.aggsFor)
      val r = one.agg(aggs.head, aggs.tail: _*).collect().head
      assert(rows == r.getAs[Long]("__rows"), s"row count for ${st.getPath}")
      statFields.foreach { fld =>
        val kind = FileStats.kindOf(fld.dataType)
        val lo = Option(r.getAs[String](s"__lo_${fld.name}")).map(FileStats.truncLo)
        val hi = Option(r.getAs[String](s"__hi_${fld.name}")).map(FileStats.truncHi)
        val nulls = r.getAs[Long](s"__nulls_${fld.name}")
        val g = got.get(fld.name)
        assert(g.isDefined, s"footer stats missing for ${fld.name}")
        assert(g.get.kind == kind, s"kind for ${fld.name}")
        assert(g.get.nulls == nulls, s"nulls for ${fld.name}")
        def same(a: Option[String], b: Option[String]): Boolean = (a, b) match {
          case (None, None) => true
          case (Some(x), Some(y)) =>
            if (kind == "num") x.toDouble == y.toDouble else x == y
          case _ => false
        }
        assert(same(g.get.lo, lo), s"lo for ${fld.name}: footer=${g.get.lo} scan=$lo")
        assert(same(g.get.hi, hi), s"hi for ${fld.name}: footer=${g.get.hi} scan=$hi")
      }
    }
  }

  test("snapshot commits prune on footer-derived bounds, timestamps included") {
    val dir = Files.createTempDirectory("graft-footer-tbl").toString
    (0 until 3).foreach { k =>
      val part = spark.range(k * 100, k * 100 + 100).select(
        col("id"),
        to_timestamp(lit("2024-01-01 00:00:00")).plus(
          expr(s"make_interval(0, 0, 0, ${k * 31}, 0, 0, id - ${k * 100})")).as("ts"),
        (col("id").cast("decimal(10,2)") / 4).cast("decimal(10,2)").as("amt"))
        .repartition(1)
      if (k == 0) SnapshotTable.write(spark, part, dir)
      else SnapshotTable.append(spark, part, dir)
    }
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.length == 3)
    assert(m.entries.forall(_.stats.exists(_.contains("ts"))),
      "timestamp stats must come out of the footers (INT64 micros)")
    // each commit's ts range is a disjoint month: one file per month filter
    assert(SnapshotTable.pruneEntries(spark, m,
      col("ts") >= "2024-02-01" && col("ts") < "2024-02-05").length == 1)
    assert(SnapshotTable.pruneEntries(spark, m, col("id") === 150L).length == 1)
    assert(SnapshotTable.pruneEntries(spark, m, col("amt") > 60.0).length == 1)
    val got = SnapshotTable.readWhere(spark, dir,
      col("ts") >= "2024-02-01" && col("ts") < "2024-03-01")
    val want = SnapshotTable.read(spark, dir)
      .filter(col("ts") >= "2024-02-01" && col("ts") < "2024-03-01")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
