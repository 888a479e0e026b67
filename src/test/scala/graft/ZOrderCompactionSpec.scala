package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.{SnapshotCatalog, SnapshotTable}

/** Z-ORDERED COMPACTION (`compact(zorderBy = …)` / `CALL
  * snap.system.compact(zorder_by => 'a,b')` — Delta's OPTIMIZE ZORDER):
  * the rewrite clusters rows so every written file covers a small
  * hyper-rectangle of the key domain, and manifest pruning then skips
  * files for predicates on ANY clustered column. On a partitioned table
  * the ordering applies WITHIN the partition routing — the routed layout
  * survives, the footer stats tighten.
  */
class ZOrderCompactionSpec extends SparkSpec {

  private lazy val root: String = Files.createTempDirectory("graft-zc").toString

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snap.root", root)
  }

  /** Files surviving manifest pruning for a one-column point predicate. */
  private def survivors(dir: String, pred: org.apache.spark.sql.Column): Int =
    SnapshotTable.pruneEntries(spark, SnapshotTable.currentManifest(spark, dir).get, pred).size

  test("unpartitioned: z-ordered rewrite makes point predicates on BOTH columns prune files") {
    ensureCatalog()
    val dir = s"$root/flat/t"
    // interleave (a, b) so an unclustered layout has every file spanning
    // the whole domain of both columns
    val df = spark.range(0, 40000).select(
      (col("id") % 197).as("a"), ((col("id") * 7919) % 193).as("b"), col("id").as("v"))
    SnapshotTable.write(spark, df.repartition(8), dir)
    val m0 = SnapshotTable.currentManifest(spark, dir).get
    assert(m0.entries.size == 8)
    val beforeA = survivors(dir, col("a") === 5)
    val beforeB = survivors(dir, col("b") === 5)
    assert(beforeA == 8 && beforeB == 8, "interleaved files must span both domains")

    // ~8 output files again, but Morton-clustered
    val bytes = m0.entries.map(_.bytes).sum
    SnapshotTable.compact(spark, dir, targetBytes = math.max(1L, bytes / 8),
      zorderBy = Seq("a", "b"))
    val m1 = SnapshotTable.currentManifest(spark, dir).get
    assert(m1.entries.size >= 4, s"expected a multi-file rewrite, got ${m1.entries.size}")
    val afterA = survivors(dir, col("a") === 5)
    val afterB = survivors(dir, col("b") === 5)
    assert(afterA < m1.entries.size && afterB < m1.entries.size,
      s"z-order must confine point lookups on both columns: a $afterA, b $afterB " +
        s"of ${m1.entries.size}")

    // purely a reordering: the row multiset is untouched
    assert(SnapshotTable.read(spark, dir).agg(sum("v")).head.getLong(0) ==
      df.agg(sum("v")).head.getLong(0))
    assert(SnapshotTable.read(spark, dir).count() == 40000)
  }

  test("partitioned: zorder_by composes with routing — layout survives, per-file spans tighten") {
    ensureCatalog()
    val dir = s"$root/part/t"
    val df = spark.range(0, 30000).select(
      (col("id") % 3).as("g"), ((col("id") * 6151) % 1000).as("k"), col("id").as("v"))
    SnapshotTable.write(spark, df.repartition(6), dir, partitionCols = Some(Seq("g")))
    val bytes = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.bytes).sum

    // small target → several files per partition value, k-sorted within
    spark.sql(s"CALL snap.system.compact(table => '$dir', " +
      s"target_file_bytes => ${math.max(1L, bytes / 12)}, zorder_by => 'k')")
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.forall(_.path.contains("__p_g=")), "partition routing must survive")

    // within each partition directory the k-ranges of sibling files must
    // be (near-)disjoint: total span covered ≈ sum of per-file spans
    val byPart = m.entries.groupBy(e => e.path.substring(0, e.path.indexOf("/part-")))
    val multi = byPart.filter(_._2.size >= 2)
    assert(multi.nonEmpty, s"expected multi-file partitions, got ${byPart.view.mapValues(_.size).toMap}")
    multi.foreach { case (p, es) =>
      val spans = es.map { e =>
        val s = e.stats.get("k"); (s.lo.get.toDouble, s.hi.get.toDouble)
      }
      val sumSpan = spans.map { case (lo, hi) => hi - lo }.sum
      val totalSpan = spans.map(_._2).max - spans.map(_._1).min
      assert(sumSpan <= totalSpan * 1.25,
        s"$p: sibling k-ranges overlap too much (sum $sumSpan vs total $totalSpan) — not sorted")
    }

    // correctness: parity with the plain aggregate
    assert(SnapshotTable.read(spark, dir).agg(sum("v")).head.getLong(0) ==
      df.agg(sum("v")).head.getLong(0))
  }

  test("string + date keys cluster through monotone surrogates; wide domains range-normalize") {
    ensureCatalog()
    val dir = s"$root/sd/t"
    // string country codes × dates over two years, interleaved so an
    // unclustered layout spans both domains per file; the v column rides
    // a WIDE long domain (billions) that would alias under a naive
    // low-bit mask
    val codes = Seq("AR", "BR", "CA", "DE", "ES", "FR", "GB", "IN", "JP", "US")
    val df = spark.range(0, 40000).select(
      element_at(typedLit(codes), (col("id") % 10 + 1).cast("int")).as("cc"),
      date_add(to_date(lit("2023-01-01")), (col("id") % 730).cast("int")).as("d"),
      (col("id") * 1000003L).as("v"))
    SnapshotTable.write(spark, df.repartition(8), dir)
    assert(survivors(dir, col("cc") === "DE") == 8 &&
      survivors(dir, col("d") === java.sql.Date.valueOf("2023-06-15")) == 8,
      "interleaved files must span both domains before the rewrite")

    val bytes = SnapshotTable.currentManifest(spark, dir).get.entries.map(_.bytes).sum
    SnapshotTable.compact(spark, dir, targetBytes = math.max(1L, bytes / 8),
      zorderBy = Seq("cc", "d"))
    val m = SnapshotTable.currentManifest(spark, dir).get
    assert(m.entries.size >= 4, s"expected a multi-file rewrite, got ${m.entries.size}")
    val afterCc = survivors(dir, col("cc") === "DE")
    val afterD = survivors(dir, col("d") === java.sql.Date.valueOf("2023-06-15"))
    assert(afterCc < m.entries.size && afterD < m.entries.size,
      s"string/date z-order must confine point lookups: cc $afterCc, d $afterD " +
        s"of ${m.entries.size}")
    assert(SnapshotTable.read(spark, dir).agg(sum("v")).head.getLong(0) ==
      df.agg(sum("v")).head.getLong(0), "the rewrite must be a pure reordering")

    // wide-domain normalization: clustering on (v, d) where v spans
    // ~4×10^10 — without the range shift every v-bit above the budget
    // would mask away and v-predicates would prune nothing
    val wdir = s"$root/sd/w"
    SnapshotTable.write(spark, df.repartition(8), wdir)
    val wb = SnapshotTable.currentManifest(spark, wdir).get.entries.map(_.bytes).sum
    SnapshotTable.compact(spark, wdir, targetBytes = math.max(1L, wb / 8),
      zorderBy = Seq("v", "d"))
    val wm = SnapshotTable.currentManifest(spark, wdir).get
    val afterV = survivors(wdir, col("v").between(0L, 40000L * 1000003L / 50))
    assert(afterV < wm.entries.size,
      s"wide-domain key must still prune after normalization: $afterV of ${wm.entries.size}")
  }

  test("multi-column z-order refuses continuous key types by name") {
    ensureCatalog()
    val dir = s"$root/cont/t"
    SnapshotTable.write(spark, spark.range(0, 100).select(
      col("id").as("a"), (col("id") * 0.5).as("price")), dir)
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.compact(spark, dir, zorderBy = Seq("a", "price"))
    }
    assert(e.getMessage.contains("price") && e.getMessage.contains("double"), e.getMessage)
  }

  test("refusals: unknown zorder column; zorderBy with a custom layout") {
    ensureCatalog()
    val dir = s"$root/bad/t"
    SnapshotTable.write(spark, spark.range(0, 100).select(col("id").as("a")), dir)
    val e = intercept[Exception] {
      spark.sql(s"CALL snap.system.compact(table => '$dir', zorder_by => 'nope')")
    }
    assert(e.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.compact(spark, dir, layout = Some(identity), zorderBy = Seq("a"))
    }
    assert(e2.getMessage.contains("mutually exclusive"))
  }
}
