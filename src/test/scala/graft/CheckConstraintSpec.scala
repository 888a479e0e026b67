package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.{SnapshotCatalog, SnapshotTable}

/** CHECK constraints on the snapshot table: recorded in the manifest,
  * validated against EXISTING data on add, carried across commits like
  * txn markers, and enforced by name at every write surface — Scala
  * writers, SQL INSERT / UPDATE / MERGE, the streaming sink, and RTAS.
  * NULL predicates pass (SQL CHECK semantics); violations report every
  * failing constraint with its row count.
  */
class CheckConstraintSpec extends SparkSpec {

  private lazy val root: String = Files.createTempDirectory("graft-ck").toString

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.snap", classOf[SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snap.root", root)
  }

  private def mk(dir: String, n: Long = 100): Unit =
    SnapshotTable.write(spark, spark.range(0, n)
      .select(col("id"), (col("id") % 5).as("grp"),
        when(col("id") % 10 === 9, lit(null)).otherwise(col("id") * 2).as("v")), dir)

  test("add validates existing data; writers refuse violating batches by name; NULL passes") {
    val dir = s"$root/ck/t"
    mk(dir)
    // existing data violates -> the ALTER refuses, nothing is recorded
    val bad = intercept[IllegalArgumentException](
      SnapshotTable.addCheckConstraint(spark, dir, "v_small", "v < 100"))
    assert(bad.getMessage.contains("v_small") && bad.getMessage.contains("row(s)"),
      bad.getMessage)
    assert(SnapshotTable.checkConstraints(spark, dir).isEmpty)

    // a satisfied predicate lands (NULL v rows pass — SQL CHECK semantics)
    SnapshotTable.addCheckConstraint(spark, dir, "v_nonneg", "v >= 0")
    SnapshotTable.addCheckConstraint(spark, dir, "id_known", "id < 1000000")
    assert(SnapshotTable.checkConstraints(spark, dir).keySet == Set("v_nonneg", "id_known"))

    // appends: valid batch lands, violating batch refused naming the rule
    SnapshotTable.append(spark, spark.range(100, 110)
      .select(col("id"), (col("id") % 5).as("grp"), (col("id") * 2).as("v")), dir)
    val e = intercept[IllegalArgumentException](SnapshotTable.append(spark,
      spark.range(110, 120).select(col("id"), (col("id") % 5).as("grp"),
        (lit(-1L)).as("v")), dir))
    assert(e.getMessage.contains("v_nonneg") && e.getMessage.contains("10 row(s)"),
      e.getMessage)
    // NULLs pass
    SnapshotTable.append(spark, spark.range(120, 125)
      .select(col("id"), (col("id") % 5).as("grp"), lit(null).cast("long").as("v")), dir)
    assert(SnapshotTable.read(spark, dir).count() == 115)

    // updates (COW and MoR) that would break the rule are refused
    val eu = intercept[IllegalArgumentException](
      SnapshotTable.update(spark, dir, col("grp") === 1L, Map("v" -> lit(-5L))))
    assert(eu.getMessage.contains("v_nonneg"), eu.getMessage)
    val em = intercept[IllegalArgumentException](
      SnapshotTable.updateMoR(spark, dir, col("grp") === 1L, Map("v" -> lit(-5L))))
    assert(em.getMessage.contains("v_nonneg"), em.getMessage)
    // a legal update passes both tiers
    assert(SnapshotTable.updateMoR(spark, dir, col("grp") === 1L,
      Map("v" -> (col("id") * 3))) > 0)

    // constraints carry across compaction and survive in dropped form only
    SnapshotTable.compact(spark, dir)
    assert(SnapshotTable.checkConstraints(spark, dir).keySet == Set("v_nonneg", "id_known"))
    SnapshotTable.dropCheckConstraint(spark, dir, "id_known")
    assert(SnapshotTable.checkConstraints(spark, dir).keySet == Set("v_nonneg"))
    val ed = intercept[IllegalArgumentException](
      SnapshotTable.dropCheckConstraint(spark, dir, "nope"))
    assert(ed.getMessage.contains("no CHECK constraint"), ed.getMessage)

    // unresolvable predicates refuse before any commit
    val er = intercept[Exception](
      SnapshotTable.addCheckConstraint(spark, dir, "broken", "no_such_col > 0"))
    assert(SnapshotTable.checkConstraints(spark, dir).keySet == Set("v_nonneg"))
  }

  test("SQL surface: ALTER TABLE ADD/DROP CONSTRAINT, INSERT/UPDATE/MERGE enforcement") {
    ensureCatalog()
    val dir = s"$root/sqlck/t"
    mk(dir)
    spark.sql("ALTER TABLE snap.sqlck.t ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    assert(SnapshotTable.checkConstraints(spark, dir) == Map("v_nonneg" -> "v >= 0"))

    spark.sql("INSERT INTO snap.sqlck.t VALUES (200, 0, 7)")
    val ei = intercept[Exception](
      spark.sql("INSERT INTO snap.sqlck.t VALUES (201, 0, -7)"))
    assert(ei.getMessage.contains("v_nonneg") ||
      ei.getMessage.toLowerCase.contains("check"), ei.getMessage)
    assert(spark.sql("SELECT count(*) AS n FROM snap.sqlck.t WHERE id = 201")
      .head().getLong(0) == 0, "a refused INSERT must not land")

    val eu = intercept[Exception](
      spark.sql("UPDATE snap.sqlck.t SET v = -1 WHERE grp = 2"))
    assert(eu.getMessage.contains("v_nonneg") ||
      eu.getMessage.toLowerCase.contains("check"), eu.getMessage)
    assert(spark.sql("SELECT count(*) AS n FROM snap.sqlck.t WHERE v < 0")
      .head().getLong(0) == 0, "a refused UPDATE must not land")
    spark.sql("UPDATE snap.sqlck.t SET v = 1 WHERE grp = 2") // legal one lands

    val emg = intercept[Exception](spark.sql(
      """MERGE INTO snap.sqlck.t t USING (SELECT 300 AS id, 0 AS grp, -9 AS v) s
        |ON t.id = s.id WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(emg.getMessage.contains("v_nonneg") ||
      emg.getMessage.toLowerCase.contains("check"), emg.getMessage)

    // adding a constraint the current data violates is refused in SQL too
    val ea = intercept[Exception](
      spark.sql("ALTER TABLE snap.sqlck.t ADD CONSTRAINT impossible CHECK (v > 100000)"))
    assert(ea.getMessage.contains("impossible") ||
      ea.getMessage.toLowerCase.contains("violation"), ea.getMessage)

    spark.sql("ALTER TABLE snap.sqlck.t DROP CONSTRAINT v_nonneg")
    assert(SnapshotTable.checkConstraints(spark, dir).isEmpty)
    spark.sql("INSERT INTO snap.sqlck.t VALUES (202, 0, -7)") // now legal
    assert(spark.sql("SELECT count(*) AS n FROM snap.sqlck.t WHERE v < 0")
      .head().getLong(0) == 1)
  }

  test("streaming epochs and RTAS respect constraints; refusals leave no trace") {
    ensureCatalog()
    val dir = s"$root/rtas/t"
    mk(dir)
    SnapshotTable.addCheckConstraint(spark, dir, "v_nonneg", "v >= 0")
    val vBefore = SnapshotTable.versions(spark, dir).last

    // RTAS result violating the carried constraint aborts to the old state
    val er = intercept[Exception](spark.sql(
      "REPLACE TABLE snap.rtas.t AS SELECT id, id % 5 AS grp, -id AS v FROM range(1, 10)"))
    assert(er.getMessage.contains("v_nonneg") ||
      er.getMessage.toLowerCase.contains("check"), er.getMessage)
    assert(SnapshotTable.versions(spark, dir).last == vBefore,
      "a refused RTAS must publish nothing")
    assert(SnapshotTable.read(spark, dir).count() == 100)
    // a satisfying RTAS lands and KEEPS the constraint
    spark.sql("REPLACE TABLE snap.rtas.t AS SELECT id, id % 5 AS grp, id AS v FROM range(0, 50)")
    assert(SnapshotTable.read(spark, dir).count() == 50)
    assert(SnapshotTable.checkConstraints(spark, dir).keySet == Set("v_nonneg"))
  }
}
