package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._
import graft.ingest.Scd2

/** Seeded fuzz for the SCD2 operator: random multi-round batch sequences
  * (random key subsets, random values including NULL, strictly increasing
  * effective dates) applied through `applyScd2`, compared against a
  * brute-force per-key history replay in plain Scala. 3 seeds × 40 keys ×
  * 4 rounds ≈ 480 randomized key-histories, covering no-op re-sends,
  * NULL↔value transitions, NULL↔NULL no-ops, and fresh keys appearing in
  * any round.
  */
class Scd2FuzzSpec extends SparkSpec {
  import spark.implicits._

  private case class Ver(v: Option[String], var from: String, var to: Option[String])

  test("fuzz: random batch sequences equal a per-key brute-force history replay") {
    val values = Vector(Some("A"), Some("B"), Some("C"), None)
    val rounds = Seq("2020-02-01", "2020-03-01", "2020-04-01", "2020-05-01")
    for (seed <- Seq(3L, 17L, 29L)) {
      val rnd = new Random(seed)
      val keys = 0 until 40

      // ---- initial target: a random subset of keys, open since 2020-01-01
      val model = mutable.Map.empty[Int, mutable.ListBuffer[Ver]]
      val initRows = keys.filter(_ => rnd.nextBoolean()).map { k =>
        val v = values(rnd.nextInt(values.length))
        model(k) = mutable.ListBuffer(Ver(v, "2020-01-01", None))
        (k, v)
      }
      var target = initRows.toDF("k", "v")
        .select(col("k"), col("v"),
          to_date(lit("2020-01-01")).as("valid_from"),
          lit(null).cast("date").as("valid_to"))

      // ---- rounds: random batches through the operator AND the model
      for (d <- rounds) {
        val batch = keys.filter(_ => rnd.nextDouble() < 0.5)
          .map(k => (k, values(rnd.nextInt(values.length))))
        target = Scd2.applyScd2(target, batch.toDF("k", "v"),
          Seq("k"), Seq("v"), to_date(lit(d)))
          .localCheckpoint() // keep the iterated plan bounded
        batch.foreach { case (k, v) =>
          val hist = model.getOrElseUpdate(k, mutable.ListBuffer.empty)
          hist.find(_.to.isEmpty) match {
            case Some(open) if open.v == v => () // identical (incl. NULL==NULL): no-op
            case Some(open) =>
              open.to = Some(d)
              hist += Ver(v, d, None)
            case None => hist += Ver(v, d, None)
          }
        }
      }

      val got = target.collect().map { r =>
        (r.getInt(0), Option(r.getString(1)),
          r.getDate(2).toString, Option(r.getDate(3)).map(_.toString))
      }.toSet
      val want = model.toSeq.flatMap { case (k, hist) =>
        hist.map(h => (k, h.v, h.from, h.to))
      }.toSet
      assert(got == want,
        s"seed=$seed diverged: extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
      // structural invariant independent of the model: ≤ one open row per key
      val opens = got.toSeq.filter(_._4.isEmpty).groupBy(_._1).values.map(_.size)
      assert(opens.forall(_ == 1), s"seed=$seed: a key has multiple open versions")
    }
  }
}
