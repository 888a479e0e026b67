package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.SnapshotTable

/** Exactly-once streaming append into a [[SnapshotTable]]: `foreachBatch`
  * gives at-least-once micro-batch delivery; the sink turns it into
  * exactly-once by committing each batch through
  * [[SnapshotTable.appendExactlyOnce]], whose manifest-recorded
  * (appId → batchId) marker makes a re-delivered batch a structural no-op —
  * the same idempotent-commit protocol the table's MERGE sink gets from key
  * semantics, here for pure appends where no key exists to dedup on.
  *
  * Readers see each micro-batch atomically (it is one manifest commit), and
  * a crash between the data write and the commit leaves only unreferenced
  * files for [[SnapshotTable.vacuum]] — never a torn table.
  */
object SnapshotSink {

  /** @param appId stable identity of this pipeline (e.g. derived from the
    *              checkpoint path); batch ids are scoped to it
    */
  def runAppend(
      source: DataFrame,
      tableDir: String,
      checkpoint: String,
      appId: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          SnapshotTable.appendExactlyOnce(batch.sparkSession, batch, tableDir, appId, batchId)
        ()
      }
      .start()
}
