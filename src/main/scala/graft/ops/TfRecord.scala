package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TFRecord shard export — the last meter of a training-data pipeline: the
  * placed corpus ([[Shards.deterministicShards]]) written as the
  * length-prefixed record files trainers actually consume. Format per
  * record (public TFRecord spec): `uint64 LE length`, masked CRC32C of the
  * length bytes, payload, masked CRC32C of the payload, with
  * `mask(c) = ((c >>> 15) | (c << 17)) + 0xa282ead8`. The JDK ships CRC32C
  * (java.util.zip.CRC32C), so the framing is dependency-free.
  *
  * Scale shape: `repartition(shard)` hash-routes every row of a shard to
  * ONE task (whole shards per partition by construction), rows stream to
  * the file in pos order — no shard is ever materialized in memory. Output
  * commit: each task writes to an attempt-unique temp path under `_tmp/`
  * and RENAMES into place only when the shard is complete, so a zombie or
  * speculative attempt racing its retry can never interleave bytes into
  * the destination, and a mid-job failure leaves only `_tmp/` debris —
  * never a truncated file that looks complete. Placement, order, and
  * framing are deterministic, so racing attempts produce byte-identical
  * files and either rename winner is correct.
  */
object TfRecord {

  private val MaskDelta = 0xa282ead8L

  private[graft] def maskedCrc(bytes: Array[Byte]): Int = {
    val crc = new java.util.zip.CRC32C()
    crc.update(bytes)
    val rotated = ((crc.getValue >>> 15) | (crc.getValue << 17)) & 0xFFFFFFFFL
    ((rotated + MaskDelta) & 0xFFFFFFFFL).toInt
  }

  /** One framed record: length, masked len-CRC, payload, masked data-CRC. */
  private[graft] def frame(payload: Array[Byte]): Array[Byte] = {
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(payload.length.toLong).array()
    val bb = ByteBuffer.allocate(8 + 4 + payload.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(lenBytes)
    bb.putInt(maskedCrc(lenBytes))
    bb.put(payload)
    bb.putInt(maskedCrc(payload))
    bb.array()
  }

  /** Write (shard, pos, payload) rows as `shard-%05d.tfrecord` files under
    * `outDir`. Positions must be dense from 0 within each shard (exactly
    * what [[Shards.deterministicShards]] emits) — a gap means rows were
    * lost upstream and the export refuses rather than silently misalign a
    * training order. Returns the number of shards written.
    */
  def writeShards(
      placed: DataFrame, // (shard, pos, payload binary)
      outDir: String,
      payloadCol: String = "payload",
      shardCol: String = "shard",
      posCol: String = "pos"): Int = {
    val spark = placed.sparkSession
    import spark.implicits._
    // persisted: the write pass AND the completeness gate below both read
    // this frame — unpersisted, the gate's distinct-shards job would
    // re-execute the entire upstream placement pipeline (at corpus scale,
    // roughly doubling export cost; with a nondeterministic upstream it
    // would also gate a DIFFERENT shard set than was written)
    val rows = placed
      .select(col(shardCol).cast("int").as("shard"),
        col(posCol).cast("long").as("pos"),
        col(payloadCol).cast("binary").as("payload"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .as[(Int, Long, Array[Byte])]
      .persist()
    try {
    rows.foreachPartition { it: Iterator[(Int, Long, Array[Byte])] =>
      // executor-side Hadoop conf from the classpath: file:// locally,
      // cluster defaults from core-site on a real deployment
      val fsConf = new org.apache.hadoop.conf.Configuration()
      val attemptId = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      var cur: Option[(Int, org.apache.hadoop.fs.Path, java.io.OutputStream)] = None
      var expectedPos = 0L
      // complete shard → close the temp file and rename it into place; the
      // rename is the single visibility point, so readers (and a racing
      // attempt's winner) only ever see whole shards
      def commitShard(shard: Int, tmp: org.apache.hadoop.fs.Path,
          out: java.io.OutputStream): Unit = {
        out.close()
        val dest = new org.apache.hadoop.fs.Path(outDir, f"shard-$shard%05d.tfrecord")
        // overwrite semantics (a re-export after a data fix must replace
        // stale shards); within one job racing twins write identical bytes
        // so either winner is correct. The replace must be ATOMIC: a
        // delete→rename pair leaves a window where the destination is
        // absent, and a zombie/speculative attempt killed (or racing)
        // between the two steps can remove a twin's already-committed file
        // AFTER the driver's completeness gate passed. FileContext.rename
        // with Options.Rename.OVERWRITE is the Hadoop API that swaps in
        // one filesystem operation (POSIX rename locally, the NN op on
        // HDFS) — no observable absent state.
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(dest.toUri, fsConf)
          fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        } catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            // object stores without an AbstractFileSystem binding fall back
            // to the non-atomic pair; the driver-side completeness gate
            // below writeShards still catches a lost shard loudly
            val fs = tmp.getFileSystem(fsConf)
            if (fs.exists(dest)) fs.delete(dest, false)
            if (!fs.rename(tmp, dest)) {
              require(fs.exists(dest), s"tfrecord export: rename $tmp -> $dest failed")
              fs.delete(tmp, false) // lost a same-job rename race: twin bytes are ours
            }
        }
        // A vanished tmp (FileNotFoundException) propagates and fails THIS
        // attempt: attempt-unique names mean no twin can have renamed it,
        // so losing it is a real fault — and if a committed twin already
        // produced the destination, the retry (or the zombie's demise)
        // resolves through the completeness gate, never silently.
      }
      it.foreach { case (shard, pos, payload) =>
        if (!cur.exists(_._1 == shard)) {
          cur.foreach { case (s, t, o) => commitShard(s, t, o) }
          val tmp = new org.apache.hadoop.fs.Path(outDir,
            f"_tmp/shard-$shard%05d.tfrecord.attempt-$attemptId")
          cur = Some((shard, tmp, tmp.getFileSystem(fsConf).create(tmp, true)))
          expectedPos = 0L
        }
        require(pos == expectedPos,
          s"shard $shard: positions not dense at $pos (expected $expectedPos) — rows lost upstream")
        expectedPos += 1
        cur.get._3.write(frame(payload))
      }
      cur.foreach { case (s, t, o) => commitShard(s, t, o) }
    }
    // all tasks committed: clear attempt debris (failed/zombie temp files)
    val tmpDir = new org.apache.hadoop.fs.Path(outDir, "_tmp")
    val fs = tmpDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tmpDir)) fs.delete(tmpDir, true)
    // completeness gate: the primary commit path is an atomic OVERWRITE
    // rename (no absent-destination window), but the object-store fallback
    // in commitShard is still a delete→rename pair — keep the gate as the
    // belt-and-braces check so an export with a missing shard can never be
    // reported successful on any filesystem
    val shards = rows.select(col("shard")).distinct()
      .collect().map(_.getInt(0)).sorted
    val missing = shards.filterNot(sh =>
      fs.exists(new org.apache.hadoop.fs.Path(outDir, f"shard-$sh%05d.tfrecord")))
    require(missing.isEmpty,
      s"tfrecord export: ${missing.length} shard file(s) missing after commit " +
        s"(e.g. shard ${missing.take(3).mkString(", ")}); re-run the export")
    shards.length
    } finally rows.unpersist(blocking = false)
  }

  /** Driver-side reader for verification: parse one .tfrecord file,
    * CHECKING both CRCs per record. The spec's roundtrip oracle.
    */
  private[graft] def readFile(path: java.nio.file.Path): Seq[Array[Byte]] = {
    val bytes = java.nio.file.Files.readAllBytes(path)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (bb.remaining() > 0) {
      val lenBytes = new Array[Byte](8)
      bb.get(lenBytes)
      val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getLong.toInt
      require(bb.getInt == maskedCrc(lenBytes), s"$path: length CRC mismatch at record ${out.size}")
      val payload = new Array[Byte](len)
      bb.get(payload)
      require(bb.getInt == maskedCrc(payload), s"$path: data CRC mismatch at record ${out.size}")
      out += payload
    }
    out.toSeq
  }
}
