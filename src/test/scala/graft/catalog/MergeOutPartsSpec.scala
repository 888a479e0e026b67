package graft.catalog

/** Package-private seam of the keyed merges' output-file sizing
  * ([[SnapshotTable.mergeOutParts]]): the rewrite-set-derived row width,
  * and — for an EMPTY rewrite set (MoR appends, fully-pruned COW
  * rewrites) — the manifest-derived `avgRowHint`, without which wide rows
  * (e.g. embedding columns) fall to the 256-byte default and
  * under-partition into oversized files.
  */
class MergeOutPartsSpec extends graft.SparkSpec {

  test("empty rewrite set sizes from the avgRow hint, not the 256B default") {
    // 1M wide rows at 3 KB each = ~3 GB -> 23 target-sized files; the
    // 256-byte default would emit 2 oversized ones
    assert(SnapshotTable.mergeOutParts(Seq.empty, 1000000L) == 2)
    assert(SnapshotTable.mergeOutParts(Seq.empty, 1000000L,
      avgRowHint = Some(3000.0)) == 23)
    // a non-positive hint falls back to the default; tiny batches stay 1
    assert(SnapshotTable.mergeOutParts(Seq.empty, 100L, avgRowHint = Some(0.0)) == 1)
    assert(SnapshotTable.mergeOutParts(Seq.empty, 12500L, avgRowHint = Some(24.0)) == 1)
  }

  test("non-empty rewrite set derives width from the rewrite, ignoring the hint") {
    val e = SnapshotTable.FileEntry("f1", rows = 1000L, bytes = 128L * 1024 * 1024,
      minDt = None, maxDt = None)
    // rewrite bytes alone fill one target file; 1000 batch rows at the
    // observed ~128KB/row add ~125 MB -> 2 files, hint ignored
    assert(SnapshotTable.mergeOutParts(Seq(e), 1000L, avgRowHint = Some(1.0)) == 2)
  }
}
