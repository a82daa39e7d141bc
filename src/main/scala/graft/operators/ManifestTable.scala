package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pointer table commits — the object-store-safe successor to
  * the rename-aside directory swap (`StreamingPipeline.upsertSink`'s
  * documented local-FS limitation, round-12 verdict item).
  *
  * Layout under `tablePath/`:
  *  - immutable snapshot directories `snap-<batchId>-<nonce>/` holding
  *    one parquet table each — written ONCE, never renamed or mutated;
  *  - a single small `MANIFEST` file whose entire content is the name
  *    of the current snapshot directory.
  *
  * Why this survives S3 semantics where the directory swap does not:
  * object stores have no atomic directory rename — a "rename" is a
  * copy-then-delete over every key, and a reader mid-swap sees a
  * half-table. Here nothing is ever renamed except the one-key pointer:
  * snapshot data is written to a FRESH prefix (unique nonce, so a
  * retried batch can never collide with a crashed attempt's
  * half-written files), and the commit point is a single small-object
  * write of `MANIFEST` — atomic last-writer-wins on every major object
  * store, and replayed on local filesystems as write-temp + atomic
  * file rename. This is the core of the Iceberg/Delta commit protocol,
  * reduced to a single-writer pointer (a streaming sink has exactly one
  * committer — the micro-batch loop — so no compare-and-swap is
  * needed; multi-writer tables need a conditional-put/lock on top).
  *
  * Crash windows (documented contract, spec-asserted where observable):
  *  - crash while writing a snapshot dir → orphan prefix, MANIFEST
  *    still points at the old snapshot: readers unaffected, the orphan
  *    is garbage-collected by a later commit;
  *  - crash AFTER the pointer write → the new table is live and fully
  *    committed; superseded snapshots are garbage for later GC;
  *  - there is NO window in which readers see a missing or partial
  *    table: they always resolve the pointer first, and every pointed-to
  *    snapshot is complete by construction (the pointer is written only
  *    after the snapshot write returns).
  *
  * GC keeps the current and immediately-previous snapshots (in-flight
  * readers that resolved the pointer just before a commit may still be
  * scanning the previous one) and deletes anything older plus orphans
  * from crashed attempts.
  */
object ManifestTable {

  val ManifestName = "MANIFEST"

  private def manifestPath(tablePath: String) =
    new java.io.File(tablePath, ManifestName)

  /** The current snapshot directory name, or None for an empty table. */
  def currentSnapshot(tablePath: String): Option[String] = {
    val mf = manifestPath(tablePath)
    if (!mf.exists()) None
    else {
      val s = new String(
        java.nio.file.Files.readAllBytes(mf.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
      if (s.isEmpty) None else Some(s)
    }
  }

  /** Read the committed table (None when nothing was ever committed). */
  def read(spark: SparkSession, tablePath: String): Option[DataFrame] =
    currentSnapshot(tablePath).map { snap =>
      spark.read.parquet(new java.io.File(tablePath, snap).getPath)
    }

  /** Commit `df` as the table's next snapshot: write the fresh
    * snapshot prefix, atomically swing the pointer, GC superseded
    * snapshots. Returns the committed snapshot name.
    */
  def commit(df: DataFrame, tablePath: String, batchId: Long): String = {
    val prev = currentSnapshot(tablePath)
    // Unique prefix per ATTEMPT: a crashed attempt's half-written files
    // can never be read (nothing points at them) or collided with.
    val snap = f"snap-$batchId%09d-${java.util.UUID.randomUUID().toString.take(8)}"
    val snapDir = new java.io.File(tablePath, snap)
    df.write.mode("error").parquet(snapDir.getPath)
    // Commit point: one small-object write. Local-FS replay of the
    // atomic single-key PUT: write a temp file, then an atomic
    // same-directory file rename.
    val mf = manifestPath(tablePath)
    val tmp = new java.io.File(tablePath, ManifestName + ".tmp")
    java.nio.file.Files.write(tmp.toPath,
      snap.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, mf.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    gc(tablePath, keep = Set(snap) ++ prev)
    snap
  }

  /** Delete snapshot prefixes outside `keep` — superseded snapshots and
    * orphans from crashed attempts. Safe at any time: everything not in
    * `keep` is unreachable (the pointer never moves backwards).
    */
  private[graft] def gc(tablePath: String, keep: Set[String]): Unit = {
    val dir = new java.io.File(tablePath)
    val snaps = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("snap-"))
    snaps.filterNot(f => keep.contains(f.getName)).foreach(rmTree)
  }

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(): Unit
  }
}
