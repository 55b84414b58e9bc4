package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}

/** Staged directory swap with checked renames: write to `tmp`, retire the
  * live dir to `old`, promote `tmp`, then drop `old`. `fs.rename` signals
  * failure by returning false (not throwing) — every step is checked, and a
  * failed promotion attempts rollback of the retired copy so the live path
  * is never silently left empty. A hard crash between the two renames can
  * still leave the data at `path + ".old"` — recoverable by hand, never
  * deleted before the promotion succeeds.
  *
  * Visibility: between retiring `live` and promoting `tmp` there is a
  * window with NO live dir, and a re-promotion deletes the retired copy a
  * concurrent cross-process reader may still be scanning — swap is atomic
  * per rename, not per transaction. In-process, callers serialize around
  * it ([[ArtifactStore]]'s lock); cross-process it guarantees only that
  * the FINAL state is a complete generation (never interleaved part
  * files), which is the scratch-tier contract.
  */
object StagedSwap {

  /** `keepOld = true` RETAINS the retired generation at `old` after a
    * successful promotion (rollback support, [[IndexMigration.rollback]]) —
    * same checked renames, no final delete.
    */
  def swap(fs: FileSystem, tmp: Path, live: Path, old: Path,
           keepOld: Boolean = false): Unit = {
    if (fs.exists(old) && !fs.delete(old, true))
      sys.error(s"StagedSwap: could not clear $old")
    val hadLive = fs.exists(live)
    if (hadLive && !fs.rename(live, old))
      sys.error(s"StagedSwap: could not retire $live to $old")
    if (!fs.rename(tmp, live)) {
      // promotion failed — try to restore the previous live copy
      if (hadLive) fs.rename(old, live)
      sys.error(s"StagedSwap: could not promote $tmp to $live")
    }
    if (!keepOld && fs.exists(old)) fs.delete(old, true) // best-effort cleanup
  }
}
