package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}

/** Staged directory swap with checked renames: write to `tmp`, retire the
  * live dir to `old`, promote `tmp`, then drop `old`. `fs.rename` signals
  * failure by returning false (not throwing) — every step is checked, and a
  * failed promotion attempts rollback of the retired copy so the live path
  * is never silently left empty. A hard crash between the two renames can
  * still leave the data at `path + ".old"` — recoverable by hand, never
  * deleted before the promotion succeeds.
  */
object StagedSwap {

  def swap(fs: FileSystem, tmp: Path, live: Path, old: Path): Unit = {
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
    if (fs.exists(old)) fs.delete(old, true) // best-effort cleanup
  }
}
