package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** SCRATCH-DEBRIS janitor (r19 verdict task 8): the staged-mutation
  * protocol is crash-safe by leaving debris, never by losing data — a
  * crashed migration strands its `.tmp-*` staging sibling, a failed
  * best-effort cleanup leaves `.old`, an interrupted lock break leaves
  * `.fslock.break-*`, tombstone-log compaction leaves `.compact-*`
  * temps — and none of it is ever read again (readers gate on liveness
  * markers and exact name patterns), but across sessions it accumulates.
  * [[cleanupScratch]] removes it, and ONLY it:
  *
  *  - every debris pattern is a name no live artifact can carry
  *    ([[ArtifactStore.rootFor]] names contain no dots-suffixes; batch
  *    dirs full-match `b\d+`; tombstone logs end exactly in
  *    `.tombstones`);
  *  - deletion happens under the owning root's [[FsLock]], so debris of
  *    a mutation IN FLIGHT in another process is untouchable until that
  *    mutation finishes — with the lock held, any remaining debris of
  *    that root is provably dead;
  *  - retained keepOld generations (`.retired-v<N>`,
  *    [[IndexMigration.rollback]]'s restore source) are deliberate
  *    artifacts, removed only with `keepRetired = false`;
  *  - live `.fslock` files are never touched (a dead holder's lock
  *    self-heals on the next acquire).
  */
object Janitor {

  /** (regex over the child NAME, kind label). Order matters only for the
    * label; patterns are mutually exclusive by construction.
    */
  private val debrisKinds: Seq[(scala.util.matching.Regex, String)] = Seq(
    ("^(.*)\\.tmp-[0-9a-f]{8}$".r, "staging"),
    ("^(.*)\\.purge-tmp-[0-9a-f]{8}$".r, "purge-staging"),
    ("^(.*)\\.old$".r, "retired-old"),
    ("^(.*)\\.fslock\\.break-[0-9a-f]{8}$".r, "lock-break"),
    ("^(.*)\\.fslock\\.rel-[0-9a-f]{8}$".r, "lock-release"),
    ("^(.*\\.tombstones)\\.compact-[0-9a-f]{8}$".r, "log-compact"),
    ("^(.*\\.tombstones)\\.clear-[0-9a-f]{8}$".r, "log-clear"))

  private val retiredKind: (scala.util.matching.Regex, String) =
    ("^(.*)\\.retired-v[0-9]+$".r, "retired-generation")

  /** The debris kind of `name`, with the OWNING ROOT name the deletion
    * must lock (tombstone-log temps lock the log's root; everything else
    * locks its stripped prefix).
    */
  private[graft] def debrisOf(name: String,
                              keepRetired: Boolean): Option[(String, String)] = {
    val kinds = if (keepRetired) debrisKinds else debrisKinds :+ retiredKind
    kinds.collectFirst {
      case (re, kind) if re.findFirstMatchIn(name).isDefined =>
        val owner0 = re.findFirstMatchIn(name).get.group(1)
        // tombstone-log temps name the LOG; the mutation lock lives on the
        // log's owning index root
        val owner = owner0.stripSuffix(".tombstones")
        (owner, kind)
    }
  }

  private def hasSuccess(f: FileSystem, p: Path): Boolean =
    f.exists(new Path(p, "_SUCCESS"))

  /** A directory-valued debris entry (`.old` / `.tmp-*` / batch staging)
    * that carries a `_SUCCESS` marker while its owning live root does NOT
    * is the sole complete copy of the data: a [[StagedSwap]] crashed
    * between retiring live→old and promoting tmp→live. StagedSwap's doc
    * calls that state "recoverable by hand, never deleted" — deleting it
    * here would be irreversible data loss (the module's invariant is
    * crash-safe by leaving debris, never by losing data). Such survivors
    * are skipped; they become deletable the moment the root is promoted
    * (live `_SUCCESS` reappears).
    */
  private[graft] def crashedSwapSurvivor(f: FileSystem, liveRoot: Path,
                                         debris: Path, kind: String): Boolean =
    (kind == "staging" || kind == "purge-staging" || kind == "retired-old" ||
      kind == "batch-staging") &&
      f.isDirectory(debris) && hasSuccess(f, debris) && !hasSuccess(f, liveRoot)

  /** Remove crash/retire debris among the children of `base` (an artifact
    * directory — e.g. one [[ArtifactStore.rootFor]] bucket — or any
    * directory holding staged-swap roots), plus batch-level debris
    * (`bN.tmp-*` / `bN.old`) one level inside each live root. Returns one
    * `(path, kind)` row per removed entry. Idempotent; debris whose
    * owning root is locked by a live mutation elsewhere waits for that
    * lock (bounded by the janitor's own patience — `lockTimeoutMs`).
    */
  def cleanupScratch(spark: SparkSession, base: String,
                     keepRetired: Boolean = true,
                     lockTimeoutMs: Long = 60000): Seq[(String, String)] = {
    val f = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val basePath = new Path(base)
    if (!f.exists(basePath)) return Seq.empty
    val children = f.listStatus(basePath).toSeq.map(_.getPath)
    val removed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // top-level debris, grouped by owning root so each root locks once
    val byOwner = children
      .flatMap(p => debrisOf(p.getName, keepRetired).map { case (o, k) => (o, p, k) })
      .groupBy(_._1)
    byOwner.foreach { case (owner, entries) =>
      val root = new Path(basePath, owner).toString
      // a root whose lock cannot be acquired is BUSY (a live mutation in
      // another process) — skip it this pass rather than abort the sweep;
      // its debris is picked up by the next run
      scala.util.Try(FsLock.withLock(f, root, timeoutMs = lockTimeoutMs) {
        entries.foreach { case (_, p, kind) =>
          // re-check under the lock: the owner's mutation may have already
          // consumed (renamed away) the debris while we waited — and never
          // delete the only surviving copy of a crashed swap
          if (f.exists(p) && !crashedSwapSurvivor(f, new Path(basePath, owner), p, kind)
            && f.delete(p, true)) removed += ((p.toString, kind))
        }
      })
    }
    // batch-level debris inside live roots: bN.tmp-* / bN.old from crashed
    // purge/append swaps (batch names full-match b\d+, so these are never
    // read). One level deep only — the layouts place staging as siblings.
    // RE-LIST: the top-level pass above just deleted entries the stale
    // `children` listing still names.
    f.listStatus(basePath).toSeq
      .filter(st => st.isDirectory
        && debrisOf(st.getPath.getName, keepRetired = false).isEmpty
        && !st.getPath.getName.endsWith(".tombstones"))
      .map(_.getPath)
      .foreach { rootPath =>
        val inner = f.listStatus(rootPath).toSeq.map(_.getPath)
          .filter(q => q.getName.matches("b\\d+\\.(tmp-[0-9a-f]{8}|old)"))
        if (inner.nonEmpty)
          scala.util.Try(FsLock.withLock(f, rootPath.toString, timeoutMs = lockTimeoutMs) {
            inner.foreach { q =>
              val liveBatch = new Path(rootPath,
                q.getName.replaceAll("\\.(tmp-[0-9a-f]{8}|old)$", ""))
              if (f.exists(q)
                && !crashedSwapSurvivor(f, liveBatch, q, "batch-staging")
                && f.delete(q, true))
                removed += ((q.toString, "batch-staging"))
            }
          })
      }
    removed.toSeq
  }
}
