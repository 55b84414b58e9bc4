package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}

/** CROSS-PROCESS mutation lock (r18 verdict task 4): the `synchronized`
  * contract on [[IndexErasure]]/[[ArtifactStore]] serializes mutations
  * inside ONE JVM only — two processes interleaving purge/append could
  * still resurrect purged references through the gap between a purge's
  * batch listing and its tombstone-log write. This is the missing half: an
  * exclusive lock file (`<root>.fslock`) acquired by ATOMIC CREATE before
  * any mutation of the root, so cross-process mutations serialize the same
  * way in-process ones do.
  *
  * Atomicity: on the local filesystem, `Files.createFile` (O_CREAT|O_EXCL
  * — Hadoop's RawLocalFileSystem `create(overwrite=false)` is a racy
  * exists-then-create); on HDFS-like filesystems, `fs.create(p, false)`
  * is atomic server-side.
  *
  * DEAD-HOLDER recovery without losing exclusion for live long holders
  * (review r19): the lock payload records the holder's pid + a unique
  * token. On the LOCAL filesystem a waiter breaks a foreign lock only
  * when that pid is provably DEAD (`ProcessHandle.of(pid).isAlive` —
  * single-box deployments, which is this environment's world), so a
  * migration legitimately holding for an hour is never broken; age alone
  * never breaks a live holder's lock. On non-local filesystems (no
  * cross-host pid oracle) the fallback is mtime staleness after
  * `staleMs` — and the HOLDER HEARTBEATS the lock file (mtime refresh on
  * a daemon thread every staleMs/3 while held, r19 ADVICE), so a live
  * long mutation — a multi-hour migration — is never judged stale; only
  * a crashed holder's mtime goes quiet.
  *
  * Breaking is by RENAME to a unique name — two breakers racing arbitrate
  * atomically (one rename wins) — followed by a VERIFY-or-UNDO (r19
  * ADVICE TOCTOU): the winner re-reads the renamed file and re-checks
  * breakability; if the payload is no longer the one observed when the
  * break was decided (another breaker already broke the dead lock and a
  * NEW live holder created a fresh one at lockPath — which our rename
  * then evicted), or the holder heartbeat between decision and rename,
  * the file is renamed BACK and the break is abandoned. Release is
  * likewise rename-arbitrated (r19 verdict finding 2): the holder renames
  * the lock aside, confirms its own token, and only then deletes — a
  * mtime-stale break + re-acquire sliding in between the ownership read
  * and the delete can no longer cost the new holder its lock.
  *
  * Re-entrancy is PER-THREAD: a thread already holding a root's lock
  * re-enters directly (e.g. [[IndexErasure.appendBatchPurged]] →
  * [[ArtifactStore.appendBatchIfAbsent]] on the same root). The held-set
  * key is the fs-QUALIFIED root URI, so `/a/b` and a qualified
  * `file:/a/b` name the same lock. Lock order is always FsLock → JVM
  * monitor (callers wrap `synchronized` bodies in [[withLock]], never the
  * reverse), so a thread spinning on the file lock never holds a monitor
  * the lock holder needs.
  *
  * Readers stay lock-free: the staged-swap/liveness-marker choreography
  * already guarantees a reader sees complete generations, and the
  * scratch-tier read contract ([[StagedSwap]] scaladoc) is unchanged.
  */
object FsLock {

  /** Roots whose lock THIS THREAD already holds — re-entrancy. Keyed by
    * the qualified root URI (path-string aliases collapse to one key).
    */
  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  /** Test hook: force the non-local (mtime staleness + heartbeat) rules on
    * the local filesystem, where the pid oracle would otherwise apply —
    * the only way to exercise the HDFS-path logic offline.
    */
  @volatile private[graft] var forceMtimeMode: Boolean = false

  private def mtimeMode(fs: FileSystem): Boolean =
    forceMtimeMode ||
      !(fs.isInstanceOf[LocalFileSystem] || fs.isInstanceOf[RawLocalFileSystem])

  def withLock[T](fs: FileSystem, root: String,
                  timeoutMs: Long = 1200000, staleMs: Long = 600000)(body: => T): T = {
    val key = fs.makeQualified(new Path(root)).toUri.toString
    if (held.get.contains(key)) return body
    val lockPath = new Path(root + ".fslock")
    val token = s"pid=${ProcessHandle.current().pid()} " +
      s"token=${java.util.UUID.randomUUID()} acquired=${System.currentTimeMillis()}"
    acquire(fs, lockPath, token, timeoutMs, staleMs)
    held.get += key
    // non-local FS: a live holder proves liveness by mtime refresh — a
    // mutation longer than staleMs (migrations are one corpus pass) must
    // not lose exclusion to the staleness fallback
    val beat = if (mtimeMode(fs)) Some(startHeartbeat(fs, lockPath, token, staleMs)) else None
    try body
    finally {
      beat.foreach(_.interrupt())
      held.get -= key
      release(fs, lockPath, token)
    }
  }

  /** Ownership-checked RELEASE by rename arbitration: read-then-delete had
    * a TOCTOU window on non-local filesystems (a stale-break + re-acquire
    * between the ownership read and the delete let the old holder delete
    * the NEW holder's lock). Renaming first makes the claim atomic: only
    * one party can move the file; if what we moved turns out not to be
    * ours, it goes straight back.
    */
  private def release(fs: FileSystem, lockPath: Path, token: String): Unit =
    try {
      // cheap pre-check: skip the rename when the lock is already gone or
      // visibly foreign (we were broken — nothing of ours to release)
      if (!readPayload(fs, lockPath).contains(token)) return
      val rel = new Path(lockPath.toString + ".rel-" +
        java.util.UUID.randomUUID().toString.take(8))
      if (!fs.rename(lockPath, rel)) return // someone else moved it first
      if (readPayload(fs, rel).contains(token)) fs.delete(rel, false)
      else renameBackOrDie(fs, rel, lockPath) // we moved a foreign lock — undo
    } catch { case scala.util.control.NonFatal(_) => () }

  private def readPayload(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** [[readPayload]] that distinguishes a CONFIRMED state from a transient
    * read failure (ADVICE r20: the heartbeat must not die on one flaky
    * read): Right(Some(payload)) = read OK, Right(None) = file confirmed
    * absent, Left(e) = the read failed and absence could not be confirmed.
    */
  private def readPayloadChecked(fs: FileSystem, p: Path): Either[Throwable, Option[String]] =
    try {
      val in = fs.open(p)
      try Right(Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)))
      finally in.close()
    } catch {
      case _: java.io.FileNotFoundException => Right(None)
      case e: java.io.IOException =>
        try { if (fs.exists(p)) Left(e) else Right(None) }
        catch { case e2: java.io.IOException => Left(e2) }
    }

  /** One atomic create attempt. */
  private def tryCreate(fs: FileSystem, p: Path, token: String): Boolean = {
    val payload = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    fs match {
      case _: LocalFileSystem | _: RawLocalFileSystem =>
        try {
          val local = java.nio.file.Paths.get(p.toUri.getPath)
          if (local.getParent != null) java.nio.file.Files.createDirectories(local.getParent)
          java.nio.file.Files.write(local, payload,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      case _ =>
        // distinguish the atomic create from the payload write: a write
        // failure AFTER a successful create must not strand an orphaned
        // empty lock the creator itself then treats as foreign-held
        val out =
          try fs.create(p, false) // atomic on HDFS-like filesystems
          catch { case _: java.io.IOException => null }
        if (out == null) false
        else {
          try { out.write(payload); out.close(); true }
          catch {
            case _: java.io.IOException =>
              try out.close() catch { case _: java.io.IOException => () }
              try fs.delete(p, false) catch { case _: java.io.IOException => () }
              false
          }
        }
    }
  }

  /** Is the lock at `p` breakable RIGHT NOW, judged from its payload and
    * mtime? Local FS: only when the recorded holder pid is provably dead
    * (a live holder is NEVER broken, however long it holds). Non-local
    * (or [[forceMtimeMode]]): mtime older than `staleMs` — the heartbeat
    * keeps a live holder's mtime fresh. Unparseable payloads fall back to
    * the mtime rule. Returns the observed payload when breakable, None
    * otherwise — the observation the break VERIFIES against after its
    * rename wins.
    */
  private def observeBreakable(fs: FileSystem, p: Path, staleMs: Long): Option[String] = {
    val payload = readPayload(fs, p)
    val pid = payload.flatMap(s =>
      "pid=(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong))
    val dead = (!mtimeMode(fs), pid) match {
      case (true, Some(id)) =>
        !ProcessHandle.of(id).map[Boolean](_.isAlive).orElse(false)
      case _ =>
        try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > staleMs
        catch { case _: java.io.FileNotFoundException => false } // released meanwhile
    }
    if (dead) payload else None
  }

  /** Break the lock at `lockPath` IF it is still the dead/stale lock whose
    * payload was `observed` (r19 ADVICE TOCTOU fix): rename arbitrates —
    * exactly one breaker wins the file — then the winner VERIFIES that
    * what it renamed is still the observed payload AND still breakable
    * (the holder may have heartbeat between observation and rename; mtime
    * survives a rename, so re-checking the renamed file is sound). On
    * verify failure the file is renamed back: we moved a LIVE holder's
    * lock (a fresh one created after another breaker won, or a heartbeat
    * landed) and must restore it. Returns true when the break completed.
    */
  private[graft] def tryBreakObserved(fs: FileSystem, lockPath: Path,
                                      observed: String, staleMs: Long): Boolean = {
    val breaker = new Path(lockPath.toString + ".break-" +
      java.util.UUID.randomUUID().toString.take(8))
    if (!fs.rename(lockPath, breaker)) return false // lost the race / released
    val stillDead = observeBreakable(fs, breaker, staleMs).contains(observed)
    if (stillDead) { fs.delete(breaker, false); true }
    else { renameBackOrDie(fs, breaker, lockPath); false }
  }

  /** Undo a rename that claimed a file we must not keep: the lock goes
    * back to `lockPath`. A competing creator can occupy `lockPath` inside
    * the undo window; retry briefly — if the slot never frees, fail LOUDLY
    * rather than silently leave two live holders (the evicted one would
    * keep mutating without a lock file).
    */
  private def renameBackOrDie(fs: FileSystem, from: Path, to: Path): Unit = {
    var attempt = 0
    while (!fs.rename(from, to)) {
      attempt += 1
      if (attempt > 200)
        sys.error(s"FsLock: could not restore wrongly-claimed lock $from to $to " +
          "— a foreign holder may have lost exclusion; manual repair required")
      Thread.sleep(10)
      if (!fs.exists(from)) return // nothing left to restore
    }
  }

  /** Daemon heartbeat for mtime-staleness deployments: refresh the lock's
    * mtime every staleMs/3 while the payload is still ours; stop the
    * moment it isn't (we were broken — refreshing a foreign lock's mtime
    * would wrongly extend a possibly-dead new holder).
    */
  private def startHeartbeat(fs: FileSystem, lockPath: Path, token: String,
                             staleMs: Long): Thread = {
    val interval = math.max(50L, staleMs / 3)
    val t = new Thread(() => {
      try {
        var mine = true
        while (mine && !Thread.interrupted()) {
          Thread.sleep(interval)
          // only a CONFIRMED foreign/absent payload stops the beat; a
          // transient read error (plausible on HDFS, the deployment this
          // heartbeat exists for) logs and retries next interval — exiting
          // on it would silently re-open the lost-exclusion window for a
          // live multi-hour holder (ADVICE r20)
          readPayloadChecked(fs, lockPath) match {
            case Right(pl) =>
              mine = pl.contains(token)
              if (mine)
                try fs.setTimes(lockPath, System.currentTimeMillis(), -1)
                catch { case _: java.io.IOException => () }
            case Left(e) =>
              System.err.println(s"[fslock] heartbeat read of $lockPath failed " +
                s"(${e.getClass.getSimpleName}: ${e.getMessage}); retrying next beat")
          }
        }
      } catch { case _: InterruptedException => () }
    }, s"fslock-heartbeat-${lockPath.getName}")
    t.setDaemon(true)
    t.start()
    t
  }

  private def acquire(fs: FileSystem, lockPath: Path, token: String,
                      timeoutMs: Long, staleMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var backoff = 5L
    while (!tryCreate(fs, lockPath, token)) {
      // held by someone else — break only a provably dead/stale holder,
      // and only after the post-rename verify confirms the observation
      try {
        observeBreakable(fs, lockPath, staleMs).foreach { observed =>
          tryBreakObserved(fs, lockPath, observed, staleMs)
        }
      } catch { case _: java.io.FileNotFoundException => () } // released meanwhile
      if (System.currentTimeMillis() > deadline)
        sys.error(s"FsLock: timed out after ${timeoutMs}ms acquiring $lockPath")
      Thread.sleep(backoff)
      backoff = math.min(backoff * 2, 250)
    }
  }
}
