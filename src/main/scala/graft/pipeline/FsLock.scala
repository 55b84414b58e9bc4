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
  * `staleMs`. Breaking is by RENAME to a unique name — two breakers
  * racing arbitrate atomically (one rename wins). Release is
  * OWNERSHIP-CHECKED: the holder deletes the lock only if it still
  * carries its own token, so a holder that WAS broken (crash-judged or
  * mtime-stale) cannot delete the next holder's lock on its way out.
  *
  * Re-entrancy is PER-THREAD: a thread already holding a root's lock
  * re-enters directly (e.g. [[IndexErasure.appendBatchPurged]] →
  * [[ArtifactStore.appendBatchIfAbsent]] on the same root). Lock order is
  * always FsLock → JVM monitor (callers wrap `synchronized` bodies in
  * [[withLock]], never the reverse), so a thread spinning on the file lock
  * never holds a monitor the lock holder needs.
  *
  * Readers stay lock-free: the staged-swap/liveness-marker choreography
  * already guarantees a reader sees complete generations, and the
  * scratch-tier read contract ([[StagedSwap]] scaladoc) is unchanged.
  */
object FsLock {

  /** Roots whose lock THIS THREAD already holds — re-entrancy. */
  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  def withLock[T](fs: FileSystem, root: String,
                  timeoutMs: Long = 1200000, staleMs: Long = 600000)(body: => T): T = {
    if (held.get.contains(root)) return body
    val lockPath = new Path(root + ".fslock")
    val token = s"pid=${ProcessHandle.current().pid()} " +
      s"token=${java.util.UUID.randomUUID()} acquired=${System.currentTimeMillis()}"
    acquire(fs, lockPath, token, timeoutMs, staleMs)
    held.get += root
    try body
    finally {
      held.get -= root
      // ownership-checked release: if our lock was (wrongly or rightly)
      // broken while we held it, the file now belongs to someone else —
      // deleting it unconditionally would cascade a third holder in
      try {
        if (readPayload(fs, lockPath).contains(token)) fs.delete(lockPath, false)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  private def readPayload(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    } catch { case _: java.io.IOException => None }

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

  /** Is the lock at `p` breakable? Local FS: only when the recorded holder
    * pid is provably dead (a live holder is NEVER broken, however long it
    * holds). Non-local: mtime older than `staleMs` (no cross-host pid
    * oracle). Unparseable payloads fall back to the mtime rule.
    */
  private def breakable(fs: FileSystem, p: Path, staleMs: Long): Boolean = {
    val local = fs.isInstanceOf[LocalFileSystem] || fs.isInstanceOf[RawLocalFileSystem]
    val pid = readPayload(fs, p).flatMap(s =>
      "pid=(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong))
    (local, pid) match {
      case (true, Some(id)) =>
        !ProcessHandle.of(id).map[Boolean](_.isAlive).orElse(false)
      case _ =>
        try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > staleMs
        catch { case _: java.io.FileNotFoundException => false } // released meanwhile
    }
  }

  private def acquire(fs: FileSystem, lockPath: Path, token: String,
                      timeoutMs: Long, staleMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var backoff = 5L
    while (!tryCreate(fs, lockPath, token)) {
      // held by someone else — break only a provably dead/stale holder
      try {
        if (breakable(fs, lockPath, staleMs)) {
          val breaker = new Path(lockPath.toString + ".break-" +
            java.util.UUID.randomUUID().toString.take(8))
          // rename arbitrates atomically: exactly one breaker wins
          if (fs.rename(lockPath, breaker)) fs.delete(breaker, false)
        }
      } catch { case _: java.io.FileNotFoundException => () } // released meanwhile
      if (System.currentTimeMillis() > deadline)
        sys.error(s"FsLock: timed out after ${timeoutMs}ms acquiring $lockPath")
      Thread.sleep(backoff)
      backoff = math.min(backoff * 2, 250)
    }
  }
}
