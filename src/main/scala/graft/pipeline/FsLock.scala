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
  * is atomic server-side. Stale locks (a holder that died) are broken by
  * RENAME to a unique name — two breakers racing on the same stale lock
  * arbitrate atomically (one rename wins, the loser's source is gone) —
  * after `staleMs` without modification.
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
                  timeoutMs: Long = 120000, staleMs: Long = 600000)(body: => T): T = {
    if (held.get.contains(root)) return body
    val lockPath = new Path(root + ".fslock")
    acquire(fs, lockPath, timeoutMs, staleMs)
    held.get += root
    try body
    finally {
      held.get -= root
      try fs.delete(lockPath, false)
      catch { case scala.util.control.NonFatal(_) => () } // stale-break cleans up
    }
  }

  private def payload: Array[Byte] =
    s"pid=${ProcessHandle.current().pid()} acquired=${System.currentTimeMillis()}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** One atomic create attempt. */
  private def tryCreate(fs: FileSystem, p: Path): Boolean = fs match {
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
      try {
        val out = fs.create(p, false) // atomic on HDFS-like filesystems
        try out.write(payload) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
  }

  private def acquire(fs: FileSystem, lockPath: Path,
                      timeoutMs: Long, staleMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var backoff = 5L
    while (!tryCreate(fs, lockPath)) {
      // held by someone else — break it only if demonstrably stale
      try {
        val st = fs.getFileStatus(lockPath)
        if (System.currentTimeMillis() - st.getModificationTime > staleMs) {
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
