package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.FileSystem
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.pipeline.FsLock]]: exclusion between threads (the same protocol
  * excludes processes — atomic O_EXCL create), per-thread re-entrancy,
  * release-on-exception, and stale-lock breaking by rename arbitration.
  */
class FsLockSpec extends AnyFunSuite {
  import graft.pipeline.FsLock

  private val fs: FileSystem =
    FileSystem.getLocal(new Configuration()).getRawFileSystem

  private def freshRoot(): String =
    s"/tmp/graft-test-fslock/${java.util.UUID.randomUUID().toString.take(8)}/r"

  test("withLock: critical sections exclude each other (no lost updates)") {
    val root = freshRoot()
    val counter = java.nio.file.Paths.get(root + ".counter")
    java.nio.file.Files.createDirectories(counter.getParent)
    java.nio.file.Files.writeString(counter, "0")
    // read-modify-write a file-backed counter from 8 threads; without
    // mutual exclusion the interleaved RMW loses updates
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        for (_ <- 1 to 25) FsLock.withLock(fs, root) {
          val v = java.nio.file.Files.readString(counter).trim.toLong
          java.nio.file.Files.writeString(counter, (v + 1).toString)
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(java.nio.file.Files.readString(counter).trim.toLong === 200L)
    assert(!new java.io.File(root + ".fslock").exists(), "lock released")
  }

  test("withLock: per-thread re-entrancy, release on exception") {
    val root = freshRoot()
    val v = FsLock.withLock(fs, root) {
      FsLock.withLock(fs, root) { 7 } // nested same-thread: no self-deadlock
    }
    assert(v === 7)
    intercept[RuntimeException] {
      FsLock.withLock(fs, root) { sys.error("boom") }
    }
    assert(!new java.io.File(root + ".fslock").exists(),
      "lock must release when the body throws")
    // and the root is immediately lockable again
    assert(FsLock.withLock(fs, root) { 1 } === 1)
  }

  test("withLock: a stale lock (dead holder) is broken, a fresh one is respected") {
    val root = freshRoot()
    val lock = java.nio.file.Paths.get(root + ".fslock")
    java.nio.file.Files.createDirectories(lock.getParent)
    java.nio.file.Files.writeString(lock, "pid=0 acquired=0") // orphaned
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600000))
    // an hour-old lock breaks within the acquisition spin
    assert(FsLock.withLock(fs, root, timeoutMs = 10000, staleMs = 600000) { 9 } === 9)
    // a FRESH foreign lock is respected until timeout
    java.nio.file.Files.writeString(lock, "pid=0 acquired=now")
    val t0 = System.currentTimeMillis()
    val e = intercept[RuntimeException] {
      FsLock.withLock(fs, root, timeoutMs = 700, staleMs = 600000) { 0 }
    }
    assert(e.getMessage.contains("timed out"))
    assert(System.currentTimeMillis() - t0 >= 700)
  }
}
