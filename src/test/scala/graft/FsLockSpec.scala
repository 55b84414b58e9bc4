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

  test("withLock: a dead holder's lock is broken; a live holder's is respected at ANY age") {
    val root = freshRoot()
    val lock = java.nio.file.Paths.get(root + ".fslock")
    java.nio.file.Files.createDirectories(lock.getParent)
    // a DEAD holder (pid 999999999 cannot exist) breaks regardless of age
    java.nio.file.Files.writeString(lock, "pid=999999999 token=x acquired=0")
    assert(FsLock.withLock(fs, root, timeoutMs = 10000, staleMs = 600000) { 9 } === 9)
    // a LIVE holder (this very process) is respected until timeout — even
    // with an hour-old mtime: age alone never breaks a live holder
    // (review r19: a migration can legitimately hold for longer than any
    // staleness bound)
    java.nio.file.Files.writeString(lock,
      s"pid=${ProcessHandle.current().pid()} token=foreign acquired=0")
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600000))
    val t0 = System.currentTimeMillis()
    val e = intercept[RuntimeException] {
      FsLock.withLock(fs, root, timeoutMs = 700, staleMs = 100) { 0 }
    }
    assert(e.getMessage.contains("timed out"))
    assert(System.currentTimeMillis() - t0 >= 700)
    assert(java.nio.file.Files.readString(lock).contains("token=foreign"),
      "the live holder's lock must survive the waiter's timeout untouched")
  }

  test("withLock: a broken holder cannot delete the next holder's lock on release") {
    val root = freshRoot()
    val lock = java.nio.file.Paths.get(root + ".fslock")
    // simulate: we acquire, someone (wrongly) breaks us and re-acquires —
    // our release must leave THEIR lock standing (ownership check)
    FsLock.withLock(fs, root) {
      java.nio.file.Files.delete(lock) // the "breaker" removed our lock
      java.nio.file.Files.writeString(lock, "pid=1 token=theirs acquired=1")
      1
    }
    assert(java.nio.file.Files.readString(lock).contains("token=theirs"),
      "release must be ownership-checked, never an unconditional delete")
  }
}
