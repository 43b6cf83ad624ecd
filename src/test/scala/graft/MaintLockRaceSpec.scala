package graft

import org.scalatest.funsuite.AnyFunSuite

/** The unlink-under-lock race (r15 ADVICE, medium): a locker that has
  * OPENED the `.maintlock` channel but not yet called `lock()` — a
  * window that includes the whole blocking wait behind another owner —
  * can have the file won-and-unlinked by a concurrent
  * [[AtRest.gcStale]] orphan sweep (tryLock succeeds precisely because
  * the locker hasn't locked yet). The locker then acquires a lock on a
  * DEAD inode while a fresh locker creates and locks a new file at the
  * same path — two simultaneous maintenance owners, i.e. the
  * lost-takedown interleaving the lock exists to prevent.
  * [[AtRest.withMaintenanceLock]] closes this by comparing the path's
  * fileKey (stat only — a second OPEN of a held lock file would drop
  * the lock itself via POSIX close-releases-all) after open vs under
  * the held lock, re-acquiring on mismatch; this spec drives the exact
  * window deterministically via [[AtRest.maintLockRaceHook]]. */
class MaintLockRaceSpec extends AnyFunSuite {

  private def fileKey(p: java.nio.file.Path): Object =
    java.nio.file.Files.readAttributes(
      p, classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey

  test("withMaintenanceLock re-acquires when its inode is unlinked between open and lock") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lockrace").toString + "/idx"
    val lockFile = new java.io.File(dir + ".maintlock")
    val fired = new java.util.concurrent.atomic.AtomicInteger
    val intruderKey = new java.util.concurrent.atomic.AtomicReference[Object]
    val retriesBefore = AtRest.maintLockRetries.get()
    AtRest.maintLockRaceHook = { lf =>
      // fire exactly once or the retry loop would be re-raced forever
      if (fired.getAndIncrement() == 0) {
        // the GC side: win a tryLock on the not-yet-locked inode and
        // unlink it — byte-for-byte what tryUnlinkLock does when the
        // generation directory is gone (no same-JVM owner is registered
        // yet, so the heldLockPaths pre-guard correctly lets it through)
        val ch = java.nio.channels.FileChannel.open(lf.toPath,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val l = ch.tryLock()
          assert(l != null, "precondition: the locker must not have locked yet")
          try assert(lf.delete(), "precondition: unlink must succeed")
          finally l.release()
        } finally ch.close()
        // the fresh-locker side: a new file (new inode) appears at the
        // same path; it holds no lock by the time our retry re-acquires,
        // as a released cross-process owner wouldn't
        java.nio.file.Files.createFile(lf.toPath)
        intruderKey.set(fileKey(lf.toPath))
      }
    }
    try {
      var bodyRuns = 0
      var keyAtBody: Object = null
      AtRest.withMaintenanceLock(dir) {
        bodyRuns += 1
        keyAtBody = fileKey(lockFile.toPath)
      }
      assert(bodyRuns == 1, "body must run exactly once")
      assert(fired.get() >= 1, "the race hook must have fired")
      // the discriminator vs the pre-fix single-shot acquire: detection
      // happened (exactly one retry) and the acquisition that ran the
      // body verified keyOpen == keyLocked on its own fresh channel, so
      // the lock the body ran under is on the inode at the path — the
      // intruder's, not the dead unlinked original
      assert(AtRest.maintLockRetries.get() == retriesBefore + 1,
        "exactly one detected-and-retried acquisition expected")
      assert(keyAtBody == intruderKey.get(),
        "body must run with the successor inode at the path")
    } finally AtRest.maintLockRaceHook = null
  }

  test("negative control: an un-raced acquisition verifies in one pass (no retry)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lockplain").toString + "/idx"
    val retriesBefore = AtRest.maintLockRetries.get()
    var ran = false
    AtRest.withMaintenanceLock(dir) { ran = true }
    assert(ran)
    assert(AtRest.maintLockRetries.get() == retriesBefore, "no retry on the clean path")
  }

  test("a same-JVM GC sweep never opens a held lock file (close would drop the owner's POSIX lock)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lockheld").toString + "/idx"
    val lockFile = new java.io.File(dir + ".maintlock")
    AtRest.withMaintenanceLock(dir) {
      val keyHeld = fileKey(lockFile.toPath)
      // gcStale's orphan sweep path: the generation dir is absent, so
      // without the heldLockPaths pre-guard this would open a probe
      // channel on OUR held lock file — and its close() would release
      // our cross-process lock at the kernel. The guard must skip it
      // entirely, leaving the file (and our lock) in place.
      val m = classOf[AtRest.type].getDeclaredMethod(
        "tryUnlinkLock", classOf[java.io.File])
      m.setAccessible(true)
      m.invoke(AtRest, lockFile)
      assert(lockFile.exists(), "held lock file must survive a same-JVM sweep")
      assert(fileKey(lockFile.toPath) == keyHeld, "held lock inode must be untouched")
    }
    // after release the same sweep may collect it
    val m = classOf[AtRest.type].getDeclaredMethod("tryUnlinkLock", classOf[java.io.File])
    m.setAccessible(true)
    m.invoke(AtRest, lockFile)
    assert(!lockFile.exists(), "released orphan lock must be collectable")
  }
}
