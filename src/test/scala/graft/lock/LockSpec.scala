package graft.lock

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Lock correctness: concurrent writers incrementing a shared counter
  * through the lock must lose no increments — the reference's
  * multiprocess counter test shape (`tests/lock/test_lock.py:83-111`),
  * run here with in-JVM concurrency. */
class LockSpec extends AnyFunSuite {

  test("str_to_bool parses the reference's accepted spellings") {
    assert(Locking.strToBool("1") && Locking.strToBool("true") &&
      Locking.strToBool("t") && Locking.strToBool("yes") && Locking.strToBool("y"))
    assert(!Locking.strToBool("0") && !Locking.strToBool("false") &&
      !Locking.strToBool("f") && !Locking.strToBool("no") && !Locking.strToBool("n"))
    assert(!Locking.strToBool("", default = false))
    assert(Locking.strToBool("", default = true))
    intercept[IllegalArgumentException](Locking.strToBool("bogus"))
  }

  test("fake lock is a no-op that reports held state") {
    val l = new FakeLock
    assert(l.isLocked)
    l.release(); assert(!l.isLocked)
    l.acquire(); assert(l.isLocked)
  }

  test("6 concurrent writers, exact counter sum through the lock") {
    val dir = Files.createTempDirectory("graft-lock")
    val counterFile = dir.resolve("counter")
    Files.writeString(counterFile, "0")
    val lockFile = dir.resolve("lockfile")
    val writers = 6
    val increments = 50

    val threads = (0 until writers).map { _ =>
      new Thread(() => {
        for (_ <- 0 until increments) {
          val lock = new FileAdvisoryLock(lockFile)
          try {
            val v = Files.readString(counterFile).trim.toLong
            Files.writeString(counterFile, (v + 1).toString)
          } finally lock.close()
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(Files.readString(counterFile).trim.toLong == writers.toLong * increments)
  }
}
