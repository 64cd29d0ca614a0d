package graft.lock

import java.nio.file.{Files, Paths}

/** Forked-JVM worker for the cross-process lock proof: increments a
  * shared counter file `iters` times, each increment under a fresh
  * [[FileAdvisoryLock]] — the reference's multiprocess counter shape
  * (`tests/lock/test_lock.py:83-111`, 6 OS processes). The
  * read-modify-write is deliberately non-atomic: only the OS file lock
  * makes the final count exact. */
object LockWorker {
  def main(args: Array[String]): Unit = {
    val lockFile = Paths.get(args(0))
    val counterFile = Paths.get(args(1))
    val iters = args(2).toInt
    for (_ <- 0 until iters) {
      val lock = new FileAdvisoryLock(lockFile)
      try {
        val v = Files.readString(counterFile).trim.toLong
        Files.writeString(counterFile, (v + 1).toString)
      } finally lock.close()
    }
  }
}
