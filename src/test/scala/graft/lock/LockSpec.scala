package graft.lock

import java.nio.file.{Files, Paths}

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
    val dir = graft.core.TempDirs.create("graft-lock")
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

  test("release from a non-acquiring thread works (no thread ownership)") {
    val dir = graft.core.TempDirs.create("graft-lock")
    val lock = new FileAdvisoryLock(dir.resolve("lockfile")) // acquired on construction
    assert(lock.isLocked)
    var failure: Option[Throwable] = None
    val releaser = new Thread(() =>
      try lock.release() catch { case t: Throwable => failure = Some(t) })
    releaser.start(); releaser.join()
    assert(failure.isEmpty, s"non-owner release threw: $failure")
    assert(!lock.isLocked)
    lock.close()
  }

  test("6 OS processes × 25 increments, exact counter through the file lock") {
    val dir = graft.core.TempDirs.create("graft-lock-proc")
    val counterFile = dir.resolve("counter")
    Files.writeString(counterFile, "0")
    val lockFile = dir.resolve("lockfile")
    val (procs, iters) = (6, 25)

    // classpath for the forked JVMs: wherever LockWorker and the Scala
    // stdlib were loaded from (robust whether or not sbt forks tests)
    val cp = Seq(LockWorker.getClass, classOf[FileAdvisoryLock], classOf[scala.Function1[_, _]])
      .map(_.getProtectionDomain.getCodeSource.getLocation.getPath)
      .distinct.mkString(java.io.File.pathSeparator)
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString

    val running = (0 until procs).map { _ =>
      new ProcessBuilder(javaBin, "-cp", cp, "graft.lock.LockWorker",
        lockFile.toString, counterFile.toString, iters.toString)
        .redirectErrorStream(true).start()
    }
    running.foreach { p =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), "worker timed out")
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.exitValue() == 0, s"worker failed: $out")
    }
    assert(Files.readString(counterFile).trim.toLong == procs.toLong * iters)
  }
}
