package graft.core

import java.nio.file.{Files, Path, Paths}

/** Process-scoped temp-directory discipline for every gate-local and
  * shared-artifact layout this library writes.
  *
  * Two leak classes this closes (r11 audit: 7,499 stray `/tmp/graft-*`
  * dirs, 2.6 GB, accumulated across rounds):
  *  - per-invocation layouts that outlive their gate → callers use
  *    [[scoped]] (try/finally delete);
  *  - per-(JVM, dataset) shared artifacts that legitimately live for
  *    the process but used to survive it → everything allocates under
  *    ONE per-process root ([[create]]) removed by a shutdown hook, so
  *    even a killed JVM leaves exactly one directory, and stray roots
  *    from hard-killed processes are one `rm -rf /tmp/graft-tmp` away.
  */
object TempDirs {

  /** The per-process root: `$TMPDIR/graft-tmp/<pid>-<token>`. Created
    * on first use; a shutdown hook deletes the whole tree at JVM exit
    * (by then every Spark job is done — gates never hand frames across
    * process boundaries). */
  lazy val processRoot: Path = {
    val base = Files.createDirectories(
      Paths.get(System.getProperty("java.io.tmpdir"), "graft-tmp"))
    sweepDeadRoots(base)
    val r = Files.createTempDirectory(
      base, ProcessHandle.current().pid().toString + "-")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try DirSwap.deleteTree(r) catch { case _: Throwable => () },
      "graft-tempdirs-cleanup"))
    r
  }

  /** Remove sibling roots whose owning process is gone — the one leak
    * the exit hook can't cover (a SIGKILLed JVM never runs it). Root
    * names lead with the owner's pid, so liveness is one
    * ProcessHandle probe; a pid that was RECYCLED onto an unrelated
    * process keeps the stale root until the next lucky sweep, which
    * only delays cleanup, never deletes a live root (a live graft
    * JVM's root is its own pid by construction). Racing sweepers are
    * harmless: deleteTree tolerates the other's wins. */
  private[core] def sweepDeadRoots(base: Path): Unit =
    try {
      val self = ProcessHandle.current().pid()
      scala.util.Using.resource(Files.list(base)) { siblings =>
        siblings.iterator().forEachRemaining { p =>
          val pid = p.getFileName.toString.takeWhile(_.isDigit)
          if (pid.nonEmpty && pid.toLong != self &&
              !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false))
            try DirSwap.deleteTree(p) catch { case _: Throwable => () }
        }
      }
    } catch { case _: Throwable => () }

  /** A fresh unique directory under the process root — for shared
    * artifacts memoized per (JVM, dataset). Lives until JVM exit. */
  def create(prefix: String): Path =
    Files.createTempDirectory(processRoot, prefix)

  /** A gate-local directory deleted when `body` returns or throws.
    * Callers must MATERIALIZE anything derived from the layout before
    * returning (collect / localCheckpoint / copy into a surviving
    * store) — a lazy DataFrame over a deleted path fails at action
    * time. */
  def scoped[T](prefix: String)(body: Path => T): T = {
    val d = create(prefix)
    try body(d)
    finally try DirSwap.deleteTree(d) catch { case _: Throwable => () }
  }
}
