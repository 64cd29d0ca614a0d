package graft.core

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.scalatest.funsuite.AnyFunSuite

/** The dead-root sweep — the one temp-leak class the JVM exit hook
  * cannot cover (a SIGKILLed process never runs it). Driven against a
  * scratch base so the assertions are exact and never race the real
  * process root; the base itself is deleted in a finally (the spec for
  * the sweep must not leak its own scratch). */
class TempDirsSpec extends AnyFunSuite {

  private def rmTree(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
      finally walk.close()
    }

  test("sweepDeadRoots removes dead-pid roots, keeps live-pid and non-pid entries") {
    val base = Files.createTempDirectory("graft-sweep-spec")
    try {
      val self = ProcessHandle.current().pid()
      // a root whose "pid" can't exist (beyond pid_max), one owned by
      // THIS live process, one owned by pid 1 (alive: init), and a
      // non-pid-named entry the sweep must never touch
      val dead = Files.createDirectories(base.resolve("999999999-dead"))
      Files.writeString(dead.resolve("f"), "x")
      val mine = Files.createDirectories(base.resolve(s"$self-mine"))
      val init = Files.createDirectories(base.resolve("1-init"))
      val other = Files.createDirectories(base.resolve("not-a-pid"))
      TempDirs.sweepDeadRoots(base)
      assert(!Files.exists(dead), "dead-pid root must be swept")
      assert(Files.exists(mine), "own root must survive")
      assert(Files.exists(init), "a live pid's root must survive")
      assert(Files.exists(other), "non-pid entries are not the sweep's to delete")
    } finally rmTree(base)
  }
}
