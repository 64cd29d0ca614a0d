package graft.core

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The shared two-rename swap: recovery must RESTORE a mid-swap
  * casualty (live dir missing, layout stranded at `_old`) and must
  * only delete `_old` when a healthy live dir exists. */
class DirSwapSpec extends AnyFunSuite {

  private def mkLayout(tag: String): String = {
    val base = graft.core.TempDirs.create("graft-dirswap").resolve("layout")
    Files.createDirectories(base)
    Files.writeString(base.resolve("data"), tag)
    base.toString
  }

  test("recover restores the pre-swap layout when the live dir is missing") {
    val dst = mkLayout("precious")
    // mid-swap crash state: live renamed aside, stale rewrite present
    Files.move(Paths.get(dst), Paths.get(dst + "_old"))
    Files.createDirectories(DirSwap.compactingPath(dst))
    Files.writeString(DirSwap.compactingPath(dst).resolve("partial"), "incomplete")
    DirSwap.recover(dst)
    assert(Files.readString(Paths.get(dst, "data")) == "precious")
    assert(!Files.exists(Paths.get(dst + "_old")))
    assert(!Files.exists(DirSwap.compactingPath(dst)))
  }

  test("recover clears debris without touching a healthy live dir") {
    val dst = mkLayout("live")
    Files.createDirectories(Paths.get(dst + "_old"))
    Files.writeString(Paths.get(dst + "_old").resolve("stale"), "superseded")
    Files.createDirectories(DirSwap.compactingPath(dst))
    DirSwap.recover(dst)
    assert(Files.readString(Paths.get(dst, "data")) == "live")
    assert(!Files.exists(Paths.get(dst + "_old")))
    assert(!Files.exists(DirSwap.compactingPath(dst)))
  }

  test("swapInto replaces the live dir and drops the displaced copy") {
    val dst = mkLayout("old-copy")
    DirSwap.recover(dst)
    Files.createDirectories(DirSwap.compactingPath(dst))
    Files.writeString(DirSwap.compactingPath(dst).resolve("data"), "new-copy")
    DirSwap.swapInto(dst)
    assert(Files.readString(Paths.get(dst, "data")) == "new-copy")
    assert(!Files.exists(Paths.get(dst + "_old")))
    assert(!Files.exists(DirSwap.compactingPath(dst)))
  }
}
