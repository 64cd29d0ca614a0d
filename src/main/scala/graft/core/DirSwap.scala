package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._
import scala.util.Using

/** The crash-safe directory-replacement primitive every compactor in
  * this codebase shares (IVF corpus, TableStore tables, the postings
  * index): write the replacement to a sibling `<dst>_compacting` dir,
  * then swap with TWO RENAMES — live aside to `<dst>_old`, replacement
  * into place — never a delete of live data before the replacement
  * exists. A crash between the renames leaves the full layout intact
  * at `_old` (each owner recovers or clears leftovers on its next
  * open/run); a failed second rename restores `_old` in-process. The
  * brief window where `dst` does not resolve makes every swap a
  * SINGLE-MAINTAINER step — the owner runs it between its own reads,
  * never concurrently with them. */
object DirSwap {

  /** Recursively delete `p` if it exists (stream closed — no fd leak). */
  def deleteTree(p: Path): Unit = if (Files.exists(p))
    Using.resource(Files.walk(p)) { st =>
      st.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }

  /** Recursively copy `src` into `dst` (used to carry underscore
    * sidecars over to a rewrite before the swap). */
  def copyTree(src: Path, dst: Path): Unit =
    Using.resource(Files.walk(src)) { st =>
      st.iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    }

  /** The staging path for a rewrite of `dst`; [[recover]] must run
    * (or have run) before writing to it. */
  def compactingPath(dst: String): Path = Paths.get(dst + "_compacting")

  /** Heal `dst` after a crashed swap: a leftover `_old` whose live
    * sibling is MISSING is the pre-swap layout caught between the two
    * renames — RESTORED verbatim (the interrupted rewrite is
    * re-runnable; the data is not). An `_old` beside a healthy live
    * dir is completed-swap debris and any `_compacting` leftover is a
    * stale rewrite output — both deleted. Every swap owner calls this
    * before writing its replacement (and the TableStore additionally
    * at open, before any read can observe the gap). */
  def recover(dst: String): Unit = {
    val dstP = Paths.get(dst)
    val old = Paths.get(dst + "_old")
    if (Files.exists(old)) {
      if (!Files.exists(dstP)) Files.move(old, dstP) else deleteTree(old)
    }
    deleteTree(compactingPath(dst))
  }

  /** The two-rename swap: `<dst>_compacting` (fully written by the
    * caller) replaces `dst`; the displaced copy is deleted only after
    * the replacement is in place. */
  def swapInto(dst: String): Unit = {
    val dstP = Paths.get(dst)
    val old = Paths.get(dst + "_old")
    Files.move(dstP, old)
    try Files.move(compactingPath(dst), dstP)
    catch { case e: Throwable => Files.move(old, dstP); throw e }
    deleteTree(old)
  }
}
