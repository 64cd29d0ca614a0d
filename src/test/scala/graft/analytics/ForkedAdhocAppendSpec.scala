package graft.analytics

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Cross-process ad-hoc append safety (r14 verdict item 7 / ADVICE):
  * un-generationed appends draw generations that can never collide
  * across LIVE processes (pid-folded bases) nor with a DEAD process's
  * published files (the layout check-and-bump), so concurrent ad-hoc
  * appends ACCUMULATE — publishGeneration's prefix sweep, which is
  * the replay contract for explicit generations, never fires across
  * owners. */
class ForkedAdhocAppendSpec extends AnyFunSuite {

  private def publishedFiles(out: String): Seq[String] =
    Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("gen")).toSeq

  test("two concurrent JVMs' un-generationed appends accumulate — no sweep across owners") {
    val out = graft.core.TempDirs.create("graft-adhoc-fork").resolve("layout").toString
    Files.createDirectories(Paths.get(out))
    val (procs, appends) = (2, 5)
    // classpath: graft test+main classes, scala stdlib, spark jars
    // (Similarity's signatures reference Spark types)
    val cp = (Seq(AdhocGenWorker.getClass, Similarity.getClass,
        classOf[scala.Function1[_, _]])
      .map(_.getProtectionDomain.getCodeSource.getLocation.getPath)
      .distinct ++ Seq("/opt/spark/jars/*"))
      .mkString(java.io.File.pathSeparator)
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val running = (0 until procs).map { _ =>
      new ProcessBuilder(javaBin, "-cp", cp, "graft.analytics.AdhocGenWorker",
        out, appends.toString)
        .redirectErrorStream(true).start()
    }
    running.foreach { p =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), "worker timed out")
      val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.exitValue() == 0, s"worker failed: $log")
    }
    val files = publishedFiles(out)
    assert(files.size == procs * appends,
      s"expected ${procs * appends} accumulated gen-files, got ${files.size}: $files")
    // every publish landed under a DISTINCT generation prefix
    val gens = files.map(_.takeWhile(_ != '-'))
    assert(gens.distinct.size == gens.size, s"generation collision: $files")
  }

  test("a stale published generation is skipped, never swept") {
    val out = graft.core.TempDirs.create("graft-adhoc-stale").resolve("layout").toString
    Files.createDirectories(Paths.get(out))
    val g1 = Similarity.nextAdhocGen(out)
    // simulate a dead process (reused pid / crashed maintainer) that
    // already published THIS process's next candidate generation
    Files.writeString(Paths.get(out, s"gen${g1 + 1}-part-stale"), "stale")
    graft.core.SegmentedIndex.publishGeneration(out, g1) { stage =>
      Files.createDirectories(Paths.get(stage))
      Files.writeString(Paths.get(stage, "part-a"), "a"); ()
    }
    val g2 = Similarity.nextAdhocGen(out)
    // parallel suites share the per-process counter, so pin only what
    // matters: the stale generation is never reused
    assert(g2 != g1 + 1 && g2 > g1,
      s"expected the stale gen ${g1 + 1} skipped, got $g2")
    graft.core.SegmentedIndex.publishGeneration(out, g2) { stage =>
      Files.createDirectories(Paths.get(stage))
      Files.writeString(Paths.get(stage, "part-b"), "b"); ()
    }
    val files = publishedFiles(out).sorted
    assert(files.exists(_.startsWith(s"gen${g1 + 1}-part-stale")),
      s"the stale generation's file was swept: $files")
    assert(files.size == 3, s"expected 3 files (stale + 2 appends): $files")
  }
}
