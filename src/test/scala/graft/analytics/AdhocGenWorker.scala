package graft.analytics

/** Forked-JVM worker for the cross-process ad-hoc append proof: `n`
  * un-generationed publishes into one shared layout, each under a
  * generation drawn by [[Similarity.nextAdhocGen]] — the r14 finding
  * was exactly this shape (two JVMs seeding the same counter, the
  * second's prefix sweep silently deleting the first's rows). No
  * SparkSession: the unit under test is the generation draw + the
  * gen-named file publish, which is plain file I/O. */
object AdhocGenWorker {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val n = args(1).toInt
    for (i <- 0 until n) {
      val g = Similarity.nextAdhocGen(out)
      graft.core.SegmentedIndex.publishGeneration(out, g) { stage =>
        val p = java.nio.file.Paths.get(stage,
          s"part-${ProcessHandle.current().pid()}-$i")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, s"pid=${ProcessHandle.current().pid()} i=$i")
        ()
      }
    }
  }
}
