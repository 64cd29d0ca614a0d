package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SparkTestSession

/** Direct coverage of the shared segmented-index lifecycle (its owners
  * — postings, IVF corpus, image append-log — pin their own semantics
  * end-to-end in PostingsSpec/IvfAppendSpec/IncrementalIndexSpec; this
  * spec pins the helper's contracts in isolation). */
class SegmentedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshLayout(): String = {
    import spark.implicits._
    val out = TempDirs.create("graft-segidx-spec").resolve("idx").toString
    Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L))
      .toDF("id", "payload", "gen").write.parquet(out)
    out
  }

  test("gen-scoped tombstone suppresses at-or-below generations; higher re-append is live") {
    import spark.implicits._
    val out = freshLayout()
    SegmentedIndex.tombstone(Seq(2L).toDF("id"), out, uptoGen = Some(0L))
    def liveIds() = SegmentedIndex.live(spark, spark.read.parquet(out), out,
      keyCol = "id", genCol = Some("gen")).select("id").as[Long].collect().sorted.toSeq
    assert(liveIds() == Seq(1L, 3L))
    // re-append the same id at a HIGHER generation: live immediately,
    // no compaction in between
    Seq((2L, "b2", 1L)).toDF("id", "payload", "gen")
      .write.mode("append").parquet(out)
    assert(liveIds() == Seq(1L, 2L, 3L))
  }

  test("plain tombstone suppresses every generation; double delete folds") {
    import spark.implicits._
    val out = freshLayout()
    Seq((3L, "c9", 9L)).toDF("id", "payload", "gen")
      .write.mode("append").parquet(out)
    SegmentedIndex.tombstone(Seq(3L).toDF("id"), out, uptoGen = None)
    SegmentedIndex.tombstone(Seq(3L).toDF("id"), out, uptoGen = None)
    val live = SegmentedIndex.live(spark, spark.read.parquet(out), out,
      keyCol = "id", genCol = None)
    assert(live.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("compactWith applies tombstones physically, clears them, carries other sidecars") {
    import spark.implicits._
    val out = freshLayout()
    // a non-tombstone sidecar that must survive the rewrite verbatim
    Seq(("meta", 7L)).toDF("k", "v").write.parquet(s"$out/_side")
    SegmentedIndex.tombstone(Seq(1L).toDF("id"), out, uptoGen = Some(Long.MaxValue))
    SegmentedIndex.compactWith(out) { tmp =>
      SegmentedIndex.live(spark, spark.read.parquet(out), out,
          keyCol = "id", genCol = Some("gen"))
        .write.mode("overwrite").parquet(tmp)
    }
    assert(!Files.isDirectory(Paths.get(out, "_tombstones")),
      "compaction must clear the applied tombstones (the epoch boundary)")
    assert(spark.read.parquet(s"$out/_side").as[(String, Long)].collect().toSeq
      == Seq(("meta", 7L)))
    // physical: no tombstone sidecar left, yet the row is gone
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      == Seq(2L, 3L))
    // post-epoch re-append of the compacted-away id is live again
    Seq((1L, "a2", 5L)).toDF("id", "payload", "gen")
      .write.mode("append").parquet(out)
    assert(SegmentedIndex.live(spark, spark.read.parquet(out), out,
        keyCol = "id", genCol = Some("gen"))
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("resolveNewest: newest generation wins, rm deletes") {
    import spark.implicits._
    val log = Seq(
      (1L, "h1", 0L, "put"),
      (1L, "h2", 2L, "put"),   // newest put wins
      (2L, "h3", 0L, "put"),
      (2L, "",   1L, "rm"),    // newest is rm → deleted
      (3L, "h4", 1L, "put"),
      (3L, "h5", 0L, "put"))   // older put loses
      .toDF("id", "h", "gen", "op")
    val got = SegmentedIndex.resolveNewest(log, "id", "gen", "op")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "h2"), (3L, "h4")))
  }
}
