package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** Snapshot-CDC contracts (d14 batch, st18 streaming):
  *  - the planted mutations come back exactly (every %10==7 doc
  *    deleted, every %10==3 changed, every %10==0 mirrored as added);
  *  - the streamed diff equals the batch diff bit for bit;
  *  - microbatch slicing doesn't move the result (hashes are
  *    stateless, the doc_id-keyed state is slicing-invariant). */
class CdcSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("d14 recovers exactly the planted adds/deletes/changes") {
    val docs = Tables.documents(spark, dir)
    val n = (r: Long) => docs.filter(col("doc_id") % 10 === r).count()
    val byType = Dedup.d14SnapshotCdc(spark, dir)
      .groupBy("change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("deleted", 0L) == n(7))
    assert(byType.getOrElse("changed", 0L) == n(3))
    assert(byType.getOrElse("added", 0L) == n(0))
    // changed rows carry both hashes, added/deleted exactly one
    val rows = Dedup.d14SnapshotCdc(spark, dir).collect()
    assert(rows.forall { r =>
      (r.getString(1), r.getString(2).nonEmpty, r.getString(3).nonEmpty) match {
        case ("added", o, nw)   => !o && nw
        case ("deleted", o, nw) => o && !nw
        case ("changed", o, nw) => o && nw && r.getString(2) != r.getString(3)
        case _ => false
      }
    })
  }

  test("d14 hashes before the join: no text column crosses the shuffle") {
    val plan = Dedup.d14SnapshotCdc(spark, dir)
      .queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"diff did not plan as a keyed join:\n$plan")
    // md5 must be computed BELOW the join (appearing only after the
    // join node in the top-down plan text), so the shuffle carries
    // (id, hash) rows, never document text
    assert(!plan.substring(0, joinIdx).contains("md5("),
      s"md5 computed above the join — text crossed the shuffle:\n$plan")
  }

  test("d15 applies the diff: merge(A, changes) reproduces snapshot B exactly") {
    val merged = Dedup.d15CdcApply(spark, dir).collect().map(_.toSeq).toSeq
    val b = Dedup.cdcSnapshotB(Tables.documents(spark, dir))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(merged.nonEmpty && merged == b)
  }

  test("st18 streamed diff equals the d14 batch diff") {
    val batch = Dedup.d14SnapshotCdc(spark, dir).collect().map(_.toSeq).toSeq
    val streamed = StreamingQueries.st18StreamCdc(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty && streamed == batch)
  }

  test("trickled multi-file arrival equals the one-shot result") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-cdc")
    val staging = s"$tmp/staging"
    spark.read.parquet(s"$dir/documents.parquet").repartition(3)
      .write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("documents.parquet"))
    }
    val snapshot = EventStream.runToCompletion(spark,
      StreamingQueries.cdcStream(_, s"$tmp/split*", Some(1)), "spec_trickle_cdc")
    val a = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("old_md5"))
    val trickled = Dedup.cdcDiff(a, snapshot).collect().map(_.toSeq).toSeq
    val oneShot = Dedup.d14SnapshotCdc(spark, dir).collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)
  }
}
