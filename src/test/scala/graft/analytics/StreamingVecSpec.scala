package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** Streaming vector ingest (st09): assignment is per-row against a
  * static quantizer and the count state is commutative, so the stream
  * must agree exactly with the batch assignment and be invariant to
  * arrival slicing. */
class StreamingVecSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def batchCells(): Seq[Seq[Any]] = {
    val (assigned, _) = Similarity.ivfFit(spark, dir)
    val out = assigned
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("first_vec"))
      .orderBy("cell")
      .collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    out
  }

  test("streamed cell counts equal the batch assignment exactly") {
    val streamed = StreamingQueries.st09StreamVectorIngest(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = batchCells()
    assert(batch.nonEmpty && streamed == batch)
  }

  test("trickled multi-file arrival equals the one-shot result") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-vec")
    val staging = s"$tmp/staging"
    spark.read.parquet(s"$dir/embeddings.parquet").repartition(3)
      .write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    assert(parts.length == 3)
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("embeddings.parquet"))
    }
    val trickled = EventStream.runToCompletion(spark,
        StreamingQueries.vectorIngestStream(_, s"$tmp/split*", dir, Some(1)),
        "spec_trickle_vec")
      .orderBy("cell").collect().map(_.toSeq).toSeq
    val oneShot = StreamingQueries.st09StreamVectorIngest(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)
  }
}
