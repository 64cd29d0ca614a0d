package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession
import graft.streaming.EventStream

/** The streaming near-dup monitor's state is built from commutative
  * aggregates (count, min), so its result must equal the identical
  * batch computation and be invariant to microbatch slicing. */
class StreamNeardupSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def batchRollup(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
    import graft.functions.MinHash64.minhash64
    import graft.functions.WordShingles.word_shingles
    val buckets = df
      .select(col("doc_id"), minhash64(word_shingles(col("text"))).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), explode(Dedup.bandStructs(col("sig"))).as("bb"))
      .groupBy(col("bb.band").as("band"), col("bb.bh").as("bh"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
    StreamingQueries.hotBucketRollup(buckets)
      .collect().map(_.toSeq).toSeq
  }

  test("streaming monitor equals the batch computation") {
    val batch = batchRollup(spark.read.parquet(s"$dir/documents.parquet"))
    val streamed = StreamingQueries.st07StreamNeardup(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty, "fixture has no band collisions — vacuous test")
    assert(streamed == batch)
  }

  test("trickled multi-file arrival equals the one-shot result") {
    import java.nio.file.{Files, Paths}
    val tmp = graft.core.TempDirs.create("graft-stream-neardup")
    val staging = s"$tmp/staging"
    spark.read.parquet(s"$dir/documents.parquet").repartition(3)
      .write.parquet(staging)
    val parts = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("_SUCCESS")).sorted
    assert(parts.length == 3)
    parts.zipWithIndex.foreach { case (p, i) =>
      val d = Paths.get(s"$tmp/split$i")
      Files.createDirectories(d)
      Files.move(Paths.get(p), d.resolve("documents.parquet"))
    }
    val trickled = StreamingQueries.hotBucketRollup(
      EventStream.runToCompletion(spark,
        StreamingQueries.nearDupBuckets(_, s"$tmp/split*", Some(1)),
        "spec_trickle_neardup"))
      .collect().map(_.toSeq).toSeq
    val oneShot = StreamingQueries.st07StreamNeardup(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(trickled.nonEmpty && trickled == oneShot)

    // st08 rides the same commutative-state argument (semi-join hits →
    // doc dedup → count): the trickled drive must equal one-shot too
    val st08Trickled = EventStream.runToCompletion(spark,
        StreamingQueries.decontamStream(_, s"$tmp/split*", dir, Some(1)),
        "spec_trickle_decontam")
      .orderBy("source").collect().map(_.toSeq).toSeq
    val st08OneShot = StreamingQueries.st08StreamDecontam(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(st08Trickled.nonEmpty && st08Trickled == st08OneShot)
  }
}
