package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed partition-
  * wise. The real pipeline shape is:
  *
  *   binary payload + metadata struct
  *     → mapPartitions batch decode (stubbed here: the container ships
  *       no image/audio codecs, so decode is a deterministic fake that
  *       derives "features" from the bytes; the Spark-side plumbing —
  *       schema, batching, partitioning, explode of per-frame rows —
  *       is real)
  *     → per-frame/feature rows for downstream dedup/similarity.
  *
  * Since the synthetic testdata has no binary table, payloads are
  * manufactured from `documents.text` (UTF-8 bytes) — the pipeline is
  * identical for real blobs.
  */
object Multimodal {

  /** documents → (doc_id, source, payload: binary, meta struct).
    * At scale this is `spark.read.format("binaryFile")` or a parquet
    * table with a binary column. */
  def blobTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("lang").as("content_lang"),
        col("n_chars").as("content_chars")).as("meta"))

  /** Blob metadata extraction — byte length + magic sniff, all
    * codegen'd column functions, no UDF. */
  def m01BlobMeta(spark: SparkSession, dir: String): DataFrame =
    blobTable(spark, dir)
      .select(col("source"), length(col("payload")).cast("bigint").as("n_bytes"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_blobs"),
           sum("n_bytes").as("total_bytes"),
           max("n_bytes").as("max_bytes"))
      .orderBy("source")

  final case class Frame(doc_id: Long, frame_id: Int, offset: Int,
                         feature: Double, checksum: Long)

  /** Partition-wise "frame sampling": every blob yields one frame per
    * `frameBytes` window with a stub feature (mean byte value) and a
    * rolling checksum. Stand-in for image decode / video frame-sample /
    * audio windowing — swap `decodeWindow` for a real codec; the
    * mapPartitions batching and the output schema stay. */
  def m02FrameSample(spark: SparkSession, dir: String, frameBytes: Int = 64): DataFrame = {
    import spark.implicits._
    val blobs = blobTable(spark, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]

    def decodeWindow(bytes: Array[Byte], from: Int, until: Int): (Double, Long) = {
      var sum = 0L; var crc = 1L
      var i = from
      while (i < until) { sum += (bytes(i) & 0xFF); crc = crc * 31 + (bytes(i) & 0xFF); i += 1 }
      (sum.toDouble / (until - from), crc)
    }

    blobs.mapPartitions { it =>
      it.flatMap { case (docId, bytes) =>
        val n = math.max(1, (bytes.length + frameBytes - 1) / frameBytes)
        (0 until n).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(bytes.length, from + frameBytes)
          val (feat, crc) = decodeWindow(bytes, from, math.max(until, from + 1))
          Frame(docId, f, from, math.rint(feat * 100) / 100, crc)
        }
      }
    }.toDF()
  }

  /** Frame-level rollup: frames per doc + mean feature per source —
    * exercises the decode path end-to-end. */
  def m02FrameStats(spark: SparkSession, dir: String): DataFrame = {
    val frames = m02FrameSample(spark, dir)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    frames.join(broadcast(docs), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_frames"),
           round(avg("feature"), 2).as("avg_feature"))
      .orderBy("source")
  }

  final case class Thumb(doc_id: Long, orig_bytes: Int, thumb_bytes: Int,
                         checksum: Long)

  /** Partition-wise "resize": downsample each blob by `factor` (every
    * k-th byte — the stub stand-in for image resize; swap the inner
    * loop for a real scaler, the batching and schema stay). */
  def m03Resize(spark: SparkSession, dir: String, factor: Int = 8): DataFrame = {
    import spark.implicits._
    blobTable(spark, dir).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (docId, bytes) =>
          val thumb = bytes.indices.collect { case i if i % factor == 0 => bytes(i) }.toArray
          var crc = 1L
          thumb.foreach(b => crc = crc * 31 + (b & 0xFF))
          Thumb(docId, bytes.length, thumb.length, crc)
        }
      }.toDF()
  }

  /** Resize rollup per source: exercises the stub scaler end-to-end. */
  def m03ResizeStats(spark: SparkSession, dir: String): DataFrame = {
    val thumbs = m03Resize(spark, dir)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    thumbs.join(broadcast(docs), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_blobs"),
           sum("orig_bytes").as("total_orig"),
           sum("thumb_bytes").as("total_thumb"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_blob_meta"    -> m01BlobMeta _,
    "m02_frame_stats"  -> m02FrameStats _,
    "m03_resize_stats" -> m03ResizeStats _,
  )

  /** m01 is byte-exact SQL (UTF-8 length); m02's stub decode is
    * Spark-side only → rows-only check. */
  val oracleSql: Map[String, String] = Map(
    "m01_blob_meta" ->
      """SELECT source, count(*) AS n_blobs,
         CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
         FROM documents GROUP BY source ORDER BY source""",
  )
}
