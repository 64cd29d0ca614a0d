package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only pricing probe (test scope — not shipped): the r17 verdict
  * (item 5 / r18 item 6) noted m04's ×13 headline is partly
  * fixture-flattered — the synthetic corpus plants ~10 byte-identical
  * payloads, so the per-partition decode memo absorbs almost every
  * decode. This prices the decode+hash pass HONESTLY: the same
  * pipeline over a corpus where EVERY image is a distinct payload
  * (pattern key = doc_id — the memo can never hit), at 1× and REP×,
  * beside the standard shared-payload fixture shape. What remains at
  * ratio ~REP on the distinct rows is the true per-image cost (heap
  * streams, no temp files); the shared-vs-distinct gap is the memo's
  * fixture-flattered share.
  *
  *   SPARK_GRAFT_REP=10 sbt "Test/runMain graft.M04DistinctProbe"
  */
object M04DistinctProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_REP", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val baseIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).as[Long].collect().sorted
    val n = baseIds.length

    def idsTimes(k: Int) = spark
      .createDataset(0 until k flatMap (r => baseIds.map(_ + r.toLong * n)))
      .repartition(32)

    def run(tag: String, ids: org.apache.spark.sql.Dataset[Long],
            keyOf: Long => Long): Double = {
      import graft.analytics.Multimodal
      val keyed = ids.map(d => (d, keyOf(d)))
      // warm once for JIT/classload, then min-of-3 timed passes of the
      // m04 shape (encode → decode → aHash → groups) over this corpus
      def once(): Double = {
        val t0 = System.nanoTime()
        Multimodal.probeHashGroups(keyed).count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val best = (1 to 3).map(_ => once()).min
      println(f"[m04probe] $tag%-28s rows=${ids.count()}%7d best=$best%7.3f s")
      best
    }

    // shared payloads (the gate's fixture rule: 10 planted patterns)
    val s1 = run("shared_1x", idsTimes(1), _ % 10)
    val sR = run(s"shared_${rep}x", idsTimes(rep), _ % 10)
    // distinct payloads: every image unique — no memo hit anywhere
    val d1 = run("distinct_1x", idsTimes(1), identity)
    val dR = run(s"distinct_${rep}x", idsTimes(rep), identity)
    println(f"[m04probe] ratios: shared ${sR / s1}%5.2f  distinct ${dR / d1}%5.2f  " +
      f"distinct/shared at ${rep}x ${dR / sR}%5.2f")
    spark.stop()
  }
}
