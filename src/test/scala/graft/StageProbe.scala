package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage probe for d02 (test scope — not shipped). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.MinHash64.minhash64
    import graft.functions.WordShingles.word_shingles

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.analytics.Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val sh = docs.select(col("doc_id"), word_shingles(col("text")).as("s"))
    time("shingles.count")(sh.count())
    time("shingles sum sizes")(sh.select(sum(size(col("s")))).collect())
    val sigs = sh.select(col("doc_id"), minhash64(col("s")).as("sig"))
      .filter(col("sig").isNotNull)
    time("sigs.count (uncached)")(sigs.count())
    val c = sigs.cache()
    time("sigs.cache materialize")(c.count())
    val NumBands = 16; val RowsPerBand = 4
    val bandCols = (0 until NumBands).map { b =>
      val slots = (0 until RowsPerBand).map(r => element_at(col("sig"), b * RowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(slots: _*).as("bh"))
    }
    val buckets = c.select(col("doc_id"), col("sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    time("buckets.count")(buckets.count())
    val joined = buckets.as("a").join(buckets.as("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
      col("a.doc_id") < col("b.doc_id"))
    time("raw bucket join count")(joined.count())
    val cands = joined
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.sig").as("sig_i"), col("b.sig").as("sig_j"))
      .dropDuplicates("i", "j")
    time("cands.count")(cands.count())
    val full = graft.analytics.Dedup.d02MinHashPairs(spark, sfDir)
    time("full d02")(full.count())
    spark.stop()
  }
}
