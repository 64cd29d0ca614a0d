package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage probe for t07 (test scope — not shipped). */
object T07Probe {
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

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = graft.analytics.Tables.documents(spark, sfDir)
    time("docs.count")(docs.count())
    val grams = docs.select(col("doc_id"), col("lang"),
      explode(graft.functions.CharTrigrams.char_trigrams(lower(col("text")))).as("gram"))
    time("grams.count #1")(grams.count())
    time("grams.count #2")(grams.count())
    val byLang = grams.groupBy("lang", "gram").agg(count(lit(1)).as("n"))
    time("byLang.count #1")(byLang.count())
    time("byLang.count #2")(byLang.count())
    val profile = graft.analytics.LangId.fit(docs)
    time("fit.collect #1")(profile.collect())
    time("fit.collect #2")(profile.collect())
    val full = graft.analytics.LangId.t07NgramLangId(spark, sfDir)
    time("t07 full #1")(full.count())
    time("t07 full #2")(graft.analytics.LangId.t07NgramLangId(spark, sfDir).count())
    spark.stop()
  }
}
