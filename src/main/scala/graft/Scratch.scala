package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules", SparkTuning.ExcludedOptimizerRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.catalog.clearCache()
    }

    import graft.analytics.{Tables, Dedup}
    // warmup
    Tables.documents(spark, dir).count()

    val docs = Tables.documents(spark, dir)
    val tokens = split(trim(col("text")), "\\s+")
    def shingles(t: org.apache.spark.sql.Column) =
      array_distinct(transform(
        sequence(lit(1), greatest(size(t) - 2, lit(0))),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))

    val sh = docs.select(col("doc_id"), tokens.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), shingles(col("t")).as("s"))

    time("docs scan")(docs.count())
    time("tokenize only")(docs.select(col("doc_id"), tokens.as("t")).select(sum(size(col("t")))).count())
    time("shingles scan")(sh.select(sum(size(col("s")))).count())
    sh.select(explode(col("s"))).explain(true)
    time("explode count")(sh.select(explode(col("s"))).count())

    val inv = sh.select(col("doc_id"), size(col("s")).cast("long").as("n_sh"), explode(col("s")).as("shingle"))
    time("postings groupBy")(
      inv.groupBy("shingle").agg(count(lit(1))).count())
    time("postings collect_list")(
      inv.groupBy("shingle").agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh"))))).count())
    time("d01 full")(Dedup.d01NgramJaccardPairs(spark, dir).count())

    // d02 pieces
    {
      val spark2 = spark
      import spark2.implicits._
      val sigs = sh.select(col("doc_id"), explode(col("s")).as("shingle"))
        .as[(Long, String)]
        .groupByKey(_._1)
        .agg(graft.functions.MinHashAgg.toColumn.name("sig"))
        .toDF("doc_id", "sig")
      time("d02 sigs (MinHashAgg)")(sigs.count())
      val sigsAlt = sh.select(col("doc_id"), explode(col("s")).as("shingle"))
        .groupBy("doc_id")
        .agg(array((0 until 64).map(i => min(xxhash64(col("shingle"), lit(i)))): _*).as("sig"))
      time("d02 sigs (64x min)")(sigsAlt.count())
    }
    time("d02 full")(Dedup.d02MinHashPairs(spark, dir).count())

    spark.stop()
  }
}
