package graft

import org.apache.spark.sql.SparkSession

import graft.analytics.Similarity

/** Dev-only recall probe (test scope — not shipped): measures each
  * approximate ANN method's recall@10 against the exact brute-force
  * baseline on the gate query set at a given SF — the source of the
  * README recall table.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.RecallProbe"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().toSeq.groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap

    val exact = sets(Similarity.s01BruteForceTopK(spark, dir))
    spark.catalog.clearCache()
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ex) =>
        approx.get(q).map(_.intersect(ex).size.toDouble / ex.size).getOrElse(0.0) }
      per.sum / per.size
    }
    println(f"[recall] queries=${exact.size} corpus_dir=$dir")
    for ((name, fn) <- Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
        ("lsh", Similarity.s02LshTopK), ("ivf", Similarity.s03IvfTopK),
        ("ivfpq", Similarity.s04IvfPqTopK))) {
      val t0 = System.nanoTime()
      val r = recall(sets(fn(spark, dir)))
      println(f"[recall] $name%-6s recall@10=$r%.3f  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
