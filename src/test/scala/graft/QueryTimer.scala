package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (test scope — not shipped):
  *
  *   sbt "Test/runMain graft.QueryTimer d02_minhash_pairs s03_ann_ivf"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_EXPLAIN=1 to dump the formatted plan before running.
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").exists(_ == "1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (explain) df.explain("formatted")
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[timer] $name%-28s $dt%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
