package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time one named SparkEntry query repeatedly against an
  * SF dir and dump its formatted physical plan.
  *
  * Usage: runMain graft.tools.TimeQuery <name> [sfDir] [passes]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    if (sys.env.contains("TQ_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timequery] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
