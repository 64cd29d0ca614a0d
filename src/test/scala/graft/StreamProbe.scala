package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

/** Dev-only streaming-drive profiler (test scope — not shipped):
  * drives the st04 interval join once and dumps per-microbatch
  * duration breakdowns so harness overhead is attributable.
  *
  *   sbt "Test/runMain graft.StreamProbe"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStream.streamStreamJoin(s, sfDir)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("probe_st04").start()
    q.processAllAvailable()
    val tDrive = (System.nanoTime() - t0) / 1e9
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durations=${p.durationMs}")
    }
    q.stop()
    println(f"[probe] drive total: $tDrive%.2f s, sink rows=${s.table("probe_st04").count()}")
    spark.stop()
  }
}
