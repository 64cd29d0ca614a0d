package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-aging probe: run a fixed set of gates in a loop and print one
  * JSON line per execution with wall time plus [[graft.core.Diag]]'s
  * accumulation counters (heap, metaspace, classes, GC, JIT, threads,
  * listeners, state-store providers, codegen compiles).
  *
  * The bench's warm pass measures steady-state per-query cost, which
  * only means something if the driver reaches a steady state — this
  * tool is how a regression like "warm pass slower than cold" gets
  * localized to the counter that is still climbing (r11: per-drive
  * cloned sessions leaking `StreamingQueryListenerBus` registrations).
  *
  * Usage: runMain graft.tools.AgingProbe [reps] [gate,gate,...]
  *   SPARK_GRAFT_SF_DIR  fixture dir (default sf0.01)
  *   SPARK_GRAFT_CPUS    local[] parallelism (default 8)
  */
object AgingProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(20)
    val gates = args.drop(1).headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("st01_stream_daily", "st05_stream_enrich", "st06_stream_ingest"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    for (i <- 1 to reps; g <- gates) {
      // mirror the bench's FULL between-queries hygiene (clearCache +
      // new-RDD unpersist sweep + provider unload) so the probe
      // measures the same steady state the bench reports — gates that
      // return localCheckpoint(true) frames would otherwise pin RDD
      // blocks until GC and noise the heap counter this tool reads
      val preIds = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val n = qs(g)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!preIds.contains(id)) rdd.unpersist(false) }
      org.apache.spark.sql.graftdiag.StateShim.unloadAllProviders()
      val d = graft.core.Diag.snap(spark)
      println(s"""{"iter":$i,"gate":"$g","rows":$n,"sec":${f"$dt%.3f"},"diag":${d.json}}""")
    }
    // thread-name histogram (digits stripped → pool prefixes): names the
    // pools a leak lives in, which the count alone can't
    val hist = Thread.getAllStackTraces.keySet().toArray(Array.empty[Thread])
      .map(_.getName.replaceAll("[0-9a-f-]{8,}|[0-9]+", "#"))
      .groupBy(identity).view.mapValues(_.length).toSeq.sortBy(-_._2).take(15)
    hist.foreach { case (n, c) => println(s"""{"thread":"$n","n":$c}""") }
    org.apache.spark.graftdiag.BusDiag.listenerHistogram(spark.sparkContext)
      .foreach { case (n, c) => println(s"""{"listener":"$n","n":$c}""") }
    spark.stop()
  }
}
