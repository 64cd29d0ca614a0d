package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev harness: run one named SparkEntry query and print every Spark
  * job it launched — duration, stage/task counts, and the call site —
  * plus the wall-clock share spent OUTSIDE jobs (driver-side planning,
  * file listing, commit). The r17 cost receipts showed warm gate time
  * tracks job count (~80-100 ms fixed cost per job at sf0.1); this
  * names the jobs so the count can be cut where it is structural.
  *
  * Usage: runMain graft.tools.JobProfile <name> [sfDir] [passes]
  */
object JobProfile {
  private final case class JobRow(id: Int, t0: Long, var t1: Long,
                                  site: String, desc: String)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // ad-hoc conf experiments: JOBPROF_CONF="k=v;k=v"
    val extra = sys.env.getOrElse("JOBPROF_CONF", "")
      .split(";").map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
    val spark = extra.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")) { case (b, (k, v)) => b.config(k, v) }
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        (!sys.env.contains("JOBPROF_NOAQE")).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // profiling-only workaround: Spark 4.1's UnionBase.rewriteConstraints
      // can throw key-not-found on self-union plans when the standalone
      // run's low exprIds collide (p14 trips it here; the bench's gate
      // ordering never does). Constraint propagation off keeps the gate
      // runnable in isolation without touching the product session.
      .config("spark.sql.constraintPropagation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = new ConcurrentLinkedQueue[JobRow]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    // executionId → first graft frame of the SQL execution's call site
    val execSite = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    def graftFrame(stack: String): Option[String] = stack
      .split('\n').find(l => l.contains("graft.") && !l.contains("graft.tools"))
      .map(_.trim.stripPrefix("at ").takeWhile(_ != '('))
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execSite.put(s.executionId,
              graftFrame(s.details).getOrElse("sql:" + s.description.take(40))); ()
          case _ => ()
        }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val fromStage = e.stageInfos.headOption.map(_.details).getOrElse("")
        val execId = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
        val site = graftFrame(fromStage)
          .orElse(execId.flatMap(id => Option(execSite.get(id.toLong))))
          .getOrElse("?")
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val r = JobRow(e.jobId, System.nanoTime(), 0L, site, desc)
        rows.add(r); byId.put(e.jobId, r); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = byId.get(e.jobId)
        if (r != null) r.t1 = System.nanoTime()
        ()
      }
    })
    name.split(",").map(_.trim).filter(_.nonEmpty).foreach { nm =>
      profileOne(spark, nm, sfDir, passes, rows, byId)
    }
    spark.stop()
  }

  private def profileOne(spark: SparkSession, name: String, sfDir: String,
                         passes: Int, rows: ConcurrentLinkedQueue[JobRow],
                         byId: java.util.concurrent.ConcurrentHashMap[Int, JobRow]): Unit = {
    val fn = graft.SparkEntry.queries(name)
    // gap attribution: sample the main thread every 20 ms during the
    // last pass; frames where the driver sits between jobs (planning,
    // file listing, commit renames, footer reads) dominate the histogram
    val mainThread = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          val frame = st.find { f =>
            val c = f.getClassName
            (c.startsWith("org.apache.spark") || c.startsWith("graft.") ||
              c.startsWith("org.apache.hadoop") || c.startsWith("java.io") ||
              c.startsWith("java.nio") || c.startsWith("sun.nio")) &&
              !c.contains("JobProfile")
          }.map(f => f.getClassName.split('.').takeRight(2).mkString(".") + "." + f.getMethodName)
            .getOrElse(st.drop(2).headOption.map(_.toString.takeWhile(_ != '(')).getOrElse("?"))
          hist.merge(frame, 1, (a, b) => a + b)
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    (1 to passes).foreach { i =>
      rows.clear(); byId.clear()
      if (i == passes) { hist.clear(); sampling = true }
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      sampling = false
      org.apache.spark.graftdiag.BusDiag.waitUntilEmpty(spark.sparkContext)
      spark.catalog.clearCache()
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq.sortBy(_.t0)
      val jobSecs = rs.map(r => if (r.t1 > r.t0) (r.t1 - r.t0) / 1e9 else 0.0)
      println(f"[jobprofile] $name pass $i: total $dt%.3f s rows=$n jobs=${rs.size} " +
        f"in-job ${jobSecs.sum}%.3f s gaps ${dt - jobSecs.sum}%.3f s")
      if (i == passes) {
        rs.zip(jobSecs).foreach { case (r, s) =>
          val off = (r.t0 - t0) / 1e9
          println(f"[job] +$off%7.3f ${s}%7.3f s  id=${r.id}%4d  ${r.site}%-40s ${r.desc.take(60)}")
        }
        // top sites by total time
        println("[jobprofile] by call site:")
        rs.zip(jobSecs).groupBy(_._1.site).view
          .mapValues(g => (g.size, g.map(_._2).sum)).toSeq
          .sortBy(-_._2._2)
          .foreach { case (site, (n2, s)) =>
            println(f"[site] $name $s%8.3f s  n=$n2%4d  $site")
          }
        // main-thread sample histogram (20 ms ticks) for the pass
        import scala.jdk.CollectionConverters._
        hist.asScala.toSeq.sortBy(-_._2.intValue).take(25).foreach { case (f, c) =>
          println(f"[mainthread] $name ${c.intValue * 0.02}%7.2f s  $f")
        }
      }
    }
  }
}
