ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aerovaldbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// pass the forked runMain's stdout through RAW instead of re-logging
// each line with an `[info] ` prefix: the bench's one-line metric JSON
// must reach the driver's stdout tail parseable (r17 verdict item 2 —
// `parsed: null` in every BENCH artifact since round 1)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] on a 128 GiB box: an 8g heap puts the collector under
  // pressure mid-bench (multi-MB text rows + decoded image buffers are
  // humongous objects for G1's default region size) and a full GC can
  // land on an unlucky query; 32g + 32m regions keeps pauses off the
  // per-query timings (65 gate queries now cache more intermediates
  // per pass than the 16g setting was sized for)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:+UseG1GC", "-XX:G1HeapRegionSize=32m",
)
