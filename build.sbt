ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "eventstormspark"
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
  // local[32] at sf0.1 needs real heap: 32 task threads × (parquet scan
  // buffers + shuffle + localCheckpointed signature tables + codegen
  // cache) thrash an 8g heap into GC storms (round-1 bench showed 10-30x
  // inflation on scan-shaped queries). The container has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:+UseG1GC",
)
// Forked `run` output goes straight to stdout (no `[info] ` log prefix):
// the Bench JSON line must be machine-parseable from stdout.
run / outputStrategy := Some(StdoutOutput)
// ... and nothing may trail it: sbt's "[success] Total time" line lands on
// stdout AFTER the forked main exits, so a parser that reads the last line
// (or a bounded tail) of stdout would see sbt chatter instead of the JSON.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint so the warning doesn't land on stdout.
Global / excludeLintKeys += showSuccess
// Dev diagnosis: SPARK_GRAFT_GC_LOG=/tmp/gc.log turns on GC logging.
javaOptions ++= sys.env.get("SPARK_GRAFT_GC_LOG").map(p => s"-Xlog:gc*:file=$p").toSeq
