ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "globallinksspark"
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
// The bench/verify driver scrapes the LAST ~2000 chars of stdout for a
// bare one-line JSON. sbt's default LoggedOutput re-emits the forked
// process's stdout as "[info] ..." lines, and that prefix has defeated
// the driver's parse in every round (BENCH_r*.json: parsed=null since
// r01). StdoutOutput hands the forked JVM sbt's own stdout/stderr
// directly — the JSON line lands unprefixed; Spark's log4j chatter
// stays on stderr either way.
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
  // local[32] packs 32 executor threads into ONE JVM: at the old 8g
  // default each task saw ~145MB of execution memory and mid-size
  // sorts/aggregates spilled (q29's candidate stage: 10GB of memory
  // spill on ~1GB of shuffle input). 32g = 1GB/core — the floor any
  // real executor would get — while leaving ~90GB of this box for the
  // OS page cache (the sf100 lesson: heap must not starve the cache).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
