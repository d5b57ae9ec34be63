ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "experimentalspark"
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
// Pass the forked program's stdout through UNTOUCHED: sbt's default logged
// output prefixes every line with "[info] ", which made the driver unable
// to machine-parse graft.Bench's single JSON result line (BENCH_r01.json
// recorded "parsed": null). StdoutOutput writes the child's streams straight
// to this process's stdout/stderr.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and drop the trailing "[success] Total time" line so the forked
// program's JSON line is the LAST thing on stdout.
ThisBuild / showSuccess := false
Global / excludeLintKeys += Compile / runMain / outputStrategy
Global / excludeLintKeys += ThisBuild / showSuccess
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
// forward builder-iteration knobs (-Dgraft.*) from the sbt JVM to the
// forked run JVM: `run / fork := true` means command-line -D flags land in
// sbt's own JVM and would otherwise silently not reach graft.Bench & co.
javaOptions ++= sys.props.toSeq.collect { case (k, v) if k.startsWith("graft.") => s"-D$k=$v" }
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] needs headroom: 8g heap GC-binds the 32-thread runs
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
