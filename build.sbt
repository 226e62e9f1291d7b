ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prestotrufflespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession and several (PlanSpec, BucketingSpec,
// CosineSimSpec) toggle session confs (AQE, broadcast threshold) around
// plan assertions — parallel suite execution races those toggles.
Test / parallelExecution := false
run / fork := true
// Forked run output passes straight through to stdout, NOT via sbt's
// logger — the driver parses graft.Bench's one-line JSON from stdout and
// the default LoggedOutput "[info] " prefix made it unparseable
// (BENCH_r01/r02 "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress sbt's trailing "[success] Total time: ..." line: the driver
// parses the LAST 2000 stdout chars, and Bench's final compact JSON line
// (all 106 per-key minima, VERDICT r8 item 4) needs nearly that whole
// window — the ~75-char epilogue after it would push the line's head out.
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
