ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "opensourceetlspark"
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
// Raw (unwrapped) stdout for forked runs: the driver greps/parses the
// Bench JSON line from captured output, and sbt's default LoggedOutput
// prefixes every line with "[info] ", which breaks json.loads on it.
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
  // 32 local executor threads churning gram/hash strings need real
  // heap headroom — at 8g the text/vector tail queries spent their
  // variance (3-17 s run-to-run) in GC, not compute. (A ~20 s stall
  // hitting ONE random query per bench run was measured identical
  // under G1 and ZGC — host-level scheduling, not GC; treat single-
  // query outliers in bench output accordingly.)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // ~185 queries × 3 passes of whole-stage codegen overflow the
  // 240 MB default JIT code cache; once full, C2 stops compiling and
  // the bench tail runs interpreted — measured as a systematic 2-3×
  // in-suite inflation vs isolated timing of the SAME query (r7:
  // q136 2.88 s in-suite vs 0.83 s isolated). Codegen'd methods also
  // churn (one class per plan), so keep flushing on but give the
  // cache real headroom.
  "-XX:ReservedCodeCacheSize=1g",
)
