ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "awslocalstackstreamprocessingspark"
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
// The forked run's output must reach stdout UNDECORATED: sbt's default
// output strategy routes the child's stdout through its logger, prefixing
// every line with "[info] " — which broke the driver's parse of Bench's
// one-JSON-line contract (BENCH_r01 "parsed": null). StdoutOutput pipes
// the child's stdout/stderr straight through.
run / outputStrategy := Some(StdoutOutput)
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
  // 16g default (was 8g): local[32] runs 32 concurrent task threads plus
  // the dedup family's pinned localCheckpoint blocks in ONE heap; at 8g a
  // loaded machine pushed the full-bench run into GC-bound territory
  // (BENCH_r05: q07 15x its isolated time; unreproducible at 16g or in
  // isolation). The box has 128 GiB — a real cluster would give each
  // 32-core executor far more than 8g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
