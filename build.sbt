ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "chesspipelinespark"
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
// The bench/verify contract: the harness parses the LAST ~2000 chars of
// stdout for one bare JSON line. With fork=true sbt's default
// outputStrategy PIPES the forked JVM's stdout through its logger, which
// prefixes every line `[info] ` — including writes straight to file
// descriptor 1 — so the line never reached the parser bare (rounds
// 14-16: "parsed": null). StdoutOutput makes the forked process INHERIT
// sbt's own stdout/stderr: app output passes through unprefixed.
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
  // keep the repo root clean (VERDICT r13 #7): Derby's error log and the
  // default ./spark-warehouse both land in CWD otherwise (the Derby DBs
  // themselves are all jdbc:derby:memory: — only the log touches disk)
  "-Dderby.stream.error.file=target/derby.log",
  "-Dspark.sql.warehouse.dir=target/spark-warehouse",
  // 48g default: the box has 128 GiB. At 16g the 95-query bench showed
  // suite-POSITION inflation — late-suite queries (the DSIR family) ran
  // 30-50% slower in-suite than isolated (q73 2.56s vs 1.67s) from
  // accumulated GC pressure across ~300 query executions; 48g restores
  // in-suite timings to their isolated values (r8 A/B in SCALE.md).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
