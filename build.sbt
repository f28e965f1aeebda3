ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "secdbspark"
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
// Marquee 100x-density stress runs are opt-in: excluded from the `test`
// task's budget, still reachable via `testOnly graft.MarqueeStressSpec`
// (the exclusion is scoped to the test TASK, so testOnly is unaffected).
Test / test / testOptions +=
  Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Marquee")
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
  // 162 queries × whole-stage-codegen classes exhaust the default 240 MB
  // code cache late in a bench run → flush/recompile storms that inflate
  // cpu≈wall on whichever queries run last (round-10 driver artifact: the
  // 3 beyond-envelope queries were consecutive at positions 149-151).
  // Bench's queries_jit/code_cache channels measure this per run.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // A/B seam for JIT-tax experiments (round-11 verdict item 2): extra
  // JVM flags for the forked bench/test JVM, e.g.
  //   GRAFT_JVM_EXTRA="-XX:TieredStopAtLevel=1" sbt "runMain graft.Bench"
  // Unset ⇒ exactly the flag set above (the committed configuration).
  sys.env.get("GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
