ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "crowdsorsaetlspark"
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
// Pass the forked app's stdout through verbatim (no "[info] " log
// prefix) so Bench's single JSON result line stays machine-parseable,
// and drop the trailing "[success] Total time" banner.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
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
  // local[32] IS the whole cluster: one JVM hosts driver + all 32
  // executor threads + every cached/broadcast block. At ~125 queries
  // a full-suite run fit in 8g; past ~130 the suite's accumulated
  // footprint (codegen classes, broadcast/cleaner backlog) tips 8g
  // into GC thrash — measured 215s@8g vs 106s@24g for the identical
  // suite, with the slowdown concentrated in the allocation-heavy
  // dedup family. 20g keeps ample headroom on the 128 GB box;
  // override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  // ~136 queries of whole-stage codegen overflow the default 240 MB
  // JIT code cache mid-suite; when it fills, the JVM disables the
  // compiler until the sweeper catches up and a contiguous window of
  // queries runs interpreted (observed as a roving 5-20x slow block
  // that moves between otherwise-identical runs). 1g holds the whole
  // suite's compiled kernels.
  "-XX:ReservedCodeCacheSize=1g",
)
