ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dystonsegtfsdataspark"
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
// Heap sized to task concurrency (r12, guide §5: "more memory per
// concurrent task"): local[$SPARK_GRAFT_CPUS] is both driver and the
// only executor, so a FIXED 8g heap quarters per-task execution memory
// when the core count quadruples — the r11 driver measured the
// similarity battery collapsing at local[32] (q48 497 s vs 4.1 s at 8
// threads, memory-thrash signature) on a 128 GiB box whose JVM held 8g.
// Default scales at ~0.75 GB/core with an 8g floor (c8 keeps its old
// heap — the c8-vs-c32 scaling comparison stays per-core-fair) and a
// 48g cap; SPARK_DRIVER_MEM still overrides outright. The production
// analogue is sizing executor memory to executor cores — this is a
// deployment parameter, not a bench constant.
val graftHeapGb = {
  val cpus = sys.env.get("SPARK_GRAFT_CPUS")
    .flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(4)
  math.min(48, math.max(8, (cpus * 3 + 3) / 4))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${graftHeapGb}g")}",
) ++ sys.env.get("SPARK_GRAFT_JVM_FLAGS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
