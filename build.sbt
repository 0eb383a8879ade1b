ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icebergrust_archivespark"
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
  // single-JVM local[32] driver+executors: the 93-query bench suite ages
  // an 8g heap badly (GC pressure grew the shared-query total ~15% as the
  // suite grew); the box has 128 GiB, so give the fork real headroom
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
  // 129-query suite × dozens of codegen units each: the JDK17 default
  // 240m reserved code cache fills mid-suite and flushing evicts warm
  // methods, so later iterations re-JIT from scratch (reserve is virtual
  // address space — committed only as used)
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODECACHE", "1g")}",
)
// forward graft.* sysprops (e.g. -Dgraft.scale.smoke.dir=...) into the
// forked test/run JVMs — sbt -D only reaches sbt's own JVM
javaOptions ++= sys.props.toSeq.collect {
  case (k, v) if k.startsWith("graft.") => s"-D$k=$v"
}
