ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "eirepoliticdatapipelinespark"
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
  // the container JVM defaults to ASCII; Spark's variant builder round-trips
  // strings through the platform charset, so UTF-8 must be pinned
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  // local[32] with 600k-row collect_list aggregations needs headroom —
  // 8g put the bench into GC (q48 50s → ~18s at 48g). Default 48g only when
  // the host can actually back it (≥96 GiB physical); otherwise a portable
  // 8g, overridable via SPARK_DRIVER_MEM. Xms pinned: growing the heap under
  // allocation storms caused multi-second GC variance between identical runs.
  s"-Xmx${Heap.default}",
  s"-Xms${Heap.default}",
)
lazy val Heap = new {
  val default: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val memKb =
      try scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          l.trim.split("\\s+")(1).toLong }
        .getOrElse(0L)
      catch { case scala.util.control.NonFatal(_) => 0L }
    if (memKb >= 96L * 1024 * 1024) "48g" else "8g"
  })
}
