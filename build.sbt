ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tradingetlspark"
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
// Scratch space (r16 optimization, guide §6): every per-run temp artifact
// — streaming checkpoints, ledger stores, staged stream chunks, shuffle
// files via spark.local.dir's java.io.tmpdir default — is throwaway
// per-invocation state, and /tmp sits on the system disk, where dirty-page
// writeback makes fsync-adjacent streaming commits bimodal (measured:
// t-family fold cells 3 s -> 16-18 s under write pressure). Prefer the
// RAM-backed tmpfs when the host has one (the local-mode analog of fast
// local NVMe scratch on a production node); SPARK_GRAFT_TMPDIR overrides,
// and hosts without /dev/shm keep the stock tmpdir.
// CAVEAT (ADVICE r16): this caps ALL Spark scratch — shuffle spill,
// streaming checkpoints — at tmpfs size (~half RAM by default, shared
// with the 8g driver heap, see SPARK_DRIVER_MEM below). A run whose spill
// exceeds that dies with ENOSPC where disk /tmp would have survived; set
// SPARK_GRAFT_TMPDIR=/tmp (or any disk path) for spill-heavy workloads.
val graftTmpDir: Option[String] = sys.env.get("SPARK_GRAFT_TMPDIR").orElse {
  if (new java.io.File("/dev/shm").isDirectory) Some("/dev/shm/graft-tmp")
  else None
}.map { d => new java.io.File(d).mkdirs(); d }
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-Duser.timezone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ graftTmpDir.map(d => s"-Djava.io.tmpdir=$d").toSeq
