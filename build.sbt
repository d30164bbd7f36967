ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mcpsynapticspark"
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
// Forward forked run output verbatim (no "[info] " prefix): the bench
// driver parses graft.Bench's single JSON stdout line.
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
  // Scan-split sizing for the test corpora (r10): Spark splits parquet by
  // BYTE ranges — min(maxPartitionBytes, max(openCostInBytes, size/cores))
  // — then each split reads the row groups whose midpoint it covers. At
  // the default 128 MB / 4 MB, the small-bytes/heavy-per-row tables
  // (embeddings: 5 MB at sf1) scan as 1-2 tasks on a 32-core box, so
  // CPU-bound vector work serializes on a LAYOUT accident, and big scaled
  // facts (lineitem: 1.8 GB at sf10) get only ~14. 32 MB / 64 KB keeps
  // every scan >= cores-wide at the corpus sizes under test while leaving
  // sub-64 KB files whole. On a real cluster this is the same dial, sized
  // to executor count x memory (brief: "size maxPartitionBytes so
  // partitions fit in executor memory at the target SF").
  "-Dspark.sql.files.maxPartitionBytes=33554432",
  "-Dspark.sql.files.openCostInBytes=65536",
  // 16g (box has 128 GiB): at local[32] the 32 concurrent tasks share
  // this one heap, and the r7 driver-run saw identical-plan queries
  // blow up 10x+ in ways consistent with GC pressure under the old 8g
  // default — headroom is cheaper than a contaminated benchmark.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
