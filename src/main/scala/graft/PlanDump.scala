package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: write `explain("formatted")` of named queries to
  * `<outDir>/<query>_<tag>.txt` — the r17 optimization round's
  * before/after plan evidence (judge deliverable). Session config matches
  * Bench (32 shuffle partitions, UTC, untruncated metadata) so the dumped
  * plans are the plans the bench times.
  *
  * `runMain graft.PlanDump <q1,q2,...|all> <outDir> <tag> [sfDir]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spec = args(0)
    val outDir = args(1)
    val tag = args(2)
    val dir = if (args.length > 3) args(3)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxMetadataStringLength", "100000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (spec == "all") SparkEntry.queries.keys.toSeq.sorted
      else spec.split(',').toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
          txt.getBytes("UTF-8")): Unit
        println(s"[plandump] $n -> $outDir/${n}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    spark.stop()
  }
}
