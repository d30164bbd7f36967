package graft

import org.apache.spark.sql.SparkSession

/** Dev-only harness: print the formatted physical plan of any SparkEntry
  * query (`runMain graft.Scratch <queryName> [sfDir]`) — used to check
  * broadcasts, pushed filters, and codegen spans while tuning.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q3_join_agg")
    val dir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tc = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    val tBuild = (System.nanoTime() - tc) / 1e9
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[scratch] $name: $n rows, build ${tBuild}%.2f s + count ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
