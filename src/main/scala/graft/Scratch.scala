package graft

import org.apache.spark.sql.SparkSession

/** Dev-only harness: print the formatted physical plan of any SparkEntry
  * query (`runMain graft.Scratch <q1,q2,...> [sfDir]`) — used to check
  * broadcasts, pushed filters, and codegen spans while tuning. Each named
  * query runs twice in the same session (cold -> warm) so one-time costs
  * (table materialization, codegen) separate from steady-state plan cost;
  * plans print only for a single-query invocation.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q3_join_agg").split(',').toSeq
    val dir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      // rebuild the plan each run exactly like Bench: eager work inside the
      // query function (localCheckpoint barriers, index builds) must count
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name: cold ${times(0)}%.2f s, warm ${times(1)}%.2f s")
      // plan AFTER the timed runs: building the DataFrame eagerly
      // materializes the once-per-session index tables, and doing that
      // before timing would quietly strip the build cost out of "cold"
      if (names.size == 1) SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
