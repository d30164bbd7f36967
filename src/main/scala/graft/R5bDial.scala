package graft

import org.apache.spark.sql.SparkSession

/** Run-and-record cost harness for r5b's inherited blocking dial (r10):
  * times `r5b_find_similar_blocked` at each `bitsxbands` setting. Cost
  * only — r5b's RECALL is measured against r5 at driver scales
  * (FindSimilarBlockedSpec) where the brute-force reference is runnable;
  * at scaled corpora r5 itself is the quadratic that cannot run, which
  * is the point of the scale path. Results land in PLANS.md §r5b-sf10.
  *
  * Usage: `sbt "runMain graft.R5bDial [sfDir] [settingsCsv]"` — settings
  * like `10x4,12x4` (d5's dial grammar). Default /root/testdata/sf0.1, 4x4.
  */
object R5bDial {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val settings = args.lift(1).getOrElse("4x4").split(',').map(_.trim).map { tok =>
      val Array(b, n) = tok.split('x'); (b.toInt, n.toInt)
    }.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    settings.foreach { case (b, n) =>
      def run(): (Long, Double) = {
        val s0 = System.nanoTime()
        val c = graft.rag.Search
          .r5bFindSimilarBlocked(spark, sfDir, bitsPerBand = b, bands = n).count()
        (c, (System.nanoTime() - s0) / 1e9)
      }
      run() // warm codegen for this tensor width
      val (rows, sec) = run()
      println(s"""{"harness":"r5b_dial","bits_per_band":$b,"bands":$n,"rows_out":$rows,"sec":${fmt(sec)}}""")
    }
    spark.stop()
  }
}
