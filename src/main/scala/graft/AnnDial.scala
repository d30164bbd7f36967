package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Run-and-record harness for the IVF nlists/nprobe dial (r10 — the
  * D5Dial contract applied to the a-family): times `a2_knn_ivf` at each
  * `nlistsxnprobe` setting and measures recall@10 against the brute-force
  * top-10 ground truth for the same query set. The cold run pays the
  * per-dial list-table build ([[graft.ann.Ann]] ivfListTable) and is
  * reported separately — "build once, probe forever" — so the steady
  * number is probe cost only. Results land in PLANS.md §ivf-dial.
  *
  * Usage: `sbt "runMain graft.AnnDial [sfDir] [settingsCsv]"` — each
  * setting is `nlistsxnprobe` (e.g. `64x3`). Defaults /root/testdata/sf0.1
  * and 8x3,32x3,128x3. Emits one JSON line per setting plus a truth line.
  */
object AnnDial {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val settings = args.lift(1).getOrElse("8x3,32x3,128x3")
      .split(',').map(_.trim).map { tok =>
        val Array(l, p) = tok.split('x'); (l.toInt, p.toInt)
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

    // Ground truth: exact brute-force top-10 for the dial's query set
    // (every vec_id % 101 — the a2/a3 convention). localCheckpoint(true)
    // is eager, so the brute join is paid inside the timed block.
    val t0 = System.nanoTime()
    val truth = graft.rag.Search.knn(spark, sfDir, col("vec_id") % 101 === 0,
        k = 10, threshold = -1.0, clampZero = false, sameLabel = false)
      .select(col("query_id"), col("vec_id"))
      .localCheckpoint(true)
    val nTruth = truth.count()
    println(s"""{"harness":"ivf_dial","sf":"${sfDir.split('/').last}","truth_rows":$nTruth,"brute_sec":${fmt((System.nanoTime() - t0) / 1e9)}}""")

    settings.foreach { case (l, p) =>
      def run(): (Long, Double) = {
        val s0 = System.nanoTime()
        val n = graft.ann.Ann.a2KnnIvf(spark, sfDir, nlists = l, nprobe = p).count()
        (n, (System.nanoTime() - s0) / 1e9)
      }
      val (_, coldSec) = run() // pays this dial's list-table build
      val (nOut, sec) = run()
      val caught = graft.ann.Ann.a2KnnIvf(spark, sfDir, nlists = l, nprobe = p)
        .join(truth, Seq("query_id", "vec_id")).count()
      val recall = if (nTruth == 0) -1.0 else caught.toDouble / nTruth
      println(s"""{"harness":"ivf_dial","nlists":$l,"nprobe":$p,"rows_out":$nOut,"recall":${fmt(recall)},"cold_sec":${fmt(coldSec)},"sec":${fmt(sec)}}""")
    }
    spark.stop()
  }
}
