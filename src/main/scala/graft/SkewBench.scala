package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.{Ann, Pq}
import graft.functions.Vec

/** ANN probe robustness under Zipf-skewed inverted lists (r8 verdict #6).
  *
  * The driver corpus's embeddings are ~uniform over the 8 coarse lists, so
  * every probe measurement so far ran in the friendliest regime. Real
  * embedding clusters are never uniform — web-scale corpora concentrate in
  * a few dense semantic clusters — and the failure mode at 100 TB is a HOT
  * INVERTED LIST: one list holding half the corpus turns "probe nprobe/nlists
  * of the data" into "probe half the data" for every query that touches it,
  * and concentrates that work wherever the hot list's rows land.
  *
  * This bench materializes a skewed VARIANT of the real corpus (same ids,
  * labels, dim, norms ~1): each non-centroid vector is pulled toward a
  * Zipf(2)-drawn target centroid (85% target direction + 15% original), so
  * nearest-centroid assignment follows the Zipf draw — list 0 owns ~65% of
  * the corpus — while vectors stay full-rank (PQ codebooks/LUTs stay
  * non-degenerate). It then times the three probe paths (a2 raw-vector IVF,
  * a13 dir-per-list IVFPQ, a13z z-ordered IVFPQ) on the uniform vs skewed
  * corpus and captures PER-TASK durations via a SparkListener, reporting
  * p50/max task time — the balance number a wall-clock median hides (at
  * local[32] a single hot task can hide behind 31 idle cores; on a real
  * cluster it is the straggler that sets the stage time).
  *
  * Run: `runMain graft.SkewBench` (env SPARK_GRAFT_SF_DIR, default sf0.1).
  * Prints ONE JSON line; PLANS.md carries the measured numbers + analysis.
  */
object SkewBench {

  /** Zipf(s=2) over the 8 lists: w_i = 1/(i+1)^2 — p(0)=0.65, p(1)=0.16,
    * tail lists ~1-2%. Returns the cumulative thresholds in [0,1). */
  private val zipfCum: Seq[Double] = {
    val w = (1 to 8).map(i => 1.0 / (i * i))
    val s = w.sum
    w.scanLeft(0.0)(_ + _).tail.map(_ / s)
  }

  /** Deterministic skewed variant of `$src/embeddings.parquet` at
    * `$dst/embeddings.parquet`: centroid rows (vec_id<8) unchanged; every
    * other vector becomes 0.85*ĉ(target) + 0.15*v̂, target ~ Zipf(2) keyed
    * on xxhash64(vec_id). Unit-ish norms; float32 like the source. */
  def writeSkewedCorpus(spark: SparkSession, src: String, dst: String): Unit = {
    val e = Tables.embeddings(spark, src)
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("target"), col("embedding").as("cv"))
      .withColumn("cnrm", Vec.norm2Native(col("cv")))
    val u = (pmod(xxhash64(col("vec_id")), lit(1000000L)).cast("double") / 1000000.0)
    val target = zipfCum.init.zipWithIndex.foldRight(lit(7L): org.apache.spark.sql.Column) {
      case ((cum, i), alt) => when(u < cum, lit(i.toLong)).otherwise(alt)
    }
    val skewed = e.filter(col("vec_id") >= 8)
      .withColumn("target", target)
      .withColumn("vnrm", Vec.norm2Native(col("embedding")))
      .join(broadcast(cent), "target")
      .withColumn("embedding", zip_with(col("cv"), col("embedding"),
        (c, v) => (c * 0.85 / col("cnrm") + v * 0.15 / col("vnrm")).cast("float")))
      .select("vec_id", "embedding", "label")
    e.filter(col("vec_id") < 8).select("vec_id", "embedding", "label")
      .unionByName(skewed)
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val skewDir = new java.io.File("target/skew_corpus").getAbsolutePath
    writeSkewedCorpus(spark, srcDir, skewDir)

    // measured list-size distribution — the independent variable, printed
    // so the Zipf claim is a number, not an intent
    val sizes = Ann.listAssignment(graft.rag.Search.corpus(spark, skewDir))
      .groupBy("list_id").count().orderBy(desc("count"))
      .collect().map(r => r.getLong(1))
    val total = sizes.sum.toDouble

    val taskMs = scala.collection.mutable.ArrayBuffer.empty[Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        taskMs.synchronized { taskMs += te.taskInfo.duration }
    })

    val paths: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "a2_ivf" -> ((s, d) => Ann.a2KnnIvf(s, d)),
      "a13_ivfpq" -> ((s, d) => Pq.a13IvfPqTopK(s, d)),
      "a13z_ivfpq" -> ((s, d) => Pq.a13zIvfPqTopK(s, d)))
    val n = 3
    val fmt = (v: Double) => String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    def measure(dir: String): String = paths.map { case (name, fn) =>
      fn(spark, dir).count() // cold: index/artifact builds, codegen
      val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
      taskMs.synchronized(taskMs.clear())
      (1 to n).foreach { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        walls += (System.nanoTime() - t0) / 1e9
      }
      val ts = taskMs.synchronized(taskMs.toVector).sorted
      val p50 = if (ts.isEmpty) 0L else ts(ts.size / 2)
      val mx = if (ts.isEmpty) 0L else ts.last
      val med = walls.sorted.apply(walls.size / 2)
      s""""$name":{"median_sec":${fmt(med)},"task_p50_ms":$p50,"task_max_ms":$mx,"tasks":${ts.size / n}}"""
    }.mkString("{", ",", "}")

    val uniform = measure(srcDir)
    val zipf = measure(skewDir)
    val dist = sizes.map(s => fmt(s / total)).mkString("[", ",", "]")
    println(s"""{"metric":"ann_skew","n":$n,"list_fractions":$dist,"uniform":$uniform,"zipf":$zipf}""")
    spark.stop()
  }
}
