package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run-and-record harness for d5's blocking dial (r9 verdict item 3):
  * times d5_embedding_neardup at 2/3/4(/5) bits-per-band x 4 bands and
  * measures pair recall against the brute-force cosine>=0.4 ground truth
  * — the d7-style contract (recall is measured, never assumed) applied to
  * the hyperplane dial. Results land in PLANS.md §d5-dial, same
  * run-and-record stance as SkewBench/StreamBench.
  *
  * Usage: `sbt "runMain graft.D5Dial [sfDir] [settingsCsv]"` — each
  * setting is `bits` (4 bands) or `bitsxbands` (e.g. `4x8`: recall
  * compensation — more bands buy recall back at one extra corpus pass
  * each). Defaults /root/testdata/sf0.1 and 2,3,4. Emits one JSON line
  * per setting plus a truth line.
  */
object D5Dial {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // Settings: `bits`, `bitsxbands`, or `auto[@floor]` — the last runs
    // d5EmbeddingNeardupAuto (r11, verdict #2: the chooser IS the path),
    // with the operating point computed from the live corpus count at the
    // harness threshold (0.4) and the given recall floor (default 0.5).
    // Left = auto floor, Right = explicit (bits, bands).
    val settings: Seq[Either[Double, (Int, Int)]] =
      args.lift(1).getOrElse("2,3,4").split(',').map(_.trim).map { tok =>
        if (tok.startsWith("auto"))
          Left(tok.split('@').lift(1).map(_.toDouble).getOrElse(0.5))
        else tok.split('x') match {
          case Array(b, n) => Right((b.toInt, n.toInt))
          case Array(b)    => Right((b.toInt, 4))
        }
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

    // Brute-force ground truth: every vec_a < vec_b pair with
    // cosine >= 0.4 (same rounding as d5's verify). Quadratic by
    // definition — this is the harness's oracle, not a shipped plan.
    // At corpora where N^2 is out of reach (sf10: 4e10 pairs ~ 7 h), a
    // third arg `sampleMod` > 1 restricts the truth to pairs TOUCHING a
    // 1/mod uniform vector sample (cost (N/mod) x N); recall over a
    // uniform sample of the true pairs is an unbiased estimate of recall
    // over all of them, with ~sqrt(1/n_sampled_pairs) noise.
    // (localCheckpoint(true) is EAGER: the brute join is paid here, so
    // the timer starts before construction.)
    val sampleMod = args.lift(2).map(_.toInt).getOrElse(1)
    val t0 = System.nanoTime()
    val truth = {
      val e = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("nrm", graft.functions.Vec.norm2Native(col("v")))
      val a = e.filter(col("vec_id") % sampleMod === 0)
        .select(col("vec_id").as("qid"), col("v").as("va"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("oid"), col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, col("qid") =!= col("oid"))
        .withColumn("similarity",
          round(when(col("na") * col("nb") === 0.0, 0.0)
            .otherwise(graft.functions.Vec.dotNative(col("va"), col("vb"))
              / (col("na") * col("nb"))), 6))
        .filter(col("similarity") >= 0.4)
        .select(least(col("qid"), col("oid")).as("vec_a"),
          greatest(col("qid"), col("oid")).as("vec_b"))
        .distinct()
        .localCheckpoint(true)
    }
    val nTruth = truth.count()
    println(s"""{"harness":"d5_dial","sf":"${sfDir.split('/').last}","sample_mod":$sampleMod,"truth_pairs":$nTruth,"brute_sec":${fmt((System.nanoTime() - t0) / 1e9)}}""")

    settings.foreach { setting =>
      // The auto token runs THROUGH d5EmbeddingNeardupAuto (count + chooser
      // + run — what a pipeline caller hits); explicit tokens keep the
      // literal-dial path. The chooser's pick is re-derived here only to
      // report it alongside the closed-form prediction.
      val (mode, floor, (r, nb), query) = setting match {
        case Left(f) =>
          val nCorpus = graft.Tables.embeddings(spark, sfDir).count()
          val dials = graft.dedup.Dedup.d5OperatingPoint(nCorpus, 0.4, f)
          ("auto", f, dials,
            () => graft.dedup.Dedup.d5EmbeddingNeardupAuto(spark, sfDir,
              simThreshold = 0.4, recallFloor = f))
        case Right((b, n)) =>
          ("explicit", -1.0, (b, n),
            () => graft.dedup.Dedup.d5EmbeddingNeardup(spark, sfDir,
              bitsPerBand = b, bands = n))
      }
      def run(): (Long, Double) = {
        val s0 = System.nanoTime()
        val n = query().count()
        (n, (System.nanoTime() - s0) / 1e9)
      }
      run() // cold (codegen/JIT for this literal tensor width)
      val (nOut, sec) = run()
      val caught = query().join(truth, Seq("vec_a", "vec_b")).count()
      val recall = if (nTruth == 0) -1.0 else caught.toDouble / nTruth
      val predicted = graft.dedup.Dedup.d5ClosedFormRecall(r, nb, 0.4)
      println(s"""{"harness":"d5_dial","mode":"$mode","recall_floor":${fmt(floor)},"bits_per_band":$r,"bands":$nb,"total_bits":${nb * r},"pairs_out":$nOut,"recall":${fmt(recall)},"predicted_recall":${fmt(predicted)},"sec":${fmt(sec)}}""")
    }
    spark.stop()
  }
}
