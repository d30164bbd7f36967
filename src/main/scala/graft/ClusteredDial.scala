package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run-and-record harness for the ANN family on CLUSTERABLE data (r11,
  * verdict #1 — the repo's highest-leverage missing evidence): through
  * r10 every recall number was measured on the driver's uniform synthetic
  * corpus, where no index can beat the scanned fraction (PLANS.md
  * §ivf-dial: recall ~ nprobe/nlists + tie effects), so the a-family's
  * accuracy grades measured the corpus, not the index. This runs each
  * index-family member at the SAME probe budget (8 lists x 3 probes, the
  * oracle-pinned default) on a mixture-of-Gaussians corpus
  * (tools/clustered_embeddings.py — intra-cluster cosine ~0.89,
  * inter ~ ±0.13) and reports mean recall@10 vs exact brute force plus
  * steady probe seconds, cold build seconds, and rows out. On clusterable
  * data recall must sit FAR above the 37.5% scanned fraction — that gap
  * is the index family's reason to exist. Results land in PLANS.md
  * §clustered-corpus; the nlists/nprobe sweep comes from graft.AnnDial on
  * the same directory (it is corpus-agnostic).
  *
  * Usage: `sbt "runMain graft.ClusteredDial [sfDir] [outJson]"` (default
  * ./testdata_clustered/sf0.1). Emits one JSON line per member plus a
  * truth line; with `outJson` the same lines are also written to a
  * machine-readable artifact (CLUSTERED_r{N}.json — committed and diffed
  * round-over-round, the DIALS_r10.json precedent, so a quietly broken
  * index build is a visible diff rather than a prose regression).
  * Members: a2 (deterministic coarse IVF), a4 (k-means|| coarse — the
  * learned-vs-deterministic comparison the verdict asks for), a13
  * (IVFPQ), a16 (residual IVFPQ), a18 (k-means-coarse residual IVFPQ),
  * a19 (graph-ordered probes), a5 (flat ADC, no pruning — the
  * compression-only floor), a7 (ADC shortlist + exact rerank), and (r12)
  * the AUTO operating points a2_auto/a7_auto — the chooser-driven path
  * ([[graft.ann.Ann.annOperatingPoint]]) run on the corpus the laws were
  * measured on, with the chosen dials emitted beside the recall they
  * deliver.
  */
object ClusteredDial {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("./testdata_clustered/sf0.1")
    val outJson = args.drop(1).headOption
    val emitted = scala.collection.mutable.ArrayBuffer.empty[String]
    def emit(line: String): Unit = { emitted += line; println(line) }
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

    val t0 = System.nanoTime()
    val nTruth = graft.rag.Search.knn(spark, sfDir, col("vec_id") % 101 === 0,
        k = 10, threshold = -1.0, clampZero = false, sameLabel = false).count()
    emit(s"""{"harness":"clustered_dial","sf":"${sfDir.split('/').takeRight(2).mkString("/")}","truth_rows":$nTruth,"brute_sec":${fmt((System.nanoTime() - t0) / 1e9)},"scanned_fraction":0.375}""")

    // r12: the auto path's chosen dials, emitted so the artifact records
    // what the chooser picked alongside what that choice delivered
    val nCorpus = graft.rag.Search.corpus(spark, sfDir).count()
    val occ = graft.ann.Ann.occupancyEstimate(
      spark, sfDir, graft.ann.Ann.nlistsFor(nCorpus))
    val spl = graft.ann.Ann.splinterEstimate(
      spark, sfDir, graft.ann.Ann.nlistsFor(nCorpus))
    val point = graft.ann.Ann.annOperatingPoint(nCorpus, occ, 0.9, splinter = spl)
    emit(s"""{"harness":"clustered_dial","auto_point":{"n":$nCorpus,"occupancy":$occ,"splinter":$spl,"recall_floor":0.9,"nlists":${point.nlists},"nprobe":${point.nprobe},"rerank_depth":${point.rerankDepth}}}""")

    // r13: the family ROUTER's decision on the same stats — which index
    // family the cost model picks in each regime, with the per-family
    // costs it priced, so the artifact records the choice beside the
    // measured outcome of every family it chose between
    Seq(graft.ann.Router.ComputeBound, graft.ann.Router.IoBound).foreach { reg =>
      val r = graft.ann.Router.route(nCorpus, occ, spl, 0.9, reg)
      emit(s"""{"harness":"clustered_dial","route":{"regime":"${r.regime}","family":"${r.family}","nlists":${r.nlists},"nprobe":${r.nprobe},"rerank_depth":${r.rerankDepth},"cost_brute":${fmt(r.costBrute)},"cost_ivf":${fmt(r.costIvf)},"cost_ivfpqr":${fmt(r.costIvfPqR)},"cost_pq":${fmt(r.costPq)}}}""")
    }

    val members: Seq[(String, () => DataFrame)] = Seq(
      "a2_ivf_det_8x3" -> (() => graft.ann.Ann.a2KnnIvf(spark, sfDir)),
      "a4_ivf_kmeans_8x3" -> (() => graft.ann.KmeansIvf.a4KnnIvfKmeans(spark, sfDir)),
      "a13_ivfpq_8x3" -> (() => graft.ann.Pq.a13IvfPqTopK(spark, sfDir)),
      "a16_ivfpqr_8x3" -> (() => graft.ann.IvfPqR.a16IvfPqResidualTopK(spark, sfDir)),
      "a18_ivfpqr_kmeans_8x3" -> (() => graft.ann.IvfPqR.a18IvfPqrKmeansTopK(spark, sfDir)),
      "a19_graph_8x3" -> (() => graft.ann.GraphProbe.a19GraphTopK(spark, sfDir)),
      "a5_pq_flat" -> (() => graft.ann.Pq.a5PqTopK(spark, sfDir)),
      "a7_pq_rerank" -> (() => graft.ann.Pq.a7PqRerank(spark, sfDir)),
      // the rerank-depth dial: R must cover cluster occupancy (~N/64)
      // before exact rerank can recover what the 8-byte codes blur
      "a7_pq_rerank_r200" -> (() => graft.ann.Pq.a7PqRerank(spark, sfDir, rerankDepth = 200)),
      "a7_pq_rerank_r800" -> (() => graft.ann.Pq.a7PqRerank(spark, sfDir, rerankDepth = 800)),
      // r12: the chooser-driven entries — what a pipeline caller actually
      // gets at recallFloor=0.9, graded on the corpus the laws came from
      // r13: the composed IVFPQ+refine index (the io-regime router's
      // winner) at the pinned dials and at the chooser's operating point
      "a22_ivfpq_rerank_8x3" -> (() => graft.ann.Pq.a22IvfPqRerank(spark, sfDir)),
      "a22_auto_f0.9" -> (() => graft.ann.Pq.a22IvfPqRerank(spark, sfDir,
        nlists = point.nlists, nprobe = point.nprobe,
        rerankDepth = point.rerankDepth)),
      "a2_auto_f0.9" -> (() => graft.ann.Ann.a2KnnIvfAuto(spark, sfDir, recallFloor = 0.9)),
      "a7_auto_f0.9" -> (() => graft.ann.Pq.a7PqRerankAuto(spark, sfDir, recallFloor = 0.9)),
      // r13: the routed dispatch in BOTH regimes — compute should match
      // the box's measured winner; io is the cluster model and its pick
      // may measure slower HERE (that mismatch is the regime split's
      // whole point, recorded rather than hidden)
      "a_route_compute_f0.9" -> (() => graft.ann.Router.aRouteTopk(
        spark, sfDir, recallFloor = 0.9, regime = graft.ann.Router.ComputeBound)),
      "a_route_io_f0.9" -> (() => graft.ann.Router.aRouteTopk(
        spark, sfDir, recallFloor = 0.9, regime = graft.ann.Router.IoBound)),
    )
    members.foreach { case (name, mk) =>
      val c0 = System.nanoTime()
      mk().count() // cold: pays this member's index/codebook build
      val coldSec = (System.nanoTime() - c0) / 1e9
      val s0 = System.nanoTime()
      val nOut = mk().count()
      val sec = (System.nanoTime() - s0) / 1e9
      val rec = graft.ann.Pq.recallVsBruteForce(spark, sfDir, mk())
        .agg(avg(col("recall")).as("r")).collect()(0).getDouble(0)
      emit(s"""{"harness":"clustered_dial","member":"$name","rows_out":$nOut,"mean_recall":${fmt(rec)},"cold_sec":${fmt(coldSec)},"sec":${fmt(sec)}}""")
    }
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (emitted.mkString("\n") + "\n").getBytes("UTF-8")): Unit
    }
    spark.stop()
  }
}
