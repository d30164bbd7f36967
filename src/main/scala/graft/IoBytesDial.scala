package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MEASURED io per query for the ANN family (r13) — grounds the router's
  * io-bound regime ([[graft.ann.Router]]): through r12 the io pricing was
  * arithmetic over two constants (VecBytes=256, CodeBytes=8) and the
  * nprobe/nlists pruning factor; this harness measures what each family's
  * real plan actually selects for reading (post-pruning parquet file
  * bytes, [[ScanBytes]]) in the SERVING shape the router prices — one
  * query against a built index — on the clustered corpus the laws were
  * measured on.
  *
  * Why single-query: partition pruning composes over the UNION of probed
  * lists, so a 198-query batch probes essentially every list and reads
  * the whole index regardless of family — the per-query io the 100 TB
  * regime cares about is only visible at batch size ~1 (queries/cluster
  * < 1). The harness pins `qmod = corpus count`, so exactly vec_id=0
  * qualifies.
  *
  * Every member is built (cold run) BEFORE measurement, so the measured
  * bytes are steady-state probe reads, not index construction. The
  * `query_extract` member is the shared floor every family pays to load
  * the query vector from the flat corpus file (the modulo predicate is
  * not prunable); net = member − query_extract is the index-dependent
  * read the io regime prices. Results land in IOBYTES_r{N}.json and
  * PLANS.md §io-bytes; IoBytesSpec gates the ordering.
  *
  * Usage: `sbt "runMain graft.IoBytesDial [sfDir] [outJson]"`
  * (default ./testdata_clustered/sf1).
  */
object IoBytesDial {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("./testdata_clustered/sf1")
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

    val e = graft.rag.Search.corpus(spark, sfDir)
    val n = e.count()
    val qmod = n.toInt // single query: only vec_id = 0 satisfies % n == 0
    val nl = graft.ann.Ann.nlistsFor(n)
    val occ = graft.ann.Ann.occupancyEstimate(spark, sfDir, nl)
    val spl = graft.ann.Ann.splinterEstimate(spark, sfDir, nl)
    val p = graft.ann.Ann.annOperatingPoint(n, occ, 0.9, splinter = spl)
    emit(s"""{"harness":"io_bytes","sf":"${sfDir.split('/').takeRight(2).mkString("/")}","n":$n,"auto_point":{"nlists":${p.nlists},"nprobe":${p.nprobe},"rerank_depth":${p.rerankDepth},"occupancy":$occ,"splinter":$spl}}""")

    val members: Seq[(String, () => DataFrame)] = Seq(
      "query_extract" -> (() =>
        e.filter(col("vec_id") % qmod === 0)),
      "a1_brute" -> (() =>
        graft.rag.Search.knn(spark, sfDir, col("vec_id") % qmod === 0,
          k = 10, threshold = -1.0, clampZero = false, sameLabel = false)),
      "a2_ivf_8x3" -> (() =>
        graft.ann.Ann.a2KnnIvf(spark, sfDir, 8, 3, qmod = qmod)),
      "a2_ivf_pruned_8x3" -> (() =>
        graft.ann.Ann.a2KnnIvfPruned(spark, sfDir, 8, 3, qmod = qmod)),
      "a2_ivf_pruned_auto" -> (() =>
        graft.ann.Ann.a2KnnIvfPruned(spark, sfDir, p.nlists, p.nprobe,
          qmod = qmod)),
      "a5_pq_flat_adc" -> (() =>
        graft.ann.Pq.a5PqTopK(spark, sfDir, qmod = qmod)),
      "a13_ivfpq_8x3" -> (() =>
        graft.ann.Pq.a13IvfPqTopK(spark, sfDir, qmod = qmod)),
      "a22_flat_rerank_8x3" -> (() =>
        graft.ann.Pq.a22IvfPqRerank(spark, sfDir, qmod = qmod,
          prunedRerank = false)),
      "a22_pruned_rerank_8x3" -> (() =>
        graft.ann.Pq.a22IvfPqRerank(spark, sfDir, qmod = qmod)),
      "a22_pruned_rerank_auto" -> (() =>
        graft.ann.Pq.a22IvfPqRerank(spark, sfDir, qmod = qmod,
          nlists = p.nlists, nprobe = p.nprobe,
          rerankDepth = p.rerankDepth)),
    )
    // Attribution: the file-granular `filesSize` metric charges a whole
    // file even when parquet row-group pruning reads a sliver, so scans
    // of the monolithic corpus file (query extraction, centroid /
    // codebook derivation — cached serving artifacts in production, tiny
    // row-group-pruned reads here) are reported under `corpus_bytes`,
    // never summed into the index account. `index_vec_bytes` = selected
    // partitions of the raw-vector list tables (graft_ivf*);
    // `index_code_bytes` = selected partitions/files of the PQ code
    // tables (graft_ivfpq*/graft_pq*). The io regime prices the index
    // reads; the spec gates them.
    def classifyOne(root: String): String =
      if (root.contains("graft_ivfpq") || root.contains("pqcodes") ||
          root.contains("graft_pq")) "code"
      else if (root.contains("graft_ivf")) "vec"
      else if (root.contains("embeddings.parquet")) "corpus"
      else "other"
    // a multi-root scan (r14, ADVICE r13) whose roots classify the SAME
    // way is attributed normally; roots straddling accounts surface as
    // "mixed" in the artifact instead of silently crediting the first root
    def classify(r: ScanBytes.ScanRead): String = {
      val classes = (if (r.roots.nonEmpty) r.roots else Seq(r.root))
        .map(classifyOne).distinct
      if (classes.size == 1) classes.head else "mixed"
    }
    val medianSec = scala.collection.mutable.Map.empty[String, Double]
    var mixedTotal = 0L
    members.foreach { case (name, mk) =>
      mk().count() // cold: index/codebook builds — excluded from measure
      // median of 5 timed executions: the alpha derivation below is a
      // wall-time RATIO, and single runs on this VM are ±25% (PLANS
      // §r14 noise envelope) — bytes are deterministic, times are not
      val timed = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val r = ScanBytes.selectedScanReads(mk())
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (sec, (rows, reads)) = timed.sortBy(_._1)(Ordering.Double.TotalOrdering)
        .apply(timed.size / 2)
      medianSec(name) = sec
      val by = reads.groupBy(classify)
        .view.mapValues(rs => (rs.map(_.files).sum, rs.map(_.bytes).sum)).toMap
      def b(k: String): Long = by.get(k).map(_._2).getOrElse(0L)
      def fl(k: String): Long = by.get(k).map(_._1).getOrElse(0L)
      mixedTotal += b("mixed")
      emit(s"""{"harness":"io_bytes","member":"$name","rows_out":$rows,"index_vec_bytes":${b("vec")},"index_code_bytes":${b("code")},"corpus_bytes":${b("corpus")},"other_bytes":${b("other")},"mixed_bytes":${b("mixed")},"mixed_files":${fl("mixed")},"index_files":${fl("vec") + fl("code")},"sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec))}}""")
    }

    // Attribution-gap gate (r14 ADVICE): a mixed-class multi-root scan is
    // EXCLUDED from index_* by design, so if one ever appears the headline
    // index bytes silently under-count. Surface it as its own record (the
    // artifact consumer keys on attribution_gap) and scream on stderr —
    // today's members are all single-account, so gap=false is the pin.
    emit(s"""{"harness":"io_bytes","mixed_bytes_total":$mixedTotal,"attribution_gap":${mixedTotal > 0}}""")
    if (mixedTotal > 0)
      System.err.println(s"[io_bytes] ATTRIBUTION GAP: $mixedTotal bytes in " +
        "mixed-class scans are excluded from index_* — re-attribute before " +
        "trusting the headline index byte counts")

    // The AdcAlpha RE-MEASURE path (r14, verdict r13 #2 tail: "nothing
    // re-measures it"): Router.AdcAlpha = 1.63 is the sf10 box anchor
    // (66.8 = 40.1·(alpha·N + R)/N at N=200k, R=7518). a1_brute and
    // a5_pq_flat_adc both scan all N per query — exact dot vs ADC gather
    // — so after subtracting the shared query-extract floor, their
    // wall-time ratio IS alpha on whatever box runs this harness. A
    // deployment re-derives its own anchor here instead of inheriting
    // this box's; the router takes it as a plain argument change.
    for {
      floor <- medianSec.get("query_extract")
      brute <- medianSec.get("a1_brute")
      adc <- medianSec.get("a5_pq_flat_adc")
      // BOTH scans must clear the shared floor by a RELATIVE margin
      // (r14 ADVICE): at brute ≈ floor the denominator (brute - floor)
      // is noise-dominated and the ratio can be arbitrarily large even
      // as a median-of-5 — require 1.2× so the subtraction keeps at
      // least ~20% signal. The three raw medians are emitted alongside
      // so a consumer can judge the derivation's conditioning either way.
      if brute > 1.2 * floor && adc > 1.2 * floor
    } emit(s"""{"harness":"io_bytes","adc_alpha_measured":${String.format(java.util.Locale.ROOT, "%.2f", Double.box((adc - floor) / (brute - floor)))},"router_adc_alpha":${graft.ann.Router.AdcAlpha},"floor_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(floor))},"brute_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(brute))},"adc_sec":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(adc))},"derivation":"(adc_scan - extract_floor) / (brute_scan - extract_floor), median of 5, both scans > 1.2x floor","note":"small-corpus ratio is noisier than the sf10 anchor; re-derive at deployment scale before overriding route(alpha)"}""")

    outJson.foreach { pth =>
      java.nio.file.Files.write(java.nio.file.Paths.get(pth),
        (emitted.mkString("\n") + "\n").getBytes("UTF-8")): Unit
    }
    spark.stop()
  }
}
