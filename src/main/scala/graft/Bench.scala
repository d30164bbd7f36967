package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (parquet footers, codegen cache, shuffle machinery,
    // JIT) so per-query timings measure the plans, not first-query startup.
    Seq("lineitem", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("event_type").count().count()
    // ... and one cheap query per subsystem (memory build, text scan,
    // analytics agg) so the first measured query of each family isn't
    // charged the family's one-time codegen/JIT cost. Guarded: a broken
    // warm-up query must degrade to a cold start, not abort the bench
    // before any JSON is printed.
    Seq[() => Any](
      () => graft.memory.MemoryOps.m4Stats(spark, sfDir).count(),
      () => graft.text.TextOps.queries("t1_langid")(spark, sfDir).count(),
      () => graft.analytics.Queries.q6Revenue(spark, sfDir).count(),
    ).foreach(w => try w() catch {
      case e: Throwable =>
        System.err.println(s"[bench] warmup FAILED: ${String.valueOf(e.getMessage).take(200)}")
    })
    // Per-query median over n runs: this VM's run-to-run noise is ±50%, so
    // single-run timings flag phantom regressions.
    // A malformed env value degrades to the default instead of aborting.
    val n = sys.env.get("SPARK_GRAFT_BENCH_N").flatMap(_.toIntOption).getOrElse(3).max(1)
    // Fixed run order — the flagship q1_agg first (its number was drifting
    // with hash-map iteration order), then alphabetical, so round-over-round
    // comparisons see each query in the same session state every time.
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      "q1_agg" +: all.filterNot(_ == "q1_agg")
    }
    // Each query runs once COLD first — that run pays any once-per-corpus
    // index build (IVF/PQ code tables, BM25 postings, signature tables,
    // bigram LM...) the query's lazy `*Table` helpers materialize — and
    // then n measured runs whose median is steady-state probe cost only.
    // Build cost is reported separately (`cold` map / cold_total), never
    // folded into the per-query medians: "build once, probe forever" is
    // the 100 TB contract, so the two numbers must not be conflated.
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        // a failed query must be VISIBLE: stderr log + negative timing (a
        // silent catch once hid an analysis error as a fast "result")
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${String.valueOf(e.getMessage).take(300)}")
            false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) dt else -dt
      }
      val cold = run()
      val times = (1 to n).map(_ => run())
      val good = times.filter(_ > 0).sorted
      val dt =
        if (good.isEmpty) times.head // all failed: keep the negative marker
        else good(good.size / 2)     // upper median of the successful runs
      // Plan fingerprint: md5 of the CANONICALIZED initial physical plan
      // (exprIds normalized; pre-AQE, so runtime re-planning — a
      // broadcast conversion, a skew split — does not perturb it). A
      // timing regression with an UNCHANGED fingerprint is environment
      // noise; a changed fingerprint is a plan change to diff. Free: the
      // plan is derived, never executed.
      val fp = try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.canonicalized.toString
        java.security.MessageDigest.getInstance("MD5")
          .digest(plan.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
      } catch { case _: Throwable => "err" }
      // the cold run counts toward flaky too: a build-path failure that
      // warm retries paper over must not vanish from the JSON
      (name, dt, cold, times.count(_ < 0) + (if (cold < 0) 1 else 0), fp)
    }
    // Locale.ROOT: the f"" interpolator uses the JVM default locale, and a
    // comma-decimal locale (de_DE, fr_FR) would print 0,52 — invalid JSON.
    def fmt(v: Double): String = {
      val a = math.abs(v)
      val p = if (a >= 100) "%.0f" else if (a >= 10) "%.1f" else "%.2f"
      String.format(java.util.Locale.ROOT, p, Double.box(v))
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // failed queries carry negative markers: exclude them from the headline
    // total (summing them in would make a failure look like a speedup); a
    // query that failed on ANY run also lands in "flaky" with its failure
    // count, so partial failures are visible in the JSON, not just stderr.
    val total = results.collect { case (_, v, _, _, _) if v > 0 => v }.sum
    val coldTotal = results.collect { case (_, _, c, _, _) if c > 0 => c }.sum
    // Cold (build-paying) times are reported only where they matter — first
    // run >2x the median (the index-building queries; listing all ~100
    // would double the line for pure noise) — plus any FAILED cold, which
    // keeps its negative marker so a broken build path stays visible.
    val colds = results.collect { case (k, v, c, _, _) if v > 0 && (c < 0 || c > 2 * v) =>
      "\"" + k + "\":" + fmt(c)
    }
    val coldField = if (colds.isEmpty) "" else colds.mkString(",\"cold\":{", ",", "}")
    val flaky = results.collect { case (k, _, _, f, _) if f > 0 => "\"" + k + "\":" + f }
    val flakyField = if (flaky.isEmpty) "" else flaky.mkString(",\"flaky\":{", ",", "}")
    val plans = results.map { case (k, _, _, _, fp) => "\"" + k + "\":\"" + fp + "\"" }
      .mkString(",\"plans\":{", ",", "}")
    val sfName = sfDir.split('/').last
    // Two stdout lines. The first carries everything (per-query medians,
    // build-paying cold times, flaky counts) for humans and the repo log;
    // at ~100 queries it exceeds the 2000-char stdout tail the driver
    // parses, so a SHORT final line repeats the headline fields — the
    // driver's tail window always contains it whole, whatever the query
    // count grows to. The full detail is also written to BENCH_FULL.json
    // next to the build so the per-query numbers survive the truncation.
    val full = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$coldField$flakyField$plans,"sf":"$sfName","n":$n,"cold_total":${fmt(coldTotal)}}"""
    println(full)
    try {
      val p = java.nio.file.Paths.get("BENCH_FULL.json")
      java.nio.file.Files.write(p, (full + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] full per-query detail: ${p.toAbsolutePath}")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_FULL.json: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfName","n":$n,"nqueries":${results.size},"cold_total":${fmt(coldTotal)},"detail":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
