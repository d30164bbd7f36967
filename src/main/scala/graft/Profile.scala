package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only structural profiler (r17 optimization round): for every named
  * query (or the whole registry), run once warm and report the STRUCTURE a
  * wall-clock median can't show — Spark jobs fired per run (driver-side
  * collects), stages, tasks, exchange/sort/join-node counts from the
  * executed plan, and wall seconds. Stage/job counts are deterministic
  * per plan, so they rank optimization targets robustly on a host whose
  * run-to-run wall noise is ±50% (see Bench probe fields).
  *
  * `runMain graft.Profile [q1,q2,...|all] [sfDir]` — prints one
  * tab-separated line per query plus a JSON map on the last line.
  * Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val spec = args.headOption.getOrElse("all")
    val dir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (spec == "all") SparkEntry.queries.keys.toSeq.sorted
      else spec.split(',').toSeq
    // listener counters; queries run sequentially so attribution is by window
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(): Unit }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(): Unit }
    })
    println("query\twall_s\tjobs\tstages\ttasks\texchanges\tsorts\tsmj\tbhj\twindows")
    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      try { fn(spark, dir).count() } catch { case e: Throwable => // cold: builds + JIT
        System.err.println(s"[profile] $name cold FAILED: ${String.valueOf(e.getMessage).take(200)}")
      }
      Thread.sleep(300) // listener bus drain (no public waitUntilEmpty)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      try { fn(spark, dir).count() } catch { case _: Throwable => }
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val plan = try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case _: Throwable => "" }
      def c(tok: String): Int = tok.r.findAllMatchIn(plan).length
      val line = f"$name\t$dt%.2f\t${jobs.get}\t${stages.get}\t${tasks.get}\t${c("Exchange")}\t${c("\\+- Sort |^Sort ")}\t${c("SortMergeJoin")}\t${c("BroadcastHashJoin")}\t${c("Window")}"
      println(line)
      line
    }
    // machine-readable tail for diffing
    println("PROFILE_TSV_END " + rows.size)
    spark.stop()
  }
}
