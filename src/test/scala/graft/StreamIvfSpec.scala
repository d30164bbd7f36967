package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.rag.Search
import graft.streaming.Streams
import graft.streaming.Streams.IvfVec

/** H12 (r11, verdict #7): streaming IVF list-partition append — streamed
  * micro-batch appends must reproduce a20's batch property ONLINE: the
  * appended index equals a full rebuild on the same data, replays are
  * idempotent, and probes stay partition-pruned. */
class StreamIvfSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/ivf"

  test("H12: streamed appends == batch rebuild; replay idempotent; probe pruned") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val e = Search.corpus(spark, Sf)
    val indexDir = freshDir("h12")
    // the versioned centroid artifact: derived from the FULL corpus id
    // rule (vec_id < 8), exactly as a20's incremental step uses it
    val centSource = e

    // seed: the pre-ingest corpus lands as its own ingest partition via
    // the same writer the stream uses (base build == batch 0 of app "base")
    val existing = e.filter(!graft.ann.Ann.A20NewBatch)
      .select(col("vec_id"), col("label"), col("v"))
    Streams.appendIvfBatch(existing, indexDir, centSource, "base")

    // today's ingest arrives as a stream, split across three micro-batches
    val newRows = e.filter(graft.ann.Ann.A20NewBatch)
      .select(col("vec_id"), col("label"), col("v")).as[IvfVec].collect()
    assert(newRows.length > 10, "fixture must have a real ingest batch")
    val feed = MemoryStream[IvfVec]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_h12_ckpt").toString
    val q = Streams.streamingIvfAppend(
      feed.toDF(), indexDir, centSource, ckpt)
    newRows.grouped(math.max(1, newRows.length / 3)).foreach { g =>
      feed.addData(g.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    // a20's property, online: streamed index == full batch rebuild
    val streamed = Streams.readIvfIndex(spark, indexDir)
      .select(col("vec_id"), col("list_id").cast("long").as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted
    val rebuilt = graft.ann.Ann.listAssignment(e, Some(centSource))
      .select(col("vec_id"), col("list_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted
    assert(streamed.length == rebuilt.length,
      s"streamed ${streamed.length} rows vs rebuild ${rebuilt.length}")
    assert(streamed.sameElements(rebuilt), "streamed assignment diverged from rebuild")

    // replay idempotence: re-delivering an already-committed batch tag
    // overwrites its own directory — row count must not move
    val before = Streams.readIvfIndex(spark, indexDir).count()
    Streams.appendIvfBatch(existing, indexDir, centSource, "base")
    assert(Streams.readIvfIndex(spark, indexDir).count() == before,
      "replayed batch double-appended")

    // probe shape: a list_id predicate must prune at the partition level,
    // not post-filter a full scan
    val probe = Streams.readIvfIndex(spark, indexDir)
      .filter(col("list_id") === 3)
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("list_id")),
      s"list_id probe not partition-pruned:\n$scan")
    assert(probe.count() ==
      rebuilt.count { case (_, l) => l == 3L }, "pruned probe lost rows")
  }
}
