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

    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def ingestDirs(): Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(indexDir)).toSeq
        .map(_.getPath.getName).filter(_.startsWith("ingest=")).sorted

    // ADVICE r11 (medium): a writer that dies mid-batch leaves part files
    // with NO _SUCCESS — the reader must not trust them as committed rows
    Streams.appendIvfBatch(existing.limit(7), indexDir, centSource, "torn")
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/ingest=torn/_SUCCESS"),
      false): Unit
    assert(Streams.readIvfIndex(spark, indexDir).count() == before,
      "reader trusted an uncommitted (no _SUCCESS) ingest directory")
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/ingest=torn"), true): Unit

    // r12 (verdict #2): compaction folds the per-batch directories into
    // one canonical list_id-partitioned dir — same rows, same probe
    // results, pruning intact, one committed directory on disk
    // commit identity (ingest) is per-directory bookkeeping, not index
    // content — compare the probe's content columns, order-insensitively
    val preProbe = probe.select("vec_id", "label", "nrm")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    Streams.compactIvfIndex(spark, indexDir)
    val compacted = Streams.readIvfIndex(spark, indexDir)
    assert(compacted.count() == before, "compaction changed the row count")
    val postAsg = compacted
      .select(col("vec_id"), col("list_id").cast("long").as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sorted
    assert(postAsg.sameElements(rebuilt), "compaction changed the assignment")
    assert(ingestDirs() == Seq("ingest=compact_1"),
      s"folded directories must be swept: ${ingestDirs()}")
    val postProbe = Streams.readIvfIndex(spark, indexDir)
      .filter(col("list_id") === 3)
    assert(postProbe.select("vec_id", "label", "nrm")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq == preProbe,
      "probe results changed across compaction")
    val postScan = postProbe.queryExecution.executedPlan.toString
    assert(postScan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("list_id")),
      s"list_id pruning lost across compaction:\n$postScan")

    // replay safety ACROSS the fold: an at-least-once stream re-delivers
    // a pre-compaction batch, re-creating its directory (with _SUCCESS) —
    // the manifest must keep its rows dead, or the fold double-counts
    Streams.appendIvfBatch(existing, indexDir, centSource, "base")
    assert(Streams.readIvfIndex(spark, indexDir).count() == before,
      "replayed pre-compaction batch resurrected folded rows")
    // and the next compaction sweeps the zombie directory
    Streams.compactIvfIndex(spark, indexDir)
    assert(Streams.readIvfIndex(spark, indexDir).count() == before)
    assert(!ingestDirs().contains("ingest=base"),
      s"zombie replay directory must be swept: ${ingestDirs()}")
  }

  test("H14: streamed PQ code appends == batch encode; compaction schema-agnostic") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val e = Search.corpus(spark, Sf)
    val indexDir = freshDir("h14")
    // codebook + centroids derive from the ORIGINAL corpus (the a20 /
    // H12 versioned-artifact rule) — the stream only carries new rows
    val corpusSource = e

    val existing = e.filter(!graft.ann.Ann.A20NewBatch)
      .select(col("vec_id"), col("label"), col("v"))
    Streams.appendIvfPqBatch(existing, indexDir, corpusSource, "base")

    val newRows = e.filter(graft.ann.Ann.A20NewBatch)
      .select(col("vec_id"), col("label"), col("v")).as[IvfVec].collect()
    assert(newRows.length > 10)
    val feed = MemoryStream[IvfVec]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_h14_ckpt").toString
    val q = Streams.streamingIvfPqAppend(feed.toDF(), indexDir, corpusSource, ckpt)
    newRows.grouped(math.max(1, newRows.length / 3)).foreach { g =>
      feed.addData(g.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    // streamed code rows must BE the batch encode of the whole corpus
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.filterNot(_ == "ingest").sorted
      df.select(cols.head, cols.tail: _*)
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    }
    val streamed = Streams.readIvfIndex(spark, indexDir)
    val rebuilt = graft.ann.Pq.encodeBatchAgainst(corpusSource,
      e.select("vec_id", "label", "v", "nrm"))
    assert(streamed.drop("ingest").columns.sorted
      .sameElements(rebuilt.columns.sorted),
      s"code schema drifted: ${streamed.columns.mkString(",")}")
    assert(canon(streamed) == canon(rebuilt),
      "streamed code rows diverged from the batch encode")

    // the H12 compaction machinery must fold the code layout unchanged
    val before = streamed.count()
    Streams.compactIvfIndex(spark, indexDir)
    val compacted = Streams.readIvfIndex(spark, indexDir)
    assert(compacted.count() == before)
    assert(canon(compacted) == canon(rebuilt),
      "compaction changed the code rows")
    val scan = compacted.filter(col("list_id") === 3)
      .queryExecution.executedPlan.toString
    assert(scan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("list_id")),
      s"code-layout probe not partition-pruned:\n$scan")
  }

  test("router composition (r16, verdict r15 #4): the routed decision " +
       "reads the streamed index and survives compaction and replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._

    // one corpus split two ways (the RouterSpec construction, streamed
    // here through the REAL machinery): fullDir = the equivalent batch
    // rebuild; batchDir + a 3-micro-batch stream = the live deployment
    val n = 1200
    val cut = 1100L // appended ids all exceed nlistsFor(1200) = 35
    val rnd = new java.util.Random(99L)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / nrm)
    }
    val centers = Array.fill(16)(unit())
    val rows = (0 until n).map { i =>
      val c = centers(i % 16)
      Row(i.toLong, c.map(x => x + 0.35f * rnd.nextGaussian().toFloat / 8f).toSeq,
        i % 16 % 10)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType, nullable = false)))
    def write(rs: Seq[Row], tag: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_rtr_$tag").toString
      spark.createDataFrame(spark.sparkContext.parallelize(rs, 4), schema)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    val fullDir = write(rows, "full")
    val batchDir = write(rows.take(cut.toInt), "batch")
    val indexDir = freshDir("rtr")
    val centSource = Search.corpus(spark, batchDir)

    val newRows = Search.corpus(spark, fullDir)
      .filter(col("vec_id") >= cut)
      .select(col("vec_id"), col("label"), col("v")).as[IvfVec].collect()
    val feed = MemoryStream[IvfVec]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rtr_ckpt").toString
    val q = Streams.streamingIvfAppend(feed.toDF(), indexDir, centSource, ckpt)
    newRows.grouped(math.max(1, newRows.length / 3)).foreach { g =>
      feed.addData(g.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()

    // the routed decision over (batch ∪ streamed) == the batch rebuild's
    val rebuild = graft.ann.Router.a21Route(spark, fullDir)
      .collect().map(_.toSeq).toSeq
    def streamedRoute(): Seq[Seq[Any]] =
      graft.ann.Router.a21RouteStreamed(spark, batchDir, indexDir)
        .collect().map(_.toSeq).toSeq
    assert(streamedRoute() === rebuild,
      "streamed route diverged from the equivalent batch rebuild")

    // ... and the decision is INVARIANT across the manifest lifecycle:
    // compaction folds the micro-batch dirs, a zombie replay re-creates
    // one — readIvfIndex's committed view keeps the stats identical
    Streams.compactIvfIndex(spark, indexDir)
    assert(streamedRoute() === rebuild, "route moved across compaction")
    val firstTag = s"${Streams.appIdFor(ckpt)}_0"
    Streams.appendIvfBatch(
      Search.corpus(spark, fullDir).filter(col("vec_id") >= cut)
        .select(col("vec_id"), col("label"), col("v")).limit(50),
      indexDir, centSource, firstTag)
    assert(streamedRoute() === rebuild,
      "a replayed (folded) batch directory changed the routed decision")
  }
}
