package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** H3: streaming exact-dedup — the online form of d1_exact_dup. Documents
  * arrive as a stream; `dropDuplicates` on content_hash with a watermark
  * bounds state while suppressing re-ingests (the reference's content_hash
  * dedup on rag_add_document, done online). */
class StreamDedupSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("re-ingested documents are suppressed by hash within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("content_hash")
    val q = docs.writeStream.format("memory").queryName("h3_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), 1L, "alpha beta"), (ts(2), 2L, "gamma"))
      q.processAllAvailable()
      // duplicate content, different doc id — must be suppressed
      input.addData((ts(3), 3L, "alpha beta"), (ts(4), 4L, "delta"))
      q.processAllAvailable()
      val kept = spark.table("h3_dedup").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L, 4L), s"got $kept")
    } finally q.stop()
  }

  test("H10: streaming chunk ingest chunks statelessly and suppresses repeats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val words50 = (0 until 50).map(i => s"w$i").mkString(" ")
    val other = (0 until 30).map(i => s"x$i").mkString(" ")
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = graft.streaming.Streams.streamingChunkIngest(
      input.toDF().toDF("ts", "doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("h10_chunks")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), 1L, words50), (ts(2), 2L, other))
      q.processAllAvailable()
      // doc 3 repeats doc 1's text -> all its chunks are boilerplate dups
      input.addData((ts(3), 3L, words50))
      q.processAllAvailable()
      val rows = spark.table("h10_chunks").collect()
      // 50 words -> chunks at 0/24/48; 30 words -> chunks at 0/24
      assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L), s"doc 3 must be suppressed")
      assert(rows.count(_.getLong(0) == 1L) == 3)
      assert(rows.count(_.getLong(0) == 2L) == 2)
      // batch equivalence: same chunk hashes as the batch chunker
      val batch = graft.rag.Chunking.chunkRows(
        Seq((1L, words50), (2L, other)).toDF("doc_id", "text"))
        .select("chunk_hash").collect().map(_.getString(0)).toSet
      assert(rows.map(_.getString(4)).toSet == batch)
    } finally q.stop()
  }

  test("H10: dedup state is EVICTED once the watermark passes a hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val text = (0 until 30).map(i => s"y$i").mkString(" ")
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = graft.streaming.Streams.streamingChunkIngest(
      input.toDF().toDF("ts", "doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("h10_evict")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(1), 1L, text))
      q.processAllAvailable()
      // advance the watermark far past ts(1) + the 10-minute horizon
      input.addData((ts(40), 2L, "unrelated words here"))
      q.processAllAvailable()
      // the SAME content re-arrives after eviction: with bounded state it
      // re-emits (the old hash is gone); unbounded dropDuplicates state
      // would suppress it forever
      input.addData((ts(45), 3L, text))
      q.processAllAvailable()
      val byDoc = spark.table("h10_evict").collect().groupBy(_.getLong(0))
      assert(byDoc.contains(1L) && byDoc.contains(3L),
        s"post-eviction re-ingest must re-emit; got docs ${byDoc.keySet}")
      assert(byDoc(1L).length == byDoc(3L).length)
    } finally q.stop()
  }

  test("H8: ingest dedup drops in-stream dups AND corpus-known content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // historical corpus already contains "alpha beta"
    val corpus = Seq("alpha beta", "epsilon").toDF("text")
      .select(md5(col("text")).as("content_hash"))
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = graft.streaming.Streams.streamingIngestDedup(
      input.toDF().toDF("ts", "doc_id", "text"), corpus)
    val q = out.writeStream.format("memory").queryName("h8_ingest")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts(1), 10L, "alpha beta"), // known in corpus -> dropped
        (ts(2), 11L, "gamma"),      // new -> kept
        (ts(3), 12L, "gamma"),      // in-stream dup -> dropped
        (ts(4), 13L, "delta"))      // new -> kept
      q.processAllAvailable()
      val kept = spark.table("h8_ingest").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(11L, 13L), s"got $kept")
      // batch equivalence: the same frame through the same transform
      val batch = graft.streaming.Streams.streamingIngestDedup(
        Seq((ts(2), 11L, "gamma"), (ts(4), 13L, "delta"), (ts(1), 10L, "alpha beta"))
          .toDF("ts", "doc_id", "text"), corpus)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batch == Set(11L, 13L), s"batch got $batch")
    } finally q.stop()
  }
}
