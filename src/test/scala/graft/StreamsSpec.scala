package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import org.apache.spark.sql.functions._

import graft.rag.Search
import graft.streaming.Streams
import graft.streaming.Streams.MemEvent

class StreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("H1: windowed counts aggregate a stream like the batch rollup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val counts = Streams.windowedCounts(
      input.toDF().toDF("ts", "event_type", "value"), windowLen = "10 minutes")
    val q = counts.writeStream.format("memory").queryName("h1_counts")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(12), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("h1_counts").collect()
        .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
      assert(rows == Set(
        (ts(0), "click", 2L, 3.0),
        (ts(10), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("H2: TTL state machine emits active updates then expiry on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MemEvent]
    val updates = Streams.ttlStateMachine(input.toDS(), ttlSeconds = 60,
      watermark = "0 seconds")
    val q = updates.writeStream.format("memory").queryName("h2_updates")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(MemEvent("k1", ts(1), 1L, "v1"), MemEvent("k1", ts(2), 2L, "v2"))
      q.processAllAvailable()
      // advance the watermark far past k1's timeout (00:02 + 60s)
      input.addData(MemEvent("k2", ts(30), 3L, "w1"))
      q.processAllAvailable()
      input.addData(MemEvent("k3", ts(40), 4L, "x1"))
      q.processAllAvailable()
      val rows = spark.table("h2_updates").collect()
        .map(r => (r.getAs[String]("memory_key"), r.getAs[String]("status"),
          r.getAs[Long]("access_count"))).toList
      assert(rows.contains(("k1", "active", 2L)))
      assert(rows.contains(("k1", "expired", 2L)))
      assert(rows.contains(("k2", "active", 1L)))
    } finally q.stop()
  }

  test("H5: streaming search emits the same top-k as the batch path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Search.corpus(spark, Sf)
    val qvecs = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), ts(1), r.getSeq[Float](1)))
    assert(qvecs.nonEmpty)
    val expected = Search.r3SearchTopK(spark, Sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("vec_id")).toSeq }

    val input = MemoryStream[(Long, Timestamp, Seq[Float])]
    val out = Streams.streamingSearch(
      input.toDF().toDF("query_id", "ts", "qv"), corpus, k = 10, threshold = 0.2,
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("h5_search")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(qvecs.toSeq)
      q.processAllAvailable()
      // a later dummy query advances the watermark so the first batch emits
      input.addData((-899L, ts(30), qvecs.head._3))
      q.processAllAvailable()
      val got = spark.table("h5_search").collect()
        .filter(_.getAs[Long]("query_id") >= 0)
        .map(r => r.getAs[Long]("query_id") -> r.getSeq[Long](2)).toMap
      assert(got == expected)
    } finally q.stop()
  }

  test("H6: streaming session windows match the batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two users; u1 has a 31-min gap (two sessions), u2 one session; events
    // arrive out of order within the batch
    val fixture = Seq(
      (1L, 1L, ts(5), 2.0), (1L, 2L, ts(1), 1.0), (1L, 3L, ts(40), 3.0),
      (2L, 4L, ts(2), 4.0), (2L, 5L, ts(20), 5.0))
    val batchDf = fixture.toDF("user_id", "event_id", "ts", "value")
    val expected = graft.analytics.EventOps.sessionize(batchDf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start"),
        r.getAs[Long]("n_events"))).toSet

    val input = MemoryStream[(Long, Long, Timestamp, Double)]
    val out = Streams.sessionCounts(
      input.toDF().toDF("user_id", "event_id", "ts", "value"),
      gap = "30 minutes", watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("h6_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(fixture)
      q.processAllAvailable()
      // advance the watermark past every session's close (last session ends
      // at 00:40 + 30min gap = 01:10) so all sessions emit
      input.addData((9L, 99L, Timestamp.valueOf("2024-01-01 02:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("h6_sessions").collect()
        .filter(_.getAs[Long]("user_id") != 9L)
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start"),
          r.getAs[Long]("n_events"))).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("H7: stream-stream interval join matches the batch range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // u1: clicks at 00:01 and 00:05, purchase at 00:30 (both attributed)
    // and a click at 00:50 AFTER the purchase (not attributed);
    // u2: click at 00:02 but purchase at 01:20 (outside the 60-min horizon)
    val clicks = Seq(
      (1L, ts(1), 101L), (1L, ts(5), 102L), (1L, ts(50), 103L),
      (2L, ts(2), 201L))
    val purchases = Seq((1L, ts(30), 901L), (2L, Timestamp.valueOf("2024-01-01 01:20:00"), 902L))
    val cDf = clicks.toDF("user_id", "ts", "event_id")
    val pDf = purchases.toDF("user_id", "ts", "event_id")
    val expected = Streams.clickAttribution(cDf, pDf).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
    assert(expected == Set((901L, 101L), (901L, 102L)))

    val cIn = MemoryStream[(Long, Timestamp, Long)]
    val pIn = MemoryStream[(Long, Timestamp, Long)]
    val out = Streams.clickAttribution(
      cIn.toDF().toDF("user_id", "ts", "event_id"),
      pIn.toDF().toDF("user_id", "ts", "event_id"),
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("h7_attr")
      .outputMode(OutputMode.Append).start()
    try {
      cIn.addData(clicks)
      pIn.addData(purchases)
      q.processAllAvailable()
      // advance both watermarks past every event so all joined rows emit
      cIn.addData((9L, Timestamp.valueOf("2024-01-01 03:00:00"), 999L))
      pIn.addData((9L, Timestamp.valueOf("2024-01-01 03:00:00"), 998L))
      q.processAllAvailable()
      val got = spark.table("h7_attr").collect()
        .filter(_.getAs[Long]("user_id") != 9L)
        .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("H2: same-timestamp events retain the highest event_id's data (deterministic)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[MemEvent]
    val updates = Streams.ttlStateMachine(input.toDS(), ttlSeconds = 60,
      watermark = "0 seconds")
    val q = updates.writeStream.format("memory").queryName("h2_ties")
      .outputMode(OutputMode.Append).start()
    try {
      // three events at the SAME event time, out-of-id-order in the batch:
      // the retained data must be the max event_id's, like batch max_by
      input.addData(MemEvent("k1", ts(1), 7L, "mid"), MemEvent("k1", ts(1), 9L, "last"),
        MemEvent("k1", ts(1), 3L, "first"))
      q.processAllAvailable()
      val rows = spark.table("h2_ties").collect()
        .map(r => (r.getAs[String]("memory_key"), r.getAs[String]("status"),
          r.getAs[String]("data"))).toList
      assert(rows == List(("k1", "active", "last")))
    } finally q.stop()
  }
}
