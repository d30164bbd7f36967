package graft

import graft.rag.Search

/** r5b (LSH-blocked find-similar) vs r5 (brute force): the blocked path's
  * scores must be bit-identical per pair, and its recall vs the brute-force
  * top-5 is MEASURED with a floor — the d7/a3 contract applied to the
  * find-similar scale path (the blocking is allowed to miss neighbors,
  * never to mis-score or invent them).
  */
class FindSimilarBlockedSpec extends SparkSpec {

  private def keyed(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[Long]("query_doc_id"), r.getAs[Long]("doc_id")) ->
      r.getAs[Double]("similarity")).toMap

  test("blocked scores match brute force per pair; recall above floor") {
    val brute = keyed(Search.r5FindSimilar(spark, Sf).collect())
    val blockedRows = Search.r5bFindSimilarBlocked(spark, Sf).collect()
    val blocked = keyed(blockedRows)
    // ranking invariants: <= k=5 neighbors per query, rnk dense 1..n (a
    // dropped rnk filter or a broken window would break one of these)
    blockedRows.groupBy(_.getAs[Long]("query_doc_id")).foreach { case (q, rs) =>
      assert(rs.length <= 5, s"query $q reports ${rs.length} > 5 neighbors")
      assert(rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to rs.length),
        s"query $q rnk values not dense 1..${rs.length}")
    }
    assert(brute.nonEmpty, "fixture must produce brute-force neighbors")
    assert(blocked.nonEmpty, "fixture must produce blocked neighbors")
    // every blocked pair that brute force also ranked must score identically
    // (same cosine formula, same clamp/round — only the candidate set and
    // hence the ranks may differ)
    val shared = blocked.keySet.intersect(brute.keySet)
    shared.foreach { k =>
      assert(blocked(k) == brute(k), s"score mismatch on $k")
    }
    // blocked must never exceed k per query or report sub-threshold scores
    blocked.foreach { case (_, s) => assert(s >= 0.3) }
    // recall of the brute-force top-5 set: measured 0.467 at sf0.001 —
    // honest for 4x4-bit banding on this corpus, whose top-5 neighbors sit
    // near the 0.3 threshold (per-band collision ~= p^4 with p = 1-theta/pi;
    // at s~0.3, p~0.6 -> ~0.13/band -> ~0.43 over 4 bands). True near-dups
    // (s >= 0.5+) collide with much higher probability — the regime the
    // blocking exists for. The floor catches a blocking regression (e.g. a
    // hyperplane or banding change), not noise: the pipeline is
    // deterministic, so the measured recall is exact and stable.
    val recall = shared.size.toDouble / brute.size
    assert(recall >= 0.4, f"blocked recall $recall%.3f below floor 0.4")
  }

  test("the inherited blocking dial changes candidates only, never scores") {
    // r10: bitsPerBand/bands are real parameters (d5's dial; the 4x4
    // default dies the d5 disk-death one decade up). Any pair a dialed
    // variant reports must carry the identical score the default assigns
    // when both rank it, and every invariant (k, dense rnk, threshold)
    // must hold at any dial.
    val base = keyed(Search.r5bFindSimilarBlocked(spark, Sf).collect())
    Seq((2, 4), (5, 4), (4, 8)).foreach { case (b, n) =>
      val rows = Search.r5bFindSimilarBlocked(spark, Sf, b, n).collect()
      assert(rows.nonEmpty, s"dial ${b}x$n produced no pairs")
      rows.groupBy(_.getAs[Long]("query_doc_id")).foreach { case (q, rs) =>
        assert(rs.length <= 5, s"dial ${b}x$n query $q has ${rs.length} > 5")
        assert(rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to rs.length))
      }
      val dialed = keyed(rows)
      dialed.foreach { case (k, s) =>
        assert(s >= 0.3)
        base.get(k).foreach(bs => assert(bs == s, s"score drift at $k, dial ${b}x$n"))
      }
    }
  }

  test("every blocked pair shares at least one band signature") {
    // the candidate generator's own invariant: a reported neighbor must
    // collide with its query in >= 1 of the 4 bands (no candidate can come
    // from anywhere else)
    import org.apache.spark.sql.functions._
    val out = Search.r5bFindSimilarBlocked(spark, Sf)
      .select(col("query_doc_id"), col("doc_id"))
    val e = Search.corpus(spark, Sf)
    val bandTensor = graft.dedup.Dedup.Hyperplanes.grouped(4).toSeq
    val bands = e.select(col("vec_id"),
        posexplode(transform(typedlit(bandTensor), band =>
          (0 until 4).map { o =>
            when(graft.functions.Vec.dotNative(col("v"), element_at(band, o + 1)) > 0.0,
              lit(1L << o)).otherwise(0L)
          }.reduce(_ + _))))
      .toDF("vec_id", "band", "bv")
    val collided = out
      .join(bands.toDF("query_doc_id", "band", "qbv"), "query_doc_id")
      .join(bands.toDF("doc_id", "band", "dbv"), Seq("doc_id", "band"))
      .filter(col("qbv") === col("dbv"))
      .select("query_doc_id", "doc_id").distinct()
    assert(out.distinct().count() == collided.count(),
      "a blocked neighbor has no shared band with its query")
  }
}
