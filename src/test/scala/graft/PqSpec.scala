package graft

import graft.ann.{Pq, Router}

class PqSpec extends SparkSpec {

  test("PQ top-k is well-formed: dense ranks, bounded similarity, no self-hits") {
    val rows = Pq.a5PqTopK(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Int]("rnk")).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"ranks not dense for query $q")
      rs.foreach { r =>
        assert(r.getAs[Long]("vec_id") != q, "self hit")
        val s = r.getAs[Double]("similarity")
        assert(s >= -1.000001 && s <= 1.000001, s"similarity out of range: $s")
      }
    }
  }

  test("code-table schema carries exactly Pq.M code columns (byte-model pin)") {
    // r14: Router.codeBytesOf prices a code row at M bytes because the
    // code-table SCHEMA is generated from the same constant — this pin is
    // what keeps the io pricing and the physical layout from drifting
    val e = graft.rag.Search.corpus(spark, Sf)
    val codes = Pq.encodeBatchAgainst(e, e)
    val codeCols = codes.columns.filter(_.matches("code\\d+"))
    assert(codeCols.length === Pq.M,
      s"code columns ${codeCols.mkString(",")} must number Pq.M=${Pq.M}")
    assert(Router.codeBytesOf(Pq.M) === Pq.M.toDouble)
  }

  test("PQ recall@10 is measured against full brute force and lands in [0,1]") {
    val rows = Pq.a6PqRecall(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_true") == 10L)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("k-means-trained PQ returns well-formed top-k with nonzero recall") {
    val rows = Pq.a9PqKmeansTopK(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") != r.getAs[Long]("query_id"))
      val s = r.getAs[Double]("similarity")
      assert(s >= -1.000001 && s <= 1.000001)
    }
    // recall vs exact brute force, computed in-spec (k-means not oracle-able)
    val bf = graft.rag.Search.knn(spark, Sf,
        org.apache.spark.sql.functions.col("vec_id") % 101 === 0,
        k = 10, threshold = -1.0, clampZero = false, sameLabel = false)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val hits = rows.count(r => bf((r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))))
    assert(hits > 0, "trained-codebook PQ found none of the true top-10")
  }

  test("OPQ rotation is orthogonal and its rotated-PQ recall is well-formed") {
    // R R^T = I within numerical tolerance — the property that makes the
    // rotated recall comparable to the unrotated ground truth
    val r = Pq.OpqRotation
    val n = r.length
    for (i <- 0 until n; j <- 0 until n) {
      val dot = (0 until n).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"RR^T[$i][$j] = $dot")
    }
    val rows = Pq.a11OpqRecall(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      assert(row.getAs[Long]("n_true") == 10L)
      val rec = row.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("exact re-rank never lowers recall vs pure ADC") {
    val adc = Pq.a6PqRecall(spark, Sf).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall")).toMap
    val rr = Pq.a8PqRerankRecall(spark, Sf).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall")).toMap
    assert(rr.keySet == adc.keySet)
    rr.foreach { case (q, rec) =>
      assert(rec >= adc(q), s"re-rank lowered recall for query $q: ${adc(q)} -> $rec")
    }
  }
}
