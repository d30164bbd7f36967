package graft

import org.apache.spark.sql.functions._

import graft.rag.{Mmr, Search}

class MmrSpec extends SparkSpec {

  test("B16: MMR keeps the top hit, dedups the set, and diversifies") {
    val mmr = Mmr.r16MmrRerank(spark, Sf).collect()
    assert(mmr.nonEmpty)
    val plain = Search.knn(spark, Sf, col("vec_id") % 101 === 0, k = Mmr.TopK,
        threshold = -1.0, clampZero = false, sameLabel = false)
      .collect().groupBy(_.getLong(0))
    val byQuery = mmr.groupBy(_.getLong(0))
    assert(byQuery.keySet == plain.keySet)
    byQuery.foreach { case (q, rows) =>
      val ranked = rows.sortBy(_.getInt(4))
      assert(ranked.map(_.getInt(4)).toSeq == (1 to ranked.length))
      // rank 1 is the plain top-1 (empty set => pure relevance argmax)
      assert(ranked.head.getLong(1) ==
        plain(q).minBy(r => (-r.getDouble(2), r.getLong(1))).getLong(1))
      // no duplicates in the selection
      val ids = ranked.map(_.getLong(1))
      assert(ids.distinct.length == ids.length)
      // mmr_score is non-increasing is NOT guaranteed (the diversity term
      // shifts per round); relevance stays within the shortlist bounds
      ranked.foreach(r => assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
    }
    // determinism across runs
    val again = Mmr.r16MmrRerank(spark, Sf).collect()
    assert(mmr.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("B16: on a near-dup-heavy corpus MMR lowers in-set redundancy") {
    // average (over queries) of the mean pairwise cosine within the
    // selected set: MMR's set must be no more redundant than plain top-k
    import spark.implicits._
    val e = Search.corpus(spark, Sf)
      .select(col("vec_id"), col("v"), col("nrm")).as[(Long, Seq[Float], Double)]
      .collect().map { case (id, v, n) =>
        id -> v.map(x => if (n == 0) 0.0 else x / n).toArray
      }.toMap
    def meanPairSim(sets: Map[Long, Array[Long]]): Double = {
      val per = sets.values.map { ids =>
        val pairs = for {
          i <- ids.indices; j <- (i + 1) until ids.length
        } yield e(ids(i)).zip(e(ids(j))).map { case (a, b) => a * b }.sum
        if (pairs.isEmpty) 0.0 else pairs.sum / pairs.length
      }
      per.sum / per.size
    }
    val mmrSets = Mmr.r16MmrRerank(spark, Sf).collect()
      .groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)) }
    val plainSets = Search.knn(spark, Sf, col("vec_id") % 101 === 0, k = Mmr.TopK,
        threshold = -1.0, clampZero = false, sameLabel = false)
      .collect().groupBy(_.getLong(0)).map { case (q, r) => q -> r.map(_.getLong(1)) }
    assert(meanPairSim(mmrSets) <= meanPairSim(plainSets) + 1e-9,
      "MMR selection must not be more redundant than plain top-k")
  }
}
