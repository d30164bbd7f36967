package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {

  test("minhash-lsh emits verified pairs only (jaccard >= 0.5, a < b)") {
    val out = Dedup.d2MinhashLsh(spark, Sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("simhash near-dups are within hamming 3 and agree with minhash dups") {
    val sim = Dedup.d3Simhash(spark, Sf)
    assert(sim.filter(col("hamming") > 3).count() == 0)
  }

  test("simhash chunk blocking is pigeonhole-complete at multiple configs") {
    // hamming <= 3 bits over c equal chunks leaves >= 1 chunk equal for any
    // c > 3 — so 4x15-bit and 6x10-bit blocking must enumerate EXACTLY the
    // same near-dup pairs (neither is a sample of the other)
    val c4 = Dedup.d3SimhashChunked(spark, Sf, chunkCount = 4).collect().map(_.toSeq).toSet
    val c6 = Dedup.d3SimhashChunked(spark, Sf, chunkCount = 6).collect().map(_.toSeq).toSet
    assert(c4.nonEmpty, "fixture must exercise at least one near-dup pair")
    assert(c4 == c6, "chunk configs disagree - pigeonhole completeness broken")
    // a config that can't guarantee completeness must be rejected loudly
    intercept[IllegalArgumentException](Dedup.d3SimhashChunked(spark, Sf, chunkCount = 3))
    intercept[IllegalArgumentException](Dedup.d3SimhashChunked(spark, Sf, chunkCount = 7))
  }

  test("exact dedup partitions the corpus") {
    val d1 = Dedup.d1ExactDup(spark, Sf)
    val total = d1.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, Sf).count())
  }

  test("embedding near-dup pairs pass the cosine threshold") {
    val out = Dedup.d5EmbeddingNeardup(spark, Sf).collect()
    out.foreach(r => assert(r.getAs[Double]("similarity") >= 0.4))
  }

  test("d5 blocking dial: planes are prefix-stable, verification is dial-independent") {
    // widening the dial must never re-randomize already-pinned planes
    assert(Dedup.hyperplanes(8) == Dedup.hyperplanes(16).take(8))
    // at any bit width the dial changes only the CANDIDATE set: every
    // reported pair must carry the identical exact score the default
    // (oracle-pinned 4x4) assigns it — a dial that perturbed scores would
    // be a correctness bug, not a recall trade
    def keyed(bits: Int) = Dedup.d5EmbeddingNeardup(spark, Sf, bitsPerBand = bits)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("similarity")).toMap
    val base = keyed(4)
    Seq(2, 3).foreach { bits =>
      val dialed = keyed(bits)
      assert(dialed.nonEmpty, s"dial $bits produced no pairs on the fixture")
      dialed.keySet.intersect(base.keySet).foreach { k =>
        assert(dialed(k) == base(k), s"score drift at $bits bits on $k")
      }
    }
  }

  test("connected components handles a diameter-400 chain within the round cap") {
    import spark.implicits._
    // a path graph 0-1-2-...-400: worst case for plain neighbor propagation
    // (400 rounds); pointer jumping must collapse it in O(log d) <= 30
    val chain = (0L until 400L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain).collect()
    assert(labels.length == 401)
    labels.foreach(r => assert(r.getAs[Long]("lbl") == 0L,
      s"node ${r.getAs[Long]("doc_id")} not labeled with the component min"))
  }

  test("canonical corpus: no surviving exact dups, cluster canonicals survive, drops don't") {
    val surv = Dedup.d8CanonicalCorpus(spark, Sf)
    val n = surv.count()
    assert(surv.select("content_hash").distinct().count() == n)
    val clusters = Dedup.d6DupClusters(spark, Sf)
    val drops = clusters.filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    assert(surv.join(drops, Seq("doc_id")).count() == 0)
    val canonicals = clusters.select(col("cluster_id").as("doc_id")).distinct()
    assert(canonicals.join(surv, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("lsh recall: caught <= true pairs, recall in [0,1], and d2 pairs are a subset of truth") {
    val r = Dedup.d7LshRecall(spark, Sf).collect()(0)
    val nTrue = r.getAs[Long]("n_true_pairs")
    val nCaught = r.getAs[Long]("n_caught")
    val recall = r.getAs[Double]("recall")
    assert(nCaught <= nTrue)
    assert(recall >= 0.0 && recall <= 1.0)
    // every VERIFIED d2 pair is by construction a caught true pair
    assert(Dedup.d2MinhashLsh(spark, Sf).count() <= nCaught)
  }
}
