package graft

import graft.dedup.Dedup
import graft.rag.Search

/** Auto-mode entry points (r11, verdict #2): the d5OperatingPoint chooser
  * — the closed form that THROWS on infeasible operating points — must be
  * what a pipeline caller actually hits, not a helper beside a literal
  * default. These specs prove (a) the auto path is exactly the explicit
  * path at the chooser's dials, (b) the oracle-registered queries still
  * run the pinned literal defaults untouched by auto mode, and (c) the
  * infeasibility throw is reachable THROUGH the auto entry. */
class DedupAutoSpec extends SparkSpec {

  private def pairKey(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
      r.getAs[Double]("similarity")).toMap

  test("d5 auto == d5 explicit at the chooser's operating point") {
    val n = graft.Tables.embeddings(spark, Sf).count()
    val (bits, bands) = Dedup.d5OperatingPoint(n, 0.4, 0.5, 1024L)
    val auto = pairKey(Dedup.d5EmbeddingNeardupAuto(spark, Sf).collect())
    val explicitly =
      pairKey(Dedup.d5EmbeddingNeardup(spark, Sf, bits, bands, 0.4).collect())
    assert(auto.nonEmpty, "fixture must produce near-dup pairs")
    assert(auto == explicitly,
      s"auto path at ($bits x $bands) diverged from the explicit dials")
  }

  test("oracle-registered d5/r5b still run the pinned 4x4 literals") {
    // The registered queries are what the driver hashes at its pinned
    // scales: their output must be byte-equal to the explicit 4x4 call,
    // proving registration did not silently route through auto mode
    // (whose dials vary with the corpus count).
    val regD5 = pairKey(SparkEntry.queries("d5_embedding_neardup")(spark, Sf).collect())
    val litD5 = pairKey(Dedup.d5EmbeddingNeardup(spark, Sf).collect())
    assert(regD5 == litD5, "registered d5 drifted from the pinned 4x4 default")
    val regR5b = SparkEntry.queries("r5b_find_similar_blocked")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    val litR5b = Search.r5bFindSimilarBlocked(spark, Sf)
      .collect().map(_.toSeq).toSeq
    assert(regR5b == litR5b, "registered r5b drifted from the pinned 4x4 default")
  }

  test("r5b auto == r5b explicit at the chooser's operating point") {
    val n = Search.corpus(spark, Sf).count()
    val (bits, bands) = Dedup.d5OperatingPoint(n, 0.3, 0.5, 1024L)
    val auto = Search.r5bFindSimilarBlockedAuto(spark, Sf)
      .collect().map(_.toSeq).toSeq
    val explicitly = Search.r5bFindSimilarBlocked(spark, Sf, bits, bands)
      .collect().map(_.toSeq).toSeq
    assert(auto.nonEmpty, "fixture must produce blocked neighbors")
    assert(auto == explicitly,
      s"r5b auto path at ($bits x $bands) diverged from the explicit dials")
  }

  test("infeasible operating points throw THROUGH the auto entry") {
    // targetBucket=1 forces r=log2(N) bits; at the loose 0.4 threshold a
    // 0.99 recall floor then needs b >> 64 bands — the auto caller must
    // get the chooser's refusal, never a silently-run quadratic.
    val ex = intercept[IllegalArgumentException](
      Dedup.d5EmbeddingNeardupAuto(spark, Sf,
        simThreshold = 0.4, recallFloor = 0.99, targetBucket = 1L))
    assert(ex.getMessage.contains("infeasible"))
  }
}
