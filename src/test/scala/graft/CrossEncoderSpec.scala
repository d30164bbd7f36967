package graft

import org.apache.spark.sql.functions._

import graft.rag.{CrossEncoder, Lexical}

/** B20: cross-encoder rerank plumbing — the Spark contract is the
  * deliverable (the model is a documented stub, as mm1's codec is).
  */
class CrossEncoderSpec extends SparkSpec {

  test("scorer sees exactly the shortlist pairs — O(queries × depth)") {
    val shortlist = Lexical.r15HybridRrf(spark, Sf).cache()
    val nShort = shortlist.count()
    val nQueries = shortlist.select("query_id").distinct().count()
    // the shortlist itself is depth-bounded...
    assert(nShort <= nQueries * CrossEncoder.Depth)
    // ...and every scored row is one shortlist pair: nothing beyond the
    // shortlist ever reaches the model (no corpus × query blowup)
    val scored = CrossEncoder.scoredPairs(spark, Sf).cache()
    assert(scored.count() == nShort,
      s"model scored ${scored.count()} rows, shortlist has $nShort")
    val joined = scored.select("query_id", "doc_id")
      .join(shortlist.select("query_id", "doc_id"), Seq("query_id", "doc_id"))
    assert(joined.count() == nShort)
  }

  test("rerank output: bounded, deterministic, pair-sensitive") {
    val out = CrossEncoder.r20CrossRerank(spark, Sf).cache()
    assert(out.count() > 0)
    val maxPerQuery = out.groupBy("query_id").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerQuery <= CrossEncoder.TopK)
    // deterministic: a second full evaluation produces identical rows
    val again = CrossEncoder.r20CrossRerank(spark, Sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("stub scorer: batched, deterministic, jointly pair-dependent") {
    val p = CrossEncoder.PairRecord(1L, 2L, 1, "shared words here", "shared words there")
    val s1 = CrossEncoder.scoreBatch(Seq(p)).head
    val s2 = CrossEncoder.scoreBatch(Seq(p, p)).last
    assert(s1 == s2, "score must not depend on batch composition")
    // joint sensitivity: changing EITHER side changes the score (a pure
    // bi-encoder surrogate keyed on one side would miss this)
    val sQ = CrossEncoder.scoreBatch(Seq(p.copy(qtext = "different query"))).head
    val sD = CrossEncoder.scoreBatch(Seq(p.copy(dtext = "different doc"))).head
    assert(sQ.ce_score_e6 != s1.ce_score_e6)
    assert(sD.ce_score_e6 != s1.ce_score_e6)
    // overlap dominates the hash term: identical texts beat disjoint ones
    val hi = CrossEncoder.scoreBatch(
      Seq(CrossEncoder.PairRecord(1, 2, 1, "alpha beta gamma", "alpha beta gamma"))).head
    val lo = CrossEncoder.scoreBatch(
      Seq(CrossEncoder.PairRecord(1, 2, 1, "alpha beta gamma", "delta epsilon zeta"))).head
    assert(hi.ce_score_e6 > lo.ce_score_e6)
  }
}
