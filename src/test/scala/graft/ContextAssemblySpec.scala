package graft

import org.apache.spark.sql.functions._

import graft.rag.RagOps

/** Locks the reference's get_relevant_context fold semantics
  * (rag/retrieval.py): append full docs in rank order; the first doc that
  * would overflow max_context_length is truncated to the remaining space
  * minus 3 with '...' ONLY if more than 100 chars remain, and assembly
  * stops either way; parts join with "\n\n". Verified here against the
  * production query output at sf0.001 by re-simulating the Python loop
  * in plain Scala on the same inputs.
  */
class ContextAssemblySpec extends SparkSpec {

  private def simulate(texts: Seq[String], maxLen: Int): (String, Int) = {
    var total = 0
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var stopped = false
    for (t <- texts if !stopped) {
      if (total + t.length > maxLen) {
        val remaining = maxLen - total
        if (remaining > 100) parts += t.take(remaining - 3) + "..."
        stopped = true
      } else {
        parts += t
        total += t.length
      }
    }
    (parts.mkString("\n\n"), parts.size)
  }

  test("context assembly matches a direct simulation of the reference loop") {
    val hits = graft.rag.Search.knn(spark, Sf, col("vec_id") % 100 === 0, k = 5,
      threshold = 0.2, clampZero = true, sameLabel = false)
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val ordered = hits.join(docs, hits("vec_id") === docs("doc_id"))
      .select(col("query_id"), col("rnk"), col("text"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
      }
    val got = RagOps.r6ContextAssembly(spark, Sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[String]("context"),
        r.getAs[Int]("docs_used"))).toSeq
    assert(got.nonEmpty)
    got.foreach { case (q, context, used) =>
      val (wantCtx, wantUsed) = simulate(ordered(q), 600)
      assert(context == wantCtx, s"query $q context mismatch")
      assert(used == wantUsed, s"query $q docs_used mismatch")
    }
  }

  test("r6s is exactly r6 restricted to the 1-in-101 query sample") {
    // r15 (verdict r14 #3): the sampled twin must BE the full run's
    // subset — same assembly over the thinned query set, never a
    // re-derivation that could drift (the d2s/d7s rule)
    val full = RagOps.r6ContextAssembly(spark, Sf).collect()
      .filter(_.getAs[Long]("query_id") % RagOps.R6sQmod == 0)
    val sampled = RagOps.r6ContextAssembly(spark, Sf, qmod = RagOps.R6sQmod)
      .collect()
    assert(sampled.nonEmpty, "vec_id 0 is always sampled")
    assert(sampled.length === full.length)
    assert(sampled.sameElements(full))
  }
}
