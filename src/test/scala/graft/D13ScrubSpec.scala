package graft

import graft.dedup.Dedup

/** d13_scrubbed_corpus (r11): the cleaned text substring-level dedup
  * ships. Oracle-gated for values; this spec pins the invariants the
  * hash can't explain — token accounting against d12's verdicts, the
  * excision actually removing the flagged positions, and the no-pair-join
  * plan contract. */
class D13ScrubSpec extends SparkSpec {

  private lazy val scrubbed = Dedup.d13ScrubbedCorpus(spark, Sf).collect()
    .map(r => r.getAs[Long]("doc_id") -> r).toMap
  private lazy val spans = Dedup.d12DupSpans(spark, Sf).collect()

  test("buffer bound is enforced: an oversized document is a named refusal") {
    // r12 verdict #5: the single-task reassembly buffer must fail fast
    // with a named error, never discover the bound as an executor OOM
    val ex = intercept[IllegalArgumentException](
      Dedup.d13ScrubbedCorpus(spark, Sf, maxDocTokens = 1L))
    assert(ex.getMessage.contains("buffer bound"),
      s"refusal must name the buffer bound: ${ex.getMessage}")
  }

  test("one row per input document, token accounting exact") {
    val docs = graft.Tables.documents(spark, Sf)
      .selectExpr("doc_id", "size(split(text, ' ')) as n")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n").toLong).toMap
    assert(scrubbed.keySet == docs.keySet, "row goal: every input doc, nothing else")
    scrubbed.foreach { case (doc, r) =>
      val kept = r.getAs[Long]("n_tokens_kept")
      val removed = r.getAs[Long]("n_tokens_removed")
      assert(kept + removed == docs(doc), s"doc $doc: $kept + $removed != ${docs(doc)}")
      val text = r.getAs[String]("clean_text")
      val n = if (text.isEmpty) 0 else text.split(" ", -1).length
      assert(n == kept, s"doc $doc: clean_text has $n tokens, accounting says $kept")
    }
  }

  test("removed mass equals the union of remove-verdict spans, and only that") {
    val removeByDoc = spans.filter(_.getAs[String]("verdict") == "remove")
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r =>
        r.getAs[Long]("span_end") - r.getAs[Long]("span_start") + 1).sum).toMap
    scrubbed.foreach { case (doc, r) =>
      // d12 spans are maximal and non-overlapping (D12SpanSpec), so the
      // removed token count must be exactly the sum of remove-span widths
      assert(r.getAs[Long]("n_tokens_removed") == removeByDoc.getOrElse(doc, 0L),
        s"doc $doc removed ${r.getAs[Long]("n_tokens_removed")} vs spans ${removeByDoc.get(doc)}")
    }
    assert(removeByDoc.nonEmpty, "fixture must exercise actual removal")
  }

  test("keep-verdict spans survive in the scrubbed text") {
    // a short duplicated span (verdict=keep) must NOT be excised: find one
    // and check its doc lost no tokens to it
    val keepOnlyDocs = spans.groupBy(_.getAs[Long]("doc_id"))
      .filter { case (_, rs) => rs.forall(_.getAs[String]("verdict") == "keep") }
      .keys
    assert(keepOnlyDocs.nonEmpty, "fixture must have a keep-only doc")
    keepOnlyDocs.foreach { doc =>
      assert(scrubbed(doc).getAs[Long]("n_tokens_removed") == 0L,
        s"keep-only doc $doc lost tokens")
    }
  }

  test("plan contract: no cartesian, excision is one anti join") {
    val plan = Dedup.d13ScrubbedCorpus(spark, Sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"pair join smuggled in:\n$plan")
    val anti = plan.linesIterator.count(_.contains("LeftAnti"))
    assert(anti == 1, s"expected exactly one anti join, found $anti:\n$plan")
  }
}
