package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline
import graft.rag.Chunking

class PipelineSpec extends SparkSpec {

  test("P8: the audit's n_pii is exactly t10's per-doc redaction total") {
    // r14: the data-card row reports whether the shipped text was
    // redacted — composed from the same shared construction t10 grades,
    // so the two artifacts can never disagree per document
    val p8 = Pipeline.p8CurationAudit(spark, Sf).select("doc_id", "n_pii")
    val t10 = graft.text.TextOps.t10PiiScrub(spark, Sf)
      .select(col("doc_id"),
        (col("n_emails") + col("n_phones") + col("n_ips")).as("t_total"))
    val joined = p8.join(t10, "doc_id")
    assert(joined.count() === p8.count(), "every audit row must join t10")
    assert(joined.filter(col("n_pii") =!= col("t_total")).count() === 0L)
    assert(p8.filter(col("n_pii") > 0).count() > 0, "fixture must inject PII")
  }

  test("P2: balanced sampling moves the token mix toward equal shares") {
    val docs = Tables.documents(spark, Sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_words"))
    val before = docs.groupBy("lang").agg(sum("n_words").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Pipeline.p2BalancedSample(spark, Sf).collect()
    assert(sampled.nonEmpty)
    val after = sampled.groupBy(_.getString(1))
      .map { case (l, rows) => l -> rows.map(_.getLong(2)).sum }
    // every language survives, nothing is upsampled, and the dominant
    // language's share shrinks (the whole point of proportional capping)
    assert(after.keySet == before.keySet)
    after.foreach { case (l, t) => assert(t <= before(l)) }
    def share(m: Map[String, Long], l: String): Double =
      m(l).toDouble / m.values.sum
    val dominant = before.maxBy(_._2)._1
    assert(share(after.toMap, dominant) <= share(before, dominant) + 1e-9,
      "dominant language share must not grow")
    // determinism: the hash-threshold sample is identical across runs
    val again = Pipeline.p2BalancedSample(spark, Sf).collect()
    assert(sampled.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("B17: chunking covers every word with stride/overlap invariants") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = Chunking.r17Chunking(spark, Sf).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet, "every doc must chunk")
    byDoc.foreach { case (d, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // chunk ids are dense from 0; starts follow the stride
      assert(sorted.map(_.getLong(1)).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { c =>
        assert(c.getLong(2) == c.getLong(1) * Chunking.Stride)
        assert(c.getLong(3) >= 1 && c.getLong(3) <= Chunking.ChunkWords)
      }
      // coverage: last chunk reaches the end of the document
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) == docs(d),
        s"doc $d: chunks must cover through the last word")
      // overlap: consecutive chunks share words whenever the earlier one
      // extends past the next start (stride < chunk width)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) + a.getLong(3) >= b.getLong(2),
            s"doc $d: gap between chunks ${a.getLong(1)} and ${b.getLong(1)}")
        case _ =>
      }
    }
  }

  test("P3: packing is contiguous per shard and covers every token") {
    val rows = Pipeline.p3SequencePacking(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (src, docs) =>
      val sorted = docs.sortBy(_.getLong(0))
      // offsets are the running sum: doc i starts where doc i-1 ended
      var expected = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) == expected,
          s"shard $src doc ${r.getLong(0)}: offset ${r.getLong(3)} != $expected")
        expected += r.getLong(2)
        // sequence ids match the integer arithmetic
        assert(r.getLong(4) == r.getLong(3) / Pipeline.PackBudget)
        assert(r.getLong(5) == (r.getLong(3) + r.getLong(2) - 1) / Pipeline.PackBudget)
        assert(r.getBoolean(6) == (r.getLong(5) > r.getLong(4)))
      }
    }
    // some docs must cross a boundary at a 256-token budget (docs are
    // 25-80 words, so roughly every third boundary doc crosses)
    assert(rows.exists(_.getBoolean(6)), "no doc crosses a sequence boundary")
  }

  test("P3b: packed-sequence table reassembles every sequence and document") {
    val B = Pipeline.PackBudget
    val spans = Pipeline.p3bPackedSequences(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))) // source, seq_id, doc_id, seq_pos, doc_off, span_len
    assert(spans.nonEmpty)
    // every sequence except each shard's LAST is filled to exactly the
    // budget by non-overlapping, gap-free spans in seq_pos order
    spans.groupBy(s => (s._1, s._2)).foreach { case ((src, seq), ss) =>
      val lastSeq = spans.filter(_._1 == src).map(_._2).max
      val sorted = ss.sortBy(_._4)
      var pos = 0L
      sorted.foreach { s =>
        assert(s._4 == pos, s"shard $src seq $seq: span starts at ${s._4}, expected $pos")
        pos += s._6
      }
      if (seq < lastSeq) assert(pos == B, s"shard $src seq $seq holds $pos of $B tokens")
      else assert(pos <= B)
    }
    // every document's spans tile the document: doc_offs are contiguous
    // from 0 and span lengths sum to the doc's token count
    val words = Pipeline.p3SequencePacking(spark, Sf).collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2)).toMap
    spans.groupBy(s => (s._1, s._3)).foreach { case ((src, doc), ss) =>
      val sorted = ss.sortBy(_._5)
      var off = 0L
      sorted.foreach { s => assert(s._5 == off); off += s._6 }
      assert(off == words((src, doc)),
        s"doc $doc spans cover $off of ${words((src, doc))} tokens")
    }
  }

  test("P4: temperature sampling moves shares toward sqrt-share targets") {
    val docs = Tables.documents(spark, Sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_words"))
    val before = docs.groupBy("lang").agg(sum("n_words").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Pipeline.p4TemperatureSample(spark, Sf).collect()
    assert(out.nonEmpty)
    // rates: bounded, and inversely ordered with language size (the
    // sqrt rule downsamples high-resource langs harder)
    val rates = out.map(r => r.getString(1) -> r.getLong(3)).toMap
    rates.values.foreach(r => assert(r > 0 && r <= 1000000L))
    val ordered = before.toSeq.sortBy(_._2)
    ordered.sliding(2).foreach {
      case Seq((l1, _), (l2, _)) =>
        // a language can legitimately vanish from the sample (every doc
        // hashed above its keep rate); only compare rates both present
        (rates.get(l1), rates.get(l2)) match {
          case (Some(r1), Some(r2)) =>
            assert(r1 >= r2, s"smaller lang $l1 must keep a rate >= larger lang $l2")
          case _ =>
        }
      case _ =>
    }
    // but the sample as a whole must retain most languages
    assert(rates.size >= before.size - 1, s"too many languages vanished: ${rates.keySet}")
    // determinism
    val again = Pipeline.p4TemperatureSample(spark, Sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("P1s/P5s: sampled-chain twins obey the conservative laws") {
    // r15 (the d6s/d8s rule composed one level further): sampled drops
    // ⊆ full drops, so every (lang, source) cell of the sampled training
    // mix carries AT LEAST the full mix's docs and tokens — the twin is
    // a conservative superset of the shipped mix, never one missing a
    // survivor the full chain keeps
    val full = Pipeline.p1TrainingMix(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    val sampled = Pipeline.p1sTrainingMixSampled(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(sampled.nonEmpty)
    full.foreach { case (cell, (nd, nt)) =>
      val (sd, st) = sampled.getOrElse(cell, fail(s"cell $cell vanished"))
      assert(sd >= nd && st >= nt, s"cell $cell shrank: $sd/$st < $nd/$nt")
    }
    // p5s: a sampled leaking cluster's members sit inside ONE full
    // cluster (refinement), so mapping its id through the full
    // assignment must land on a cluster p5 also reports — the twin can
    // under-report leakage, never invent it
    val fullAsg = graft.dedup.Dedup.d6DupClusters(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val p5Ids = Pipeline.p5SplitLeakage(spark, Sf).collect()
      .map(_.getAs[Long]("cluster_id")).toSet
    Pipeline.p5sSplitLeakageSampled(spark, Sf).collect().foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      assert(p5Ids.contains(fullAsg(cid)),
        s"sampled leak cluster $cid has no full-chain counterpart")
    }
  }

  test("P8s: sampled audit obeys the conservative law per document") {
    // r16 (verdict r15 #1, the last sf100d conversion): sampled drops ⊆
    // full drops, so per doc p8s.neardup_drop ⇒ p8.neardup_drop and
    // p8.final_keep ⇒ p8s.final_keep; every OTHER flag is byte-identical
    // (same shared constructions), and the token column is the raw ksig
    // count — equal to n_words for every doc
    val full = Pipeline.p8CurationAudit(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val sampled = Pipeline.p8sCurationAuditSampled(spark, Sf).collect()
    assert(sampled.length === full.size, "one audit row per input document")
    val nWords = Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var narrowed = 0
    sampled.foreach { s =>
      val d = s.getAs[Long]("doc_id")
      val f = full(d)
      assert(s.getAs[Boolean]("keep_quality") === f.getAs[Boolean]("keep_quality"))
      assert(s.getAs[Boolean]("contaminated") === f.getAs[Boolean]("contaminated"))
      assert(s.getAs[Boolean]("is_eval") === f.getAs[Boolean]("is_eval"))
      assert(s.getAs[Long]("n_pii") === f.getAs[Long]("n_pii"))
      // conservative direction only: sampled may MISS a drop, never add
      if (s.getAs[Boolean]("neardup_drop"))
        assert(f.getAs[Boolean]("neardup_drop"), s"doc $d: twin invented a drop")
      if (f.getAs[Boolean]("final_keep"))
        assert(s.getAs[Boolean]("final_keep"), s"doc $d: twin lost a keeper")
      if (s.getAs[Boolean]("neardup_drop") != f.getAs[Boolean]("neardup_drop"))
        narrowed += 1
      assert(s.getAs[Long]("n_tokens") === nWords(d))
    }
    // non-vacuity: the fixture must exercise the drop layer at all (the
    // implication direction above is what the law pins; whether the
    // 1-in-13 sample narrows THIS fixture is data, not contract)
    assert(full.values.count(_.getAs[Boolean]("neardup_drop")) > 0,
      "fixture has no near-dup drops — the law was not exercised")
  }

  test("P5: every reported leak really spans splits; report is complete") {
    import graft.functions.DetHash
    val leaks = Pipeline.p5SplitLeakage(spark, Sf).collect()
    // recompute the split rule locally and cross-check each reported row
    def split(docId: Long): String = {
      val b = DetHash.h60Local(s"split$docId") % 10
      if (b < 8) "train" else if (b == 8) "val" else "test"
    }
    val clusters = graft.dedup.Dedup.clusterTable(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = clusters.groupBy(_._2)
    val trueLeaks = byCluster.filter { case (_, ms) =>
      ms.map(m => split(m._1)).distinct.size > 1
    }
    assert(leaks.map(_.getLong(0)).toSet == trueLeaks.keySet,
      "report must list exactly the clusters spanning >1 split")
    leaks.foreach { r =>
      val members = byCluster(r.getLong(0)).map(_._1)
      assert(r.getLong(1) == members.length)
      val splits = members.map(split).distinct.sorted
      assert(r.getLong(2) == splits.size)
      assert(r.getString(3) == splits.mkString(","))
    }
  }
}
