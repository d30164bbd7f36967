package graft

import graft.ann.Sq

class SqSpec extends SparkSpec {

  test("D12: SQ8 codes stay in 0..255 and recall beats the PQ floor") {
    val topk = Sq.sqTopK(spark, Sf).collect()
    assert(topk.nonEmpty)
    topk.foreach { r =>
      assert(r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
      assert(r.getInt(3) >= 1 && r.getInt(3) <= Sq.TopK)
    }
    val rec = Sq.a12SqRecall(spark, Sf).collect()
    assert(rec.nonEmpty)
    // 8 bits/dim against per-dim bounds reconstructs cosine tightly: at
    // spec scale recall@10 must be high (>= 0.8 per query), far above the
    // 8-byte PQ operating point this variant exists to dominate
    rec.foreach { r =>
      assert(r.getDouble(3) >= 0.8,
        s"query ${r.getLong(0)} recall ${r.getDouble(3)} below SQ8 floor")
    }
  }
}
