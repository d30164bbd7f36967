package graft

import graft.ann.Sq

class SqSpec extends SparkSpec {

  test("D13/D14: IVFPQ prunes inverted-list partitions and measures recall") {
    val topk = graft.ann.Pq.a13IvfPqTopK(spark, Sf)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"IVFPQ probe must partition-prune the list table:\n${plan.take(2000)}")
    val rows = topk.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 10)
      assert(r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
    }
    // compounded approximation can only lose candidates vs pure PQ at the
    // same k: IVFPQ recall <= PQ recall would NOT hold per query (list
    // pruning changes candidate sets), but recall must stay a valid ratio
    graft.ann.Pq.a14IvfPqRecall(spark, Sf).collect().foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(1) == 10L)
    }
  }

  test("D16: residual IVFPQ prunes lists and returns valid rankings") {
    val topk = graft.ann.IvfPqR.a16IvfPqResidualTopK(spark, Sf)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"residual-IVFPQ probe must partition-prune:\n${plan.take(2000)}")
    val rows = topk.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 10)
      assert(r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
    }
  }

  test("D15: PCA OPQ rotation is orthogonal and recall stays valid") {
    val r = graft.ann.Pq.pcaRotation(spark, Sf)
    // R R^T = I within numerical tolerance => cosine-preserving
    for (i <- 0 until 64; j <- 0 until 64) {
      val dot = (0 until 64).map(k => r(i)(k) * r(j)(k)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-8, s"R R^T deviates at ($i,$j): $dot")
    }
    val rec = graft.ann.Pq.a15OpqPcaRecall(spark, Sf).collect()
    assert(rec.nonEmpty)
    rec.foreach { row =>
      assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
      assert(row.getLong(1) == 10L)
    }
    // non-vacuous quality floor: a broken rotation (transposed R,
    // mis-indexed components) collapses recall to ~0 even while staying
    // orthogonal; the working pipeline clears this comfortably
    val mean = rec.map(_.getDouble(3)).sum / rec.length
    assert(mean >= 0.05, s"mean rotated-PQ recall $mean below floor")
  }

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
