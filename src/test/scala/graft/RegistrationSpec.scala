package graft

/** Registration hygiene — the r4 VERDICT found four implemented operators
  * that never made it into `SparkEntry.queries`; this spec makes that gap
  * class (and its inverses) structurally impossible to reintroduce.
  */
class RegistrationSpec extends SparkSpec {

  test("every oracle entry has a registered query (no orphaned oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL with no query: $orphans")
  }

  test("rows-only queries are exactly the documented set") {
    // each member is rows-only BY DESIGN (k-means / stub / greedy ops the
    // SQL oracle cannot reproduce) and carries its own spec — adding a
    // query without an oracle must be a conscious decision here
    val documented = Set(
      "a4_knn_ivf_kmeans",   // k-means coarse quantizer (KmeansIvfSpec)
      "a9_pq_kmeans",        // k-means PQ codebook (PqSpec)
      "a11_opq_recall",      // QR rotation (PqSpec orthogonality)
      "a15_opq_pca_recall",  // PCA rotation (PqSpec)
      "a18_ivfpqrk_topk",    // k-means coarse residual IVFPQ (IvfPqRKSpec)
      "a18_ivfpqrk_recall",  // (IvfPqRKSpec recall >= a17)
      "mm1_binary_features", // stub codec (BinarySpec)
      "r16_mmr_rerank",      // greedy selection (MmrSpec)
      "r20_cross_rerank")    // stub cross-encoder (CrossEncoderSpec)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == documented,
      s"undocumented rows-only: ${rowsOnly -- documented}; " +
        s"stale doc entries: ${documented -- rowsOnly}")
  }

  test("driver smoke contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are well-formed (driver-safe JSON keys)") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("[a-z0-9_]+"), s"query name not driver-safe: $k")
    }
  }
}
