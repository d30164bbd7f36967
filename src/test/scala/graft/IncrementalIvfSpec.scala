package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.rag.Search

/** D20: incremental IVF append — the property that makes the O(batch)
  * refresh SOUND: assignment is row-local against the centroid artifact,
  * so existing-index ∪ appended-batch must equal a full rebuild exactly.
  */
class IncrementalIvfSpec extends SparkSpec {

  test("incremental append == full rebuild, list by list") {
    val e = Search.corpus(spark, Sf)
    val full = Ann.listAssignment(e).select("vec_id", "list_id")
    val existing = Ann.listAssignment(e.filter(!Ann.A20NewBatch), Some(e))
      .select("vec_id", "list_id")
    val appended = Ann.listAssignment(e.filter(Ann.A20NewBatch), Some(e))
      .select("vec_id", "list_id")
    val union = existing.unionByName(appended)
    assert(union.count() == full.count())
    assert(union.exceptAll(full).isEmpty && full.exceptAll(union).isEmpty,
      "incrementally built index must equal the full rebuild")
    // the new batch is genuinely non-empty and disjoint from existing
    assert(appended.count() > 0)
    assert(existing.join(appended, "vec_id").isEmpty)
  }

  test("a20 report: totals match the corpus, every list accounted for") {
    val e = Search.corpus(spark, Sf)
    val out = Ann.a20IncrementalIvf(spark, Sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(3)).sum == e.count())
    out.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) + r.getLong(2))
    }
  }
}
