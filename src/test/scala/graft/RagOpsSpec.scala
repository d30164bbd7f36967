package graft

import org.apache.spark.sql.functions._

import graft.rag.RagOps

class RagOpsSpec extends SparkSpec {

  test("delete_documents removes exactly the delete set and keeps everything else") {
    val out = RagOps.r13DeleteDocuments(spark, Sf)
    assert(out.filter(col("doc_id") % 9 === 4).count() == 0)
    val total = Tables.documents(spark, Sf).count()
    val deleted = Tables.documents(spark, Sf).filter(col("doc_id") % 9 === 4).count()
    assert(out.count() == total - deleted)
  }
}
