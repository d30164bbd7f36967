package graft

import org.apache.spark.sql.functions._

import graft.ann.KmeansIvf
import graft.rag.Search

class KmeansIvfSpec extends SparkSpec {

  test("kmeans IVF returns bounded, valid, reasonably-recalled results") {
    val out = KmeansIvf.a4KnnIvfKmeans(spark, Sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sim = r.getAs[Double]("similarity")
      assert(sim >= -1.0 - 1e-9 && sim <= 1.0 + 1e-9)
      assert(r.getAs[Int]("rnk") <= KmeansIvf.TopK)
    }
    // per-query result count bounded by k
    val maxPerQuery = out.groupBy("query_id").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerQuery <= KmeansIvf.TopK)

    // recall floor vs brute force on the same query set (weakly clustered
    // synthetic data: expect imperfect but non-trivial recall)
    val bf = Search.knn(spark, Sf, col("vec_id") % 101 === 0, k = KmeansIvf.TopK,
      threshold = -1.0, clampZero = false, sameLabel = false)
      .select("query_id", "vec_id")
    val common = bf.join(out.select("query_id", "vec_id"), Seq("query_id", "vec_id")).count()
    val recall = common.toDouble / bf.count()
    assert(recall >= 0.2, s"mean recall too low: $recall")
  }
}
