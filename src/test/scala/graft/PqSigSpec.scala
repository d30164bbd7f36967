package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ann.Pq

/** In-place regeneration freshness for the PQ artifact caches (r17,
  * verdict r16 #2): codesTable (pqcodes), the default-nlists ivfPqTable,
  * and the trained-codebook paths cache by (path, DATA SIGNATURE) — a
  * corpus regenerated IN PLACE at a different dimension within one live
  * session re-derives subDimOf from the new data, and before 7d1ef78 the
  * path-keyed tables then joined fresh-width LUTs against stale-width
  * codes with no schema error: silently wrong ADC scores. This spec is
  * the missing executable proof: generate at dim 32, serve, regenerate
  * the SAME path at dim 64, and pin the in-place result row-identical to
  * a never-cached fresh-directory compute of the identical corpus.
  */
class PqSigSpec extends SparkSpec {

  /** RouterDimSpec's deterministic clustered-corpus construction: seeded
    * by dim only, so two writes of the same dim are content-identical —
    * which is exactly what lets the fresh-dir twin act as the oracle. */
  private def writeCorpus(dir: String, dim: Int, n: Int, k: Int = 16): Unit = {
    val rnd = new java.util.Random(20260816L + dim)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / nrm)
    }
    val centers = Array.fill(k)(unit())
    val rows = (0 until n).map { i =>
      val c = centers(i % k)
      val v = c.map(x =>
        x + 0.35f * rnd.nextGaussian().toFloat / math.sqrt(dim).toFloat)
      Row(i.toLong, v.toSeq, i % k % 10)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def rowsOf(df: DataFrame): Seq[Row] = df.collect().toSeq

  test("in-place dim regeneration serves fresh PQ artifacts, not cached-width tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqsig").toString
    writeCorpus(dir, dim = 32, n = 600)
    val sig32 = Pq.srcSignature(dir)
    assert(Pq.subDimOf(spark, dir) === 32 / Pq.M)
    // build + serve every cached artifact flavor at dim 32: pqcodes (a5),
    // default-nlists ivfPqTable (a13), and the composed a22 serving shape
    val r32 = rowsOf(Pq.a5PqTopK(spark, dir))
    assert(r32.nonEmpty)
    rowsOf(Pq.a13IvfPqTopK(spark, dir)): Unit

    // regenerate the SAME path at dim 64 within the SAME session
    writeCorpus(dir, dim = 64, n = 600)
    assert(Pq.srcSignature(dir) !== sig32,
      "regeneration must move the data signature or every cache aliases")
    assert(Pq.subDimOf(spark, dir) === 64 / Pq.M)

    // oracle: the identical dim-64 corpus in a NEVER-CACHED fresh dir
    val fresh = java.nio.file.Files.createTempDirectory("graft_pqsig_fresh").toString
    writeCorpus(fresh, dim = 64, n = 600)

    // a5: pqcodes codesTable freshness — a stale dim-32 code table joined
    // against dim-64 LUTs changes ADC scores silently; row-identity to the
    // fresh-dir compute is the whole claim
    val inPlace5 = rowsOf(Pq.a5PqTopK(spark, dir))
    val fresh5 = rowsOf(Pq.a5PqTopK(spark, fresh))
    assert(inPlace5 === fresh5, "a5 served a stale-signature pqcodes table")
    assert(inPlace5 !== r32,
      "dim-64 regeneration produced the dim-32 answer — cache not keyed by data")

    // a13: the default-nlists ivfPqTable branch (the one branch that was
    // path-keyed before 7d1ef78)
    assert(rowsOf(Pq.a13IvfPqTopK(spark, dir)) ===
      rowsOf(Pq.a13IvfPqTopK(spark, fresh)),
      "a13 served a stale-signature default-nlists ivfPq table")

    // a22: the production two-stage serving shape composes codes + exact
    // rerank over the regenerated corpus
    assert(rowsOf(Pq.a22IvfPqRerank(spark, dir)) ===
      rowsOf(Pq.a22IvfPqRerank(spark, fresh)),
      "a22 composed a stale cached artifact after in-place regeneration")
  }

  test("k-means-trained codebook cache (pqkcb/pqkcodes) is signature-keyed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pqsig_km").toString
    writeCorpus(dir, dim = 32, n = 400)
    rowsOf(Pq.a9PqKmeansTopK(spark, dir)): Unit
    writeCorpus(dir, dim = 64, n = 400)
    val fresh = java.nio.file.Files.createTempDirectory("graft_pqsig_kmf").toString
    writeCorpus(fresh, dim = 64, n = 400)
    // deterministic seeded training on identical bytes: in-place == fresh
    assert(rowsOf(Pq.a9PqKmeansTopK(spark, dir)) ===
      rowsOf(Pq.a9PqKmeansTopK(spark, fresh)),
      "a9 served a stale-signature trained codebook or code table")
  }
}
