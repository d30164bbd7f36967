package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ann.{Ann, Pq, Router}

/** End-to-end dim ≠ 64 proof (r15, verdict r14 #3): RouterSpec's law
  * tests pinned the byte MODEL as dimension-honest, but nothing executed
  * the full stats → route → dispatch → rerank PIPELINE over a real
  * corpus of another dimension — "the one gap between 'the formula is
  * dimension-honest' and 'the plumbing is'". This spec GENERATES a
  * clustered dim-128 corpus (the tools/clustered_embeddings.py mixture,
  * reproduced deterministically in Scala, written with the pinned
  * embeddings schema), then:
  *   1. prices it through the LIVE a21_route query and asserts every io
  *      cost equals the pure route() recomputed at dim = 128 — i.e. the
  *      stats pass fed the REAL dimension, not the 64 literal;
  *   2. dispatches aRouteTopk end-to-end and row-verifies the result
  *      against the routed family's direct plan at the routed dials —
  *      including the PQ encode path, which before r15 would have
  *      silently encoded only the first 64 dims (Pq.subDimOf);
  *   3. pins a dim-32 twin's brute io cost at exactly 1/4 of dim-128's
  *      (same n — the VecBytes term alone moves), the live-data form of
  *      RouterSpec's pure-scaling law.
  */
class RouterDimSpec extends SparkSpec {

  /** The python generator's construction at arbitrary dim, seeded:
    * k centers ~ unit sphere, vector i = center(i % k) + sigma·noise. */
  private def makeCorpus(dim: Int, n: Int, k: Int = 64,
                         sigma: Float = 0.35f): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_dim${dim}_corpus").toString
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
        x + sigma * rnd.nextGaussian().toFloat / math.sqrt(dim).toFloat)
      Row(i.toLong, v.toSeq, i % k % 10)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def ioRow(dir: String): Row =
    Router.a21Route(spark, dir).filter(col("regime") === "io").head()

  test("a dim-128 corpus routes, dispatches, and reranks on its own bytes") {
    val dir = makeCorpus(dim = 128, n = 1500)
    val io = ioRow(dir)
    val (n, occ, spl) = (io.getAs[Long]("n"),
      io.getAs[Long]("occupancy"), io.getAs[Int]("splinter"))
    assert(n === 1500L)
    // (1) the LIVE query's io costs are the pure closed form AT dim=128 —
    // a 64-literal anywhere in the stats → route plumbing lands 2x off
    val want = Router.route(n, occ, spl, 0.9, Router.IoBound, dim = 128)
    assert(io.getAs[Double]("cost_brute") === 1500.0 * 4.0 * 128.0)
    assert(io.getAs[Double]("cost_brute") === want.costBrute)
    assert(io.getAs[Double]("cost_ivf") ===
      BigDecimal(want.costIvf).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(io.getAs[String]("family") === want.family)
    // (2) full dispatch, row-verified against the routed family's direct
    // plan — every family the router can pick is covered, so this keeps
    // holding if the fixture's stats ever move the winner
    val topk = Router.aRouteTopk(spark, dir).collect()
    assert(topk.nonEmpty)
    val direct: DataFrame = want.family match {
      case "brute" => graft.rag.Search.knn(spark, dir,
        col("vec_id") % 101 === 0, k = 10, threshold = -1.0,
        clampZero = false, sameLabel = false)
      case "ivf_flat" =>
        Ann.a2KnnIvfPruned(spark, dir, nlists = want.nlists, nprobe = want.nprobe)
      case "ivf_pq_r" =>
        Pq.a22IvfPqRerank(spark, dir, nlists = want.nlists,
          nprobe = want.nprobe, rerankDepth = want.rerankDepth)
      case "pq_rerank" =>
        Pq.a7PqRerank(spark, dir, rerankDepth = want.rerankDepth)
    }
    assert(topk.sameElements(direct.collect()),
      s"dispatch (${want.family}) disagrees with its direct plan at dim=128")
    // (3) the PQ chain itself runs at the live subspace width (128/M=16):
    // encode + ADC + exact rerank end-to-end, recall sane on the
    // clustered corpus (blind-to-half-the-vector encoding collapses it)
    assert(Pq.subDimOf(spark, dir) === 128 / Pq.M)
    val rec = Pq.a8PqRerankRecall(spark, dir)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(rec >= 0.8, f"dim-128 PQ rerank recall $rec%.3f — encode likely " +
      "sliced a stale subspace width")
  }

  test("vector-payload io pricing scales with the live dim: 128 vs 32") {
    val d128 = ioRow(makeCorpus(dim = 128, n = 1200))
    val d32 = ioRow(makeCorpus(dim = 32, n = 1200))
    // same n, dim differs 4x -> the brute scan's bytes differ EXACTLY 4x
    // (cost_brute = n * 4 * dim has no other live input)
    assert(d128.getAs[Double]("cost_brute") === 4.0 * d32.getAs[Double]("cost_brute"))
  }

  test("an indivisible dim refuses the PQ subspace split loudly") {
    // dim 60: ivf/brute paths work (dim-generic dots); the PQ encode
    // would mis-slice — it must throw the named require, never encode
    val dir = makeCorpus(dim = 60, n = 200, k = 8)
    val e = intercept[IllegalArgumentException](Pq.subDimOf(spark, dir))
    assert(e.getMessage.contains("dim=60"))
  }
}
