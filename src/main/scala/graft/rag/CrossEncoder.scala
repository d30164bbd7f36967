package graft.rag

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** B20 (r20): cross-encoder-style reranking over the hybrid shortlist
  * (SURVEY.md §2.B) — the standard two-stage retrieval topology the
  * reference's serving path approximates with bi-encoder cosine only
  * (rag/retrieval.py:17-45): a cheap first stage (r15's BM25+kNN RRF
  * fusion) produces a depth-bounded shortlist, and an expensive pairwise
  * model scores each (query, candidate) PAIR jointly to produce the final
  * order.
  *
  * The model itself is STUBBED, exactly as mm1's codec is: this container
  * carries no transformer runtime, so a deterministic pair-interaction
  * scorer (token-overlap Jaccard + md5-derived pseudo-logit, both computed
  * over the joint pair) stands in for the forward pass. The Spark-side
  * contract is the real deliverable and is spec-tested (CrossEncoderSpec):
  *
  *  - the scorer sees ONLY shortlist×query pairs — O(queries × depth)
  *    rows, never corpus × queries (the spec counts them);
  *  - pair texts are assembled by joining the 100 TB documents side
  *    against the BROADCAST shortlist (scan-pruned, no shuffle of the
  *    corpus), then attaching the tiny per-query text map;
  *  - inference runs partition-local in bounded batches
  *    (mapPartitions + grouped(BatchSize) — the batch shape a GPU model
  *    server or mapInPandas UDF needs), no driver collect anywhere.
  */
object CrossEncoder {

  val Depth = Lexical.TopK // rerank depth = r15's emitted shortlist depth
  val TopK = 5             // final results per query
  val BatchSize = 32       // pairs per stub-model inference call

  /** One (query, candidate) pair as the model input. */
  case class PairRecord(query_id: Long, doc_id: Long, rrf_rnk: Int,
                        qtext: String, dtext: String)

  /** Pair score (e6 integer — deterministic, order-proof). */
  case class ScoredPair(query_id: Long, doc_id: Long, rrf_rnk: Int,
                        ce_score_e6: Long)

  private def tokens(s: String): Set[String] =
    s.toLowerCase.split("[^\\p{L}\\p{Nd}]+").iterator.filter(_.nonEmpty).toSet

  /** STUB cross-encoder: a real implementation would run a transformer
    * forward pass over the concatenated pair here (batched, on GPU).
    * Deterministic pair-interaction arithmetic stands in: a token-overlap
    * Jaccard (e6 integer) STRICTLY dominates (scaled by 1e6, one full
    * order above the pseudo-logit's range, so no hash value can ever
    * outrank a real Jaccard difference), and an md5-derived pseudo-logit
    * in [0, 1e6) breaks exact-Jaccard ties — both functions of the JOINT
    * (query, doc) pair, which is the defining property of a cross-encoder
    * vs the bi-encoder dot product. */
  private[graft] def scoreBatch(batch: Seq[PairRecord]): Seq[ScoredPair] =
    batch.map { p =>
      val qt = tokens(p.qtext)
      val dt = tokens(p.dtext)
      val inter = qt.intersect(dt).size.toLong
      val union = math.max(qt.union(dt).size.toLong, 1L)
      val jacE6 = inter * 1000000L / union
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest((p.qtext + "\u0000" + p.dtext).getBytes("UTF-8"))
      val logit = (java.nio.ByteBuffer.wrap(dig).getLong & Long.MaxValue) % 1000000L
      ScoredPair(p.query_id, p.doc_id, p.rrf_rnk, jacE6 * 1000000L + logit)
    }

  /** The scored shortlist×query pairs BEFORE final ranking — exposed so
    * the spec can count exactly how many rows reached the model. */
  private[graft] def scoredPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shortlist = Lexical.r15HybridRrf(spark, dir)
      .select(col("query_id"), col("doc_id"), col("rnk").as("rrf_rnk"))
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // corpus scan pruned by the broadcast shortlist: only candidate docs
    // surface their text
    val dside = docs.join(broadcast(shortlist), "doc_id")
      .select(col("query_id"), col("doc_id"), col("rrf_rnk"), col("text").as("dtext"))
    // per-query text: another broadcast-pruned scan (queries are few)
    val qtexts = docs
      .join(broadcast(shortlist.select("query_id").distinct()),
        col("doc_id") === col("query_id"))
      .select(col("query_id"), col("text").as("qtext"))
    dside.join(broadcast(qtexts), "query_id")
      .select(col("query_id"), col("doc_id"), col("rrf_rnk"), col("qtext"), col("dtext"))
      .as[PairRecord]
      .mapPartitions(_.grouped(BatchSize).flatMap(scoreBatch))
      .toDF()
  }

  /** B20: rerank r15's shortlist with the (stub) cross-encoder, keep the
    * model-ordered top-[[TopK]]. Rows-only (the stub scores are
    * engine-defined, as mm1's features are); spec-covered instead. */
  def r20CrossRerank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ce_score_e6").desc, col("doc_id"))
    scoredPairs(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select("query_id", "doc_id", "ce_score_e6", "rnk")
      .orderBy("query_id", "rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r20_cross_rerank" -> ((s, d) => r20CrossRerank(s, d)),
  )
}
