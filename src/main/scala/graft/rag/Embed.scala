package graft.rag

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{DetHash, Vec}

/** Deterministic feature-hashing text embedder (SURVEY.md §2.B9).
  *
  * Replaces the reference's pluggable embedders
  * (/root/reference/mcp_synaptic/rag/embeddings/{local,api}.py — text ->
  * float vector) with the public "hashing trick": each token is hashed to a
  * bucket in [0, dim) with a ±1 sign bit, signed counts are summed per
  * bucket, and the vector is L2-normalized. The embedding VALUES are not part
  * of the reference contract — the text->vector pipeline shape is.
  *
  * Scale design: explode -> groupBy(doc, bucket) -> groupBy(doc) is two
  * hash-shuffles with map-side combine, all codegen'd builtins — no UDF, no
  * driver-side loop, linear in total token count, unbounded docs.
  */
object Embed {

  val Dim = 64

  /** Add an `embedding: array<double>` column derived from `textCol`. */
  def embedText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", DetHash.h60(concat(lit("fh:"), col("w"))))
      .withColumn("bucket", (col("h") % Dim).cast("int"))
      .withColumn("sgn", when(expr("(h div 64) % 2") === 1, 1.0).otherwise(-1.0))
    val byBucket = tok.groupBy(col(idCol), col("bucket"))
      .agg(sum(col("sgn")).as("s"))
    val dense = byBucket.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("s")))).as("m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(Dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("raw"))
    dense.select(col(idCol),
      when(Vec.norm2(col("raw")) === 0.0, col("raw"))
        .otherwise(transform(col("raw"), x => x / Vec.norm2(col("raw")))).as("embedding"))
  }

  /** B9: embed all documents (rows-only check — values are engine-defined). */
  def r9EmbedText(spark: SparkSession, dir: String): DataFrame =
    embedText(Tables.documents(spark, dir), "doc_id", "text")
      .withColumn("embedding_dim", size(col("embedding")))
      .withColumn("embedding_norm", round(Vec.norm2(col("embedding")), 6))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r9_embed_text" -> ((s, d) => r9EmbedText(s, d)),
  )
}
