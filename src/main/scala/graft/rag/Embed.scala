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

  /** Sparse signed-count features per (id, bucket) — the exact integer core
    * of the embedder, shared by embedText and the r9 oracle check. */
  def features(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", DetHash.h60(concat(lit("fh:"), col("w"))))
      .withColumn("bucket", (col("h") % Dim).cast("int"))
      .withColumn("sgn", when(expr("(h div 64) % 2") === 1, 1L).otherwise(-1L))
    tok.groupBy(col(idCol), col("bucket"))
      .agg(sum(col("sgn")).as("s"))
  }

  /** Add an `embedding: array<double>` column derived from `textCol`. */
  def embedText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dense = features(df, idCol, textCol).groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("s").cast("double")))).as("m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(Dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("raw"))
    dense.select(col(idCol),
      when(Vec.norm2(col("raw")) === 0.0, col("raw"))
        .otherwise(transform(col("raw"), x => x / Vec.norm2(col("raw")))).as("embedding"))
  }

  /** B9: embed all documents. The output is scalar-only (no array columns —
    * the driver's pandas compare cannot sort arrays): the dense normalized
    * embedding is materialized via embedText (plumbing exercised for real),
    * while the oracle-checkable columns are exact integer stats of the raw
    * signed-count features plus the raw L2 norm (sqrt of an exact integer —
    * correctly-rounded IEEE in both engines, so round6 is portable). */
  def r9EmbedText(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = embedText(docs, "doc_id", "text")
      .select(col("doc_id"), size(col("embedding")).as("embedding_dim"))
    val stats = features(docs, "doc_id", "text")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_active_buckets"),
        sum(abs(col("s"))).as("raw_l1"),
        round(sqrt(sum(col("s") * col("s")).cast("double")), 6).as("raw_norm"))
    emb.join(stats, "doc_id").orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r9_embed_text" -> ((s, d) => r9EmbedText(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "r9_embed_text" ->
      s"""WITH tok AS (
         |  SELECT doc_id, ${DetHash.h60Sql("'fh:' || w")} AS h
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |), feat AS (
         |  SELECT doc_id, CAST(h % $Dim AS INT) AS bucket,
         |    sum(CASE WHEN (h // $Dim) % 2 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM tok GROUP BY 1, 2
         |)
         |SELECT doc_id, $Dim AS embedding_dim,
         |  count(*) AS n_active_buckets,
         |  CAST(sum(abs(s)) AS BIGINT) AS raw_l1,
         |  round(sqrt(CAST(sum(s * s) AS DOUBLE)), 6) AS raw_norm
         |FROM feat GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
