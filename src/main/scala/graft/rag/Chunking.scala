package graft.rag

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Document chunking for RAG ingestion (SURVEY.md §2.B) — the standard
  * fixed-size sliding window with overlap: 32-word chunks on a 24-word
  * stride (8 words of overlap), so no retrievable statement straddles a
  * boundary without appearing whole in a neighbor. Chunk identity is the
  * md5 of the chunk text — the downstream unit the embedder and the
  * vector index ingest (the reference embeds whole documents; production
  * RAG corpora chunk first, so the chunk table is the real ingest shape).
  *
  * Scale shape: one narrow generator pass — split, explode the stride
  * positions (sequence + explode are codegen generators; no window, no
  * shuffle), slice per chunk. Chunk rows are ~len/stride per doc; the
  * output is naturally partition-local to the input split, so at 100 TB
  * chunking is a map-only stage feeding the embed/index build.
  */
object Chunking {

  val ChunkWords = 32
  val Stride = 24

  def r17Chunking(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("len", size(col("ws")).cast("long"))
    t.select(col("doc_id"), col("ws"),
        explode(sequence(lit(0L), col("len") - 1, lit(Stride.toLong))).as("start_pos"))
      .withColumn("cw",
        slice(col("ws"), col("start_pos").cast("int") + 1, lit(ChunkWords)))
      .select(
        col("doc_id"),
        (col("start_pos") / Stride).cast("long").as("chunk_id"),
        col("start_pos"),
        size(col("cw")).cast("long").as("n_chunk_words"),
        md5(concat_ws(" ", col("cw"))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r17_chunking" -> ((s, d) => r17Chunking(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "r17_chunking" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS len
         |  FROM documents
         |), st AS (
         |  SELECT doc_id, ws, unnest(range(0, len, $Stride)) AS start_pos FROM t
         |), ch AS (
         |  SELECT doc_id, start_pos // $Stride AS chunk_id, start_pos,
         |    list_slice(ws, start_pos + 1, least(start_pos + $ChunkWords, len(ws))) AS cw
         |  FROM st
         |)
         |SELECT doc_id, chunk_id, start_pos,
         |  CAST(len(cw) AS BIGINT) AS n_chunk_words,
         |  md5(array_to_string(cw, ' ')) AS chunk_hash
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
  )
}
