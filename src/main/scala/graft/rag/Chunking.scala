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

  /** Stateless chunk rows from any (doc_id, text, carry...) frame —
    * generator + projections only, so it runs unchanged on a STREAMING
    * DataFrame (the H10 online ingest) and the batch r17 path. The ONE
    * place chunk boundaries are defined: r17, r18's feature index, and
    * H10 all read chunk identity from here, so they cannot drift.
    * `withText = true` additionally emits the chunk text (`ctext`) for
    * downstream embedding. */
  def chunkRows(df: DataFrame, carry: Seq[String] = Nil,
                withText: Boolean = false): DataFrame = {
    val t = df
      .select(col("doc_id") +: carry.map(col) :+ split(col("text"), " ").as("ws"): _*)
      .withColumn("len", size(col("ws")).cast("long"))
    val cw = slice(col("ws"), col("start_pos").cast("int") + 1, lit(ChunkWords))
    val base = Seq(
      col("doc_id"),
      (col("start_pos") / Stride).cast("long").as("chunk_id"),
      col("start_pos"),
      size(cw).cast("long").as("n_chunk_words"),
      md5(concat_ws(" ", cw)).as("chunk_hash"))
    val textCol = if (withText) Seq(concat_ws(" ", cw).as("ctext")) else Nil
    t.select(col("doc_id") +: carry.map(col) :+ col("ws") :+
        explode(sequence(lit(0L), col("len") - 1, lit(Stride.toLong))).as("start_pos"): _*)
      .select(base ++ textCol ++ carry.map(col): _*)
  }

  def r17Chunking(spark: SparkSession, dir: String): DataFrame =
    chunkRows(Tables.documents(spark, dir))
      .orderBy("doc_id", "chunk_id")

  /** B18: chunk-level retrieval — the composed ingest path end to end:
    * chunk (r17) -> feature-hash embed (r9's embedder) -> search. Scoring
    * is a SPARSE cosine: query and chunk signed-count features join on
    * bucket equality and the dot product is an EXACT integer sum (so is
    * each side's squared norm) — doubles appear only in the final
    * round(dot/(|q||c|), 6). This is the inverted-index sparse-vector
    * join IR engines run: cost is bounded by shared active buckets, no
    * dense 64-wide math per pair, bit-stable at any shuffle order.
    * Chunks of the query's own document are excluded; top-5 per query. */
  /** Dense signed-count feature vector (double[Dim], integer-valued) +
    * squared norm from sparse (id, bucket, s) feature rows. Integer
    * values in doubles stay EXACT below 2^53, so dots over these arrays
    * equal the sparse integer sums the oracle computes. */
  private def densify(sparse: DataFrame, keyCols: Seq[String]): DataFrame =
    sparse.groupBy(keyCols.map(col): _*)
      .agg(
        map_from_entries(collect_list(struct(col("bucket"), col("s").cast("double")))).as("m"),
        sum(col("s") * col("s")).as("n2"))
      .select(keyCols.map(col) :+
        transform(sequence(lit(0), lit(Embed.Dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("f") :+ col("n2"): _*)

  /** The chunk feature index (doc_id, chunk_id, f double[Dim], n2),
    * materialized ONCE per (session, sf-dir) bucketed by doc_id — the
    * ingest artifact a chunked RAG corpus stores (chunk -> embedding +
    * norm), built in one generator + aggregate pass. At Dim=64 retrieval
    * scans this table densely (brute-force shape, queries broadcast); at
    * web-scale dims (2^20 hash buckets) the same sparse (bucket, s) rows
    * would instead join on bucket — the inverted-postings shape — so the
    * index layout, not the scoring join, is the contract here. */
  private def chunkFeatureIndex(spark: SparkSession, dir: String): DataFrame = {
    val t = s"graft_chunkfeat_${graft.sources.Warehouse.tableSuffix(dir)}"
    synchronized {
      if (!spark.catalog.tableExists(t)) {
        // the (doc_id, chunk_id) pair rides through Embed.features' single
        // id column as a synthesized key, split back after — no re-join
        val chunks = chunkRows(Tables.documents(spark, dir), withText = true)
          .select(concat_ws("#", col("doc_id"), col("chunk_id")).as("ck"), col("ctext"))
        val cf = Embed.features(chunks, "ck", "ctext")
          .withColumn("doc_id", split_part(col("ck"), lit("#"), lit(1)).cast("long"))
          .withColumn("chunk_id", split_part(col("ck"), lit("#"), lit(2)).cast("long"))
        graft.sources.Warehouse.writeBucketed(
          densify(cf, Seq("doc_id", "chunk_id")), t, "doc_id")
      }
    }
    spark.table(t)
  }

  def r18ChunkSearch(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cf = chunkFeatureIndex(spark, dir)
    val q = densify(
      Embed.features(
        Tables.documents(spark, dir).filter(col("doc_id") % 101 === 0)
          .select(col("doc_id").as("query_id"), col("text")), "query_id", "text"),
      Seq("query_id"))
      .select(col("query_id"), col("f").as("qf"), col("n2").as("q2"))
    // dots over integer-valued doubles are exact, so this dense scan
    // reproduces the oracle's sparse integer sums bit for bit
    val dp = graft.functions.Vec.dotNative(col("qf"), col("f"))
    val sim = round(
      when(col("q2") * col("n2") === 0, 0.0)
        .otherwise(dp / (sqrt(col("q2").cast("double")) * sqrt(col("n2").cast("double")))), 6)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("similarity").desc, col("doc_id"), col("chunk_id"))
    cf.join(broadcast(q), col("doc_id") =!= col("query_id"))
      .withColumn("similarity", sim)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("query_id", "doc_id", "chunk_id", "similarity", "rnk")
      .orderBy("query_id", "rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r17_chunking" -> ((s, d) => r17Chunking(s, d)),
    "r18_chunk_search" -> ((s, d) => r18ChunkSearch(s, d)),
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

    "r18_chunk_search" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS len
         |  FROM documents
         |), st AS (
         |  SELECT doc_id, ws, unnest(range(0, len, $Stride)) AS start_pos FROM t
         |), ch AS (
         |  SELECT doc_id, start_pos // $Stride AS chunk_id,
         |    list_slice(ws, start_pos + 1, least(start_pos + $ChunkWords, len(ws))) AS cw
         |  FROM st
         |), ctok AS (
         |  SELECT doc_id, chunk_id, ${graft.functions.DetHash.h60Sql("'fh:' || w")} AS h
         |  FROM (SELECT doc_id, chunk_id, unnest(cw) AS w FROM ch)
         |), cf AS (
         |  SELECT doc_id, chunk_id, CAST(h % ${Embed.Dim} AS INT) AS bucket,
         |    sum(CASE WHEN (h // ${Embed.Dim}) % 2 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM ctok GROUP BY 1, 2, 3
         |), qtok AS (
         |  SELECT doc_id AS query_id, ${graft.functions.DetHash.h60Sql("'fh:' || w")} AS h
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |        FROM documents WHERE doc_id % 101 = 0)
         |), qf AS (
         |  SELECT query_id, CAST(h % ${Embed.Dim} AS INT) AS bucket,
         |    sum(CASE WHEN (h // ${Embed.Dim}) % 2 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM qtok GROUP BY 1, 2
         |), q2 AS (
         |  SELECT query_id, CAST(sum(s*s) AS BIGINT) AS q2 FROM qf GROUP BY 1
         |), c2 AS (
         |  SELECT doc_id, chunk_id, CAST(sum(s*s) AS BIGINT) AS c2 FROM cf GROUP BY 1, 2
         |), dp0 AS (
         |  SELECT q.query_id, c.doc_id, c.chunk_id, CAST(sum(q.s * c.s) AS BIGINT) AS dp
         |  FROM qf q JOIN cf c ON c.bucket = q.bucket AND c.doc_id <> q.query_id
         |  GROUP BY 1, 2, 3
         |), dp AS (
         |  -- rank the FULL (query, chunk) candidate set, dp = 0 where no
         |  -- bucket overlaps: the Spark side dense-scans every pair, so
         |  -- zero-overlap pairs legitimately compete for the top-5 at
         |  -- similarity 0 and both engines must rank the same set
         |  SELECT a.query_id, a.doc_id, a.chunk_id, coalesce(d.dp, 0) AS dp
         |  FROM (SELECT q.query_id, c.doc_id, c.chunk_id
         |        FROM (SELECT DISTINCT query_id FROM qf) q
         |        JOIN c2 c ON c.doc_id <> q.query_id) a
         |  LEFT JOIN dp0 d ON d.query_id = a.query_id
         |    AND d.doc_id = a.doc_id AND d.chunk_id = a.chunk_id
         |), scored AS (
         |  SELECT dp.query_id, dp.doc_id, dp.chunk_id,
         |    round(CASE WHEN q2.q2 * c2.c2 = 0 THEN 0.0
         |      ELSE CAST(dp.dp AS DOUBLE) /
         |        (sqrt(CAST(q2.q2 AS DOUBLE)) * sqrt(CAST(c2.c2 AS DOUBLE))) END, 6) AS similarity
         |  FROM dp
         |  JOIN q2 ON q2.query_id = dp.query_id
         |  JOIN c2 ON c2.doc_id = dp.doc_id AND c2.chunk_id = dp.chunk_id
         |)
         |SELECT query_id, doc_id, chunk_id, similarity, rnk FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY similarity DESC, doc_id, chunk_id) AS rnk
         |  FROM scored)
         |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
  )
}
