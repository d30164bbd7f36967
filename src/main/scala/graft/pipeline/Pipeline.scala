package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.Exact
import graft.text.TextOps

/** The composed training-data pipeline deliverable (SURVEY.md §2.P) — what
  * a data-curation run actually hands to a training job: the corpus
  * composition AFTER every filter layer, per (lang, source).
  *
  * P1 composes the keep/drop verdict (t5: exact-canonical ∧ quality ∧
  * token-band ∧ language) with the near-dup cluster drops (d6's connected
  * components over verified MinHash pairs) and reports per-(lang, source)
  * document and token counts plus each cell's share of the surviving token
  * budget — the "training mix" table every data card publishes.
  *
  * Scale shape: keep signals are one narrow pass + the content-hash window
  * (t5's plan); the near-dup drop set comes from the materialized cluster
  * table (one bucketed read, corpus-proportional anti join the planner/AQE
  * sizes); the composition aggregate is a partial-agg groupBy on a
  * handful-of-cells key, and the token-share window runs over those few
  * cells, not the corpus.
  */
object Pipeline {

  def p1TrainingMix(spark: SparkSession, dir: String): DataFrame = {
    val drops = Dedup.clusterTable(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val surv = TextOps.keepSignals(spark, dir)
      .filter(col("keep"))
      .join(drops, Seq("doc_id"), "left_anti")
    val grp = surv.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"))
    // global window over the GROUPED result — a few (lang, source) cells
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    grp.withColumn("token_share",
        Exact.ratio6(col("n_tokens"), sum(col("n_tokens")).over(w)))
      .orderBy("lang", "source")
  }

  /** P2: deterministic token-budget rebalancing — the data-MIXING op
    * (proportional capping, the DoReMi-lite recipe every pretraining
    * pipeline runs): each language is downsampled toward an equal share
    * of the total token budget. rate(L) = min(1, (T/n) / tokens(L)) in
    * exact e6 integers; a document survives iff a salted 60-bit hash of
    * its id lands under the rate — stateless Bernoulli, reproducible in
    * any engine at any shuffle order, no reservoir state.
    *
    * Scale shape: two lang-cardinality aggregates (map-side partial),
    * the rate table broadcast back, and the sample itself is ONE narrow
    * stateless filter pass over the corpus — nothing shuffles the 100 TB
    * side, and re-running yields the identical sample (auditable data
    * lineage, unlike rand()-based sampling). */
  def p2BalancedSample(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables.documents(spark, dir).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_words"))
    val tot = t.agg(sum("n_words").cast("long").as("T"),
      countDistinct("lang").as("n"))
    val tl = t.groupBy("lang").agg(sum("n_words").cast("long").as("tl"))
    val rates = tl.crossJoin(broadcast(tot))
      .withColumn("rate_e6",
        least(lit(1000000L), Exact.ratio6e(col("T"), col("n") * col("tl"))))
      .select("lang", "rate_e6")
    t.join(broadcast(rates), "lang")
      .filter(graft.functions.DetHash.h60(
        concat(lit("p2"), col("doc_id").cast("string"))) % 1000000L < col("rate_e6"))
      .select("doc_id", "lang", "n_words", "rate_e6")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_training_mix" -> ((s, d) => p1TrainingMix(s, d)),
    "p2_balanced_sample" -> ((s, d) => p2BalancedSample(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "p1_training_mix" -> (Dedup.D6ClusterCte +
      """, drops AS (
        |  SELECT doc_id FROM cluster WHERE doc_id <> cluster_id
        |), t AS (
        |  SELECT doc_id, lang, source, md5(text) AS content_hash,
        |    string_split(text, ' ') AS ws
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, source, content_hash, CAST(len(ws) AS BIGINT) AS n_words,
        |    ((2000000*(len(list_distinct(ws))) + (len(ws))) // (2*(len(ws)))) AS dr_e6,
        |    ((2000000*(len(list_filter(ws, w -> w IN ('the', 'a')))) + (len(ws))) // (2*(len(ws)))) AS sr_e6,
        |    least(((2000000*(len(ws)) + (100)) // (2*(100))), 1000000) AS ls_e6
        |  FROM t
        |), sc AS (
        |  SELECT *, (2 * (4*dr_e6 + 3*ls_e6 + 3*(1000000 - sr_e6)) + 10) // 20 AS score_e6,
        |    doc_id = min(doc_id) OVER (PARTITION BY content_hash) AS is_canonical
        |  FROM c
        |), surv AS (
        |  SELECT * FROM sc
        |  WHERE is_canonical AND score_e6 >= 500000 AND n_words BETWEEN 25 AND 80
        |    AND lang IN ('en', 'de', 'fr')
        |    AND doc_id NOT IN (SELECT doc_id FROM drops)
        |), grp AS (
        |  SELECT lang, source, count(*) AS n_docs,
        |    CAST(sum(n_words) AS BIGINT) AS n_tokens
        |  FROM surv GROUP BY lang, source
        |)
        |SELECT lang, source, n_docs, n_tokens,
        |  ((2000000*(n_tokens) + (CAST(sum(n_tokens) OVER () AS BIGINT)))
        |    // (2*(CAST(sum(n_tokens) OVER () AS BIGINT)))) / 1000000.0 AS token_share
        |FROM grp ORDER BY lang, source""").stripMargin,

    "p2_balanced_sample" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
         |  FROM documents
         |), tot AS (
         |  SELECT CAST(sum(n_words) AS BIGINT) AS T, count(DISTINCT lang) AS n FROM t
         |), tl AS (
         |  SELECT lang, CAST(sum(n_words) AS BIGINT) AS tl FROM t GROUP BY 1
         |), rates AS (
         |  SELECT lang,
         |    CAST(least(1000000, ${Exact.ratio6eSql("T", "n * tl")}) AS BIGINT) AS rate_e6
         |  FROM tl, tot
         |)
         |SELECT doc_id, t.lang, n_words, rate_e6
         |FROM t JOIN rates ON rates.lang = t.lang
         |WHERE CAST('0x' || substr(md5('p2' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |  % 1000000 < rate_e6
         |ORDER BY doc_id""".stripMargin,
  )
}
