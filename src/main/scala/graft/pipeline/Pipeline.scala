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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_training_mix" -> ((s, d) => p1TrainingMix(s, d)),
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
  )
}
