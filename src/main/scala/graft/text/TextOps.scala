package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.DetHash

/** Text-analysis pipeline operators (SURVEY.md §2.E) over `documents`.
  *
  * All four are single-pass narrow scans — no shuffle at all (the per-doc
  * computations are codegen'd higher-order functions / regexes), so they
  * scale linearly to 100 TB with zero data movement; outputs are written
  * partition-local.
  */
object TextOps {

  private def words(c: Column): Column = split(c, " ")

  private val StopEn = Seq("the", "a", "of", "to", "in", "is", "and")
  private val StopDe = Seq("der", "die", "das", "und", "ist")
  private val StopEs = Seq("el", "los", "y", "es", "una")
  private val StopFr = Seq("le", "les", "et", "est", "une")

  private def hits(ws: Column, stops: Seq[String]): Column =
    size(filter(ws, w => w.isin(stops.map(s => s: Any): _*)))

  /** E1: n-gram/stopword-profile language ID + correctness vs the label.
    * Deterministic argmax with fixed priority tie-break (en>de>es>fr). */
  def t1LangId(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    Tables.documents(spark, dir)
      .withColumn("en_hits", hits(ws, StopEn))
      .withColumn("de_hits", hits(ws, StopDe))
      .withColumn("es_hits", hits(ws, StopEs))
      .withColumn("fr_hits", hits(ws, StopFr))
      .withColumn("pred_lang",
        when(col("en_hits") >= greatest(col("de_hits"), col("es_hits"), col("fr_hits")) &&
          col("en_hits") > 0, "en")
          .when(col("de_hits") >= greatest(col("es_hits"), col("fr_hits")) && col("de_hits") > 0, "de")
          .when(col("es_hits") >= col("fr_hits") && col("es_hits") > 0, "es")
          .when(col("fr_hits") > 0, "fr")
          .otherwise("und"))
      .withColumn("is_correct", col("pred_lang") === col("lang"))
      .withColumn("stop_ratio", round(col("en_hits").cast("double") / size(ws), 6))
      .select("doc_id", "lang", "pred_lang", "is_correct", "stop_ratio")
      .orderBy("doc_id")
  }

  /** E2: quality scoring — lexical-diversity / length / stopword ratios.
    * Components are rounded BEFORE combining so both engines fold identical
    * doubles (SURVEY.md §5.3). */
  def t2Quality(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    Tables.documents(spark, dir)
      .withColumn("n_words", size(ws).cast("long"))
      .withColumn("distinct_ratio",
        round(size(array_distinct(ws)).cast("double") / col("n_words"), 6))
      .withColumn("stop_ratio",
        round(hits(ws, Seq("the", "a")).cast("double") / col("n_words"), 6))
      .withColumn("len_score", least(round(col("n_words") / 100.0, 6), lit(1.0)))
      .withColumn("quality_score",
        round(lit(0.4) * col("distinct_ratio") + lit(0.3) * col("len_score") +
          lit(0.3) * (lit(1.0) - col("stop_ratio")), 6))
      .withColumn("is_low_quality", col("quality_score") < 0.5)
      .select("doc_id", "n_words", "distinct_ratio", "stop_ratio", "len_score",
        "quality_score", "is_low_quality")
      .orderBy("doc_id")
  }

  /** E3: token counting — whitespace tokens, regex segments (BPE-ish
    * pre-tokenizer), and the chars/4 BPE estimate. */
  def t3Tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("ws_tokens", size(words(col("text"))).cast("long"))
      .withColumn("seg_tokens", regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")))
      .withColumn("bpe_est", ceil(length(col("text")) / 4.0).cast("long"))
      .select("doc_id", "ws_tokens", "seg_tokens", "bpe_est")
      .orderBy("doc_id")

  /** E4: rolling polynomial hash fingerprint — in-order fold
    * h = (h*31 + H(w)) mod 1e9+7 over the token stream. */
  def t4Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    Tables.documents(spark, dir)
      .withColumn("fingerprint",
        aggregate(words(col("text")), lit(0L),
          (acc, w) => (acc * 31L + DetHash.h56(concat(lit("fp:"), w)) % P) % P))
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_langid"      -> ((s, d) => t1LangId(s, d)),
    "t2_quality"     -> ((s, d) => t2Quality(s, d)),
    "t3_tokens"      -> ((s, d) => t3Tokens(s, d)),
    "t4_fingerprint" -> ((s, d) => t4Fingerprint(s, d)),
  )

  private def hitsSql(stops: Seq[String]): String =
    s"len(list_filter(ws, w -> w IN (${stops.map(s => s"'$s'").mkString(", ")})))"

  val oracle: Map[String, String] = Map(
    "t1_langid" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
         |), h AS (
         |  SELECT doc_id, lang, len(ws) AS n_words,
         |    ${hitsSql(StopEn)} AS en_hits, ${hitsSql(StopDe)} AS de_hits,
         |    ${hitsSql(StopEs)} AS es_hits, ${hitsSql(StopFr)} AS fr_hits
         |  FROM t
         |)
         |SELECT doc_id, lang,
         |  CASE WHEN en_hits >= greatest(de_hits, es_hits, fr_hits) AND en_hits > 0 THEN 'en'
         |       WHEN de_hits >= greatest(es_hits, fr_hits) AND de_hits > 0 THEN 'de'
         |       WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
         |       WHEN fr_hits > 0 THEN 'fr'
         |       ELSE 'und' END AS pred_lang,
         |  (CASE WHEN en_hits >= greatest(de_hits, es_hits, fr_hits) AND en_hits > 0 THEN 'en'
         |       WHEN de_hits >= greatest(es_hits, fr_hits) AND de_hits > 0 THEN 'de'
         |       WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
         |       WHEN fr_hits > 0 THEN 'fr'
         |       ELSE 'und' END) = lang AS is_correct,
         |  round(CAST(en_hits AS DOUBLE) / n_words, 6) AS stop_ratio
         |FROM h ORDER BY doc_id""".stripMargin,

    "t2_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
         |), c AS (
         |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |    round(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6) AS distinct_ratio,
         |    round(CAST(${hitsSql(Seq("the", "a"))} AS DOUBLE) / len(ws), 6) AS stop_ratio,
         |    least(round(len(ws) / 100.0, 6), 1.0) AS len_score
         |  FROM t
         |)
         |SELECT doc_id, n_words, distinct_ratio, stop_ratio, len_score,
         |  round(0.4*distinct_ratio + 0.3*len_score + 0.3*(1.0 - stop_ratio), 6) AS quality_score,
         |  round(0.4*distinct_ratio + 0.3*len_score + 0.3*(1.0 - stop_ratio), 6) < 0.5 AS is_low_quality
         |FROM c ORDER BY doc_id""".stripMargin,

    "t3_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS seg_tokens,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t4_fingerprint" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_transform(string_split(text, ' '),
         |      w -> ${DetHash.h56Sql("'fp:' || w")} % 1000000007),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
