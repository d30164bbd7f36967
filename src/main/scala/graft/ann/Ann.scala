package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vec
import graft.rag.Search

/** IVF approximate-nearest-neighbor search (SURVEY.md §2.D2) — the scale
  * path beyond brute force (D1 in [[graft.rag.Search]]).
  *
  * Index build: 8 deterministic coarse centroids (the vectors with
  * vec_id < 8); every vector is assigned to its nearest centroid (rounded
  * cosine, centroid-id tie-break) — the inverted lists. Query: probe the
  * nprobe=3 nearest centroids, scan only those lists, exact top-10 within.
  *
  * Scale design (§6): centroids are tiny and broadcast — assignment is a
  * narrow map over the corpus (no shuffle of the 100 TB side). The index
  * would be persisted partitioned/bucketed BY list_id, so a probe is a
  * partition-pruned scan of nprobe/nlists of the data; here the probe join
  * shuffles on list_id which models the same pruning. Real deployments scale
  * nlists ~ sqrt(N) and train centroids with k-means||; deterministic seeds
  * keep the oracle replayable.
  */
object Ann {

  def a2KnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = Search.corpus(spark, dir)  // vec_id, label, v, nrm
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val cs = round(
      when(col("nrm") * col("cnrm") === 0.0, 0.0)
        .otherwise(Vec.dotNative(col("v"), col("cv")) / (col("nrm") * col("cnrm"))), 6)
    val asg0 = e.join(broadcast(cent), lit(true)).withColumn("cs", cs)
    val wv = Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cent_id"))
    val asg = asg0.withColumn("rn", row_number().over(wv)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id").as("list_id"), col("v"), col("nrm"))
    val probes = asg0.filter(col("vec_id") % 101 === 0)
      .withColumn("rn", row_number().over(wv)).filter(col("rn") <= 3)
      .select(col("vec_id").as("query_id"), col("cent_id").as("list_id"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val sim = round(
      when(col("qnrm") * col("nrm") === 0.0, 0.0)
        .otherwise(Vec.dotNative(col("qv"), col("v")) / (col("qnrm") * col("nrm"))), 6)
    val wq = Window.partitionBy(col("query_id")).orderBy(col("similarity").desc, col("vec_id"))
    asg.join(broadcast(probes),
        asg("list_id") === probes("list_id") && col("vec_id") =!= col("query_id"))
      .withColumn("similarity", sim)
      .withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= 10)
      .select("query_id", "vec_id", "similarity", "rnk")
      .orderBy("query_id", "rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a2_knn_ivf" -> ((s, d) => a2KnnIvf(s, d)),
  )

  private def dotSql(a: String, b: String): String = Search.dotSql(a, b)

  val oracle: Map[String, String] = Map(
    "a2_knn_ivf" ->
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |en AS (SELECT vec_id, v, sqrt(${dotSql("v", "v")}) AS nrm FROM e0),
         |cent AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm FROM en WHERE vec_id < 8),
         |asg0 AS (
         |  SELECT en.vec_id, cent.cent_id, en.v, en.nrm,
         |    round(CASE WHEN en.nrm*cent.cnrm = 0 THEN 0.0
         |      ELSE ${dotSql("en.v", "cent.cv")}/(en.nrm*cent.cnrm) END, 6) AS cs
         |  FROM en, cent
         |), asg AS (
         |  SELECT vec_id, cent_id AS list_id, v, nrm FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS rn
         |    FROM asg0) WHERE rn = 1
         |), probes AS (
         |  SELECT vec_id AS query_id, cent_id AS list_id, v AS qv, nrm AS qnrm FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cent_id) AS rn
         |    FROM asg0 WHERE vec_id % 101 = 0) WHERE rn <= 3
         |), scored AS (
         |  SELECT p.query_id, a.vec_id,
         |    round(CASE WHEN p.qnrm*a.nrm = 0 THEN 0.0
         |      ELSE ${dotSql("p.qv", "a.v")}/(p.qnrm*a.nrm) END, 6) AS similarity
         |  FROM probes p JOIN asg a ON a.list_id = p.list_id AND a.vec_id <> p.query_id
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY similarity DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, vec_id, similarity, rnk FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,
  )
}
