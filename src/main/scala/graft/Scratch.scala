package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, dir)
    val ws = split(col("text"), " ")
    val sh4 = array_distinct(transform(sequence(lit(1), size(ws) - 3),
      i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
        element_at(ws, i + 2), element_at(ws, i + 3))))
    time("docs")(docs.count())
    time("shingle explode")(docs.select(col("doc_id"), explode(sh4).as("s")).count())
    val ex = docs.select(col("doc_id"), col("lang"),
      (col("n_chars") / 200).cast("long").as("len_bucket"), explode(sh4).as("s"))
    time("self-join")(ex.as("x").join(ex.as("y"),
      col("x.s") === col("y.s") && col("x.lang") === col("y.lang") &&
        col("x.len_bucket") === col("y.len_bucket") &&
        col("x.doc_id") < col("y.doc_id")).count())
    // variant: posexplode + window lead shingles (codegen, no HOF)
    import org.apache.spark.sql.expressions.Window
    val w2 = docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val led = w2
      .withColumn("w1", lead(col("w"), 1).over(win))
      .withColumn("w2", lead(col("w"), 2).over(win))
      .withColumn("w3", lead(col("w"), 3).over(win))
      .filter(col("w3").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("w"), col("w1"), col("w2"), col("w3")).as("s"))
      .distinct()
    time("lead-shingles")(led.count())
    time("d4 full")(graft.dedup.Dedup.d4NgramJaccard(spark, dir).count())
    time("d5 full")(graft.dedup.Dedup.d5EmbeddingNeardup(spark, dir).count())
    spark.stop()
  }
}
