package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.hugeMethodLimit", "265535")
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
    if (false) time("docs")(docs.count())
    if (false) time("shingle explode")(docs.select(col("doc_id"), explode(sh4).as("s")).count())
    val ex = docs.select(col("doc_id"), col("lang"),
      (col("n_chars") / 200).cast("long").as("len_bucket"), explode(sh4).as("s"))
    if (false) time("self-join")(ex.as("x").join(ex.as("y"),
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
    if (false) time("lead-shingles")(led.count())

    // d5 stage profiling
    import graft.functions.Vec
    import graft.dedup.Dedup
    val e5 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", Vec.norm2N(col("v"), 64))
    val bandTensor = Dedup.Hyperplanes.grouped(4).toSeq
    val bands5 = e5.select(col("vec_id"), col("v"), col("nrm"),
        posexplode(transform(typedlit(bandTensor), band =>
          (0 until 4).map { o =>
            when(aggregate(
              zip_with(Vec.toDouble(col("v")), element_at(band, o + 1), (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x) > 0.0, lit(1L << o)).otherwise(0L)
          }.reduce(_ + _))))
      .toDF("vec_id", "v", "nrm", "band", "bv")
    time("d5 bands")(bands5.count())
    val cand5 = bands5.as("x").join(bands5.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    time("d5 cand-ids")(cand5.count())
    val ver = cand5
      .join(broadcast(e5.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))), "vec_a")
      .join(broadcast(e5.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))), "vec_b")
      .withColumn("similarity",
        round(when(col("na") * col("nb") === 0.0, 0.0)
          .otherwise(graft.functions.Vec.dotN(col("va"), col("vb"), 64) / (col("na") * col("nb"))), 6))
      .filter(col("similarity") >= 0.4)
    time("d5 verify")(ver.count())
    println("[scratch] codegen spans: " + ver.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("WholeStageCodegen") || l.contains("Filter") || l.contains("Project") || l.contains("BroadcastHashJoin")).mkString(" | "))
    time("d5 full")(graft.dedup.Dedup.d5EmbeddingNeardup(spark, dir).count())
    spark.stop()

  }
}
