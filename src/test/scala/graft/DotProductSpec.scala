package graft

import org.apache.spark.sql.functions._

import graft.functions.Vec

class DotProductSpec extends SparkSpec {

  test("native dot matches the HOF fold bit-for-bit on real vectors") {
    val e = Tables.embeddings(spark, Sf)
    val cmp = e.select(
        Vec.dotNative(col("embedding"), col("embedding")).as("native"),
        Vec.dot(Vec.toDouble(col("embedding")), Vec.toDouble(col("embedding"))).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(cmp.count() == 0)
  }

  test("native dot handles double arrays, mixed types, and nulls") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("d", "f")
    val got = df.select(Vec.dotNative(col("d"), col("f"))).collect()(0).getDouble(0)
    assert(math.abs(got - 32.0) < 1e-12)
    val withNull = df.select(Vec.dotNative(lit(null).cast("array<double>"), col("d")))
      .collect()(0)
    assert(withNull.isNullAt(0))
  }

  test("the expression stays inside whole-stage codegen") {
    val plan = Tables.embeddings(spark, Sf)
      .select(Vec.dotNative(col("embedding"), col("embedding")).as("x"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), s"expected codegen span:\n$plan")
  }

  test("graft_dot is SQL-callable once registered") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      args => graft.functions.DotProduct(args.head, args(1)),
      "scala_udf")
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 11.0) < 1e-12)
  }
}
