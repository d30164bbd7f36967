package graft

import org.apache.spark.sql.functions._

import graft.analytics.EventOps

class EventOpsSpec extends SparkSpec {

  test("e3 sketch errors sit well inside the ±15% oracle band") {
    // The e3 band booleans are only cross-engine-stable if each engine's
    // sketch error is far from the band edge; monitor the real Spark-side
    // margin here (<5%, i.e. ≥3x inside the 15% band) so a sketch-accuracy
    // regression surfaces as a spec failure, not an oracle-hash flap.
    val ev = Tables.events(spark, Sf)
    val row = ev.agg(
      countDistinct(col("user_id")).cast("double").as("exact_users"),
      approx_count_distinct(col("user_id"), 0.02).cast("double").as("hll"),
      expr("percentile(value, 0.5)").as("p50"),
      percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50a"),
      expr("percentile(value, 0.95)").as("p95"),
      percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95a")
    ).collect()(0)
    def relErr(exact: Double, approx: Double): Double =
      math.abs(approx - exact) / math.abs(exact)
    assert(relErr(row.getDouble(0), row.getDouble(1)) < 0.05, "hll error")
    assert(relErr(row.getDouble(2), row.getDouble(3)) < 0.05, "p50 error")
    assert(relErr(row.getDouble(4), row.getDouble(5)) < 0.05, "p95 error")
  }

  test("e3 query emits all-true band booleans on the test data") {
    val r = EventOps.e3SketchStats(spark, Sf).collect()(0)
    assert(r.getAs[Boolean]("hll_ok"))
    assert(r.getAs[Boolean]("p50_ok"))
    assert(r.getAs[Boolean]("p95_ok"))
  }
}
