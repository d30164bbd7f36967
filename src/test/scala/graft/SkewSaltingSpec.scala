package graft

import org.apache.spark.sql.functions._

/** Skew handling (SURVEY.md §6): a hot memory key at 100 TB would overload
  * one reducer in the upsert's groupBy. The mitigation — beyond AQE's
  * automatic skew-split — is two-stage salted aggregation: partial-agg on
  * (key, salt), final-agg on key. This spec proves the salted plan is
  * RESULT-IDENTICAL to the direct aggregation on skewed data, so the
  * technique can be applied at scale without changing semantics.
  */
class SkewSaltingSpec extends SparkSpec {

  test("salted two-stage aggregation equals direct aggregation on skewed keys") {
    import spark.implicits._
    // 90% of rows share one hot key
    val rows = (1 to 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"key${i % 97}"
      (k, i.toLong, s"v$i")
    }
    val df = rows.toDF("memory_key", "event_id", "props")

    val direct = df.groupBy("memory_key")
      .agg(count(lit(1)).as("access_count"),
        max("event_id").as("last_event"),
        max_by(col("props"), col("event_id")).as("data"))

    val SaltBuckets = 16
    val salted = df.withColumn("salt", pmod(col("event_id"), lit(SaltBuckets)))
      .groupBy("memory_key", "salt")
      .agg(count(lit(1)).as("c"),
        max("event_id").as("m"),
        max_by(col("props"), col("event_id")).as("d"))
      .groupBy("memory_key")
      .agg(sum("c").as("access_count"),
        max("m").as("last_event"),
        max_by(col("d"), col("m")).as("data"))

    val a = direct.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val b = salted.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(a == b)
  }
}
