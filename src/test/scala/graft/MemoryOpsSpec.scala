package graft

import org.apache.spark.sql.functions._

import graft.memory.MemoryOps

class MemoryOpsSpec extends SparkSpec {

  lazy val mem = MemoryOps.memoryTable(spark, Sf).cache()

  test("upsert is latest-wins: one row per key, data from the last event") {
    val ev = Tables.events(spark, Sf)
      .withColumn("memory_key", concat(lit("u"), col("user_id"), lit(":"), col("event_type")))
    val nKeys = ev.select("memory_key").distinct().count()
    assert(mem.count() == nKeys)
    // spot-check one key: data must equal props of its max-event_id event
    val row = ev.orderBy(col("event_id").desc).limit(1).collect()(0)
    val got = mem.filter(col("memory_key") === row.getAs[String]("memory_key"))
      .select("data").collect()(0).getString(0)
    assert(got == row.getAs[String]("props"))
  }

  test("expiry semantics match policy") {
    // never-policy rows have no expires_at and are never expired
    assert(mem.filter(col("expiration_policy") === "never" &&
      (col("expires_at").isNotNull || col("is_expired"))).count() == 0)
    // absolute: expires_at == created_at + ttl
    assert(mem.filter(col("expiration_policy") === "absolute" &&
      col("expires_at") =!= expr("created_at + make_interval(0,0,0,0,0,0,ttl_seconds)"))
      .count() == 0)
    // sliding: expires_at == last_accessed_at + ttl
    assert(mem.filter(col("expiration_policy") === "sliding" &&
      col("expires_at") =!= expr("last_accessed_at + make_interval(0,0,0,0,0,0,ttl_seconds)"))
      .count() == 0)
  }

  test("get touches: access_count bumped, sliding expiry re-armed from NOW") {
    val got = MemoryOps.m2Get(spark, Sf)
    // no expired rows are returned
    assert(got.join(mem.filter(col("is_expired")), Seq("memory_key")).count() == 0)
    // sliding rows expire exactly NOW + ttl
    val bad = got.filter(col("expiration_policy") === "sliding" &&
      col("expires_at") =!= expr(
        s"TIMESTAMP '${MemoryOps.NowLit}' + make_interval(0,0,0,0,0,0,ttl_seconds)"))
    assert(bad.count() == 0)
  }

  test("stats counts reconcile") {
    val r = MemoryOps.m4Stats(spark, Sf).collect()(0)
    val total = r.getAs[Long]("total_memories")
    assert(total == mem.count())
    assert(r.getAs[Long]("n_ephemeral") + r.getAs[Long]("n_short_term") +
      r.getAs[Long]("n_long_term") + r.getAs[Long]("n_permanent") == total)
  }

  test("m8b models the data/tags/metadata update branch: replace vs merge") {
    // operations.py:127-137 — data replaced wholesale; tags/metadata
    // dict.update semantics: update key overrides, untouched keys
    // survive, new keys append; TTL fields untouched on this branch
    val rows = MemoryOps.m8bUpdateData(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getAs[String]("memory_key")
      val uid = key.stripPrefix("u").takeWhile(_.isDigit).toLong
      assert(uid % 5 == 2, s"probe-set leak: $key")
      // data: replaced (new shape, not the stored props)
      assert(r.getAs[String]("data").startsWith("{\"v\": 2, \"k\": "))
      val tags = r.getAs[String]("tags")
      // merge: the stored `user` key always survives
      assert(tags.contains(s""""user": "u$uid""""), tags)
      if (uid % 2 == 0) // override path: update's type wins, no append
        assert(tags.contains("\"type\": \"reviewed\"") && !tags.contains("stage"), tags)
      else // append path: stored type survives, new key appended
        assert(tags.contains("\"stage\": \"curated\"") &&
          !tags.contains("reviewed"), tags)
      // metadata: stored policy key survives, curated appended
      val md = r.getAs[String]("metadata")
      assert(md.contains("\"policy\": \"") && md.endsWith("\"curated\": true}"), md)
      assert(r.getAs[java.sql.Timestamp]("updated_at").toString
        .startsWith("2024-01-31"))
    }
  }
}
