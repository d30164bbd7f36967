package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact

/** Event-series operators (SURVEY.md §2.G, time-series extensions) — the
  * two join/segmentation shapes every telemetry/training-data pipeline
  * needs and vanilla SQL joins do badly at scale:
  *
  *  - AS-OF JOIN: for each purchase, the user's most recent prior-or-equal
  *    click. The naive formulation is an inequality join (quadratic per
  *    user); Spark has no native as-of operator. The scalable shape used
  *    here is the tagged-union window: union both streams, ONE shuffle on
  *    user_id, one in-partition sort by (ts, tag, event_id), and a running
  *    `max(click_ts)` over preceding rows — linear per user, no pair
  *    explosion, AQE-skew-splittable. (DuckDB validates via its native
  *    ASOF LEFT JOIN — same semantics, independent implementation.)
  *
  *  - SESSIONIZATION: gap>30min session splits per user via lag + running
  *    sum of boundary flags — the standard two-window formulation, same
  *    single shuffle, then a per-(user, session) aggregate. Session ids
  *    are per-user ordinals (not global), so the operator never needs a
  *    global sort at any corpus size.
  *
  * Both orderings include event_id as the final tie-break, so results are
  * bit-stable at any shuffle order (SURVEY.md §5).
  */
object EventOps {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** e1: as-of join — purchases matched to the user's latest click with
    * click_ts <= purchase_ts (left: unmatched purchases keep nulls). */
  def e1AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val tagged = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      // clicks sort BEFORE purchases at equal ts (tag 0 < 1), giving the
      // ASOF `>=` bound: an equal-ts click is visible to the purchase row
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "click", lit(0)).otherwise(lit(1)).as("tag"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("last_click_ts", max(when(col("tag") === 0, col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("last_click_ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  /** Session gap bound: a >30 minute silence starts a new session. */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** e2: sessionization — per-user ordinal sessions with start/end/count/
    * value rollup. */
  def e2Sessions(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(spark, dir))

  /** The sessionization core over ANY (user_id, event_id, ts, value) frame
    * — shared by the batch query e2 and the streaming-equivalence spec
    * (Streams.sessionCounts must produce the same sessions). */
  private[graft] def sessionize(events: DataFrame): DataFrame = {
    val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(wo))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > SessionGapUs, 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("is_new")).over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "session_no")
  }

  /** e3: sketch aggregates graded against exact answers — the 100 TB path
    * for distinct counts and percentiles is a MERGEABLE fixed-size sketch
    * (HLL registers / quantile summaries), not an exact shuffle of every
    * key: partial sketches combine map-side and never grow with
    * cardinality. Like a3/a6 grade ANN recall, this query MEASURES its own
    * sketch error instead of assuming it: each engine computes its own
    * sketch AND its own exact value, and emits whether the sketch landed in
    * the ±15% band — bit-identical booleans cross-engine without requiring
    * the (implementation-specific) sketch values themselves to match. The
    * band is sized so membership can only flip if a sketch implementation
    * is broken, not on ordinary sketch noise: Spark's HLL runs at rsd=0.02
    * (±15% = 7.5σ) and DuckDB's at its fixed ~1.6% error (~9σ), and both
    * engines' rank-error quantile summaries (accuracy 10000 ≈ 0.01% rank
    * error) sit orders of magnitude inside it — so each engine's
    * own-sketch-vs-own-exact boolean is deterministically `true` for any
    * non-adversarial distribution, and the cross-engine hash is stable.
    * EventOpsSpec additionally asserts the Spark sketch errors are <5%,
    * monitoring the actual margin. */
  def e3SketchStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val exactUsers = countDistinct(col("user_id"))
    val hll = approx_count_distinct(col("user_id"), 0.02)
    def bandOk(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
      approx >= exact * 0.85 && approx <= exact * 1.15
    ev.agg(
      count(lit(1)).as("n_events"),
      exactUsers.as("exact_users"),
      bandOk(hll.cast("double"), exactUsers.cast("double")).as("hll_ok"),
      bandOk(percentile_approx(col("value"), lit(0.5), lit(10000)),
        expr("percentile(value, 0.5)")).as("p50_ok"),
      bandOk(percentile_approx(col("value"), lit(0.95), lit(10000)),
        expr("percentile(value, 0.95)")).as("p95_ok"))
  }

  /** e4: conversion funnel — users progressing signup → click → purchase
    * in event-time order (each step at-or-after the previous user's step).
    * The ORDERED-sequence match is the part plain aggregation can't do:
    * a running earliest-signup (then earliest-qualified-click) window
    * marks, at every event, whether the prefix of the funnel is already
    * satisfied — one shuffle on user_id, one in-partition sort, two
    * stacked window passes over the same sort (no second exchange; the
    * per-user aggregate reuses the partitioning too). Output is a single
    * funnel-report row: stage counts + e6-exact conversion ratios
    * ((ts, event_id) ordering makes same-timestamp prefixes bit-stable
    * cross-engine). */
  def e4Funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stepped = Tables.events(spark, dir)
      .select("user_id", "event_id", "ts", "event_type")
      .withColumn("s_run",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("c_run",
        min(when(col("event_type") === "click" && col("s_run").isNotNull, col("ts"))).over(w))
    val per = stepped.groupBy("user_id").agg(
      min(when(col("event_type") === "signup", col("ts"))).as("t1"),
      min(when(col("event_type") === "click" && col("s_run").isNotNull, col("ts"))).as("t2"),
      min(when(col("event_type") === "purchase" && col("c_run").isNotNull, col("ts"))).as("t3"))
    per.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_signup_click"),
        sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("n_funnel"))
      .withColumn("click_conv",
        when(col("n_signup") === 0, lit(null).cast("double"))
          .otherwise(Exact.ratio6(col("n_signup_click"), col("n_signup"))))
      .withColumn("purchase_conv",
        when(col("n_signup_click") === 0, lit(null).cast("double"))
          .otherwise(Exact.ratio6(col("n_funnel"), col("n_signup_click"))))
  }

  /** e5: weekly cohort retention — users bucketed by their first-activity
    * week, then counted once per (cohort, weeks-since-cohort) cell they
    * were active in: the retention matrix every growth dashboard draws.
    * Two shuffles on user_id (first-week aggregate, then the join back —
    * co-partitioned, so AQE plans them as one lineage at scale) and a
    * distinct that carries only (user, cohort, week) triples; offsets are
    * exact integer day arithmetic on week-truncated timestamps. */
  def e5Retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "ts")
    val cohorts = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val act = ev.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_week"),
        date_trunc("week", col("ts")).as("w"))
      .distinct()
    act.groupBy(col("cohort_week"),
        (datediff(col("w"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Fixed scoring instant for e6 (after the corpus horizon; SURVEY §5.5:
    * NOW is pinned so both engines decay identically). */
  val DecayNowUs: Long = 1706745600000000L // 2024-02-01T00:00:00Z
  val HalfLifeUs: Double = 6.048e11        // 7 days

  /** e6: exponentially time-decayed engagement — the feature-pipeline
    * scoring shape (recency-weighted activity): each event contributes
    * value * 2^(-age/halflife) at a PINNED scoring instant, contributions
    * round to e6 longs and the per-user total is an EXACT integer sum —
    * bit-stable at any shuffle order, unlike summing raw decayed doubles.
    * One narrow scan + one user-keyed partial aggregate; at 100 TB the
    * decay weight is a per-row map-side expression, and because the decay
    * is exponential, yesterday's scores refresh by one multiply —
    * score(t+dt) = score(t) * 2^(-dt/halflife) + new events — the same
    * merge-don't-recompute property q23 demonstrates for sums. */
  def e6Decay(spark: SparkSession, dir: String): DataFrame = {
    val age = (lit(DecayNowUs) - unix_micros(col("ts"))).cast("double") / lit(HalfLifeUs)
    val contribE6 = round(lit(1e6) * col("value") * pow(lit(0.5), age)).cast("long")
    Tables.events(spark, dir)
      .withColumn("c_e6", contribE6)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("c_e6")).as("decay_e6"))
      .orderBy("user_id")
  }

  /** e7: semi-structured JSON extraction — the event-pipeline staple:
    * `props` is a JSON string column; the typed value extracts with the
    * codegen'd `get_json_object` path (no UDF, no per-row parser object)
    * and aggregates per event type as exact integers. At 100 TB the
    * extraction is a narrow map fused into the scan stage — schema-on-read
    * without a pre-parse ETL hop. */
  def e7JsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  /** e8: next-event transition matrix — the first-order Markov view of
    * user behavior (the input to session-flow dashboards and
    * next-event-prediction baselines): for each ordered per-user event
    * pair, count (event_type -> next_type) and its e6-exact share of the
    * source type's outgoing transitions. One shuffle on user_id for the
    * lead() ordering (the same exchange e2's sessionization uses), then a
    * |types|² aggregate — the matrix is tiny at any corpus size, and the
    * probability normalization windows over the MATRIX, not the events. */
  def e8Transitions(spark: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select("user_id", "event_id", "ts", "event_type")
      .withColumn("next_type", lead(col("event_type"), 1).over(wo))
      .filter(col("next_type").isNotNull)
    val cnt = pairs.groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
    val wt = Window.partitionBy("event_type")
    cnt.withColumn("p", graft.functions.Exact.ratio6(col("n"), sum(col("n")).over(wt)))
      .orderBy("event_type", "next_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e8_transitions" -> ((s, d) => e8Transitions(s, d)),
    "e7_json_props"  -> ((s, d) => e7JsonProps(s, d)),
    "e6_decay"       -> ((s, d) => e6Decay(s, d)),
    "e1_asof_join"   -> ((s, d) => e1AsofJoin(s, d)),
    "e2_sessions"    -> ((s, d) => e2Sessions(s, d)),
    "e3_sketch_stats" -> ((s, d) => e3SketchStats(s, d)),
    "e4_funnel"      -> ((s, d) => e4Funnel(s, d)),
    "e5_retention"   -> ((s, d) => e5Retention(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "e8_transitions" ->
      s"""WITH pairs AS (
         |  SELECT event_type,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
         |  FROM events
         |), cnt AS (
         |  SELECT event_type, next_type, count(*) AS n
         |  FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2
         |)
         |SELECT event_type, next_type, CAST(n AS BIGINT) AS n,
         |  ${graft.functions.Exact.ratio6Sql("n",
             "CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)")} AS p
         |FROM cnt ORDER BY event_type, next_type""".stripMargin,

    "e7_json_props" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e6_decay" ->
      s"""SELECT user_id, count(*) AS n_events,
         |  CAST(sum(CAST(round(1e6 * value *
         |    pow(0.5, CAST($DecayNowUs - epoch_us(ts) AS DOUBLE) / 6.048e11)) AS BIGINT))
         |    AS BIGINT) AS decay_e6
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e1_asof_join" ->
      """WITH c AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "e2_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER w AS prev_ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), numbered AS (
        |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        |  FROM flagged
        |)
        |SELECT user_id, session_no, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM numbered GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin,

    "e4_funnel" ->
      """WITH st AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) OVER w AS s_run
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), st2 AS (
        |  SELECT *,
        |    min(CASE WHEN event_type = 'click' AND s_run IS NOT NULL THEN ts END) OVER w AS c_run
        |  FROM st
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), per AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
        |    min(CASE WHEN event_type = 'click' AND s_run IS NOT NULL THEN ts END) AS t2,
        |    min(CASE WHEN event_type = 'purchase' AND c_run IS NOT NULL THEN ts END) AS t3
        |  FROM st2 GROUP BY user_id
        |), agg AS (
        |  SELECT count(*) AS n_users,
        |    CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |    CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
        |    CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel
        |  FROM per
        |)
        |SELECT n_users, n_signup, n_signup_click, n_funnel,
        |  CASE WHEN n_signup = 0 THEN NULL
        |    ELSE ((2000000*(n_signup_click) + (n_signup)) // (2*(n_signup))) / 1000000.0 END AS click_conv,
        |  CASE WHEN n_signup_click = 0 THEN NULL
        |    ELSE ((2000000*(n_funnel) + (n_signup_click)) // (2*(n_signup_click))) / 1000000.0 END AS purchase_conv
        |FROM agg""".stripMargin,

    "e5_retention" ->
      """WITH fu AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY user_id
        |), act AS (
        |  SELECT DISTINCT e.user_id, fu.cohort_week, date_trunc('week', e.ts) AS w
        |  FROM events e JOIN fu USING (user_id)
        |)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, w) / 7 AS BIGINT) AS week_offset,
        |  count(*) AS n_users
        |FROM act GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "e3_sketch_stats" ->
      """SELECT count(*) AS n_events,
        |  count(DISTINCT user_id) AS exact_users,
        |  CAST(approx_count_distinct(user_id) AS DOUBLE)
        |    BETWEEN count(DISTINCT user_id) * 0.85 AND count(DISTINCT user_id) * 1.15 AS hll_ok,
        |  approx_quantile(value, 0.5)
        |    BETWEEN quantile_cont(value, 0.5) * 0.85 AND quantile_cont(value, 0.5) * 1.15 AS p50_ok,
        |  approx_quantile(value, 0.95)
        |    BETWEEN quantile_cont(value, 0.95) * 0.85 AND quantile_cont(value, 0.95) * 1.15 AS p95_ok
        |FROM events""".stripMargin,
  )
}
