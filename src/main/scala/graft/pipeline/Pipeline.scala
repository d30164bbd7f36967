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

  def p1TrainingMix(spark: SparkSession, dir: String): DataFrame =
    trainingMix(spark, dir, Dedup.clusterTable(spark, dir))

  /** P1s (r15): the training mix with the drop set from the SAMPLED
    * clustering ([[Dedup.clusterTableSampled]]) — the d6s/d8s rule
    * composed one level further, converting p1's sf100d
    * spark_disk_bound exclusion (the full d2 pair stream) into a graded
    * verdict. Conservative-mix law (spec-pinned): sampled drops ⊆ full
    * drops, so every (lang, source) cell's n_docs/n_tokens is >= p1's. */
  def p1sTrainingMixSampled(spark: SparkSession, dir: String): DataFrame =
    trainingMix(spark, dir, Dedup.clusterTableSampled(spark, dir))

  /** P-FULL (r17, verdict r16 #8): the composed deliverables over the
    * FULL multipass clustering ([[Dedup.clusterTableMultipass]]) — the
    * registered p1/p5 exactly (spec-pinned equal at sf0.01), with the
    * drop layer's verify join paid in bounded residue passes instead of
    * the one job that was sf100d's spark_disk_bound wall. p8f keeps
    * p8s's RAW token column (d13's scrub stays the documented DuckDB
    * wall) but takes its near-dup drops from the FULL clustering —
    * dropping the one conservative narrowing the sampled twin had to
    * make, so every flag in the audit is the full chain's. */
  def p1TrainingMixFull(spark: SparkSession, dir: String,
                        passes: Int, staging: String): DataFrame =
    trainingMix(spark, dir, Dedup.clusterTableMultipass(spark, dir, passes, staging))

  def p5SplitLeakageFull(spark: SparkSession, dir: String,
                         passes: Int, staging: String): DataFrame =
    splitLeakage(spark, dir, Dedup.clusterTableMultipass(spark, dir, passes, staging))

  def p8fCurationAuditFull(spark: SparkSession, dir: String,
                           passes: Int, staging: String): DataFrame =
    curationAudit(spark, dir,
      Dedup.clusterTableMultipass(spark, dir, passes, staging), cleanToks = None)

  /** The Pipeline-owned full-chain staged oracles: the SAME registered
    * tails over [[Dedup.StagedClusterCte]]'s cluster/shx names (merged
    * with Dedup's by graft.DedupFull; compared by tools/d6_full_check.py). */
  private[graft] lazy val stagedChainOracles: Map[String, String] = Map(
    "p1_training_mix_full" -> (Dedup.StagedClusterCte + P1MixSqlTail),
    "p5_split_leakage_full" -> (Dedup.StagedClusterCte + P5LeakSqlTail),
    "p8f_curation_audit_full" -> (Dedup.StagedClusterCte + Dedup.D10SharedCteBody +
      ", " + TextOps.KeepSigCteBody.stripPrefix("WITH ") +
      ", " + TextOps.PiiCteBody +
      p8AuditSqlTail(
        tokenSel = "CAST(k.n_words AS BIGINT) AS n_tokens",
        tokenJoin = "")))

  private def trainingMix(spark: SparkSession, dir: String,
                          clusters: DataFrame): DataFrame = {
    val drops = clusters
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

  /** P2: deterministic token-budget rebalancing — the data-MIXING op
    * (proportional capping, the DoReMi-lite recipe every pretraining
    * pipeline runs): each language is downsampled toward an equal share
    * of the total token budget. rate(L) = min(1, (T/n) / tokens(L)) in
    * exact e6 integers; a document survives iff a salted 60-bit hash of
    * its id lands under the rate — stateless Bernoulli, reproducible in
    * any engine at any shuffle order, no reservoir state.
    *
    * Scale shape: two lang-cardinality aggregates (map-side partial),
    * the rate table broadcast back, and the sample itself is ONE narrow
    * stateless filter pass over the corpus — nothing shuffles the 100 TB
    * side, and re-running yields the identical sample (auditable data
    * lineage, unlike rand()-based sampling). */
  def p2BalancedSample(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables.documents(spark, dir).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_words"))
    val tot = t.agg(sum("n_words").cast("long").as("T"),
      countDistinct("lang").as("n"))
    val tl = t.groupBy("lang").agg(sum("n_words").cast("long").as("tl"))
    val rates = tl.crossJoin(broadcast(tot))
      .withColumn("rate_e6",
        least(lit(1000000L), Exact.ratio6e(col("T"), col("n") * col("tl"))))
      .select("lang", "rate_e6")
    t.join(broadcast(rates), "lang")
      .filter(graft.functions.DetHash.h60(
        concat(lit("p2"), col("doc_id").cast("string"))) % 1000000L < col("rate_e6"))
      .select("doc_id", "lang", "n_words", "rate_e6")
      .orderBy("doc_id")
  }

  /** Tokens per packed training sequence (context-window budget). */
  val PackBudget = 256L

  /** P3: sequence packing — the GPT-style "concat-and-chunk" layout every
    * pretraining run materializes: documents are concatenated in doc_id
    * order within a shard and sliced into fixed [[PackBudget]]-token
    * training sequences; a document may span a boundary. The packing is
    * pure integer window arithmetic — each doc's global token offset is a
    * running sum, its first/last sequence ids are integer divisions — so
    * the layout (and the boundary-crossing report, the quantity attention
    * masking cares about) is exact and oracle-checked.
    *
    * Scale shape: packing is per-SHARD (source stands in for the shard
    * key) — one exchange on the shard key, then an ordered running sum
    * WITHIN each shard; shards pack in parallel and nothing orders the
    * global corpus. At 100 TB shard sizing (not this operator) bounds the
    * per-task window; the global-total-order alternative would be a full
    * corpus sort and is exactly what this layout avoids. */
  private def p3Offsets(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val t = graft.Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_words"))
    t.withColumn("tok_offset", sum(col("n_words")).over(w) - col("n_words"))
      .withColumn("seq_first", floor(col("tok_offset") / PackBudget).cast("long"))
      .withColumn("seq_last",
        floor((col("tok_offset") + col("n_words") - 1) / PackBudget).cast("long"))
  }

  def p3SequencePacking(spark: SparkSession, dir: String): DataFrame =
    p3Offsets(spark, dir)
      .withColumn("crosses", col("seq_last") > col("seq_first"))
      .select("doc_id", "source", "n_words", "tok_offset", "seq_first", "seq_last", "crosses")
      .orderBy("source", "doc_id")

  /** P3b: the packed-sequence table itself — the deliverable a trainer
    * reads: one row per (training sequence × document span). `seq_id`
    * is the sequence within the shard, `seq_pos` where the span starts
    * inside that sequence, `doc_off` where it starts inside the
    * document, `span_len` its length; a sequence is reassembled by
    * reading its rows in `seq_pos` order, and attention masking derives
    * segment boundaries from the same rows. Derived from p3's offsets by
    * exploding each document over [seq_first, seq_last] — a narrow
    * per-row explode AFTER the per-shard running sum, so the plan adds
    * NO exchange to p3's; output size is O(total_tokens/budget + docs)
    * (each sequence contributes its span rows, each doc at least one). */
  def p3bPackedSequences(spark: SparkSession, dir: String): DataFrame = {
    val B = PackBudget
    p3Offsets(spark, dir)
      .withColumn("seq_id", explode(sequence(col("seq_first"), col("seq_last"))))
      .withColumn("seq_pos", greatest(col("tok_offset") - col("seq_id") * B, lit(0L)))
      .withColumn("doc_off", greatest(col("seq_id") * B - col("tok_offset"), lit(0L)))
      .withColumn("span_len",
        least((col("seq_id") + 1) * B, col("tok_offset") + col("n_words"))
          - greatest(col("seq_id") * B, col("tok_offset")))
      .select("source", "seq_id", "doc_id", "seq_pos", "doc_off", "span_len")
      .orderBy("source", "seq_id", "seq_pos")
  }

  /** P4: temperature-scaled language sampling (the multilingual mixing
    * rule from XLM-R/mT5: sample share ∝ share^α, α = 0.5) — low-resource
    * languages are upweighted RELATIVELY by sampling high-resource ones
    * down toward the sqrt-share distribution. Target share q_L =
    * sqrt(tokens_L)/Σ sqrt(tokens_L); keep rate r_L = min(1, q_L·T /
    * tokens_L). sqrt is the one FP step — both engines use the IEEE
    * correctly-rounded sqrt — immediately pinned to an e6 integer; every
    * ratio after is exact decimal arithmetic, and the Bernoulli keep is
    * p2's salted-hash rule (stateless, reproducible at any shuffle
    * order, auditable lineage).
    *
    * Scale shape: identical to p2 — two lang-cardinality aggregates, a
    * broadcast rate table, ONE narrow filter pass over the corpus. */
  def p4TemperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables.documents(spark, dir).select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_words"))
    val tl = t.groupBy("lang").agg(sum("n_words").cast("long").as("tl"))
      .withColumn("s_e6", round(sqrt(col("tl").cast("double")) * 1e6).cast("long"))
    val tot = tl.agg(sum("tl").cast("decimal(38,0)").as("T"),
      sum("s_e6").cast("decimal(38,0)").as("S"))
    val rates = tl.crossJoin(broadcast(tot))
      .withColumn("rate_e6", least(lit(1000000L),
        Exact.ratio6e(col("s_e6").cast("decimal(38,0)") * col("T"),
          col("S") * col("tl").cast("decimal(38,0)")).cast("long")))
      .select("lang", "rate_e6")
    t.join(broadcast(rates), "lang")
      .filter(graft.functions.DetHash.h60(
        concat(lit("p4"), col("doc_id").cast("string"))) % 1000000L < col("rate_e6"))
      .select("doc_id", "lang", "n_words", "rate_e6")
      .orderBy("doc_id")
  }

  /** P5: cross-split leakage audit — the data-quality gate a train/val/
    * test split must pass BEFORE training: no near-duplicate pair may
    * straddle two splits (a test doc whose near-dup sits in train is
    * silent eval contamination, d10's within-corpus sibling). Split
    * assignment is the deterministic salted-hash 80/10/10 rule (the split
    * itself is reproducible lineage, as p2); the near-dup relation is the
    * materialized d6 cluster table. The report lists every cluster whose
    * members span >1 split — empty report == clean split.
    *
    * Scale shape: split is a stateless per-row expression over the
    * bucketed cluster table; the audit is one partial-agg groupBy on
    * cluster_id. Nothing touches document content — ids and hashes only. */
  def p5SplitLeakage(spark: SparkSession, dir: String): DataFrame =
    splitLeakage(spark, dir, Dedup.clusterTable(spark, dir))

  /** P5s (r15): the leakage audit over the SAMPLED clustering — every
    * sampled leaking cluster maps into a full leaking cluster (its
    * members sit inside ONE full cluster by the d6s refinement law, and
    * a split disagreement among a subset is one in the superset), so the
    * twin can under-report but never invent leakage; spec-pinned. */
  def p5sSplitLeakageSampled(spark: SparkSession, dir: String): DataFrame =
    splitLeakage(spark, dir, Dedup.clusterTableSampled(spark, dir))

  private def splitLeakage(spark: SparkSession, dir: String,
                           clusters: DataFrame): DataFrame = {
    val bucket = graft.functions.DetHash.h60(
      concat(lit("split"), col("doc_id").cast("string"))) % 10L
    val split = when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
    clusters
      .withColumn("split", split)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"),
        array_join(array_sort(collect_set(col("split"))), ",").as("splits"))
      .filter(col("n_splits") > 1)
      .orderBy("cluster_id")
  }

  /** Eval quota per (lang, source) stratum. */
  val HoldoutK = 3

  /** P6: stratified held-out set construction — the EXACT-quota sampling
    * primitive the Bernoulli ops (p2/p4) cannot express: exactly
    * [[HoldoutK]] documents per (lang, source) stratum (all of them when
    * the stratum is smaller), picked by salted-hash order so the holdout
    * is deterministic, uniform within strata, and auditable — the
    * standard recipe for an eval set that covers every corpus cell
    * instead of mirroring its skew.
    *
    * Scale shape: one exchange on the stratum key, then a per-stratum
    * ordered rank. Spark 4 plans per-partition WindowGroupLimit BEFORE
    * the exchange for the rank<=K filter, so only ~K rows per
    * (stratum, input-partition) ever shuffle — the corpus never sorts
    * globally and the full window never materializes. */
  def p6StratifiedHoldout(spark: SparkSession, dir: String): DataFrame = {
    val h = graft.functions.DetHash.h60(
      concat(lit("p6"), col("doc_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "source").orderBy(col("h"), col("doc_id"))
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("h", h)
      .withColumn("pick_order", row_number().over(w))
      .filter(col("pick_order") <= HoldoutK)
      .select("doc_id", "lang", "source", "pick_order")
      .orderBy("lang", "source", "pick_order")
  }

  /** The token budget for p7: small enough that every scale factor's
    * corpus exceeds it, so the cut always selects a strict prefix. */
  val TokenBudget = 1500L

  /** P7: token-budget quality selection — the curation cut behind
    * "train on the best N tokens": documents ranked by the t2/t9 quality
    * score (ties on doc_id) are taken in order until the cumulative
    * whitespace-token count reaches the budget. Rank and the exact
    * global running token total both come from
    * [[graft.operators.GlobalRank.withRunningTotal]] — the range-sort +
    * per-partition (count, sum) offset scheme, never a single-partition
    * window; the budget test `cum_tokens <= B` is then a row-local
    * integer filter, bit-identical to DuckDB's windowed cumulative sum.
    * The budget doubles as withRunningTotal's `cumCap`: partitions whose
    * token offset already exceeds it are dropped BEFORE the window
    * exchange, so the per-row running-sum work is O(selected tokens),
    * not O(corpus) — the property that makes a "best N tokens of
    * 100 TB" cut cheap. */
  def p7TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextOps.e6Scored(spark, dir)
      .select(col("doc_id"), col("score_e6"), col("n_words").as("tokens"))
    val (ranked, _, _) = graft.operators.GlobalRank.withRunningTotal(
      scored, Seq(col("score_e6").desc, col("doc_id")),
      valueCol = "tokens", rankCol = "rank", cumCol = "cum_tokens",
      cumCap = TokenBudget)
    ranked.filter(col("cum_tokens") <= TokenBudget)
      .select(col("doc_id"),
        (col("score_e6").cast("double") / 1000000.0).as("quality_score"),
        col("tokens"), col("rank"), col("cum_tokens"))
      .orderBy("rank")
  }

  /** P8 (r13): the per-document CURATION AUDIT — the composed end-to-end
    * verdict a corpus release ships beside the data ("why is / isn't this
    * document in the training set"): every filter layer the engine
    * implements, joined into ONE row per input document with reason-coded
    * flags —
    *
    *  - `keep_quality`: t5's verdict (exact-canonical ∧ quality score ∧
    *    token band ∧ language allowlist);
    *  - `neardup_drop`: the document lost its MinHash-LSH near-dup
    *    cluster election (d6's connected components, non-canonical);
    *  - `contaminated`: it shares >= [[Dedup.D10MinShared]] rare 3-gram
    *    shingles with a held-out eval document (d10);
    *  - `is_eval`: it IS held-out eval data (never trainable);
    *  - `final_keep`: all of the above compose;
    *  - `n_tokens_clean`: the token count AFTER d13's substring-level
    *    span scrub — the number the surviving corpus actually
    *    contributes to a token budget;
    *  - `n_pii`: how many PII instances (emails + phones + IPs) t10's
    *    scrub redacted from the shipped text (r14 — the row says not
    *    just why a doc lives or dies but whether its text was altered).
    *
    * Scale shape: every input is an artifact the engine already
    * maintains — keep signals (one narrow pass + content-hash window),
    * the bucketed cluster table, d10's bounded-df index probe, d13's
    * windowed scrub, t10's per-doc redaction counts — and the
    * composition itself is five doc_id
    * equi-joins the planner sizes (the flag sides are corpus-fraction
    * sets; AQE broadcasts while they fit). Nothing here adds a shuffle
    * the layers didn't already own, so the audit costs the sum of its
    * parts at 100 TB, not a new join topology. */
  def p8CurationAudit(spark: SparkSession, dir: String): DataFrame =
    curationAudit(spark, dir, Dedup.clusterTable(spark, dir),
      cleanToks = Some(Dedup.d13ScrubbedCorpus(spark, dir)
        .select(col("doc_id"), col("n_tokens_kept").as("n_tokens_clean"))))

  /** P8s (r16, verdict r15 #1): the audit over the SAMPLED clustering —
    * the last `spark_disk_bound` exclusion at sf100d converted by the
    * d6s/p1s rule. Two deliberate narrowings, both spec-pinned:
    * `neardup_drop` comes from [[Dedup.clusterTableSampled]] (sampled
    * drops ⊆ full drops, so per doc p8s.neardup_drop ⇒ p8.neardup_drop
    * and p8.final_keep ⇒ p8s.final_keep — the twin may keep a doc the
    * full audit drops, never the reverse); and the token column is the
    * RAW whitespace count `n_tokens` (ksig's n_words), not d13's
    * `n_tokens_clean` — the substring scrub is the documented DuckDB
    * wall at 5M docs (CORRECTNESS_SF100D oracle_infeasible), and keeping
    * it would trade the spark_disk_bound exclusion for an
    * oracle_infeasible one instead of a graded verdict. The scrub totals
    * stay graded through d13's own entry at the decades DuckDB reaches.
    * Every other flag (keep_quality, contaminated, is_eval, n_pii) is
    * byte-identical to p8's — same shared constructions. */
  def p8sCurationAuditSampled(spark: SparkSession, dir: String): DataFrame =
    curationAudit(spark, dir, Dedup.clusterTableSampled(spark, dir),
      cleanToks = None)

  private def curationAudit(spark: SparkSession, dir: String,
                            clusters: DataFrame,
                            cleanToks: Option[DataFrame]): DataFrame = {
    val sig = TextOps.keepSignals(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        col("keep").as("keep_quality"), col("n_words"))
    val drops = clusters
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id")).withColumn("nd", lit(true))
    val contam = Dedup.d10Decontamination(spark, dir)
      .select(col("train_doc_id").as("doc_id")).distinct()
      .withColumn("ct", lit(true))
    // r14 (verdict r13 #7): whether the shipped text was REDACTED —
    // t10's per-class counts folded to one n_pii per doc, shared-CTE
    // rule like the other layers (TextOps.PiiCteBody on the SQL side),
    // one more doc_id equi-join on an artifact that already exists
    val pii = TextOps.piiCounted(spark, dir)
      .select(col("doc_id"),
        (col("n_emails") + col("n_phones") + col("n_ips")).as("n_pii"))
    val base = sig.join(drops, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
    val withToks = cleanToks match {
      case Some(t) => base.join(t, Seq("doc_id"))
      case None    => base.withColumn("n_tokens", col("n_words"))
    }
    val tokCol = if (cleanToks.isDefined) "n_tokens_clean" else "n_tokens"
    withToks
      .join(pii, Seq("doc_id"))
      .withColumn("neardup_drop", coalesce(col("nd"), lit(false)))
      .withColumn("contaminated", coalesce(col("ct"), lit(false)))
      .withColumn("is_eval", col("doc_id") % Dedup.D10EvalMod === 0)
      .withColumn("final_keep", col("keep_quality") && !col("neardup_drop") &&
        !col("contaminated") && !col("is_eval"))
      .select("doc_id", "lang", "source", "keep_quality", "neardup_drop",
        "contaminated", "is_eval", "final_keep", tokCol, "n_pii")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p8_curation_audit" -> ((s, d) => p8CurationAudit(s, d)),
    "p8s_curation_audit_sampled" -> ((s, d) => p8sCurationAuditSampled(s, d)),
    "p7_token_budget" -> ((s, d) => p7TokenBudget(s, d)),
    "p6_stratified_holdout" -> ((s, d) => p6StratifiedHoldout(s, d)),
    "p1_training_mix" -> ((s, d) => p1TrainingMix(s, d)),
    "p1s_training_mix_sampled" -> ((s, d) => p1sTrainingMixSampled(s, d)),
    "p2_balanced_sample" -> ((s, d) => p2BalancedSample(s, d)),
    "p3_sequence_packing" -> ((s, d) => p3SequencePacking(s, d)),
    "p3b_packed_sequences" -> ((s, d) => p3bPackedSequences(s, d)),
    "p4_temperature_sample" -> ((s, d) => p4TemperatureSample(s, d)),
    "p5_split_leakage" -> ((s, d) => p5SplitLeakage(s, d)),
    "p5s_split_leakage_sampled" -> ((s, d) => p5sSplitLeakageSampled(s, d)),
  )


  /** p1's SELECT tail over a `cluster` CTE — shared by the full and
    * sampled training-mix oracles so the formula cannot drift. */
  private lazy val P1MixSqlTail: String =
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
        |FROM grp ORDER BY lang, source""".stripMargin

  /** p8's audit SELECT over `cluster`/`shared`/`ksig`/`piicnt` CTEs —
    * shared by the full and sampled oracles so the FLAGS formula cannot
    * drift; only the token column (d13's scrubbed count vs ksig's raw
    * count) and its join are parameterized. */
  private def p8AuditSqlTail(tokenSel: String, tokenJoin: String): String =
    s"""
       |, drops AS (
       |  SELECT doc_id FROM cluster WHERE doc_id <> cluster_id
       |), contam AS (
       |  SELECT DISTINCT train_doc_id AS doc_id FROM shared
       |)
       |SELECT k.doc_id, k.lang, k.source,
       |  (k.is_canonical AND k.score_e6 >= 500000 AND k.n_words BETWEEN 25 AND 80
       |    AND k.lang IN ('en', 'de', 'fr')) AS keep_quality,
       |  (dr.doc_id IS NOT NULL) AS neardup_drop,
       |  (ct.doc_id IS NOT NULL) AS contaminated,
       |  (k.doc_id % ${Dedup.D10EvalMod} = 0) AS is_eval,
       |  ((k.is_canonical AND k.score_e6 >= 500000 AND k.n_words BETWEEN 25 AND 80
       |    AND k.lang IN ('en', 'de', 'fr'))
       |   AND dr.doc_id IS NULL AND ct.doc_id IS NULL
       |   AND k.doc_id % ${Dedup.D10EvalMod} <> 0) AS final_keep,
       |  $tokenSel,
       |  CAST(pc.n_emails + pc.n_phones + pc.n_ips AS BIGINT) AS n_pii
       |FROM ksig k
       |LEFT JOIN drops dr ON dr.doc_id = k.doc_id
       |LEFT JOIN contam ct ON ct.doc_id = k.doc_id
       |${tokenJoin}JOIN piicnt pc ON pc.doc_id = k.doc_id
       |ORDER BY k.doc_id""".stripMargin

  /** p5's SELECT tail over a `cluster` CTE — shared full/sampled. */
  private lazy val P5LeakSqlTail: String =
    """, sp AS (
        |  SELECT cluster_id, doc_id,
        |    CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT cluster_id, doc_id,
        |          CAST('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |            % 10 AS b
        |        FROM cluster)
        |)
        |SELECT cluster_id, count(*) AS n_docs,
        |  CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
        |  array_to_string(list_sort(list(DISTINCT split)), ',') AS splits
        |FROM sp GROUP BY cluster_id
        |HAVING count(DISTINCT split) > 1
        |ORDER BY cluster_id""".stripMargin

  val oracle: Map[String, String] = Map(
    // p8: the full filter-stack composition — cluster CC (d6 chain) +
    // decontamination probe (d10 chain) + substring scrub totals (d13
    // chain) + keep signals (t5 fragment), all from the SHARED CTE
    // bodies, so no layer's formula can drift between its own oracle and
    // the composed one.
    "p8_curation_audit" -> (Dedup.D6ClusterCte + Dedup.D10SharedCteBody +
      Dedup.D13ScrubCteBody + ", " + TextOps.KeepSigCteBody.stripPrefix("WITH ") +
      ", " + TextOps.PiiCteBody +
      p8AuditSqlTail(
        tokenSel = "CAST(coalesce(a.kept_n, 0) AS BIGINT) AS n_tokens_clean",
        tokenJoin = "LEFT JOIN agg a ON a.doc_id = k.doc_id\n")),

    // p8s (r16): flags formula shared with p8 via the tail builder; the
    // cluster CTE is the sampled one and the token column is the raw
    // ksig count (d13's scrub CTE is the documented sf100d DuckDB wall)
    "p8s_curation_audit_sampled" -> (Dedup.D6sClusterCte + Dedup.D10SharedCteBody +
      ", " + TextOps.KeepSigCteBody.stripPrefix("WITH ") +
      ", " + TextOps.PiiCteBody +
      p8AuditSqlTail(
        tokenSel = "CAST(k.n_words AS BIGINT) AS n_tokens",
        tokenJoin = "")),

    "p7_token_budget" ->
      (TextOps.ScoredCteSql + s"""
         |, ranked AS (
         |  SELECT doc_id, score_e6, n_words AS tokens,
         |    CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rank,
         |    CAST(sum(n_words) OVER (ORDER BY score_e6 DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM sc
         |)
         |SELECT doc_id, score_e6 / 1000000.0 AS quality_score, tokens, rank, cum_tokens
         |FROM ranked WHERE cum_tokens <= $TokenBudget ORDER BY rank""".stripMargin),

    "p1_training_mix" -> (Dedup.D6ClusterCte + P1MixSqlTail),

    // p1s (r15): identical mix formula, drop set from the sampled
    // clustering -- converts the sf100d spark_disk_bound exclusion
    "p1s_training_mix_sampled" -> (Dedup.D6sClusterCte + P1MixSqlTail),

    "p2_balanced_sample" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
         |  FROM documents
         |), tot AS (
         |  SELECT CAST(sum(n_words) AS BIGINT) AS T, count(DISTINCT lang) AS n FROM t
         |), tl AS (
         |  SELECT lang, CAST(sum(n_words) AS BIGINT) AS tl FROM t GROUP BY 1
         |), rates AS (
         |  SELECT lang,
         |    CAST(least(1000000, ${Exact.ratio6eSql("T", "n * tl")}) AS BIGINT) AS rate_e6
         |  FROM tl, tot
         |)
         |SELECT doc_id, t.lang, n_words, rate_e6
         |FROM t JOIN rates ON rates.lang = t.lang
         |WHERE CAST('0x' || substr(md5('p2' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |  % 1000000 < rate_e6
         |ORDER BY doc_id""".stripMargin,

    "p6_stratified_holdout" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, source,
         |    ${graft.functions.DetHash.h60Sql("'p6' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents
         |)
         |SELECT doc_id, lang, source, pick_order FROM (
         |  SELECT doc_id, lang, source,
         |    row_number() OVER (PARTITION BY lang, source ORDER BY h, doc_id) AS pick_order
         |  FROM h)
         |WHERE pick_order <= $HoldoutK
         |ORDER BY lang, source, pick_order""".stripMargin,

    "p3_sequence_packing" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, source, n_words,
         |    CAST(sum(n_words) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_words AS BIGINT) AS tok_offset
         |  FROM t
         |)
         |SELECT doc_id, source, n_words, tok_offset,
         |  CAST(tok_offset // $PackBudget AS BIGINT) AS seq_first,
         |  CAST((tok_offset + n_words - 1) // $PackBudget AS BIGINT) AS seq_last,
         |  ((tok_offset + n_words - 1) // $PackBudget) > (tok_offset // $PackBudget) AS crosses
         |FROM c ORDER BY source, doc_id""".stripMargin,

    "p3b_packed_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, source, n_words,
         |    CAST(sum(n_words) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_words AS BIGINT) AS tok_offset
         |  FROM t
         |), f AS (
         |  SELECT doc_id, source, n_words, tok_offset,
         |    CAST(tok_offset // $PackBudget AS BIGINT) AS seq_first,
         |    CAST((tok_offset + n_words - 1) // $PackBudget AS BIGINT) AS seq_last
         |  FROM c
         |), s AS (
         |  SELECT source, doc_id, n_words, tok_offset,
         |    unnest(generate_series(seq_first, seq_last)) AS seq_id
         |  FROM f
         |)
         |SELECT source, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
         |  CAST(greatest(tok_offset - seq_id * $PackBudget, 0) AS BIGINT) AS seq_pos,
         |  CAST(greatest(seq_id * $PackBudget - tok_offset, 0) AS BIGINT) AS doc_off,
         |  CAST(least((seq_id + 1) * $PackBudget, tok_offset + n_words)
         |    - greatest(seq_id * $PackBudget, tok_offset) AS BIGINT) AS span_len
         |FROM s ORDER BY source, seq_id, seq_pos""".stripMargin,

    "p4_temperature_sample" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
         |  FROM documents
         |), tl AS (
         |  SELECT lang, CAST(sum(n_words) AS BIGINT) AS tl,
         |    CAST(round(sqrt(CAST(sum(n_words) AS DOUBLE)) * 1e6) AS BIGINT) AS s_e6
         |  FROM t GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(tl) AS HUGEINT) AS T, CAST(sum(s_e6) AS HUGEINT) AS S FROM tl
         |), rates AS (
         |  SELECT lang,
         |    CAST(least(1000000,
         |      ${Exact.ratio6eSql("s_e6 * T", "S * tl")}) AS BIGINT) AS rate_e6
         |  FROM tl, tot
         |)
         |SELECT doc_id, t.lang, n_words, rate_e6
         |FROM t JOIN rates ON rates.lang = t.lang
         |WHERE CAST('0x' || substr(md5('p4' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |  % 1000000 < rate_e6
         |ORDER BY doc_id""".stripMargin,

    "p5_split_leakage" -> (Dedup.D6ClusterCte + P5LeakSqlTail),

    // p5s (r15): the audit over the sampled clustering (refinement
    // law: under-reports, never invents leakage)
    "p5s_split_leakage_sampled" -> (Dedup.D6sClusterCte + P5LeakSqlTail),
  )
}
