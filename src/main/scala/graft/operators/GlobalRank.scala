package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col, count, lit, monotonically_increasing_id, shiftrightunsigned, sum, when}

/** Exact global ranking without the single-partition collapse.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY is a textbook
  * 100 TB scale-killer: Spark plans the window over ONE partition, so the
  * whole dataset funnels through a single task. The distributed-exact
  * alternative is the classic range-sort + offset scheme:
  *
  *   1. range-repartition + sort by the total order — the same parallel
  *      machinery as a global ORDER BY; ascending key ranges land in
  *      ascending partition ids — then stamp each row with
  *      monotonically_increasing_id, which encodes EXACTLY the two
  *      quantities a global rank needs: partition id in the high 31 bits
  *      and the row's position within the (sorted) partition in the low
  *      33, assigned in scan order so it follows the sort,
  *   2. count rows per partition (one long per partition, collected to
  *      the driver — O(partitions), never O(rows)),
  *   3. global rank = rows-before-my-partition (a broadcast-joined
  *      offset) + the local position decoded from the id by bit
  *      arithmetic.
  *
  * Decoding the id instead of windowing by partition id matters for the
  * plan: the checkpoint erases partitioning info (UnknownPartitioning),
  * so `row_number() OVER (PARTITION BY pid)` would force a SECOND
  * full-data exchange + sort just to re-prove a clustering the data
  * already has. The bit-decode version's post-checkpoint plan touches
  * the data once: project + broadcast join — the only exchange after
  * the range sort carries one count row per partition
  * (GlobalRankSpec asserts both no-SinglePartition and no-Window).
  *
  * The order must be TOTAL (callers supply a tie-break column such as the
  * row's id), or ranks within a tie are nondeterministic. The sorted frame
  * is localCheckpointed so the counting pass and the ranking pass see the
  * SAME partition assignment AND the same frozen ids (range boundaries
  * come from sampling; a recompute may resample) — at scale this
  * materializes only the columns the caller projected into `df`, which
  * for a ranking is the sort key plus an id.
  */
object GlobalRank {

  private val LocalPos = (1L << 33) - 1

  /** The shared prelude of every rank variant: range-sort by the total
    * order, stamp `_mid` = (partition id << 33) | position-in-partition
    * (assigned in scan order over the sorted partition), freeze with a
    * checkpoint, decode `_pid`. ALL offset arithmetic must run against
    * this one frozen frame — a recompute may resample range boundaries.
    *
    * Fault-tolerance trade: `localCheckpoint` pins the sorted (key, id)
    * projection on EXECUTOR storage and truncates lineage, so it is not
    * replayable — an executor lost between the count pass and the rank
    * pass fails the query (rerun from source), and the pinned blocks
    * occupy executor memory/disk for the frame's lifetime. That is the
    * right trade for an interactive rank (one extra write of a narrow
    * projection, no DFS round-trip).
    *
    * `reliable = true` switches to a RELIABLE checkpoint
    * (`Dataset.checkpoint`): the sorted (key, id) projection is written
    * to the SparkContext checkpoint directory (HDFS/object store on a
    * cluster) and every block is re-READABLE after an executor loss —
    * the count pass and the rank pass survive lost executors instead of
    * failing the query, and the frozen ids can never be re-assigned
    * because the frame is never recomputed. Cost: one DFS round-trip
    * write + the remote reads, which is why it is opt-in — the right
    * choice for a multi-hour budgeted-selection job over 100 TB, wrong
    * for an interactive rank. Requires `setCheckpointDir`; fails fast
    * with a named error when unset rather than surfacing Spark's
    * internal one mid-job. */
  private def sortedWithPid(df: DataFrame, order: Seq[Column], n: Int,
                            reliable: Boolean): DataFrame = {
    if (reliable)
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "GlobalRank(reliable = true) needs spark.sparkContext.setCheckpointDir " +
          "(an HDFS/DFS path on a cluster) — the reliable checkpoint is a DFS write")
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
    (if (reliable) sorted.checkpoint(true) else sorted.localCheckpoint(true))
      .withColumn("_pid", shiftrightunsigned(col("_mid"), 33).cast("int"))
  }

  /** rank = rows-before-my-partition + bit-decoded local position, 1-based. */
  private def rankExpr: Column = col("_off") + col("_mid").bitwiseAND(lit(LocalPos)) + 1L

  private def prefix(n: Int, per: Map[Int, Long]): IndexedSeq[Long] =
    (0 until n).scanLeft(0L)((acc, p) => acc + per.getOrElse(p, 0L))

  private def partitionsOrDefault(df: DataFrame, partitions: Int): Int =
    if (partitions > 0) partitions
    else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  private def requireFreshNames(df: DataFrame, internal: Seq[String], out: Seq[String]): Unit = {
    require(!internal.exists(df.columns.contains),
      s"GlobalRank reserves the internal column names ${internal.mkString(", ")}")
    out.foreach(c => require(!df.columns.contains(c),
      s"output column '$c' already exists on the input"))
  }

  /** [[withGlobalRank]] plus the total row count (free: the sum of the
    * per-partition counts), for callers that derive quantile buckets
    * (NTILE) from the rank. */
  def withGlobalRankN(df: DataFrame, order: Seq[Column], rankCol: String = "rank",
                      partitions: Int = 0, reliable: Boolean = false): (DataFrame, Long) = {
    requireFreshNames(df, Seq("_mid", "_pid", "_off"), Seq(rankCol))
    val spark = df.sparkSession
    val n = partitionsOrDefault(df, partitions)
    val withPid = sortedWithPid(df, order, n, reliable)
    val counts = withPid.groupBy(col("_pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = prefix(n, counts)
    import spark.implicits._
    val offDf = (0 until n).map(p => (p, offsets(p))).toDF("_pid", "_off")
    val ranked = withPid.join(broadcast(offDf), "_pid")
      .withColumn(rankCol, rankExpr)
      .drop("_pid", "_off", "_mid")
    (ranked, offsets.last)
  }

  /** Add an exact 1-based global rank column over `order` to `df`,
    * computed with per-partition parallelism (no single-partition
    * window). */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String = "rank",
                     partitions: Int = 0, reliable: Boolean = false): DataFrame =
    withGlobalRankN(df, order, rankCol, partitions, reliable)._1

  /** Global rank PLUS an exact global running total of `valueCol` in the
    * same order — the primitive behind budgeted selection ("take the
    * best documents until N tokens"). Same offset scheme, twice: the
    * per-partition aggregate collects (count, sum) pairs, and the
    * per-row global prefix = value-offset of the partition + the
    * in-partition running sum. The running sum is genuinely
    * data-dependent (no bit trick), so this variant pays what the rank
    * alone avoids: a hash exchange + sort partitioned by partition id —
    * still fully parallel, never SinglePartition.
    *
    * `valueCol` must be NON-NULL and, if `cumCap` is used, non-negative
    * — a null would silently desync the partition sums from the window
    * sums, so the aggregate pass fails fast on one.
    *
    * `cumCap` is the budget pruner: partitions whose value-offset
    * already exceeds the cap cannot contain a row with running total
    * <= cap (values are non-negative), so they are dropped BEFORE the
    * window exchange. A budgeted selection then shuffles only the
    * budget-covering partitions — O(selected), not O(corpus) — which is
    * what makes a "best N tokens of 100 TB" cut cheap. The default
    * (Long.MaxValue) keeps every row.
    *
    * Returns (frame with rankCol + cumCol, total row count, grand total
    * of valueCol) — totals are over the WHOLE input, computed from the
    * per-partition aggregates before any cap pruning. */
  def withRunningTotal(df: DataFrame, order: Seq[Column], valueCol: String,
                       rankCol: String = "rank", cumCol: String = "cum",
                       partitions: Int = 0,
                       cumCap: Long = Long.MaxValue,
                       reliable: Boolean = false): (DataFrame, Long, Long) = {
    requireFreshNames(df, Seq("_mid", "_pid", "_off", "_voff"), Seq(rankCol, cumCol))
    val spark = df.sparkSession
    val n = partitionsOrDefault(df, partitions)
    val withPid = sortedWithPid(df, order, n, reliable)
    val agg = withPid.groupBy(col("_pid"))
      .agg(count(lit(1)).as("c"), sum(col(valueCol)).as("s"),
        count(when(col(valueCol).isNull, 1)).as("nulls"))
      .collect().map { r =>
        require(r.getLong(3) == 0,
          s"withRunningTotal: valueCol '$valueCol' contains nulls")
        r.getInt(0) -> (r.getLong(1), r.getLong(2))
      }.toMap
    val offsets = prefix(n, agg.view.mapValues(_._1).toMap)
    val voffsets = prefix(n, agg.view.mapValues(_._2).toMap)
    import spark.implicits._
    val offDf = (0 until n).map(p => (p, offsets(p), voffsets(p))).toDF("_pid", "_off", "_voff")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(col("_mid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = withPid.join(broadcast(offDf), "_pid")
      .filter(col("_voff") <= lit(cumCap))
      .withColumn(rankCol, rankExpr)
      .withColumn(cumCol, col("_voff") + sum(col(valueCol)).over(w))
      .drop("_pid", "_off", "_voff", "_mid")
    (ranked, offsets.last, voffsets.last)
  }
}
