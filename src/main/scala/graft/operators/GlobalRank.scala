package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, col, lit, monotonically_increasing_id, shiftrightunsigned}

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

  /** [[withGlobalRank]] plus the total row count (free: the sum of the
    * per-partition counts), for callers that derive quantile buckets
    * (NTILE) from the rank. */
  def withGlobalRankN(df: DataFrame, order: Seq[Column], rankCol: String = "rank",
                      partitions: Int = 0): (DataFrame, Long) = {
    val reserved = Seq("_mid", "_pid", "_off")
    require(!reserved.exists(df.columns.contains),
      s"GlobalRank reserves the internal column names ${reserved.mkString(", ")}")
    require(!df.columns.contains(rankCol),
      s"rank column '$rankCol' already exists on the input")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // _mid = (partition id << 33) | row-position-in-partition, assigned in
    // scan order over the sorted partition — frozen by the checkpoint
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val withPid = sorted
      .withColumn("_pid", shiftrightunsigned(col("_mid"), 33).cast("int"))
    val counts = withPid.groupBy(col("_pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val total = offsets.last
    import spark.implicits._
    val offDf = (0 until n).map(p => (p, offsets(p))).toDF("_pid", "_off")
    val ranked = withPid.join(broadcast(offDf), "_pid")
      .withColumn(rankCol,
        col("_off") + col("_mid").bitwiseAND(lit((1L << 33) - 1)) + 1L)
      .drop("_pid", "_off", "_mid")
    (ranked, total)
  }

  /** Add an exact 1-based global rank column over `order` to `df`,
    * computed with per-partition parallelism (no single-partition
    * window). */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String = "rank",
                     partitions: Int = 0): DataFrame =
    withGlobalRankN(df, order, rankCol, partitions)._1

  /** Global rank PLUS an exact global running total of `valueCol` in the
    * same order — the primitive behind budgeted selection ("take the
    * best documents until N tokens"). Same offset scheme, twice: the
    * per-partition aggregate collects (count, sum) pairs, and the
    * per-row global prefix = value-offset of the partition + the
    * in-partition running sum. The running sum is genuinely
    * data-dependent (no bit trick), so this variant pays what the rank
    * alone avoids: ONE hash exchange + sort of the projected columns,
    * partitioned by partition id — still fully parallel, never
    * SinglePartition, and the caller only reaches for it when the
    * cumulative column is actually needed. */
  def withRunningTotal(df: DataFrame, order: Seq[Column], valueCol: String,
                       rankCol: String = "rank", cumCol: String = "cum",
                       partitions: Int = 0): (DataFrame, Long) = {
    val reserved = Seq("_mid", "_pid", "_off", "_voff")
    require(!reserved.exists(df.columns.contains),
      s"GlobalRank reserves the internal column names ${reserved.mkString(", ")}")
    require(!df.columns.contains(rankCol) && !df.columns.contains(cumCol),
      s"output columns '$rankCol'/'$cumCol' collide with the input")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val withPid = sorted
      .withColumn("_pid", shiftrightunsigned(col("_mid"), 33).cast("int"))
    val agg = withPid.groupBy(col("_pid"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("c"),
        org.apache.spark.sql.functions.sum(col(valueCol)).as("s"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + agg.get(p).map(_._1).getOrElse(0L))
    val voffsets = (0 until n).scanLeft(0L)((acc, p) => acc + agg.get(p).map(_._2).getOrElse(0L))
    val total = offsets.last
    import spark.implicits._
    val offDf = (0 until n).map(p => (p, offsets(p), voffsets(p))).toDF("_pid", "_off", "_voff")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(col("_mid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = withPid.join(broadcast(offDf), "_pid")
      .withColumn(rankCol,
        col("_off") + col("_mid").bitwiseAND(lit((1L << 33) - 1)) + 1L)
      .withColumn(cumCol,
        col("_voff") + org.apache.spark.sql.functions.sum(col(valueCol)).over(w))
      .drop("_pid", "_off", "_voff", "_mid")
    (ranked, total)
  }
}
