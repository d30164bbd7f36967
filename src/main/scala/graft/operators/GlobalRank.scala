package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, col, row_number, spark_partition_id}

/** Exact global ranking without the single-partition collapse.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY is a textbook
  * 100 TB scale-killer: Spark plans the window over ONE partition, so the
  * whole dataset funnels through a single task. The distributed-exact
  * alternative is the classic range-sort + offset scheme:
  *
  *   1. range-repartition + sort by the total order — the same parallel
  *      machinery as a global ORDER BY; ascending key ranges land in
  *      ascending partition ids,
  *   2. count rows per partition (one long per partition, collected to
  *      the driver — O(partitions), never O(rows)),
  *   3. global rank = rows-before-my-partition (a broadcast-joined
  *      offset) + row_number partitioned BY PARTITION ID — a fully
  *      parallel window over already-clustered data.
  *
  * The order must be TOTAL (callers supply a tie-break column such as the
  * row's id), or ranks within a tie are nondeterministic. The sorted frame
  * is localCheckpointed so the counting pass and the ranking pass see the
  * SAME partition assignment (range boundaries come from sampling; a
  * recompute may resample) — at scale this materializes only the columns
  * the caller projected into `df`, which for a ranking is the sort key
  * plus an id.
  */
object GlobalRank {

  /** [[withGlobalRank]] plus the total row count (free: the sum of the
    * per-partition counts), for callers that derive quantile buckets
    * (NTILE) from the rank. */
  def withGlobalRankN(df: DataFrame, order: Seq[Column], rankCol: String = "rank",
                      partitions: Int = 0): (DataFrame, Long) = {
    require(!df.columns.contains("_pid") && !df.columns.contains("_off"),
      "GlobalRank reserves the internal column names _pid and _off")
    require(!df.columns.contains(rankCol),
      s"rank column '$rankCol' already exists on the input")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = sorted.groupBy(col("_pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until n).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val total = offsets.last
    import spark.implicits._
    val offDf = (0 until n).map(p => (p, offsets(p))).toDF("_pid", "_off")
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    val ranked = sorted.join(broadcast(offDf), "_pid")
      .withColumn(rankCol, col("_off") + row_number().over(w))
      .drop("_pid", "_off")
    (ranked, total)
  }

  /** Add an exact 1-based global rank column over `order` to `df`,
    * computed with per-partition parallelism (no single-partition
    * window). */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String = "rank",
                     partitions: Int = 0): DataFrame =
    withGlobalRankN(df, order, rankCol, partitions)._1
}
