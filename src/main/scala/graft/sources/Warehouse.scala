package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse layout helpers (SURVEY.md §6) — the materialization side of the
  * scale story. Correct physical layout is what turns the logical plans in
  * this library into shuffle-free pipelines at 100 TB:
  *
  *  - The memory table is written BUCKETED by memory_key: get/list/cleanup
  *    and any key-equality join against it become exchange-free (bucketed
  *    sort-merge join / local hash lookup).
  *  - The IVF index is written PARTITIONED by list_id: an nprobe search
  *    reads nprobe/nlists of the data via partition pruning — the physical
  *    realization of the inverted lists.
  *
  * Both are spec-verified: the bucketed self-join plans with no Exchange,
  * and the pruned read scans only the probed partitions.
  */
object Warehouse {

  /** Write bucketed+sorted by `keyCol` into the session warehouse. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int = 32): Unit = {
    dropStale(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)
  }

  /** Write a small unbucketed artifact table (codebooks, centroid sets). */
  def writeTable(df: DataFrame, table: String): Unit = {
    dropStale(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  /** Write a table partitioned by a low-cardinality column (e.g. IVF
    * list_id). A probe set broadcast-joined on the partition key triggers
    * dynamic partition pruning — only the probed lists are ever read,
    * which is the physical meaning of an inverted-list index. */
  def writePartitionedTable(df: DataFrame, table: String, partCol: String): Unit = {
    dropStale(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .partitionBy(partCol)
      .saveAsTable(table)
  }

  /** Remove a stale managed-table location left by a previous session: the
    * in-memory catalog forgets tables on JVM exit but their parquet files
    * stay, and saveAsTable refuses to create a table over an existing
    * location it doesn't own (LOCATION_ALREADY_EXISTS). Deletion goes
    * through the Hadoop FileSystem API so it works on whatever filesystem
    * backs spark.sql.warehouse.dir (local, hdfs://, s3a://) — a
    * java.io.File delete is a silent no-op off the local disk. */
  private def dropStale(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val root = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val loc = new org.apache.hadoop.fs.Path(root, table.toLowerCase)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
  }

  /** Collision-safe per-data-dir table-name suffix: 64 bits of the md5 of
    * the absolute path (a 32-bit String.hashCode collided at ~2^16 dirs —
    * and a collision silently serves the wrong index). Within-session the
    * input dir is assumed immutable; data changing under the same path
    * needs a new session (or a data fingerprint in place of the path). */
  private[graft] def tableSuffix(dir: String): String = {
    val abs = new java.io.File(dir).getAbsolutePath
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** Write partitioned by a low-cardinality column (e.g. IVF list_id). */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)

  /** I6: small-file compaction of a partitioned parquet dataset — the
    * warehouse maintenance op every streaming/incremental ingest needs:
    * micro-batch appends leave each partition directory littered with
    * per-batch files, and at 100 TB the scan-planning + open() overhead of
    * millions of small files dominates query latency long before data
    * volume does.
    *
    * One hash repartition on the partition column routes every partition
    * value to exactly ONE task, so the rewrite emits exactly one file per
    * partition directory (row content and the partition layout — and
    * therefore partition pruning — are untouched; SourcesSpec asserts all
    * three). The rewritten tree is staged beside the original and swapped
    * in with two FS renames — the smallest non-transactional swap window;
    * a production deployment gets the atomic version of this from a table
    * format's (Delta/Iceberg) OPTIMIZE, which this models on plain
    * parquet. */
  def compactPartitioned(spark: SparkSession, path: String, partCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact")
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tmp)) fs.delete(tmp, true): Unit
    spark.read.parquet(path)
      .repartition(col(partCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(old)) fs.delete(old, true): Unit
    if (!fs.rename(dst, old))
      throw new java.io.IOException(s"compaction swap failed for $path")
    if (!fs.rename(tmp, dst)) {
      // roll the original back into place rather than leaving no dataset
      // at `path` while an intact copy sits under __old
      fs.rename(old, dst): Unit
      throw new java.io.IOException(s"compaction swap failed for $path (rolled back)")
    }
    fs.delete(old, true): Unit
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Read a managed table even across a JVM restart: the in-memory
    * catalog forgets tables on exit but their parquet files survive in
    * the warehouse dir, so state that must outlive the session (the H11
    * MV) falls back to reading the files directly. None = the table has
    * never been written. */
  def readTableOrFiles(spark: SparkSession, table: String): Option[DataFrame] =
    if (spark.catalog.tableExists(table)) Some(spark.table(table))
    else {
      val root = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
      val loc = new org.apache.hadoop.fs.Path(root, table.toLowerCase)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) Some(spark.read.parquet(loc.toString)) else None
    }
}
