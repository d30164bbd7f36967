package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink plumbing: the reference ingests documents from
  * arbitrary client payloads (MCP JSON); this library reads/writes the same
  * tables as parquet (columnar, default), JSON lines, or CSV.
  *
  * Readers take an EXPLICIT schema: schema inference is a full extra pass
  * over the data — never acceptable at 100 TB — and inferred types drift
  * between engines. Writers keep the same partition-local layout as the
  * input (no repartition on format conversion).
  */
object Formats {

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ORC: the other columnar warehouse format Spark ships natively —
  // predicate pushdown and column pruning work the same as parquet, so a
  // deployment standardized on ORC loses nothing.
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
