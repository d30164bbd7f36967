package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2.F1).
  *
  * Media assets ride through the pipeline as opaque `binary` payloads with a
  * typed metadata struct; decode / feature-extraction runs per-partition in
  * bounded batches (the same batch shape a `mapInPandas`/Arrow UDF would
  * use on a Python stack). The actual codec is STUBBED — this container has
  * no image/audio libraries — with a deterministic byte-histogram "decoder";
  * the Spark-side contract (schema, batching, partition-local execution, no
  * driver collect) is real and spec-tested.
  *
  * Scale notes: payloads never leave their input partition (narrow map);
  * batches bound peak memory per task regardless of partition size; the
  * feature output is columnar-friendly (fixed-width array<double>). At
  * 100 TB the same plan shape holds — feature extraction is embarrassingly
  * parallel and the scan prunes to (id, payload, meta) columns only.
  */
object Binary {

  /** Typed media record: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media_type: String,
                         payload: Array[Byte], meta_lang: String, meta_chars: Long)

  /** Extracted features: fixed-dim vector per asset. */
  case class MediaFeatures(doc_id: Long, media_type: String,
                           n_bytes: Int, feature: Array[Double])

  val FeatureDim = 16
  val BatchSize = 64

  /** STUB decoder: a real implementation would decode the payload (image
    * pixels / audio samples) here. Deterministic byte histogram stands in so
    * the pipeline shape is testable without codecs. */
  private[graft] def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val hist = new Array[Double](FeatureDim)
      r.payload.foreach(b => hist((b & 0xFF) % FeatureDim) += 1.0)
      val n = r.payload.length.toDouble max 1.0
      MediaFeatures(r.doc_id, r.media_type, r.payload.length, hist.map(_ / n))
    }

  /** documents -> typed media records (text bytes stand in for media). */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        col("lang").as("meta_lang"), col("n_chars").as("meta_chars"))
      .as[MediaRecord]
  }

  /** Partition-local batched feature extraction. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
  }

  /** F1: end-to-end plumbing over documents (rows-only check — the stub
    * features are engine-defined, not part of the reference contract). */
  def mm1BinaryFeatures(spark: SparkSession, dir: String): DataFrame = {
    extractFeatures(mediaRecords(spark, dir)).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        size(col("feature")).as("feature_dim"),
        round(aggregate(col("feature"), lit(0.0), (a, x) => a + x * x), 6).as("feature_sq_sum"))
      .orderBy("doc_id")
  }

  /** One sampled frame of a media payload (scalar-only: exact integer
    * stats so the driver's DuckDB oracle can replicate them byte-for-byte
    * — the test payloads are ASCII, so byte value == code point). */
  case class FrameRow(doc_id: Long, frame_no: Int, frame_len: Int,
                      sum_bytes: Long, max_byte: Int)

  val FrameBytes = 256
  val FrameStride = 4

  /** STUB frame decoder: a real implementation would seek keyframes and
    * decode pixels; fixed-size byte windows with integer stats stand in.
    * The 1->N explode shape (one asset -> many sampled frames) is the
    * real contract a video pipeline needs. Arbitrary binary payloads are
    * fine HERE; only the oracle-gated mm2 query constrains them (below). */
  private[graft] def sampleFrames(r: MediaRecord): Seq[FrameRow] = {
    r.payload.grouped(FrameBytes).zipWithIndex.collect {
      case (chunk, i) if i % FrameStride == 0 =>
        FrameRow(r.doc_id, i, chunk.length,
          chunk.map(b => (b & 0xFF).toLong).sum,
          chunk.map(b => b & 0xFF).max)
    }.toSeq
  }

  /** F2: frame sampling — every FrameStride-th FrameBytes window of each
    * payload, emitted as one row per sampled frame. Same partition-local
    * batched execution as mm1; output grows by the sampling factor, never
    * by the full decode.
    *
    * Oracle-parity guard: this side windows BYTES while the DuckDB oracle
    * windows CHARACTERS — they agree only when byte == code point, so a
    * non-ASCII payload fails LOUDLY here instead of silently diverging on
    * frame boundaries/stats. (sampleFrames itself stays binary-clean.) */
  def mm2FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaRecords(spark, dir)
      .mapPartitions(_.grouped(BatchSize).flatMap(_.flatMap { r =>
        require(r.payload.forall(_ >= 0),
          s"mm2 assumes ASCII payloads (char-windowing oracle); " +
            s"doc_id=${r.doc_id} has non-ASCII bytes")
        sampleFrames(r)
      }))
      .toDF()
      .orderBy("doc_id", "frame_no")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_binary_features" -> ((s, d) => mm1BinaryFeatures(s, d)),
    "mm2_frame_sample"    -> ((s, d) => mm2FrameSample(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "mm2_frame_sample" ->
      s"""WITH fr AS (
         |  SELECT doc_id, text,
         |    unnest(range(0, CAST(ceil(length(text) / $FrameBytes.0) AS BIGINT))) AS fno
         |  FROM documents
         |), win AS (
         |  SELECT doc_id, CAST(fno AS INT) AS frame_no,
         |    substr(text, CAST(fno * $FrameBytes + 1 AS INT), $FrameBytes) AS w
         |  FROM fr WHERE fno % $FrameStride = 0
         |)
         |SELECT doc_id, frame_no, CAST(length(w) AS INT) AS frame_len,
         |  CAST(list_aggregate(list_transform(range(1, length(w)+1),
         |    i -> ord(substr(w, CAST(i AS INT), 1))), 'sum') AS BIGINT) AS sum_bytes,
         |  CAST(list_aggregate(list_transform(range(1, length(w)+1),
         |    i -> ord(substr(w, CAST(i AS INT), 1))), 'max') AS INT) AS max_byte
         |FROM win ORDER BY doc_id, frame_no""".stripMargin,
  )
}
