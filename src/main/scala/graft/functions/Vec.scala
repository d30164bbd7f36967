package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` columns using Spark's
  * higher-order functions (`zip_with`, `aggregate`, `transform`) — these
  * stay inside whole-stage codegen, unlike Scala UDFs, so the hot path of
  * a 100 TB similarity scan is JIT-compiled with no boxing per element.
  *
  * Determinism note (SURVEY.md §5): dot products fold the array IN ORDER
  * (`aggregate` is a sequential left fold), matching DuckDB's in-order
  * list kernels, so oracle hash-compares agree after round(_, 6).
  *
  * Mirrors the reference's cosine-similarity semantics:
  * /root/reference/mcp_synaptic/rag/embeddings/manager.py:95-110
  * (compute_similarity: dot/(||a||*||b||)).
  */
object Vec {

  /** Elementwise cast to double so all arithmetic is double-precision
    * (float32 inputs otherwise fold with mixed precision). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** In-order sequential dot product: fold over zip_with products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; null-safe on zero norms (returns 0.0,
    * matching the reference's guard in manager.py:compute_similarity). */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = norm2(a) * norm2(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  /** Cosine rounded for cross-engine rank stability (SURVEY.md §5.3). */
  def cosineRounded(a: Column, b: Column, scale: Int = 6): Column =
    round(cosine(a, b), scale)

  /** Squared L2 distance (no sqrt — ranking-equivalent, cheaper). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}
