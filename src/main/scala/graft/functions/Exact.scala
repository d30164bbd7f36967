package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Exact integer-space rounding for ratios of integers (SURVEY.md §5).
  *
  * `round(num/den, 6)` on doubles is NOT portable across engines: Spark
  * rounds the shortest decimal representation (BigDecimal of
  * Double.toString) while DuckDB rounds the binary value — they disagree
  * whenever the true rational lands near an exact half at the target scale
  * (observed: quality scores built from small-integer ratios at sf0.1).
  *
  * For integer num/den the fix is exact: round-half-up(num/den * 1e6) =
  * (2_000_000*num + den) intdiv (2*den), all in BIGINT, identical in any
  * engine. The final /1e6 is a single IEEE division producing the same
  * double everywhere. Non-integer sources (cosines) keep plain round —
  * their 17-significant-digit doubles cannot collide with a 7-digit half.
  */
object Exact {

  /** True integer division (Catalyst IntegralDivide, the SQL `div`
    * operator) — stays in BIGINT space for any magnitude, unlike the
    * earlier (a - a%b)/b double trick which silently lost exactness past
    * 2^53 (e.g. sum(length(text)) beyond ~4.5e9 chars at large SF). */
  private def intDiv(a: Column, b: Column): Column =
    ColumnBridge.column(new IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** round-half-up(num/den, 6) as an e6-scaled BIGINT (num, den >= 0).
    *
    * The scaled numerator is built in DECIMAL(38,0): `num * 2e6` overflows
    * BIGINT once num exceeds ~4.6e12 — e.g. sum(length(text)) at 100 TB is
    * ~1e14. Ratios are computed on aggregated values (one per group), so
    * the decimal op count is per-group, not per-row. Domain: the e6-scaled
    * RESULT must fit BIGINT, i.e. num/den <= ~9e12 — true for every ratio
    * here (averages, scores, recalls are all <= ~1e6). */
  def ratio6e(num: Column, den: Column): Column =
    intDiv(num.cast("decimal(38,0)") * lit(2000000L) + den.cast("decimal(38,0)"),
      den.cast("decimal(38,0)") * lit(2L))

  /** round-half-up(num/den, 6) as DOUBLE — cross-engine identical. */
  def ratio6(num: Column, den: Column): Column =
    ratio6e(num, den).cast("double") / 1000000.0

  /** DuckDB SQL for ratio6e / ratio6 (HUGEINT for the same >2^63 headroom). */
  def ratio6eSql(num: String, den: String): String =
    s"((2000000*CAST($num AS HUGEINT) + ($den)) // (2*CAST($den AS HUGEINT)))"

  def ratio6Sql(num: String, den: String): String =
    s"(${ratio6eSql(num, den)} / 1000000.0)"
}
