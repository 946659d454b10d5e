package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Determinism helpers (SURVEY.md §7.6): every float aggregate that the
  * DuckDB oracle hash-matches goes through these, so neither addition
  * order nor per-engine rounding modes can change the result.
  *
  * Rules learned empirically against DuckDB 1.0.0:
  *  - Summing: cast addends to decimal BEFORE the sum (decimal addition
  *    is exact/associative), then cast the exact sum STRAIGHT to double
  *    (exact nearest-value conversion — no rounding mode involved).
  *  - NEVER cast a COMPUTED double (e.g. price*(1-disc)) to decimal —
  *    the product's expansion lands tie-adjacent and Spark (HALF_UP)
  *    vs DuckDB (FP-scaled/banker's) disagree ~1/10⁴ addends. Cast the
  *    BASE money columns (exact ≤2-decimal values, never tie-adjacent)
  *    and multiply in decimal arithmetic — exact in both engines.
  *  - NEVER reduce decimal scale at the end (e.g. cast to decimal(18,4)):
  *    Spark rounds HALF_UP, DuckDB HALF_EVEN — exact ties DO occur in
  *    scale-6 money sums. No scale reduction ⇒ no tie ⇒ no divergence.
  *  - round(x, 4) on a double is ONLY for genuinely order-dependent
  *    accumulations (stddev/corr) where exactness is impossible; there
  *    tie-adjacency has negligible probability.
  */
object Det {
  private val D4 = DecimalType(27, 4)

  /** Base money/ratio column (stored as an exact ≤2-decimal double) →
    * decimal. Safe because the value is never tie-adjacent. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact sum of a decimal expression, surfaced as double (exact cast). */
  def dsumDec(c: Column): Column = sum(c).cast(DoubleType)

  /** Exact sum of a base (≤2-decimal) column. */
  def dsum(c: Column): Column = dsumDec(c.cast(D4))

  /** Exact-sum-based average: decimal sum → double, / count (IEEE ops on
    * identical operands ⇒ identical quotient in both engines). */
  def davgDec(c: Column): Column = sum(c).cast(DoubleType) / count(c)
  def davg(c: Column): Column = davgDec(c.cast(D4))

  /** Round an order-dependent double accumulation for stable comparison. */
  def r4(c: Column): Column = round(c, 4)

  /** Serialize a float/double array to a comparison-stable string: each
    * lane cast to double (exact widening), scaled by 1e4 and floored to
    * a long (floor has no rounding mode — identical in both engines),
    * joined with ','. Raw array columns crash the driver's pandas
    * compare (numpy.ndarray is unhashable in sort_values), so every
    * declared query surfaces arrays through this or array_join. */
  def arrStr(c: Column): Column =
    array_join(transform(c, x =>
      floor(x.cast(DoubleType) * 10000).cast("long").cast("string")), ",")

  /** Integer sum pinned to long — DuckDB widens integer sums to HUGEINT
    * (which pandas renders as float); cast both engines to bigint. */
  def lsum(c: Column): Column = sum(c).cast("long")

  /** DuckDB SQL twins — identical decimal-then-double pipeline. */
  object Sql {
    def dec(col: String): String = s"cast($col as decimal(12,2))"
    def dsumDec(e: String): String = s"cast(sum($e) as double)"
    def dsum(col: String): String = dsumDec(s"cast($col as decimal(27,4))")
    def davgDec(e: String): String = s"cast(sum($e) as double) / count($e)"
    def davg(col: String): String = davgDec(s"cast($col as decimal(27,4))")
    def r4(e: String): String = s"round($e, 4)"
    def lsum(e: String): String = s"cast(sum($e) as bigint)"
    def arrStr(e: String): String =
      s"array_to_string(list_transform($e, " +
        s"x -> cast(floor(cast(x as double) * 10000) as bigint)), ',')"
  }
}
