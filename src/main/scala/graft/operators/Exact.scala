package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Bit-exact aggregate helpers.
  *
  * Two cross-engine hazards are handled here:
  *
  * 1. Float sums are order-dependent. Summing through DECIMAL is exact and
  *    order-independent; casting the exact sum to double then dividing by the
  *    count is bit-identical across engines.
  *
  * 2. `round(x, n)` itself diverges between engines when the quotient's
  *    shortest decimal repr lands on a midpoint: Spark rounds HALF_UP on the
  *    shortest repr (BigDecimal) while DuckDB rounds the raw binary double.
  *    `rnd` sidesteps the problem with pure IEEE-754 arithmetic —
  *    `floor(x * 10^n + 0.5) / 10^n` — which both engines evaluate
  *    identically given the same double input. On already-exact k-decimal
  *    values it is the identity, for any sign.
  *
  * This is also the right 100 TB semantics: decimal partial aggregation is
  * still a map-side-combined hash agg, and exact money sums don't drift with
  * partition count or AQE re-planning.
  *
  * ORACLE-AUTHORING TRAP (cost round 6 two hash-fails): DuckDB `sum()` over
  * an integer column — plain AND windowed — returns HUGEINT (int128), and
  * integer division `//` keeps HUGEINT, where Spark's `sum` over longs emits
  * BIGINT. The VALUES match but the driver's representation hash does not.
  * Every sum-derived integer column in an oracle must be wrapped in
  * `CAST(... AS BIGINT)` (`count(*)` is safe — it is already BIGINT).
  */
object Exact {
  private val Dec = "decimal(28,2)"

  /** Cross-engine-deterministic round to n decimals (half-up, toward +inf).
    * All-double arithmetic: bit-identical in any IEEE-754 engine. */
  def rnd(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * p + 0.5) / p
  }

  /** Exact sum of a 2-decimal double column, as double. */
  def sumD(c: String): Column = sum(col(c).cast(Dec)).cast("double")

  /** Exact ANSI average (decimal sum / non-null count), as double. NULLs are
    * excluded from the denominator, matching standard AVG and the
    * reference's avg("temperature") semantics. */
  def avgD(c: String): Column = sumD(c) / count(col(c))

  /** Windowed exact sum. */
  def sumOver(c: String, w: WindowSpec): Column =
    sum(col(c).cast(Dec)).over(w).cast("double")

  /** Windowed exact ANSI average. */
  def avgOver(c: String, w: WindowSpec): Column =
    sumOver(c, w) / count(col(c)).over(w)

  /** Share-of-total over an aggregated counts frame: the grand total rides
    * a 1-row broadcast crossJoin, never an unpartitioned window (which
    * funnels every group through a single task at scale). Shared by
    * tokenTf / failureHistogram / issueStats. */
  def withSharePct(counts: org.apache.spark.sql.DataFrame, cntCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    val total = counts.agg(sum(cntCol).as("_total"))
    counts.crossJoin(broadcast(total))
      .withColumn(outCol, rnd(col(cntCol) * 100.0 / col("_total"), 4))
      .drop("_total")
  }

  /** Portable 60-bit string hash: leading 15 hex chars of md5, parsed
    * base-16. Bit-identical in Spark and DuckDB (`'0x…'::BIGINT`), always
    * non-negative (60 < 63 bits) — the cross-engine workhorse behind
    * MinHash/decontamination/splits (engine-private xxhash64 would be
    * ~equally fast but never oracle-replayable). Computed by the native
    * `graft_fold60` expression (graft.functions.Fold60): digest bytes
    * straight to a long, no hex-string round trip — FunctionsSpec asserts
    * bit-equality with the `conv(substring(md5(s),1,15),16,10)`
    * formulation. Callers must have GraftFunctions registered
    * (Tables.bootstrap does; query builders register defensively). */
  def fold60(c: Column): Column = call_function("graft_fold60", c)

  /** Portable 32-bit md5 half-words (hex chars 1-8 / 9-16 parsed base-16),
    * computed natively (graft.functions.Md5Half) — the SimHash bit source. */
  def md5Hi32(c: Column): Column = call_function("graft_md5_hi32", c)
  def md5Lo32(c: Column): Column = call_function("graft_md5_lo32", c)

  // ---- DuckDB oracle fragments for the same expressions ----

  /** DuckDB fragment of the same 60-bit fold. */
  def sqlFold60(e: String): String =
    s"('0x' || substring(md5($e), 1, 15))::BIGINT"

  /** DuckDB fragments of the same 32-bit md5 half-words. */
  def sqlMd5Hi32(e: String): String =
    s"('0x' || substring(md5($e), 1, 8))::BIGINT"
  def sqlMd5Lo32(e: String): String =
    s"('0x' || substring(md5($e), 9, 8))::BIGINT"

  def sqlRnd(e: String, n: Int): String = {
    val p = "1" + ("0" * n)
    s"floor(($e) * $p + 0.5) / $p"
  }
  def sqlSum(c: String): String = s"CAST(sum(CAST($c AS DECIMAL(28,2))) AS DOUBLE)"
  def sqlAvg(c: String): String = s"${sqlSum(c)} / count($c)"
  def sqlSumOver(c: String, w: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(28,2))) OVER $w AS DOUBLE)"
  def sqlAvgOver(c: String, w: String): String =
    s"${sqlSumOver(c, w)} / count($c) OVER $w"
}
