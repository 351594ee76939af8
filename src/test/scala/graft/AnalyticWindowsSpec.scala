package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnalyticWindows

/** Semantics pins for the analytic-window operators whose SCALE shape
  * diverges from the textbook single-window spelling. The DuckDB oracle
  * keeps the declarative form; these tests prove the bucketed engine plan
  * is row-for-row the same function.
  */
class AnalyticWindowsSpec extends AnyFunSuite with SparkFixture {
  private val dir = "/root/testdata/sf0.001"

  /** The textbook single-window gap-fill (one unbounded frame per user —
    * the exact shape the production plan REPLACES because it sorts a
    * sensor's whole history in one window partition). Kept here as the
    * reference implementation for the equivalence pin.
    */
  private def gapFillSingleWindow: DataFrame = {
    import graft.operators.Exact.rnd
    val e = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    val grid = e.groupBy("user_id")
      .agg(date_trunc("hour", min("ts")).as("t0"), date_trunc("hour", max("ts")).as("t1"))
      .select(col("user_id"),
        explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR"))).as("grid_ts"))
    val unioned = e
      .select(col("user_id"), col("ts"), lit(0).as("is_grid"), col("value"),
        unix_micros(col("ts")).as("tsm"), col("event_id"))
      .unionAll(grid.select(col("user_id"), col("grid_ts").as("ts"),
        lit(1).as("is_grid"), lit(null).cast("double").as("value"),
        unix_micros(col("grid_ts")).as("tsm"), lit(0L).as("event_id")))
    val ord = Seq(col("ts"), col("is_grid"), col("event_id"))
    val wPrev = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val readingTs = when(col("is_grid") === 0, col("tsm"))
    unioned
      .withColumn("pv", last("value", ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(readingTs, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first("value", ignoreNulls = true).over(wNext))
      .withColumn("nt", first(readingTs, ignoreNulls = true).over(wNext))
      .filter(col("is_grid") === 1)
      .select(col("user_id"), col("ts").as("grid_ts"),
        rnd(when(col("pt").isNull, col("nv"))
          .when(col("nt").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("tsm") - col("pt")).cast("double") /
             (col("nt") - col("pt")).cast("double"))), 4).as("value"),
        when(col("pt").isNull, "backfill")
          .when(col("nt").isNull, "hold")
          .otherwise("interp").as("method"))
  }

  private def sortedRows(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  test("w9 gap-fill: (user, day)-bucketed stitch ≡ single-window reference") {
    val bucketed = AnalyticWindows.gapFill(spark, dir)
    val reference = gapFillSingleWindow
    val a = sortedRows(bucketed)
    val b = sortedRows(reference)
    assert(a.length == b.length, s"row counts differ: ${a.length} vs ${b.length}")
    assert(a.sameElements(b),
      a.zip(b).collectFirst { case (x, y) if x != y => s"first diff:\n  $x\n  $y" }
        .getOrElse(""))
  }

  test("w9 gap-fill: every window partition is day-bounded") {
    // the plan contract: NO window in the executed plan partitions by the
    // bare user key — every windowspecdefinition carries the day bucket
    // (or runs over the tiny per-day digest frame, which also keys on day)
    val plan = AnalyticWindows.gapFill(spark, dir)
      .queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*?) ASC".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"expected window specs in plan:\n$plan")
    val unbucketed = specs.filterNot(s => s.contains("day"))
    assert(unbucketed.isEmpty,
      s"window partitioned without the day bucket: $unbucketed\n$plan")
  }

  test("w9 gap-fill: methods are valid, non-null values everywhere") {
    // "hold" cannot occur at this fixture: the grid ends at
    // date_trunc(hour, max(ts)) so the final reading is always at-or-after
    // the last grid point — only interp/backfill appear
    val rows = AnalyticWindows.gapFill(spark, dir).collect()
    val methods = rows.map(_.getAs[String]("method")).toSet
    assert(methods.subsetOf(Set("backfill", "hold", "interp")) &&
      methods.contains("interp") && methods.contains("backfill"),
      s"unexpected method set at sf0.001: $methods")
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("value"))))
  }
}
