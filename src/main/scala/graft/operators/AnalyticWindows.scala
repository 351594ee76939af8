package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Exact.{rnd, sqlRnd}

/** Analytic (OVER-clause) window functions (SURVEY.md §2.6, W1–W8).
  *
  * All planned-but-unimplemented in the reference (Learning Guide.txt:1045 §4,
  * :1071 §2): rolling averages, day-over-day change, 2σ anomaly flags, ranks,
  * top-1-per-group, latest-per-key.
  *
  * Scale design: windows whose frame is genuinely row-local (rolling range
  * frame, lag, row_number per key) stay window specs — one shuffle on the
  * partition key. Whole-partition statistics over *raw* rows (W3 mean/stddev
  * per user, W4 group average) are NOT window specs: an unbounded frame over
  * a low-cardinality key sorts the entire table in a handful of tasks, which
  * dies at 100 TB. They are two-phase instead — groupBy aggregate (map-side
  * combined) then broadcast-join the tiny stats table back. Same semantics,
  * same oracle, no WindowExec over the raw table.
  *
  * Every ordering includes a unique tiebreaker (event_id) so row_number/rank
  * results are deterministic and oracle-able.
  */
object AnalyticWindows {

  /** W1: 7-day rolling average per user — range frame over epoch seconds
    * (Learning Guide.txt:1045 §4). */
  def rollingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-7L * 86400L, 0L)
    Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("ts"),
      rnd(Exact.avgOver("value", w), 4).as("rolling_avg_7d"))
  }

  /** W2: day-over-day % change of the daily average per user. */
  def pctChange(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(Exact.avgD("value").as("day_avg"))
    val w = Window.partitionBy("user_id").orderBy("day")
    daily.select(
      col("user_id"), col("day"),
      rnd(col("day_avg"), 4).as("avg_value"),
      rnd((col("day_avg") - lag("day_avg", 1).over(w)) * 100.0 /
        lag("day_avg", 1).over(w), 4).as("pct_change"))
  }

  /** W3: 2σ anomaly flag — |x − mean| > 2·stddev within the user's history
    * (Learning Guide.txt:1045 §4; docs/architecture.md:545 Z-score).
    * Two-phase: per-user stats via hash agg, broadcast back — never an
    * unbounded window frame over the raw table. */
  def anomaly2Sigma(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val stats = events.groupBy(col("user_id")).agg(
      avg("value").as("u_avg"), stddev_samp("value").as("u_std"))
    events.join(broadcast(stats), Seq("user_id"))
      .select(
        col("event_id"), col("user_id"), col("value"),
        (abs(col("value") - col("u_avg")) > lit(2) * col("u_std")).as("is_anomaly"))
  }

  /** W4: deviation from the group (city) average (Learning Guide.txt:1045 §4).
    * Same two-phase shape as W3: event_type has ~5 distinct values, so a
    * partition-by window would sort the whole table in 5 tasks. */
  def groupAvgDelta(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val stats = events.groupBy(col("event_type"))
      .agg(Exact.avgD("value").as("grp_avg"))
    events.join(broadcast(stats), Seq("event_type"))
      .select(
        col("event_id"), col("event_type"), col("value"),
        rnd(col("value") - col("grp_avg"), 4).as("delta_from_avg"))
  }

  /** W5: rank users by average value within each event_type
    * (≙ rank sensors by temperature within city, Learning Guide.txt:1045 §4).
    * Rank key is the rounded average plus user_id tiebreak → deterministic.
    * The window runs over the aggregated (event_type, user_id) rows, not the
    * raw table. */
  def rankByAvg(spark: SparkSession, dir: String): DataFrame = {
    val avgs = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(rnd(Exact.avgD("value"), 4).as("avg_value"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("avg_value").desc, col("user_id"))
    avgs.withColumn("rnk", rank().over(w))
  }

  /** W6: top-1 per group — hottest reading per event_type per day. */
  def top1PerGroup(spark: SparkSession, dir: String): DataFrame = {
    val withDay = Tables.events(spark, dir).withColumn("day", to_date(col("ts")))
    val w = Window.partitionBy("event_type", "day")
      .orderBy(col("value").desc, col("event_id"))
    withDay
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day"), col("event_id"), col("value"))
  }

  /** W7: staging `_row_number` metadata column (Learning Guide.txt:1071 §2
    * Layer 1) — stable row numbering per user by event time. */
  def stagingRowNumber(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("ts"),
      row_number().over(w).as("_row_number"))
  }

  /** W8: latest reading per key (API `GET /sensors`, Learning Guide.txt:1084
    * §2). row_number-filter beats a max-ts self-join: one shuffle, no join. */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("latest_ts"),
        col("event_id"), col("event_type"), col("value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w1_rolling_avg"     -> rollingAvg,
    "w2_pct_change"      -> pctChange,
    "w3_anomaly_2sigma"  -> anomaly2Sigma,
    "w4_group_avg_delta" -> groupAvgDelta,
    "w5_rank_by_avg"     -> rankByAvg,
    "w6_top1_per_group"  -> top1PerGroup,
    "w7_staging_row_number" -> stagingRowNumber,
    "w8_latest_per_key"  -> latestPerKey)

  val oracles: Map[String, String] = Map(
    "w1_rolling_avg" ->
      s"""SELECT event_id, user_id, ts,
         ${sqlRnd(Exact.sqlAvgOver("value", "w"), 4)} AS rolling_avg_7d
         FROM events WINDOW w AS (
           PARTITION BY user_id
           ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)""",
    "w2_pct_change" ->
      s"""SELECT user_id, day,
         ${sqlRnd("day_avg", 4)} AS avg_value,
         ${sqlRnd("(day_avg - lag(day_avg, 1) OVER w) * 100.0 / lag(day_avg, 1) OVER w", 4)} AS pct_change
         FROM (SELECT user_id, CAST(ts AS DATE) AS day,
                 ${Exact.sqlAvg("value")} AS day_avg
               FROM events GROUP BY 1, 2) t
         WINDOW w AS (PARTITION BY user_id ORDER BY day)""",
    "w3_anomaly_2sigma" ->
      """SELECT event_id, user_id, value,
         abs(value - avg(value) OVER w) > 2 * stddev_samp(value) OVER w AS is_anomaly
         FROM events WINDOW w AS (PARTITION BY user_id)""",
    "w4_group_avg_delta" ->
      s"""SELECT event_id, event_type, value,
         ${sqlRnd(s"value - ${Exact.sqlAvgOver("value", "w")}", 4)} AS delta_from_avg
         FROM events WINDOW w AS (PARTITION BY event_type)""",
    "w5_rank_by_avg" ->
      s"""SELECT event_type, user_id, avg_value,
         rank() OVER (PARTITION BY event_type ORDER BY avg_value DESC, user_id) AS rnk
         FROM (SELECT event_type, user_id,
                 ${sqlRnd(Exact.sqlAvg("value"), 4)} AS avg_value
               FROM events GROUP BY 1, 2) t""",
    "w6_top1_per_group" ->
      """SELECT event_type, day, event_id, value FROM (
           SELECT event_type, CAST(ts AS DATE) AS day, event_id, value,
             row_number() OVER (
               PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY value DESC, event_id) AS rn
           FROM events) t WHERE rn = 1""",
    "w7_staging_row_number" ->
      """SELECT event_id, user_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS _row_number
         FROM events""",
    "w8_latest_per_key" ->
      """SELECT user_id, ts AS latest_ts, event_id, event_type, value FROM (
           SELECT user_id, ts, event_id, event_type, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t WHERE rn = 1""")
}
