package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact.{rnd, sqlRnd}

/** Time-bucketed aggregations (SURVEY.md §2.4, A1–A5).
  *
  * A1 is the reference's flagship streaming aggregation
  * (reference spark_streaming/streaming_job.py:278-353): 5-minute tumbling
  * window per sensor with avg/max/min/sum/count and `max()` abused as
  * "any non-null" for group-constant metadata. Here in batch form over
  * `events` (user_id ≙ sensor_id, value ≙ temperature); the streaming twin
  * reusing the same plan is graft.streaming.StreamingJobs.streamWindowAgg.
  *
  * Scale notes: a single hash aggregation — Catalyst plans partial (map-side)
  * + final agg, so the shuffle carries one row per (user_id, window) per map
  * task, not per input row. Group-key cardinality (≈ users × windows) stays
  * tiny relative to input, which is exactly the shape that scales to 100 TB.
  * Float outputs go through Exact.rnd so the DuckDB oracle hash-matches
  * bit-for-bit.
  */
object WindowAggregates {

  /** A1: 5-minute tumbling window aggregate per user (batch form). */
  def windowAgg(spark: SparkSession, dir: String): DataFrame =
    aggregateWindows(Projections.nullFilter(spark, dir))

  /** The A1 aggregation body, shared verbatim with the streaming twin —
    * identical logical plan in batch and micro-batch execution. */
  def aggregateWindows(readings: DataFrame): DataFrame =
    readings
      .groupBy(col("user_id"), window(col("ts"), "5 minutes"))
      .agg(
        rnd(Exact.avgD("value"), 4).as("avg_value"),
        rnd(max("value"), 2).as("max_value"),
        rnd(min("value"), 2).as("min_value"),
        rnd(Exact.sumD("value"), 2).as("total_value"),
        count(lit(1)).as("cnt"))
      .select(
        col("user_id"),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("avg_value"), col("max_value"), col("min_value"),
        col("total_value"), col("cnt"))

  /** A2: hourly batch aggregate with stddev (Learning Guide.txt:1045 §3). */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(
        rnd(Exact.avgD("value"), 4).as("avg_value"),
        rnd(max("value"), 2).as("max_value"),
        rnd(min("value"), 2).as("min_value"),
        rnd(stddev_samp("value"), 4).as("stddev_value"),
        rnd(Exact.sumD("value"), 2).as("total_value"),
        count(lit(1)).as("cnt"))

  /** A3: daily mart — one row per user per day (Learning Guide.txt:1071 §2). */
  def dailyMart(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        rnd(Exact.avgD("value"), 4).as("avg_value"),
        rnd(max("value"), 2).as("max_value"),
        rnd(min("value"), 2).as("min_value"),
        count(lit(1)).as("cnt"))

  /** A3b: location stats — one row per event_type per day across users
    * (≙ mart_iot_location_stats, Learning Guide.txt:1071 §2 Layer 3). */
  def locationStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        rnd(Exact.avgD("value"), 4).as("avg_value"),
        count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("n_users"))

  /** A4: data-quality ratio aggregates (Learning Guide.txt:1058 §5-6) —
    * daily % completeness / validity as conditional-avg ratios. */
  def qualityRatios(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        rnd(avg(when(col("value").isNotNull, 1.0).otherwise(0.0)) * 100, 4)
          .as("completeness_pct"),
        rnd(avg(when(col("value").between(0, 100), 1.0).otherwise(0.0)) * 100, 4)
          .as("validity_pct"),
        count(lit(1)).as("cnt"))

  /** A4b: threshold evaluation over the daily quality ratios — the
    * reference's planned monitoring rules (Learning Guide.txt:1058 §6;
    * monitoring/alerts.py placeholder): alert when >10% of a day's rows
    * would land in the DLQ, or a quality metric drops below 95%. The DLQ
    * rate comes from the real V1-V6 rule set (withFailures), so this is the
    * validator's own verdict being monitored, not a proxy. One hash
    * aggregation; the threshold predicates are free column expressions. */
  def qualityAlerts(spark: SparkSession, dir: String): DataFrame =
    Validation.withFailures(Tables.events(spark, dir), Validation.eventRules)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        rnd(avg(when(col("value").isNotNull, 1.0).otherwise(0.0)) * 100, 4)
          .as("completeness_pct"),
        rnd(avg(when(col("value").between(0, 100), 1.0).otherwise(0.0)) * 100, 4)
          .as("validity_pct"),
        rnd(avg(when(col("data_quality_flag") === "invalid", 1.0).otherwise(0.0)) * 100, 4)
          .as("dlq_pct"),
        count(lit(1)).as("cnt"))
      .withColumn("completeness_alert", col("completeness_pct") < 95.0)
      .withColumn("validity_alert", col("validity_pct") < 95.0)
      .withColumn("dlq_alert", col("dlq_pct") > 10.0)
      .withColumn("alert_level",
        when(col("dlq_alert") || col("completeness_alert") || col("validity_alert"),
          lit("alert")).otherwise(lit("ok")))

  /** A5: failure-type histogram with share-of-total
    * (≙ validation metric counters, validation_consumer.py:590-629) —
    * Exact.withSharePct keeps the grand total a broadcast, never a
    * single-task window even if the group count grows. */
  def failureHistogram(spark: SparkSession, dir: String): DataFrame =
    Exact.withSharePct(
      Tables.events(spark, dir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt")),
      "cnt", "pct")

  /** A8: sessionization — gap-based session windows per sensor (30-minute
    * inactivity closes a session), the visit/burst analysis shape for event
    * streams. Spark's native `session_window` aggregation (batch here; the
    * identical expression works under a watermark in Structured Streaming,
    * where state merges windows incrementally). One hash aggregation —
    * session merging happens inside the aggregation operator, no self-join,
    * no window-function pass over raw events. The oracle rebuilds sessions
    * as a gaps-and-islands pass: new session iff the gap is ≥ the timeout
    * (Spark's [start, last+gap) windows are end-exclusive, so an event
    * landing exactly at prev+gap starts a new session). */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        rnd(Exact.sumD("value"), 2).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** A9: pivot / cross-tab — days × event types, the dashboard matrix view.
    * Pivot values are pinned (the reference's five event classes) so the
    * plan is a single pass with conditional aggregates — no extra job to
    * discover the columns, which is what an unpinned pivot costs at 100 TB.
    * Empty cells coalesce to 0: Spark's pivot yields NULL for a (day, type)
    * with no rows where a conditional count yields 0 — the count semantics
    * (and the oracle's FILTER counts) are the zeros. */
  def eventPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** A10: rollup — the (event_type, day) hierarchy with subtotals and a
    * grand total in one pass (GROUPING SETS family; Spark expands to one
    * aggregation over the grouping-set union, map-side combined like any
    * hash agg). `grouping_id` disambiguates NULL-as-subtotal from NULL
    * data, matching DuckDB's GROUPING(). */
  def rollupStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .rollup(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), rnd(Exact.sumD("value"), 2).as("total_value"),
        grouping_id().cast("int").as("gid"))

  /** A15: SLIDING window aggregation — 5-minute windows every 1 minute,
    * the overlapping-window complement of a1's tumbling form (a live
    * dashboard smoothing a reading across window boundaries). Spark
    * expands each event to its 5 covering windows on the map side and one
    * partial+final keyed aggregation serves all of them — work ∝
    * events × (window/slide), no state, no self-join; the oracle replays
    * the expansion as an explicit 5-way unnest onto the same minute grid. */
  def slidingWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(col("user_id"), window(col("ts"), "5 minutes", "1 minute"))
      .agg(rnd(Exact.sumD("value"), 2).as("total_value"),
        count(lit(1)).as("cnt"))
      .select(col("user_id"), col("window.start").as("window_start"),
        col("total_value"), col("cnt"))

  /** A14: the full CUBE over (event_type, day) — a10's rollup plus the
    * per-day-across-types slice, i.e. all four grouping sets in ONE pass:
    * Spark expands the cube on the map side and a single partial+final
    * aggregation serves every slice, where four separate GROUP BYs would
    * scan the fact four times. `gid` disambiguates genuine NULL keys from
    * subtotal rows, exactly as in a10. */
  def cubeStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .cube(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"), rnd(Exact.sumD("value"), 2).as("total_value"),
        grouping_id().cast("int").as("gid"))

  /** A11: exact distribution percentiles per event class — the latency/SLA
    * quantile shape. Spark's `percentile` is the exact distributed form
    * (per-group sorted buffer; for 100 TB cardinalities swap in
    * `percentile_approx`, whose sketch merges map-side like HLL — same
    * query, one function swap). Spark's linear interpolation at rank
    * (n−1)·p is bit-identical to DuckDB's quantile_cont (verified on this
    * corpus), so the oracle compares exact doubles. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        rnd(expr("percentile(value, 0.5)"), 4).as("p50"),
        rnd(expr("percentile(value, 0.95)"), 4).as("p95"),
        rnd(expr("percentile(value, 0.99)"), 4).as("p99"),
        count(col("value")).as("n"))

  /** A11b: the 100 TB quantile path itself, under oracle. `percentile_approx`
    * aggregates a constant-size KLL-style sketch (map-side combined,
    * mergeable — exact `percentile` buffers every value per group, which a
    * 100 TB group can't). Sketch internals are engine-specific, so — like
    * m6_vocab_hll — the registered surface is the exact twin plus an
    * `approx_ok` rank-bound flag: with accuracy 10000 the sketch's rank
    * error is ≤1e-4, so each approx value must land within the exact
    * [p−0.01, p+0.01] quantile band; the oracle asserts the same columns
    * with `approx_ok` constant-true, so a sketch drifting out of bound
    * fails the hash compare. */
  def percentilesApprox(spark: SparkSession, dir: String): DataFrame = {
    def inBand(p: Double, lo: String, hi: Column): Column =
      expr(s"percentile_approx(value, $p, 10000)")
        .between(expr(s"percentile(value, $lo)"), hi)
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        rnd(expr("percentile(value, 0.5)"), 4).as("p50"),
        rnd(expr("percentile(value, 0.95)"), 4).as("p95"),
        rnd(expr("percentile(value, 0.99)"), 4).as("p99"),
        count(col("value")).as("n"),
        (inBand(0.5, "0.49", expr("percentile(value, 0.51)")) &&
         inBand(0.95, "0.94", expr("percentile(value, 0.96)")) &&
         inBand(0.99, "0.98", max(col("value")))).as("approx_ok"))
  }

  /** A7: salted two-stage aggregation — the skew pattern for hot keys.
    * `event_type` has ~5 distinct values, the degenerate skew case: a plain
    * groupBy routes 1/5 of a 100 TB table through single reducers. Stage 1
    * aggregates (key, salt) with 16 salts — hot keys fan out 16-way; stage 2
    * collapses the salts per key, shuffling 16 tiny partial rows per key.
    * Decimal partial sums keep the two-stage total bit-equal to the
    * single-stage oracle regardless of how rows land in salts. (Spark's
    * partial/final agg does this automatically when the map side combines
    * well; explicit salting is for when hot-key *reduce* partitions are the
    * bottleneck — this operator is that plan, written out.) */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), pmod(col("event_id"), lit(16)).as("salt"))
      .agg(sum(col("value").cast("decimal(28,2)")).as("psum"),
        count(lit(1)).as("pcnt"))
      .groupBy(col("event_type"))
      .agg(rnd(sum("psum").cast("double"), 2).as("total_value"),
        sum("pcnt").as("cnt"))

  /** A12: funnel analysis — ordered-stage conversion (view → click →
    * purchase): a user reaches stage k only with an event AFTER their
    * stage-(k−1) entry time. The canonical sequential-pattern query of
    * event analytics. Shape: one grouped min per stage, chained through
    * equi-joins on user_id — every shuffle is keyed on the user, the
    * stage tables shrink monotonically, and nothing is ever sorted. The
    * conversion summary is a 3-row frame; its lag window is over those 3
    * rows, never the data. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
    def stage(t: String) = e.filter(col("event_type") === t)
    val s1 = stage("view").groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = stage("click").join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = stage("purchase").join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val counts = s1.agg(count(lit(1)).as("users")).select(lit("1_view").as("stage"), col("users"))
      .unionAll(s2.agg(count(lit(1)).as("users")).select(lit("2_click").as("stage"), col("users")))
      .unionAll(s3.agg(count(lit(1)).as("users")).select(lit("3_purchase").as("stage"), col("users")))
    val w = org.apache.spark.sql.expressions.Window.orderBy("stage")
    counts.withColumn("prev", lag("users", 1).over(w))
      .select(col("stage"), col("users"),
        rnd(col("users").cast("double") / coalesce(col("prev"), col("users")), 4)
          .as("conversion"))
  }

  /** A13: retention cohorts — users grouped by first-seen day, activity
    * counted per day offset (0..7): the engagement matrix every product
    * dashboard serves. Two keyed shuffles (first-seen per user, then the
    * cohort×offset count-distinct); the events side joins the per-user
    * cohort date on user_id — at warehouse scale both sides co-partition
    * on the user key, no broadcast of the fact table, no window. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstSeen = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.join(firstSeen, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .filter(col("day_offset").between(0, 7))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** A16: daily active users with an HLL sketch twin — the dashboard
    * cardinality every serving layer approximates at scale: per day, the
    * exact distinct-user count (the multi-distinct plan: one expand
    * shuffle, no driver state) next to approx_count_distinct (HLL++,
    * rsd 0.02 — constant memory per day regardless of user cardinality,
    * the 100 TB path where exact distinct becomes the widest shuffle in
    * the mart). Sketch internals are engine-specific, so the registered
    * surface follows the m6_vocab_hll pattern: emit the exact twin plus
    * `approx_ok` = relative error ≤ 0.05, and the oracle asserts the same
    * columns with approx_ok constant-true — a sketch drifting out of
    * bound fails the hash gate. */
  def dailyUsersHll(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("users_approx"),
        countDistinct(col("user_id")).as("users_exact"),
        count(lit(1)).as("n_events"))
      .select(col("day"), col("users_exact"), col("n_events"),
        (abs(col("users_approx") - col("users_exact")) / col("users_exact")
          <= 0.05).as("approx_ok"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a12_funnel"           -> funnel,
    "a13_retention"        -> retentionCohorts,
    "a1_window_agg"        -> windowAgg,
    "a4b_quality_alerts"   -> qualityAlerts,
    "a8_sessionize"        -> sessionize,
    "a11_percentiles"      -> percentiles,
    "a11b_percentiles_approx" -> percentilesApprox,
    "a9_event_pivot"       -> eventPivot,
    "a10_rollup"           -> rollupStats,
    "a14_cube"             -> cubeStats,
    "a15_sliding_window"   -> slidingWindowAgg,
    "a16_daily_users"      -> dailyUsersHll,
    "a7_salted_agg"        -> saltedAgg,
    "a2_hourly_agg"        -> hourlyAgg,
    "a3_daily_mart"        -> dailyMart,
    "a3_location_stats"    -> locationStats,
    "a4_quality_ratios"    -> qualityRatios,
    "a5_failure_histogram" -> failureHistogram)

  private val avgV  = Exact.sqlAvg("value")
  private val sumV  = Exact.sqlSum("value")

  val oracles: Map[String, String] = Map(
    "a12_funnel" ->
      s"""WITH e AS (SELECT user_id, ts, event_type FROM events
                     WHERE ts IS NOT NULL AND user_id IS NOT NULL),
          s1 AS (SELECT user_id, min(ts) AS t1 FROM e
                 WHERE event_type = 'view' GROUP BY 1),
          s2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN s1 USING (user_id)
                 WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
          s3 AS (SELECT e.user_id, min(ts) AS t3 FROM e JOIN s2 USING (user_id)
                 WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1),
          c AS (SELECT '1_view' AS stage, count(*) AS users FROM s1
                UNION ALL SELECT '2_click', count(*) FROM s2
                UNION ALL SELECT '3_purchase', count(*) FROM s3)
          SELECT stage, users,
                 ${sqlRnd("CAST(users AS DOUBLE) / coalesce(lag(users) OVER (ORDER BY stage), users)", 4)} AS conversion
          FROM c""",
    "a13_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
                    WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
         SELECT cohort_day, datediff('day', cohort_day, day) AS day_offset,
                count(DISTINCT e.user_id) AS active_users
         FROM e JOIN f USING (user_id)
         WHERE datediff('day', cohort_day, day) BETWEEN 0 AND 7
         GROUP BY 1, 2""",
    "a1_window_agg" ->
      s"""SELECT user_id,
         time_bucket(INTERVAL '5 minutes', ts) AS window_start,
         time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
         ${sqlRnd(avgV, 4)} AS avg_value,
         ${sqlRnd("max(value)", 2)} AS max_value,
         ${sqlRnd("min(value)", 2)} AS min_value,
         ${sqlRnd(sumV, 2)} AS total_value,
         count(*) AS cnt
         FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
         GROUP BY 1, 2, 3""",
    // The salted two-stage plan must equal the plain one-stage aggregate.
    "a7_salted_agg" ->
      s"""SELECT event_type,
         ${sqlRnd(Exact.sqlSum("value"), 2)} AS total_value,
         count(*) AS cnt
         FROM events GROUP BY 1""",
    "a2_hourly_agg" ->
      s"""SELECT user_id, date_trunc('hour', ts) AS hour,
         ${sqlRnd(avgV, 4)} AS avg_value,
         ${sqlRnd("max(value)", 2)} AS max_value,
         ${sqlRnd("min(value)", 2)} AS min_value,
         ${sqlRnd("stddev_samp(value)", 4)} AS stddev_value,
         ${sqlRnd(sumV, 2)} AS total_value,
         count(*) AS cnt
         FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
         GROUP BY 1, 2""",
    "a3_daily_mart" ->
      s"""SELECT user_id, CAST(ts AS DATE) AS day,
         ${sqlRnd(avgV, 4)} AS avg_value,
         ${sqlRnd("max(value)", 2)} AS max_value,
         ${sqlRnd("min(value)", 2)} AS min_value,
         count(*) AS cnt
         FROM events GROUP BY 1, 2""",
    "a3_location_stats" ->
      s"""SELECT event_type, CAST(ts AS DATE) AS day,
         ${sqlRnd(avgV, 4)} AS avg_value,
         count(*) AS cnt,
         count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1, 2""",
    "a4_quality_ratios" ->
      s"""SELECT CAST(ts AS DATE) AS day,
         ${sqlRnd("avg(CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END) * 100", 4)} AS completeness_pct,
         ${sqlRnd("avg(CASE WHEN value BETWEEN 0 AND 100 THEN 1.0 ELSE 0.0 END) * 100", 4)} AS validity_pct,
         count(*) AS cnt
         FROM events GROUP BY 1""",
    "a4b_quality_alerts" ->
      s"""SELECT day, completeness_pct, validity_pct, dlq_pct, cnt,
         completeness_pct < 95.0 AS completeness_alert,
         validity_pct < 95.0 AS validity_alert,
         dlq_pct > 10.0 AS dlq_alert,
         CASE WHEN dlq_pct > 10.0 OR completeness_pct < 95.0 OR validity_pct < 95.0
              THEN 'alert' ELSE 'ok' END AS alert_level
         FROM (SELECT CAST(ts AS DATE) AS day,
           ${sqlRnd("avg(CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END) * 100", 4)} AS completeness_pct,
           ${sqlRnd("avg(CASE WHEN value BETWEEN 0 AND 100 THEN 1.0 ELSE 0.0 END) * 100", 4)} AS validity_pct,
           ${sqlRnd(s"avg(CASE WHEN (${Validation.failuresSql}) <> '' THEN 1.0 ELSE 0.0 END) * 100", 4)} AS dlq_pct,
           count(*) AS cnt
           FROM events GROUP BY 1) t""",
    "a8_sessionize" ->
      s"""WITH e AS (SELECT user_id, ts, value FROM events
                     WHERE ts IS NOT NULL AND user_id IS NOT NULL),
          marked AS (SELECT user_id, ts, value,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          sess AS (SELECT user_id, ts, value,
            sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked)
          SELECT user_id,
            min(ts) AS session_start,
            max(ts) + INTERVAL 30 MINUTE AS session_end,
            count(*) AS n_events,
            ${sqlRnd(sumV, 2)} AS total_value
          FROM sess GROUP BY user_id, sid""",
    "a11_percentiles" ->
      s"""SELECT event_type,
          ${sqlRnd("quantile_cont(value, 0.5)", 4)} AS p50,
          ${sqlRnd("quantile_cont(value, 0.95)", 4)} AS p95,
          ${sqlRnd("quantile_cont(value, 0.99)", 4)} AS p99,
          count(value) AS n
          FROM events GROUP BY 1""",
    "a11b_percentiles_approx" ->
      s"""SELECT event_type,
          ${sqlRnd("quantile_cont(value, 0.5)", 4)} AS p50,
          ${sqlRnd("quantile_cont(value, 0.95)", 4)} AS p95,
          ${sqlRnd("quantile_cont(value, 0.99)", 4)} AS p99,
          count(value) AS n, TRUE AS approx_ok
          FROM events GROUP BY 1""",
    "a9_event_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
         count(*) FILTER (event_type = 'click') AS click,
         count(*) FILTER (event_type = 'error') AS error,
         count(*) FILTER (event_type = 'purchase') AS purchase,
         count(*) FILTER (event_type = 'signup') AS signup,
         count(*) FILTER (event_type = 'view') AS view
         FROM events GROUP BY 1""",
    "a10_rollup" ->
      s"""SELECT event_type, CAST(ts AS DATE) AS day,
          count(*) AS cnt,
          ${sqlRnd(sumV, 2)} AS total_value,
          CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS INTEGER) AS gid
          FROM events GROUP BY ROLLUP(event_type, CAST(ts AS DATE))""",
    // An event at time t sits in exactly the 5 slide-aligned windows with
    // start = minute-floor(t) − k minutes, k ∈ [0,5): minute-floor(t) − 4
    // is always > t − 5 min, so no start needs filtering out.
    // Exact twin + constant-true approx_ok (the m6_vocab_hll pattern:
    // sketch values are engine-specific; their error bound is the gate).
    "a16_daily_users" ->
      """SELECT CAST(ts AS DATE) AS day,
         count(DISTINCT user_id) AS users_exact,
         count(*) AS n_events, TRUE AS approx_ok
         FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
         GROUP BY 1""",
    "a15_sliding_window" ->
      s"""SELECT user_id,
          date_trunc('minute', ts) - u.k * INTERVAL 1 MINUTE AS window_start,
          ${sqlRnd(sumV, 2)} AS total_value,
          count(*) AS cnt
          FROM events, LATERAL unnest(range(0, 5)) AS u(k)
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
          GROUP BY 1, 2""",
    "a14_cube" ->
      s"""SELECT event_type, CAST(ts AS DATE) AS day,
          count(*) AS cnt,
          ${sqlRnd(sumV, 2)} AS total_value,
          CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS INTEGER) AS gid
          FROM events GROUP BY CUBE(event_type, CAST(ts AS DATE))""",
    "a5_failure_histogram" ->
      s"""SELECT event_type, cnt,
         ${sqlRnd("cnt * 100.0 / sum(cnt) OVER ()", 4)} AS pct
         FROM (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1) t""")
}
