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

  /** W9: gap-fill + linear interpolation — the resampling primitive every
    * IoT time-series serving layer needs: readings arrive at arbitrary
    * instants, dashboards want a regular hourly grid. For each grid
    * instant: linear interpolation between the surrounding readings,
    * last-value hold past the final reading, backfill before the first.
    *
    * Shape: grid points and readings UNION into one stream, but the
    * carry-forward/carry-backward window is partitioned by (user, DAY) —
    * never by the bare key. A per-user unbounded frame sorts a sensor's
    * ENTIRE history in one window partition (a year of 10 s readings is
    * ~3M rows in one task's sort buffer), which is exactly the state blow-up
    * that dies at 100 TB. Bucketing bounds every window partition to one
    * day of one sensor; the cross-day carry is stitched back in via a
    * per-bucket 2-row digest: for each (user, day) the last and first
    * reading as a (tsm, event_id, value) struct, a day-granular window over
    * that TINY frame (≤ #days rows per user) produces last-before /
    * first-after each bucket, and one equi-join on (user, day) — the same
    * hash partitioning the window just established, so no extra exchange
    * on the big side — fills the grid rows whose neighbor lives in another
    * day. Output is row-for-row identical to the single-window form
    * (AnalyticWindowsSpec pins the equivalence; the DuckDB oracle keeps the
    * declarative single-window spelling). Readings sort BEFORE their
    * co-timed grid point, so a grid instant exactly on a reading reproduces
    * that reading (frac = 0) in both engines. The interpolation is
    * fixed-order IEEE arithmetic — bit-identical cross-engine. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
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
      .withColumn("day", to_date(col("ts")))
    val ord = Seq(col("ts"), col("is_grid"), col("event_id"))
    val wPrev = Window.partitionBy("user_id", "day").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id", "day").orderBy(ord: _*)
      .rowsBetween(1, Window.unboundedFollowing)
    val readingTs = when(col("is_grid") === 0, col("tsm"))
    // in-bucket carry: null exactly when the neighboring reading lives in
    // another day (pv null ⟺ pt null — grid rows carry null value AND null
    // readingTs, readings carry both)
    val local = unioned
      .withColumn("pv", last("value", ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(readingTs, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first("value", ignoreNulls = true).over(wNext))
      .withColumn("nt", first(readingTs, ignoreNulls = true).over(wNext))
      .filter(col("is_grid") === 1)
    // per-bucket boundary digest from the readings alone; struct order
    // (tsm, event_id, value) replays the window's (ts, event_id) tiebreak
    val rs = struct(unix_micros(col("ts")).as("t"), col("event_id").as("id"),
      col("value").as("v"))
    val ends = e.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max(rs).as("last_r"), min(rs).as("first_r"))
    // every bucket the union produces (reading days ⊆ grid day span, so
    // this is the per-user day sequence); the stitch window runs over ≤
    // #days rows per user — bounded regardless of reading density
    val days = unioned.select(col("user_id"), col("day")).distinct()
    val wDays = Window.partitionBy("user_id").orderBy("day")
    val bounds = days.join(ends, Seq("user_id", "day"), "left")
      .withColumn("prev_r", last("last_r", ignoreNulls = true)
        .over(wDays.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("next_r", first("first_r", ignoreNulls = true)
        .over(wDays.rowsBetween(1, Window.unboundedFollowing)))
      .select(col("user_id"), col("day"), col("prev_r"), col("next_r"))
    local.join(bounds, Seq("user_id", "day"))
      .withColumn("pv2", coalesce(col("pv"), col("prev_r.v")))
      .withColumn("pt2", coalesce(col("pt"), col("prev_r.t")))
      .withColumn("nv2", coalesce(col("nv"), col("next_r.v")))
      .withColumn("nt2", coalesce(col("nt"), col("next_r.t")))
      .select(col("user_id"), col("ts").as("grid_ts"),
        rnd(when(col("pt2").isNull, col("nv2"))
          .when(col("nt2").isNull, col("pv2"))
          .otherwise(col("pv2") + (col("nv2") - col("pv2")) *
            ((col("tsm") - col("pt2")).cast("double") /
             (col("nt2") - col("pt2")).cast("double"))), 4).as("value"),
        when(col("pt2").isNull, "backfill")
          .when(col("nt2").isNull, "hold")
          .otherwise("interp").as("method"))
  }

  /** W10: exponential moving average per sensor — the classic smoothing
    * recurrence ema_i = 0.8·ema_{i−1} + 0.2·x_i, seeded with the first
    * reading. A recurrence has no window-function form (each row needs the
    * previous ROW'S RESULT, not a frame aggregate), so the engine shape is
    * the fold: one groupBy(user) collects each sensor's (ts, event_id,
    * value) readings into a sorted array and a single higher-order
    * `aggregate` runs the recurrence left-to-right — work ∝ readings, one
    * shuffle on the sensor key, parallel across the sensor population
    * (the recurrence is inherently sequential WITHIN a sensor; no engine
    * escapes that). Per-key memory is one sensor's history — the same
    * per-key budget the session store carries in streaming form. The
    * closed-form weight expansion (αΣ(1−α)^k·x) would avoid the array but
    * rides `pow`, whose last-ulp behavior is libm-specific — the fold is
    * pure mul/add, so DuckDB's identical-order list_reduce replays it
    * bit-for-bit (rnd 6 guards the final emission only). */
  def ema(spark: SparkSession, dir: String): DataFrame = {
    val step = (acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =>
      when(acc.isNull, x.getField("v"))
        .otherwise(acc * lit(0.8) + lit(0.2) * x.getField("v"))
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull && col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id").as("eid"), col("value").as("v")))).as("seq"))
      .select(col("user_id"), size(col("seq")).as("n_events"),
        rnd(aggregate(col("seq"), lit(null).cast("double"), step), 6).as("ema"))
  }

  /** W11: distribution deciles per event class — "which decile of its
    * type's value distribution is this reading in", the percentile-bucket
    * label feeding SLA dashboards and outlier triage. An `ntile(10)` window
    * over the raw table would single-thread each event class through one
    * sort (the W3/W4 anti-shape); instead the TWO-PHASE form: the 9 exact
    * decile boundaries per class come from one map-side-combined
    * `percentile` aggregate (a11's machinery), broadcast back, and each
    * row's decile is a 9-comparison fold over the boundary array — no sort
    * of raw data anywhere, work ∝ rows. Spark's exact `percentile`
    * interpolation is bit-identical to DuckDB's quantile_cont (pinned by
    * a11), so the strict > comparisons agree on every boundary. */
  def valueDeciles(spark: SparkSession, dir: String): DataFrame = {
    val probs = (1 to 9).map(p => s"0.$p").mkString(", ")
    val base = Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
    val bounds = base.groupBy("event_type")
      .agg(expr(s"percentile(value, array($probs))").as("bs"))
    base.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        (aggregate(col("bs"), lit(0L),
          (acc, b) => acc + when(col("value") > b, 1L).otherwise(0L)) + 1)
          .as("decile"))
  }

  /** W12: median/MAD robust anomaly detection per event class — the
    * outlier-resistant sibling of W3's mean/2σ flags (a spiky `value` drags
    * the mean and masks its own anomaly; the median doesn't move). Two exact
    * percentile passes (the a11 machinery — Spark `percentile` is
    * bit-identical to DuckDB `quantile_cont`): class medians, then the
    * median of absolute deviations, each a partial+final agg over the
    * event-class key with the tiny per-class stats broadcast back — never an
    * unbounded window over raw rows (the W3/W4 scale discipline). The
    * anomaly rule `dev > 3·MAD` compares doubles both engines derive through
    * the identical expression tree, so the strict bound is deterministic.
    * The dev frame is re-derived (not cached) on each side of the MAD join —
    * three 2-column pruned scans that collapse map-side, the same
    * recompute-over-pin choice as tokenBudget/importantParts. */
  def madAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        rnd(min(col("med")), 4).as("med"),
        rnd(min(col("mad")), 4).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("dev") > col("mad") * 3.0, 1L).otherwise(0L))
          .as("n_anomalies"))
  }

  /** W13: CUSUM level-shift detection per user — the classic changepoint
    * statistic: the running sum of deviations from the user's own mean,
    * which hovers near zero under a stable level and ramps linearly once
    * the level shifts. Numerics make this cross-engine-exact without any
    * epsilon: the running sum of the 2-decimal `value` is DECIMAL (exact,
    * order-independent given the deterministic ts+event_id order), the mean
    * is the exact decimal sum / count, and `cum_dev = cum − k·mean` touches
    * doubles only in one identical expression tree. The per-user mean is
    * two-phase (groupBy + broadcast back, the W3 discipline); the running
    * sum is a genuine ordered window — one shuffle on user_id, frames never
    * span users. */
  def cusumShift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val stats = ev.groupBy(col("user_id"))
      .agg(Exact.avgD("value").as("u_mean"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.join(broadcast(stats), Seq("user_id"))
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("cum_dev",
        rnd(Exact.sumOver("value", w) - col("k") * col("u_mean"), 4))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        col("cum_dev"), (abs(col("cum_dev")) > 200.0).as("shifted"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w13_cusum_shift"    -> cusumShift,
    "w12_mad_anomaly"    -> madAnomaly,
    "w10_ema"            -> ema,
    "w11_value_deciles"  -> valueDeciles,
    "w9_gap_fill"        -> gapFill,
    "w1_rolling_avg"     -> rollingAvg,
    "w2_pct_change"      -> pctChange,
    "w3_anomaly_2sigma"  -> anomaly2Sigma,
    "w4_group_avg_delta" -> groupAvgDelta,
    "w5_rank_by_avg"     -> rankByAvg,
    "w6_top1_per_group"  -> top1PerGroup,
    "w7_staging_row_number" -> stagingRowNumber,
    "w8_latest_per_key"  -> latestPerKey)

  val oracles: Map[String, String] = Map(
    // Exact decimal running sum minus k·mean through the identical double
    // tree; order ties impossible (ts, event_id is unique per user).
    "w13_cusum_shift" -> {
      val w = "(PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
      s"""WITH e AS (SELECT event_id, ts, user_id, value FROM events
                     WHERE value IS NOT NULL),
          s AS (SELECT user_id, ${Exact.sqlAvg("value")} AS u_mean
                FROM e GROUP BY 1),
          c AS (SELECT e.user_id, event_id, ts, value,
                  ${Exact.sqlSumOver("value", w)} AS cum,
                  count(*) OVER $w AS k, u_mean
                FROM e JOIN s USING (user_id))
          SELECT user_id, event_id, ts, value,
                 ${sqlRnd("cum - k * u_mean", 4)} AS cum_dev,
                 abs(${sqlRnd("cum - k * u_mean", 4)}) > 200.0 AS shifted
          FROM c"""
    },
    // Same two quantile_cont passes as the Spark plan; med/mad replayed
    // through the identical expression tree so the 3·MAD strict bound lands
    // every row on the same side.
    "w12_mad_anomaly" ->
      s"""WITH e AS (SELECT event_type, value FROM events
                     WHERE value IS NOT NULL),
          med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                  FROM e GROUP BY 1),
          dev AS (SELECT e.event_type, abs(value - med) AS dev, med
                  FROM e JOIN med USING (event_type)),
          mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
                  FROM dev GROUP BY 1)
          SELECT d.event_type,
                 ${sqlRnd("min(d.med)", 4)} AS med,
                 ${sqlRnd("min(m.mad)", 4)} AS mad,
                 count(*) AS n,
                 count(*) FILTER (d.dev > m.mad * 3.0) AS n_anomalies
          FROM dev d JOIN mad m USING (event_type)
          GROUP BY 1""",
    // quantile_cont's interpolation is bit-identical to Spark's percentile
    // (the a11 pin), so counting strict >-crossings over the same 9
    // boundary doubles lands every row in the same decile.
    "w11_value_deciles" ->
      """WITH b AS (SELECT event_type,
             quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
           FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
           GROUP BY 1)
         SELECT event_id, event_type, value,
           CAST(len(list_filter(bs, x -> value > x)) + 1 AS BIGINT) AS decile
         FROM events JOIN b USING (event_type)
         WHERE value IS NOT NULL AND event_type IS NOT NULL""",
    // list() with ORDER BY builds the identical sorted sequence; list_reduce
    // without an init seeds from the first element, matching the engine's
    // null-seeded fold — every step is the same mul/add in the same order,
    // so the doubles agree bit-for-bit before the final rnd.
    "w10_ema" ->
      s"""SELECT user_id, CAST(len(l) AS INTEGER) AS n_events,
          ${sqlRnd("list_reduce(l, (acc, x) -> acc * 0.8 + 0.2 * x)", 6)} AS ema
          FROM (SELECT user_id, list(value ORDER BY ts, event_id) AS l
                FROM events
                WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
                GROUP BY 1) t""",
    "w9_gap_fill" ->
      s"""WITH e AS (SELECT user_id, ts, value, event_id FROM events
                     WHERE ts IS NOT NULL AND user_id IS NOT NULL
                       AND value IS NOT NULL),
          g AS (SELECT user_id,
                  unnest(generate_series(date_trunc('hour', min(ts)),
                    date_trunc('hour', max(ts)), INTERVAL 1 HOUR)) AS grid_ts
                FROM e GROUP BY user_id),
          u AS (SELECT user_id, ts, 0 AS is_grid, value,
                  epoch_us(ts) AS tsm, event_id FROM e
                UNION ALL
                SELECT user_id, grid_ts, 1, NULL, epoch_us(grid_ts), 0 FROM g),
          w AS (SELECT *,
                  last_value(value IGNORE NULLS) OVER wp AS pv,
                  last_value(CASE WHEN is_grid = 0 THEN tsm END IGNORE NULLS) OVER wp AS pt,
                  first_value(value IGNORE NULLS) OVER wn AS nv,
                  first_value(CASE WHEN is_grid = 0 THEN tsm END IGNORE NULLS) OVER wn AS nt
                FROM u
                WINDOW wp AS (PARTITION BY user_id ORDER BY ts, is_grid, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                  wn AS (PARTITION BY user_id ORDER BY ts, is_grid, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
          SELECT user_id, ts AS grid_ts,
            ${sqlRnd("CASE WHEN pt IS NULL THEN nv WHEN nt IS NULL THEN pv ELSE pv + (nv - pv) * (CAST(tsm - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END", 4)} AS value,
            CASE WHEN pt IS NULL THEN 'backfill' WHEN nt IS NULL THEN 'hold'
                 ELSE 'interp' END AS method
          FROM w WHERE is_grid = 1""",
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
