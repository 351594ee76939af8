package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorts / limits / serving-layer query shapes (SURVEY.md §2.7 O1–O3 and
  * §7.1 M5 — the dbt-marts / FastAPI analog queries, Learning
  * Guide.txt:1071, :1084).
  *
  * Order-by + limit compiles to Spark's TakeOrderedAndProject: each partition
  * keeps only its local top-N and the driver merges N×partitions rows — no
  * global sort, no full shuffle, which is the shape that survives 100 TB.
  * Every sort key includes a unique tiebreaker so limits are deterministic.
  */
object Serving {

  /** O1: incremental-sync read ordering + limit
    * (mongo_to_postgres_sync.py:139). */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .orderBy(col("ts"), col("event_id"))
      .limit(1000)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))

  /** O2: failure-type top-10 (validation_consumer.py:621-626). */
  def topkHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"))
      .limit(10)

  /** S7: incremental watermark read — rows newer than the last sync point,
    * ordered, batched (mongo_to_postgres_sync.py:109-143). The predicate
    * is applied to the RAW scan column (Tables.eventsWithRawTs) so it
    * genuinely pushes down to the parquet scan as a plain micros comparison —
    * a bound on the converted timestamp hides behind the conversion
    * expression and reads every row group (PlanContractSpec pins this). */
  def incrementalRead(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsWithRawTs(spark, dir)
      .filter(col("ts_raw") >= lit(Tables.rawTs("2024-01-25 00:00:00")))
      .drop("ts_raw")
      .orderBy(col("ts"), col("event_id"))
      .limit(1000)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))

  /** O3: API pagination — page 2 (size 10) of the newest-first listing
    * (docs/topic3_usage_guide.md:187-189 `ORDER BY window_start DESC LIMIT`,
    * Learning Guide.txt:1084 `limit` param). Offset pagination matches the
    * reference's API shape; at depth the scale-safe variant is keyset
    * pagination (`WHERE ts < last_seen ORDER BY ts DESC LIMIT n`), which
    * this plan degrades to by swapping the offset for the pushed filter. */
  def apiPagination(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .orderBy(col("ts").desc, col("event_id").desc)
      .offset(10).limit(10)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))

  /** M5f: keyset pagination — the scale-safe deep-page variant o3's
    * offset form degrades at depth (offset N still sorts/skips N rows
    * per page): the client passes the last-seen key and the next page is
    * `ts < last_seen ORDER BY ts DESC LIMIT n`. The bound rides the RAW
    * scan column, so it is a pushed micros scan predicate + one
    * TakeOrderedAndProject — page cost is independent of page depth
    * (PlanContractSpec pins both properties). */
  def keysetPage(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsWithRawTs(spark, dir)
      .filter(col("ts_raw") < lit(Tables.rawTs("2024-01-30 00:00:00")))
      .drop("ts_raw")
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(10)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))

  /** M5a: per-key time series between dates at hourly granularity
    * (API `GET /sensors/{id}/analytics`, Learning Guide.txt:1084 §2). */
  def timeSeries(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsWithRawTs(spark, dir)
      .filter(col("ts_raw") >= lit(Tables.rawTs("2024-01-10 00:00:00")) &&
              col("ts_raw") <  lit(Tables.rawTs("2024-01-20 00:00:00")))
      .drop("ts_raw")
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(Exact.rnd(Exact.avgD("value"), 4).as("avg_value"),
        Exact.rnd(max("value"), 2).as("max_value"),
        count(lit(1)).as("cnt"))

  /** M5b: staging-layer transform (Learning Guide.txt:1071 §2 Layer 1) —
    * rename / cast / time-feature extraction. */
  def stagingTransform(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id").as("reading_id"),
        col("user_id").as("sensor_key"),
        col("ts").as("event_timestamp"),
        col("value").cast("double").as("reading_value"),
        to_date(col("ts")).as("event_date"),
        hour(col("ts")).as("event_hour"),
        dayofweek(col("ts")).as("event_dow"))

  /** M5c: sensor-status CASE classification (Learning Guide.txt:1071 §2
    * intermediate layer: sensor_status) over latest-per-key readings. */
  def sensorStatus(spark: SparkSession, dir: String): DataFrame =
    AnalyticWindows.latestPerKey(spark, dir)
      .select(
        col("user_id"), col("latest_ts"), col("value"),
        when(col("value") > 400, "critical")
          .when(col("value") > 200, "warning")
          .otherwise("normal").as("sensor_status"))

  /** M5e: health/freshness probe — the API's health endpoint with
    * data-freshness check (Learning Guide.txt:1084 §2/§4): per sensor, the
    * newest reading, its lag behind the pipeline's frontier, and a stale
    * flag at 1 hour. "Now" is the deterministic corpus frontier max(ts)
    * (same substitution as V5 freshness — wall-clock would not be
    * oracle-able); it rides a 1-row broadcast, the per-sensor agg is one
    * map-side-combined hash aggregation. */
  def healthProbe(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir).filter(col("ts").isNotNull)
    val now = events.agg(max("ts").as("now"))
    events.groupBy(col("user_id"))
      .agg(max("ts").as("latest_ts"), count(lit(1)).as("n_readings"))
      .crossJoin(broadcast(now))
      .select(col("user_id"), col("latest_ts"), col("n_readings"),
        (unix_timestamp(col("now")) - unix_timestamp(col("latest_ts")))
          .as("lag_seconds"),
        ((unix_timestamp(col("now")) - unix_timestamp(col("latest_ts"))) > 3600)
          .as("is_stale"))
  }

  /** M5d: the `spark.sql` entry surface — the same engine driven by SQL text
    * over registered views instead of the DataFrame DSL (both compile to the
    * same Catalyst plan; this registers the proof). TPC-H Q1-shaped pricing
    * summary with the engine's exact-arithmetic conventions inline. */
  def sqlPricingSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
           floor(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_qty,
           floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_price,
           count(*) AS cnt
         FROM lineitem_v
         WHERE l_shipdate <= TIMESTAMP '1998-06-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""")
  }

  /** M5g: equi-width value histogram per event class — the
    * distribution-dashboard serving shape (reading-value spread per sensor
    * type). 20 fixed 25-unit buckets, clamped at both ends so outliers land
    * in the edge buckets instead of growing the key space: the output is
    * bounded at types × 20 rows REGARDLESS of data volume, and the plan is
    * one narrow bucket map + one map-side-combined aggregation — the
    * histogram every monitoring UI renders, computed without a sort,
    * a window, or an unbounded group count. Bucket id is floor(value/25) —
    * one IEEE divide + floor, identical across engines. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .withColumn("bucket",
        least(greatest(floor(col("value") / 25).cast("long"), lit(0L)), lit(19L)))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        Exact.rnd(Exact.sumD("value"), 2).as("sum_value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m5g_value_histogram" -> valueHistogram,
    "o1_sort_limit"       -> sortLimit,
    "m5d_sql_pricing_summary" -> sqlPricingSummary,
    "o2_topk_histogram"   -> topkHistogram,
    "o3_api_pagination"   -> apiPagination,
    "m5f_keyset_page"     -> keysetPage,
    "s7_incremental_read" -> incrementalRead,
    "m5a_time_series"     -> timeSeries,
    "m5b_staging_transform" -> stagingTransform,
    "m5c_sensor_status"   -> sensorStatus,
    "m5e_health_probe"    -> healthProbe)

  val oracles: Map[String, String] = Map(
    "m5g_value_histogram" ->
      s"""SELECT event_type,
          CAST(least(greatest(floor(value / 25), 0), 19) AS BIGINT) AS bucket,
          count(*) AS cnt,
          ${Exact.sqlRnd(Exact.sqlSum("value"), 2)} AS sum_value
          FROM events
          WHERE value IS NOT NULL AND event_type IS NOT NULL
          GROUP BY 1, 2""",
    "o1_sort_limit" ->
      """SELECT event_id, ts, user_id, value FROM events
         ORDER BY ts, event_id LIMIT 1000""",
    "o2_topk_histogram" ->
      """SELECT event_type, count(*) AS cnt FROM events
         GROUP BY 1 ORDER BY cnt DESC, event_type LIMIT 10""",
    "m5d_sql_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         floor(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_qty,
         floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_price,
         count(*) AS cnt
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-06-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "o3_api_pagination" ->
      """SELECT event_id, ts, user_id, value FROM events
         ORDER BY ts DESC, event_id DESC LIMIT 10 OFFSET 10""",
    "m5f_keyset_page" ->
      """SELECT event_id, ts, user_id, value FROM events
         WHERE ts < TIMESTAMP '2024-01-30 00:00:00'
         ORDER BY ts DESC, event_id DESC LIMIT 10""",
    "s7_incremental_read" ->
      """SELECT event_id, ts, user_id, value FROM events
         WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
         ORDER BY ts, event_id LIMIT 1000""",
    "m5a_time_series" ->
      s"""SELECT user_id, date_trunc('hour', ts) AS hour,
         ${Exact.sqlRnd(Exact.sqlAvg("value"), 4)} AS avg_value,
         ${Exact.sqlRnd("max(value)", 2)} AS max_value,
         count(*) AS cnt
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts <  TIMESTAMP '2024-01-20 00:00:00'
         GROUP BY 1, 2""",
    "m5b_staging_transform" ->
      """SELECT event_id AS reading_id, user_id AS sensor_key,
         ts AS event_timestamp, CAST(value AS DOUBLE) AS reading_value,
         CAST(ts AS DATE) AS event_date,
         CAST(hour(ts) AS INTEGER) AS event_hour,
         CAST(dayofweek(ts) + 1 AS INTEGER) AS event_dow
         FROM events""",
    "m5e_health_probe" ->
      """WITH e AS (SELECT user_id, ts FROM events WHERE ts IS NOT NULL),
         agg AS (SELECT user_id, max(ts) AS latest_ts, count(*) AS n_readings
                 FROM e GROUP BY 1),
         m AS (SELECT max(ts) AS now FROM e)
         SELECT user_id, latest_ts, n_readings,
           CAST(floor(epoch(m.now)) AS BIGINT)
             - CAST(floor(epoch(latest_ts)) AS BIGINT) AS lag_seconds,
           (CAST(floor(epoch(m.now)) AS BIGINT)
             - CAST(floor(epoch(latest_ts)) AS BIGINT)) > 3600 AS is_stale
         FROM agg, m""",
    "m5c_sensor_status" ->
      """SELECT user_id, ts AS latest_ts, value,
         CASE WHEN value > 400 THEN 'critical'
              WHEN value > 200 THEN 'warning'
              ELSE 'normal' END AS sensor_status
         FROM (SELECT user_id, ts, value,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) t WHERE rn = 1""")
}
