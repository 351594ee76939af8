package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.8).
  *
  * The reference has no explicit set operators — but it has the two shapes
  * they invert: the validate+route split (V8, validation_consumer.py:411-468)
  * whose inverse is a re-ingest UNION of the valid stream with the repaired
  * DLQ stream, and periodic activity snapshots (mongo_to_postgres_sync.py's
  * windowed extracts) whose natural comparisons are INTERSECT / EXCEPT /
  * EXCEPT ALL between periods. u1–u4 close that §2.8 row with all four ANSI
  * forms.
  *
  * Scale notes: Spark compiles UNION ALL to a zero-shuffle concatenation of
  * the children; INTERSECT/EXCEPT to a map-side-partial distinct feeding one
  * hash-partitioned left-semi/anti join on the full row key; EXCEPT ALL to
  * the sum-of-signed-multiplicities rewrite (one shuffle on the row key,
  * then Generate to replicate survivors) — none of them ever materialize a
  * cross product or a driver-side set, so each survives a 100× scale-up as
  * ordinary keyed shuffles. The period bounds are pushed to the parquet scan
  * as plain micros comparisons (`Tables.eventsWithRawTs` — row-group
  * pruning now, partition pruning on a date-partitioned layout at scale).
  */
object SetOps {

  private val W1Lo = "2024-01-01 00:00:00"
  private val W1Hi = "2024-01-08 00:00:00"
  private val W2Hi = "2024-01-15 00:00:00"

  /** Events of [lo, hi) with the time bound pushed on the raw micros
    * column (PlanContractSpec pins this pattern's pushdown). */
  private def window(spark: SparkSession, dir: String, lo: String, hi: String): DataFrame =
    Tables.eventsWithRawTs(spark, dir)
      .filter(col("ts_raw") >= lit(Tables.rawTs(lo)) &&
              col("ts_raw") < lit(Tables.rawTs(hi)))
      .drop("ts_raw")

  private def week1(spark: SparkSession, dir: String) = window(spark, dir, W1Lo, W1Hi)
  private def week2(spark: SparkSession, dir: String) = window(spark, dir, W1Hi, W2Hi)

  /** U1: re-ingest UNION — the inverse of the V8 split. The valid stream
    * passes through untouched — including rows whose event_type is merely
    * padded (' click '): the format rule tests the TRIMMED value, so
    * padding alone is valid and the direct branch preserves the raw bytes,
    * exactly like the V8 split it inverts. DLQ rows whose failures are
    * repairable (out-of-range value → clamp to [0,100], fixable CASING →
    * lower+trim) are repaired and re-unioned with provenance; rows with
    * missing required fields or a critically-empty event_type have nothing
    * to repair from and stay dead. Same rule set as Validation.eventRules
    * (validation_consumer.py:255-352), mirrored in the oracle. */
  def unionReingest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val trimmed   = lower(trim(col("event_type")))
    val missing   = col("event_id").isNull || col("ts").isNull || col("user_id").isNull
    val critical  = col("event_type").isNull ||
      trimmed.isin("null", "none", "n/a", "")
    val badFormat = col("event_type").isNotNull &&
      !trim(col("event_type")).rlike("^[a-z]+$")
    val badRange  = col("value").isNotNull &&
      (col("value") < 0.0 || col("value") > 100.0)

    val direct = ev
      .filter(!missing && !critical && !badFormat && !badRange)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        lit("direct").as("origin"))

    val repaired = ev
      .filter((badFormat || badRange) && !missing && !critical &&
        trimmed.rlike("^[a-z]+$"))
      .select(col("event_id"), col("user_id"),
        trimmed.as("event_type"),
        when(col("value").isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col("value"), lit(0.0)), lit(100.0)))
          .as("value"),
        lit("reingested").as("origin"))

    direct.unionByName(repaired)
  }

  /** U2: INTERSECT — (user, event_type) pairs active in BOTH weeks.
    * Distinct set semantics; plans as partial-distinct + one left-semi
    * shuffle on the pair key. */
  def intersectActive(spark: SparkSession, dir: String): DataFrame =
    week1(spark, dir).select(col("user_id"), col("event_type"))
      .intersect(week2(spark, dir).select(col("user_id"), col("event_type")))

  /** U3: EXCEPT — pairs active in week 1 that went silent in week 2
    * (the churn set). Partial-distinct + one left-anti shuffle. */
  def exceptChurned(spark: SparkSession, dir: String): DataFrame =
    week1(spark, dir).select(col("user_id"), col("event_type"))
      .except(week2(spark, dir).select(col("user_id"), col("event_type")))

  /** U4: EXCEPT ALL — multiset surplus: how many MORE times each pair
    * occurred in week 1 than week 2, for pairs with a positive surplus.
    * Spark's signed-multiplicity rewrite keeps this one shuffle; the
    * trailing count aggregation reuses the same hash partitioning. */
  def exceptAllSurplus(spark: SparkSession, dir: String): DataFrame =
    week1(spark, dir).select(col("user_id"), col("event_type"))
      .exceptAll(week2(spark, dir).select(col("user_id"), col("event_type")))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("surplus"))

  /** U5: UNION (distinct) — the pair universe across both weeks, the one
    * ANSI form u1's narrow re-ingest UNION ALL doesn't exercise: the
    * concatenation is narrow, the DISTINCT is the single pair-keyed
    * shuffle with map-side partial aggregation. */
  def unionDistinct(spark: SparkSession, dir: String): DataFrame =
    week1(spark, dir).select(col("user_id"), col("event_type"))
      .union(week2(spark, dir).select(col("user_id"), col("event_type")))
      .distinct()

  /** U6: INTERSECT ALL — multiset overlap: each pair as many times as it
    * appears in BOTH weeks (min of the two multiplicities). Spark's
    * signed-multiplicity rewrite keeps it one shuffle; the trailing count
    * reuses the same partitioning, mirroring u4. */
  def intersectAllOverlap(spark: SparkSession, dir: String): DataFrame =
    week1(spark, dir).select(col("user_id"), col("event_type"))
      .intersectAll(week2(spark, dir).select(col("user_id"), col("event_type")))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("overlap"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u1_union_reingest"   -> unionReingest,
    "u2_intersect_active" -> intersectActive,
    "u3_except_churned"   -> exceptChurned,
    "u4_except_all_surplus" -> exceptAllSurplus,
    "u5_union_distinct"   -> unionDistinct,
    "u6_intersect_all_overlap" -> intersectAllOverlap)

  private val W1 = s"ts >= TIMESTAMP '$W1Lo' AND ts < TIMESTAMP '$W1Hi'"
  private val W2 = s"ts >= TIMESTAMP '$W1Hi' AND ts < TIMESTAMP '$W2Hi'"

  val oracles: Map[String, String] = Map(
    "u1_union_reingest" ->
      """WITH e AS (SELECT *,
           (event_id IS NULL OR ts IS NULL OR user_id IS NULL) AS missing,
           (event_type IS NULL
              OR lower(trim(event_type)) IN ('null','none','n/a','')) AS critical,
           (event_type IS NOT NULL
              AND NOT regexp_full_match(trim(event_type), '^[a-z]+$')) AS badfmt,
           (value IS NOT NULL AND (value < 0.0 OR value > 100.0)) AS badrange
         FROM events)
         SELECT event_id, user_id, event_type, value, 'direct' AS origin
         FROM e WHERE NOT missing AND NOT critical AND NOT badfmt AND NOT badrange
         UNION ALL
         SELECT event_id, user_id, lower(trim(event_type)) AS event_type,
                CASE WHEN value IS NULL THEN NULL
                     ELSE least(greatest(value, 0.0), 100.0) END AS value,
                'reingested' AS origin
         FROM e
         WHERE (badfmt OR badrange) AND NOT missing AND NOT critical
           AND regexp_full_match(lower(trim(event_type)), '^[a-z]+$')""",
    "u2_intersect_active" ->
      s"""(SELECT user_id, event_type FROM events WHERE $W1)
          INTERSECT
          (SELECT user_id, event_type FROM events WHERE $W2)""",
    "u3_except_churned" ->
      s"""(SELECT user_id, event_type FROM events WHERE $W1)
          EXCEPT
          (SELECT user_id, event_type FROM events WHERE $W2)""",
    "u4_except_all_surplus" ->
      s"""SELECT user_id, event_type, count(*) AS surplus
          FROM ((SELECT user_id, event_type FROM events WHERE $W1)
                EXCEPT ALL
                (SELECT user_id, event_type FROM events WHERE $W2))
          GROUP BY 1, 2""",
    "u5_union_distinct" ->
      s"""(SELECT user_id, event_type FROM events WHERE $W1)
          UNION
          (SELECT user_id, event_type FROM events WHERE $W2)""",
    "u6_intersect_all_overlap" ->
      s"""SELECT user_id, event_type, count(*) AS overlap
          FROM ((SELECT user_id, event_type FROM events WHERE $W1)
                INTERSECT ALL
                (SELECT user_id, event_type FROM events WHERE $W2))
          GROUP BY 1, 2""")
}
