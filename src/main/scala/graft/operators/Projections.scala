package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projection / parse / filter operators (SURVEY.md §2.2, P1–P4).
  *
  * The reference's ingest path (reference spark_streaming/streaming_job.py:245-267)
  * is: JSON-envelope projection → struct flatten → timestamp parse → null-drop
  * filters. All four are plain narrow transformations: no shuffle, fully
  * codegen'd, and Catalyst pushes the null filters and the column pruning into
  * the parquet scan — at 100 TB the scan reads only the referenced columns.
  */
object Projections {

  /** ISO-8601 pattern used by the reference (streaming_job.py:258-261). */
  val IsoFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"

  /** P1: JSON payload projection — `from_json`/`get_json_object` on the raw
    * `props` JSON string (≙ Kafka `value` parse, streaming_job.py:245-249). */
  def jsonProjection(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))

  /** P2: struct flatten — build the envelope struct then `data.*`
    * (streaming_job.py:252-255). Catalyst collapses the struct round-trip so
    * the physical plan is a plain column projection. */
  def structFlatten(spark: SparkSession, dir: String): DataFrame = {
    val withEnvelope = Tables.events(spark, dir)
      .select(
        col("event_id"),
        struct(col("user_id"), col("event_type"), col("value")).as("data"))
    withEnvelope.select(col("event_id"), col("data.*"))
  }

  /** P3: timestamp format + re-parse with the reference's exact pattern
    * (streaming_job.py:258-261). Output truncates to millis, as the
    * reference's `SSS` pattern does. */
  def timestampParse(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        date_format(col("ts"), IsoFmt).as("iso"),
        to_timestamp(date_format(col("ts"), IsoFmt), IsoFmt).as("parsed"))

  /** P4: null-drop filters before aggregation (streaming_job.py:264-267).
    * Both predicates reach the parquet scan as PushedFilters. */
  def nullFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))

  /** P6: batch-constant `processed_at` column (streaming_job.py:346-349 —
    * the reference stamps ONE driver-side constant per query start, not a
    * per-row clock). The deterministic stand-in for "now" is max(ts) over
    * the batch, computed once and broadcast — same single-constant
    * semantics, oracle-able. */
  def processedAt(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val now = events.agg(max("ts").as("processed_at"))
    events.crossJoin(broadcast(now))
      .select(col("event_id"), col("ts"), col("processed_at"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_json_projection" -> jsonProjection,
    "p2_struct_flatten"  -> structFlatten,
    "p3_timestamp_parse" -> timestampParse,
    "p4_null_filter"     -> nullFilter,
    "p6_processed_at"    -> processedAt)

  val oracles: Map[String, String] = Map(
    "p1_json_projection" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events",
    "p2_struct_flatten" ->
      "SELECT event_id, user_id, event_type, value FROM events",
    "p3_timestamp_parse" ->
      """SELECT event_id,
         strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS iso,
         date_trunc('milliseconds', ts) AS parsed
         FROM events""",
    "p4_null_filter" ->
      "SELECT event_id, user_id, ts, value FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL",
    "p6_processed_at" ->
      """SELECT event_id, ts, (SELECT max(ts) FROM events) AS processed_at
         FROM events""")
}
