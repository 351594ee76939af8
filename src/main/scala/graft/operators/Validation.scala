package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality validation engine (SURVEY.md §2.3, V1–V8).
  *
  * The reference validates row-at-a-time in a single-threaded Python consumer
  * (reference data_quality/validation_consumer.py:412-444) and routes rows to
  * a valid topic or a DLQ with accumulated failure reasons. Here each rule is
  * a pure `Column` expression (no UDF), the whole rule set evaluates inside
  * one whole-stage-codegen'd projection, and the valid/DLQ split is two
  * complementary filters over the same plan — Spark executes the scan once
  * per branch with all predicates pushed down, and the design distributes
  * trivially: no state, no shuffle, no driver round-trips.
  *
  * A rule yields NULL when the row passes and a constant reason string when
  * it fails (constant so that float-formatting differences can never leak
  * into compared output).
  */
object Validation {

  /** One validation rule: a name plus a Column producing NULL (pass) or a
    * failure-reason string (fail). Mirrors the reference's
    * `{is_valid, failure_reasons[]}` result ADT (validation_consumer.py:97-124). */
  final case class Rule(name: String, failure: Column)

  /** V1: required-field presence (validation_consumer.py:130-156). */
  def presenceRule(field: String): Rule =
    Rule(s"presence_$field",
      when(col(field).isNull, lit(s"Missing required field: $field")))

  /** V3: range check (validation_consumer.py:207-245); null skips, like the
    * reference's null passthrough (:230-234). */
  def rangeRule(field: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$field",
      when(col(field).isNotNull && (col(field) < lo || col(field) > hi),
        lit(s"Out of range: $field")))

  /** V4: format check — trim + regex (validation_consumer.py:248-281). */
  def formatRule(field: String, pattern: String): Rule =
    Rule(s"format_$field",
      when(col(field).isNotNull && !trim(col(field)).rlike(pattern),
        lit(s"Invalid format: $field")))

  /** V6: completeness — critical field neither NULL nor a null-string
    * ("null"/"none"/"n/a"/"", validation_consumer.py:324-350). */
  def completenessRule(field: String): Rule =
    Rule(s"completeness_$field",
      when(col(field).isNull ||
           lower(trim(col(field))).isin("null", "none", "n/a", ""),
        lit(s"Critical field empty: $field")))

  /** The rule set applied to the `events` table (events ≙ IoT readings:
    * user_id ≙ sensor_id, value ≙ temperature, event_type ≙ device_type). */
  def eventRules: Seq[Rule] = Seq(
    presenceRule("event_id"),
    presenceRule("ts"),
    presenceRule("user_id"),
    rangeRule("value", 0.0, 100.0),
    formatRule("event_type", "^[a-z]+$"),
    completenessRule("event_type"))

  /** V8 core: evaluate all rules into a `validation_failures` string (the
    * reference's array<string>, joined with ';' for oracle stability) and a
    * `data_quality_flag`. `concat_ws` drops the NULLs of passing rules in
    * both Spark and DuckDB. */
  def withFailures(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn("validation_failures", concat_ws(";", rules.map(_.failure): _*))
      .withColumn("data_quality_flag",
        when(col("validation_failures") === "", lit("valid")).otherwise(lit("invalid")))

  /** Stream split (validation_consumer.py:513-587): same plan, two filters. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val flagged = withFailures(df, rules)
    (flagged.filter(col("data_quality_flag") === "valid").drop("validation_failures"),
     flagged.filter(col("data_quality_flag") === "invalid"))
  }

  // ---- registered queries -------------------------------------------------

  /** V1: per-row presence flags for the required fields. */
  def schemaPresence(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      col("ts").isNotNull.as("has_ts"),
      col("user_id").isNotNull.as("has_user_id"),
      col("event_type").isNotNull.as("has_event_type"),
      col("value").isNotNull.as("has_value"))

  /** V2: type check — JSON payload field must be integer-typed; numeric
    * strings coerce-pass like validation_consumer.py:185-191. */
  def typeCheck(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_raw"),
      get_json_object(col("props"), "$.k").rlike("^-?[0-9]+$").as("k_is_int"))

  /** V3: range check rows with flag. */
  def rangeCheck(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"), col("value"),
      (col("value").isNotNull && col("value").between(0, 100)).as("in_range"))

  /** V4: format check — trim + regex on the identifier-ish column. */
  def formatCheck(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      trim(col("event_type")).as("event_type_trimmed"),
      trim(col("event_type")).rlike("^[a-z]+$").as("format_ok"))

  /** V5: freshness vs a deterministic "processing time" = max(ts) over the
    * table (the reference compares to wall-clock utcnow,
    * validation_consumer.py:284-321; a fixed reference point keeps the
    * operator oracle-able and the semantics identical). */
  def freshnessCheck(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val now = events.agg(max("ts").as("now"))
    events.crossJoin(broadcast(now)).select(
      col("event_id"),
      (col("ts") > col("now")).as("is_future"),
      (col("ts") < col("now") - expr("INTERVAL 5 MINUTES")).as("is_stale"))
  }

  /** V7 (batch semantics): first-reading-wins per (user, 5-second bucket) —
    * the reference's near-duplicate suppression bucket
    * (validation_consumer.py:353-409). Streaming twin uses dropDuplicates
    * with watermark (graft.streaming.StreamingJobs). */
  def dedupBucket(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = Tables.events(spark, dir)
      .withColumn("bucket", (floor(col("ts").cast("long") / 5) * 5).cast("long"))
    val w = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("ts"), col("event_id"))
    bucketed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("bucket"))
  }

  /** V6: dedicated completeness check — critical fields present and not
    * null-strings (validation_consumer.py:324-350; CRITICAL_FIELDS :76). */
  def completenessCheck(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      col("user_id").isNotNull.as("user_id_present"),
      col("value").isNotNull.as("value_present"),
      (col("event_type").isNotNull &&
        !lower(trim(col("event_type"))).isin("null", "none", "n/a", ""))
        .as("event_type_complete"))

  /** V9: producer-side lightweight gate (producer.py:109-164) — the cheap
    * pre-serialization checks: required fields non-null, identifier shape
    * sane. Rows failing the gate are dropped before the envelope is built
    * (Connectors.kafkaEnvelope), like the reference's pre-send validation. */
  def producerGate(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("value").isNotNull && col("event_type").isNotNull &&
        col("event_type").rlike("^[a-z]"))

  /** V9 registered view: the gated stream. */
  def producerGateQuery(spark: SparkSession, dir: String): DataFrame =
    producerGate(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  // ---- V1b: closed-schema enforcement over the wire envelope ---------------

  /** The producer envelope's closed key set — the whitelist of
    * validation_consumer.py:151-153, translated to the events schema. */
  val EnvelopeWhitelist: Seq[String] =
    Seq("event_id", "user_id", "event_type", "ts", "value")

  /** V1b fixture: the gated producer envelope as a JSON wire document, with
    * the reference generator's three JSON-level schema corruptions injected
    * deterministically on the schema_violation band (event_id % 100 ∈
    * [47,51) — Generator.classes): 47-48 drop a required key ("incomplete
    * transmission", generator.py:409-415), 49 adds unexpected_field
    * ("schema evolution issue", :417-419), 50 typos value→vaue ("incorrect
    * field name", :421-424 — one corruption, two findings: a missing
    * required key AND an unexpected key, like temperature→temprature). */
  def closedSchemaEnvelope(spark: SparkSession, dir: String): DataFrame = {
    val envelope = map(
      lit("event_id"), col("event_id").cast("string"),
      lit("user_id"), col("user_id").cast("string"),
      lit("event_type"), col("event_type"),
      lit("ts"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
      lit("value"), col("value").cast("string"))
    val band = pmod(col("event_id"), lit(100))
    val corrupted =
      when(band.isin(47, 48), map_filter(envelope, (k, _) => k =!= "event_type"))
        .when(band === 49,
          map_concat(envelope, map(lit("unexpected_field"), lit("random_value"))))
        .when(band === 50, map_concat(
          map_filter(envelope, (k, _) => k =!= "value"),
          map(lit("vaue"), col("value").cast("string"))))
        .otherwise(envelope)
    producerGate(spark, dir).select(col("event_id"), to_json(corrupted).as("wire"))
  }

  /** V1b: closed-schema validation (validation_consumer.py:142-155) — the
    * consumer parses the wire value as an *open* `map<string,string>`
    * (schema-on-read: a struct parse would silently drop unknown keys, so a
    * closed-schema check must parse open) and rejects key sets that stray
    * from the whitelist in either direction. Key lists are sorted before
    * joining so the reasons are deterministic regardless of JSON key order.
    * Pure Column expressions — one codegen'd projection, no shuffle. */
  def closedSchemaCheck(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    val wl = array(EnvelopeWhitelist.map(lit): _*)
    val parsed = closedSchemaEnvelope(spark, dir)
      .withColumn("keys", map_keys(from_json(col("wire"), MapType(StringType, StringType))))
      .withColumn("unexpected", array_sort(array_except(col("keys"), wl)))
      .withColumn("missing", array_sort(array_except(wl, col("keys"))))
    val rules = Seq(
      Rule("closed_schema_unexpected",
        when(size(col("unexpected")) > 0,
          concat(lit("Unexpected fields: "), array_join(col("unexpected"), ", ")))),
      Rule("closed_schema_missing",
        when(size(col("missing")) > 0,
          concat(lit("Missing required field: "), array_join(col("missing"), ", ")))))
    withFailures(parsed, rules)
      .select(col("event_id"),
        array_join(col("unexpected"), ",").as("unexpected_keys"),
        array_join(col("missing"), ",").as("missing_keys"),
        col("validation_failures"), col("data_quality_flag"))
  }

  /** V8: full validation split — all rows with reasons + flag. */
  def validationSplit(spark: SparkSession, dir: String): DataFrame =
    withFailures(Tables.events(spark, dir), eventRules)
      .select(col("event_id"), col("validation_failures"), col("data_quality_flag"))

  /** V8b: the DLQ branch only (invalid rows with reasons). */
  def dlqBranch(spark: SparkSession, dir: String): DataFrame = {
    val (_, dlq) = split(Tables.events(spark, dir), eventRules)
    dlq.select(col("event_id"), col("validation_failures"), col("data_quality_flag"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_schema_presence"  -> schemaPresence,
    "v1b_closed_schema"   -> closedSchemaCheck,
    "v2_type_check"       -> typeCheck,
    "v3_range_check"      -> rangeCheck,
    "v4_format_check"     -> formatCheck,
    "v5_freshness_check"  -> freshnessCheck,
    "v6_completeness"     -> completenessCheck,
    "v7_dedup_bucket"     -> dedupBucket,
    "v9_producer_gate"    -> producerGateQuery,
    "v8_validation_split" -> validationSplit,
    "v8b_dlq_branch"      -> dlqBranch)

  /** DuckDB fragment of the full rule set (shared with the streaming
    * pipeline oracle). */
  val failuresSql =
    """concat_ws(';',
       CASE WHEN event_id IS NULL THEN 'Missing required field: event_id' END,
       CASE WHEN ts IS NULL THEN 'Missing required field: ts' END,
       CASE WHEN user_id IS NULL THEN 'Missing required field: user_id' END,
       CASE WHEN value IS NOT NULL AND (value < 0.0 OR value > 100.0) THEN 'Out of range: value' END,
       CASE WHEN event_type IS NOT NULL AND NOT regexp_full_match(trim(event_type), '^[a-z]+$') THEN 'Invalid format: event_type' END,
       CASE WHEN event_type IS NULL OR lower(trim(event_type)) IN ('null','none','n/a','') THEN 'Critical field empty: event_type' END)"""

  val oracles: Map[String, String] = Map(
    "v1_schema_presence" ->
      """SELECT event_id,
         ts IS NOT NULL AS has_ts,
         user_id IS NOT NULL AS has_user_id,
         event_type IS NOT NULL AS has_event_type,
         value IS NOT NULL AS has_value
         FROM events""",
    // The oracle rebuilds the wire JSON (json_merge_patch injects/removes the
    // same keys the Spark fixture does) and re-derives the key-set verdicts
    // from json_keys — a genuine JSON replay, not a band-rule shortcut.
    "v1b_closed_schema" ->
      """WITH gated AS (
           SELECT event_id, user_id, event_type, ts, value FROM events
           WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
             AND event_type IS NOT NULL AND regexp_matches(event_type, '^[a-z]')),
         wire AS (
           SELECT event_id, json_merge_patch(
             json_object('event_id', CAST(event_id AS VARCHAR),
                         'user_id', CAST(user_id AS VARCHAR),
                         'event_type', event_type,
                         'ts', strftime(ts, '%Y-%m-%d %H:%M:%S'),
                         'value', CAST(value AS VARCHAR)),
             CASE WHEN event_id % 100 IN (47, 48) THEN '{"event_type": null}'
                  WHEN event_id % 100 = 49 THEN '{"unexpected_field": "random_value"}'
                  WHEN event_id % 100 = 50 THEN
                    json_merge_patch('{"value": null}', json_object('vaue', CAST(value AS VARCHAR)))
                  ELSE '{}' END) AS j
           FROM gated),
         ks AS (
           SELECT event_id,
             list_sort(list_filter(json_keys(j),
               k -> k NOT IN ('event_id','user_id','event_type','ts','value'))) AS unex,
             list_sort(list_filter(['event_id','user_id','event_type','ts','value'],
               k -> NOT list_contains(json_keys(j), k))) AS miss
           FROM wire)
         SELECT event_id,
           coalesce(list_aggregate(unex, 'string_agg', ','), '') AS unexpected_keys,
           coalesce(list_aggregate(miss, 'string_agg', ','), '') AS missing_keys,
           concat_ws(';',
             CASE WHEN len(unex) > 0
               THEN 'Unexpected fields: ' || list_aggregate(unex, 'string_agg', ', ') END,
             CASE WHEN len(miss) > 0
               THEN 'Missing required field: ' || list_aggregate(miss, 'string_agg', ', ') END)
             AS validation_failures,
           CASE WHEN len(unex) = 0 AND len(miss) = 0 THEN 'valid' ELSE 'invalid' END
             AS data_quality_flag
         FROM ks""",
    "v2_type_check" ->
      """SELECT event_id,
         json_extract_string(props, '$.k') AS k_raw,
         regexp_full_match(json_extract_string(props, '$.k'), '^-?[0-9]+$') AS k_is_int
         FROM events""",
    "v3_range_check" ->
      """SELECT event_id, value,
         (value IS NOT NULL AND value BETWEEN 0 AND 100) AS in_range
         FROM events""",
    "v4_format_check" ->
      """SELECT event_id,
         trim(event_type) AS event_type_trimmed,
         regexp_full_match(trim(event_type), '^[a-z]+$') AS format_ok
         FROM events""",
    "v5_freshness_check" ->
      """SELECT event_id,
         ts > m.now AS is_future,
         ts < m.now - INTERVAL 5 MINUTE AS is_stale
         FROM events, (SELECT max(ts) AS now FROM events) m""",
    "v6_completeness" ->
      """SELECT event_id,
         user_id IS NOT NULL AS user_id_present,
         value IS NOT NULL AS value_present,
         (event_type IS NOT NULL AND
          lower(trim(event_type)) NOT IN ('null','none','n/a','')) AS event_type_complete
         FROM events""",
    "v9_producer_gate" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
           AND event_type IS NOT NULL AND regexp_matches(event_type, '^[a-z]')""",
    "v7_dedup_bucket" ->
      """SELECT event_id, user_id, bucket FROM (
           SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 5 * 5 AS bucket,
             row_number() OVER (
               PARTITION BY user_id, CAST(floor(epoch(ts)) AS BIGINT) // 5 * 5
               ORDER BY ts, event_id) AS rn
           FROM events) t WHERE rn = 1""",
    "v8_validation_split" ->
      s"""SELECT event_id,
          $failuresSql AS validation_failures,
          CASE WHEN $failuresSql = '' THEN 'valid' ELSE 'invalid' END AS data_quality_flag
          FROM events""",
    "v8b_dlq_branch" ->
      s"""SELECT event_id, validation_failures, data_quality_flag FROM (
          SELECT event_id,
          $failuresSql AS validation_failures,
          CASE WHEN $failuresSql = '' THEN 'valid' ELSE 'invalid' END AS data_quality_flag
          FROM events) t WHERE data_quality_flag = 'invalid'""")
}
