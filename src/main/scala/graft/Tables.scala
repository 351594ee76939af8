package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every registered query receives `(spark, sfDir)` and reads only these
  * parquet files; the matching DuckDB oracle reads the same files as bare
  * table names. At cluster scale these would be real table identifiers
  * (catalog / Delta / Iceberg); the loader indirection keeps that swap to
  * one place.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session confs + native-function registry every entry point
    * (Verify/Bench/Explain/tests) sets once at bootstrap — not inside table
    * loaders, which would mutate shared session state as a
    * query-construction side effect. The UTC pin matters since the
    * micros-timestamp migration: `events.ts` is stored NTZ and cast to
    * session-zone TIMESTAMP ([[events]]), so a host-zone session would
    * shift every window boundary (and a DST fall-back would make the cast
    * non-injective). Verify pins UTC independently; pinning here keeps
    * Bench and Explain on the same wall clock. */
  def bootstrap(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.functions.GraftFunctions.register(spark)
  }

  /** `events.ts` is parquet TIMESTAMP(MICROS) with no timezone metadata
    * (isAdjustedToUTC=false), which Spark reads as TIMESTAMP_NTZ. Downstream
    * operators run on session-zone TIMESTAMP (windows, watermarks, the
    * oracle dumps all agreed on it): under the pinned UTC session the
    * NTZ→LTZ cast is wall-clock-preserving, so every instant matches what
    * DuckDB computes from the same naive micros. */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsWithRawTs(spark, dir).drop("ts_raw")

  /** events plus the UNCAST scan column (`ts_raw`, TIMESTAMP_NTZ): a time
    * bound on the CONVERTED `ts` hides behind the NTZ→LTZ cast — parquet
    * gets only IsNotNull and every row group is read — while the same bound
    * on `ts_raw` (via `lit(Tables.rawTs(literal))`) pushes as a plain
    * micros comparison on the stored column, restoring row-group stats
    * pruning (and partition pruning on a date-partitioned layout at scale).
    * Time-bounded readers filter on `ts_raw` then drop it (PlanContractSpec
    * pins the pushdown). */
  def eventsWithRawTs(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "events")
      .withColumn("ts_raw", col("ts"))
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("event_id"), col("ts"), col("ts_raw"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }

  /** NTZ literal of a whole-second UTC wall time — the `ts_raw` bound
    * matching `col("ts") <op> lit(literal)` under the UTC session
    * (`lit(LocalDateTime)` is a TIMESTAMP_NTZ literal, same type as the
    * scan column, so the comparison pushes without a cast). */
  def rawTs(literal: String): java.time.LocalDateTime =
    java.time.LocalDateTime.parse(literal.replace(' ', 'T'))
  /** Fan a CPU-bound stage out to every core. A 100 TB scan arrives as
    * thousands of splits and never needs this; the kilobyte-scale test files
    * are a single parquet split, which would serialize hash/shingle/fold
    * work onto one of 32 cores. Spark only auto-rebalances *shuffle* stages
    * (AQE), not scan-fed map stages, so the round-robin repartition is
    * explicit — its cost is proportional to the (tiny) input, its benefit to
    * the per-row CPU. */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
