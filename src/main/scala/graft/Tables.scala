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
    * (Verify/Bench/tests) sets once at bootstrap — not inside table
    * loaders, which would mutate shared session state as a
    * query-construction side effect. */
  def bootstrap(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.GraftFunctions.register(spark)
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as raw nanos (legacy conf, set at
    * bootstrap) and convert with integer division — nanos values (~1.7e18)
    * overflow double's exact range, so no float math on the way to micros. */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsWithRawTs(spark, dir).drop("ts_nanos")

  /** events plus the RAW int64 nanos column (`ts_nanos`): a time bound on
    * the CONVERTED `ts` hides behind the micros expression — parquet gets
    * only IsNotNull and every row group is read — while the same bound on
    * `ts_nanos` (via `Tables.nanos(literal)`) pushes as a plain int64
    * comparison, restoring row-group stats pruning (and partition pruning
    * on a date-partitioned layout at scale). Time-bounded readers filter
    * on `ts_nanos` then drop it (PlanContractSpec pins the pushdown). */
  def eventsWithRawTs(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "events")
      .withColumn("ts_nanos", col("ts"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select(col("event_id"), col("ts"), col("ts_nanos"), col("user_id"),
        col("event_type"), col("value"), col("props"))
  }

  /** Raw-nanos value of a whole-second UTC literal — the `ts_nanos` bound
    * matching `col("ts") <op> lit(literal)` under the UTC session. */
  def nanos(literal: String): Long =
    java.time.LocalDateTime.parse(literal.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
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
