package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Source/sink connector surface (SURVEY.md §2.1): the Kafka producer
  * envelope + explicit partitioner (S2/S3), the batch key-upsert sink with
  * its sync watermark (S8/S9), and the partitioned/coalesced table writer
  * (S12).
  *
  * No Kafka broker or RDBMS exists in this environment, so the *transport*
  * ends at the serialized envelope / the parquet target dir — but everything
  * the engine owns is real: serialization, key partitioning, merge semantics,
  * watermark bookkeeping, partition layout. Swapping the final hop for
  * `.format("kafka")` / a JDBC `foreachPartition` writer changes no plan.
  */
object Connectors {

  // ---- S2/S3: producer envelope + explicit partitioner ---------------------

  /** S2+S3: the Kafka producer's record envelope (reference
    * data_generator/producer.py:171-224): key = sensor id, value = the JSON
    * document, partition = stable function of the key so each sensor's
    * readings stay ordered within one partition (producer.py:227-243).
    *
    * `write.format("kafka")` takes exactly this (key, value, partition)
    * shape; the serialization below is the engine's contract. Numeric
    * `value` is serialized via the double→shortest-round-trip-string rule
    * that Spark and DuckDB share, keeping the envelope byte-identical and
    * oracle-able. Rows that fail the producer-side gate (V9) are not
    * serialized, matching the reference's pre-send validation. */
  def kafkaEnvelope(spark: SparkSession, dir: String): DataFrame =
    Validation.producerGate(spark, dir)
      .select(
        col("user_id").cast("string").as("key"),
        to_json(struct(
          col("event_id"),
          col("user_id"),
          col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("value").cast("string").as("value"))).as("value"),
        pmod(col("user_id"), lit(3)).cast("int").as("kafka_partition"))

  // ---- S1/S4: Kafka consumer source + envelope parse -----------------------

  /** S1: the Kafka stream source with the reference's exact option surface
    * (streaming_job.py:205-230 — including the rate limit the reference
    * misspells into a no-op; here it is the real option). The connector jar
    * (`spark-sql-kafka-0-10`) ships with a Kafka deployment; it is absent
    * from this zero-egress environment (not in /opt/spark/jars nor the
    * offline dependency cache), and without it even `.load()` fails at
    * DataSource resolution — so a plan-level analysis test is not possible
    * here, and the builder is exercised end-to-end via `parseEnvelope` over
    * wire-shaped frames instead (s1_kafka_roundtrip), which covers
    * everything the engine owns. */
  def kafkaSource(spark: SparkSession, topic: String, servers: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .option("failOnDataLoss", "false")
      .option("maxOffsetsPerTrigger", "10000")
      .load()

  /** S4+P1+P2: consumer-side envelope parse — schema-on-read `from_json`
    * over the Kafka wire schema (binary key/value), struct flatten, typed
    * re-parse of the serialized fields (streaming_job.py:233-271). Works
    * identically on the streaming source and on any wire-shaped batch
    * frame; malformed JSON nulls out (permissive mode), to be dropped by
    * the P4 null filters downstream. */
  def parseEnvelope(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val wire = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("ts", StringType),
      StructField("value", StringType)))
    df.select(
        col("key").cast("string").as("kafka_key"),
        from_json(col("value").cast("string"), wire).as("data"))
      .select(col("kafka_key"), col("data.*"))
      .withColumn("ts", to_timestamp(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("value", col("value").cast("double"))
  }

  /** S1/S4 registered check: serialize → wire bytes → parse must reproduce
    * the gated source rows (timestamps at the envelope's second precision).
    * This is the producer/consumer contract the reference runs across a
    * broker, minus the broker. */
  def kafkaRoundtrip(spark: SparkSession, dir: String): DataFrame =
    parseEnvelope(
      kafkaEnvelope(spark, dir).select(
        col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value")))

  // ---- S8: batch key-upsert sink (MERGE INTO over a parquet target) --------

  /** MERGE semantics over a parquet target dir: read the current snapshot,
    * full-outer join with `updates` on `keys` (updates win, snapshot fills
    * the gaps), rewrite. This is the engine's analog of the reference's
    * `INSERT ... ON CONFLICT (keys) DO UPDATE` batch sink
    * (mongo_to_postgres_sync.py:315-418) — and mechanically what a
    * copy-on-write Delta/Iceberg MERGE does: the join and rewrite are
    * distributed; only directory bookkeeping is driver-side.
    *
    * Two layouts:
    *   - `partitionCol = Some(p)` (p ∈ keys): the 100 TB path. The update
    *     batch's partition values are collected driver-side — a
    *     metadata-sized list, the same thing a table format reads from its
    *     manifest — the snapshot is read partition-PRUNED to those values,
    *     and the rewrite replaces only those partition directories (dynamic
    *     partition overwrite). Untouched partitions are never read, never
    *     rewritten (ConnectorsSpec asserts byte-identity).
    *   - `None`: unpartitioned small-table fallback — full rewrite into the
    *     NEXT GENERATION subdir, committed by atomically flipping the
    *     `CURRENT` pointer file (write `CURRENT.tmp`, rename over `CURRENT`
    *     — the single-file atomic-commit discipline every table format's
    *     metadata pointer uses). There is no instant at which the table is
    *     unreadable: readers resolve the pointer to whichever generation
    *     last committed, a crash leaves at worst an orphan generation dir,
    *     and the next merge sweeps orphans after its own commit
    *     (ConnectorsSpec walks every crash point). A flat dir without
    *     `CURRENT` (the pre-protocol layout) reads as generation zero. */
  def mergeInto(spark: SparkSession, targetDir: String, updates0: DataFrame,
      keys: Seq[String], partitionCol: Option[String] = None): Unit = {
    // the updates plan feeds the touched-partition collect AND the merge
    // join; persist so an expensive upstream (a full aggregation in
    // upsertSink's case) runs once
    val updates = updates0.persist()
    try {
      val current = readTable(spark, targetDir)
      val dataCols = current.columns.filterNot(keys.contains)
      val u = updates.columns.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"u_$c"))
      val joinCond = keys.map(k => col(k) <=> col(s"u_$k")).reduce(_ && _)
      def merged(snapshot: DataFrame): DataFrame = snapshot.join(u, joinCond, "full_outer")
        .select(
          keys.map(k => coalesce(col(s"u_$k"), col(k)).as(k)) ++
          dataCols.map(c => coalesce(col(s"u_$c"), col(c)).as(c)): _*)
      partitionCol match {
        case Some(p) =>
          require(keys.contains(p), s"partition column $p must be a merge key")
          val touched = updates.select(col(p)).distinct().collect().map(_.get(0))
          // empty incremental batch: nothing to merge, target untouched
          if (touched.isEmpty) return
          val vals = touched.filterNot(_ == null)
          val pruned = Seq(
            Option.when(vals.nonEmpty)(col(p).isin(vals: _*)),
            Option.when(touched.contains(null))(col(p).isNull))
            .flatten.reduce(_ || _)
          // stage the merged slice out-of-place: Spark refuses to overwrite a
          // path its own plan is reading, so the touched partitions are
          // written twice (still only the touched ones — copy-on-write)
          val tmp = Files.createTempDirectory("graft-merge-slice-").toString + "/slice"
          merged(current.filter(pruned)).write.partitionBy(p).parquet(tmp)
          val conf = "spark.sql.sources.partitionOverwriteMode"
          val prev = spark.conf.get(conf)
          spark.conf.set(conf, "dynamic")
          try spark.read.parquet(tmp).write.mode("overwrite")
            .partitionBy(p).parquet(targetDir)
          finally spark.conf.set(conf, prev)
          deleteRecursively(Paths.get(tmp))
        case None =>
          val prev = resolveCurrent(targetDir)
          val gen = s"gen-${System.nanoTime()}"
          merged(current).write.parquet(s"$targetDir/$gen")
          commitPointer(targetDir, gen)
          sweepStale(targetDir, gen, prev)
      }
    } finally updates.unpersist()
  }

  /** Read the committed snapshot of a merge target: `CURRENT` names the live
    * generation subdir; a dir without the pointer (including every
    * partitioned target) is its own data. */
  def readTable(spark: SparkSession, targetDir: String): DataFrame =
    spark.read.parquet(resolveCurrent(targetDir).toString)

  private def resolveCurrent(targetDir: String): Path = {
    val cur = Paths.get(targetDir, "_CURRENT")
    if (Files.exists(cur)) Paths.get(targetDir, Files.readString(cur).trim)
    else Paths.get(targetDir)
  }

  /** The atomic commit: stage the pointer contents, rename over `CURRENT`.
    * Readers see the old generation until this rename and the new one after
    * it — never neither. */
  private def commitPointer(targetDir: String, gen: String): Unit = {
    val tmp = Paths.get(targetDir, "_CURRENT.tmp")
    Files.writeString(tmp, gen)
    Files.move(tmp, Paths.get(targetDir, "_CURRENT"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Post-commit sweep with a ONE-MERGE retention window: the generation
    * the pointer named just before this commit survives until the next
    * merge, so a reader that resolved `_CURRENT` moments before the flip
    * can still finish scanning its snapshot (pointer-resolve and file-read
    * are not atomic — the same reason table formats retain superseded
    * snapshots). Orphans from crashed merges and generations older than
    * the window are deleted; pre-protocol flat files count as the previous
    * generation on the first protocol merge. Best-effort by design —
    * anything missed is swept by a later merge; readers only follow the
    * pointer. */
  private def sweepStale(targetDir: String, liveGen: String, prev: Path): Unit = {
    val root = Paths.get(targetDir)
    val keepFlat = prev == root // first protocol merge: flat data is the previous snapshot
    val prevGen = if (keepFlat) "" else prev.getFileName.toString
    val list = Files.list(root)
    try list.forEach { p =>
      val name = p.getFileName.toString
      val stale =
        (Files.isDirectory(p) && name.startsWith("gen-") &&
          name != liveGen && name != prevGen) ||
        (!Files.isDirectory(p) && !keepFlat &&
          name != "_CURRENT" && name != "_CURRENT.tmp")
      if (stale) deleteRecursively(p)
    } finally list.close()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally walk.close()
    }

  private val SyncCutoff = "2024-01-21 12:00:00"

  private def dailyTotals(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(Exact.rnd(Exact.sumD("value"), 2).as("total_value"),
        count(lit(1)).as("cnt"))

  /** S8: initial load + incremental upsert through the merge sink, served
    * back from the target. The target is day-partitioned (the S12 layout),
    * so the merge takes the partition-pruned path: only the boundary day and
    * the new days are read and rewritten; the old days' files are untouched
    * (ConnectorsSpec). The mid-day cutoff makes the boundary day exist in
    * both batches, so the merge exercises all three actions: unchanged (old
    * days), updated (boundary day — the incremental batch's version wins,
    * the reference's re-sync overwrite), inserted (new days). */
  def upsertSink(spark: SparkSession, dir: String): DataFrame = {
    val target = Files.createTempDirectory("graft-upsert-target-").toString
    val events = Tables.events(spark, dir)
    dailyTotals(events.filter(col("ts") < lit(SyncCutoff)))
      .write.partitionBy("day").mode("overwrite").parquet(target)
    mergeInto(spark, target,
      dailyTotals(events.filter(col("ts") >= lit(SyncCutoff))),
      Seq("user_id", "day"), partitionCol = Some("day"))
    spark.read.parquet(target)
      .select(col("user_id"), col("day"), col("total_value"), col("cnt"))
  }

  /** S9: sync-watermark bookkeeping (mongo_to_postgres_sync.py:241-294):
    * one row — the previous high watermark, the rows the next batch picks up
    * beyond it, and the advanced watermark (max event time of the batch).
    * The `ts > prev` predicate is exactly what pushes into the source scan
    * (S7), so the sync never rereads history. */
  def syncWatermark(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts") > lit(SyncCutoff))
      .agg(
        lit(SyncCutoff).cast("timestamp").as("prev_watermark"),
        max("ts").as("next_watermark"),
        count(lit(1)).as("rows_to_sync"))

  // ---- S12: partitioned + coalesced output layout --------------------------

  /** S12: date-partitioned, small-file-compacted table write + read-back
    * (Learning Guide.txt:1045 §5: "partition output by date", "coalesce
    * small files, 1-2 per partition"). `repartition(col("day"))` routes each
    * day to one task before `partitionBy("day")`, so every partition dir
    * holds one file instead of one-per-task — the compaction the reference
    * asks for. The layout is what partition pruning keys on at 100 TB: a
    * day-filtered read lists only that day's directory. */
  def partitionedOutput(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft-partitioned-out-").toString
    WindowAggregates.dailyMart(spark, dir)
      .repartition(col("day"))
      .write.partitionBy("day").mode("overwrite").parquet(out)
    // read back through the partitioned layout; `day` returns via partition
    // discovery (directory names), value columns via the data files
    spark.read.parquet(out)
      .select(col("user_id"), col("day"), col("avg_value"), col("max_value"),
        col("min_value"), col("cnt"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_kafka_roundtrip"    -> kafkaRoundtrip,
    "s2_kafka_envelope"     -> kafkaEnvelope,
    "s8_upsert_sink"        -> upsertSink,
    "s9_sync_watermark"     -> syncWatermark,
    "s12_partitioned_output" -> partitionedOutput)

  val oracles: Map[String, String] = Map(
    "s1_kafka_roundtrip" ->
      """SELECT CAST(user_id AS VARCHAR) AS kafka_key,
         event_id, user_id, event_type,
         date_trunc('second', ts) AS ts, value
         FROM events
         WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
           AND event_type IS NOT NULL AND regexp_matches(event_type, '^[a-z]')""",
    "s2_kafka_envelope" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         json_object('event_id', event_id, 'user_id', user_id,
                     'event_type', event_type,
                     'ts', strftime(ts, '%Y-%m-%d %H:%M:%S'),
                     'value', CAST(value AS VARCHAR)) AS value,
         CAST(user_id % 3 AS INTEGER) AS kafka_partition
         FROM events
         WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
           AND event_type IS NOT NULL AND regexp_matches(event_type, '^[a-z]')""",
    "s8_upsert_sink" ->
      s"""WITH base AS (
           SELECT user_id, CAST(ts AS DATE) AS day,
                  ${Exact.sqlRnd(Exact.sqlSum("value"), 2)} AS total_value, count(*) AS cnt
           FROM events WHERE ts < TIMESTAMP '$SyncCutoff' GROUP BY 1, 2),
         u AS (
           SELECT user_id, CAST(ts AS DATE) AS day,
                  ${Exact.sqlRnd(Exact.sqlSum("value"), 2)} AS total_value, count(*) AS cnt
           FROM events WHERE ts >= TIMESTAMP '$SyncCutoff' GROUP BY 1, 2)
         SELECT coalesce(u.user_id, base.user_id) AS user_id,
                coalesce(u.day, base.day) AS day,
                coalesce(u.total_value, base.total_value) AS total_value,
                coalesce(u.cnt, base.cnt) AS cnt
         FROM base FULL OUTER JOIN u
           ON base.user_id IS NOT DISTINCT FROM u.user_id
          AND base.day IS NOT DISTINCT FROM u.day""",
    "s9_sync_watermark" ->
      s"""SELECT TIMESTAMP '$SyncCutoff' AS prev_watermark,
          max(ts) AS next_watermark, count(*) AS rows_to_sync
          FROM events WHERE ts > TIMESTAMP '$SyncCutoff'""",
    // Same result as the direct aggregation — the partitioned layout must be
    // a lossless round trip of a3_daily_mart.
    "s12_partitioned_output" ->
      s"""SELECT user_id, CAST(ts AS DATE) AS day,
         ${Exact.sqlRnd(Exact.sqlAvg("value"), 4)} AS avg_value,
         ${Exact.sqlRnd("max(value)", 2)} AS max_value,
         ${Exact.sqlRnd("min(value)", 2)} AS min_value,
         count(*) AS cnt
         FROM events GROUP BY 1, 2""")
}
