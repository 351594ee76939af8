package graft

import graft.operators.Connectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Sink-side semantics the DuckDB oracle can't see: MERGE actions on the
  * parquet target, partition layout + pruning of the S12 writer. */
class ConnectorsSpec extends AnyFunSuite with SparkFixture {
  private val dir = "/root/testdata/sf0.001"

  test("mergeInto is last-write-wins on keys and keeps unmatched rows") {
    import spark.implicits._
    val target = Files.createTempDirectory("merge-test-").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "tag", "v")
      .write.mode("overwrite").parquet(target)
    Connectors.mergeInto(spark, target,
      Seq((2L, "b", 99.0), (3L, "c", 30.0)).toDF("k", "tag", "v"), Seq("k"))
    val out = spark.read.parquet(target).as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)))
  }

  test("mergeInto is idempotent on batch replay") {
    import spark.implicits._
    val target = Files.createTempDirectory("merge-replay-").toString
    Seq((1L, 1.0)).toDF("k", "v").write.mode("overwrite").parquet(target)
    val batch = Seq((1L, 2.0), (2L, 5.0)).toDF("k", "v")
    Connectors.mergeInto(spark, target, batch, Seq("k"))
    Connectors.mergeInto(spark, target, batch, Seq("k")) // replay
    val out = spark.read.parquet(target).as[(Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2.0), (2L, 5.0)))
  }

  test("partition-pruned merge rewrites only touched partitions, byte-identically elsewhere") {
    import spark.implicits._
    val target = Files.createTempDirectory("merge-part-").toString
    Seq((1L, "d1", 10.0), (2L, "d2", 20.0)).toDF("k", "day", "v")
      .write.partitionBy("day").mode("overwrite").parquet(target)
    def partFiles(day: String) =
      new java.io.File(s"$target/day=$day").listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map(f => (f.getName, f.lastModified,
          java.nio.file.Files.readAllBytes(f.toPath).toSeq)).toSeq
    val before = partFiles("d1")
    Connectors.mergeInto(spark, target,
      Seq((2L, "d2", 99.0), (3L, "d3", 30.0)).toDF("k", "day", "v"),
      Seq("k", "day"), partitionCol = Some("day"))
    val out = spark.read.parquet(target).select("k", "day", "v")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "d1", 10.0), (2L, "d2", 99.0), (3L, "d3", 30.0)))
    // the untouched partition's files were neither rewritten nor re-stamped
    assert(partFiles("d1") == before)
  }

  test("partitioned output lays out one compacted file per day and prunes on read") {
    val out = Files.createTempDirectory("part-test-").toString
    operators.WindowAggregates.dailyMart(spark, dir)
      .repartition(col("day"))
      .write.partitionBy("day").mode("overwrite").parquet(out)
    val dayDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
    assert(dayDirs.nonEmpty)
    // "coalesce small files": exactly one data file per partition dir
    dayDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
    // a day-filtered read plans only that day's partition (pruning)
    val one = spark.read.parquet(out).filter(col("day") === lit("2024-01-05"))
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("day"))
    assert(one.count() > 0)
  }

  test("kafka envelope serializes gated rows only, keyed and partitioned by sensor") {
    val env = Connectors.kafkaEnvelope(spark, dir)
    val gate = operators.Validation.producerGate(spark, dir).count()
    assert(env.count() == gate)
    assert(env.filter(col("kafka_partition") < 0 || col("kafka_partition") > 2).count() == 0)
    // same key always lands in the same partition
    assert(env.groupBy("key").agg(countDistinct("kafka_partition").as("n"))
      .filter(col("n") > 1).count() == 0)
  }
}
