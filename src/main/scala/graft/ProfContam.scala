package graft

// Cost-attribution census for m6_contamination_score's 100×-probe
// superlinearity (r16 verdict "What's wrong #2": 301× CPU at 32
// partitions / 186× at 320 where the scan-class peers sit at ~100–130×).
// The operator is four stages — staged-shingle scan, partial-plant
// re-shingling, broadcast hit-set build, probe join + keyed agg — and the
// ratio argument needs to know WHICH one grows superlinearly. This
// harness times each stage in isolation (noop sink, cache cleared and
// GC'd between legs, the Bench discipline) plus a TINY-bench control:
// the identical join+agg plan probing a one-row broadcast table, so
// (full − tiny) isolates what the held-out hash table's 107× growth
// costs on the probe side (2.2k entries ≈ L1-resident at sf0.1 vs 242k
// entries ≈ 8 MB ≈ L3/DRAM-resident at the 100× fixture) from everything
// scan-shaped.
//   usage: sbt "runMain graft.ProfContam <sfDir>"  (honors SPARK_GRAFT_WAREHOUSE,
//          SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE_PARTITIONS)
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object ProfContam {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.bootstrap(spark)
    graft.functions.GraftFunctions.register(spark)

    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timed(body: => Unit): (Double, Double) = {
      val w0 = System.nanoTime()
      val c0 = os.getProcessCpuTime
      body
      val r = ((System.nanoTime() - w0) / 1e9, (os.getProcessCpuTime - c0) / 1e9)
      spark.catalog.clearCache(); System.gc()
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // untimed warm-up: staging (shingle8 build or warm read-back) and the
    // raw documents scan, so leg 1 measures the scan, not the build
    val nProbe = Dedup.contaminationProbeSide(spark, dir).count()
    val nPlantRows = Dedup.contaminationPlants(spark, dir).count()
    val nBench = Dedup.contaminationBench(spark, dir).count()

    // 1) probe-side scan + the operator's keyed agg, no join at all: the
    //    staged-table read + plants union + aggregation-map cost
    val (scanW, scanC) = timed(noop(Dedup.contaminationProbeSide(spark, dir)
      .groupBy("doc_id").agg(count(col("h")).as("n_grams"))))
    // 2) the plants branch alone (raw normTokens + mutate + shingle + md5
    //    over 1/97 of the corpus — interpreted HOF evaluation)
    val (plantW, plantC) = timed(noop(Dedup.contaminationPlants(spark, dir)
      .groupBy("doc_id").agg(count(col("h")).as("n_grams"))))
    // 3) the broadcast hit-set build (distinct over the held-out shingles)
    val (benchW, benchC) = timed(noop(Dedup.contaminationBench(spark, dir)))
    // 4) the full operator
    val (fullW, fullC) = timed(noop(Dedup.contaminationScore(spark, dir)))
    // 5) the tiny-bench control: the IDENTICAL join+agg plan probing a
    //    one-row broadcast hash table — no probe row ever matches, every
    //    other cost identical, so full − tiny ≈ hit-set build + the probe
    //    cost of the GROWN hash table
    val tiny = spark.range(1).select((col("id") - 2).as("h"), lit(1).as("hit"))
    val (tinyW, tinyC) = timed(noop(Dedup.contaminationScoreOf(
      Dedup.contaminationProbeSide(spark, dir), tiny)))

    println(
      s"""{"profile":"contamination_score","sf":"$dir",""" +
      s""""probe_rows":$nProbe,"plant_rows":$nPlantRows,"bench_distinct":$nBench,""" +
      s""""probe_scan_agg":{"wall_s":${f"$scanW%.2f"},"cpu_s":${f"$scanC%.2f"}},""" +
      s""""plants_branch":{"wall_s":${f"$plantW%.2f"},"cpu_s":${f"$plantC%.2f"}},""" +
      s""""bench_build":{"wall_s":${f"$benchW%.2f"},"cpu_s":${f"$benchC%.2f"}},""" +
      s""""full_query":{"wall_s":${f"$fullW%.2f"},"cpu_s":${f"$fullC%.2f"}},""" +
      s""""tiny_bench_join":{"wall_s":${f"$tinyW%.2f"},"cpu_s":${f"$tinyC%.2f"}}}""")
    spark.stop()
  }
}
