package graft

// Attribution harness behind BENCH_THREADS_sf10.json (round-13 verdict #2,
// the keyed-agg "CPU superlinearity"): runs the shipped m6_quality_classifier
// (V0) against controlled variants — identical feature volume with a global
// agg (V1, isolates the keyed-agg surcharge), a row-local aggregate() HOF
// (V2), a (doc,bucket) two-level agg (V3), and a broadcast weight table
// (V4) — at a chosen thread count and shuffle width, recording wall,
// process-CPU and GC per run plus the corpus feature shape. The thread
// sweep (32 vs 8 vs 4) is what separated bandwidth-stall CPU accounting
// from plan cost; README "Bench notes (round 14)" carries the conclusions.
//   usage: sbt "runMain graft.ProfClassifier <sfDir> <shufflePartitions> <threads> [hof] [v1only]"
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Exact, TextAnalysis}
import scala.jdk.CollectionConverters._

object ProfClassifier {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = if (args.length > 1) args(1) else "32"
    val threads = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.bootstrap(spark)
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def gcTime: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def run(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      val w0 = System.nanoTime(); val c0 = os.getProcessCpuTime; val g0 = gcTime
      df.write.format("noop").mode("overwrite").save()
      println(f"## $name%-28s wall ${(System.nanoTime() - w0) / 1e9}%8.2f s  " +
        f"cpu ${(os.getProcessCpuTime - c0) / 1e9}%8.2f s  " +
        f"gc ${(gcTime - g0) / 1e3}%7.2f s")
    }
    val docs = Tables.documents(spark, dir)
    import TextAnalysis.{normTokens, shingles}

    // corpus shape: docs, features, feature bytes
    val shape = docs
      .select(normTokens(col("text")).as("toks"))
      .select((size(col("toks")) * 2 - 1).as("nf"),
        length(concat_ws(" ", col("toks"))).as("nb"))
      .agg(count(lit(1)), sum("nf"), sum("nb")).head
    println(s"## shape docs=${shape.getLong(0)} feats~=${shape.getLong(1)} normBytes=${shape.getLong(2)}")

    val feats = docs
      .select(col("doc_id"), normTokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(concat(col("toks"), shingles(col("toks"), 2))).as("feat"))
      .withColumn("bucket",
        pmod(Exact.fold60(concat(col("feat"), lit("|qc"))), lit(4096)))
      .withColumn("w",
        pmod(Exact.fold60(concat(col("bucket").cast("string"), lit("|qw"))),
          lit(2001)) - 1000)

    // V1: identical per-row work, GLOBAL agg (no doc keys) — isolates the
    // keyed-aggregation surcharge as V0 - V1
    def v1 = feats.agg(count(lit(1)).as("n"), sum("w").as("sw"))
    // V0: the shipped query
    def v0 = TextAnalysis.qualityClassifier(spark, dir)
    // V2: row-local — no explode, no shuffle: per-doc sums via the
    // aggregate HOF (interpreted eval per element; measures whether
    // map-only beats codegen-explode+keyed-agg)
    def v2 = docs
      .select(col("doc_id"), normTokens(col("text")).as("toks"))
      .select(col("doc_id"),
        concat(col("toks"), shingles(col("toks"), 2)).as("feats"))
      .filter(size(col("feats")) > 0)
      .select(col("doc_id"), size(col("feats")).cast("long").as("n_features"),
        aggregate(col("feats"), lit(0L), (acc, f) =>
          acc + (pmod(Exact.fold60(concat(
              pmod(Exact.fold60(concat(f, lit("|qc"))), lit(4096)).cast("string"),
              lit("|qw"))), lit(2001)) - 1000).cast("long")).as("sw"))
      .select(col("doc_id"), col("n_features"),
        Exact.rnd(lit(0.1) + col("sw").cast("double")
          / col("n_features").cast("double") / lit(1000.0), 4).as("score"),
        (col("sw") >= lit(-100L) * col("n_features")).as("keep"))
    // V3: two-level agg — (doc, bucket) partial then doc rollup
    def v3 = feats
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"), first("w").as("w"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_features"), sum(col("w") * col("c")).as("sw"))
      .select(col("doc_id"), col("n_features"),
        Exact.rnd(lit(0.1) + col("sw").cast("double")
          / col("n_features").cast("double") / lit(1000.0), 4).as("score"),
        (col("sw") >= lit(-100L) * col("n_features")).as("keep"))

    // V2 (interpreted HOF) measured 10x WORSE per feature at sf0.1 — only
    // run it when asked (it would dominate the 100x run's wall).
    // V4: shipped-weights shape — the 4096-row weight table derives ONCE
    // (same formula) and broadcasts; per-feature work drops to a single
    // fold60 + a broadcast-hash probe instead of two folds
    def v4 = {
      val wtab = spark.range(4096).select(col("id").as("bucket"),
        (pmod(Exact.fold60(concat(col("id").cast("string"), lit("|qw"))),
          lit(2001)) - 1000).as("w"))
      docs
        .select(col("doc_id"), normTokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(concat(col("toks"), shingles(col("toks"), 2))).as("feat"))
        .withColumn("bucket",
          pmod(Exact.fold60(concat(col("feat"), lit("|qc"))), lit(4096)))
        .join(broadcast(wtab), Seq("bucket"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_features"), sum("w").as("sw"))
        .select(col("doc_id"), col("n_features"),
          Exact.rnd(lit(0.1) + col("sw").cast("double")
            / col("n_features").cast("double") / lit(1000.0), 4).as("score"),
          (col("sw") >= lit(-100L) * col("n_features")).as("keep"))
    }
    val withHof = args.contains("hof")
    val v1only = args.contains("v1only")
    for (i <- 1 to 2) {
      run(s"V1 features+global agg #$i")(v1)
      if (!v1only) {
        run(s"V0 shipped classifier #$i")(v0)
        if (withHof) run(s"V2 row-local HOF #$i")(v2)
        run(s"V3 two-level agg #$i")(v3)
      }
      run(s"V4 broadcast weights #$i")(v4)
    }
    spark.stop()
  }
}
