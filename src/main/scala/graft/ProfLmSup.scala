package graft

// Attribution harness behind BENCH_LMSUP_sf10.json (round-17 verdict #2:
// after the r18 scoped persist closed the double-tokenization, whatever CPU
// inflation remains on m6_lm_support at the 100x fixture — 170.8x CPU /
// 58.9x wall pre-fix — needs a ProfContam-style census, not a guess).
// Stages, each timed in isolation (noop sink, cache cleared + GC'd between
// legs, the Bench discipline):
//   V1  bigram explode + GLOBAL agg       — the scan+tokenize+explode floor
//   V2  the (w1, w2) count-table build    — map-side-combined keyed agg
//   V3  tiny-join control                 — the full join+doc-agg plan
//                                           probing a ONE-ROW broadcast
//                                           count table (isolates the
//                                           data-dependent join growth as
//                                           V0 − V3)
//   V0  the shipped m6_lm_support         — scoped persist, one tokenize
//   usage: sbt "runMain graft.ProfLmSup <sfDir> [shufflePartitions] [threads]"
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import scala.jdk.CollectionConverters._

object ProfLmSup {
  def main(args: Array[String]): Unit = {
    // the v1only flag is positional-agnostic: strip it before parsing the
    // numeric args (r18 ADVICE — `ProfLmSup <dir> v1only` used to feed the
    // flag into shufflePartitions and crash Spark config parsing)
    val pos = args.filterNot(_ == "v1only")
    val dir = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = if (pos.length > 1) pos(1) else "32"
    val threads = if (pos.length > 2) pos(2) else "32"
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
    import TextAnalysis.normTokens
    // the UNPERSISTED bigram frame — each leg below consumes it exactly
    // once, so stage isolation needs no cache
    def bg = Tables.fanout(Tables.documents(spark, dir))
      .select(col("doc_id"), normTokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), (size(col("t")) - 1).cast("long").as("n_bigrams"),
        explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("n_bigrams"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))

    val shape = bg.agg(count(lit(1)), countDistinct(col("w1"), col("w2"))).head
    println(s"## shape bigrams=${shape.getLong(0)} distinct=${shape.getLong(1)}")

    def v1 = bg.agg(count(lit(1)).as("n"), sum("n_bigrams").as("s"))
    def v2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
    def v3 = {
      val tiny = spark.createDataFrame(Seq(("the", "end", 1L)))
        .toDF("w1", "w2", "cab")
      bg.join(broadcast(tiny), Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(max("n_bigrams").as("n_bigrams"), sum("cab").as("support"))
    }
    def v0 = TextAnalysis.lmSupport(spark, dir)

    // `v1only`: the thread-sweep leg (the ProfClassifier/BENCH_THREADS
    // discipline) — re-run just the scan stage at a smaller thread count
    // to separate bandwidth-stall CPU accounting from per-row plan cost
    val v1only = args.contains("v1only")
    for (i <- 1 to 2) {
      run(s"V1 explode+global agg #$i")(v1)
      if (!v1only) {
        run(s"V2 count-table build #$i")(v2)
        run(s"V3 tiny-join control #$i")(v3)
        run(s"V0 shipped lm_support #$i")(v0)
      }
    }
    spark.stop()
  }
}
