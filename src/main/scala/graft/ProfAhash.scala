package graft

// Attribution harness for m7_ahash_neardup (round-14 verdict #1: at the 100×
// probe the query sat at 45× wall / 74× CPU — #3 worst probe member — with
// its CPU class claimed into the occupancy-stall attribution WITHOUT its own
// measurement leg; the thread sweep covered only the keyed-agg text queries).
// Decomposes the shipped pipeline into its three stages — PPM frame + byte
// decode + aHash (narrow map), chunk-bucket census (candidate volume under
// the adaptive Manku width), and the chunk-keyed candidate join + exact
// Hamming verify — at a chosen thread count, so the 100× cost lands on a
// measured stage instead of a borrowed explanation. Results → BENCH_AHASH
// _sf10.json + README row.
//   usage: sbt "runMain graft.ProfAhash <sfDir> <shufflePartitions> <threads>"
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}
import scala.jdk.CollectionConverters._

object ProfAhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = if (args.length > 1) args(1) else "32"
    val threads = if (args.length > 2) args(2) else "32"
    val spark = org.apache.spark.sql.SparkSession.builder()
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
    def run(name: String)(body: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc()
      val w0 = System.nanoTime(); val c0 = os.getProcessCpuTime; val g0 = gcTime
      body
      println(f"## $name%-26s wall ${(System.nanoTime() - w0) / 1e9}%8.2f s  " +
        f"cpu ${(os.getProcessCpuTime - c0) / 1e9}%8.2f s  " +
        f"gc ${(gcTime - g0) / 1e3}%7.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val corpus = Multimodal.ahashCorpus(spark, dir)
    val n = corpus.count()
    val w = Dedup.simhashChunkBits(n)
    println(s"## shape images=$n chunkBits=$w nchunks=${64 / w}")

    // candidate-volume census: per-(c, chunk) bucket populations and the
    // exact candidate-pair count the join emits before the Hamming filter —
    // THE quantity that decides whether the blocking is quadratic-prone.
    // Computed once up front (it reads the same hashed frame the legs do).
    val hashed = Multimodal.ahashHashedOf(spark, corpus)
    val buckets = Multimodal.ahashChunksOf(hashed, w)
      .groupBy("c", "chunk").agg(count(lit(1)).as("m"))
    val census = buckets.agg(
      count(lit(1)).as("n_buckets"),
      max("m").as("max_bucket"),
      sum(col("m") * (col("m") - 1) / 2).as("cand_pairs")).head
    println(s"## census buckets=${census.getLong(0)} " +
      s"max_bucket=${census.getLong(1)} cand_pairs=${census.get(2)}")

    for (i <- 1 to 2) {
      // stage A: frame + decode + hash — the narrow mapPartitions pass
      run(s"A decode+hash #$i")(noop(Multimodal.ahashHashedOf(spark, corpus)))
      // stage B: A + chunk explode + the candidate join, Hamming SKIPPED
      // (count the raw pairs) — B − A isolates the join
      run(s"B +candidate join #$i") {
        val h = Multimodal.ahashHashedOf(spark, corpus)
        val ch = Multimodal.ahashChunksOf(h, w)
        noop(ch.as("x").join(ch.as("y"), Seq("c", "chunk"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")))
      }
      // stage C: the shipped query (join + Hamming verify + dedup)
      run(s"C shipped query #$i")(noop(Multimodal.ahashNearDup(spark, dir)))
    }
    spark.stop()
  }
}
