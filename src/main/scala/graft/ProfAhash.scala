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

    // census-only mode: dump the hashed frame for offline skew analysis
    // (bucket composition, identical-hash collapse factors) and exit
    val dump = sys.env.get("SPARK_GRAFT_AHASH_DUMP")
    dump.foreach { p =>
      Multimodal.ahashHashedOf(spark, corpus)
        .write.mode("overwrite").parquet(p)
      println(s"## dumped hashed frame to $p")
    }
    if (dump.nonEmpty) { spark.stop(); return }

    // candidate-volume census, BOTH keyings: doc-keyed (the pre-r15 shape —
    // the counterfactual) and distinct-signature-keyed (the shipped shape).
    // THE quantity that decides whether the blocking is quadratic-prone.
    val hashed = Multimodal.ahashHashedOf(spark, corpus)
    def censusOf(frame: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val buckets = Multimodal.ahashChunksOf(frame, w)
        .groupBy("c", "chunk").agg(count(lit(1)).as("m"))
      val census = buckets.agg(
        count(lit(1)).as("n_buckets"),
        max("m").as("max_bucket"),
        sum(col("m") * (col("m") - 1) / 2).as("cand_pairs")).head()
      println(s"## census[$tag] buckets=${census.getLong(0)} " +
        s"max_bucket=${census.getLong(1)} cand_pairs=${census.get(2)}")
      buckets.orderBy(col("m").desc).limit(3).collect().foreach(r =>
        println(s"## top_bucket[$tag] c=${r.getInt(0)} chunk=${r.getLong(1)} m=${r.getLong(2)}"))
    }
    censusOf(hashed, "doc")
    val sigsC = hashed.groupBy("hash_hi", "hash_lo").agg(min("doc_id").as("doc_id"))
    censusOf(sigsC, "sig")
    // the r16 letterbox quarantine: pad-degenerate images leave the chunk
    // join entirely — this census is the RESIDUAL candidate volume the
    // shipped query's quadratic-prone stage actually sees, and the
    // top_bucket rows show what is left of the all-ones bucket
    val lbN = hashed.filter(col("letterboxed")).count()
    println(s"## letterboxed $lbN of $n images quarantined to the exact-signature path")
    val sigsClean = hashed.filter(!col("letterboxed"))
      .groupBy("hash_hi", "hash_lo").agg(min("doc_id").as("doc_id"))
    censusOf(sigsClean, "sig_clean")
    // identical-full-hash clusters: their pair mass is OUTPUT (Hamming 0),
    // quadratic by definition — no blocking scheme can shed it
    val dup = hashed.groupBy("hash_hi", "hash_lo").agg(count(lit(1)).as("m"))
      .filter(col("m") > 1)
      .agg(count(lit(1)).as("groups"), max("m").as("max_m"),
        sum(col("m") * (col("m") - 1) / 2).as("pairs")).head()
    println(s"## dup_hash groups=${dup.getLong(0)} max=${if (dup.isNullAt(1)) 0 else dup.getLong(1)} " +
      s"pairs=${dup.get(2)}")

    for (i <- 1 to 2) {
      // stage A: frame + decode + hash — the narrow mapPartitions pass
      run(s"A decode+hash #$i")(noop(Multimodal.ahashHashedOf(spark, corpus)))
      // stage B: A + signature collapse + chunk join over distinct sigs +
      // Hamming verify + sig-pair dedup — the shipped core WITHOUT the
      // doc-pair expansion; C − B isolates the output-sized expansion
      run(s"B +sig candidate join #$i") {
        val h = Multimodal.ahashHashedOf(spark, corpus)
        // the shipped shape: quarantined signatures never enter the join
        val sigs = h.filter(!col("letterboxed"))
          .groupBy("hash_hi", "hash_lo").agg(min("doc_id").as("doc_id"))
        val ch = Multimodal.ahashChunksOf(sigs, w)
        noop(ch.as("x").join(ch.as("y"), Seq("c", "chunk"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.hash_hi").as("a_hi"), col("x.hash_lo").as("a_lo"),
            col("y.hash_hi").as("b_hi"), col("y.hash_lo").as("b_lo"),
            (bit_count(col("x.hash_hi").bitwiseXOR(col("y.hash_hi"))) +
             bit_count(col("x.hash_lo").bitwiseXOR(col("y.hash_lo")))).as("hamming"))
          .filter(col("hamming") <= 64 / w - 1)
          .dropDuplicates("a_hi", "a_lo", "b_hi", "b_lo"))
      }
      // stage C: the shipped query (collapse + join + verify + expansion)
      run(s"C shipped query #$i")(noop(Multimodal.ahashNearDup(spark, dir)))
    }
    spark.stop()
  }
}
