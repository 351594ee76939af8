package graft

// Attribution harness behind BENCH_CONTAIN_sf10.json (round-18 verdict #1
// and #5): the three remaining un-censused worst legs of the 100x probe —
// m6_containment (32.9x wall / 50.7x CPU), m6_source_divergence (28.2x /
// 67.9x) and m6_incremental_index (21.7x wall / 106.8x CPU, the one
// lifecycle leg whose CPU ratio sits above its siblings' ~linear band).
// Containment matters most: its df²-capped hash-keyed self-join is the one
// shape in the repo where a fixture-density change could genuinely go
// superlinear, which only a stage census (not the end-to-end ratio)
// separates from the bandwidth-stall CPU accounting ProfLmSup measured.
//
// Discipline is ProfLmSup's: each stage timed in isolation against a noop
// sink, cache cleared + GC'd between legs, every leg run twice, a tiny-join
// control to isolate join machinery from data-dependent growth, and a
// smaller-thread-count flag (`scanonly`) so an 8-vs-32 sweep can attribute
// CPU inflation to memory-bandwidth stall accounting (unchanged wall, CPU
// collapsing with threads = stall class; CPU invariant in threads = real
// per-row work).
//
// SHAPE CENSUS first — printed exact candidate volumes, because for
// containment superlinearity is decidable by arithmetic: the self-join on
// shingle hash h generates exactly Σ_h df(df−1) ordered candidate rows
// (2 ≤ df ≤ 50 after the flood guard). If that number scales ~100x between
// sf0.1 and the 100x fixture, candidate volume is linear in corpus size
// (shared-content density is scale-free in the replicated fixture) and the
// wall/CPU inflation is the stall class; if it scales faster, the join is
// genuinely superlinear at this density and needs a tighter df cap.
//
// Stages:
//   containment      C1 staged shingle-base scan + explode (global agg floor)
//                    C2 df census + 2..50 band filter (keyed agg)
//                    C3 discriminative semijoin (d ⋈ dfreq)
//                    C4 pair self-join + pair-count   — THE suspect stage
//                    C5 tiny-join control (one-hash broadcast side)
//                    C0 shipped m6_containment
//   source_divergence D1 token explode + (source,term) agg (the corpus pass)
//                    D2 term-keyed shared join + exact-decimal defect agg
//                    D0 shipped m6_source_divergence
//   incremental_index I1 admission (staged-ref + O(batch) delta build+commit)
//                    I2 catalog search alone (over I1's committed catalog)
//                    I0 shipped m6_incremental_index (admission + search)
//
//   usage: sbt "runMain graft.ProfContain <sfDir> [shufflePartitions] [threads] [scanonly]"
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupStaging, TextAnalysis}
import scala.jdk.CollectionConverters._

object ProfContain {
  def main(args: Array[String]): Unit = {
    // flags are positional-agnostic (the ProfLmSup r18-ADVICE convention):
    // strip before parsing the numeric args
    val scanonly = args.contains("scanonly")
    val pos = args.filterNot(_ == "scanonly")
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
      println(f"## $name%-30s wall ${(System.nanoTime() - w0) / 1e9}%8.2f s  " +
        f"cpu ${(os.getProcessCpuTime - c0) / 1e9}%8.2f s  " +
        f"gc ${(gcTime - g0) / 1e3}%7.2f s")
    }

    // ---- containment stages (mirrors Dedup.containment line for line) ----
    // staged shingle base, built once per corpus by the first shape query —
    // timed legs read it warm, matching the probe's separate staging entry
    def d = DedupStaging.shingleBase(spark, dir)
      .select(col("doc_id"), explode(col("hs")).as("h"))
    def dfreqAll = d.groupBy("h").agg(count(lit(1)).as("df"))
    def dfreq = dfreqAll.filter(col("df") >= 2 && col("df") <= 50)
    def disc = d.join(dfreq.select("h"), Seq("h"))

    // exact candidate volume of the C4 self-join: Σ_h df(df−1) over the
    // banded census — the superlinearity verdict is this one number's
    // sf0.1-vs-100x ratio
    val shape = dfreqAll.agg(
      count(lit(1)).as("hashes"),
      sum(when(col("df").between(2, 50), lit(1)).otherwise(lit(0))).as("banded"),
      sum(when(col("df").between(2, 50), col("df") * (col("df") - 1))
        .otherwise(lit(0L))).as("cand_pairs"),
      sum(when(col("df").between(2, 50), col("df")).otherwise(lit(0L)))
        .as("disc_rows")).head
    println(s"## shape hashes=${shape.getLong(0)} banded=${shape.getLong(1)} " +
      s"cand_pairs=${shape.getLong(2)} disc_rows=${shape.getLong(3)}")

    def c1 = d.agg(count(lit(1)).as("n"), countDistinct("h").as("nh"))
    def c2 = dfreq.agg(count(lit(1)).as("n"), sum("df").as("s"))
    def c3 = disc.agg(count(lit(1)).as("n"))
    def c4 = disc.as("a").join(disc.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_small"), col("b.doc_id").as("doc_big"))
      .agg(count(lit(1)).as("n_shared"))
    def c5 = {
      // one real banded hash, broadcast: the full join+pair-agg plan with
      // near-zero candidate volume — C4 − C5 is the data-dependent term
      val one = dfreq.select("h").limit(1)
      disc.as("a").join(broadcast(one), Seq("h"))
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
    }
    def c0 = Dedup.containment(spark, dir)

    // ---- source-divergence stages (mirrors TextAnalysis.sourceDivergence) --
    import TextAnalysis.normTokens
    def cnt = Tables.fanout(Tables.documents(spark, dir))
      .select(col("source"), explode(normTokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
    def d1 = cnt.agg(count(lit(1)).as("n"), sum("c").as("s"))
    def d2 = {
      val tot = cnt.groupBy("source").agg(sum("c").as("n"))
      def side(tag: String): DataFrame =
        cnt.join(broadcast(tot), Seq("source")).select(
          col("source").as(s"source_$tag"), col("term"),
          col("c").as(s"c$tag"), col("n").as(s"n$tag"))
      val pa = col("ca").cast("decimal(19,0)") * col("nb").cast("decimal(19,0)")
      val pb = col("cb").cast("decimal(19,0)") * col("na").cast("decimal(19,0)")
      side("a").join(side("b"), Seq("term"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("shared_terms"),
          sum(pa + pb - abs(pa - pb)).as("defect"))
    }
    def d0 = TextAnalysis.sourceDivergence(spark, dir)

    if (scanonly) {
      // the thread-sweep legs: the two corpus-scan floors (C1, D1) plus
      // containment's dominant stage (C4, the 253M-row pair-count agg) —
      // run this once at 32 threads and once at 8; stall-accounting CPU
      // collapses with the thread count at unchanged wall
      for (i <- 1 to 2) { run(s"C1 shingle explode floor #$i")(c1)
                          run(s"C4 pair self-join+count #$i")(c4)
                          run(s"D1 token (src,term) agg #$i")(d1) }
      spark.stop(); return
    }

    for (i <- 1 to 2) {
      run(s"C1 shingle explode floor #$i")(c1)
      run(s"C2 df band census #$i")(c2)
      run(s"C3 discriminative semijoin #$i")(c3)
      run(s"C4 pair self-join+count #$i")(c4)
      run(s"C5 tiny-join control #$i")(c5)
      run(s"C0 shipped containment #$i")(c0)
      run(s"D1 token (src,term) agg #$i")(d1)
      run(s"D2 shared-term join+defect #$i")(d2)
      run(s"D0 shipped source_divergence #$i")(d0)
    }

    // ---- incremental-index stages (side-effecting: admission commits a
    // fresh scratch catalog per leg, so I1/I2/I0 each see cold commits) ----
    def gcRun(name: String)(body: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc()
      val w0 = System.nanoTime(); val c0 = os.getProcessCpuTime; val g0 = gcTime
      body
      println(f"## $name%-30s wall ${(System.nanoTime() - w0) / 1e9}%8.2f s  " +
        f"cpu ${(os.getProcessCpuTime - c0) / 1e9}%8.2f s  " +
        f"gc ${(gcTime - g0) / 1e3}%7.2f s")
    }
    DedupStaging.bm25Index(spark, dir) // warm the release index once
    for (i <- 1 to 2) {
      var cat: (String, String) = null
      gcRun(s"I1 admission (delta commit) #$i") {
        cat = TextAnalysis.admittedCatalog(spark, dir)
      }
      gcRun(s"I2 catalog search only #$i") {
        TextAnalysis.bm25CatalogSearch(spark, cat._1, cat._2)
          .write.format("noop").mode("overwrite").save()
      }
      run(s"I0 shipped incremental_index #$i")(
        TextAnalysis.incrementalIndex(spark, dir))
    }
    spark.stop()
  }
}
