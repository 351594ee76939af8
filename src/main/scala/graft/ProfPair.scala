package graft

// Attribution harness for m7_pair_curation (round-19 optimization round):
// the shipped query reads ~45 process-cpu-s at sf0.1 while its visible
// components look far cheaper (classifyFrame over the FULL corpus is ~2
// cpu-s as m6_quality_classifier), so the cost needs a stage census, not a
// guess. Legs, each timed in isolation (noop sink, cache cleared + GC'd
// between legs — the ProfLmSup discipline). Every leg below P1 re-derives
// the UNPERSISTED pair fixture, so leg − P1 is the stage's own cost:
//   P1  pairFixture                       — corpus scan + pair-pivot agg
//   P2  side keys + roots + star edges    — 2×fold60 + keyed min + join
//   P3  connected components over edges   — the contraction loop
//   P4  caption gate (classifyFrame)      — explode + keyed agg
//   P5  image gate (ahashHashedOf)        — PPM decode + aHash
//   P0  the shipped m7_pair_curation      — scoped persist, one fixture
//   usage: sbt "runMain graft.ProfPair <sfDir> [shufflePartitions] [threads]"
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Exact, Multimodal, TextAnalysis}
import scala.jdk.CollectionConverters._

object ProfPair {
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

    def px = Multimodal.pairFixture(spark, dir)
    def sides(p: DataFrame) = p.select(col("pair_id"), lit(0).as("side"),
        Exact.fold60(col("img_text")).as("key"))
      .unionAll(p.select(col("pair_id"), lit(1).as("side"),
        Exact.fold60(col("cap_text")).as("key")))
    def edges(p: DataFrame) = {
      val s = sides(p)
      val roots = s.groupBy("side", "key")
        .agg(min("pair_id").as("root"), count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
      s.join(roots.select("side", "key", "root"), Seq("side", "key"))
        .filter(col("pair_id") =!= col("root"))
        .select(col("root").as("doc_a"), col("pair_id").as("doc_b"))
    }

    val shape = px.agg(count(lit(1))).head
    println(s"## shape pairs=${shape.getLong(0)}")

    run("P1 fixture")(px)
    run("P2 side edges")(edges(px))
    run("P3 edges + CC") {
      val (labels, rounds) = Dedup.connectedComponentsWithRounds(edges(px), "pair_id")
      println(s"##   cc rounds=$rounds")
      labels
    }
    run("P4 caption gate")(TextAnalysis.classifyFrame(
      px.select(col("pair_id").as("doc_id"), col("cap_text").as("text"))))
    run("P5 image gate")(Multimodal.ahashHashedOf(spark,
      px.select(col("pair_id").as("doc_id"), col("img_text").as("text"))))
    run("P0 shipped")(Multimodal.pairCuration(spark, dir))
    spark.stop()
  }
}
