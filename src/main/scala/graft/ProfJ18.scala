package graft

// Attribution leg behind the README round-18 note on j18_class_priority
// (round-17 verdict #6: 125.1x CPU / 15.1x wall at the 100x fixture — say
// the cause with a number). Stages, each timed in isolation (the Bench
// discipline): the filtered lineitem scan + conditional agg WITHOUT the
// join (V1), the identical join+agg plan probing a ONE-ROW broadcast
// orders table (V2 — the tiny control), and the shipped query (V0), so
// V0 − V2 is the measured cost of building and probing the grown
// fact-side hash table and V2 − V1 the join machinery floor.
//   usage: sbt "runMain graft.ProfJ18 <sfDir> [shufflePartitions] [threads]"
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

object ProfJ18 {
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
    def l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01") &&
        col("l_shipdate") < lit("1999-01-01"))
      .select("l_orderkey", "l_returnflag")
    val shape = l.agg(count(lit(1))).head
    val oShape = Tables.orders(spark, dir).agg(count(lit(1))).head
    println(s"## shape lineitem98=${shape.getLong(0)} orders=${oShape.getLong(0)}")

    def v1 = l.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    def v2 = {
      val tiny = spark.createDataFrame(Seq((-1L, "1-URGENT")))
        .toDF("o_orderkey", "o_orderpriority")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(broadcast(tiny), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(when(high, lit(1))).as("high_line_count"),
          count(when(!high, lit(1))).as("low_line_count"))
    }
    def v0 = graft.operators.Joins.priorityByClass(spark, dir)

    for (i <- 1 to 2) {
      run(s"V1 scan+agg, no join #$i")(v1)
      run(s"V2 tiny-join control #$i")(v2)
      run(s"V0 shipped j18 #$i")(v0)
    }
    spark.stop()
  }
}
