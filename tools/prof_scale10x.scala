// scratch: 10x-scale sanity - union events 10 times (1M rows), run headline
// batch pipelines, confirm runtimes scale ~linearly and no plan degenerates.
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft._
import graft.operators._

val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", "32")
Tables.bootstrap(spark)

// 1M-row events with distinct ids per replica (keeps keys realistic)
val ev0 = Tables.events(spark, dir)
val big = (0 until 10).map(i =>
  ev0.withColumn("event_id", col("event_id") + lit(i * 10000000L))
     .withColumn("user_id", col("user_id") + lit((i % 3) * 1000L))
  ).reduce(_ unionAll _)
big.createOrReplaceTempView("big_events")
println(s"## rows: ${big.count()}")

def time(name: String)(df: => DataFrame): Unit = {
  val t0 = System.nanoTime()
  df.write.format("noop").mode("overwrite").save()
  println(f"## $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
}

time("a1 window agg 10x") {
  WindowAggregates.aggregateWindows(
    big.filter(col("ts").isNotNull && col("user_id").isNotNull))
}
time("w3 anomaly 10x") {
  val stats = big.groupBy("user_id").agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
  big.join(broadcast(stats), Seq("user_id"))
    .withColumn("anomaly", abs(col("value") - col("mu")) > col("sigma") * 2)
}
time("v8 validation 10x") {
  Validation.withFailures(big, Validation.eventRules)
}
time("w8 latest-per-key 10x") {
  import org.apache.spark.sql.expressions.Window
  val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
  big.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
}
System.exit(0)
