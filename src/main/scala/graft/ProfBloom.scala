package graft

// Selectivity census for the m6_bloom_decontaminate / m4t_stream_decon
// sketch path: the claim under test is the SCALE argument — the sketch
// prefilter drops ~(1 − FPR) of the clean corpus's shingle volume before
// any exchange, while passing every true leak (no false negatives). This
// harness measures the quantities the claim is made of at a chosen scale:
// held-out distinct shingles, sketch size, training shingle rows, rows
// passing the sketch, exact matches, and the realized FPR on clean rows —
// plus honest wall times for both plans (at single-node test scales the
// exact heldout set still broadcasts, so the sketch's wall win is modest
// by design; the census numbers are the 100-TB story, where the exact set
// stops being broadcastable and the prefilter bounds the shuffle).
//   usage: sbt "runMain graft.ProfBloom <sfDir>"   (honors SPARK_GRAFT_WAREHOUSE)
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupStaging}

object ProfBloom {
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

    def timed[T](body: => T): (T, Double) = {
      val w0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - w0) / 1e9)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val s8 = DedupStaging.shingle8(spark, dir) // staged (warm if warehouse reused)
    val held = s8.filter(col("doc_id") % 97 === 0)
    val heldout = held.select("h").distinct()
    val nHeld = heldout.count()
    val (sketch, buildS) = timed(Dedup.heldoutSketch(spark, dir))
    val training = s8.filter(col("doc_id") % 97 =!= 0)
      .unionAll(held.withColumn("doc_id", col("doc_id") + 2000000))
    val total = training.count()
    val pass = training.filter(call_function("graft_bloom_might_contain",
      lit(sketch), col("h"))).count()
    val exact = training.join(heldout, Seq("h")).count()
    val fpOnClean =
      if (total == exact) 0.0 else (pass - exact).toDouble / (total - exact)
    val (_, bloomWall) = timed(noop(Dedup.bloomDecontaminate(spark, dir)))
    val (_, exactWall) = timed(noop(Dedup.decontaminate(spark, dir)))
    println(
      s"""{"profile":"bloom_decon","sf":"$dir","held_distinct":$nHeld,""" +
      s""""sketch_bytes":${sketch.length},"sketch_build_s":${f"$buildS%.2f"},""" +
      s""""training_shingle_rows":$total,"bloom_pass":$pass,""" +
      s""""exact_match":$exact,"fp_rate_on_clean":${f"$fpOnClean%.5f"},""" +
      s""""drop_fraction":${f"${1.0 - pass.toDouble / total}%.5f"},""" +
      s""""bloom_query_wall_s":${f"$bloomWall%.2f"},""" +
      s""""exact_query_wall_s":${f"$exactWall%.2f"}}""")
    spark.stop()
  }
}
