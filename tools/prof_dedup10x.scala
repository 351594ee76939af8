// scratch: 10x-scale sanity for the dedup staging pipeline - union documents
// 10 times (50k docs at sf0.1), build the shingle/signature base and run the
// LSH band join, confirm runtimes scale ~linearly (work is per-shingle and
// per-band-bucket, nothing quadratic). ASCII only (spark-shell -i reads the
// platform charset).
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft._
import graft.operators._

val dir = "/root/testdata/sf0.1"
spark.conf.set("spark.sql.shuffle.partitions", "32")
Tables.bootstrap(spark)

val d0 = Tables.documents(spark, dir)
val big = (0 until 10).map(i =>
  d0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
  ).reduce(_ unionAll _)
println(s"## docs: ${big.count()}")

def time(name: String)(df: => DataFrame): DataFrame = {
  val t0 = System.nanoTime()
  val out = df
  out.write.format("noop").mode("overwrite").save()
  println(f"## $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  out
}

// the staged shingle base, inline (DedupStaging's builders are dir-keyed)
val base = Tables.fanout(big)
  .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
  .select(col("doc_id"),
    array_distinct(TextAnalysis.shingles(col("toks"), 3)).as("sh"))
  .withColumn("hs", transform(col("sh"), s => Exact.fold60(s)))
  .drop("sh")
time("shingle base 10x")(base)

val staged = base.persist()
staged.count()
val seeds = (0 until 16).map(i => s"graft-minhash-seed-$i")
  .map(s => graft.functions.Fold60.fold(
    org.apache.spark.unsafe.types.UTF8String.fromString(s)))
val sigs = time("minhash sigs 10x") {
  staged.select(col("doc_id"), explode(col("hs")).as("h"))
    .groupBy("doc_id").agg(
      min(col("h").bitwiseXOR(lit(seeds(0)))).as("h0"),
      (1 until 16).map(j =>
        min(col("h").bitwiseXOR(lit(seeds(j)))).as(s"h$j")): _*)
}

val sigsP = sigs.persist()
sigsP.count()
time("band join 10x") {
  val bands = (0 until 8).map(b =>
    struct(lit(b).as("band"), col(s"h${2 * b}").as("k1"), col(s"h${2 * b + 1}").as("k2")))
  val buckets = sigsP.select(col("doc_id"), explode(array(bands: _*)).as("bd"))
    .select(col("doc_id"), col("bd.band").as("band"),
      col("bd.k1").as("k1"), col("bd.k2").as("k2"))
  buckets.as("x").join(buckets.as("y"), Seq("band", "k1", "k2"))
    .filter(col("x.doc_id") < col("y.doc_id"))
    .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    .dropDuplicates("doc_a", "doc_b")
}
System.exit(0)
