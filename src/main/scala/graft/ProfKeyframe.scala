package graft

// Shape census for m7_keyframe_ahash at scale (round 19): the regenerated
// 100x probe read this new leg at 40.3x wall (142 s) after a flat 1.23x at
// 10x — the discontinuity signature of the r15 aHash signature-collapse
// class (identical-signature groups growing with the corpus over a fixed
// key space, turning the identical-signature pair leg quadratic). This
// census decides it by arithmetic, the BENCH_CONTAIN discipline: count
// keyframes, distinct signatures, the largest identical-signature groups,
// and the EXACT pair volume of both ahashPairs legs — the
// identical-signature self-join (sum g*(g-1)/2 over signature groups) and
// the Manku chunk-bucket candidate join over DISTINCT signatures
// (sum m*(m-1)/2 per (chunk index, chunk value) bucket).
//   usage: sbt "runMain graft.ProfKeyframe <sfDir>"
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

object ProfKeyframe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.bootstrap(spark)

    val kf = Multimodal.keyframeCorpus(spark, dir).persist()
    val n = kf.count()
    val w = Dedup.simhashChunkBits(n)
    val hashed = Multimodal.ahashHashedOf(spark, kf).persist()

    // the `within` leg joins ALL hashed rows (the image path keeps the real
    // aHash for letterboxed rows — key substitution is the PCM/video
    // convention only — so quarantined keyframes can and do share signature
    // groups with clean ones through the star leg), and its exact pair
    // volume is sum g(g-1)/2 over signature groups of the FULL hashed frame
    val groupsAll = hashed.groupBy("hash_hi", "hash_lo")
      .agg(count(lit(1)).as("g")).persist()
    val shapeAll = groupsAll.agg(
      count(lit(1)).as("distinct_keys"),
      sum((col("g") * (col("g") - 1) / 2).cast("long")).as("within_pairs"),
      max("g").as("max_group")).head
    // hashed is materialized now (shapeAll forced it through its cache) —
    // releasing the keyframe corpus earlier would have evicted the cache
    // before hashed's first action and re-run decode + segmentation
    kf.unpersist()
    println(s"## keyframes=$n chunk_bits=$w quarantined=" +
      s"${hashed.filter(col("letterboxed")).count()}")
    println(s"## all: distinct_keys=${shapeAll.getLong(0)} " +
      s"within_pairs=${shapeAll.getLong(1)} max_group=${shapeAll.getLong(2)}")
    println("## top identical-signature groups (all rows):")
    groupsAll.orderBy(col("g").desc).limit(8).collect()
      .foreach(r => println(s"##   hi=${r.get(0)} lo=${r.get(1)} g=${r.getLong(2)}"))

    // Manku chunk-bucket candidate volume over the CLEAN docs' DISTINCT
    // signatures — the sigPairs join's exact input: sum m(m-1)/2 per
    // (chunk index, chunk value) bucket, through the PRODUCTION chunk
    // explode itself (ahashChunksOf — a re-implementation here would
    // silently measure a different candidate volume if the lo/hi chunk
    // geometry ever moved)
    val sigs = hashed.filter(!col("letterboxed"))
      .groupBy("hash_hi", "hash_lo").agg(min("doc_id").as("doc_id"))
    val chunks = Multimodal.ahashChunksOf(sigs, w)
      .groupBy(col("c"), col("chunk")).agg(count(lit(1)).as("m"))
    val cand = chunks.agg(sum((col("m") * (col("m") - 1) / 2).cast("long")).as("cands"),
      max("m").as("max_bucket")).head
    println(s"## clean distinct sigs=${sigs.count()} " +
      s"chunk_cand_pairs=${cand.getLong(0)} max_bucket=${cand.getLong(1)}")
    spark.stop()
  }
}
