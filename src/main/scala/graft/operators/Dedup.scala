package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact.{rnd, sqlRnd}
import TextAnalysis.{shingles, sqlShingles, tokens}

/** Content deduplication over `documents` — exact and near-duplicate, the
  * core of a training-data pipeline (builder brief; SURVEY.md §7.1 M6).
  *
  * Scale design: nothing here is all-pairs. Exact dedup is one hash
  * aggregation on the content digest. Near-dup candidate generation is
  * always *bucketed* — length-window blocking for the exact-Jaccard
  * baseline, MinHash band buckets for LSH, 8-bit chunk buckets for
  * SimHash — so every join is equi-keyed and shuffles only bucket-sized
  * groups. The pair-verification joins carry small arrays, never the
  * documents themselves.
  *
  * Representation: shingle *sets* travel as `array<long>` (xxhash64 of each
  * shingle), not `array<string>`. Set intersection/union over fixed-width
  * longs is several times cheaper than over strings, and |A∩B|/|A∪B| is
  * unchanged as long as xxhash64 is collision-free within a pair's union
  * (~100 elements against 2^64 — p < 1e-15). The DuckDB oracle verifies the
  * same Jaccard values over the raw string shingles, so the hashed
  * representation is itself under test.
  */
object Dedup {

  /** doc_id + distinct 3-shingle set, as raw strings (`sh`). */
  private def withShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.fanout(Tables.documents(spark, dir)).select(
      col("doc_id"), col("lang"), col("n_chars"),
      array_distinct(shingles(tokens(col("text")), 3)).as("sh"))

  /** doc_id + distinct 3-shingle set hashed to longs (`hs`). */
  private def withHashedShingles(spark: SparkSession, dir: String): DataFrame =
    withShingles(spark, dir)
      .withColumn("hs", transform(col("sh"), s => xxhash64(s)))
      .drop("sh")

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b)).cast("double")

  /** M6: exact dedup — group by content digest, first-id-wins keeper.
    * A tenth of the corpus is re-injected as exact copies (deterministically,
    * in both engines) so the operator demonstrably collapses them. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
    docs.unionAll(copies)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
  }

  /** M6: exact-Jaccard near-dup baseline, blocked. Candidate pairs share a
    * language and a ±1 length bucket (50-char buckets ⊇ the |Δchars| ≤ 50
    * output predicate — block first, verify after: the LSH pattern even in
    * the exact query). */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val base = withHashedShingles(spark, dir)
    val left = base
      .withColumn("bucket", floor(col("n_chars") / 50))
      .select(col("doc_id").as("doc_a"), col("lang"), col("bucket"),
        col("n_chars").as("na"), col("hs").as("hsa"))
    val right = base
      .withColumn("bucket", explode(array(
        floor(col("n_chars") / 50) - 1,
        floor(col("n_chars") / 50),
        floor(col("n_chars") / 50) + 1)))
      .select(col("doc_id").as("doc_b"), col("lang"), col("bucket"),
        col("n_chars").as("nb"), col("hs").as("hsb"))
    left.join(right, Seq("lang", "bucket"))
      .filter(col("doc_a") < col("doc_b") && abs(col("na") - col("nb")) <= 50)
      .withColumn("jac", jaccard(col("hsa"), col("hsb")))
      .filter(col("jac") >= 0.5)
      .select(col("doc_a"), col("doc_b"), rnd(col("jac"), 4).as("jaccard"))
  }

  /** M6: MinHash + LSH banding — the 100 TB near-dup path. 16 min-hashes per
    * document, 8 bands × 2 rows; a pair is a candidate iff it collides in
    * some band (P ≈ 1−(1−j²)⁸ — ~1.0 at j=0.9), then verified with exact
    * Jaccard. Hash seeds are fixed → fully deterministic, but xxhash64 is
    * engine-specific, so correctness is ScalaTest recall-vs-baseline
    * (LlmPillarSpec) rather than a DuckDB oracle.
    *
    * Signature plan: explode the shingle set once and take 16 `min` aggregates
    * over seeded xxhash64 — whole-stage codegen'd with map-side partial mins,
    * so the shuffle carries 16 longs per document regardless of document
    * size. (The alternative — 16 `transform` higher-order passes per row —
    * is interpreted and rescans the array 16×.) */
  def minhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val K = 16
    val base = withHashedShingles(spark, dir).persist()
    val exploded = base.select(col("doc_id"), explode(col("hs")).as("h"))
    val sigs = exploded.groupBy("doc_id").agg(
      min(xxhash64(lit(0), col("h"))).as("h0"),
      (1 until K).map(j => min(xxhash64(lit(j), col("h"))).as(s"h$j")): _*)
    val bands = (0 until K / 2).map(b =>
      struct(lit(b).as("band"), xxhash64(col(s"h${2 * b}"), col(s"h${2 * b + 1}")).as("bkey")))
    val buckets = sigs.select(col("doc_id"), explode(array(bands: _*)).as("bd"))
      .select(col("doc_id"), col("bd.band").as("band"), col("bd.bkey").as("bkey"))
    val cands = buckets.as("x")
      .join(buckets.as("y"), Seq("band", "bkey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val hs = base.select(col("doc_id"), col("hs"))
    cands
      .join(hs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("hs", "hsa"), Seq("doc_a"))
      .join(hs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("hs", "hsb"), Seq("doc_b"))
      .withColumn("jac", jaccard(col("hsa"), col("hsb")))
      .filter(col("jac") >= 0.8)
      .select(col("doc_a"), col("doc_b"), rnd(col("jac"), 4).as("jaccard"))
  }

  /** Per-document 64-bit SimHash signature: shingle-hash bit voting — one
    * explode + one wide (64-column) hash aggregation, map-side combined.
    * MinHash seed-0 shingle hashes and SimHash shingle hashes share the same
    * xxhash64(shingle) base, so the two signature pipelines could share one
    * scan in a combined job. */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val hashed = withHashedShingles(spark, dir)
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val voteCols = (0 until 64).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$i"))
    val votes = hashed.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val sim = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    votes.select(col("doc_id"), sim.as("simhash"))
  }

  /** M6: SimHash near-dup pairs — candidates collide in one of eight 8-bit
    * chunks (pigeonhole: any pair within Hamming distance 7 has an untouched
    * chunk, so recall at the ≤7 output bound is exact — LlmPillarSpec proves
    * it against brute force), verified with bit_count(xor) ≤ 7. At much
    * larger corpora the 8-bit chunks get dense: widen to 16-bit chunks with
    * multi-probe, trading recall bound for bucket sparsity.
    *
    * The signature table is persisted before the self-join — it is the
    * product of the corpus-wide explode/aggregate, and both join sides need
    * it; without the persist the whole signature pipeline runs twice. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val signatures = simhashSignatures(spark, dir).persist()
    val chunks = signatures.select(col("doc_id"), col("simhash"),
      explode(array((0 until 8).map(c =>
        struct(lit(c).as("c"),
          shiftright(col("simhash"), 8 * c).bitwiseAND(lit(0xFFL)).as("chunk"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.c").as("c"), col("ck.chunk").as("chunk"))
    chunks.as("x").join(chunks.as("y"), Seq("c", "chunk"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter(col("hamming") <= 7)
      .dropDuplicates("doc_a", "doc_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m6_exact_dedup"   -> exactDedup,
    "m6_ngram_jaccard" -> ngramJaccard,
    "m6_minhash_dedup" -> minhashDedup,
    "m6_simhash_pairs" -> simhashPairs)

  private val shSql = s"list_distinct(${sqlShingles("string_split(text, ' ')", 3)})"

  val oracles: Map[String, String] = Map(
    "m6_exact_dedup" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS keeper_id,
         count(*) AS n_copies
         FROM (SELECT doc_id, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0) u
         GROUP BY 1""",
    "m6_ngram_jaccard" ->
      s"""WITH sh AS (SELECT doc_id, lang, n_chars, $shSql AS s FROM documents)
          SELECT doc_a, doc_b, ${sqlRnd("jac", 4)} AS jaccard FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              len(list_intersect(a.s, b.s)) / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) AS jac
            FROM sh a JOIN sh b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 50) p
          WHERE jac >= 0.5""")
    // m6_minhash_dedup / m6_simhash_pairs: engine-specific hash (xxhash64) →
    // no SQL oracle; verified by LlmPillarSpec recall tests against the
    // m6_ngram_jaccard baseline.
}
