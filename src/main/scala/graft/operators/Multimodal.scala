package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (builder brief; SURVEY.md §7.1 M6): media
  * payloads as opaque `binary` columns with typed metadata, plus a
  * decode / feature-extract stage.
  *
  * No media codecs exist in this environment, so the decode step is a
  * clearly-marked deterministic STUB — but everything Spark-side is real and
  * load-bearing: the binary column, the metadata projection, the typed
  * `Dataset` schema, and the partition-iterator batch shape (decoder
  * initialized once per partition, rows streamed through it — exactly how a
  * real model/codec rides `mapPartitions`, and the Scala analog of a
  * `mapInPandas` batch UDF).
  *
  * The `documents` table stands in for a media corpus: its UTF-8 bytes are
  * the "media payload". At 100 TB the payload column dominates I/O — the
  * metadata projection reads only the bytes it needs, and feature extraction
  * is a narrow map (no shuffle at all until features feed a downstream
  * join/ANN stage).
  */
object Multimodal {

  /** M7: binary ingest + metadata projection — payload byte length, content
    * digest, fake-decoded dimensions and a frame-sampling plan derived
    * arithmetically from the payload size (oracle-replayable). */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val blob = encode(col("text"), "UTF-8")
    val byteLen = octet_length(blob)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      byteLen.as("byte_len"),
      sha2(blob, 256).as("checksum"),
      (pmod(byteLen, lit(64)) + 16).as("width"),
      (pmod(byteLen, lit(48)) + 16).as("height"),
      (floor(byteLen / 100) + 1).cast("int").as("n_frames"))
  }

  final case class MediaIn(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, width: Int, height: Int,
      n_features: Int, f0: Double, f1: Double, f2: Double, f3: Double)

  /** STUB decoder — stands in for an image/audio codec (none exists in this
    * container). Deterministic: "features" are byte-content checksums folded
    * per stripe. A real implementation would replace only this object. */
  object StubDecoder {
    def decode(in: MediaIn): MediaFeatures = {
      val bytes = in.payload
      val w = bytes.length % 64 + 16
      val h = bytes.length % 48 + 16
      def stripe(k: Int): Double = {
        var acc = 0L
        var i = k
        while (i < bytes.length) { acc = acc * 31 + (bytes(i) & 0xff); i += 4 }
        Math.floorMod(acc, 10000L) / 10000.0 // floorMod: acc may be negative after overflow
      }
      MediaFeatures(in.doc_id, w, h, 4, stripe(0), stripe(1), stripe(2), stripe(3))
    }
  }

  /** M7: typed decode / feature-extract pipeline over the binary column.
    * `mapPartitions` so decoder setup happens once per partition and rows
    * stream through it in batch — the shape a real codec/model needs. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaIn] = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaIn]
    media.mapPartitions { rows =>
      val decoder = StubDecoder // per-partition init point for a real codec
      rows.map(decoder.decode)
    }.toDF()
  }

  /** M7: frame sampling — every 4th frame of each payload's decode plan,
    * exploded to one row per sampled frame with its byte offset. The
    * video-frame-extraction shape: a narrow explode whose fan-out is bounded
    * by the sampling stride, so downstream per-frame feature work
    * parallelizes by frame, not by file. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val meta = binaryMeta(spark, dir)
    meta.select(col("doc_id"), col("byte_len"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_no"))
      .withColumn("frame_offset", col("frame_no") * 100)
      .select(col("doc_id"), col("frame_no"), col("frame_offset"), col("byte_len"))
  }

  /** M7: resize planning — per payload, the downscale geometry to the
    * model's 224×224 input: aspect-preserving scale factor, the resulting
    * pre-crop dimensions, and the decoded-output byte size. The pixel work
    * belongs to the stub decoder's successor; the geometry is pure
    * arithmetic over the metadata projection (narrow map, no payload read
    * beyond what binaryMeta already projects), which is exactly the part a
    * 100 TB pipeline plans centrally before shipping batches to codec
    * executors. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    // scaled dims in INTEGER arithmetic — ceil(dim·224/min) as
    // (dim·224 + min − 1) div min. A float form (ceil(dim * rounded_scale))
    // is boundary-fragile: products land exactly on the integer in one
    // engine and epsilon above it in the other, flipping the ceil.
    binaryMeta(spark, dir).select(
      col("doc_id"), col("width"), col("height"),
      Exact.rnd(lit(224.0) / least(col("width"), col("height")), 4).as("scale"),
      expr("CAST((width * 224 + least(width, height) - 1) DIV least(width, height) AS INT)")
        .as("scaled_w"),
      expr("CAST((height * 224 + least(width, height) - 1) DIV least(width, height) AS INT)")
        .as("scaled_h"),
      lit(224 * 224 * 3).as("out_bytes"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m7_binary_meta"    -> binaryMeta,
    "m7_frame_sample"   -> frameSample,
    "m7_resize_plan"    -> resizePlan,
    "m7_decode_features" -> decodeFeatures)

  val oracles: Map[String, String] = Map(
    // sha256 of the text's UTF-8 bytes == sha256 of the encoded blob.
    "m7_binary_meta" ->
      """SELECT doc_id,
         octet_length(encode(text)) AS byte_len,
         sha256(text) AS checksum,
         octet_length(encode(text)) % 64 + 16 AS width,
         octet_length(encode(text)) % 48 + 16 AS height,
         CAST(octet_length(encode(text)) // 100 + 1 AS INTEGER) AS n_frames
         FROM documents""",
    "m7_frame_sample" ->
      """SELECT doc_id, frame_no, frame_no * 100 AS frame_offset, byte_len
         FROM (SELECT doc_id,
                 octet_length(encode(text)) AS byte_len,
                 CAST(octet_length(encode(text)) // 100 + 1 AS INTEGER) AS n_frames
               FROM documents) m,
              LATERAL unnest(range(0, CAST(n_frames AS BIGINT), 4)) AS u(frame_no)""",
    "m7_resize_plan" ->
      s"""WITH m AS (SELECT doc_id,
             CAST(octet_length(encode(text)) % 64 + 16 AS INTEGER) AS width,
             CAST(octet_length(encode(text)) % 48 + 16 AS INTEGER) AS height
           FROM documents)
          SELECT doc_id, width, height,
            ${Exact.sqlRnd("224.0 / CAST(least(width, height) AS DOUBLE)", 4)} AS scale,
            CAST((width * 224 + least(width, height) - 1) // least(width, height) AS INTEGER) AS scaled_w,
            CAST((height * 224 + least(width, height) - 1) // least(width, height) AS INTEGER) AS scaled_h,
            CAST(150528 AS INTEGER) AS out_bytes
          FROM m""",
    // The stub decoder's stripes are pure byte arithmetic (acc = acc*31 + b
    // with Java 64-bit wraparound), so DuckDB can replay them: the fold runs
    // in HUGEINT mod 2^64, then converts to the signed interpretation for
    // Java's floorMod. `unicode(text[i])` equals the payload byte because the
    // corpus is pure ASCII (verified: length == octet_length corpus-wide).
    "m7_decode_features" ->
      s"""WITH folds AS (
            SELECT doc_id, octet_length(encode(text)) AS blen,
                   ${(0 until 4).map(k => s"${stripeFoldSql(k)} AS sm$k").mkString(", ")}
            FROM documents)
          SELECT doc_id,
            CAST(blen % 64 + 16 AS INTEGER) AS width,
            CAST(blen % 48 + 16 AS INTEGER) AS height,
            CAST(4 AS INTEGER) AS n_features,
            ${(0 until 4).map(k => s"${stripeValSql(s"sm$k")} AS f$k").mkString(", ")}
          FROM folds""")

  /** DuckDB fragment: the stripe-k fold over byte positions k, k+4, …
    * (1-based SQL indices k+1, k+5, …) in HUGEINT mod 2^64 — Java long
    * overflow semantics, exactly. */
  private def stripeFoldSql(k: Int): String =
    s"""list_reduce(list_prepend(0::HUGEINT,
        list_transform(range(${k + 1}, length(text) + 1, 4), i -> unicode(text[i])::HUGEINT)),
        (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT)"""

  /** DuckDB fragment: Math.floorMod(signed(acc), 10000) / 10000.0 over a
    * mod-2^64 fold value. */
  private def stripeValSql(acc: String): String =
    s"""CAST(((CASE WHEN $acc >= 9223372036854775808::HUGEINT
         THEN $acc - 18446744073709551616::HUGEINT ELSE $acc END) % 10000
         + 10000) % 10000 AS DOUBLE) / 10000.0"""
}
