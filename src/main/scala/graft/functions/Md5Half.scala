package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 32-bit md5 half-words of a string — the same values as
  * `conv(substring(md5(s), 1, 8), 16, 10)` (hi) and
  * `conv(substring(md5(s), 9, 8), 16, 10)` (lo), i.e. DuckDB's
  * `('0x' || substring(md5(s), 1, 8))::BIGINT`, computed without the
  * intermediate hex string: digest bytes 0-3 (hi) / 4-7 (lo) big-endian as a
  * non-negative long. The hex formulation allocates a 32-char string and
  * re-parses it per call — per-shingle on the SimHash signature path that is
  * the hot loop; this is one digest (thread-reused MessageDigest, same as
  * Fold60) and four byte shifts. FunctionsSpec asserts bit-equality against
  * the hex formulation, and the m6_simhash_pairs oracle still hash-matches
  * because the VALUES are unchanged.
  */
case class Md5Half(child: Expression, hi: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = if (hi) "graft_md5_hi32" else "graft_md5_lo32"

  override def nullSafeEval(s: Any): Any =
    Md5Half.half(s.asInstanceOf[UTF8String], hi)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Half.half($c, $hi)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Half {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Digest bytes 0-3 (hi) or 4-7 (lo) of md5(utf8 bytes), big-endian, as a
    * non-negative long in [0, 2^32). */
  def half(s: UTF8String, hi: Boolean): Long = {
    val off = if (hi) 0 else 4
    val digest = digests.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var acc = 0L
    var i = off
    while (i < off + 4) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc
  }

  /** First 8 digest bytes big-endian as one (sign-wrapping) long — both
    * half-words from a SINGLE digest. Callers that need hi and lo together
    * (the SimHash signature build) take this and split with
    * `shiftrightunsigned(x, 32)` / `x & 0xFFFFFFFF` — codegen'd bit ops —
    * instead of paying two digests through the hi32/lo32 pair. */
  def long64(s: UTF8String): Long = {
    val digest = digests.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc
  }
}

/** The single-digest companion of Md5Half: all 64 leading md5 bits in one
  * long (bit 63 may set — internal use only; the oracle-facing surfaces stay
  * on the sign-safe halves/fold). */
case class Md5Long64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_long64"

  override def nullSafeEval(s: Any): Any =
    Md5Half.long64(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Half.long64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
