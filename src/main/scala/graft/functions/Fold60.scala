package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd portable 60-bit md5 fold of a string — the same value as
  * `conv(substring(md5(s), 1, 15), 16, 10)` (and DuckDB's
  * `('0x' || substring(md5(s), 1, 15))::BIGINT`), computed without the
  * intermediate hex string: the first 8 digest bytes big-endian, shifted
  * right 4 (dropping hex char 16 keeps exactly chars 1-15 = the top 60
  * bits). The hex formulation allocates a 32-char string, substrings it and
  * re-parses it per call — per-shingle on the MinHash/decontamination paths
  * that is the hot loop; this expression is one digest and a shift, with
  * the MessageDigest instance reused per thread instead of re-instantiated
  * per value (commons-codec's md5Hex behavior inside Spark's Md5).
  *
  * Exact.fold60 routes through this expression; FunctionsSpec asserts
  * bit-equality against the hex formulation, and every md5-fold oracle
  * (minhash, simhash chunks aside, decontamination, data split) still
  * hash-matches because the VALUE is unchanged.
  */
case class Fold60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fold60"

  override def nullSafeEval(s: Any): Any =
    Fold60.fold(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fold60.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Fold60 {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes), as a non-negative long. */
  def fold(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    acc >>> 4
  }
}
