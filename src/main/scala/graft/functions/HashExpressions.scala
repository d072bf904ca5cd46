package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[Md5Prefix60]] — kept outside the expression's
  * companion so generated Java can call it as a plain static-forwarded
  * method. One MessageDigest per thread, reset per value. */
object Md5Hash {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes) as a nonnegative long — numerically
    * identical to `conv(substring(md5(s), 1, 15), 16, 10)` (15 hex chars
    * = the top 7.5 digest bytes). */
  def prefix60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top8 =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    top8 >>> 4
  }
}

/** 60-bit md5-prefix hash as ONE fused codegen expression.
  *
  * The composable form — `conv(substring(md5(s), 1, 15), 16, 10)
  * .cast("long")` — materializes a 32-char hex string, substrings it, and
  * parses it through radix conversion for every value. In the dedup
  * pipelines (SURVEY §2 training-data ops) this runs once per exploded
  * shingle — billions of times at corpus scale — so the string round-trip
  * is pure overhead. This expression goes digest→long directly and stays
  * inside whole-stage codegen. The hash FAMILY is still md5 (not
  * xxhash64) so external engines can reproduce every derived signature;
  * the DuckDB oracles keep using the hex-string formulation and must
  * hash-match bit for bit. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  protected override def nullSafeEval(s: Any): Any =
    Md5Hash.prefix60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Hash.prefix60($c)")

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
}

object HashExpressions {
  /** Fused 60-bit md5-prefix of a string column. */
  def md5Prefix60(c: Column): Column =
    ColumnBridge.column(Md5Prefix60(ColumnBridge.expr(c)))
}
