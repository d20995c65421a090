package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a slice of the md5 hex digest of a string,
  * decoded as an unsigned BIGINT — semantically identical to
  * `CAST(conv(substring(md5(x), start+1, n), 16, 10) AS BIGINT)` for
  * n <= 15 nibbles (fits a long without overflow), but evaluated in one
  * codegen'd call with no intermediate hex string, no substring copy and
  * no string-to-long radix parse.
  *
  * Why it exists: the dedup/sampling operators (MinHash q35, SimHash q36,
  * hash-membership sampling q56/q57/q38) are md5-bound — the digest is the
  * portability contract with the DuckDB oracle, so the HASH cannot change,
  * but the built-in composition md5→hex-encode→substring→conv allocates
  * three strings per value and parses hex back to binary that the digest
  * already produced. This expression keeps the digest and deletes the
  * round-trip: digest bytes → nibble slice → long. Values are verified
  * bit-equal to the composed form (Md5LongSpec) so every oracle stays
  * hash-identical.
  *
  * `startNibble` is 0-based over the 32-nibble (128-bit) hex digest;
  * `numNibbles` <= 15 keeps the value strictly inside a signed long.
  */
case class Md5Long(child: Expression, startNibble: Int, numNibbles: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"md5_long requires a string input, got ${child.dataType.simpleString}")
    else if (startNibble < 0 || numNibbles <= 0 || startNibble + numNibbles > 32)
      TypeCheckResult.TypeCheckFailure(
        s"md5_long slice [$startNibble, +$numNibbles) outside the 32-nibble digest")
    else if (numNibbles > 15)
      TypeCheckResult.TypeCheckFailure(
        s"md5_long slice of $numNibbles nibbles overflows a signed long (max 15)")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    Md5Long.hash(input.asInstanceOf[UTF8String].getBytes, startNibble, numNibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Long.hash($c.getBytes(), $startNibble, $numNibbles)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Long {
  // MessageDigest is stateful — one instance per executor thread. reset()
  // is implicit in digest(); getInstance per row (what the built-in md5
  // does via commons-codec) costs a provider lookup + allocation per value.
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Nibbles [start, start+n) of md5(bytes), big-endian, as a long.
    * Nibble i is the i-th hex character of the standard digest rendering:
    * high half of byte i/2 when i is even, low half when odd. */
  def hash(bytes: Array[Byte], start: Int, n: Int): Long = {
    val dig = md.get().digest(bytes)
    var v = 0L
    var i = start
    val end = start + n
    while (i < end) {
      val b = dig(i >> 1)
      val nib = if ((i & 1) == 0) (b >> 4) & 0xF else b & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  /** Register `md5_long(str, start, n)` in the session function registry
    * (idempotent) — start/n must be foldable int literals. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Natives.ensure(spark, "md5_long") { exprs =>
      def lit(e: Expression): Int = e.eval(null) match {
        case i: Int => i
        case other  => throw new IllegalArgumentException(
          s"md5_long start/n must be integer literals, got $other")
      }
      Md5Long(exprs.head, lit(exprs(1)), lit(exprs(2)))
    }

  /** Column-API entry point (requires register()). */
  def md5_long(c: Column, start: Int, n: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "md5_long", c,
      org.apache.spark.sql.functions.lit(start),
      org.apache.spark.sql.functions.lit(n))
}
