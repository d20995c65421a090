package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sign-LSH code over an `array<float>` embedding: bit i of the
  * result is set iff `arr[off + i] > 0`, for i in [0, width) — the
  * random-hyperplane code every LSH family member keys on (q41's
  * histogram, q42's buckets and suffix extensions, q78's band codes, the
  * persisted census).
  *
  * Replaces `aggregate(sequence(off, off+width-1), 0, (acc, i) -> acc +
  * CASE WHEN element_at(embedding, i+1) > 0 THEN shiftleft(1, i-off)
  * ELSE 0 END)` — higher-order functions run INTERPRETED per row (one
  * lambda invocation per dimension plus a sequence allocation), and the
  * code computation is the LSH scans' per-row hot loop. Semantics are
  * bit-identical to the composed form:
  *  - dims are 0-based (`element_at`'s 1-based index i+1 == getFloat(i));
  *  - an index past the array's end contributes a 0 bit (the composed
  *    form's `element_at` returns NULL there, NULL > 0 is NULL, CASE
  *    falls to ELSE 0) — never reachable on the fixed-64-dim corpus,
  *    matched anyway;
  *  - NaN > 0 is TRUE under Spark SQL's ordering (NaN sorts greatest),
  *    so the native tests `isNaN || > 0` rather than Java's plain `>`
  *    (which would read NaN as false) — also unreachable on real data,
  *    also matched.
  * `off`/`width` are ordinary child expressions (the overflow split's
  * extension width is a per-row COLUMN), evaluated as ints; the result is
  * LONG (callers cast base codes to INT where the historical schema says
  * so — a width ≤ 24 always fits). DuckDB oracles keep replaying the
  * composed `list_reduce` form — integer-exact, so the hash gate holds
  * across the swap. */
case class SignCode(arr: Expression, off: Expression, width: Expression)
    extends TernaryExpression {

  override def first: Expression = arr
  override def second: Expression = off
  override def third: Expression = width

  override def dataType: DataType = LongType
  override def nullable: Boolean =
    arr.nullable || off.nullable || width.nullable

  // array<double> joined the accepted input types in round 17: q79's
  // pre-filter codes sign the assignments' DOUBLE vectors (the cast of
  // the same embedding — identical signs, so the code is the same bits)
  private def isDouble: Boolean = arr.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (arr.dataType, off.dataType, width.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"sign_code requires (array<float|double>, int, int), got " +
            s"(${arr.dataType.simpleString}, ${off.dataType.simpleString}, " +
            s"${width.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, o: Any, w: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val base = o.asInstanceOf[Int]
    val wd = w.asInstanceOf[Int]
    val n = x.numElements()
    val dbl = isDouble
    var s = 0L
    var i = 0
    while (i < wd) {
      val idx = base + i
      if (idx >= 0 && idx < n && !x.isNullAt(idx)) {
        if (dbl) {
          val d = x.getDouble(idx)
          if (java.lang.Double.isNaN(d) || d > 0d) s |= 1L << i
        } else {
          val f = x.getFloat(idx)
          if (java.lang.Float.isNaN(f) || f > 0f) s |= 1L << i
        }
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, o, w) => {
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val f = ctx.freshName("f")
      val (jt, get, box) =
        if (isDouble) ("double", "getDouble", "Double") else ("float", "getFloat", "Float")
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |for (int $i = 0; $i < $w; $i++) {
         |  int $idx = $o + $i;
         |  if ($idx >= 0 && $idx < $n && !$a.isNullAt($idx)) {
         |    $jt $f = $a.$get($idx);
         |    if ($box.isNaN($f) || $f > 0) $s |= 1L << $i;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(arr = newFirst, off = newSecond, width = newThird)
}

object SignCode {
  /** Register `sign_code` in the session's function registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Natives.ensure(spark, "sign_code")(exprs =>
      SignCode(exprs(0), exprs(1), exprs(2)))

  /** Column-API entry point: `sign_code(arr, off, width)` (requires
    * register()). */
  def sign_code(arr: Column, off: Column, width: Column): Column =
    org.apache.spark.sql.functions.call_function("sign_code", arr, off, width)
}
