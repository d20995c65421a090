package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two array<double>/array<float> columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0d, (acc,v) -> acc+v)` — allocates an intermediate array per row and
  * runs as interpreted lambda calls (higher-order functions have no
  * codegen). This expression stays inside whole-stage codegen: one fused
  * loop, no allocation — the difference between an ANN scan that keeps up
  * with the parquet reader and one that doesn't at 100 TB.
  *
  * Accumulation order is the same sequential left fold, so results are
  * bit-identical to the composed form (and to the DuckDB oracle) — including
  * on ragged inputs: a length mismatch yields NULL, exactly like
  * `aggregate(zip_with(...))` where zip_with null-pads and the sum
  * propagates the null.
  *
  * Either side may be array<float> (round 17): each element widens to
  * double BEFORE any arithmetic, and float→double widening is exact
  * (IEEE 754 value-preserving), so the result is bit-identical to casting
  * the array to array<double> first — which is exactly what the
  * `transform(embedding, CAST AS DOUBLE)` it replaces did, per row, as an
  * interpreted lambda with a fresh array allocation. Taking the raw float
  * column also halves the vector bytes every downstream exchange carries. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // nullable even over non-null inputs: ragged lengths produce NULL
  override def nullable: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product requires (array<double|float>, array<double|float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val (fl, fr) = (isFloat(left.dataType), isFloat(right.dataType))
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (fl) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (fr) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def get(arr: String, t: DataType): String =
        if (isFloat(t)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${get(a, left.dataType)} * ${get(b, right.dataType)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Register `dot_product` in the session's function registry (idempotent)
    * so it is usable from both SQL text and the Column API below. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Natives.ensure(spark, "dot_product")(exprs => DotProduct(exprs(0), exprs(1)))

  /** Column-API entry point: `dot_product(a, b)` (requires register()). */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_product", a, b)
}
