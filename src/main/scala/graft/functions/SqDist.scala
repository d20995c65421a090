package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native squared euclidean distance over two array<double> columns —
  * the sqdist twin of [[DotProduct]], and the IVF/PQ hot loop.
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0d,
  * (acc,v) -> acc+v)` (interpreted lambdas + one intermediate array
  * allocation per ROW — measured as the dominant term of the sf30 index
  * build's candidate re-scoring). Arithmetic is the identical sequential
  * left fold — s += (aᵢ−bᵢ)·(aᵢ−bᵢ) in index order — so every selection
  * made on these doubles (nearest-centroid min_by, probe ranking) is
  * BIT-IDENTICAL to the composed form and to the DuckDB oracle's
  * `list_reduce` replay; ragged lengths yield NULL exactly like the
  * null-padding zip_with.
  *
  * Either side may be array<float> (round 17, same contract as
  * [[DotProduct]]): elements widen to double before any arithmetic —
  * exact, so results match the cast-to-double composed form bit for bit. */
case class SqDist(left: Expression, right: Expression)
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
        s"sq_dist requires (array<double|float>, array<double|float>), got " +
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
        val d = xv - yv
        s += d * d
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
      val d = ctx.freshName("d")
      def get(arr: String, t: DataType): String =
        if (isFloat(t)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${get(a, left.dataType)} - ${get(b, right.dataType)};
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  /** Register `sq_dist` in the session's function registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Natives.ensure(spark, "sq_dist")(exprs => SqDist(exprs(0), exprs(1)))

  /** Column-API entry point: `sq_dist(a, b)` (requires register()). */
  def sq_dist(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("sq_dist", a, b)
}
