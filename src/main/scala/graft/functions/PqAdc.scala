package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native asymmetric-distance (ADC) accumulator for PQ search:
  * `pq_adc(lut, code, kc)` = Σ_m lut[m·kc + code[m]] — the 8-lookup
  * fixed-order fold the composed form
  * `aggregate(sequence(0, M−1), 0.0D, (acc, m) -> acc + element_at(...))`
  * computes interpreted. Higher-order lambdas have no codegen; at sf10 the
  * interpreted fold over |codes|×|probes| rows was the whole cost of the
  * q66 scan (~10 s). Identical accumulation order (acc starts at 0.0,
  * adds m = 0..M−1) ⇒ bit-identical doubles; the DuckDB oracle is
  * unchanged. */
case class PqAdc(left: Expression, right: Expression, kc: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) if kc > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<double>, array<int>) with kc > 0, got $other")
    }

  override def nullSafeEval(lut: Any, code: Any): Any =
    PqAdc.adc(lut.asInstanceOf[ArrayData], code.asInstanceOf[ArrayData], kc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) =>
      s"graft.functions.PqAdc.adc($l, $c, $kc)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}

object PqAdc {
  def adc(lut: ArrayData, code: ArrayData, kc: Int): Double = {
    var acc = 0.0
    var m = 0
    val n = code.numElements()
    while (m < n) {
      acc += lut.getDouble(m * kc + code.getInt(m))
      m += 1
    }
    acc
  }

  /** Register `pq_adc(lut, code, kc)` (kc a foldable int literal). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Natives.ensure(spark, "pq_adc")(exprs =>
      PqAdc(exprs.head, exprs(1), exprs(2).eval(null).asInstanceOf[Int]))

  def pq_adc(lut: Column, code: Column, kc: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "pq_adc", lut, code, org.apache.spark.sql.functions.lit(kc))
}
