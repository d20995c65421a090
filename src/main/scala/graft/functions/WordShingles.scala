package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT word 3-gram shingles of a
  * space-joined text, in one compiled pass.
  *
  * Semantically identical to the composed form used through round 6
  * (TextOps.scala:129-136 history):
  *
  * {{{
  *   CASE WHEN size(split(text,' ')) >= 3
  *     THEN array_distinct(transform(sequence(1, n-2),
  *            i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
  *     ELSE array() END
  * }}}
  *
  * but without its interpreted-execution tax: `transform`'s lambda has no
  * codegen (each of the ~52 shingles per document pays an interpreted
  * expression-tree walk: sequence materialization, three element_at calls,
  * a varargs concat_ws), and `array_distinct` re-hashes the finished
  * array. Measured at sf0.1 this chain is ~8 CPU-seconds per dedup query —
  * the single largest CPU sink in the suite (StageTime, round 7). This
  * expression does one split, one StringBuilder pass per shingle, and one
  * LinkedHashSet for dedup. Same token split semantics (single-space
  * regex, empty tokens preserved — split(_, " ", -1)), same shingle
  * strings, same set per document; only first-occurrence ORDER can differ
  * from the composed form, and every consumer treats the output as a set
  * (explode → aggregate by shingle). Oracle SQL (DuckDB string_split /
  * list_transform) is unchanged and stays hash-identical.
  */
case class WordShingles(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.shingle($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Distinct 3-gram shingles of a single-space-tokenized text. */
  def shingle(text: UTF8String): ArrayData = {
    // Single-space split, trailing empties preserved — identical token
    // stream to split(text, ' ') (regex " ") in Spark and DuckDB's
    // string_split. Plain String ops: documents are short relative to the
    // per-shingle work, and the JIT compiles this loop tight.
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder(48)
    var i = 0
    val end = toks.length - 2
    while (i < end) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
        .append(toks(i + 2))
      seen += sb.toString
      i += 1
    }
    val out = new Array[Any](seen.size)
    var j = 0
    seen.foreach { s => out(j) = UTF8String.fromString(s); j += 1 }
    new GenericArrayData(out)
  }

  /** Register `word_shingles(str)` in the session function registry
    * (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Natives.ensure(spark, "word_shingles")(exprs => WordShingles(exprs.head))

  /** Column-API entry point (requires register()). */
  def word_shingles(c: Column): Column =
    org.apache.spark.sql.functions.call_function("word_shingles", c)
}
