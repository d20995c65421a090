package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: EXACT per-document word n-gram statistics
  * `struct(n_grams, n_distinct, max_count)` in one compiled pass.
  *
  * This is the row-local engine behind q59's Gopher-style repetition
  * filters. The first shape (explode n-grams → groupBy (doc_id, gram) →
  * per-doc rollup → join the 2-gram and 3-gram branches) was semantically
  * right but structurally wrong at scale: every statistic here is a
  * PER-DOCUMENT property, yet that plan paid two full corpus scans, two
  * corpus-sized gram exchanges (~26 M rows at sf10) and a doc_id join to
  * compute what a single pass over each row can produce. Measured at sf10
  * the pipeline form took 14.2 s; this expression makes q59 row-local
  * like the PII scrub — zero shuffles besides the presentation sort, and
  * on a 100 TB corpus it maps partition-by-partition with no state.
  *
  * Exactness: counts come from a java.util.HashMap keyed on the gram
  * STRING (equality-checked — no hash-collision exposure), identical to
  * the grouped-count semantics of the pipeline form and of the DuckDB
  * oracle; the oracle SQL is unchanged. Token split is the repo-standard
  * single-space split with empties preserved (split(_, " ", -1)), same
  * as `split(text, ' ')` in Spark SQL and DuckDB's string_split.
  *
  * Documents with fewer than n tokens yield (0, 0, 0) — callers express
  * the pipeline's inner-join drop rule as `filter(s.n_grams >= 1)`.
  */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_count", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"gram_stats requires a string input, got ${child.dataType.simpleString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"gram_stats requires n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    GramStats.stats(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramStats.stats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gram_stats"
}

object GramStats {
  /** (total, distinct, max multiplicity) of the word n-grams of `text`. */
  def stats(text: UTF8String, n: Int): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val g = toks.length - n + 1
    if (g <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    // capacity for the no-repeat case (g entries) without rehash
    val counts = new java.util.HashMap[String, Array[Int]](g * 2)
    val sb = new java.lang.StringBuilder(16 * n)
    var max = 0
    var i = 0
    while (i < g) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val key = sb.toString
      var c = counts.get(key)
      if (c == null) { c = new Array[Int](1); counts.put(key, c) }
      c(0) += 1
      if (c(0) > max) max = c(0)
      i += 1
    }
    new GenericInternalRow(
      Array[Any](g.toLong, counts.size.toLong, max.toLong))
  }

  /** Register `gram_stats(str, n)` (n a foldable int literal). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Natives.ensure(spark, "gram_stats")(exprs =>
      GramStats(exprs.head,
        exprs(1).eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"gram_stats: n must be a foldable int literal, got $other")
        }))

  /** Column-API entry point (requires register()). */
  def gram_stats(c: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "gram_stats", c, org.apache.spark.sql.functions.lit(n))
}
