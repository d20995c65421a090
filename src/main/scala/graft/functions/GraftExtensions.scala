package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers graft's native functions at
  * session build time —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * // or: SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * This is the deployment-grade alternative to the per-session
  * [[DotProduct.register]] convenience used by the query library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("md5_long"),
      new ExpressionInfo(classOf[Md5Long].getName, "md5_long"),
      (exprs: Seq[Expression]) => Md5Long(
        exprs.head,
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("sorted_pairs"),
      new ExpressionInfo(classOf[SortedPairs].getName, "sorted_pairs"),
      (exprs: Seq[Expression]) => SortedPairs(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("bounded_doc_set"),
      new ExpressionInfo(classOf[BoundedDocSetAgg].getName, "bounded_doc_set"),
      (exprs: Seq[Expression]) => BoundedDocSetAgg(
        exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]).toAggregateExpression()))
  }
}
