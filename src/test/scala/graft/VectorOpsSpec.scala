package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.VectorOps
import graft.functions.DotProduct

class VectorOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("every vector query returns rows") {
    VectorOps.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q40 cosines are valid and ranked descending per probe") {
    val rows = VectorOps.q40_cosine_topk(spark, sf).collect()
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val byRank = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(byRank.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("native dot_product matches the composed higher-order expression") {
    DotProduct.register(spark)
    val diff = Tables.embeddings(spark, sf)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .select(
        (DotProduct.dot_product(col("v"), col("v")) -
          expr("aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, w) -> acc + w)"))
          .as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0, "codegen'd fold must be bit-identical to composed form")
  }

  test("q42 bucket pairs share their sign bucket") {
    val bad = VectorOps.q42_lsh_neardup(spark, sf)
      .filter(col("d1") >= col("d2")).count()
    assert(bad == 0)
  }
}
