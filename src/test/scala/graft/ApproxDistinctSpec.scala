package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** q10b has no DuckDB oracle by design (HLL++ sketches are
  * engine-specific), so attest it here instead: per group, the estimate
  * must sit within the documented HLL++ error envelope of the exact
  * count, and repeated runs must be bit-identical (the sketch is
  * deterministic for a given input set). */
class ApproxDistinctSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("HLL estimate within error bounds of the exact count, deterministically") {
    val approx = Relational.q10b_approx_distinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val est = approx(k)
      // default rsd = 5%; allow 3 sigma plus small-count slack
      val tol = math.max(3, (n * 0.15).toLong)
      assert(math.abs(est - n) <= tol,
        s"group $k: estimate $est vs exact $n (tol $tol)")
    }
    val again = Relational.q10b_approx_distinct(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == approx, "sketch estimates are not deterministic")
  }
}
