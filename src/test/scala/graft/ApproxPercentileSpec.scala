package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** q29b has no DuckDB oracle by design (quantile sketches are
  * engine-specific), so attest it here instead — the q10b pattern: per
  * group the sketch estimate must sit within the documented
  * approx_percentile accuracy envelope of the exact interpolated
  * percentile, and repeated runs must be identical (the summary is
  * deterministic for a given input set).
  *
  * Accuracy envelope: with accuracy parameter B = 1000 the target rank
  * error is ~n/B; the spec allows 2·n/B (the Greenwald-Khanna summary's
  * guarantee is on the merged-summary epsilon, and boundary/merge effects
  * make the single-pass error land slightly over n/B in practice) and
  * checks the estimate lies between the exact order statistics at ranks
  * p·n ± 2n/B.
  */
class ApproxPercentileSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("t-digest-style estimates within rank-error bounds, deterministically") {
    val approx = Relational.q29b_approx_percentiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    val li = Tables.lineitem(spark, sf)
    val groups = approx.keySet
    groups.foreach { g =>
      val qty = li.filter(col("l_returnflag") === g)
        .select(col("l_quantity")).collect().map(_.getDouble(0)).sorted
      val price = li.filter(col("l_returnflag") === g)
        .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
      def rankBounds(sortedVals: Array[Double], p: Double): (Double, Double) = {
        val n = sortedVals.length
        val err = math.max(2, 2 * n / 1000)
        val loIdx = math.max(0, math.min(n - 1, (p * n).toInt - err))
        val hiIdx = math.max(0, math.min(n - 1, (p * n).toInt + err))
        (sortedVals(loIdx), sortedVals(hiIdx))
      }
      val (qLo, qHi) = rankBounds(qty, 0.5)
      val (pLo, pHi) = rankBounds(price, 0.9)
      val (estQ, estP) = approx(g)
      assert(estQ >= qLo && estQ <= qHi,
        s"group $g median_qty estimate $estQ outside rank bounds [$qLo, $qHi]")
      assert(estP >= pLo && estP <= pHi,
        s"group $g p90_price estimate $estP outside rank bounds [$pLo, $pHi]")
    }

    val again = Relational.q29b_approx_percentiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(again == approx, "sketch estimates are not deterministic")
  }
}
