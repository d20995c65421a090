package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.expressions.Window

import graft.functions.TopKByScore.top_k_by_score

/** The bounded top-k Aggregator that replaced the rank-window in the
  * vector-search queries (round 6): pins equivalence with the window form
  * it replaced — survivors AND their order — on seeded random data with
  * deliberate score ties, plus the small-group and NaN contracts. */
class TopKByScoreSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** posexplode the aggregator output into (grp, rnk, id, score) rows. */
  private def viaAggregator(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("grp")
      .agg(top_k_by_score(k)(col("score"), col("id"), col("tag")).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("grp"), (col("pos") + 1).cast(IntegerType).as("rnk"),
              col("t._2").as("id"), col("t._1").as("score"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rnk", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("id"))))
      .filter(col("rnk") <= k)
      .select(col("grp"), col("rnk"), col("id"), col("score"))

  test("equals the row_number window form on random data with ties") {
    val rnd = new Random(42)
    // 40 groups x 50 rows; scores drawn from 10 buckets so ties are common
    val rows = for (g <- 1 to 40; i <- 1 to 50)
      yield (g.toLong, rnd.nextInt(10) / 10.0, g * 1000L + i, rnd.nextInt(5))
    val df = rows.toDF("grp", "score", "id", "tag").repartition(7)
    val a = viaAggregator(df, 5).collect().map(_.toSeq).toSet
    val w = viaWindow(df, 5).collect().map(_.toSeq).toSet
    assert(a == w, s"aggregator vs window diverge: ${(a -- w) ++ (w -- a)}")
  }

  test("groups smaller than k emit all rows, ranked") {
    val df = Seq((1L, 0.9, 10L, 0), (1L, 0.8, 11L, 0), (2L, 0.5, 20L, 0))
      .toDF("grp", "score", "id", "tag")
    val a = viaAggregator(df, 5).collect().map(_.toSeq).toSet
    assert(a == viaWindow(df, 5).collect().map(_.toSeq).toSet)
    assert(a.size == 3)
  }

  test("NaN and -0.0 rank exactly as the window form (total IEEE order)") {
    // Spark's sort ranks NaN above every double and -0.0 below 0.0; the
    // aggregator's Double.compare comparator must agree so the two forms
    // never diverge. (A primitive `>` comparator is not total on NaN and
    // made survivors depend on insertion order — this test caught it.)
    val df = Seq(
      (1L, 0.5, 10L, 0), (1L, Double.NaN, 11L, 0), (1L, 0.7, 12L, 0),
      (2L, -0.0, 20L, 0), (2L, 0.0, 21L, 0), (2L, -1.0, 22L, 0)
    ).toDF("grp", "score", "id", "tag")
    // NaN != NaN under Seq equality — compare scores via their bit pattern
    def keyed(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
                 java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val a = keyed(viaAggregator(df, 2))
    val w = keyed(viaWindow(df, 2))
    assert(a == w, s"diverge: ${(a -- w) ++ (w -- a)}")
    // and the NaN row ranks first, as the window form does
    val g1 = viaAggregator(df, 2).filter(col("grp") === 1)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(g1 == Set((1, 11L), (2, 12L)), s"got $g1")
  }
}
