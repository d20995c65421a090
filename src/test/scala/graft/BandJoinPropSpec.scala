package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.rng.Seed
import org.scalacheck.{Gen, Prop}
import org.apache.spark.sql.functions._

import graft.plans.BandJoin

/** Property test: on random inputs (clustered keys, random micro-times,
  * random band widths incl. negative/zero/inverted-empty bands), the
  * custom BandJoinExec equals the built-in range-condition join exactly.
  * Deterministic seeds keep the suite reproducible. */
class BandJoinPropSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val genCase = for {
    nL <- Gen.choose(0, 120)
    nR <- Gen.choose(0, 120)
    keySpan <- Gen.choose(1, 6)                 // few keys → big key groups
    left <- Gen.listOfN(nL, Gen.zip(Gen.choose(0L, keySpan.toLong),
      Gen.choose(0L, 5000L)))                   // (key, seconds)
    right <- Gen.listOfN(nR, Gen.zip(Gen.choose(0L, keySpan.toLong),
      Gen.choose(0L, 5000L)))
    aUs <- Gen.choose(-1200L, 1200L)
    bUs <- Gen.choose(-1200L, 1200L)
  } yield (left, right, math.min(aUs, bUs) * 1000000, math.max(aUs, bUs) * 1000000)

  private def runCase(i: Int, leftOuter: Boolean): Unit = {
    val params = org.scalacheck.Gen.Parameters.default
    val (l, r, lo, hi) = genCase(params, Seed(i.toLong)).get
    val left = l.zipWithIndex
      .map { case ((k, s), id) => (k, new Timestamp(s * 1000), id.toLong) }
      .toDF("k", "t", "lid")
    val right = r.zipWithIndex
      .map { case ((k, s), id) => (k, new Timestamp(s * 1000), id.toLong) }
      .toDF("rk", "rt", "rid")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    val custom = pairs(BandJoin.bandJoin(left, right, Seq("k" -> "rk"),
      "t", "rt", lo, hi, leftOuter))
    val cond = col("k") === col("rk") &&
      col("rt") >= col("t") + expr(s"INTERVAL $lo MICROSECOND") &&
      col("rt") <= col("t") + expr(s"INTERVAL $hi MICROSECOND")
    val expected = pairs(
      left.join(right, cond, if (leftOuter) "left_outer" else "inner"))
    assert(custom == expected,
      s"case $i outer=$leftOuter (lo=$lo hi=$hi |l|=${l.size} |r|=${r.size}): " +
        s"missing=${(expected -- custom).take(5)} extra=${(custom -- expected).take(5)}")
  }

  test("BandJoinExec equals the built-in range join on 40 random cases") {
    (1 to 40).foreach(runCase(_, leftOuter = false))
  }

  test("LEFT OUTER BandJoinExec equals the built-in left join on 40 random cases") {
    (1 to 40).foreach(runCase(_, leftOuter = true))
  }
}
