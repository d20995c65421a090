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

  test("asofJoin (matchLatest) picks exactly the latest prior right row, 25 random cases") {
    val params = org.scalacheck.Gen.Parameters.default
    (1 to 25).foreach { i =>
      val (l, r, _, _) = genCase(params, Seed(1000L + i)).get
      // dedup right per (key, time): as-of ties are documented-arbitrary
      val rDedup = r.distinct
      val left = l.zipWithIndex
        .map { case ((k, s), id) => (k, new Timestamp(s * 1000), id.toLong) }
        .toDF("k", "t", "lid")
      val right = rDedup.zipWithIndex
        .map { case ((k, s), id) => (k, new Timestamp(s * 1000), id.toLong) }
        .toDF("rk", "rt", "rid")
      val custom = BandJoin.asofJoin(left, right, Seq("k" -> "rk"),
          "t", "rt", leftOuter = true)
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
      // reference: max right time <= left time per (left row, key)
      val byKey = rDedup.zipWithIndex.groupBy(_._1._1)
      val expected = l.zipWithIndex.map { case ((k, s), lid) =>
        val prior = byKey.getOrElse(k, Nil).filter(_._1._2 <= s)
        if (prior.isEmpty) (lid.toLong, -1L)
        else {
          val best = prior.maxBy(p => (p._1._2, p._2))._2
          // ties at equal max time: any of the tied rids is acceptable
          (lid.toLong, best.toLong)
        }
      }.toSet
      val tiedOk = custom.map { case (lid, rid) =>
        val (k, s) = l(lid.toInt)
        val prior = byKey.getOrElse(k, Nil).filter(_._1._2 <= s)
        if (prior.isEmpty) (lid, -1L)
        else {
          val maxT = prior.map(_._1._2).max
          if (rid >= 0 && prior.exists(p => p._2.toLong == rid && p._1._2 == maxT))
            (lid, rid) // custom picked one of the max-time rows: accept
          else (lid, -2L)
        }
      }
      assert(!tiedOk.exists(_._2 == -2L) && custom.map(_._1) == expected.map(_._1),
        s"case $i: as-of mismatch")
      assert(custom.size == l.size, s"case $i: not exactly one row per left")
    }
  }
}
