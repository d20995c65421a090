package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.plans.BandJoin

class SkewJoinSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
    val part = Tables.part(spark, sf).select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, Seq("l_partkey"))
    val salted = SkewJoin.saltedJoin(li, part, "l_partkey", buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  // ---- salting × the custom band join (VERDICT r9 #7) ----------------
  // BandJoinExec clusters both children on the keys, so a hot key lands
  // one whole co-partition on one task exactly like an equi-SMJ; these
  // specs demonstrate the scaladoc claim that the SMJ remedies compose.

  /** 2,000-row hot key (k=1) + a 20-key tail; right side has one row per
    * 5 s per key. Timestamps are LongType micros (bandJoin accepts both).
    * Right times are unique per key so matchLatest is tie-free. */
  private def skewedPair = {
    import spark.implicits._
    val hotLeft = (0 until 2000).map(i => (1L, i * 1000000L, s"h$i"))
    val tailLeft = for (k <- 2L to 21L; i <- 0 until 10)
      yield (k, i * 1000000L, s"t$k-$i")
    val left = (hotLeft ++ tailLeft).toDF("k", "t", "tag")
    val right = (for (k <- 1L to 22L; j <- 0 until 400)
      yield (k, j * 5000000L, s"r$k-$j")).toDF("rk", "rt", "rtag")
    (left, right)
  }

  test("salted band join is row-identical to the unsalted custom operator (inner, left outer, as-of)") {
    val (left, right) = skewedPair
    val keys = Seq("k" -> "rk")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.select("tag", "rtag").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).sorted.toSeq

    val lo = -10000000L; val up = 0L
    val plainInner = BandJoin.bandJoin(left, right, keys, "t", "rt", lo, up)
    val saltInner = SkewJoin.saltedBandJoin(left, right, keys, "t", "rt", lo, up)
    assert(sorted(saltInner) == sorted(plainInner))

    val plainOuter = BandJoin.bandJoin(left, right, keys, "t", "rt", lo, up,
      leftOuter = true)
    val saltOuter = SkewJoin.saltedBandJoin(left, right, keys, "t", "rt", lo, up,
      leftOuter = true)
    assert(sorted(saltOuter) == sorted(plainOuter))

    val plainAsof = BandJoin.asofJoin(left, right, keys, "t", "rt",
      leftOuter = true)
    val saltAsof = SkewJoin.saltedBandJoin(left, right, keys, "t", "rt",
      lowerUs = -10000L * 365 * 24 * 3600 * 1000000L, upperUs = 0L,
      leftOuter = true, matchLatest = true)
    assert(sorted(saltAsof) == sorted(plainAsof))
  }

  test("salting disperses the hot band-join key across partitions; plan keeps BandJoinExec") {
    val (left, right) = skewedPair
    val keys = Seq("k" -> "rk")
    def hotPartitions(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("k") === 1L)
        .select(spark_partition_id().as("p")).distinct().count()

    // AQE's partition coalescing folds this small fixture into one
    // partition either way, hiding exactly the thing being measured (at
    // real scale the hot co-partition is far above the coalesce target,
    // so dispersion is what matters); disable it for the measurement.
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val plain = BandJoin.bandJoin(left, right, keys, "t", "rt", -10000000L, 0L)
      val salted = SkewJoin.saltedBandJoin(left, right, keys, "t", "rt",
        -10000000L, 0L)
      // unsalted: the whole hot key is one co-partition = one task
      assert(hotPartitions(plain) == 1L)
      // salted: hot key spread over multiple (k, salt) co-partitions
      assert(hotPartitions(salted) > 1L,
        "salted hot key should occupy >1 partition")
      // the composition still plans the custom operator
      assert(salted.queryExecution.executedPlan.toString.contains("BandJoin"),
        "salted band join should still plan BandJoinExec")
    } finally spark.conf.set(key, saved)
  }

  test("salt spreads a hot key across buckets") {
    // all-rows-one-key worst case: salt must distribute over >1 bucket
    val hot = Tables.lineitem(spark, sf)
      .withColumn("k", lit(1)).select("k", "l_orderkey", "l_quantity")
    val saltDist = hot.withColumn("__salt",
        pmod(xxhash64(hot.columns.map(col): _*), lit(8)).cast("int"))
      .groupBy("__salt").count()
    assert(saltDist.count() == 8, "expected all 8 salt buckets populated")
  }
}
