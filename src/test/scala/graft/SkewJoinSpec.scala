package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

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
