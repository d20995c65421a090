package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LshGate

/** The q42 resolution gate (round 14, VERDICT r13 #1): bits derive from
  * corpus size so candidate pairs stay ~linear in N; the SQL oracle's
  * CASE ladder is bit-identical to the Scala derivation; a forced
  * resolution produces exactly the pairs an independent all-pairs oracle
  * admits at that resolution. */
class LshGateSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("derivedBits: thresholds, monotonicity, clamps") {
    // the measured rungs (target = 32)
    assert(LshGate.derivedBits(500) == 8)     // sf0.01
    assert(LshGate.derivedBits(2000) == 8)    // sf0.1
    assert(LshGate.derivedBits(8192) == 8)    // boundary: 32·2^8 exactly
    assert(LshGate.derivedBits(8193) == 9)    // first over
    assert(LshGate.derivedBits(20000) == 10)  // sf1
    assert(LshGate.derivedBits(200000) == 13) // sf10
    assert(LshGate.derivedBits(600000) == 15) // sf30
    // monotone in n, clamped to [MinBits, MaxBits]
    val ns = Seq(1L, 100L, 10000L, 1000000L, 100000000L, Long.MaxValue / 2)
    val bs = ns.map(LshGate.derivedBits(_))
    assert(bs == bs.sorted)
    assert(bs.head == LshGate.MinBits && bs.last == LshGate.MaxBits)
    // target scales the whole ladder
    assert(LshGate.derivedBits(600000, 1024) == 10)
  }

  test("oracle CASE ladder == Scala derivation, across the whole ladder") {
    assume(!sys.env.contains("SPARK_GRAFT_CONF"),
      "ambient forced conf would turn the ladder into a literal")
    val ladder = LshGate.oracleBitsSql // Spark SQL groks the same CASE
    for (n <- Seq(1L, 500L, 2000L, 8192L, 8193L, 20000L, 199999L, 200000L,
                  600000L, 1L << 24, 1L << 30, 1L << 40)) {
      val sqlBits = spark.sql(s"SELECT $ladder FROM (SELECT CAST($n AS BIGINT) AS c)")
        .head.getInt(0)
      assert(sqlBits == LshGate.derivedBits(n),
        s"ladder diverges from derivedBits at n=$n")
    }
  }

  test("q42 at a forced resolution == independent all-pairs oracle at that resolution") {
    val d = sf // 500 vectors: the all-pairs oracle is cheap
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
      df.select(col("bucket"), col("d1"), col("d2")).collect().toSeq
        .sortBy(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    for (bits <- Seq(8, 10)) {
      spark.conf.set("graft.lsh.bits", bits.toString)
      try {
        val got = rows(SparkEntry.queries("q42_lsh_neardup")(spark, d))
        // independent oracle: ALL pairs, same-bucket ∧ cosine ≥ 0.2, from
        // a from-scratch cross join (no shared code path with q42's join)
        graft.functions.Natives.registerAll(spark)
        val v = Tables.embeddings(spark, d)
          .select(col("vec_id"),
                  expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"),
                  expr(LshGate.sparkBucketExpr(bits)).as("bucket"))
          .withColumn("norm",
            sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))))
        val a = v.select(col("bucket"), col("vec_id").as("d1"),
                         col("v").as("v1"), col("norm").as("n1"))
        val b = v.select(col("bucket").as("b2"), col("vec_id").as("d2"),
                         col("v").as("v2"), col("norm").as("n2"))
        val expect = rows(a.crossJoin(b)
          .filter(col("d1") < col("d2") && col("bucket") === col("b2"))
          .withColumn("cosine",
            graft.functions.DotProduct.dot_product(col("v1"), col("v2")) /
              (col("n1") * col("n2")))
          .filter(col("cosine") >= 0.2))
        assert(got == expect, s"bits=$bits: q42 != all-pairs oracle")
        assert(got.nonEmpty, s"bits=$bits: degenerate empty fixture")
      } finally spark.conf.unset("graft.lsh.bits")
    }
  }

  test("derived resolution is the default path and matches forcing the same bits") {
    val d = sf
    val derived = LshGate.bits(spark, d)
    assert(derived == 8, "sf0.001 must derive the historical 8 bits")
    val dflt = SparkEntry.queries("q42_lsh_neardup")(spark, d)
      .collect().toSeq.sortBy(_.toString)
    spark.conf.set("graft.lsh.bits", "8")
    try {
      val forced = SparkEntry.queries("q42_lsh_neardup")(spark, d)
        .collect().toSeq.sortBy(_.toString)
      assert(dflt == forced)
    } finally spark.conf.unset("graft.lsh.bits")
  }
}
