package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LshGate
import graft.functions.DotProduct.dot_product

/** Measurement main for the q42 LSH resolution gate (round 14, VERDICT
  * r13 #1): at a given SF, what the N-derived resolution costs and buys
  * against the historical fixed 8 bits.
  *
  * Per rung it reports, for BOTH resolutions (derived and forced-8):
  *  - candidate pairs (Σ n_b·(n_b−1)/2 over the bucket histogram — the
  *    join's exact pre-filter cardinality, the term the gate bounds)
  *  - q42 output rows and wall seconds
  *  - probe-anchored sampled recall at cosine ≥ 0.2 and ≥ 0.4: over the
  *    probe set (vec_id < 200) the exact partner set is computed by a
  *    broadcast scan (200·N dot products), and a partner counts as
  *    CAUGHT when it shares the probe's bucket. Honest single-band
  *    numbers — recall-critical dedup rides the multi-band families
  *    (LshGate scaladoc).
  *
  * The claim under test: candidate pairs per unit data hold ~flat across
  * sf0.1 → sf30 under the derived resolution (bits = smallest b with
  * N ≤ target·2^b ⇒ E[pairs] ≈ N·target/2), while fixed-8 grows ~N²/512.
  * Prints one JSON line per resolution; EXPLAIN_r14 carries the table.
  */
object LshLadder {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Natives.registerAll(spark)

    val n = Tables.embeddingsCount(spark, sfDir)
    val derived = LshGate.derivedBits(n, LshGate.targetRows(spark))

    def vecs(bits: Int): DataFrame = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
              expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"),
              expr(LshGate.sparkBucketExpr(bits)).as("bucket"))
      .withColumn("norm", sqrt(dot_product(col("v"), col("v"))))

    def report(bits: Int, tag: String): Unit = {
      spark.conf.set("graft.lsh.bits", bits.toString)
      try {
        val cand = vecs(bits).groupBy("bucket").count()
          .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
          .head.getLong(0)
        val q42 = SparkEntry.queries("q42_lsh_neardup")
        val (rows, wall) = timed { q42(spark, sfDir).count() }
        // probe-anchored sampled recall, both thresholds from one pass
        val corpus = vecs(bits)
        val probes = vecs(bits).filter(col("vec_id") < 200)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
                  col("norm").as("qn"), col("bucket").as("qb"))
        val r = corpus.join(broadcast(probes), col("vec_id") =!= col("q_id"))
          .withColumn("cos",
            dot_product(col("qv"), col("v")) / (col("qn") * col("norm")))
          .filter(col("cos") >= 0.2)
          .agg(
            count(lit(1)).as("ex02"),
            sum(when(col("bucket") === col("qb"), 1L).otherwise(0L)).as("c02"),
            sum(when(col("cos") >= 0.4, 1L).otherwise(0L)).as("ex04"),
            sum(when(col("cos") >= 0.4 && col("bucket") === col("qb"), 1L)
              .otherwise(0L)).as("c04"))
          .head
        def ratio(c: Long, e: Long) =
          if (e == 0) 1.0 else math.rint(10000.0 * c / e) / 10000
        println(
          s"""{"sf_dir":"$sfDir","mode":"$tag","n":$n,"bits":$bits,""" +
          s""""cand_pairs":$cand,"cand_per_row":${math.rint(100.0 * cand / n) / 100},""" +
          s""""out_rows":$rows,"wall_s":${math.rint(wall * 100) / 100},""" +
          s""""recall02":${ratio(r.getLong(1), r.getLong(0))},""" +
          s""""recall04":${ratio(r.getLong(3), r.getLong(2))}}""")
      } finally spark.conf.unset("graft.lsh.bits")
    }

    report(derived, "derived")
    if (derived != 8) report(8, "fixed8")
    spark.stop()
  }
}
