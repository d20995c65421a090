package graft

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LshCensus, LshGate}

/** The persisted LSH census (round 16, VERDICT r15 #2): one build per
  * (corpus, resolution), O(delta) ingest refresh, conservation-guarded —
  * and every staleness/divergence state degrades to a rebuild, never to a
  * wrong extension width. */
class LshCensusSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private val root = "/root/repo/target/test_lshcensus"

  /** A scratch corpus dir (embeddings only) — the census artifact is
    * keyed by corpus path, so each test gets its own. */
  private def freshCorpus(tag: String, df: DataFrame): String = {
    val d = s"$root/$tag"
    graft.Fs.deleteTree(Paths.get(d))
    df.write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    Tables.clearCaches()
    LshCensus.invalidate()
    d
  }

  private def emb = Tables.embeddings(spark, sf)
  private def base = emb.filter(col("vec_id") % 10 =!= 0)
  private def delta = emb.filter(col("vec_id") % 10 === 0)

  /** Independent recompute of the histogram — the pre-r16 inline census. */
  private def recomputed(d: String, bits: Int): Map[Int, Long] =
    spark.read.parquet(s"$d/embeddings.parquet")
      .select(expr(LshGate.sparkBucketExpr(bits)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  private def persisted(loc: String): Map[Int, Long] =
    LshCensus.histogram(spark, loc)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("ensure builds once: histogram == inline recompute, second ensure is metadata") {
    val d = freshCorpus("build", base)
    val loc = LshCensus.ensure(spark, d, 8)
    assert(persisted(loc) == recomputed(d, 8))
    assert(persisted(loc).values.sum == base.count())
    // second ensure must not rewrite the artifact
    val mtime = new java.io.File(s"$loc/hist.parquet").lastModified
    assert(LshCensus.ensure(spark, d, 8) == loc)
    assert(new java.io.File(s"$loc/hist.parquet").lastModified == mtime)
    // a different resolution is its own artifact, never a collision
    val loc10 = LshCensus.ensure(spark, d, 10)
    assert(loc10 != loc)
    assert(persisted(loc10) == recomputed(d, 10))
  }

  test("a corpus change WITHOUT a census append rebuilds on the next ensure") {
    val d = freshCorpus("stale", base)
    val loc = LshCensus.ensure(spark, d, 8)
    delta.write.mode("append").parquet(s"$d/embeddings.parquet")
    Tables.clearCaches()
    LshCensus.invalidate()
    assert(LshCensus.ensure(spark, d, 8) == loc)
    assert(persisted(loc) == recomputed(d, 8),
      "stale stamp must rebuild to the full corpus's histogram")
    assert(persisted(loc).values.sum == base.count() + delta.count())
  }

  test("a doctored artifact fails conservation and rebuilds loudly") {
    val d = freshCorpus("doctor", base)
    val loc = LshCensus.ensure(spark, d, 8)
    // halve every bucket's count in place (stamp unchanged — the state a
    // corrupted or foreign write leaves)
    val halved = LshCensus.histogram(spark, loc)
      .select(col("bucket"), (col("n") / 2).cast("long").as("n"))
      .collect().toSeq
    import spark.implicits._
    spark.createDataset(halved.map(r => (r.getInt(0), r.getLong(1))))
      .toDF("bucket", "n").coalesce(1)
      .write.mode("overwrite").parquet(s"$loc/hist.parquet")
    LshCensus.invalidate() // a fresh session's first ensure
    LshCensus.ensure(spark, d, 8)
    assert(persisted(loc) == recomputed(d, 8),
      "conservation mismatch must rebuild, never serve a wrong census")
  }

  test("append: O(delta) refresh == full recompute; a diverged delta rebuilds") {
    val d = freshCorpus("append", base)
    val loc = LshCensus.ensure(spark, d, 8)
    // day 1: corpus ingests the delta, census appends it
    delta.write.mode("append").parquet(s"$d/embeddings.parquet")
    LshCensus.append(spark, d, 8, delta)
    assert(persisted(loc) == recomputed(d, 8),
      "refreshed census must equal the from-scratch recompute")
    // the refreshed artifact is CURRENT: ensure validates without rebuild
    val mtime = new java.io.File(s"$loc/hist.parquet").lastModified
    LshCensus.invalidate()
    assert(LshCensus.ensure(spark, d, 8) == loc)
    assert(new java.io.File(s"$loc/hist.parquet").lastModified == mtime)
    // day 2: two batches land in the corpus but the caller hands only one
    // — the conservation guard must rebuild from source, loudly
    val d2a = emb.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    val d2b = emb.filter(col("vec_id") % 10 === 1)
      .withColumn("vec_id", col("vec_id") + lit(2000000L))
    d2a.write.mode("append").parquet(s"$d/embeddings.parquet")
    d2b.write.mode("append").parquet(s"$d/embeddings.parquet")
    LshCensus.append(spark, d, 8, d2a) // under-covering
    assert(persisted(loc) == recomputed(d, 8),
      "diverged append must rebuild to the true histogram")
  }

  test("q42 through the persisted census == q42 semantics (forced-split fixture)") {
    // force the split live at sf fixture scale (the LshGateSpec knobs)
    // and check the operator end to end on a scratch corpus whose census
    // goes through ensure+append rather than a query-time scan
    val d = freshCorpus("q42", base)
    spark.conf.set("graft.lsh.bits", "4")
    spark.conf.set("graft.lsh.targetBucketRows", "4")
    spark.conf.set("graft.lsh.splitFactor", "2")
    try {
      def rows(df: DataFrame) =
        df.select(col("bucket"), col("d1"), col("d2")).collect().toSeq
          .sortBy(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val got = rows(SparkEntry.queries("q42_lsh_neardup")(spark, d))
      // independent oracle: all pairs sharing (bucket, extc) at the
      // forced knobs — extc recomputed from scratch per side
      graft.functions.Natives.registerAll(spark)
      val ladder = LshGate.extLadderSql("n", 4, 2,
        LshGate.maxExtFor(4).toString)
      def side(i: Int): DataFrame = {
        val v = spark.read.parquet(s"$d/embeddings.parquet")
          .select(col("vec_id"), col("embedding"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"),
            expr(LshGate.sparkBucketExpr(4)).as("bucket"))
        val cen = spark.read.parquet(s"$d/embeddings.parquet")
          .select(expr(LshGate.sparkBucketExpr(4)).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .select(col("bucket"), expr(ladder).as("ext"))
        v.join(cen, Seq("bucket"))
          .withColumn("extc", expr(LshGate.sparkExtCodeExpr("ext")))
          .withColumn("norm",
            sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))))
          .select(col("bucket").as(s"b$i"), col("extc").as(s"e$i"),
            col("vec_id").as(s"d$i"), col("v").as(s"v$i"),
            col("norm").as(s"n$i"))
      }
      val expect = rows(side(1).join(side(2),
          col("b1") === col("b2") && col("e1") === col("e2") &&
            col("d1") < col("d2"))
        .withColumn("cosine",
          graft.functions.DotProduct.dot_product(col("v1"), col("v2")) /
            (col("n1") * col("n2")))
        .filter(col("cosine") >= 0.2)
        .select(col("b1").as("bucket"), col("d1"), col("d2")))
      assert(got == expect)
      assert(got.nonEmpty)
      // and the split-disabled fast path (factor ≤ 0: no census read at
      // all) matches the base-resolution pairing exactly
      spark.conf.set("graft.lsh.splitFactor", "0")
      val gotNoSplit = rows(SparkEntry.queries("q42_lsh_neardup")(spark, d))
      val v1 = side(1).select(col("b1"), col("d1"), col("v1"), col("n1"))
      val v2 = side(2).select(col("b2"), col("d2"), col("v2"), col("n2"))
      val expectNoSplit = rows(v1.join(v2,
          col("b1") === col("b2") && col("d1") < col("d2"))
        .withColumn("cosine",
          graft.functions.DotProduct.dot_product(col("v1"), col("v2")) /
            (col("n1") * col("n2")))
        .filter(col("cosine") >= 0.2)
        .select(col("b1").as("bucket"), col("d1"), col("d2")))
      assert(gotNoSplit == expectNoSplit)
    } finally {
      spark.conf.unset("graft.lsh.bits")
      spark.conf.unset("graft.lsh.targetBucketRows")
      spark.conf.unset("graft.lsh.splitFactor")
    }
  }
}
