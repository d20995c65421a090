package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex
import graft.streaming.VecIngest

/** Streaming ANN-index maintenance: delta vectors assigned against the
  * PERSISTED centroids must be bit-identical to the batch assignment of
  * the same vectors (assignment is a pure function of vector+centroids),
  * a replayed micro-batch must replace rather than duplicate, and search
  * over base+delta must see the new vectors. */
class VecIngestSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Land `df` as a single `embeddings_<name>.parquet` leaf file (the
    * streaming source matches leaf names; same pattern as DocsIngestSpec). */
  private def deliver(df: DataFrame, dir: String, name: String): Unit = {
    val staging = java.nio.file.Files.createTempDirectory("vec_staging")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = java.nio.file.Files.list(staging).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    java.nio.file.Files.move(
      java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(dir, s"embeddings_$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def rows(df: DataFrame): Set[(Long, Seq[Double], Double, Int)] =
    df.select("vec_id", "v", "norm", "cid").collect().map { r =>
      (r.getLong(0), r.getSeq[Double](1), r.getDouble(2), r.getInt(3))
    }.toSet

  test("streamed delta assignment is bit-identical to the batch assignment") {
    val idx = IvfIndex.ensure(spark, sf)
    // the delta: the corpus re-keyed (vec_id + 100000), delivered in two
    // drops that split it unevenly
    val delta = Tables.embeddings(spark, sf)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val dropDir = tmp("vec_drop"); val deltaDir = tmp("vec_delta")
    val ckpt = tmp("vec_ckpt")
    // SHARED checkpoint across the two drains: the second run resumes the
    // stream's offsets and processes ONLY d2 (as its own bid) — the true
    // incremental path, cost scaling with the delivery not the corpus
    deliver(delta.filter(col("vec_id") % 3 === 0), dropDir, "d1")
    VecIngest.start(spark, dropDir, idx, deltaDir, ckpt).awaitTermination()
    deliver(delta.filter(col("vec_id") % 3 =!= 0), dropDir, "d2")
    VecIngest.start(spark, dropDir, idx, deltaDir, ckpt).awaitTermination()

    graft.functions.Natives.registerAll(spark)
    val batchAssign = IvfIndex.assign(
        delta.select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")),
        IvfIndex.centroids(spark, idx))
      .select(col("vec_id"), col("v"),
        sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))).as("norm"),
        col("cid"))
    val streamed = spark.read.parquet(deltaDir).select("vec_id", "v", "norm", "cid")
    assert(rows(streamed) == rows(batchAssign))
    assert(rows(streamed).nonEmpty)
  }

  test("a replayed micro-batch overwrites its own bid directory (no duplicates)") {
    val idx = IvfIndex.ensure(spark, sf)
    val delta = Tables.embeddings(spark, sf).limit(7)
      .withColumn("vec_id", col("vec_id") + 200000L)
    val deltaDir = tmp("vec_replay")
    VecIngest.assignBatch(delta, idx, deltaDir, batchId = 5L)
    val once = rows(spark.read.parquet(deltaDir).select("vec_id", "v", "norm", "cid"))
    VecIngest.assignBatch(delta, idx, deltaDir, batchId = 5L) // replay
    val twice = rows(spark.read.parquet(deltaDir).select("vec_id", "v", "norm", "cid"))
    assert(once == twice)
    assert(once.size == 7)
  }

  test("latest-wins: a re-delivery supersedes base and earlier delta rows") {
    val idx = IvfIndex.ensure(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val ids = emb.select("vec_id").orderBy("vec_id").limit(2)
      .collect().map(_.getLong(0))
    val (x, donor) = (ids(0), ids(1))
    val newId = 400000L
    val deltaDir = tmp("vec_upsert")
    // bid=0: a brand-new vector (donor's embedding under newId) and a
    // REVISION of base vector x (x now carries donor's embedding)
    VecIngest.assignBatch(
      emb.filter(col("vec_id") === donor)
        .select(lit(newId).as("vec_id"), col("embedding"), col("label"))
        .unionByName(emb.filter(col("vec_id") === donor)
          .select(lit(x).as("vec_id"), col("embedding"), col("label"))),
      idx, deltaDir, batchId = 0L)
    // bid=1: newId revised again, now to x's ORIGINAL embedding
    VecIngest.assignBatch(
      emb.filter(col("vec_id") === x)
        .select(lit(newId).as("vec_id"), col("embedding"), col("label")),
      idx, deltaDir, batchId = 1L)

    val combined = VecIngest.assignmentsWithDelta(spark, idx, deltaDir)
    // every vec_id exactly once — no (base, revision) or (bid0, bid1) pairs
    assert(combined.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
    val base = IvfIndex.assignments(spark, idx)
    def vOf(df: DataFrame, id: Long): Seq[Double] =
      df.filter(col("vec_id") === id).select("v").head().getSeq[Double](0)
    // x carries the revision (donor's vector), newId carries bid=1's (x's
    // original vector)
    assert(vOf(combined, x) == vOf(base, donor))
    assert(vOf(combined, newId) == vOf(base, x))
    // the join-fallback path (budget forced to 0) agrees bit-for-bit
    assert(rows(VecIngest.assignmentsWithDelta(spark, idx, deltaDir,
      maxCollectedIds = 0)) == rows(combined))
  }

  test("only committed bid= directories are read") {
    val idx = IvfIndex.ensure(spark, sf)
    val base = IvfIndex.assignments(spark, idx).select("vec_id", "v", "norm", "cid")
    // a deltaDir that EXISTS but holds no committed batch → exactly base
    // (the bare-read form threw a schema-inference error here)
    val emptyDir = tmp("vec_empty")
    assert(rows(VecIngest.assignmentsWithDelta(spark, idx, emptyDir)) == rows(base))
    // one committed batch + one crash-shaped leftover (bid dir with a junk
    // parquet file, no _SUCCESS): the leftover must be invisible — reading
    // it would fail on the corrupt footer
    val deltaDir = tmp("vec_commit")
    val d = Tables.embeddings(spark, sf).limit(3)
      .withColumn("vec_id", col("vec_id") + 500000L)
    VecIngest.assignBatch(d, idx, deltaDir, batchId = 0L)
    val junk = java.nio.file.Paths.get(deltaDir, "bid=7")
    java.nio.file.Files.createDirectories(junk)
    java.nio.file.Files.write(junk.resolve("part-corrupt.parquet"),
      Array[Byte](1, 2, 3))
    val combined = VecIngest.assignmentsWithDelta(spark, idx, deltaDir)
    assert(combined.count() == base.count() + 3)
    assert(VecIngest.committedBidDirs(deltaDir).size == 1)
  }

  test("search over base+delta sees the new vectors; empty delta equals base") {
    val idx = IvfIndex.ensure(spark, sf)
    val base = IvfIndex.assignments(spark, idx).select("vec_id", "v", "norm", "cid")
    // empty/missing delta dir → exactly the base
    assert(rows(VecIngest.assignmentsWithDelta(spark, idx, "/nonexistent/delta"))
           == rows(base))
    // a real delta: re-keyed clones land in the SAME cell as their
    // original (identical vector ⇒ identical nearest centroid), so a
    // combined read finds each original's clone at cosine ~1
    val delta = Tables.embeddings(spark, sf)
      .withColumn("vec_id", col("vec_id") + 300000L)
    val deltaDir = tmp("vec_search")
    VecIngest.assignBatch(delta, idx, deltaDir, batchId = 0L)
    val combined = VecIngest.assignmentsWithDelta(spark, idx, deltaDir)
    val cells = combined.groupBy("cid").count()
    val baseCells = base.groupBy("cid").count()
      .withColumnRenamed("count", "base_n")
    val doubled = cells.join(baseCells, "cid")
      .filter(col("count") =!= col("base_n") * 2).count()
    assert(doubled == 0, "every cell should hold exactly its base + clones")
  }
}
