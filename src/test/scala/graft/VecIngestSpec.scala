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

    graft.functions.DotProduct.register(spark)
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
