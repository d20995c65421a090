package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.BandIngest

/** Streaming LSH band-table maintenance (the text twin of VecIngestSpec):
  * streamed per-delivery band rows must be bit-identical to a one-shot
  * batch computation over the same documents (bandsOf is a pure function
  * of delivery + frozen banned set), a replayed micro-batch must replace
  * rather than duplicate, and the q64 probe over base∪streamed-delta must
  * equal the query's own answer. */
class BandIngestSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Land `df` as a single `documents_<name>.parquet` leaf file (the
    * streaming source matches leaf names; same pattern as DocsIngestSpec). */
  private def deliver(df: DataFrame, dir: String, name: String): Unit = {
    val staging = java.nio.file.Files.createTempDirectory("band_staging")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = java.nio.file.Files.list(staging).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    java.nio.file.Files.move(
      java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(dir, s"documents_$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select("doc_id", "band_key").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def deltaDocs = Tables.documents(spark, sf)
    .filter(pmod(col("doc_id"), lit(10)) >= 8)

  test("streamed band rows are bit-identical to the batch computation") {
    val idx = BandIngest.ensure(spark, sf)
    val dropDir = tmp("band_drop"); val deltaDir = tmp("band_delta")
    val ckpt = tmp("band_ckpt")
    // two uneven deliveries, SHARED checkpoint: the second drain resumes
    // offsets and processes only d2 as its own bid — the true incremental
    // path, cost scaling with the delivery
    deliver(deltaDocs.filter(col("doc_id") % 3 === 0), dropDir, "d1")
    BandIngest.start(spark, dropDir, idx, deltaDir, ckpt).awaitTermination()
    deliver(deltaDocs.filter(col("doc_id") % 3 =!= 0), dropDir, "d2")
    BandIngest.start(spark, dropDir, idx, deltaDir, ckpt).awaitTermination()

    val streamed = BandIngest.deltaBands(spark, deltaDir).get
    val batch = BandIngest.bandsOf(deltaDocs, BandIngest.banned(spark, idx))
    assert(rows(streamed) == rows(batch))
    assert(rows(streamed).nonEmpty)
    // two committed bids — one per delivery
    assert(graft.streaming.VecIngest.committedBidDirs(deltaDir).size == 2)
  }

  test("a replayed micro-batch overwrites its own bid directory") {
    val idx = BandIngest.ensure(spark, sf)
    val deltaDir = tmp("band_replay")
    val docs = deltaDocs.limit(5)
    BandIngest.ingestBatch(docs, idx, deltaDir, batchId = 3L)
    val once = rows(BandIngest.deltaBands(spark, deltaDir).get)
    BandIngest.ingestBatch(docs, idx, deltaDir, batchId = 3L) // replay
    val twice = rows(BandIngest.deltaBands(spark, deltaDir).get)
    assert(once == twice)
    // coverage, not just idempotence: the sink's rows are exactly the
    // pure bandsOf computation — every delivered doc's bands landed
    assert(once == rows(BandIngest.bandsOf(docs, BandIngest.banned(spark, idx))))
    assert(once.nonEmpty)
  }

  test("q64 probe over base + streamed delta equals the query's answer") {
    val idx = BandIngest.ensure(spark, sf)
    val dropDir = tmp("band_probe_drop"); val deltaDir = tmp("band_probe_delta")
    deliver(deltaDocs, dropDir, "all")
    BandIngest.start(spark, dropDir, idx, deltaDir, tmp("band_probe_ckpt"))
      .awaitTermination()
    val all = BandIngest.bandsWithDelta(spark, idx, deltaDir)
    val base = all.filter(pmod(col("doc_id"), lit(10)) < 8).as("o")
    val delta = all.filter(pmod(col("doc_id"), lit(10)) >= 8).as("n")
    val probe = delta.join(base, col("n.band_key") === col("o.band_key"))
      .groupBy(col("n.doc_id").as("delta_id"))
      .agg(countDistinct(col("o.doc_id")).as("n_base_matches"),
           min(col("o.doc_id")).as("first_base_match"))
    val direct = graft.SparkEntry.queries("q64_incremental_neardup")(spark, sf)
    val key = (df: DataFrame) => df.select("delta_id", "n_base_matches",
        "first_base_match").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(key(probe) == key(direct))
  }

  test("rebuild trigger: staleness tracks the delta/base band ratio") {
    val idx = BandIngest.ensure(spark, sf)
    val deltaDir = tmp("band_stale")
    assert(BandIngest.staleness(spark, idx, deltaDir) == 0.0)
    assert(!BandIngest.needsRebuild(spark, idx, deltaDir))
    // ingest the full 20% delta: ratio grows past the default 0.2
    // trigger (the delta universe is a quarter of the base by doc count)
    BandIngest.ingestBatch(deltaDocs, idx, deltaDir, batchId = 0L)
    val r = BandIngest.staleness(spark, idx, deltaDir)
    assert(r > 0.0)
    assert(BandIngest.needsRebuild(spark, idx, deltaDir) == (r >= 0.2))
    // monotone in deliveries: a second (disjoint-keyed) delivery raises it
    BandIngest.ingestBatch(
      deltaDocs.withColumn("doc_id", col("doc_id") + 900000L),
      idx, deltaDir, batchId = 1L)
    assert(BandIngest.staleness(spark, idx, deltaDir) > r)
  }

  test("rebuild re-freezes over the grown corpus and retires the deltas") {
    val idx = BandIngest.ensure(spark, sf)
    val dropDir = tmp("band_rb_drop"); val deltaDir = tmp("band_rb_delta")
    val ckpt = tmp("band_rb_ckpt")
    // two streamed deliveries — the grown corpus is then ALL documents
    deliver(deltaDocs.filter(col("doc_id") % 2 === 0), dropDir, "d1")
    BandIngest.start(spark, dropDir, idx, deltaDir, ckpt).awaitTermination()
    deliver(deltaDocs.filter(col("doc_id") % 2 =!= 0), dropDir, "d2")
    BandIngest.start(spark, dropDir, idx, deltaDir, ckpt).awaitTermination()
    assert(graft.streaming.VecIngest.committedBidDirs(deltaDir).size == 2)

    val newIdx = BandIngest.rebuild(spark, sf, dropDir, deltaDir)

    // bit-equal to a from-scratch buildBase over the same grown corpus
    // (here: the whole documents table)
    val scratch = tmp("band_rb_scratch")
    BandIngest.buildBase(spark, sf, scratch, baseFilter = lit(true))
    val shingles = (d: String) => BandIngest.banned(spark, d)
      .collect().map(_.getString(0)).toSet
    assert(shingles(newIdx) == shingles(scratch))
    assert(rows(BandIngest.baseBands(spark, newIdx)) ==
           rows(BandIngest.baseBands(spark, scratch)))

    // deltas retired; the new generation starts clean
    assert(graft.streaming.VecIngest.committedBidDirs(deltaDir).isEmpty)
    assert(BandIngest.staleness(spark, newIdx, deltaDir) == 0.0)
    assert(rows(BandIngest.bandsWithDelta(spark, newIdx, deltaDir)) ==
           rows(BandIngest.baseBands(spark, newIdx)))
    // the old generation is untouched (readers drain, then GC)
    assert(rows(BandIngest.baseBands(spark, idx)).nonEmpty)
  }

  test("banned set is frozen at base build: base df over cap, not joint") {
    val idx = BandIngest.ensure(spark, sf)
    val bannedSet = BandIngest.banned(spark, idx).collect().map(_.getString(0)).toSet
    // recompute the expected banned set directly: shingles whose BASE
    // document frequency exceeds the cap
    graft.functions.Natives.registerAll(spark)
    val expected = Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(10)) < 8)
      .select(col("doc_id"),
        explode(graft.functions.WordShingles.word_shingles(col("text"))).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > BandIngest.DfCap)
      .collect().map(_.getString(0)).toSet
    assert(bannedSet == expected)
  }
}
