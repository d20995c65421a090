package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.SnapshotMerge
import graft.streaming.SnapshotIngest

/** The streaming merge twin: CDC deliveries applied per micro-batch must
  * land exactly the batch end state, a later delivery's version of a doc
  * must supersede an earlier one whether the deliveries arrive as two
  * micro-batches or coalesced into one, and a replayed batch must
  * reproduce rather than corrupt. */
class SnapshotIngestSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Land `df` as a single `cdc_<name>.parquet` leaf file (the streaming
    * source matches leaf names; the VecIngestSpec pattern). */
  private def deliver(df: DataFrame, dir: String, name: String): Unit = {
    val staging = java.nio.file.Files.createTempDirectory("cdc_staging")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = java.nio.file.Files.list(staging).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    java.nio.file.Files.move(
      java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(dir, s"cdc_$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Canonical CDC rows (SnapshotMerge.delta without the part column —
    * a real change feed carries no layout knowledge) stamped with the
    * delivery sequence. */
  private def cdc(seq: Long, pred: Column): DataFrame =
    SnapshotMerge.delta(spark, sf).filter(pred)
      .select(col("doc_id"), col("text"), col("op"), lit(seq).as("seq"))

  /** The merged end state derived from first principles (the
    * SnapshotMergeSpec construction). */
  private def expected: DataFrame = {
    val mx = Tables.documentsMaxId(spark, sf)
    val (b, r) = (SnapshotMerge.baseCut(mx), SnapshotMerge.churnFloor(mx))
    Tables.documents(spark, sf)
      .filter(!(col("doc_id") > r && col("doc_id") <= b &&
                col("doc_id") % 13 === 0 && col("doc_id") % 11 =!= 0))
      .select(col("doc_id"),
        when(col("doc_id") > r && col("doc_id") <= b && col("doc_id") % 11 === 0,
          upper(col("text"))).otherwise(col("text")).as("text"))
  }

  private def snapDocs(dir: String): DataFrame =
    SnapshotMerge.liveDocs(spark, dir).select("doc_id", "text")

  /** An odd new-crawl doc id: its canonical upsert rides delivery 2, so
    * delivery 1 can carry a DRAFT version that must be superseded. */
  private def probeId: Long = {
    val mx = Tables.documentsMaxId(spark, sf)
    if (mx % 2 == 1) mx else mx - 1
  }

  test("two CDC deliveries land the batch end state; later versions supersede") {
    val dir = tmp("snap_ingest") + "/snap"
    SnapshotMerge.writeBase(spark, sf, dir)
    val dropDir = tmp("snap_drop"); val ckpt = tmp("snap_ckpt")
    import spark.implicits._
    val draft = Seq((probeId, "DRAFT pending recrawl", "upsert", 1L))
      .toDF("doc_id", "text", "op", "seq")
    // d1: even-id delta rows + a draft of an odd new-crawl doc;
    // d2: odd-id delta rows, including that doc's canonical version
    deliver(cdc(1, col("doc_id") % 2 === 0).unionByName(draft), dropDir, "d1")
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()
    // mid-stream sanity: the draft is live after delivery 1
    assert(snapDocs(dir).filter(col("doc_id") === probeId)
      .head().getString(1).startsWith("DRAFT"))
    deliver(cdc(2, col("doc_id") % 2 =!= 0), dropDir, "d2")
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()

    val (m, e) = (snapDocs(dir), expected)
    assert(m.count() == e.count())
    assert(m.exceptAll(e).isEmpty && e.exceptAll(m).isEmpty)
  }

  test("deliveries coalesced into ONE micro-batch collapse latest-wins by seq") {
    val dir = tmp("snap_ingest1b") + "/snap"
    SnapshotMerge.writeBase(spark, sf, dir)
    val dropDir = tmp("snap_drop1b"); val ckpt = tmp("snap_ckpt1b")
    import spark.implicits._
    val draft = Seq((probeId, "DRAFT pending recrawl", "upsert", 1L))
      .toDF("doc_id", "text", "op", "seq")
    // both files pending before the single AvailableNow drain: the doc
    // appears twice in one batch and seq must decide
    deliver(cdc(1, col("doc_id") % 2 === 0).unionByName(draft), dropDir, "d1")
    deliver(cdc(2, col("doc_id") % 2 =!= 0), dropDir, "d2")
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()

    val (m, e) = (snapDocs(dir), expected)
    assert(m.exceptAll(e).isEmpty && e.exceptAll(m).isEmpty)
    assert(!snapDocs(dir).filter(col("doc_id") === probeId)
      .head().getString(1).startsWith("DRAFT"))
  }

  test("an out-of-order late delivery cannot regress newer state") {
    val dir = tmp("snap_ingest_ooo") + "/snap"
    SnapshotMerge.writeBase(spark, sf, dir)
    val dropDir = tmp("snap_drop_ooo"); val ckpt = tmp("snap_ckpt_ooo")
    import spark.implicits._
    val draft = Seq((probeId, "DRAFT pending recrawl", "upsert", 1L))
      .toDF("doc_id", "text", "op", "seq")
    // the NEWER delivery (seq 2, canonical odd rows incl. probeId's final
    // text) arrives and is applied FIRST; the seq-1 file (even rows + the
    // stale draft of probeId) is delivered late as its own micro-batch
    deliver(cdc(2, col("doc_id") % 2 =!= 0), dropDir, "d2")
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()
    deliver(cdc(1, col("doc_id") % 2 === 0).unionByName(draft), dropDir, "d1")
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()

    // the version guard: the stale draft LOST, the late delivery's
    // untouched-doc rows still landed — end state is order-independent
    val (m, e) = (snapDocs(dir), expected)
    assert(m.count() == e.count())
    assert(m.exceptAll(e).isEmpty && e.exceptAll(m).isEmpty)
    assert(!snapDocs(dir).filter(col("doc_id") === probeId)
      .head().getString(1).startsWith("DRAFT"))
  }

  test("a stale upsert delivered after a delete cannot resurrect the doc") {
    val dir = tmp("snap_ingest_tomb") + "/snap"
    SnapshotMerge.writeBase(spark, sf, dir)
    val dropDir = tmp("snap_drop_tomb"); val ckpt = tmp("snap_ckpt_tomb")
    import spark.implicits._
    // a doc the base holds: takedown at seq 2 applied FIRST, then a stale
    // seq-1 revision of the same doc arrives late as its own micro-batch.
    // Pre-tombstone, the delete left no stored seq for the upsert to lose
    // to and the doc came back from the dead.
    val mx = Tables.documentsMaxId(spark, sf)
    val victim = SnapshotMerge.churnFloor(mx) // ≤ baseCut → in the base
    deliver(Seq((victim, null: String, "delete", 2L))
      .toDF("doc_id", "text", "op", "seq"), dropDir, "d2")
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()
    assert(snapDocs(dir).filter(col("doc_id") === victim).isEmpty)
    deliver(Seq((victim, "STALE revision from before the takedown", "upsert", 1L))
      .toDF("doc_id", "text", "op", "seq"), dropDir, "d1")
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()
    // the tombstone's seq defeats the stale upsert: still deleted
    assert(snapDocs(dir).filter(col("doc_id") === victim).isEmpty)
    // and a genuinely newer upsert (seq 3) revives the doc past the delete
    deliver(Seq((victim, "fresh recrawl", "upsert", 3L))
      .toDF("doc_id", "text", "op", "seq"), dropDir, "d3")
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()
    assert(snapDocs(dir).filter(col("doc_id") === victim)
      .head().getString(1) == "fresh recrawl")
  }

  test("retention: committed deliveries retire, unprocessed files survive, view unchanged") {
    val dir = tmp("snap_ingest_ret") + "/snap"
    SnapshotMerge.writeBase(spark, sf, dir)
    val dropDir = tmp("snap_drop_ret"); val ckpt = tmp("snap_ckpt_ret")
    def cdcFiles = Option(new java.io.File(dropDir).listFiles).toSeq.flatten
      .map(_.getName).filter(n => n.startsWith("cdc") && n.endsWith(".parquet"))
    // two deliveries over two stream runs — both batches committed
    deliver(cdc(1, col("doc_id") % 2 === 0), dropDir, "d1")
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()
    deliver(cdc(2, col("doc_id") % 2 =!= 0), dropDir, "d2")
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()
    // a third delivery lands but is NOT streamed yet: no batch has read
    // it, so retention must leave it in place
    deliver(cdc(3, col("doc_id") % 100 === 7), dropDir, "d3_pending")
    val before = SnapshotMerge.mergedLedger(spark, dir).collect().toSeq

    val retired = SnapshotIngest.retireDeliveries(dropDir, ckpt)
    assert(retired == 2, s"expected the 2 committed deliveries retired, got $retired")
    assert(cdcFiles == Seq("cdc_d3_pending.parquet"),
      s"unprocessed delivery must survive retention, saw $cdcFiles")
    // the merged view is derived from the snapshot, not the drop files
    assert(SnapshotMerge.mergedLedger(spark, dir).collect().toSeq == before)
    // idempotent
    assert(SnapshotIngest.retireDeliveries(dropDir, ckpt) == 0)

    // the stream RESTARTS cleanly against the thinned drop dir (retired
    // paths are never re-planned) and applies the pending delivery
    SnapshotIngest.start(spark, dropDir, dir, ckpt).awaitTermination()
    assert(SnapshotIngest.retireDeliveries(dropDir, ckpt) == 1)
    assert(cdcFiles.isEmpty, "file count stays bounded after N deliveries")
    // end state: base+d1+d2 state with d3's revisions on top of expected
    val m = snapDocs(dir)
    assert(m.count() == expected.count())
  }

  test("a replayed batch reproduces the state (foreachBatch redelivery)") {
    val dir = tmp("snap_ingest_rp") + "/snap"
    SnapshotMerge.writeBase(spark, sf, dir)
    val d = cdc(1, lit(true))
    SnapshotIngest.applyBatch(d, dir)
    // materialize BEFORE the re-apply: the rewrite retires the files a
    // lazily-held frame would still point at (in-place layout updates
    // carry no table-format snapshot isolation — the documented
    // offline/ownership contract)
    val onceCount = snapDocs(dir).count()
    SnapshotIngest.applyBatch(d, dir) // the crash-before-commit replay
    val twice = snapDocs(dir)
    assert(twice.count() == onceCount)
    assert(twice.exceptAll(expected).isEmpty && expected.exceptAll(twice).isEmpty)
  }
}
