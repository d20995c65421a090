package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.sources.SnapshotMerge

/** Streaming snapshot MAINTENANCE — the corpus-store twin of
  * [[VecIngest]]/[[BandIngest]], completing the incremental trilogy:
  * vectors (ANN assignments), text indexes (LSH bands), and now the
  * snapshot itself. CDC manifests arrive as parquet drops — `(doc_id,
  * text, op, seq)`, the shape a change feed actually delivers — and each
  * micro-batch is applied to the partitioned snapshot through
  * [[SnapshotMerge.applyDiff]]: only the partitions the delivery touches
  * are rewritten, under the crash-forward manifest swap.
  *
  * Three semantics the one-shot batch path doesn't need:
  *
  *  - WITHIN-batch latest-wins: `Trigger.AvailableNow` may coalesce
  *    several pending drop files into ONE micro-batch, so a doc can
  *    appear twice (upserted by one delivery, revised or deleted by the
  *    next). applyDiff's contract is one row per doc_id; [[applyBatch]]
  *    keeps the row with the highest `seq` (the delivery sequence the
  *    CDC producer stamps — file order inside a batch is not a version).
  *  - CROSS-batch ordering: a stale CDC file can be DELIVERED after a
  *    newer one and become its own later micro-batch. The snapshot's
  *    rows carry the seq that wrote them, and applyDiff's merge is
  *    version-guarded (a delta row wins only at seq ≥ stored), so the
  *    late batch's stale rows lose while its untouched-doc rows land —
  *    the end state is delivery-ORDER independent, not just
  *    delivery-batching independent (spec-pinned). Deletes persist
  *    TOMBSTONES for the same reason: a removed-outright row would leave
  *    no stored seq for a stale late upsert to lose to (spec-pinned:
  *    upsert-after-delete cannot resurrect).
  *  - REPLAY idempotence: foreachBatch re-delivers an uncommitted batch
  *    after a crash. A replayed row re-applies at its own seq (ties go
  *    to the delta), overwriting with identical content — so a replayed
  *    apply reproduces the state instead of corrupting it; a crash
  *    MID-apply is completed forward or discarded by applyDiff's own
  *    heal-on-entry.
  *
  * The partition routing comes from the snapshot's persisted
  * `_merge_meta` ([[SnapshotMerge.partColFromMeta]]) — a delivery never
  * sees the build-time corpus, so the divisor must be part of the
  * layout, not recomputed.
  */
object SnapshotIngest {

  /** Pinned CDC manifest schema (streaming sources never infer). */
  private val cdcSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("op", StringType),
    StructField("seq", LongType)))

  /** Streaming source over CDC parquet drops in `dir`. */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(cdcSchema)
      .option("pathGlobFilter", "cdc*.parquet")
      .parquet(dir)

  /** Collapse a micro-batch to one row per doc_id (highest seq wins) and
    * apply it. Deterministic: ties cannot arise — a delivery carries one
    * row per doc and distinct deliveries carry distinct seqs. The seq
    * RIDES INTO the apply: applyDiff's version-guarded merge compares it
    * against each stored row's seq, so a stale delivery arriving in a
    * LATER micro-batch (out-of-order CDC) cannot regress docs a newer
    * delivery already wrote — its untouched-doc rows still land. */
  private[graft] def applyBatch(batch: DataFrame, snapDir: String): Unit = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("seq").desc)
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("part", SnapshotMerge.partColFromMeta(snapDir))
    SnapshotMerge.applyDiff(batch.sparkSession, snapDir, latest)
  }

  /** Start the maintenance stream: every CDC delivery in `dropDir` is
    * merged into the snapshot at `snapDir`. */
  def start(spark: SparkSession, dropDir: String, snapDir: String,
            checkpoint: String): StreamingQuery =
    source(spark, dropDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        applyBatch(b, snapDir)
      }
      .start()

  /** RETENTION — retire CDC delivery files whose batch is COMMITTED
    * (`BandIngest.retireDeltasUpTo`'s drop-file analog): a year of daily
    * deliveries must not accumulate unboundedly in `dropDir` once their
    * content lives in the snapshot. The committed set comes from the
    * stream's OWN checkpoint — the source metadata log records which
    * files each micro-batch read, the commit log records which batches
    * finished their apply — so retirement can never touch a file a
    * crash-replay still needs: foreachBatch only ever re-delivers an
    * UNCOMMITTED batch, and those files (plus any file no batch has read
    * yet) are exactly the ones left in place. Restart safety after
    * deletion is the file source's normal contract: it plans new batches
    * from its log + the live listing, never by re-reading retired paths.
    *
    * Call between stream runs (the offline/ownership convention every
    * layout swap in this repo uses). Idempotent; returns the number of
    * files deleted. */
  def retireDeliveries(dropDir: String, checkpoint: String): Int = {
    val maxCommitted = Option(new java.io.File(s"$checkpoint/commits")
        .listFiles).toSeq.flatten
      .flatMap(f => scala.util.Try(f.getName.toLong).toOption)
      .foldLeft(-1L)(math.max)
    if (maxCommitted < 0) return 0
    // source 0's metadata log: one "v1"-headed file per batch (plus
    // periodic <id>.compact files that re-list history); every entry line
    // carries the file's uri and the batch that read it — the per-entry
    // batchId is authoritative, so compacted logs parse identically
    val logFiles = Option(new java.io.File(s"$checkpoint/sources/0")
        .listFiles).toSeq.flatten
      .filter(_.getName.matches("\\d+(\\.compact)?"))
    val pathRe = "\"path\":\"([^\"]+)\"".r
    val bidRe = "\"batchId\":(\\d+)".r
    val dropRoot = java.nio.file.Paths.get(dropDir).toAbsolutePath.normalize
    var retired = 0
    logFiles.foreach { f =>
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      // VERSION PIN: the FileStreamSource metadata log is Spark-internal
      // (HDFSMetadataLog), not public API — the "v1" header line and the
      // FileEntry JSON field names are what this parser understands. A
      // format change across Spark versions must fail LOUDLY here, not
      // silently match nothing and quietly stop retiring (unbounded
      // drop-dir growth with no symptom until disk fills).
      require(lines.size > 0 && lines.get(0).trim == "v1",
        s"unrecognized file-source log version in $f (expected 'v1' " +
          s"header, got '${if (lines.isEmpty) "" else lines.get(0)}'): " +
          "Spark's FileStreamSource log format changed — update " +
          "SnapshotIngest.retireDeliveries before relying on retention")
      lines.forEach { line =>
        (bidRe.findFirstMatchIn(line), pathRe.findFirstMatchIn(line)) match {
          case (Some(b), Some(u)) if b.group(1).toLong <= maxCommitted =>
            val p = java.nio.file.Paths.get(new java.net.URI(u.group(1)))
              .toAbsolutePath.normalize
            // containment guard: the log is trusted state, but a delete
            // outside the drop dir is never what retention means
            if (p.startsWith(dropRoot) &&
                java.nio.file.Files.deleteIfExists(p)) retired += 1
          case _ =>
        }
      }
    }
    retired
  }
}
