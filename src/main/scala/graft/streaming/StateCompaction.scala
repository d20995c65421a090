package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Compaction + retention for the streaming keyed sinks (round 11,
  * VERDICT r10 #6).
  *
  * Every replay-idempotent sink in this package accumulates one directory
  * (or appended file) per micro-batch forever — correct, but scan task
  * count and footer/open overhead grow with FILE count, not data size
  * (the same failure class Exporter.compactPartitioned exists for, and
  * the observed 4× read inflation of the 12k-file IVF layout). This
  * module folds a sink's committed batch dirs into ONE, using each sink's
  * own merge rule, so the result is READ-EQUIVALENT: the assembled view
  * (ledger / live assignment set / band set / merged hourly table) is
  * unchanged — spec-pinned, not assumed (StateCompactionSpec).
  *
  * RETENTION CONTRACT (when it is safe to run): offline maintenance,
  * while the stream is stopped or idle — the standard cadence for
  * streaming-table compaction. Replay safety is preserved because
  * Structured Streaming only ever replays batches whose foreachBatch
  * commit did not reach the checkpoint; those are by definition NEWER
  * than every committed-and-compacted batch, and the compacted output
  * keeps the HIGHEST compacted batch id, so a post-compaction replay of
  * batch K > maxCompacted overwrites its own `bid=K` exactly as before.
  * (Compacting a sink whose stream is mid-batch could fold a directory
  * the stream is about to overwrite — hence offline.)
  *
  * The swap itself is crash-safe in the same direction as the sinks: the
  * compacted output is fully written (with `_SUCCESS`) under a dot-prefix
  * temp dir that readers never match, old dirs are then removed, and the
  * temp dir is renamed last. A crash between remove and rename loses no
  * information that re-running the compaction from the temp dir or the
  * upstream rebuild cannot restore — and the window contains no state
  * where a reader sees DOUBLED data, which is the failure that would
  * corrupt downstream sums.
  */
object StateCompaction {

  /** Committed `<prefix>=<n>` batch dirs (carrying `_SUCCESS`) under
    * `dir` — the generalization of VecIngest.committedBidDirs to the
    * funnel's `batch_id=` sinks. */
  def committedKeyedDirs(dir: String, prefix: String): Seq[String] = {
    val d = new java.io.File(dir)
    val kids = if (d.isDirectory) d.listFiles() else null
    if (kids == null) Seq.empty
    else kids.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(s"$prefix=") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .map(_.getPath).sorted
  }

  private[streaming] def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val listing = Files.list(p)
      try listing.forEach(deleteTree) finally listing.close()
    }
    Files.deleteIfExists(p)
  }

  private def dataFileCount(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(dir))
  }

  /** Fold all committed `<prefix>=` dirs of `sinkDir` into one keyed at
    * the HIGHEST compacted batch id, via the sink-specific `resolve` +
    * `write`. Returns (dirs before, dirs after). No-op below 2 dirs. */
  private def compactKeyed(s: SparkSession, sinkDir: String, prefix: String,
                           resolve: DataFrame => DataFrame,
                           write: (DataFrame, String) => Unit): (Int, Int) = {
    val dirs = committedKeyedDirs(sinkDir, prefix)
    if (dirs.size < 2) return (dirs.size, dirs.size)
    val maxId = dirs
      .map(p => new java.io.File(p).getName.stripPrefix(s"$prefix=").toLong).max
    val tmp = s"$sinkDir/.compact_tmp"
    deleteTree(Paths.get(tmp))
    // materializes fully (with _SUCCESS) BEFORE any old dir is touched
    write(resolve(s.read.option("basePath", sinkDir).parquet(dirs: _*)), tmp)
    dirs.foreach(d => deleteTree(Paths.get(d)))
    Files.move(Paths.get(tmp), Paths.get(s"$sinkDir/$prefix=$maxId"))
    (dirs.size, 1)
  }

  /** VecIngest delta compaction: resolve LATEST-WINS per vec_id at
    * compact time (the read-side liveness filter made durable), keep the
    * cell-clustered one-file-per-touched-cell layout. After it, the
    * read-side winner logic sees a single batch and its filters are
    * no-ops — same live set, spec-pinned. */
  def compactVecDelta(s: SparkSession, deltaDir: String): (Int, Int) =
    compactKeyed(s, deltaDir, "bid",
      resolve = df => {
        val w = Window.partitionBy("vec_id")
          .orderBy(col("bid").cast(LongType).desc)
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select("vec_id", "v", "norm", "cid")
      },
      write = (df, out) => df.repartition(col("cid"))
        .write.partitionBy("cid").parquet(out))

  /** BandIngest delta compaction: band rows are append-only derived
    * state; distinct (doc_id, band_key) preserves the probe's view
    * (countDistinct / min are set-insensitive) while dropping
    * re-delivery duplicates. */
  def compactBandDelta(s: SparkSession, deltaDir: String): (Int, Int) =
    compactKeyed(s, deltaDir, "bid",
      resolve = _.select("doc_id", "band_key").distinct(),
      write = (df, out) => df.write.parquet(out))

  /** DocsFunnel state compaction: the additive stage ledger folds to ONE
    * summed row; the per-fingerprint stage-4 partials fold by the same
    * associative (min id, that doc's tokens) rule the ledger assembly
    * applies — so `ledger` is bit-unchanged while both sinks drop to one
    * dir each. Returns ((parts before, after), (p4 before, after)). */
  def compactFunnelState(s: SparkSession, stateDir: String)
      : ((Int, Int), (Int, Int)) = {
    val parts = compactKeyed(s, s"$stateDir/parts", "batch_id",
      resolve = df => {
        val cols = (0 to 4).flatMap(i => Seq(s"c$i", s"t$i"))
        df.agg(sum(col(cols.head)).as(cols.head),
               cols.tail.map(c => sum(col(c)).as(c)): _*)
      },
      write = (df, out) => df.coalesce(1).write.parquet(out))
    val p4 = compactKeyed(s, s"$stateDir/p4", "batch_id",
      resolve = _.groupBy("fp")
        .agg(min(col("min_id")).as("min_id"),
             min_by(col("min_tokens"), col("min_id")).as("min_tokens")),
      write = (df, out) => df.write.parquet(out))
    (parts, p4)
  }

  /** EventsStream hourly-partials compaction: keep each (hour,
    * event_type) window's LATEST emission only (the same latest-wins rule
    * readIncrementalHourly applies), rewrite the flat append-mode
    * directory in place. Winning rows keep their original batch_id, so
    * later appends with higher ids still supersede them. Returns (data
    * files before, after). */
  def compactHourlyPartials(s: SparkSession, outDir: String): (Int, Int) = {
    val dir = s"$outDir/hourly_partials"
    val before = dataFileCount(dir)
    val w = Window.partitionBy("hour", "event_type").orderBy(col("batch_id").desc)
    val latest = s.read.parquet(dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
    val tmp = s"$outDir/.hourly_partials_tmp"
    deleteTree(Paths.get(tmp))
    latest.coalesce(1).write.parquet(tmp)
    deleteTree(Paths.get(dir))
    Files.move(Paths.get(tmp), Paths.get(dir))
    (before, dataFileCount(dir))
  }
}
