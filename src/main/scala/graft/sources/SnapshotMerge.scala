package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Partition-pruned incremental merge — the `MERGE INTO` / copy-on-write
  * apply step a 100 TB corpus store needs between crawls: given the
  * persisted previous snapshot and a CDC-shaped delta (upserts +
  * deletes), rewrite ONLY the partitions the delta touches and leave
  * every other partition's files physically untouched. q72 computes WHAT
  * changed (the snapshot diff); this applies it. A full-rebuild ETL like
  * the reference's rewrites the world per run; at scale the rewrite cost
  * must be O(changed partitions), not O(corpus) — deliveries are
  * recency-concentrated, so an id-range (= ingestion-time) partitioning
  * confines them to the newest few partitions.
  *
  * Crash posture mirrors streaming.StateCompaction's keyed swap: the new
  * content of every affected partition is written to a SIBLING temp dir
  * first; an atomically-placed manifest (listing each affected partition
  * as keep — replace with temp content — or drop — all rows deleted) is
  * the point of no return, after which a crash at any interleaving is
  * completed FORWARD by the next writer or reader touch
  * ([[healIfCrashed]]); a temp without a manifest is an uncommitted
  * write — discarded by the next apply, left alone by readers. No state
  * ever shows a reader doubled or partially-swapped data beyond plain
  * parquet dir atomicity (one partition dir at a time, each replaced by
  * a rename).
  *
  * The delta here is DERIVED deterministically from the documents table
  * (new crawl past the base cutoff, sparse revisions/takedowns confined
  * to the churn band) so the DuckDB oracle can replay the merged END
  * STATE from first principles — the hash-match proves the incremental
  * apply landed exactly the state a full recompute would produce, which
  * is the whole contract of MERGE.
  */
object SnapshotMerge {

  /** Id-range partition count. A deployment sizes this so a partition is
    * a few GB (thousands of parts at 100 TB); the apply cost scales with
    * TOUCHED partitions either way. */
  val NParts = 16

  /** Rules tag, part of the content address (the BuildTag lesson).
    * m2: rows carry the writing seq and the layout persists
    * `_merge_meta` — pre-versioning m1 dirs must not be served.
    * m3: deletes persist TOMBSTONES (`tomb=true`, null text, the deleting
    * seq) — pre-tombstone m2 dirs lack the column and must not be served. */
  val Tag = "m3"

  /** Range partition of a doc_id given the corpus max id: floor(id·N/(mx+1))
    * ∈ [0, N) — integer math, identical in Spark (`DIV`) and DuckDB (`//`). */
  def partOf(maxId: Long): Column =
    expr(s"CAST((doc_id * $NParts) DIV ${maxId + 1L} AS BIGINT)")

  /** Base-snapshot cutoff: ids ≤ 80% of the corpus were in the previous
    * snapshot; ids past it are "today's crawl". */
  def baseCut(maxId: Long): Long = maxId * 4 / 5

  /** Churn floor: revisions/takedowns only hit ids in (churnFloor,
    * baseCut] — late fixes land near the ingestion frontier. */
  def churnFloor(maxId: Long): Long = maxId * 7 / 10

  /** The previous snapshot: every document at or below the base cutoff,
    * id-range partitioned, one file per partition (rows pre-clustered on
    * the partition value — the writeShards lesson), sorted by doc_id. */
  def writeBase(s: SparkSession, sfDir: String, dir: String): Unit = {
    val mx = graft.Tables.documentsMaxId(s, sfDir)
    graft.Tables.documents(s, sfDir)
      .filter(col("doc_id") <= baseCut(mx))
      // every snapshot row carries the seq that wrote it (base = 0): the
      // version guard applyDiff's merge compares deliveries against
      .select(col("doc_id"), col("text"), lit(0L).as("seq"),
              lit(false).as("tomb"), partOf(mx).as("part"))
      .repartition(NParts, col("part"))
      .sortWithinPartitions("part", "doc_id")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    // the partitioner's divisor is PART OF THE LAYOUT: persist it
    // (underscore-prefixed file — invisible to readers) so deliveries
    // that never saw the build-time corpus (the streaming twin) route
    // rows to the same partitions the base used
    Files.writeString(Paths.get(s"$dir/_merge_meta"),
      s"maxId=$mx\nnparts=$NParts\n")
  }

  /** The layout's partition expression, recovered from `_merge_meta`.
    * Fails LOUD when the persisted nparts disagrees with this engine's
    * [[NParts]] — applyDiff's repartition and swap are sized by the
    * constant, so silently routing by a different divisor would strand
    * rows in partitions the merge never reads (duplicate doc_ids,
    * undeleted takedowns). A retuned deployment rebuilds the layout. */
  def partColFromMeta(snapDir: String): Column = {
    val kv = new java.util.HashMap[String, String]
    Files.readAllLines(Paths.get(s"$snapDir/_merge_meta")).forEach { l =>
      if (l.contains("=")) { val Array(k, v) = l.split("=", 2); kv.put(k, v) }
    }
    val persisted = kv.get("nparts").toInt
    require(persisted == NParts,
      s"snapshot at $snapDir was laid out with nparts=$persisted but this " +
      s"engine's NParts=$NParts — rebuild the layout or run the matching engine")
    partOf(kv.get("maxId").toLong)
  }

  /** Today's delivery, CDC-shaped `(doc_id, text, op, part)`:
    * upserts = the new crawl (ids past the cutoff, original text) plus
    * sparse revisions in the churn band (every 11th id, text upcased);
    * deletes = takedowns in the churn band (every 13th id not also
    * revised). Disjoint by construction. */
  def delta(s: SparkSession, sfDir: String): DataFrame = {
    val mx = graft.Tables.documentsMaxId(s, sfDir)
    val (b, r) = (baseCut(mx), churnFloor(mx))
    val docs = graft.Tables.documents(s, sfDir).select(col("doc_id"), col("text"))
    val newCrawl = docs.filter(col("doc_id") > b)
      .select(col("doc_id"), col("text"), lit("upsert").as("op"))
    val revised = docs
      .filter(col("doc_id") > r && col("doc_id") <= b && col("doc_id") % 11 === 0)
      .select(col("doc_id"), upper(col("text")).as("text"), lit("upsert").as("op"))
    val takedown = docs
      .filter(col("doc_id") > r && col("doc_id") <= b &&
              col("doc_id") % 13 === 0 && col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), lit(null).cast(StringType).as("text"),
              lit("delete").as("op"))
    newCrawl.unionByName(revised).unionByName(takedown)
      .withColumn("seq", lit(1L))
      .withColumn("part", partOf(mx))
  }

  /** Serializes swaps against heal calls from read paths (single JVM —
    * the StateCompaction contract: cross-process compaction is excluded
    * by the offline/ownership convention). */
  private val swapLock = new Object

  private def tmpDir(snapDir: String): String = s"$snapDir.merge_tmp"

  private def deleteTree(p: Path): Unit = graft.Fs.deleteTree(p)

  /** Apply a CDC delta to the snapshot at `snapDir`; returns
    * (partitions touched, NParts). Reads ONLY the affected partitions
    * (partition pruning on the `part` filter), writes only the sibling
    * temp, swaps only the manifested dirs — untouched partitions' files
    * are never listed, read, or replaced. Idempotent: re-applying the
    * same delta reproduces the same state.
    *
    * The merge is VERSION-GUARDED: every snapshot row carries the `seq`
    * that wrote it, and a delta row wins only when its seq is at least
    * the stored one (ties go to the delta — that is what makes a
    * replayed apply reproduce its own rows). An out-of-order delivery —
    * a stale CDC file applied after a newer one — therefore cannot
    * regress a doc: its stale upserts and deletes lose to the stored
    * seq, while its rows for untouched docs still land. This is the
    * per-row version check a table format's MERGE runs; without it,
    * apply order would silently encode into the data.
    *
    * Deletes persist TOMBSTONES (`tomb=true`, null text, the deleting
    * seq) rather than removing the row: without a stored seq to lose to,
    * a stale out-of-order upsert would re-insert the doc and resurrect
    * deleted content. Readers see only live rows ([[liveDocs]]); a
    * deployment reclaims old tombstones with [[vacuumTombstones]] once
    * every producer is past their seq (the table-format RETENTION
    * contract — a tombstone may be dropped only when no delivery that
    * could still arrive carries a lower seq).
    *
    * PRECONDITION: at most one row per doc_id (a CDC delta's natural
    * shape; a caller holding several versions must collapse latest-wins
    * first — the streaming twin does, [[graft.streaming.SnapshotIngest]]
    * `applyBatch`). Two rows for one doc would both survive the merge
    * and land as duplicates. */
  def applyDiff(s: SparkSession, snapDir: String, delta: DataFrame): (Int, Int) = {
    // we are the writer: finish a manifested crashed swap forward,
    // discard an unmanifested (uncommitted) temp
    swapLock.synchronized {
      val t = Paths.get(tmpDir(snapDir))
      if (Files.exists(t.resolve(".merge_manifest"))) finishSwap(snapDir)
      else deleteTree(t)
    }
    // bounded: ≤ NParts rows
    val affected = delta.select("part").distinct()
      .collect().map(_.getLong(0)).sorted
    val old = s.read.parquet(snapDir)
      .filter(col("part").isin(affected.map(Long.box): _*))
      .select(col("doc_id"), col("text"), col("seq").cast(LongType).as("seq"),
              col("tomb"), col("part").cast(LongType).as("part"))
    // version-guarded merge (see scaladoc): exactly one side survives per
    // doc — the old row (live OR tombstone) iff strictly newer than the
    // delta's seq, the delta's row iff at least as new as any stored row
    // (an upsert lands live, a delete lands as a tombstone — both carry
    // the seq so later stale rows lose to them). Both joins build on the
    // DELTA side (bounded by the delivery, broadcast-able).
    val oldKeep = old
      .join(delta.select(col("doc_id"), col("seq").as("__dseq")),
            Seq("doc_id"), "left")
      .filter(col("__dseq").isNull || col("seq") > col("__dseq"))
      .select(col("doc_id"), col("text"), col("seq"), col("tomb"), col("part"))
    val deltaWins = delta
      .withColumn("tomb", col("op") === "delete")
      .join(old.select(col("doc_id"), col("seq").as("__oseq")),
            Seq("doc_id"), "left")
      .filter(col("__oseq").isNull || col("seq") >= col("__oseq"))
      .select(col("doc_id"), col("text"), col("seq"), col("tomb"), col("part"))
    oldKeep.unionByName(deltaWins)
      .repartition(NParts, col("part"))
      .sortWithinPartitions("part", "doc_id")
      .write.partitionBy("part").parquet(tmpDir(snapDir))
    manifestAndSwap(snapDir, affected)
    (affected.length, NParts)
  }

  /** Manifest the fully-written temp and complete the swap — the shared
    * tail of [[applyDiff]] and [[vacuumTombstones]]. Records keep-vs-drop
    * per affected partition so forward recovery can tell "already
    * swapped" from "must be removed" (bounded ≤ NParts listing). With
    * tombstoned deletes an applyDiff partition always produces rows, so
    * drop only arises for vacuum passes that empty a partition — recovery
    * must still handle both modes. */
  private def manifestAndSwap(snapDir: String, affected: Array[Long]): Unit = {
    val tmp = tmpDir(snapDir)
    val kept = Option(new java.io.File(tmp).listFiles).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("part="))
      .map(_.getName.stripPrefix("part=").toLong).toSet
    swapLock.synchronized {
      // point of no return, placed atomically (the StateCompaction idiom):
      // from here a crash at any interleaving completes FORWARD
      val lines = affected.map(k => s"$k:${if (kept(k)) "keep" else "drop"}")
      val manTmp = Paths.get(s"$tmp/.merge_manifest.writing")
      Files.writeString(manTmp, lines.mkString("\n"))
      Files.move(manTmp, Paths.get(s"$tmp/.merge_manifest"),
        StandardCopyOption.ATOMIC_MOVE)
      finishSwap(snapDir)
    }
  }

  /** Reclaim tombstones whose seq is strictly below `horizon`, rewriting
    * ONLY the partitions that hold one (same temp + manifest + forward
    * swap as the merge; a partition left with zero rows is dropped).
    * Returns the number of partitions rewritten.
    *
    * RETENTION CONTRACT: `horizon` must be at or below the lowest seq any
    * delivery that could still arrive might carry — a vacuumed tombstone
    * can no longer defeat a stale upsert, so vacuuming ahead of the
    * producers' low-watermark re-opens the resurrection window the
    * tombstone closed. The CDC producer's acknowledged low-watermark is
    * the natural horizon. */
  def vacuumTombstones(s: SparkSession, snapDir: String, horizon: Long): Int = {
    swapLock.synchronized {
      val t = Paths.get(tmpDir(snapDir))
      if (Files.exists(t.resolve(".merge_manifest"))) finishSwap(snapDir)
      else deleteTree(t)
    }
    def expired = col("tomb") && col("seq") < horizon
    // bounded: ≤ NParts rows (partition-discovered `part` comes back as
    // int — cast before collecting)
    val affected = s.read.parquet(snapDir).filter(expired)
      .select(col("part").cast(LongType)).distinct()
      .collect().map(_.getLong(0)).sorted
    if (affected.isEmpty) return 0
    s.read.parquet(snapDir)
      .filter(col("part").isin(affected.map(Long.box): _*))
      .filter(!expired)
      .select(col("doc_id"), col("text"), col("seq").cast(LongType).as("seq"),
              col("tomb"), col("part").cast(LongType).as("part"))
      .repartition(affected.length, col("part"))
      .sortWithinPartitions("part", "doc_id")
      .write.partitionBy("part").parquet(tmpDir(snapDir))
    manifestAndSwap(snapDir, affected)
    affected.length
  }

  /** Complete a manifested swap forward. Idempotent at every
    * interleaving: a keep-partition with its temp dir still present is
    * (re-)swapped — delete target, rename temp in; one whose temp dir is
    * gone was already swapped and is skipped; a drop-partition's target
    * delete is idempotent. The temp (with the manifest inside) is
    * removed last, which is what marks the swap complete. */
  private def finishSwap(snapDir: String): Unit = {
    val tmp = tmpDir(snapDir)
    val man = Paths.get(s"$tmp/.merge_manifest")
    if (!Files.exists(man)) return
    Files.readAllLines(man).forEach { line =>
      val Array(k, mode) = line.split(":", 2)
      val target = Paths.get(s"$snapDir/part=$k")
      mode match {
        case "keep" =>
          val src = Paths.get(s"$tmp/part=$k")
          if (Files.exists(src)) {
            deleteTree(target)
            Files.move(src, target)
          }
        case "drop" => deleteTree(target)
      }
    }
    deleteTree(Paths.get(tmp))
  }

  /** Reader-side heal (the StateCompaction policy): complete a MANIFESTED
    * crashed swap — the state where some partitions' only copy lives in
    * the temp; leave an unmanifested temp alone (it may be a live
    * writer's work-in-progress, and the snapshot itself is still
    * complete). One existence probe when clean. */
  def healIfCrashed(snapDir: String): Unit = swapLock.synchronized {
    if (Files.exists(Paths.get(s"${tmpDir(snapDir)}/.merge_manifest")))
      finishSwap(snapDir)
  }

  /** The reader's view of a merged snapshot: healed, live rows only —
    * tombstones are the MERGE's bookkeeping, never a query's input. */
  def liveDocs(s: SparkSession, dir: String): DataFrame = {
    healIfCrashed(dir)
    s.read.parquet(dir).filter(!col("tomb"))
  }

  /** The q75 ledger over a merged snapshot: per-partition doc/token
    * counts, id sum, and min/max content fingerprints — exact ints and
    * md5 strings, so the DuckDB oracle (which derives the same end state
    * from the documents table directly) hash-matches bit-for-bit. */
  def mergedLedger(s: SparkSession, dir: String): DataFrame =
    liveDocs(s, dir)
      .groupBy(col("part").cast(LongType).as("part"))
      .agg(count(lit(1)).as("n_docs"),
           sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("n_tokens"),
           sum(col("doc_id")).as("id_sum"),
           min(md5(col("text"))).as("first_fp"),
           max(md5(col("text"))).as("last_fp"))
      .orderBy("part")

  private def hash(sfDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|$NParts|$Tag".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)

  /** Ensure the merged snapshot for `sfDir` exists: base build + one
    * delta apply, content-addressed + marker-cached (built once per
    * config, like BucketedLayout/ZOrderLayout; the marker is written
    * only after the apply completes, so a crash mid-build restarts the
    * whole lifecycle from a clean slate). */
  def ensureMerged(s: SparkSession, sfDir: String): String = synchronized {
    val h = hash(sfDir)
    val dir = s"/root/repo/target/snapmerge/$h/snap"
    val marker = Paths.get(s"/root/repo/target/snapmerge/$h/_merged_ok")
    if (!Files.exists(marker)) {
      // restart-from-scratch: a stale temp from a crashed prior build
      // must not be completed against the FRESH base we are about to
      // write (its manifest predates it) — discard, then rebuild
      swapLock.synchronized(deleteTree(Paths.get(tmpDir(dir))))
      writeBase(s, sfDir, dir)
      applyDiff(s, dir, delta(s, sfDir))
      Files.writeString(marker, "ok")
    }
    dir
  }
}
