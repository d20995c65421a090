package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.IvfIndex

/** Streaming ANN-index MAINTENANCE — the vector-side twin of
  * [[DocsIngest]].
  *
  * A production embedding store receives vectors as parquet drops (each
  * crawl delta is embedded and delivered); the IVF index must then be
  * maintained INCREMENTALLY. The split matches what 100 TB deployments
  * do: the coarse quantizer (the persisted centroids — also the search
  * oracle's boundary, see IvfIndex) is retrained only by a scheduled
  * batch rebuild; what must be incremental is ASSIGNMENT — a delivery is
  * assigned against the existing centroids in O(|delta|·K), not O(N·K),
  * and appended to the cell-partitioned layout. Search unions base +
  * delta cells transparently ([[assignmentsWithDelta]]).
  *
  * Assignment of a vector depends only on (vector, centroids), so the
  * streamed result is BIT-IDENTICAL to what the batch build's final pass
  * would produce for the same vectors (same sqdist doubles, same
  * (d2, cid) min_by tie order — it IS [[IvfIndex.assign]]); the
  * stream==batch equality is spec'd, not assumed (VecIngestSpec).
  *
  * Replay safety: foreachBatch may redeliver a batch after a failure;
  * each batch overwrites its own `bid=<batchId>` subdirectory (the
  * deterministic-target idempotent-sink pattern, as in DocsFunnel's
  * keyed writes), so a replay replaces rather than duplicates.
  */
object VecIngest {

  /** Pinned embeddings.parquet schema (streaming sources never infer). */
  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Streaming source over embedding parquet drops in `dir`. */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(embSchema)
      .option("pathGlobFilter", "embeddings*.parquet")
      .parquet(dir)

  /** Assign one delivery against the PERSISTED centroids of `indexDir`
    * and write it under `deltaDir/bid=<batchId>`, cell-clustered like
    * the base layout (one file per touched cell). Pure function of
    * (batch, centroids, batchId) — replay-safe via per-bid overwrite.
    * Runs everything on `batch.sparkSession` (the cloned micro-batch
    * session; see DocsFunnel's registry note). */
  private[graft] def assignBatch(batch: DataFrame, indexDir: String,
                                 deltaDir: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    graft.functions.Natives.registerAll(s)
    val vecs = batch.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cent = IvfIndex.centroids(s, indexDir)
    // v stored as array<float>, matching the base build's round-17 layout
    // (exact round-trip — the doubles are widenings of the raw floats);
    // assignmentsWithDelta unions base + delta, so the schemas must agree
    IvfIndex.assign(vecs, cent)
      .select(col("vec_id"),
        col("v").cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)).as("v"),
        sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))).as("norm"),
        col("cid"))
      .repartition(col("cid")).write.mode("overwrite")
      .partitionBy("cid").parquet(s"$deltaDir/bid=$batchId")
  }

  /** Start the maintenance stream: every delivery in `dropDir` is
    * assigned against `indexDir`'s centroids into `deltaDir`. */
  def start(spark: SparkSession, dropDir: String, indexDir: String,
            deltaDir: String, checkpoint: String): StreamingQuery = {
    StateCompaction.healIfCrashed(deltaDir)
    source(spark, dropDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        assignBatch(b, indexDir, deltaDir, id)
      }
      .start()
  }

  /** COMMITTED delta batch directories: `bid=<n>` subdirs carrying the
    * `_SUCCESS` marker their partitioned write commits last. Guarding on
    * these (not on bare directory existence) fixes two failure shapes: a
    * deltaDir created but never written (schema-inference error on an
    * empty read) and a half-written batch from a crash mid-write (a bare
    * read would union its partial files; the replaying stream will
    * overwrite that bid, but a concurrent reader must not see it). */
  private[graft] def committedBidDirs(deltaDir: String): Seq[String] =
    StateCompaction.committedKeyedDirs(deltaDir, "bid")

  /** Collected-liveness budget: the latest-wins filter below collects one
    * (vec_id, max bid, n) row per DISTINCT delta vector to the driver —
    * bounded by the DELTA (the incremental increment), never the corpus,
    * and gated here like the 1 M-edge union-find guard. A delta past this
    * bound has outgrown incremental maintenance — the deployment answer is
    * folding it into a base rebuild — but reads stay CORRECT meanwhile via
    * the join fallback. */
  val MaxCollectedIds = 1000000

  /** Base + delta assignments as one frame, LATEST-WINS by vec_id — what
    * search reads. The delta rows carry the identical (vec_id, v, norm,
    * cid) schema, so every consumer of [[IvfIndex.assignments]] can take
    * this instead; cid stays a partition column in both layouts.
    *
    * Upsert semantics: a vec_id re-delivered after the base build (a
    * revised embedding) supersedes its base row, and a later delivery
    * supersedes an earlier one — each vector appears EXACTLY ONCE, from
    * its highest bid (or base when never re-delivered). The liveness
    * predicates are deliberately ROW-LOCAL (`isInCollection` over the
    * driver-collected delta id set → InSet): a join-based dedup would sit
    * between the probed-cells join and the partitioned scans and break
    * the audited DPP pruning (UnionDppSpec), while Filter-over-Scan keeps
    * it intact — and dropping a superseded row is correct under pruning
    * exactly because the filter is cid-independent. Past
    * [[MaxCollectedIds]] distinct delta ids the code falls back to
    * anti/semi joins (correct, pruning degraded, rebuild overdue). */
  def assignmentsWithDelta(s: SparkSession, indexDir: String,
                           deltaDir: String,
                           maxCollectedIds: Int = MaxCollectedIds): DataFrame = {
    StateCompaction.healIfCrashed(deltaDir)
    val base = IvfIndex.assignments(s, indexDir)
      .select("vec_id", "v", "norm", "cid")
    val bidDirs = committedBidDirs(deltaDir)
    if (bidDirs.isEmpty) base
    else {
      // basePath keeps bid/cid as partition columns when reading the
      // committed subset of batch directories
      val delta = s.read.option("basePath", deltaDir).parquet(bidDirs: _*)
        .withColumn("bid", col("bid").cast(LongType))
      // lazily local-checkpointed: the take() below must run the full
      // aggregation anyway (it is a shuffle), so its blocks are stored
      // once and every later reference — the over-budget fallback's
      // anti/semi joins, the >64-redeliveries semi-join — reads them
      // instead of re-paying the delta aggregation (blocks are tiny
      // 3-long rows, reclaimed when the frame is unreferenced)
      val winsDf = delta.groupBy("vec_id")
        .agg(max(col("bid")).as("bid"), count(lit(1)).as("n"))
        .localCheckpoint(false)
      // ONE job decides the branch AND supplies the rows: take() caps the
      // collect at budget+1 (the former limit.count + collect pair ran the
      // whole delta aggregation twice on every search-side call)
      val wins = winsDf.take(maxCollectedIds + 1)
      if (wins.length > maxCollectedIds) {
        // join fallback: same semantics, no driver set
        base.join(winsDf.select("vec_id"), Seq("vec_id"), "left_anti")
          .unionByName(delta
            .join(winsDf.select("vec_id", "bid"), Seq("vec_id", "bid"), "left_semi")
            .select("vec_id", "v", "norm", "cid"))
      } else {
        val deltaIds = wins.map(_.getLong(0))
        // only vec_ids delivered in >1 batch need a bid check; with none
        // (the common append-only case) the delta branch reads unfiltered
        val dups = wins.filter(_.getLong(2) > 1L)
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val liveDelta =
          if (dups.isEmpty) delta
          else if (dups.size <= 64)
            // few re-deliveries (the realistic shape): a bounded OR-fold
            // stays one codegen'd row-local predicate
            delta.filter(!col("vec_id").isInCollection(dups.keys.toSeq) ||
              dups.foldLeft(lit(false)) { case (acc, (id, bid)) =>
                acc || (col("vec_id") === id && col("bid") === bid)
              })
          else
            // many re-deliveries: semi-join the winner pairs on the DELTA
            // branch only — the base branch (where DPP pruning pays) keeps
            // its row-local filter; the delta side is the small increment
            delta.join(winsDf.select("vec_id", "bid"),
              Seq("vec_id", "bid"), "left_semi")
        base.filter(!col("vec_id").isInCollection(deltaIds))
          .unionByName(liveDelta.select("vec_id", "v", "norm", "cid"))
      }
    }
  }

  // Search-side pruning note (audited, UnionDppSpec): Catalyst's dynamic
  // partition pruning DOES cross the base∪delta Union — a cid join above
  // assignmentsWithDelta plants a DPP filter on BOTH partitioned scans,
  // so a probe reads nprobe cells of each layout, not two full indexes —
  // PROVIDED the probing side carries a selective predicate (q46's
  // `rn <= nprobe` filter qualifies; a bare LIMIT does not trigger the
  // rule). No join-below-union rewrite is needed.
}
