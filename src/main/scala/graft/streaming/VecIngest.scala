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
    graft.functions.DotProduct.register(s)
    val vecs = batch.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cent = IvfIndex.centroids(s, indexDir)
    IvfIndex.assign(vecs, cent)
      .select(col("vec_id"), col("v"),
        sqrt(graft.functions.DotProduct.dot_product(col("v"), col("v"))).as("norm"),
        col("cid"))
      .repartition(col("cid")).write.mode("overwrite")
      .partitionBy("cid").parquet(s"$deltaDir/bid=$batchId")
  }

  /** Start the maintenance stream: every delivery in `dropDir` is
    * assigned against `indexDir`'s centroids into `deltaDir`. */
  def start(spark: SparkSession, dropDir: String, indexDir: String,
            deltaDir: String, checkpoint: String): StreamingQuery =
    source(spark, dropDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        assignBatch(b, indexDir, deltaDir, id)
      }
      .start()

  /** Base + delta assignments as one frame — what search reads. The
    * delta rows carry the identical (vec_id, v, norm, cid) schema, so
    * every consumer of [[IvfIndex.assignments]] can take this instead;
    * cid stays a partition column in both layouts (pruning intact). */
  def assignmentsWithDelta(s: SparkSession, indexDir: String,
                           deltaDir: String): DataFrame = {
    val base = IvfIndex.assignments(s, indexDir)
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(deltaDir)))
      base
    else {
      val delta = s.read.parquet(deltaDir)
        .select("vec_id", "v", "norm", "cid")
      base.select("vec_id", "v", "norm", "cid").unionByName(delta)
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
