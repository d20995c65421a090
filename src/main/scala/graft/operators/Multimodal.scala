package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._
import graft.Tuning.BoundedSortOps

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * with a decode/feature-extract stage as a partition-wise typed operator.
  *
  * The real pipeline shape at 100 TB: media blobs live in a binary column
  * (or object-store pointers), metadata in a sibling struct; decoding runs
  * batched per partition so a codec library initializes once per task, not
  * per row — the Scala analog of `mapInPandas` batch semantics. The codec
  * itself is STUBBED here (no image/audio libs in this container): features
  * are deterministic functions of the raw bytes, so tests stay exact. The
  * Spark-side plumbing — schema, partitioning, batch shape — is real.
  *
  * Test payloads derive from documents.text (UTF-8 bytes): the driver
  * testdata carries no true media column.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Documents with an opaque binary payload + metadata struct — the
    * storage schema of a multimodal corpus. */
  def binaryized(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      col("source"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        lit("text/plain").as("mime"),
        col("lang").as("lang")).as("meta"))

  /** Decoded "features" — one row per payload, batched per partition. */
  case class MediaFeatures(doc_id: Long, source: String, n_bytes: Int,
                           byte_sum: Long, fake_channels: Int, fake_frames: Int)

  /** STUB decode: a real implementation would initialize a codec per
    * partition (e.g. JNI image decoder) and emit per-frame tensors. The
    * stub derives deterministic pseudo-features from the bytes; the
    * partition-wise batching, schema and typed signature are the real
    * contract. */
  def decodeFeatures(binDf: DataFrame): Dataset[MediaFeatures] = {
    import binDf.sparkSession.implicits._
    binDf.select(col("doc_id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE (codec/handles), once per task
        it.map { case (id, src, bytes) =>
          var s = 0L; var i = 0
          while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
          MediaFeatures(id, src, bytes.length, s,
            fake_channels = 1 + (s % 3).toInt,
            fake_frames = 1 + (bytes.length % 7))
        }
      }
  }

  /** Metadata query over the binary corpus: per source, payload volume and
    * distinct-blob count — SQL-expressible ⇒ oracle-checked. */
  val q44_multimodal_meta: Q = (s, d) =>
    binaryized(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_items"),
           sum(col("meta.n_bytes")).as("total_bytes"),
           countDistinct(md5(col("payload"))).as("n_unique_blobs"))
      .boundedOrderBy("source")

  /** Feature-extraction query through the typed decode stage. The stub
    * features are deterministic byte functions, so they ARE SQL-expressible
    * (byte_sum = fold over the payload's hex pairs) — oracle-checked, which
    * pins the whole mapPartitions plumbing, not just its row count. */
  val q45_multimodal_features: Q = (s, d) =>
    decodeFeatures(binaryized(s, d)).toDF()
      .groupBy("source")
      .agg(count(lit(1)).as("n_items"),
           sum(col("byte_sum")).as("total_byte_sum"),
           sum(col("fake_frames")).as("total_frames"))
      .boundedOrderBy("source")

  val queries: Map[String, Q] = Map(
    "q44_multimodal_meta"     -> q44_multimodal_meta,
    "q45_multimodal_features" -> q45_multimodal_features,
  )

  val oracles: Map[String, String] = Map(
    // encode() in DuckDB turns VARCHAR into its UTF-8 BLOB; md5 of the text
    // hashes the same bytes Spark's md5(binary) sees.
    "q44_multimodal_meta" ->
      """SELECT source, COUNT(*) AS n_items,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           COUNT(DISTINCT md5(text)) AS n_unique_blobs
         FROM documents GROUP BY source ORDER BY source""",

    // byte_sum replayed as a fold over the payload's hex pairs: exact
    // integer arithmetic, so the mapPartitions decode stage is value-checked
    "q45_multimodal_features" ->
      """WITH f AS (
           SELECT source,
             CASE WHEN octet_length(encode(text)) = 0 THEN 0
                  ELSE list_reduce(
                    list_transform(generate_series(1, octet_length(encode(text))),
                      i -> CAST(('0x' || substr(hex(encode(text)), i * 2 - 1, 2)) AS BIGINT)),
                    (a, b) -> a + b)
             END AS byte_sum,
             1 + octet_length(encode(text)) % 7 AS fake_frames
           FROM documents)
         SELECT source, COUNT(*) AS n_items,
           CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum,
           CAST(SUM(fake_frames) AS BIGINT) AS total_frames
         FROM f GROUP BY source ORDER BY source""",
  )
}
