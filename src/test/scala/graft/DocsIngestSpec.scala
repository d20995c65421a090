package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.DocsIngest

/** Streaming corpus ingestion: the canonical-dedup aggregation must equal
  * its batch twin on the full corpus, and must reach the same table when
  * the corpus arrives as MULTIPLE deliveries (the incremental path — each
  * micro-batch folds into keyed state; the result is delivery-order
  * independent because the survivor is min(doc_id), not first-arrival). */
class DocsIngestSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def batchCanonical(docs: DataFrame): Set[(String, Long, Long)] =
    docs
      .select(col("doc_id"),
              md5(regexp_replace(lower(trim(col("text"))), " +", " ")).as("fp"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("canonical_id"),
           count(lit(1)).as("n_replicas"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  /** The streaming file source matches LEAF FILE names (pathGlobFilter),
    * so a delivery must be an actual `documents_*.parquet` file — write
    * via a staging dir and move the single part file in, exactly how a
    * crawl delivery lands as a file drop. */
  private def deliver(df: DataFrame, dir: String, name: String): Unit = {
    val staging = java.nio.file.Files.createTempDirectory("docs_staging")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = java.nio.file.Files.list(staging).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")).head
    java.nio.file.Files.move(
      java.nio.file.Paths.get(part),
      java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("streaming canonical dedup equals the batch twin on the full corpus") {
    val streamed = DocsIngest.runCanonicalDedup(spark, sf, "docs_canonical_full")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = batchCanonical(Tables.documents(spark, sf))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("two-delivery arrival reaches the same canonical table as one batch") {
    import spark.implicits._
    // replica families STRADDLE the deliveries, and family B's minimum id
    // (10) arrives only in delivery 2 — the canonical id must be REVISED
    // by the later micro-batch (min-id semantics, not first-arrival-wins)
    val a = "alpha beta gamma delta epsilon"
    val b = "zeta eta theta iota kappa"
    val rows = Seq(
      (20L, b), (21L, a), (23L, b),            // delivery 1
      (10L, b), (22L, a), (30L, "unique text entirely") // delivery 2
    ).map { case (id, t) => (id, t, "en", "test", t.length.toLong) }
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("docs_ingest").toString
    deliver(df.filter(col("doc_id") >= 20 && col("doc_id") <= 23 && col("doc_id") =!= 22),
            dir, "documents_d1.parquet")
    val q = DocsIngest.startCanonicalDedup(spark, dir, "docs_canonical_inc")
    try {
      q.processAllAvailable()
      val afterD1 = spark.table("docs_canonical_inc")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(afterD1.map(x => (x._2, x._3)) == Set((21L, 1L), (20L, 2L)))
      deliver(df.filter(col("doc_id") === 10 || col("doc_id") === 22 || col("doc_id") === 30),
              dir, "documents_d2.parquet")
      q.processAllAvailable()
      val streamed = spark.table("docs_canonical_inc")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batchCanonical(df),
        "incremental two-delivery result diverges from the one-shot batch table")
      // family b's canonical id was revised 20 -> 10 by delivery 2
      assert(streamed.map(x => (x._2, x._3)).contains((10L, 3L)))
    } finally q.stop()
  }
}
