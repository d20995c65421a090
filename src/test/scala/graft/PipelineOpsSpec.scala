package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.PipelineOps

class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  /** A documents table with known PII / mixture / packing structure,
    * written where the queries can read it. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("pipedocs").toString
    Seq(
      (0L, "mail me at bob@example.com or call 555-123-4567 now", "en", "web"),
      (1L, "server 192.168.0.1 and 10.0.0.255 are down", "en", "web"),
      (2L, "totally clean text with no identifiers at all here", "en", "web"),
      (3L, "two mails a@b.io c@d.org one ip 8.8.8.8", "en", "books"),
      (4L, "short doc", "en", "books")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("every pipeline query returns rows") {
    PipelineOps.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q60 pii scrub: counts and redacted text on constructed docs") {
    val rows = PipelineOps.q60_pii_scrub(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(rows(0L)._1 == 1 && rows(0L)._3 == 1)
    assert(rows(0L)._4 == "mail me at <EMAIL> or call <PHONE> now")
    assert(rows(1L)._2 == 2)
    assert(rows(1L)._4 == "server <IP> and <IP> are down")
    assert(rows(2L) == ((0, 0, 0, "totally clean text with no identifiers at all here")))
    assert(rows(3L)._1 == 2 && rows(3L)._2 == 1)
    assert(rows(3L)._4 == "two mails <EMAIL> <EMAIL> one ip <IP>")

    // real corpus: row-per-doc, and redaction never grows char counts
    // without a matching count (clean docs pass through byte-identical)
    val q = PipelineOps.q60_pii_scrub(spark, sf)
    assert(q.count() == Tables.documents(spark, sf).count())
    assert(q.filter(col("n_emails") + col("n_ips") + col("n_phones") === 0)
      .join(Tables.documents(spark, sf), "doc_id")
      .filter(col("redacted") =!= col("text")).count() == 0)
  }

  test("q61 mixture weights: shares sum to 1, weights invert shares, cap holds") {
    // constructed: web has 23 tokens-worth of docs vs books' 9 → known shares
    val m = PipelineOps.q61_domain_mixture(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(m.keySet == Set("web", "books"))
    val (wd, wt) = (m("web")._1, m("web")._2)
    assert(wd == 3 && wt == 23) // 8 + 6 + 9 tokens
    assert(m("books")._2 == 9) // 7 + 2
    assert(math.abs(m("web")._3 - 23.0 / 32) < 1e-15)
    // weight * actual_share == target_share (= 1/2) exactly by construction
    assert(math.abs(m("web")._4 * m("web")._3 - 0.5) < 1e-15)

    val q = PipelineOps.q61_domain_mixture(spark, sf).collect()
    assert(math.abs(q.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(q.forall(r => r.getDouble(5) <= 5.0 + 1e-15))
    assert(q.forall(r => r.getDouble(5) <= r.getDouble(4) + 1e-15))
  }

  test("q62 sequence pack: conservation, contiguity, span ordering") {
    val q = PipelineOps.q62_sequence_pack(spark, sf).cache()
    // token conservation: packed totals equal the corpus token count
    val packed = q.agg(sum(col("n_tokens"))).head.getLong(0)
    val corpus = Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(packed == corpus)
    // chunk ids are contiguous 0..max within each shard (docs are shorter
    // than SeqLen, so a chunk can never be skipped)
    val bad = q.groupBy("source", "shard")
      .agg(min(col("chunk_id")).as("mn"), max(col("chunk_id")).as("mx"),
           countDistinct(col("chunk_id")).as("nc"))
      .filter(col("mn") =!= 0 || col("nc") =!= col("mx") + 1)
    assert(bad.count() == 0)
    // doc spans within a shard never overlap across consecutive chunks
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "shard").orderBy("chunk_id")
    assert(q.withColumn("prev_last", lag(col("last_doc"), 1).over(w))
      .filter(col("prev_last").isNotNull && col("first_doc") <= col("prev_last"))
      .count() == 0)
    q.unpersist()

    // constructed corpus with SeqLen-relative sizes is exercised via the
    // oracle gate (Verify/check_oracle); here assert the chunking math on
    // the tiny table: all docs are far below SeqLen → every (source,shard)
    // packs into a single chunk 0
    val tiny = PipelineOps.q62_sequence_pack(spark, dir).collect()
    assert(tiny.forall(_.getLong(2) == 0L))
    assert(tiny.map(_.getLong(3)).sum == 5) // all five docs accounted for
  }

  test("q71 temperature mixture: normalized target, softer than uniform") {
    val rows = PipelineOps.q71_temperature_mix(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // shares and temperature shares both normalize
    assert(math.abs(rows.values.map(_._1).sum - 1.0) < 1e-12)
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-12)
    // T = 0.5 upweights the minority source, but LESS than the uniform
    // target does (q61) — the point of temperature sampling
    val uni = PipelineOps.q61_domain_mixture(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    val minority = rows.minBy(_._2._1)._1
    assert(rows(minority)._3 > 1.0, "minority source must be upweighted")
    assert(rows(minority)._3 < uni(minority),
      s"temperature weight ${rows(minority)._3} should be softer than uniform ${uni(minority)}")
    // epochs cap
    assert(rows.values.forall(v => v._4 <= 5.0 && v._4 > 0))
  }

  test("q72 snapshot diff: constructed corpus hits every status exactly") {
    import spark.implicits._
    // snapshot rules: old = id%7≠6, new = id%5≠4, revised when id%11==0.
    //   0 → both, revised        → changed
    //   1,2,3 → both, unrevised  → unchanged
    //   4 → old only (4%5==4)    → removed
    //   6 → new only (6%7==6)    → added
    //   11 → both, 11%11==0      → changed
    val d = java.nio.file.Files.createTempDirectory("snapdocs").toString
    Seq(0L, 1L, 2L, 3L, 4L, 6L, 11L)
      .map(id => (id, s"lower case body of document $id", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val ledger = PipelineOps.q72_snapshot_diff(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(ledger == Map(
      "added" -> (1L, 6L), "removed" -> (1L, 4L),
      "changed" -> (2L, 11L), "unchanged" -> (3L, 6L)))
  }

  test("q70 shard manifest: rule recompute, totals, and writer round-trip") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // the assignment rule, reimplemented driver-side on the tiny corpus
    val expected = (0L to 4L).groupBy(id =>
      Integer.parseInt(md5hex(id.toString).take(2), 16) % PipelineOps.NShards)
      .map { case (s, ids) => s -> ids.size.toLong }
    val tiny = PipelineOps.q70_shards(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tiny == expected, s"got $tiny expected $expected")

    // real corpus: every doc in exactly one shard, shard ids in range,
    // token totals conserved
    val m = PipelineOps.q70_shards(spark, sf).collect()
    assert(m.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    assert(m.forall(r => r.getLong(0) >= 0 && r.getLong(0) < PipelineOps.NShards))
    val totalTok = Tables.documents(spark, sf)
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(m.map(_.getLong(2)).sum == totalTok)

    // writer round-trip: per-shard dirs match the manifest (count + hash
    // span) and rows inside each shard file are hash-ordered — the layout
    // a loader can binary-resume from
    val out = java.nio.file.Files.createTempDirectory("shards").toString + "/docs"
    PipelineOps.writeShards(spark, sf, out)
    m.foreach { r =>
      val (shard, n, firstH, lastH) =
        (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4))
      val hs = spark.read.parquet(s"$out/shard=$shard")
        .select("h").collect().map(_.getString(0))
      assert(hs.length == n, s"shard $shard count")
      assert(hs.head == firstH && hs.last == lastH, s"shard $shard span")
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, s"shard $shard order")
    }
  }
}
