package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables._
import graft.Tuning.BoundedSortOps

/** Training-data PREPARATION operators — the pipeline stages that sit
  * between a cleaned/deduped corpus (TextOps) and the training job itself:
  * PII scrubbing, domain-mixture reweighting, and sequence packing.
  *
  * Like TextOps, everything is codegen'd built-ins (regexp_*, window
  * aggregates over exact integer counts) — no UDFs — and every ratio is a
  * per-row double division of exact integers, so results are
  * engine-independent and oracle-exact.
  */
object PipelineOps {
  type Q = (SparkSession, String) => DataFrame

  private val TOKENS = "split(text, ' ')"

  // ------------------------------------------------------------ PII scrub
  /** Redaction patterns, shared verbatim with the DuckDB oracle text so
    * both engines run the same regexes. Kept to the RE2 ∩ java.util.regex
    * common dialect (char classes, bounded repetition, non-capturing
    * groups, `\b`) — no backreferences or lookaround, which RE2 lacks.
    * Counts are computed per-pattern on the ORIGINAL text; the redacted
    * string applies the three replacements in a fixed order
    * (email → ip → phone), so overlapping matches across patterns are
    * order-defined (and identically ordered in the oracle). */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re  = "\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b"
  private val PhoneRe = "\\+?\\d{3}[-. ]?\\d{3}[-. ]?\\d{4}\\b"

  /** Per-document PII detection + redaction — the scrubbing pass every
    * public-corpus pipeline runs before training (C4/RefinedWeb-style):
    * count email / IPv4 / phone matches and emit the text with each
    * replaced by a typed placeholder.
    *
    * Shape at scale: purely row-local (regexp_count / regexp_replace are
    * codegen'd), no shuffle except the presentation sort — a 100 TB corpus
    * maps partition-by-partition with zero state. */
  val q60_pii_scrub: Q = (s, d) =>
    documents(s, d)
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("text"), lit(Ipv4Re)).as("n_ips"),
        regexp_count(col("text"), lit(PhoneRe)).as("n_phones"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>").as("redacted"))
      .withColumn("clean_chars", length(col("redacted")).cast(LongType))
      .orderBy("doc_id")

  // ------------------------------------------------- domain-mixture weights
  /** Per-source sampling weights toward a UNIFORM target mixture — the
    * domain-reweighting step of corpus assembly (the Pile / Dolma shape:
    * actual token share per source vs a target share, weight = the
    * sampling/repetition factor, capped at a max-epochs guard so no tiny
    * source is upsampled without bound).
    *
    * Shape at scale: ONE partial-aggregated groupBy(source) over a single
    * corpus scan — reducer state is one row per source — then the totals
    * as an unpartitioned window over that tiny (n_sources-row) aggregate.
    * (Deriving the totals as a second aggregate of the same builder would
    * make Catalyst scan the corpus twice — subplans aren't reused across
    * DataFrame branches.) Every derived column is per-row arithmetic on
    * exact integer counts (no double summation anywhere), so the doubles
    * are bit-equal across engines and partitionings. */
  val q61_domain_mixture: Q = (s, d) => {
    val all = Window.partitionBy() // n_sources rows: single partition is the point
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val actual = col("toks").cast(DoubleType) / col("tot").cast(DoubleType)
    val weight = (lit(1.0) / col("ns").cast(DoubleType)) / actual
    documents(s, d)
      .select(col("source"), expr(s"size($TOKENS)").cast(LongType).as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"), sum(col("n_tok")).as("toks"))
      .withColumn("tot", sum(col("toks")).over(all))
      .withColumn("ns", count(lit(1)).over(all))
      .select(col("source"), col("docs"), col("toks"),
              actual.as("actual_share"),
              weight.as("weight"),
              least(weight, lit(5.0)).as("epochs"))
      .boundedOrderBy("source")
  }

  // ------------------------------------------------------ sequence packing
  /** Greedy sequence packing: concatenate each shard's documents in doc_id
    * order and cut the token stream into fixed windows of [[SeqLen]]
    * tokens; a document belongs to the chunk containing its FIRST token.
    * Emits per-chunk accounting (docs, tokens, doc-id span) — the manifest
    * a training loader consumes.
    *
    * Packing a single global stream is inherently sequential, so the
    * stream is sharded first (`doc_id % `[[PackShards]], per source) and
    * each shard packs independently — exactly how a production pipeline
    * shards a 100 TB corpus into loader files. The running count is a
    * window sum of exact integers PARTITION BY (source, shard) ORDER BY
    * doc_id with explicit ROWS framing: deterministic, parallel across
    * shards, and skew-free (shards are hash-uniform in doc_id). */
  val SeqLen     = 2048L
  val PackShards = 8L

  val q62_sequence_pack: Q = (s, d) => {
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(s, d)
      .select(col("doc_id"), col("source"),
              pmod(col("doc_id"), lit(PackShards)).as("shard"),
              expr(s"size($TOKENS)").cast(LongType).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("chunk_id", expr(s"(cum - n_tok) div $SeqLen"))
      .groupBy("source", "shard", "chunk_id")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("n_tokens"),
           min(col("doc_id")).as("first_doc"),
           max(col("doc_id")).as("last_doc"))
      .orderBy("source", "shard", "chunk_id")
  }

  // ------------------------------------------- temperature-scaled mixture
  /** Temperature-scaled domain mixture (the Pile/Dolma T-sampling shape,
    * T = 0.5): target share ∝ actual_share^T, which upweights small
    * sources less aggressively than q61's uniform target. weight =
    * target/actual, with the same max-epochs cap.
    *
    * Float discipline: the normalizer Z = Σ_s sqrt(share_s) is a DOUBLE
    * sum, so its accumulation order must be pinned for oracle parity —
    * the per-source rows are collected into a SOURCE-SORTED array
    * (sources are a fixed small domain; the collect is bounded by it,
    * same class as IvfIndex's K-bounded centroid pull) and Z is an
    * in-row left fold (`aggregate` ≡ DuckDB `list_reduce`, the q40
    * pattern), so every double op replays in the same order. sqrt is
    * correctly rounded in both engines (T = 0.5 is chosen over an
    * arbitrary pow for exactly that guarantee). */
  val q71_temperature_mix: Q = (s, d) => {
    val perSource = documents(s, d)
      .select(col("source"), expr(s"size($TOKENS)").cast(LongType).as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"), sum(col("n_tok")).as("toks"))
    perSource
      .agg(array_sort(collect_list(struct(col("source"), col("docs"), col("toks"))))
             .as("arr"),
           sum(col("toks")).as("tot"))
      .withColumn("z", expr(
        """aggregate(arr, CAST(0 AS DOUBLE),
             (acc, x) -> acc + sqrt(CAST(x.toks AS DOUBLE) / CAST(tot AS DOUBLE)))"""))
      .select(explode(col("arr")).as("x"), col("tot"), col("z"))
      .select(col("x.source").as("source"), col("x.docs").as("docs"),
              col("x.toks").as("toks"),
              (col("x.toks").cast(DoubleType) / col("tot").cast(DoubleType)).as("share"),
              (sqrt(col("x.toks").cast(DoubleType) / col("tot").cast(DoubleType)) / col("z"))
                .as("t_share"))
      .withColumn("weight", col("t_share") / col("share"))
      .withColumn("epochs", least(col("weight"), lit(5.0)))
      .boundedOrderBy("source")
  }

  // ------------------------------------------------- deterministic shards
  /** Deterministic training-shard assignment + manifest — the EXPORT step
    * of corpus assembly: every document lands in shard
    * `md5(doc_id) mod `[[NShards]], documents order within a shard by
    * their full content-independent hash (a reproducible global shuffle —
    * the same property q56/q57 use: any engine, any partitioning, any
    * re-run derives the identical layout, so a training job is exactly
    * reproducible from the manifest alone). The query is the manifest a
    * loader consumes: per-shard doc/token counts plus the hash span
    * (min/max over the order key — restart bookkeeping for resumable
    * ingestion).
    *
    * Shape at scale: one hash-partitioned exchange on the shard key (md5
    * is uniform, so shards are balanced by construction — no salting
    * needed), aggregate state is one row per shard. [[writeShards]] is
    * the materializing twin: same assignment, `partitionBy(shard)` layout
    * with hash-sorted rows inside each shard file. */
  val NShards = 16L

  private def shardCols(df: DataFrame): DataFrame = {
    // first md5 byte as int (the q38/q57 hash idiom) → mod NShards; the
    // ORDER key is the full 32-hex digest (lowercase in both engines)
    df.withColumn("h", md5(col("doc_id").cast(StringType)))
      .withColumn("shard", pmod(conv(substring(col("h"), 1, 2), 16, 10).cast(LongType), lit(NShards)))
  }

  val q70_shards: Q = (s, d) =>
    shardCols(documents(s, d)
        .select(col("doc_id"), expr(s"size($TOKENS)").cast(LongType).as("n_tok")))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("n_tokens"),
           min(col("h")).as("first_h"),
           max(col("h")).as("last_h"))
      .boundedOrderBy("shard")

  /** Materialize the sharded layout: `out/shard=K/` parquet, rows
    * hash-ordered inside each shard — the loader-consumable twin of
    * [[q70_shards]]'s manifest (PipelineOpsSpec round-trips the two). */
  def writeShards(s: SparkSession, d: String, out: String): Unit =
    shardCols(documents(s, d))
      // hash-repartition on the shard VALUE: all rows of a shard land in
      // one task ⇒ exactly one file per shard dir, so the in-file sort IS
      // the shard's global hash order (the spec's binary-resume property).
      // The cost is write-skew when two shard values hash to one of the
      // NShards partitions — bounded at 2-3 shards/task, and preferred
      // over range partitioning, which balances tasks but can split a
      // shard across files and leave the dir's order a listing-order
      // artifact.
      .repartition(NShards.toInt, col("shard"))
      .sortWithinPartitions(col("shard"), col("h"))
      .write.mode("overwrite").partitionBy("shard").parquet(out)

  // ------------------------------------------------------ snapshot diff
  /** Snapshot-to-snapshot corpus diff — the change-tracking step an
    * incremental pipeline runs between deliveries (which documents were
    * added / removed / revised since the last snapshot decides what
    * downstream stages must reprocess; a full-rebuild ETL like the
    * reference's sidesteps this, a 100 TB pipeline cannot). Two
    * snapshots are DERIVED deterministically from the documents table
    * (old: every doc_id % 7 ≠ 6; new: every doc_id % 5 ≠ 4, with every
    * 11th doc's text revised) so the DuckDB oracle replays the identical
    * construction; the operator itself is snapshot-agnostic.
    *
    * Shape at scale: row-local md5 fingerprints on each side, ONE
    * full-outer equi-join shuffle on doc_id, aggregate to a 4-row
    * ledger. In production the per-delivery (doc_id, fp, n_tok) manifest
    * is persisted at ingest (q70's pattern), so the diff scans two
    * narrow manifests and never re-reads text. */
  val q72_snapshot_diff: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"), col("text"),
      expr(s"size($TOKENS)").cast(LongType).as("tok"))
    val old = docs.filter(col("doc_id") % 7 =!= 6)
      .select(col("doc_id").as("o_id"), md5(col("text")).as("o_fp"),
              col("tok").as("o_tok"))
    val neu = docs.filter(col("doc_id") % 5 =!= 4)
      .withColumn("text2",
        when(col("doc_id") % 11 === 0, upper(col("text"))).otherwise(col("text")))
      .select(col("doc_id").as("n_id"), md5(col("text2")).as("n_fp"),
              col("tok").as("n_tok"))
    old.join(neu, col("o_id") === col("n_id"), "full_outer")
      .withColumn("status",
        when(col("o_id").isNull, lit("added"))
          .when(col("n_id").isNull, lit("removed"))
          .when(col("o_fp") =!= col("n_fp"), lit("changed"))
          .otherwise(lit("unchanged")))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"),
           sum(coalesce(col("n_tok"), col("o_tok"))).as("n_tokens"),
           sum(coalesce(col("n_id"), col("o_id"))).as("id_sum"))
      .boundedOrderBy("status")
  }

  // ---------------------------------------------------- incremental merge
  /** Partition-pruned incremental merge (sources/SnapshotMerge): q72
    * computes WHAT changed between snapshots; this APPLIES a CDC delta
    * (today's crawl + churn-band revisions/takedowns) to the persisted
    * previous snapshot, rewriting only the partitions the delta touches —
    * the copy-on-write `MERGE INTO` a 100 TB store runs per delivery
    * instead of the reference's full rebuild. The emitted ledger
    * aggregates the MERGED LAYOUT on disk (per-partition counts, id sum,
    * min/max content fingerprints); the oracle derives the same end state
    * from the documents table from first principles, so the hash-match
    * proves the incremental apply landed exactly what a full recompute
    * would have — the whole contract of MERGE. File-level audit (only
    * touched partitions rewritten, crash-forward swap) is pinned in
    * SnapshotMergeSpec. */
  val q75_merge_apply: Q = (s, d) =>
    graft.sources.SnapshotMerge.mergedLedger(
      s, graft.sources.SnapshotMerge.ensureMerged(s, d))

  // --------------------------------------------------------------- registry
  val queries: Map[String, Q] = Map(
    "q60_pii_scrub"       -> q60_pii_scrub,
    "q61_domain_mixture"  -> q61_domain_mixture,
    "q62_sequence_pack"   -> q62_sequence_pack,
    "q70_shards"          -> q70_shards,
    "q71_temperature_mix" -> q71_temperature_mix,
    "q72_snapshot_diff"   -> q72_snapshot_diff,
    "q75_merge_apply"     -> q75_merge_apply
  )

  val oracles: Map[String, String] = Map(
    // q75's Spark side reads the MERGED LAYOUT the incremental apply
    // produced; the oracle derives the same end state directly from the
    // documents table (base ∪ new crawl, churn-band revisions applied,
    // takedowns removed — SnapshotMerge's rules verbatim: B = (mx·4)//5,
    // R = (mx·7)//10, revise %11, delete %13∧¬%11, part = (id·16)//(mx+1)).
    // Exact ints + md5 strings → bit-exact across engines.
    "q75_merge_apply" ->
      s"""WITH m AS (SELECT MAX(doc_id) AS mx FROM documents),
         f AS (SELECT doc_id,
                 CASE WHEN doc_id > (mx*7)//10 AND doc_id <= (mx*4)//5
                           AND doc_id % 11 = 0
                      THEN upper(text) ELSE text END AS text,
                 (doc_id * ${graft.sources.SnapshotMerge.NParts}) // (mx + 1) AS part
               FROM documents, m
               WHERE NOT (doc_id > (mx*7)//10 AND doc_id <= (mx*4)//5
                          AND doc_id % 13 = 0 AND doc_id % 11 != 0))
         SELECT part, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           MIN(md5(text)) AS first_fp, MAX(md5(text)) AS last_fp
         FROM f GROUP BY part ORDER BY part""",

    // same snapshot construction, same md5-of-UTF8 fingerprints (case
    // revision via upper() — ASCII corpus, parity proven by q33's
    // lower()), same full-outer join; sums are exact ints
    "q72_snapshot_diff" ->
      """WITH docs AS (SELECT doc_id, text,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
         o AS (SELECT doc_id AS o_id, md5(text) AS o_fp, tok AS o_tok
               FROM docs WHERE doc_id % 7 != 6),
         n AS (SELECT doc_id AS n_id,
                 md5(CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END) AS n_fp,
                 tok AS n_tok
               FROM docs WHERE doc_id % 5 != 4)
         SELECT CASE WHEN o_id IS NULL THEN 'added'
                     WHEN n_id IS NULL THEN 'removed'
                     WHEN o_fp != n_fp THEN 'changed'
                     ELSE 'unchanged' END AS status,
           COUNT(*) AS n_docs,
           CAST(SUM(COALESCE(n_tok, o_tok)) AS BIGINT) AS n_tokens,
           CAST(SUM(COALESCE(n_id, o_id)) AS BIGINT) AS id_sum
         FROM o FULL OUTER JOIN n ON o_id = n_id
         GROUP BY 1 ORDER BY 1""",

    // same exact-int aggregation, same source-sorted struct list, same
    // 0-init left fold for Z (list_reduce ≡ aggregate), same per-row
    // double ops — bit-exact across engines (sqrt correctly rounded)
    "q71_temperature_mix" ->
      """WITH t AS (SELECT source, COUNT(*) AS docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
           FROM documents GROUP BY 1),
         one AS (SELECT list_sort(list({'source': source, 'docs': docs, 'toks': toks})) AS arr,
           CAST(SUM(toks) AS BIGINT) AS tot FROM t),
         zc AS (SELECT arr, tot,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(arr, x -> sqrt(CAST(x.toks AS DOUBLE) / CAST(tot AS DOUBLE)))),
             (acc, v) -> acc + v) AS z FROM one),
         e AS (SELECT unnest(arr) AS x, tot, z FROM zc)
         SELECT x.source AS source, x.docs AS docs, x.toks AS toks,
           CAST(x.toks AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
           sqrt(CAST(x.toks AS DOUBLE) / CAST(tot AS DOUBLE)) / z AS t_share,
           (sqrt(CAST(x.toks AS DOUBLE) / CAST(tot AS DOUBLE)) / z)
             / (CAST(x.toks AS DOUBLE) / CAST(tot AS DOUBLE)) AS weight,
           LEAST((sqrt(CAST(x.toks AS DOUBLE) / CAST(tot AS DOUBLE)) / z)
             / (CAST(x.toks AS DOUBLE) / CAST(tot AS DOUBLE)), 5.0) AS epochs
         FROM e ORDER BY source""",

    // same hash (md5 of the decimal doc_id string), same first-byte mod
    // rule, same lexicographic min/max over the lowercase hex digest
    "q70_shards" ->
      s"""WITH t AS (SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR)) AS h,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents)
         SELECT ('0x' || substring(h, 1, 2))::BIGINT % $NShards AS shard,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(h) AS first_h, MAX(h) AS last_h
         FROM t GROUP BY 1 ORDER BY 1""",

    // same regexes (shared Scala constants), same replacement order; 'g'
    // flag = replace-all to match Spark's regexp_replace semantics
    "q60_pii_scrub" ->
      s"""SELECT doc_id,
         CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
         CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS INT) AS n_ips,
         CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS n_phones,
         regexp_replace(regexp_replace(regexp_replace(text,
           '$EmailRe', '<EMAIL>', 'g'),
           '$Ipv4Re', '<IP>', 'g'),
           '$PhoneRe', '<PHONE>', 'g') AS redacted,
         CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
           '$EmailRe', '<EMAIL>', 'g'),
           '$Ipv4Re', '<IP>', 'g'),
           '$PhoneRe', '<PHONE>', 'g')) AS BIGINT) AS clean_chars
         FROM documents ORDER BY doc_id""",

    // identical arithmetic shape: every double is derived per-row from the
    // exact integer counts (toks, tot, ns) in the same operation order
    "q61_domain_mixture" ->
      """WITH t AS (SELECT source, COUNT(*) AS docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
           FROM documents GROUP BY 1),
         tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS tot, COUNT(*) AS ns FROM t)
         SELECT source, docs, toks,
           CAST(toks AS DOUBLE) / CAST(tot AS DOUBLE) AS actual_share,
           (1.0 / CAST(ns AS DOUBLE)) / (CAST(toks AS DOUBLE) / CAST(tot AS DOUBLE))
             AS weight,
           LEAST((1.0 / CAST(ns AS DOUBLE)) / (CAST(toks AS DOUBLE) / CAST(tot AS DOUBLE)),
                 5.0) AS epochs
         FROM t, tot ORDER BY source""",

    // same shard rule (doc_id % 8; ids are non-negative so % == pmod),
    // same ROWS-framed running sum, same integer floor division
    "q62_sequence_pack" ->
      s"""WITH t AS (SELECT doc_id, source, doc_id % $PackShards AS shard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         c AS (SELECT *, CAST(SUM(n_tok) OVER (PARTITION BY source, shard
           ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t)
         SELECT source, shard, (cum - n_tok) // $SeqLen AS chunk_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
  )
}
