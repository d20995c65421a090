package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables._
import graft.Tuning.BoundedSortOps
import graft.Num.money
import graft.functions.Md5Long.md5_long
import graft.functions.WordShingles.word_shingles
import graft.functions.WinnowKeys.winnow_keys

/** Text-analysis + document-dedup operators for large-scale training-data
  * pipelines, over the `documents` table.
  *
  * Everything here is built from codegen'd built-ins and higher-order array
  * functions — no UDFs — so the operators stay inside whole-stage codegen
  * and scale linearly with the corpus. Shingle-based operators carry an
  * explicit document-frequency cap (the standard anti-explosion guard for
  * MinHash/Jaccard pipelines at 100 TB: a stop-shingle appearing in millions
  * of documents would otherwise quadratically blow up the candidate join).
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  /** Modulus of the MinHash double-hashing family (prime < 2^48) — shared
    * by the Spark implementation and the DuckDB oracle text below. */
  private val MinhashP = 281474976710597L

  /** Tokenization used across the suite: documents are single-space joined
    * words (see TESTDATA.md). Kept identical in the DuckDB oracles. */
  private val TOKENS = "split(text, ' ')"

  /** Documents fanned out across the session's shuffle parallelism BEFORE
    * the expansion-heavy operators (shingling, token explode, per-doc
    * lambda pipelines). Rationale: partition by DOWNSTREAM EXPANSION, not
    * input bytes. The raw docs table is tiny relative to the ~100–400×
    * blow-up that shingling/exploding applies, so Spark's scan splits (and
    * AQE's byte-based coalescing) systematically under-provision the
    * compute that follows — at bench scale the whole pipeline would fuse
    * into a single-task scan stage (one parquet row group). One cheap
    * shuffle of (id, text) buys full-width parallelism for everything
    * downstream; the explicit partition count keeps AQE from coalescing
    * it away on byte-size grounds. The same holds on a 1000-executor
    * cluster: seed tables for expansion pipelines must be spread wide
    * before the expansion, not after. */
  private def docsWide(s: SparkSession, d: String): DataFrame = {
    graft.functions.Natives.registerAll(s)
    documents(s, d)
      .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
  }

  // ------------------------------------------------------ token statistics
  /** Token counting per language: corpus-level stats a data pipeline reports
    * before training (doc counts, token counts, chars/doc). */
  val q30_token_stats: Q = (s, d) =>
    documents(s, d)
      .select(col("lang"),
              expr(s"size($TOKENS)").as("n_tok"),
              col("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tok")).as("total_tokens"),
           (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
      .boundedOrderBy("lang")

  /** BPE-ish pre-tokenizer pattern, shared VERBATIM with the oracle (the
    * q60 regex discipline): GPT-2-shaped — contractions, space-glued
    * letter runs, digit runs, punctuation runs, residual whitespace —
    * restricted to the RE2 ∩ java.util.regex common dialect. RE2 has no
    * lookahead, so GPT-2's `\s+(?!\S)` tail is simplified to a plain
    * whitespace run (multi-space runs count as one token instead of
    * donating their last space to the next word): a documented BPE-ISH
    * approximation, chosen because engine-identical counting beats
    * tokenizer-exact counting that only one engine can replay.
    * Whitespace is the EXPLICIT class `[ \t\n\r\f]`, not `\s` — Java's
    * `\s` includes vertical tab (\x0B) and RE2's does not, so the
    * shorthand is precisely the kind of dialect edge this pattern must
    * avoid. Alternation order is significant and identical in both
    * engines (leftmost-first). */
  private[graft] val BpeRe =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+"

  /** Token accounting under BOTH counters — whitespace (what a naive
    * pipeline reports) and the BPE-ish pre-tokenizer (what a trainer's
    * tokenizer will actually see; contractions and punctuation split
    * out). The per-source ratio is the budget correction every
    * token-budgeted corpus plan applies. Row-local codegen'd regex, one
    * aggregation — zero extra shuffle at any corpus size. */
  val q76_bpe_token_stats: Q = (s, d) =>
    documents(s, d)
      .select(col("source"),
              expr(s"size($TOKENS)").cast(LongType).as("ws"),
              regexp_count(col("text"), lit(BpeRe)).cast(LongType).as("bpe"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
           sum(col("ws")).as("ws_tokens"),
           sum(col("bpe")).as("bpe_tokens"))
      .withColumn("bpe_per_ws",
        col("bpe_tokens").cast(DoubleType) / col("ws_tokens").cast(DoubleType))
      .boundedOrderBy("source")

  // ------------------------------------------------------- quality scoring
  /** Per-document quality signals: token count, type-token (distinct)
    * ratio, stopword ratio, mean token length — the standard cheap filters
    * before expensive dedup. All ratios are double divisions of exact
    * integer counts ⇒ engine-independent. */
  val q31_doc_quality: Q = (s, d) =>
    docsWide(s, d)
      .select(
        col("doc_id"), col("lang"),
        expr(s"size($TOKENS)").as("n_tokens"),
        expr(s"size(array_distinct($TOKENS))").as("n_distinct"),
        expr(s"size(filter($TOKENS, t -> t IN ('the', 'a')))").as("n_stop"),
        expr(s"aggregate(transform($TOKENS, x -> length(x)), 0, (acc, v) -> acc + v)")
          .as("sum_tok_len"))
      .select(
        col("doc_id"), col("lang"), col("n_tokens"),
        (col("n_distinct").cast(DoubleType) / col("n_tokens")).as("distinct_ratio"),
        (col("n_stop").cast(DoubleType) / col("n_tokens")).as("stop_ratio"),
        (col("sum_tok_len").cast(DoubleType) / col("n_tokens")).as("avg_tok_len"))
      .orderBy("doc_id")

  // ------------------------------------------------------- language ID
  /** Marker-word language ID (n-gram-style heuristic): score = marker hits
    * per candidate language, argmax with a fixed precedence. Confusion
    * matrix against the labeled `lang` column. */
  val q32_lang_id: Q = (s, d) => {
    def hits(words: String) =
      s"size(filter($TOKENS, t -> t IN ($words)))"
    docsWide(s, d)
      .select(col("lang"), col("doc_id"),
              expr(hits("'the', 'a', 'and'")).as("s_en"),
              expr(hits("'el', 'la', 'los'")).as("s_es"),
              expr(hits("'der', 'und', 'die'")).as("s_de"),
              expr(hits("'le', 'les', 'et'")).as("s_fr"),
              expr(hits("'的', '是', '在'")).as("s_zh"))
      .withColumn("predicted", expr(
        """CASE
             WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
             WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
             WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
             WHEN s_zh > 0 THEN 'zh'
             ELSE 'unknown' END"""))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .boundedOrderBy("lang", "predicted")
  }

  // ------------------------------------------------- exact dedup (hash)
  /** Exact near-dup-free count per language: md5 fingerprint of the
    * whitespace-normalized lowercased text, hash-groupBy dedup. At scale
    * this is one shuffle on the 128-bit fingerprint. */
  val q33_fingerprint_dedup: Q = (s, d) =>
    documents(s, d)
      .select(col("lang"), col("doc_id"),
              md5(regexp_replace(lower(trim(col("text"))), " +", " ")).as("fp"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("fp")).as("n_unique"),
           (count(lit(1)) - countDistinct(col("fp"))).as("n_dups"))
      .boundedOrderBy("lang")

  // ----------------------------------- winnowing fingerprints (rolling hash)
  /** Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003) over a Karp–Rabin ROLLING hash of word 3-grams — the
    * [[graft.functions.WinnowKeys]] native expression, one compiled O(n)
    * pass per document with no per-gram re-hashing.
    *
    * Output = the selected fingerprints, exploded to
    * `(doc_id, fp_hash, fp_pos)`. Winnowing guarantees any two documents
    * sharing ≥ W+k−1 = 6 consecutive tokens share a fingerprint hash, at
    * ~2/(W+1) the density of full shingling — the standard plagiarism /
    * substring-level-dedup index shape (MOSS). The whole pipeline is
    * row-local until the final presentation sort: at 100 TB the
    * fingerprint table is what you'd shuffle-join or group, never the
    * documents themselves.
    *
    * The DuckDB oracle recomputes the identical keys from the closed-form
    * Horner gram hash (same md5-slice token hash, same stepwise mod — every
    * intermediate < 2^51 in both engines) and winnows with a 4-row window
    * MIN, so the native rolling/deque implementation is pinned bit-exact
    * end to end. */
  val q39_winnow_fingerprints: Q = (s, d) => {
    graft.functions.Natives.registerAll(s)
    docsWide(s, d)
      .select(col("doc_id"), explode(winnow_keys(col("text"))).as("key"))
      .select(col("doc_id"),
              shiftright(col("key"), graft.functions.WinnowKeys.PosBits).as("fp_hash"),
              (lit((1L << graft.functions.WinnowKeys.PosBits) - 1) -
                col("key").bitwiseAND((1L << graft.functions.WinnowKeys.PosBits) - 1))
                .as("fp_pos"))
      .orderBy("doc_id", "fp_pos")
  }

  // ------------------------- winnow report: substring-level duplicate pairs
  /** The MOSS REPORT step over the q39 fingerprint index: document pairs
    * sharing enough winnow fingerprints, scored by CONTAINMENT
    * (`n_shared / min(|fp(a)|, |fp(b)|)`) rather than Jaccard resemblance —
    * containment is what catches a short document embedded verbatim inside
    * a long one (quote inclusion, partial copy, boilerplate wrapping),
    * which q34's symmetric Jaccard dilutes toward 0. Together q34/q35/q36
    * (whole-document resemblance) and q63 (substring containment) are the
    * two halves of a production text-dedup report.
    *
    * Shape at scale — identical discipline to the shingle pipeline:
    * fingerprints are deduped IN-ROW (`array_distinct` on the hash-only
    * array, no distinct shuffle), df-capped with the bounded
    * [[graft.functions.BoundedDocSetAgg]] aggregate (a fingerprint shared
    * by > [[WinnowDfCap]] docs is corpus boilerplate — dropped, exactly the
    * stop-shingle rule), and candidate pairs are generated in-row by the
    * packed [[graft.functions.SortedPairKeys]] fan-out, ≤ C(cap,2) per
    * fingerprint by construction. Two narrow shuffles total (by fp_hash,
    * then by packed pair key); the winnow density (~2/(W+1)) makes this
    * index ~4× smaller than the full shingle index it mirrors. The
    * single-fingerprint floor (`n_shared ≥ 2`) drops coincidental one-hash
    * matches that containment would otherwise score 0.5+ on tiny docs. */
  val WinnowDfCap = 50

  val q63_winnow_dup_pairs: Q = (s0, d) => {
    val s = graft.Tuning.boundedAggSession(s0)
    graft.functions.Natives.registerAll(s)
    // distinct (doc, hash) by construction: positions stripped and hashes
    // deduped IN-ROW inside the shared index build — the explode there
    // emits each hash once per doc
    val capped = sharedWinnowGroups(s0, d, WinnowDfCap)
    val sizes = capped.select(explode(col("g.docs")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    val nDocs = documents(s, d).count()
    val bcBudget = s.sessionState.conf.autoBroadcastJoinThreshold
    val sized: DataFrame => DataFrame =
      if (bcBudget > 0 && nDocs * 24 <= bcBudget) broadcast else identity
    // packed pair keys while ids fit uint32 (same guard as the shingle
    // pipeline; testdata ids do — the struct fallback is exercised there)
    require(graft.Tables.documentsMaxId(s, d) < (1L << 32),
      "q63 packed pairs require uint32 doc ids; widen via SortedPairs.sorted_pairs")
    capped
      .select(explode(
        graft.functions.SortedPairs.sorted_pair_keys(col("g.docs"))).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_shared"))
      .select(shiftrightunsigned(col("pk"), 32).as("d1"),
              col("pk").bitwiseAND(lit((1L << 32) - 1)).as("d2"),
              col("n_shared"))
      .join(sized(sizes.select(col("doc_id").as("d1"), col("n_fp").as("n1"))), Seq("d1"))
      .join(sized(sizes.select(col("doc_id").as("d2"), col("n_fp").as("n2"))), Seq("d2"))
      .withColumn("containment",
        col("n_shared").cast(DoubleType) /
          least(col("n1"), col("n2")).cast(DoubleType))
      .filter(col("n_shared") >= 2 && col("containment") >= 0.5)
      .select(col("d1"), col("d2"), col("n_shared"), col("containment"))
      .orderBy("d1", "d2")
  }

  // ------------------------------------ repetition filters (Gopher-style)
  /** Per-document repeated-n-gram statistics — the repetition quality
    * filters of the Gopher corpus pipeline (Rae et al. 2021, §A1.1) and
    * C4-style cleaning, in token-fraction form:
    *
    *   - `top2_frac` — fraction of the document's 2-grams taken by its
    *     single most frequent 2-gram (boilerplate / chant detector),
    *   - `dup3_frac` — fraction of 3-grams that are repeats of an earlier
    *     3-gram (template / spam detector),
    *   - `repetitive` — the published filter thresholds (0.20 / 0.18).
    *
    * Shape at scale: every statistic here is a PER-DOCUMENT property, so
    * the query is ROW-LOCAL — the native [[graft.functions.GramStats]]
    * expression computes exact (total, distinct, max multiplicity) per
    * n-gram order in one compiled pass per document; zero shuffles besides
    * the presentation sort, partition-by-partition at any corpus size.
    * (The first shape — explode → groupBy (doc_id, gram) → rollup → join
    * the 2-/3-gram branches — computed the same numbers through two corpus
    * scans and two corpus-sized gram exchanges: 14.2 s at sf10 vs row-local;
    * the pipeline form survives as the parity reference in TextOpsSpec.)
    * Ratios are double divisions of exact integer counts ⇒ engine-exact.
    * Documents shorter than 3 tokens yield no 3-gram and are dropped
    * (`filter(s3.n_grams >= 1)` — same semantics as the oracle's inner
    * join). */
  val q59_repetition_stats: Q = (s, d) => {
    graft.functions.Natives.registerAll(s)
    import graft.functions.GramStats.gram_stats
    docsWide(s, d)
      .select(col("doc_id"),
              gram_stats(col("text"), 2).as("s2"),
              gram_stats(col("text"), 3).as("s3"))
      .filter(col("s3.n_grams") >= 1)
      .select(col("doc_id"),
              col("s2.n_grams").as("n2"),
              (col("s2.max_count").cast(DoubleType) /
                col("s2.n_grams").cast(DoubleType)).as("top2_frac"),
              ((col("s3.n_grams") - col("s3.n_distinct")).cast(DoubleType) /
                col("s3.n_grams").cast(DoubleType)).as("dup3_frac"))
      .withColumn("repetitive",
                  col("top2_frac") > 0.20 || col("dup3_frac") > 0.18)
      .orderBy("doc_id")
  }

  // -------------------------------------------- shared shingle machinery
  /** Distinct 3-gram word shingles per document, document-frequency
    * capped, rolled up to one row per SURVIVING shingle:
    * `(shingle, g.n = exact df, g.docs = all member doc ids ascending)`.
    *
    * Shingling is the native [[graft.functions.WordShingles]] expression —
    * one compiled pass per document; the composed transform/array_distinct
    * form ran interpreted (lambdas have no codegen) and measured ~8
    * CPU-seconds per dedup query at sf0.1. The df-cap is the bounded
    * [[graft.functions.BoundedDocSet]] aggregate — one exchange on the
    * shingle (map-side combined, ≤ cap+1 longs of state per group — the
    * hottest stop-shingle costs 51 longs, where the round-6 count window
    * buffered every occurrence in one reducer partition before filtering).
    * Same surviving (doc, shingle) set as the HAVING df <= cap oracle
    * form; consumers explode `g.docs` (q35 minhash) or generate candidate
    * pairs in-row (q34/q37 via sorted_pairs), which replaces the round-6
    * shingle self-join outright. */
  private def cappedShingleGroups(s0: SparkSession, d: String, dfCap: Int): DataFrame = {
    // Built (⇒ executed) against the bounded-agg CHILD session: the raised
    // object-agg fallback threshold is scoped there, so the parent session
    // keeps the 128-group memory guard for unbounded collect_list buffers
    // (see Tuning.boundedAggSession). Every consumer chain roots at this
    // DataFrame, so the whole query executes under the child's conf.
    val s = graft.Tuning.boundedAggSession(s0)
    graft.functions.Natives.registerAll(s)
    docsWide(s, d)
      .select(col("doc_id"), explode(word_shingles(col("text"))).as("shingle"))
      .groupBy("shingle")
      .agg(graft.functions.BoundedDocSetAgg.bounded_doc_set(dfCap)(col("doc_id")).as("g"))
      .filter(col("g.n") <= dfCap)
  }

  // ---------------------------------------- shared MATERIALIZED index
  /** Pipeline sharing (round 8): a dedup pipeline computes the shingle
    * index ONCE over a corpus snapshot and runs its dedup operators
    * (Jaccard pairs, MinHash/LSH, clustering) over it — recomputing the
    * exploded-shingle aggregation per operator is pure waste at any scale
    * (at 100 TB the index would be a persisted table like IvfIndex's; in
    * a session it is a localCheckpoint). Memoized per (parent session,
    * dir, dfCap, file footprint); the derived Jaccard-pair table is
    * likewise shared (q34's pair set IS q37's edge set by definition).
    * The pair-table key also carries the plan-shaping confs consulted at
    * construction (broadcast budget, shuffle width), so conf-doctoring
    * specs get a fresh build on their path instead of a stale cached
    * plan. [[invalidateSharedIndex]] drops everything — Bench calls it
    * per timed pass so the index build stays inside the timed region
    * exactly once per pass (the honest pipeline cost; see Bench's
    * measurement notes). */
  private val groupCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int, Long), DataFrame]
  private val pairCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int, Long, Long, Int, Long), DataFrame]

  private val winnowCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Int, Long), DataFrame]

  private val decontamCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long, Int, Long), DataFrame]

  private val testShingleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long), DataFrame]

  private[graft] def invalidateSharedIndex(): Unit = {
    groupCache.clear(); pairCache.clear(); winnowCache.clear()
    decontamCache.clear(); testShingleCache.clear()
  }

  /** Shared MATERIALIZED decontamination report (round 9): the q38 result
    * table — flagged train docs with their overlap counts — computed once
    * per corpus snapshot and consumed by BOTH q38 (the report) and q69
    * (the funnel's stage-4 flag set); a production pipeline computes its
    * contamination flags once and feeds every downstream consumer. Same
    * lifecycle, conf-keying, and per-pass accounting as the shingle index
    * (Bench invalidates per timed pass; build lands inside the timed
    * region on the first consumer in sort order — q38). The key carries
    * the broadcast budget q38's internal swap consults. Coalesced narrow
    * before the checkpoint (NOTES_r8: near-empty wide stages bill ~0.2 s
    * of pure scheduling to every consumer of a tiny table). q65 stays OFF
    * this cache deliberately: it exists to measure the bloom PLAN of the
    * same semantics — reading a shared materialization would erase the
    * thing it measures. */
  private def sharedDecontamFlags(s: SparkSession, d: String): DataFrame = {
    decontamCache.keySet.removeIf { case (ses, _, _, _, _) => ses.sparkContext.isStopped }
    val key = (s, d, s.sessionState.conf.autoBroadcastJoinThreshold,
      s.sessionState.conf.numShufflePartitions,
      graft.Tables.pathStamp(s"$d/documents.parquet"))
    decontamCache.computeIfAbsent(key,
      _ => decontamReport(s, d).coalesce(4).localCheckpoint(true))
  }

  /** Shared MATERIALIZED test-shingle set (round 10): the decontamination
    * reference list ([[testShingleSet]]) computed once per corpus
    * snapshot and consumed by BOTH decontamination regimes — q38's exact
    * report (via [[decontamReport]], and through it q69's flag set) and
    * q65's bloom pre-filter — the way a production pipeline pins one eval
    * list per release and feeds every hygiene pass from it. NOTES_r9
    * counted three independent derivations of this set per bench pass.
    * Sharing the LIST is not sharing the PLAN: q65 stays off the
    * decontam-REPORT cache (its reason to exist is measuring the bloom
    * plan of the same semantics), but the fixed reference input upstream
    * of both plans is legitimately one artifact. Same lifecycle and
    * accounting as the shingle index: memoized per (session, dir, file
    * footprint), invalidated per Bench pass, build lands inside the timed
    * region of the first consumer in run order (q38). Coalesced narrow —
    * the set is a single slim column (NOTES_r8 near-empty-wide-stage
    * note). */
  private def sharedTestShingles(s: SparkSession, d: String): DataFrame = {
    testShingleCache.keySet.removeIf { case (ses, _, _) => ses.sparkContext.isStopped }
    val key = (s, d, graft.Tables.pathStamp(s"$d/documents.parquet"))
    testShingleCache.computeIfAbsent(key,
      _ => testShingleSet(s, d).coalesce(4).localCheckpoint(true))
  }

  /** Shared df-capped winnow fingerprint groups `(fp_hash, g)` — the
    * winnow-index analog of [[sharedCappedGroups]]: materialized once per
    * (session, corpus, cap, file footprint) and consumed by q63's three
    * branches (pair fan-out + both sizes joins), which would otherwise
    * each recompute the winnow+bounded-agg subtree (AQE reuses the
    * canonically-equal shuffle map sides, but the final aggregate and the
    * in-row winnowing above it re-ran 3×). Checkpointed WIDE for the same
    * downstream-expansion reason as the shingle index. */
  private def sharedWinnowGroups(s0: SparkSession, d: String, dfCap: Int): DataFrame = {
    val s = graft.Tuning.boundedAggSession(s0)
    winnowCache.keySet.removeIf { case (ses, _, _, _) => ses.sparkContext.isStopped }
    winnowCache.computeIfAbsent(
      (s0, d, dfCap, graft.Tables.pathStamp(s"$d/documents.parquet")),
      _ => {
        graft.functions.Natives.registerAll(s)
        val posBits = graft.functions.WinnowKeys.PosBits
        docsWide(s, d)
          .select(col("doc_id"),
                  explode(array_distinct(transform(winnow_keys(col("text")),
                    k => shiftright(k, posBits)))).as("fp_hash"))
          .groupBy("fp_hash")
          .agg(graft.functions.BoundedDocSetAgg
            .bounded_doc_set(dfCap)(col("doc_id")).as("g"))
          .filter(col("g.n") <= dfCap)
          .repartition(s.sessionState.conf.numShufflePartitions, col("fp_hash"))
          .localCheckpoint(true)
      })
  }

  private def sharedCappedGroups(s: SparkSession, d: String, dfCap: Int): DataFrame = {
    // re-sync the child conf even on a cache hit: consumers execute under
    // the child session, which must mirror parent conf set since the
    // index was materialized (broadcast budgets, shuffle widths)
    graft.Tuning.boundedAggSession(s)
    groupCache.keySet.removeIf { case (ses, _, _, _) => ses.sparkContext.isStopped }
    groupCache.computeIfAbsent((s, d, dfCap, graft.Tables.pathStamp(s"$d/documents.parquet")),
      _ => cappedShingleGroups(s, d, dfCap)
        // spread ONCE at materialization (partition by DOWNSTREAM
        // EXPANSION, same rationale as docsWide): AQE coalesces the
        // skinny group table to a handful of byte-sized partitions, but
        // every consumer expands it — sorted_pairs ≤ C(cap,2)×, minhash
        // ×16 hashes + member fan-out — so the checkpoint itself carries
        // the session width and consumers read it wide with NO exchange
        // of their own.
        .repartition(s.sessionState.conf.numShufflePartitions, col("shingle"))
        .localCheckpoint(true))
  }

  private def sharedJaccardPairs(s: SparkSession, d: String,
                                 dfCap: Int, threshold: Double): DataFrame = {
    graft.Tuning.boundedAggSession(s) // conf re-sync — see sharedCappedGroups
    pairCache.keySet.removeIf { case (ses, _, _, _, _, _, _) => ses.sparkContext.isStopped }
    val key = (s, d, dfCap, java.lang.Double.doubleToLongBits(threshold),
      s.sessionState.conf.autoBroadcastJoinThreshold,
      s.sessionState.conf.numShufflePartitions,
      graft.Tables.pathStamp(s"$d/documents.parquet"))
    pairCache.computeIfAbsent(key,
      _ => jaccardPairsFrom(s, d, sharedCappedGroups(s, d, dfCap), threshold,
             preSpread = true).localCheckpoint(true))
  }

  private def shinglesSql(dfCap: Int): String =
    s"""sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, len(t) - 2),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
          FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
        rare AS (
          SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= $dfCap),
        shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle))"""

  // ------------------------------------------------- n-gram Jaccard dedup
  /** Near-dup detection via 3-gram shingle Jaccard: candidate pairs share
    * ≥1 (rare) shingle; J = |∩| / |∪| from per-doc shingle-set sizes.
    * The shingle self-join is the scale-limiting step — bounded by the
    * document-frequency cap, never by corpus size squared. */
  val q34_ngram_jaccard: Q = (s, d) =>
    sharedJaccardPairs(s, d, dfCap = 50, threshold = 0.2)
      .select("d1", "d2", "n_common", "jaccard")
      .orderBy("d1", "d2")

  /** Shared Jaccard pair pipeline (q34 + the q37 edge set): candidate
    * pairs generated IN-ROW from each df-capped shingle group
    * (sorted_pairs over g.docs — ≤ C(cap,2) structs per shingle), per-doc
    * rare-shingle sizes attached by broadcast AFTER pair aggregation.
    *
    * Shuffle ledger (the reason for this shape): (1) the exploded
    * (doc, shingle) set by shingle for the bounded group-by — the only
    * full-width shuffle; (2) the exploded member lists for per-doc sizes
    * (map-side combined to ~|docs| rows); (3) the aggregated pair set by
    * (d1, d2). Round 6 shaped this as a count window + co-partitioned
    * self-join: same shuffle count, but the window sorted the full
    * occurrence set and the join re-merged it — both deleted here; the
    * pair fan-out now happens inside a codegen'd expression bounded by
    * the df-cap. At corpus scale the sizes table is per-doc counts —
    * broadcast while it fits the session broadcast budget, swapped to a
    * shuffle join keyed on d1/d2 beyond it (LIVE condition in the body
    * below; the pair table is the small side by then). The capped-group
    * subtree feeds a diamond (pairs
    * + sizes); AQE's runtime stage reuse dedups the canonically-equal
    * shuffle map sides, so no materialization is needed. */
  /** Lazy (non-memoized) pair pipeline — the building block behind
    * [[sharedJaccardPairs]], kept package-visible so specs can execute
    * the aggregation under doctored runtime conf (the memoized form runs
    * it eagerly at construction, before a spec can flip a conf). */
  private[graft] def jaccardPairs(s: SparkSession, d: String,
                                  dfCap: Int, threshold: Double): DataFrame =
    jaccardPairsFrom(s, d, cappedShingleGroups(s, d, dfCap), threshold)

  private def jaccardPairsFrom(s: SparkSession, d: String,
                               capped: DataFrame, threshold: Double,
                               preSpread: Boolean = false): DataFrame = {
    val sizes = capped.select(explode(col("g.docs")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    // Broadcast→shuffle SWAP, decided per run (round 7 — previously a
    // documented condition, now live code): the per-doc sizes table is
    // one ~24 B row per document, broadcast while it fits the session's
    // broadcast budget; beyond that the pair table (bounded by candidate
    // volume, typically the small side by then) shuffles against it on
    // d1/d2 like any equi-join. |docs| comes from parquet metadata (a
    // count() on the unfiltered scan is a footer read, not a data scan).
    val nDocs = documents(s, d).count()
    val bcBudget = s.sessionState.conf.autoBroadcastJoinThreshold
    val sizesFit = bcBudget > 0 && nDocs * 24 <= bcBudget
    def keyed(as1: String, as2: String) =
      sizes.select(col("doc_id").as(as1), col("n_sh").as(as2))
    def sized(df: DataFrame) = if (sizesFit) broadcast(df) else df
    // Partition by DOWNSTREAM EXPANSION (same rationale as docsWide): the
    // capped group table is ~|distinct shingles| skinny rows that AQE
    // coalesces to a handful of tasks, but sorted_pairs fans each row out
    // ≤ C(cap,2)× — re-spread it across the session width first (a
    // ~nothing exchange) so pair generation + partial aggregation use the
    // whole cluster instead of the coalesced tail. The SHARED index is
    // materialized already-wide (sharedCappedGroups) — preSpread skips
    // the redundant exchange there.
    val wide =
      if (preSpread) capped
      else capped.repartition(s.sessionState.conf.numShufflePartitions, col("shingle"))
    // Pair fan-out: PACKED long keys ((d1<<32)|d2, one primitive array —
    // no per-pair struct allocation, single-long group-by key) while every
    // doc id fits uint32 (checked against the memoized footer max — true
    // until ~4 B documents); past that the struct form, same pair set.
    // The unpack happens on AGGREGATED pair rows (candidate-volume-bounded,
    // orders of magnitude fewer than pair occurrences).
    val packable = graft.Tables.documentsMaxId(s, d) < (1L << 32)
    val aggregated =
      if (packable)
        wide.select(explode(
            graft.functions.SortedPairs.sorted_pair_keys(col("g.docs"))).as("pk"))
          .groupBy("pk").agg(count(lit(1)).as("n_common"))
          // UNSIGNED shift: ids in [2^31, 2^32) set bit 63 of the packed
          // key, and the arithmetic shiftright would sign-extend d1
          // negative (the bitwiseAND for d2 is shift-free, two's
          // complement bits are exact either way)
          .select(shiftrightunsigned(col("pk"), 32).as("d1"),
                  col("pk").bitwiseAND(lit((1L << 32) - 1)).as("d2"),
                  col("n_common"))
      else
        wide.select(explode(
            graft.functions.SortedPairs.sorted_pairs(col("g.docs"))).as("p"))
          .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
          .agg(count(lit(1)).as("n_common"))
    aggregated
      .join(sized(keyed("d1", "n1")), Seq("d1"))
      .join(sized(keyed("d2", "n2")), Seq("d2"))
      .withColumn("jaccard",
        col("n_common").cast(DoubleType) /
          (col("n1") + col("n2") - col("n_common")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------------- MinHash + LSH
  /** MinHash(16) + LSH(4 bands × 4 rows) candidate pairs. The 16 hash
    * families come from Kirsch–Mitzenmacher double hashing — hᵢ(s) =
    * (h1 + i·h2) mod MinhashP, with h1/h2 two DISJOINT 48-bit slices of
    * ONE md5 digest per shingle (md5 output bits are independent, so the
    * slices are as independent as two salted digests — and the single
    * call halves the dominant per-shingle hash cost; was 2 salted md5
    * calls through round 5). The no-overflow bound comes from the 48-bit
    * slices themselves: h1 + 15·h2 < 2^53, well inside BIGINT in both
    * engines. Band key = the 4 minima concatenated.
    * Docs sharing ≥1 band are candidates — the bucket join replaces the
    * quadratic pair scan at scale. */
  /** (doc_id, band_key) LSH band table shared by q35 (full pair report)
    * and q64 (incremental delta-vs-base filter).
    *
    * h1/h2 are the same two disjoint 48-bit md5 slices as the oracle's
    * ('0x'||substring(md5,...))::BIGINT, via the native Md5Long expression
    * (digest → nibble slice → long, no hex-string round trip). All 16
    * family hashes are computed ONCE PER DISTINCT SHINGLE on the capped
    * group row (~10× fewer digests than per-occurrence hashing at
    * sf0.1), then fanned to the member docs by exploding g.docs. The
    * groups come from the SHARED materialized index (one build per
    * pipeline session, not one per dedup operator). */
  private def lshBands(s: SparkSession, d: String): DataFrame =
    bandRowsFromGroups(sharedCappedGroups(s, d, dfCap = 50))

  /** (doc_id, band_key) from capped shingle GROUPS — all 16 family hashes
    * computed once per distinct shingle on the group row, then fanned to
    * member docs. The efficient form for a full-corpus (or base-index)
    * build; [[bandRowsFromShingles]] is the per-delivery twin. */
  private[graft] def bandRowsFromGroups(capped: DataFrame): DataFrame = {
    graft.functions.Natives.registerAll(capped.sparkSession)
    val hashed = capped
      .select(col("g.docs").as("docs"),
              md5_long(col("shingle"), 0, 12).as("h1"),
              md5_long(col("shingle"), 12, 12).as("h2"))
      .select(col("docs") +:
        (0 until 16).map(i => expr(s"(h1 + $i * h2) % $MinhashP").as(s"f$i")): _*)
    minsToBands(hashed.select(explode(col("docs")).as("doc_id") +:
      (0 until 16).map(i => col(s"f$i")): _*))
  }

  /** (doc_id, band_key) from bare (doc_id, shingle) rows — hashes per
    * occurrence, the right shape for a DELTA whose cost must scale with
    * the delivery (no group index to share; duplicates are harmless under
    * min). Same family, same band keys as [[bandRowsFromGroups]]. */
  private[graft] def bandRowsFromShingles(docShingles: DataFrame): DataFrame = {
    graft.functions.Natives.registerAll(docShingles.sparkSession)
    minsToBands(docShingles
      .select(col("doc_id"),
              md5_long(col("shingle"), 0, 12).as("h1"),
              md5_long(col("shingle"), 12, 12).as("h2"))
      .select(col("doc_id") +:
        (0 until 16).map(i => expr(s"(h1 + $i * h2) % $MinhashP").as(s"f$i")): _*))
  }

  /** 16 per-doc signature minima → 4 concatenated band keys. */
  private def minsToBands(shf: DataFrame): DataFrame = {
    val minAggs = (0 until 16).map(i => min(col(s"f$i")).as(s"m$i"))
    val mins = shf.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    mins.select(col("doc_id"), explode(array(
      (0 until 4).map(b => concat_ws("|",
        lit(b.toString), col(s"m${4*b}"), col(s"m${4*b+1}"),
        col(s"m${4*b+2}"), col(s"m${4*b+3}"))): _*)).as("band_key"))
  }

  val q35_minhash_lsh: Q = (s, d) => {
    val bands = lshBands(s, d)
    bands.as("a").join(bands.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy("d1", "d2")
  }

  // ------------------------------------- incremental ingest near-dup filter
  /** Incremental-ingestion near-dup filter: a NEW batch (delta, the 20% of
    * docs with doc_id % 10 ≥ 8 — standing in for today's crawl) LSH-probed
    * against the EXISTING corpus (base, the other 80%). One row per delta
    * doc that collides with ≥1 base doc in any MinHash band: the docs an
    * ingest pipeline holds back for verification/drop, with the candidate
    * count and the first matching base doc.
    *
    * This is the asymmetric topology production dedup actually runs day to
    * day, and since round 11 it runs against the PERSISTED incremental
    * index (streaming/BandIngest — the text twin of VecIngest): the base
    * band table and the frozen banned-shingle set are built ONCE per
    * config and persisted (like IvfIndex's centroids); the delta —
    * orders of magnitude smaller — computes only its own signatures
    * against the frozen banned set and lands under `delta/bid=<n>` via
    * the same replay-idempotent keyed sink the vector side uses. The
    * probe broadcast-joins the delta bands against one scan of the
    * persisted base (live budget gate; no base shuffle), so daily cost
    * scales with |delta|, not |corpus| — never all-pairs.
    *
    * SEMANTICS (vs rounds ≤10): the df-cap is frozen at BASE build —
    * a shingle is banned iff its BASE document frequency exceeds the
    * cap — rather than evaluated over base+delta jointly. That is the
    * price of incrementality (a joint cap would have to re-sign old docs
    * whenever a delta pushes a shingle over it) and exactly mirrors the
    * IVF contract: the model (banned set / centroids) retrains only at
    * the scheduled base rebuild. The oracle SQL applies the same frozen
    * cap, so the entry stays hash-checked. */
  val q64_incremental_neardup: Q = (s, d) => {
    val idx = graft.streaming.BandIngest.ensure(s, d)
    val deltaDir = s"$idx/delta"
    // one-time batch ingest of "today's crawl" through the SAME pure
    // band computation the stream's foreachBatch runs (bit-equality of
    // the two paths is spec-pinned in BandIngestSpec)
    if (graft.streaming.BandIngest.deltaBands(s, deltaDir).isEmpty)
      graft.streaming.BandIngest.ingestBatch(
        documents(s, d).filter(pmod(col("doc_id"), lit(10)) >= 8),
        idx, deltaDir, batchId = 0L)
    val base = graft.streaming.BandIngest.baseBands(s, idx).as("o")
    val delta = graft.streaming.BandIngest.deltaBands(s, deltaDir).get
    // broadcast the delta while it fits the session budget (~90 B/band
    // row, 4 rows/doc); past it the planner shuffles both sides like any
    // equi-join — same live-swap discipline as dimBroadcast
    val budget = s.sessionState.conf.autoBroadcastJoinThreshold
    val deltaRows = delta.count()
    val n = (if (budget > 0 && deltaRows * 90 <= budget) broadcast(delta)
             else delta).as("n")
    n.join(base, col("n.band_key") === col("o.band_key"))
      .groupBy(col("n.doc_id").as("delta_id"))
      .agg(countDistinct(col("o.doc_id")).as("n_base_matches"),
           min(col("o.doc_id")).as("first_base_match"))
      .orderBy("delta_id")
  }

  // ----------------------------------------------------------- SimHash
  /** SimHash(60-bit) near-dup pairs. Per-token 60-bit hashes (md5-hex prefix
    * — portable across engines) vote ±1 per bit position weighted by
    * multiplicity; the sign vector is the fingerprint. Candidates come from
    * 4×15-bit band buckets (docs within hamming ≤ 3 of each other must
    * share ≥1 exact band), verified by popcount of the XOR. All integer
    * arithmetic ⇒ exact in both engines. */
  /** (doc_id, simhash) for a (doc_id, text) frame — the vote pipeline
    * behind q36, package-visible so the lane-capacity boundary is
    * directly testable (docs of 2^15..2^16−1 tokens must compute exactly;
    * ≥ 2^16 must hit the NAMED guard, not a generic ANSI overflow). */
  private[graft] def simhashOf(docs: DataFrame): DataFrame = {
    graft.functions.Natives.registerAll(docs.sparkSession)
    val tokenHashes = docs
      .select(col("doc_id"), explode(expr(TOKENS)).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), md5_long(col("tok"), 0, 15).as("h"), col("cnt"))
    val packAggs = (0 until 20).map { j =>
      val lanes = (0 until 3).map { k =>
        s"shiftleft(shiftright(h, ${3 * j + k}) & 1, ${16 * k})"
      }.mkString(" + ")
      sum(expr(s"cnt * ($lanes)")).as(s"p$j")
    }
    val simhashExpr = {
      val bits = (0 until 60).map { b =>
        val lane = s"(shiftright(p${b / 3}, ${16 * (b % 3)}) & 65535)"
        s"CASE WHEN 2 * $lane > n THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
      }.mkString(" + ")
      s"""CASE WHEN n >= 65536 THEN CAST(raise_error(
         |  'simhash packed votes overflow: document with >= 65536 tokens — split upstream') AS BIGINT)
         |ELSE $bits END""".stripMargin
    }
    tokenHashes.groupBy("doc_id")
      .agg(sum(col("cnt")).as("n"), packAggs: _*) // n = token COUNT, not distinct
      .select(col("doc_id"), expr(simhashExpr).as("simhash"))
  }

  val q36_simhash_pairs: Q = (s, d) => {
    // Bit votes as PACKED codegen'd sums over (doc, token-hash, count)
    // rows — NOT a nested higher-order lambda (interpreted, 40× slower).
    // Voting ±multiplicity over DISTINCT per-doc tokens sums to the same
    // total as per-occurrence voting, and the distinct set is what the
    // md5 and the packed lane sums should run over (round 8: the
    // per-occurrence form paid one md5 + 15-20 lane-buffer updates per token
    // occurrence; this pays them once per distinct (doc, token), with a
    // plain count carrying the multiplicity). The (doc, tok) pre-count
    // runs IN-PARTITION — docsWide hash-partitions by doc_id, which
    // satisfies the (doc_id, tok) clustered distribution — so the
    // pipeline still has exactly ONE exchange (docsWide's).
    //
    // Packing (round 7, lane width revised round 8): the ±1 vote for bit
    // b satisfies v_b = 2·ones_b − n, so it suffices to sum the raw BITS
    // (weighted by cnt). THREE bit-lanes ride in one long at 16-bit
    // spacing (bits 0/16/32) — 20 aggregate buffer slots for 60 bits,
    // each updated by shift/and arithmetic with no CASE branch. Why 3
    // lanes and not the 4 that fit: this repo runs ANSI mode everywhere,
    // and a 4th lane at bit 48 lets a lane total ≥ 2^15 touch bit 63 —
    // ANSI's sum/multiply overflow check then rejects a VALID 32k-token
    // document with a generic ARITHMETIC_OVERFLOW before the named guard
    // below could run (two's-complement wraparound would be value-exact —
    // totals stay < 2^64 and masked lane extraction is wrap-agnostic —
    // but ANSI throws before the mask ever sees it). With the top lane at
    // bit 32, every intermediate stays < 2^49: no signed crossing for ANY
    // n < 2^16, so documents up to 65535 tokens compute exactly and the
    // loud, actionable guard at the lanes' true 2^16 capacity is the one
    // failure mode (a 100 TB pipeline splits longer documents upstream —
    // a 65k-token "document" is a concatenation bug, not a document).
    val sims = simhashOf(docsWide(s, d))
      .localCheckpoint() // tiny (one row per doc); feeds four consumers
      // The four consumers launch jobs over this checkpoint — three of
      // them broadcast builds racing concurrently — and a near-empty
      // 32-task stage costs ~0.2 s of pure task scheduling (measured,
      // StageTime). Narrow the READ (no exchange; the 32-wide compute
      // above is untouched) so those jobs schedule 8 tasks over one row
      // per document instead of the full session width.
      .coalesce(8)
    // FINGERPRINT-GROUP banding (round 7, found by the sf3 probe): band
    // and join DISTINCT simhashes, not documents. A duplicate-heavy
    // corpus (ScaleGen sf3 is 97% replicas) puts every copy of a
    // document into the same band bucket, so the per-document band join
    // paid |bucket|² row comparisons — ×45 wall at ×30 data. The PAIR
    // OUTPUT is inherently quadratic in duplicates (identical docs are
    // hamming-0 results — the oracle demands them), but the candidate
    // work is not: bands depend only on the fingerprint, so the band
    // join runs on |distinct simhash| rows and member pairs stream out
    // of two ordinary equi-joins (cross-group) plus one self-join
    // (within-group, hamming 0) — output-bound, never candidate-bound.
    // Same pair set and hamming values as the per-document form.
    val fps = sims.select("simhash").distinct()
    val bandsOf = (c: org.apache.spark.sql.Column) => array(
      (0 until 4).map(b => concat(lit(s"$b:"),
        shiftright(c, b * 15).bitwiseAND(32767).cast(StringType))): _*)
    val bands = fps.select(col("simhash"), explode(bandsOf(col("simhash"))).as("band_key"))
    val gpairs = bands.as("a").join(bands.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.simhash") < col("b.simhash"))
      .select(col("a.simhash").as("s1"), col("b.simhash").as("s2"))
      .distinct()
      .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
      .filter(col("hamming") <= 3)
    val cross = gpairs
      .join(sims.select(col("simhash").as("s1"), col("doc_id").as("m1")), Seq("s1"))
      .join(sims.select(col("simhash").as("s2"), col("doc_id").as("m2")), Seq("s2"))
      .select(least(col("m1"), col("m2")).as("d1"),
              greatest(col("m1"), col("m2")).as("d2"), col("hamming"))
    val within = sims.as("x").join(sims.as("y"),
        col("x.simhash") === col("y.simhash") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
              lit(0).cast(IntegerType).as("hamming"))
    cross.union(within)
      .select(col("d1"), col("d2"), col("hamming").cast(IntegerType).as("hamming"))
      .orderBy("d1", "d2")
  }

  // --------------------------------------------- near-dup CLUSTERING
  /** Connected components over the near-dup pair graph + canonical
    * survivor election — the step a training pipeline runs AFTER pair
    * generation (q34/q35/q36): near-duplication is transitive in effect
    * (A~B, B~C ⇒ keep one of {A,B,C}), so pairs must become clusters
    * before dedup can drop anything.
    *
    * Components come from [[connectedComponents]] (driver union-find for
    * bounded edge sets, distributed hash-min propagation beyond — see its
    * doc for the size-switch rationale); only docs appearing in a pair
    * enter the component computation, singletons rejoin at the end.
    *
    * Output: one row per document — its cluster id (min doc_id of the
    * component), the cluster size, and is_survivor (the canonical
    * min-id member; singletons survive trivially). Deterministic:
    * min-label is order-free, the edge set comes from the exact-integer
    * shingle pipeline. Oracle: recursive CTE in DuckDB computing min
    * reachable label over the same pair graph. */
  val q37_neardup_clusters: Q = (s, d) => {
    // edges = q34's Jaccard pairs — the SAME shared materialized pair
    // table (q37 is by definition the clustering of q34's pair set; a
    // pipeline computes it once). The shared table is already a
    // localCheckpoint, so the symmetrizing union below is a cheap rescan
    // of the materialized rows, not a second pipeline evaluation.
    val pairs = sharedJaccardPairs(s, d, dfCap = 50, threshold = 0.2)
      .select("d1", "d2")
    val edges = pairs.union(pairs.select(col("d2"), col("d1"))).toDF("src", "dst")
    // root the final chain on the SAME session as the pair pipeline (the
    // bounded-agg child) so one conf governs the whole query at runtime
    val bs = pairs.sparkSession
    documents(bs, d).select(col("doc_id"))
      .join(connectedComponents(edges), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
              (col("doc_id") === col("cluster_id")).as("is_survivor"))
      .orderBy("doc_id")
  }

  /** Min-label connected components over a symmetric edge list →
    * (doc_id, label) for every node WITH an edge (callers rejoin
    * singletons). Three cooperating pieces behind a size switch:
    *
    * - edge set fits the driver (≤ `collectThreshold` edges): path-halving
    *   union-find on collected longs, broadcast back — the same bounded
    *   lineage-cut judgment as k-means centroids (the near-dup subgraph
    *   is bounded by candidate-pair volume, not corpus size; a corpus
    *   whose dedup graph exceeds the driver is mostly duplicates and has
    *   bigger problems).
    * - larger (round 7): PER-PARTITION UNION-FIND PRE-CONTRACTION first —
    *   each partition runs local union-find over its edges and emits one
    *   star edge (node → local min root) per distinct node, so a round
    *   costs one narrow shuffle + a linear local pass and shrinks the
    *   edge set from |E| toward |V| while exactly preserving
    *   connectivity (every node reappears; shared nodes stitch the
    *   per-partition stars together). Dense near-dup clusters — the
    *   100 TB dedup workload — collapse at their full density per round,
    *   which is precisely what label propagation cannot do (it pays
    *   diameter-many full shuffles). Rounds repeat while they shrink the
    *   set; in the measured sf1 workload two rounds take the 3.3 M-edge
    *   graph under the driver threshold and union-find finishes.
    * - if contraction stalls above the threshold: iterative hash-min
    *   propagation on the CONTRACTED star graph (diameter already
    *   collapsed), one shuffle per round, state localCheckpointed — the
    *   GraphX/Pregel pattern without the dependency.
    *
    * All paths are deterministic — the final label is the component's
    * global min, independent of partitioning (intermediate local roots
    * depend on edge placement, but min-of-component does not); the spec
    * asserts the paths agree on the same graphs. */
  private[graft] def connectedComponents(
      edges: DataFrame, collectThreshold: Long = 1000000L): DataFrame = {
    val spark = edges.sparkSession
    if (edges.count() <= collectThreshold) {
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      import spark.implicits._
      parent.keys.toSeq.map(k => (k, find(k))).toDF("doc_id", "label")
    } else {
      // --- contraction rounds: local union-find per partition ---
      var cur = edges.toDF("src", "dst")
      var n = Long.MaxValue
      var shrinking = true
      var rounds = 0
      while (n > collectThreshold && shrinking && rounds < 6) {
        val contracted = contractOnce(cur).localCheckpoint(true)
        val n2 = contracted.count()
        shrinking = n2 < n            // stalled ⇒ hand off to hash-min
        cur = contracted; n = n2; rounds += 1
      }
      if (n <= collectThreshold) {
        // star edges small enough — finish with exact driver union-find
        // (recursion depth 1: the branch above is the collect path)
        connectedComponents(cur, collectThreshold)
      } else {
        // hash-min label propagation over the contracted graph. Stars are
        // DIRECTED (node → root); symmetrize so labels flow both ways.
        val e = cur.union(cur.select(col("dst"), col("src"))).toDF("src", "dst")
        var labels = e.select(col("src").as("doc_id")).distinct()
          .withColumn("label", col("doc_id"))
          .localCheckpoint(true)
        var changed = 1L
        var iter = 0
        while (changed > 0 && iter < 25) {
          val viaEdges = e.join(labels.withColumnRenamed("doc_id", "dst"), "dst")
            .select(col("src").as("doc_id"), col("label"))
          val viaMin = labels.union(viaEdges)
            .groupBy("doc_id").agg(min(col("label")).as("label"))
          // POINTER JUMP (round 7): shortcut label(x) ← label(label(x)).
          // Neighbor-min alone converges in graph-DIAMETER rounds — a
          // chain component pays a full shuffle per hop; with the jump
          // the label chain halves every round, so convergence is
          // O(log diameter). Labels only decrease and never below the
          // component min, so the fixpoint is unchanged.
          val jumped = viaMin.as("a")
            .join(viaMin.select(col("doc_id").as("jd"), col("label").as("jl")),
                  col("a.label") === col("jd"), "left_outer")
            .select(col("a.doc_id").as("doc_id"),
                    least(col("a.label"), coalesce(col("jl"), col("a.label"))).as("label"))
          // fold the convergence flag into the same checkpointed pass — one
          // materialization + one cheap count per round, not two joins
          val next = jumped
            .join(labels.withColumnRenamed("label", "old"), "doc_id")
            .select(col("doc_id"), col("label"),
                    (col("label") =!= col("old")).as("moved"))
            .localCheckpoint(true)
          changed = next.filter(col("moved")).count()
          labels = next.select("doc_id", "label")
          iter += 1
        }
        require(changed == 0, s"label propagation did not converge in $iter rounds")
        labels
      }
    }
  }

  /** One contraction round: co-locate each node's edges (hash on src),
    * run union-find inside every partition, emit one star edge
    * (node, local min root) per distinct node seen there — self-loops
    * dropped (a local root still reappears as the dst of its children;
    * input graphs here never contain isolated self-edges). Output size is
    * Σ_p |nodes(p)| ≤ min(2|E|, P·|V|), and in practice collapses dense
    * near-dup clusters to ~|V| in one pass. Connectivity is preserved
    * exactly: each partition's star is a spanning tree of its local
    * components, and shared nodes stitch partitions together. */
  private def contractOnce(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.repartition(spark.sessionState.conf.numShufflePartitions, col("src"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        parent.keysIterator.map(k => (k, find(k))).filter(p => p._1 != p._2)
      }
      .toDF("src", "dst")
  }

  // ------------------------------------------- benchmark decontamination
  /** Train-split decontamination against the test split — the standard
    * pre-training hygiene step: a training document whose 3-gram shingles
    * overlap an evaluation set is contaminated and must be dropped or
    * down-weighted. Splits come from q57's content-hash ranges (so the
    * check is reproducible), the test-side shingle set is distinct and
    * BROADCAST (eval benchmarks are small by construction — this is the
    * 100 TB shape: train side streams, benchmark side broadcasts), and
    * the overlap fraction is exact integer counting. Emits every train
    * doc with ≥ 5% shingle overlap. */
  val q38_decontamination: Q = (s, d) =>
    sharedDecontamFlags(s, d).orderBy("doc_id")

  /** The decontamination derivation behind [[sharedDecontamFlags]]/q38. */
  private def decontamReport(s: SparkSession, d: String): DataFrame = {
    // Split membership: the first md5 hex byte as an integer (md5_long of
    // 2 nibbles) — numerically identical to comparing the 2-char hex
    // substring lexicographically ('cc' = 204, 'e6' = 230), minus the
    // hex-string round trip. Shingling is the native WordShingles pass
    // (see shingles() above).
    // Train side explodes ONLY train-split documents (the split filter
    // runs before the shingle fan-out — docs in the [0xcc, 0xe6) holdout
    // range used to be exploded and discarded); the test side is the
    // shared materialized reference list (round 10, see
    // [[sharedTestShingles]]).
    val train = docsWide(s, d)
      .withColumn("h", md5_long(col("doc_id").cast(StringType), 0, 2))
      .filter(col("h") < 204)
      .select(col("doc_id"),
              explode(word_shingles(col("text"))).as("shingle"))
    val testShingles = sharedTestShingles(s, d)
    // Broadcast→shuffle swap for the TEST SHINGLE SET (same live-budget
    // pattern as jaccardPairs' sizes table): the test split is ~10% of
    // docs and its distinct shingles grow with the corpus, so a forced
    // broadcast would eventually OOM the driver at corpus scale. The set's
    // cardinality is unknowable pre-execution (it is itself a distinct),
    // so the decision uses a PROVABLE upper bound from an exact data
    // statistic (round 8, ADVICE: the previous ~200-shingles/doc constant
    // under-estimated for long documents — the unsafe direction). With
    // C = Σ n_chars over the test split: every character appears in ≤ 3
    // of the 3-gram shingle strings (string payload ≤ 3·C, and distinct
    // only shrinks it), and |shingles| ≤ |tokens| ≤ C/2 (a token is ≥ 1
    // char + 1 separator) at ≤ 16 B row overhead each (≤ 8·C) — so the
    // broadcast set is ≤ 11·C bytes, from one memoized column-pruned scan
    // of n_chars (Tables.documentsCharSum). Under the session broadcast
    // budget → broadcast (the right plan while the benchmark/test suite
    // is bounded — the common case: a decontamination list is fixed while
    // the train corpus grows); over it → plain shuffle left-outer on the
    // shingle, same result (spec-pinned below in TextOpsSpec).
    val testChars = graft.Tables.documentsCharSum(s, d) * 26L / 256L
    val estTestBytes = testChars * 11L
    val bcBudget = s.sessionState.conf.autoBroadcastJoinThreshold
    val testSide = testShingles.withColumn("hit", lit(1))
    val sized =
      if (bcBudget > 0 && estTestBytes <= bcBudget) broadcast(testSide)
      else testSide
    train
      .join(sized, Seq("shingle"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
           sum(coalesce(col("hit"), lit(0))).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast(DoubleType) / col("n_shingles").cast(DoubleType))
      .filter(col("contamination") >= 0.05)
      .select(col("doc_id"), col("n_shingles"),
              col("n_contaminated").cast(LongType).as("n_contaminated"),
              col("contamination"))
  }

  // -------------------------------- bloom-filter decontamination (scale path)
  /** q38's semantics through an approximate-membership PRE-FILTER — the
    * shape decontamination takes when the evaluation suite outgrows the
    * exact broadcast set. q38's plan broadcasts the distinct test shingles
    * (~88+ bits/key of string payload) and degrades to a full shuffle of
    * EVERY train shingle when the set exceeds the budget. Here the test
    * side is first folded into a Bloom filter — a fixed ~16 bits/key
    * bitmap whose size is set by the test split alone, never the train
    * corpus — and only train shingles the filter cannot rule out reach the
    * exact confirm join. At 100 TB that changes the shuffled volume from
    * |train| rows to |true hits| + fpr·|train| (sub-1% of the corpus for
    * the k=3 / 16-bits-per-key parameters below), while the bitmap rides
    * the task broadcast at a fraction of the exact set's footprint. The
    * confirm join keeps the result EXACT — false positives are re-checked
    * against the real shingle strings, so the output is bit-identical to
    * q38 (spec-pinned) and shares its oracle.
    *
    * Probe positions are `pmod(xxhash64(shingle, i), m)` for i ∈ {0,1,2}
    * (the seed column makes three independent hash functions of the one
    * xxhash64 kernel); the bitmap is a dense `array<bigint>` built by the
    * native [[graft.functions.DenseBitmapAgg]] (OR-merge ⇒ deterministic
    * for a given split), shipped as a one-row broadcast; membership is an
    * O(1) `element_at` index + shift per probe. m is sized from the same
    * provable character-sum ceiling as q38's budget check (shingles ≤
    * C/2), at 16 bits per expected key: worst-case fpr =
    * (1 − e^(−3/16))^3 ≈ 0.5%, lower in practice because the ceiling
    * over-counts.
    *
    * Measured (dense bitmap): sf0.1 0.39 s / sf1 0.73 / sf3 1.37 —
    * linear, and already at parity with q38's exact-broadcast plan at
    * sf0.1 (0.43). The two queries ARE the two regimes: q38 while the
    * eval suite broadcasts, q65 past the budget. */
  val q65_bloom_decontam: Q = (s, d) => {
    val (train, maybe, testShingles) = bloomDecontamParts(s, d)
    // exact confirm: only the bloom survivors shuffle; semi join needs no
    // distinct on the test side (EXISTS semantics)
    val confirmed = maybe
      .join(testShingles, Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    train.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(confirmed, Seq("doc_id"), "left_outer")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contamination",
        col("n_contaminated").cast(DoubleType) / col("n_shingles").cast(DoubleType))
      .filter(col("contamination") >= 0.05)
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"),
              col("contamination"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------ curation funnel
  /** The end-to-end curation funnel — the composed pipeline a training-data
    * team actually ships, reported as a per-stage survival ledger
    * `(stage, stage_name, n_docs, n_tokens)`:
    *
    *   0 raw        → the whole corpus
    *   1 lang_id    → q32's marker heuristic resolves a language (any
    *                  marker score > 0 ⇔ the argmax CASE lands on one)
    *   2 quality    → q31's signals pass fixed bars: n_tokens ≥ 20,
    *                  distinct_ratio ≥ 0.35, stop_ratio ≤ 0.15
    *   3 repetition → NOT q59-repetitive (Gopher bars: top-2-gram share
    *                  ≤ 0.20, duplicate-3-gram share ≤ 0.18)
    *   4 decontam   → not flagged by q38 (train-split docs with ≥ 5%
    *                  eval-shingle contamination)
    *   5 dedup      → q33's canonical-survivor election (min doc_id per
    *                  md5 fingerprint) AMONG STAGE-4 SURVIVORS — dedup
    *                  runs last, over what curation kept, as in production
    *
    * Plan shape: every stage-1..3 signal is row-local over ONE wide scan
    * (native gram_stats — no shuffle); the q38 flag set joins broadcast
    * (it is a filtered aggregate, corpus-bounded small); the only
    * corpus-sized shuffle is the fingerprint window for the dedup
    * election (the q33 exchange). The final rollup is a single-row
    * aggregate unpivoted with stack() — 6 rows out. At 100 TB: one scan +
    * one hash exchange, no quadratic term anywhere. */
  /** Per-document row-local funnel signals and the stage-1..3 flags over
    * any `(doc_id, text)` frame — ONE definition shared by the batch
    * funnel (q69) and the streaming twin
    * ([[graft.streaming.DocsFunnel]]), so the two can never drift.
    * Output: `(doc_id, n_tokens, fp, p1, p2, p3)`. */
  private[graft] def funnelSignals(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.Natives.registerAll(s)
    import graft.functions.GramStats.gram_stats
    def hits(words: String) = s"size(filter($TOKENS, t -> t IN ($words)))"
    docs
      .select(
        col("doc_id"),
        expr(s"size($TOKENS)").as("n_tokens"),
        expr(s"size(array_distinct($TOKENS))").as("n_distinct"),
        expr(s"size(filter($TOKENS, t -> t IN ('the', 'a')))").as("n_stop"),
        expr(hits("'the', 'a', 'and'")).as("s_en"),
        expr(hits("'el', 'la', 'los'")).as("s_es"),
        expr(hits("'der', 'und', 'die'")).as("s_de"),
        expr(hits("'le', 'les', 'et'")).as("s_fr"),
        expr(hits("'的', '是', '在'")).as("s_zh"),
        gram_stats(col("text"), 2).as("g2"),
        gram_stats(col("text"), 3).as("g3"),
        md5(regexp_replace(lower(trim(col("text"))), " +", " ")).as("fp"))
      // 0-guarded fractions (docs below 2/3 tokens have no grams; the
      // quality bar already excludes them, the guard just keeps NaN out
      // of the boolean algebra in both engines)
      .withColumn("top2", when(col("g2.n_grams") >= 1,
        col("g2.max_count").cast(DoubleType) / col("g2.n_grams").cast(DoubleType))
        .otherwise(lit(0.0)))
      .withColumn("dup3", when(col("g3.n_grams") >= 1,
        (col("g3.n_grams") - col("g3.n_distinct")).cast(DoubleType)
          / col("g3.n_grams").cast(DoubleType)).otherwise(lit(0.0)))
      .withColumn("p1",
        col("s_en") > 0 || col("s_es") > 0 || col("s_de") > 0 ||
        col("s_fr") > 0 || col("s_zh") > 0)
      .withColumn("p2", col("p1") && col("n_tokens") >= 20 &&
        col("n_distinct").cast(DoubleType) / col("n_tokens") >= 0.35 &&
        col("n_stop").cast(DoubleType) / col("n_tokens") <= 0.15)
      .withColumn("p3", col("p2") && !(col("top2") > 0.20 || col("dup3") > 0.18))
      .select("doc_id", "n_tokens", "fp", "p1", "p2", "p3")
  }

  /** The decontamination reference list: distinct shingles of the TEST
    * split (q57's md5-range rule, first byte ≥ 0xe6) — the FIXED input a
    * production decontamination pass consumes while the crawl grows.
    * Feeds the streaming funnel and any external caller directly; the
    * batch decontamination family reads it through the MATERIALIZED
    * [[sharedTestShingles]]. Only the test split's documents are exploded
    * (filter before the shingle fan-out — ~10% of the corpus). */
  def testShingleSet(s: SparkSession, d: String): DataFrame =
    docsWide(s, d)
      .withColumn("h", md5_long(col("doc_id").cast(StringType), 0, 2))
      .filter(col("h") >= 230)
      .select(explode(word_shingles(col("text"))).as("shingle"))
      .distinct()

  val q69_funnel: Q = (s, d) => {
    // the SHARED materialized report (one decontam computation per corpus
    // snapshot feeds q38's report AND this flag set — see
    // sharedDecontamFlags' accounting notes)
    val flagged = sharedDecontamFlags(s, d)
      .select(col("doc_id")).withColumn("contaminated", lit(1))
    val sig = funnelSignals(s, docsWide(s, d))
      // NO forced broadcast on the flag set: it is corpus-derived (worst
      // case the whole train split qualifies), so a broadcast() hint here
      // would be the driver-OOM class the q34/q38 live-budget swaps exist
      // to prevent. AQE's runtime stats convert the join to broadcast
      // whenever the set is actually small (the common case) and keep the
      // shuffle join when it isn't — the sig side is already hash-
      // partitioned on doc_id by docsWide, so the fallback costs one
      // small-side exchange only.
      .join(flagged, Seq("doc_id"), "left_outer")
      .withColumn("p4", col("p3") && col("contaminated").isNull)
      .withColumn("canon",
        min(when(col("p4"), col("doc_id"))).over(Window.partitionBy("fp")))
      .withColumn("p5", col("p4") && col("doc_id") === col("canon"))
    // sums coalesce to 0L so the EMPTY corpus yields the all-zero ledger
    // (sum over zero rows is NULL; the oracle and the streaming twin's
    // ledger both COALESCE — ADVICE r9 degenerate-case parity)
    def stageAgg(p: String, n: String, t: String) =
      Seq(coalesce(sum(when(col(p), 1L).otherwise(0L)), lit(0L)).as(n),
          coalesce(sum(when(col(p), col("n_tokens").cast(LongType)).otherwise(0L)), lit(0L)).as(t))
    sig.agg(
        count(lit(1)).as("c0"),
        (Seq(coalesce(sum(col("n_tokens").cast(LongType)), lit(0L)).as("t0")) ++
         stageAgg("p1", "c1", "t1") ++ stageAgg("p2", "c2", "t2") ++
         stageAgg("p3", "c3", "t3") ++ stageAgg("p4", "c4", "t4") ++
         stageAgg("p5", "c5", "t5")): _*)
      .select(expr(
        """stack(6,
             0, 'raw',        c0, t0,
             1, 'lang_id',    c1, t1,
             2, 'quality',    c2, t2,
             3, 'repetition', c3, t3,
             4, 'decontam',   c4, t4,
             5, 'dedup',      c5, t5) AS (stage, stage_name, n_docs, n_tokens)"""))
      .boundedOrderBy("stage")
  }

  /** Shared plumbing for q65 + its selectivity evidence: the same
    * train/test split as q38, the one-row bloom bitmap over the test
    * shingles, and `maybe` = train shingles the filter cannot rule out.
    * Returns (train, maybe, testShingles).
    *
    * The bitmap is a DENSE `array<bigint>` built by the native
    * [[graft.functions.DenseBitmapAgg]] — NOT a sparse map: Spark's
    * `element_at` on a map column is a linear key scan (maps are
    * array-backed), which made the first cut of this probe O(set size)
    * per row and the whole pre-filter quadratic in corpus size (sf0.1
    * 0.64 s → sf1 6.8 s). Dense `element_at(arr, i)` is a direct index;
    * probes are O(1) at any scale. */
  private def bloomDecontamParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    graft.functions.Natives.registerAll(s)
    // Same sharing as decontamReport (round 10): train explodes only
    // train-split docs, the test side is the shared materialized list.
    // The list is DISTINCT where the old inline derivation was not — the
    // bitmap OR-fold and the left-semi confirm are both multiplicity-
    // blind, so results are unchanged.
    val train = docsWide(s, d)
      .withColumn("h", md5_long(col("doc_id").cast(StringType), 0, 2))
      .filter(col("h") < 204)
      .select(col("doc_id"),
              explode(word_shingles(col("text"))).as("shingle"))
    val testShingles = sharedTestShingles(s, d)
    // m sized at 16 bits per EXPECTED test-split key: tokens ≤ chars/2,
    // test share = 26/256 of docs (expected-case under uniform hashing,
    // NOT a per-split ceiling — a corpus whose long documents happen to
    // hash into the test split can exceed it, raising fpr above the
    // ≈0.5% design point; the funnel spec's 4× slack absorbs that, and
    // EXACTNESS never depends on it — the confirm join erases every
    // false positive regardless). Floor 2^16 bits so tiny fixtures still
    // spread; CLAMPED to DenseBitmapAgg's 2^33-bit cap (1 GiB) — past it
    // (~10 GB of corpus text with this synthetic grow-together split)
    // bits-per-key degrades gracefully instead of the aggregate raising.
    // A real deployment sizes m from its BOUNDED eval suite, where the
    // 16 bits/key design point is a constant.
    val testChars = graft.Tables.documentsCharSum(s, d) * 26L / 256L
    val mBits = math.min(1L << 33, math.max(1L << 16, testChars / 2L * 16L))
    def probePos(i: Int) = s"pmod(xxhash64(shingle, $i), ${mBits}L)"
    val bloomRow = testShingles
      .select((0 to 2).map(i => expr(probePos(i)).as(s"p$i")): _*)
      .select(explode(array(col("p0"), col("p1"), col("p2"))).as("pos"))
      .agg(expr(s"dense_bitmap(pos, ${mBits}L)").as("bloom"))
    // probe positions PROJECTED once per row (p0..p2), then tested: the
    // predicate references each position twice (word + bit), and
    // FilterExec's codegen does no CSE across a predicate — inlining
    // probePos into the filter would evaluate 6 xxhash64 per row on the
    // full train side instead of 3
    val mightContain = (0 to 2).map { i =>
      expr(s"""(shiftright(element_at(bloom, CAST(p$i div 64 AS INT) + 1),
                           CAST(p$i % 64 AS INT)) & 1L) = 1L""")
    }.reduce(_ && _)
    val maybe = train
      .withColumns((0 to 2).map(i => s"p$i" -> expr(probePos(i))).toMap)
      .crossJoin(broadcast(bloomRow))
      .filter(mightContain)
      .drop("p0", "p1", "p2", "bloom")
    (train, maybe, testShingles)
  }

  /** Bloom pre-filter selectivity evidence for q65 (spec + EXPLAIN use):
    * (train shingle instances, bloom-candidate instances, confirmed
    * contaminated instances). fpr over clean rows =
    * (candidates − confirmed) / (train − confirmed). */
  def bloomDecontamFunnel(s: SparkSession, d: String): (Long, Long, Long) = {
    val (train, maybe, testShingles) = bloomDecontamParts(s, d)
    (train.count(), maybe.count(),
     maybe.join(testShingles, Seq("shingle"), "left_semi").count())
  }

  // ------------------------------------------------- deterministic sampling
  /** Content-hash sampling — the training-pipeline form of TABLESAMPLE:
    * membership is a pure function of the row key (md5-prefix < threshold),
    * so samples are reproducible across runs, engines and cluster layouts,
    * and scale-stable (each shard samples independently, no coordination).
    * ~10% stratum-wise sample of lineitem (keyed by order+line). */
  val q56_hash_sample: Q = (s, d) => {
    // Fan the per-row md5 out across the shuffle width: the hash compute
    // dominates the scan (measured 0.71 s serial of a 0.88 s query on the
    // single-row-group bench files). A plain filter-after-repartition
    // doesn't achieve this — PushDownPredicates moves the filter back
    // below the repartition onto the scan task — so the membership test is
    // fused into the aggregate as conditional sums (count/sum over CASE),
    // which evaluate where the partial aggregation runs: after the
    // exchange. The trailing n_sampled > 0 filter reproduces the WHERE
    // form's group elimination exactly (a flag with zero sampled rows
    // appears in neither).
    graft.functions.Natives.registerAll(s)
    // first md5 hex byte < '1a' ⇔ md5_long(…, 0, 2) < 26 — same rows,
    // no hex string/substring per row (was 1.9 CPU-s of the query)
    val keep = md5_long(
      concat(col("l_orderkey").cast(StringType), lit(":"),
             col("l_linenumber").cast(StringType)), 0, 2) < 26
    // ... but the fan-out exchange is a LAYOUT workaround, not the plan
    // you want at scale: a 100 TB lineitem arrives as thousands of splits
    // and the row-local hash already runs wide — shuffling the full
    // corpus to sample it would be the bottleneck. Gate the repartition
    // on the scan actually being narrower than the machine (the bench's
    // single-row-group file ⇒ 1 task), same layout-vs-CPU-budget rule as
    // the IVF build's assignment stage (EXPLAIN_r10 §1a).
    val li = lineitem(s, d)
    val spread =
      if (li.rdd.getNumPartitions >= s.sparkContext.defaultParallelism) li
      else li.repartition(s.sessionState.conf.numShufflePartitions, col("l_orderkey"))
    spread
      .groupBy("l_returnflag")
      .agg(count(when(keep, 1)).as("n_sampled"),
           sum(when(keep, money(col("l_quantity")))).cast(DoubleType).as("sampled_qty"))
      .filter(col("n_sampled") > 0)
      .boundedOrderBy("l_returnflag")
  }

  /** Train/validation/test split by content hash (80/10/10): the split
    * label is a deterministic function of doc_id ⇒ no leakage across
    * reshuffles/reruns, and near-dup handling can key the hash on the
    * dedup fingerprint instead of the id. */
  val q57_dataset_split: Q = (s, d) =>
    documents(s, d)
      .withColumn("h", expr("substring(md5(CAST(doc_id AS STRING)), 1, 2)"))
      .withColumn("split", expr(
        """CASE WHEN h < 'cc' THEN 'train'
                WHEN h < 'e6' THEN 'validation'
                ELSE 'test' END"""))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"))
      .boundedOrderBy("split", "lang")

  /** Class-balanced downsampling: at most K examples per label, selected
    * by hash order (deterministic, unbiased within label) — the standard
    * rebalancing pass before training. */
  val q58_balanced_sample: Q = (s, d) => {
    val w = Window.partitionBy("label")
      .orderBy(expr("md5(CAST(vec_id AS STRING))"), col("vec_id"))
    embeddings(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .groupBy("label")
      .agg(count(lit(1)).as("n_kept"),
           min(col("vec_id")).as("min_vec_id"),
           max(col("vec_id")).as("max_vec_id"))
      .boundedOrderBy("label")
  }

  // ===================================================================
  val queries: Map[String, Q] = Map(
    "q36_simhash_pairs"     -> q36_simhash_pairs,
    "q56_hash_sample"       -> q56_hash_sample,
    "q57_dataset_split"     -> q57_dataset_split,
    "q58_balanced_sample"   -> q58_balanced_sample,
    "q30_token_stats"       -> q30_token_stats,
    "q76_bpe_token_stats"   -> q76_bpe_token_stats,
    "q31_doc_quality"       -> q31_doc_quality,
    "q32_lang_id"           -> q32_lang_id,
    "q33_fingerprint_dedup" -> q33_fingerprint_dedup,
    "q39_winnow_fingerprints" -> q39_winnow_fingerprints,
    "q63_winnow_dup_pairs"  -> q63_winnow_dup_pairs,
    "q64_incremental_neardup" -> q64_incremental_neardup,
    "q59_repetition_stats"  -> q59_repetition_stats,
    "q34_ngram_jaccard"     -> q34_ngram_jaccard,
    "q35_minhash_lsh"       -> q35_minhash_lsh,
    "q37_neardup_clusters"  -> q37_neardup_clusters,
    "q38_decontamination"   -> q38_decontamination,
    "q65_bloom_decontam"    -> q65_bloom_decontam,
    "q69_funnel"            -> q69_funnel,
  )

  private def hitsSql(words: String) =
    s"len(list_filter(string_split(text, ' '), t -> t IN ($words)))"

  /** The winnow fingerprint derivation shared by the q39 and q63 oracles:
    * closed-form Horner gram hash (B=1000003, P=2^31−1, every intermediate
    * < 2^51), position-encoded key = h·2^20 + (2^20−1−pos), 4-row window
    * MIN, truncated-window rule for docs with 1..3 grams — bit-identical
    * to the native [[graft.functions.WinnowKeys]] rolling/deque pass. */
  private val WinnowSelCte =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         g AS (
           SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2), i -> {
             'gpos': i,
             'key': (((((('0x' || substring(md5(t[i]), 1, 10))::BIGINT % 2147483647) * 1000003
                 + ('0x' || substring(md5(t[i+1]), 1, 10))::BIGINT % 2147483647) % 2147483647) * 1000003
                 + ('0x' || substring(md5(t[i+2]), 1, 10))::BIGINT % 2147483647) % 2147483647) * 1048576
                 + (1048575 - (i - 1)) })) AS gr
           FROM tok),
         w AS (
           SELECT doc_id, gr.gpos AS gpos, gr.key AS key,
             MIN(gr.key) OVER (PARTITION BY doc_id ORDER BY gr.gpos
                               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin,
             MIN(gr.key) OVER (PARTITION BY doc_id) AS allmin,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
           FROM g),
         sel AS (
           SELECT DISTINCT doc_id, wmin AS key FROM w WHERE gpos >= 4
           UNION
           SELECT DISTINCT doc_id, allmin AS key FROM w WHERE n < 4)"""

  /** One decontamination semantics, two plans under test: q38 (exact
    * broadcast set, budget-checked) and q65 (bloom pre-filter + exact
    * confirm) both reduce to this SQL. The ORDER-BY-free body is also the
    * `flagged` sub-derivation of the q69 funnel oracle — one source of
    * truth for the semantics, three consumers. */
  private val DecontamBodySql =
    """WITH sh AS (
         SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h,
                unnest(list_distinct(list_transform(
                  generate_series(1, len(t) - 2),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
         FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
       test_sh AS (SELECT DISTINCT shingle FROM sh WHERE h >= 'e6'),
       train AS (SELECT doc_id, shingle FROM sh WHERE h < 'cc')
       SELECT t.doc_id, COUNT(*) AS n_shingles,
         CAST(SUM(CASE WHEN ts.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated,
         CAST(SUM(CASE WHEN ts.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS contamination
       FROM train t LEFT JOIN test_sh ts ON t.shingle = ts.shingle
       GROUP BY t.doc_id
       HAVING CAST(SUM(CASE WHEN ts.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) >= 0.05"""

  private val DecontamOracleSql = DecontamBodySql + "\n       ORDER BY t.doc_id"

  /** q69: the funnel oracle — each stage's predicate is the same SQL its
    * standalone query uses (q32 markers, q31 ratios, q59 gram fractions
    * with the 0-guard, the decontam body verbatim, q33's fingerprint), the
    * stage CTEs chain, and the ledger is a UNION ALL of six aggregates. */
  private val FunnelOracleSql = {
    def hs(words: String) = hitsSql(words)
    s"""WITH sig AS (
         SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS dr,
           CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
             / len(string_split(text, ' ')) AS sr,
           ${hs("'the', 'a', 'and'")} AS s_en,
           ${hs("'el', 'la', 'los'")} AS s_es,
           ${hs("'der', 'und', 'die'")} AS s_de,
           ${hs("'le', 'les', 'et'")} AS s_fr,
           ${hs("'的', '是', '在'")} AS s_zh,
           md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp
         FROM documents),
       rtok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       rg2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> t[i] || chr(1) || t[i+1])) AS g FROM rtok),
       rc2 AS (SELECT doc_id, g, COUNT(*) AS c FROM rg2 GROUP BY 1, 2),
       rs2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n2,
                 CAST(MAX(c) AS BIGINT) AS max2 FROM rc2 GROUP BY 1),
       rg3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2])) AS g FROM rtok),
       rc3 AS (SELECT doc_id, g, COUNT(*) AS c FROM rg3 GROUP BY 1, 2),
       rs3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n3, COUNT(*) AS d3 FROM rc3 GROUP BY 1),
       rp AS (SELECT rs2.doc_id AS doc_id,
                CASE WHEN n2 >= 1 THEN CAST(max2 AS DOUBLE) / CAST(n2 AS DOUBLE) ELSE 0 END AS top2,
                CASE WHEN n3 >= 1 THEN CAST(n3 - d3 AS DOUBLE) / CAST(n3 AS DOUBLE) ELSE 0 END AS dup3
              FROM rs2 JOIN rs3 ON rs2.doc_id = rs3.doc_id),
       flagged AS (SELECT doc_id FROM ($DecontamBodySql)),
       f1 AS (SELECT * FROM sig
              WHERE s_en > 0 OR s_es > 0 OR s_de > 0 OR s_fr > 0 OR s_zh > 0),
       f2 AS (SELECT * FROM f1 WHERE n_tokens >= 20 AND dr >= 0.35 AND sr <= 0.15),
       f3 AS (SELECT f2.* FROM f2 LEFT JOIN rp USING (doc_id)
              WHERE NOT (COALESCE(top2, 0) > 0.20 OR COALESCE(dup3, 0) > 0.18)),
       f4 AS (SELECT * FROM f3 WHERE doc_id NOT IN (SELECT doc_id FROM flagged)),
       f5 AS (SELECT * FROM f4
              QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp))
       SELECT * FROM (
         SELECT 0 AS stage, 'raw' AS stage_name, COUNT(*) AS n_docs,
           CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens FROM sig
         UNION ALL SELECT 1, 'lang_id', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM f1
         UNION ALL SELECT 2, 'quality', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM f2
         UNION ALL SELECT 3, 'repetition', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM f3
         UNION ALL SELECT 4, 'decontam', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM f4
         UNION ALL SELECT 5, 'dedup', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM f5)
       ORDER BY stage"""
  }

  val oracles: Map[String, String] = Map(
    "q69_funnel" -> FunnelOracleSql,
    "q56_hash_sample" ->
      """SELECT l_returnflag, COUNT(*) AS n_sampled,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sampled_qty
         FROM lineitem
         WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a'
         GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q57_dataset_split" ->
      """SELECT CASE WHEN h < 'cc' THEN 'train'
                     WHEN h < 'e6' THEN 'validation'
                     ELSE 'test' END AS split,
           lang, COUNT(*) AS n_docs
         FROM (SELECT lang, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h FROM documents)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q58_balanced_sample" ->
      """WITH ranked AS (
           SELECT label, vec_id,
             ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
           FROM embeddings)
         SELECT label, COUNT(*) AS n_kept,
           MIN(vec_id) AS min_vec_id, MAX(vec_id) AS max_vec_id
         FROM ranked WHERE rn <= 20
         GROUP BY label ORDER BY label""",

    "q36_simhash_pairs" ->
      """WITH hashed AS (
           SELECT doc_id,
             list_transform(string_split(text, ' '),
               t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS hs
           FROM documents),
         sims AS (
           SELECT doc_id,
             list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(0, 59),
               b -> CASE WHEN list_reduce(list_prepend(0,
                            list_transform(hs, h -> CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)),
                          (acc, v) -> acc + v) > 0
                    THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)),
               (acc, v) -> acc + v) AS simhash
           FROM hashed),
         bands AS (
           SELECT doc_id, simhash, unnest(list_transform(generate_series(0, 3),
             b -> b::VARCHAR || ':' || (((simhash >> (b * 15)) & 32767))::VARCHAR)) AS band_key
           FROM sims)
         SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(MIN(bit_count(xor(a.simhash, b.simhash))) AS INTEGER) AS hamming
         FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING MIN(bit_count(xor(a.simhash, b.simhash))) <= 3
         ORDER BY 1, 2""",
    "q30_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
         FROM documents GROUP BY lang ORDER BY lang""",

    // same pattern string (BpeRe, SQL-quote-escaped), same count rule
    // (regexp_count ≡ len(regexp_extract_all)), ratio = one double
    // division of exact aggregate ints in the same order
    "q76_bpe_token_stats" ->
      s"""SELECT source, COUNT(*) AS docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '${BpeRe.replace("'", "''")}'))) AS BIGINT) AS bpe_tokens,
           CAST(SUM(len(regexp_extract_all(text, '${BpeRe.replace("'", "''")}'))) AS DOUBLE)
             / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS bpe_per_ws
         FROM documents GROUP BY source ORDER BY source""",

    "q31_doc_quality" ->
      """SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS distinct_ratio,
           CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stop_ratio,
           CAST(list_reduce(list_transform(string_split(text, ' '), x -> len(x)), (acc, v) -> acc + v) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_tok_len
         FROM documents ORDER BY doc_id""",

    "q32_lang_id" ->
      s"""SELECT lang, predicted, COUNT(*) AS n_docs FROM (
           SELECT lang,
             CASE
               WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
               WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
               WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
               WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
               WHEN s_zh > 0 THEN 'zh'
               ELSE 'unknown' END AS predicted
           FROM (SELECT lang,
             ${hitsSql("'the', 'a', 'and'")} AS s_en,
             ${hitsSql("'el', 'la', 'los'")} AS s_es,
             ${hitsSql("'der', 'und', 'die'")} AS s_de,
             ${hitsSql("'le', 'les', 'et'")} AS s_fr,
             ${hitsSql("'的', '是', '在'")} AS s_zh
           FROM documents))
         GROUP BY lang, predicted ORDER BY lang, predicted""",

    "q33_fingerprint_dedup" ->
      """SELECT lang, COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))) AS n_unique,
           COUNT(*) - COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))) AS n_dups
         FROM documents GROUP BY lang ORDER BY lang""",

    // identical keys from the closed-form Horner gram hash (every
    // intermediate < 2^51: ah < 2^31, ah*B < 2^51) + a 4-row window MIN;
    // the truncated-window rule (docs with 1..3 grams emit their overall
    // min) is the `n < 4` branch. Constants: B=1000003, P=2^31−1,
    // pos-encode key = h·2^20 + (2^20−1−pos) — see WinnowKeys.scala.
    "q39_winnow_fingerprints" ->
      (WinnowSelCte + """
         SELECT doc_id, key // 1048576 AS fp_hash, 1048575 - (key % 1048576) AS fp_pos
         FROM sel ORDER BY doc_id, fp_pos"""),

    // q63: the same winnow CTE, rolled up to the pair report — distinct
    // (doc, hash), HAVING df <= cap (the stop-fingerprint rule), pair join
    // on fp_hash, containment = n_shared / min sizes (double division of
    // exact ints in both engines), with the n_shared >= 2 floor
    "q63_winnow_dup_pairs" ->
      (WinnowSelCte + s""",
         fp AS (SELECT DISTINCT doc_id, key // 1048576 AS fp_hash FROM sel),
         df AS (SELECT fp_hash FROM fp GROUP BY 1 HAVING COUNT(*) <= $WinnowDfCap),
         fpc AS (SELECT fp.doc_id, fp.fp_hash FROM fp JOIN df USING (fp_hash)),
         sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM fpc GROUP BY 1),
         pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                     CAST(COUNT(*) AS BIGINT) AS n_shared
                   FROM fpc a JOIN fpc b
                     ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT d1, d2, n_shared,
           CAST(n_shared AS DOUBLE) / CAST(LEAST(s1.n_fp, s2.n_fp) AS DOUBLE)
             AS containment
         FROM pairs
         JOIN sizes s1 ON d1 = s1.doc_id
         JOIN sizes s2 ON d2 = s2.doc_id
         WHERE n_shared >= 2
           AND CAST(n_shared AS DOUBLE) / CAST(LEAST(s1.n_fp, s2.n_fp) AS DOUBLE) >= 0.5
         ORDER BY d1, d2"""),

    // same gram keys (chr(1)-joined tokens), same count rollups, same
    // inner join dropping <3-token docs; ratios are double divisions of
    // exact integer counts in both engines
    "q59_repetition_stats" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                  i -> t[i] || chr(1) || t[i+1])) AS g FROM tok),
         c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
         s2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n2,
                  CAST(MAX(c) AS BIGINT) AS max2 FROM c2 GROUP BY 1),
         g3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
                  i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2])) AS g FROM tok),
         c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
         s3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n3, COUNT(*) AS d3 FROM c3 GROUP BY 1)
         SELECT s2.doc_id AS doc_id, n2,
           CAST(max2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS top2_frac,
           CAST(n3 - d3 AS DOUBLE) / CAST(n3 AS DOUBLE) AS dup3_frac,
           (CAST(max2 AS DOUBLE) / CAST(n2 AS DOUBLE) > 0.20
             OR CAST(n3 - d3 AS DOUBLE) / CAST(n3 AS DOUBLE) > 0.18) AS repetitive
         FROM s2 JOIN s3 ON s2.doc_id = s3.doc_id
         ORDER BY s2.doc_id""",

    "q34_ngram_jaccard" ->
      s"""WITH ${shinglesSql(50)},
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shf GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
           FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id)
         SELECT d1, d2, n_common,
           CAST(n_common AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_common AS DOUBLE) AS jaccard
         FROM pairs
         JOIN sizes s1 ON s1.doc_id = d1
         JOIN sizes s2 ON s2.doc_id = d2
         WHERE CAST(n_common AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_common AS DOUBLE) >= 0.2
         ORDER BY d1, d2""",

    "q38_decontamination" -> DecontamOracleSql,
    // q65 is the bloom pre-filtered form of the SAME semantics (the exact
    // confirm join removes every false positive), so it shares q38's
    // oracle text verbatim — one SQL, two plans under test.
    "q65_bloom_decontam" -> DecontamOracleSql,

    // connected components as a recursive CTE: min reachable label per
    // node over the same symmetrized Jaccard-pair graph (UNION dedups, so
    // the recursion is finite on the (node,label) lattice)
    "q37_neardup_clusters" ->
      s"""WITH RECURSIVE ${shinglesSql(50)},
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shf GROUP BY doc_id),
         prs AS (
           SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
           FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id),
         pairs AS (
           SELECT d1, d2 FROM prs
           JOIN sizes s1 ON s1.doc_id = d1
           JOIN sizes s2 ON s2.doc_id = d2
           WHERE CAST(n_common AS DOUBLE) / CAST(s1.n_sh + s2.n_sh - n_common AS DOUBLE) >= 0.2),
         edges AS (
           SELECT d1 AS src, d2 AS dst FROM pairs
           UNION ALL SELECT d2, d1 FROM pairs),
         reach(node, label) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst),
         comp AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node)
         SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           doc_id = cluster_id AS is_survivor
         FROM comp ORDER BY doc_id""",

    "q35_minhash_lsh" ->
      s"""WITH ${shinglesSql(50)},
         hashed AS (
           SELECT doc_id,
             ('0x' || substring(md5(shingle), 1, 12))::BIGINT AS h1,
             ('0x' || substring(md5(shingle), 13, 12))::BIGINT AS h2
           FROM shf),
         mins AS (
           SELECT doc_id,
             ${(0 until 16).map(i => s"MIN((h1 + $i * h2) % $MinhashP) AS m$i").mkString(", ")}
           FROM hashed GROUP BY doc_id),
         bands AS (
           SELECT doc_id, unnest([
             ${(0 until 4).map(b => s"'$b' || '|' || m${4*b} || '|' || m${4*b+1} || '|' || m${4*b+2} || '|' || m${4*b+3}").mkString(", ")}
           ]) AS band_key FROM mins)
         SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_shared_bands
         FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id
         ORDER BY d1, d2""",

    // q64: the identical signature/band derivation, with the q35 pair join
    // replaced by the asymmetric delta(doc_id%10>=8) x base(<8) probe and
    // a per-delta-doc rollup. The df-cap is FROZEN AT BASE BUILD (banned =
    // shingles whose BASE df exceeds 50), matching the incremental index's
    // contract — both the persisted base bands and the per-delivery delta
    // bands exclude exactly that set (see the q64 builder note).
    "q64_incremental_neardup" ->
      s"""WITH sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(t) - 2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
         banned AS (
           SELECT shingle FROM sh WHERE doc_id % 10 < 8
           GROUP BY shingle HAVING COUNT(*) > 50),
         shf AS (
           SELECT sh.doc_id, sh.shingle FROM sh
           LEFT JOIN banned USING (shingle) WHERE banned.shingle IS NULL),
         hashed AS (
           SELECT doc_id,
             ('0x' || substring(md5(shingle), 1, 12))::BIGINT AS h1,
             ('0x' || substring(md5(shingle), 13, 12))::BIGINT AS h2
           FROM shf),
         mins AS (
           SELECT doc_id,
             ${(0 until 16).map(i => s"MIN((h1 + $i * h2) % $MinhashP) AS m$i").mkString(", ")}
           FROM hashed GROUP BY doc_id),
         bands AS (
           SELECT doc_id, unnest([
             ${(0 until 4).map(b => s"'$b' || '|' || m${4*b} || '|' || m${4*b+1} || '|' || m${4*b+2} || '|' || m${4*b+3}").mkString(", ")}
           ]) AS band_key FROM mins)
         SELECT n.doc_id AS delta_id,
           CAST(COUNT(DISTINCT o.doc_id) AS BIGINT) AS n_base_matches,
           MIN(o.doc_id) AS first_base_match
         FROM bands n JOIN bands o ON n.band_key = o.band_key
         WHERE n.doc_id % 10 >= 8 AND o.doc_id % 10 < 8
         GROUP BY n.doc_id
         ORDER BY delta_id""",
  )
}
