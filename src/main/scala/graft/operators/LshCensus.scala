package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED per-bucket occupancy census for the sign-LSH family (round
  * 16, VERDICT r15 #2).
  *
  * WHY: the round-15 overflow split made q42 skew-robust, but its census
  * — two column-pruned scans + a map-side-combined count per query — is a
  * recurring cost paid even where the split buys nothing (~0.7–1 s/query
  * at sf30 on the replica corpus, the round's only durable regression).
  * The census is a pure function of (corpus, resolution), so it is a
  * natural INGEST-time artifact, not a query-time computation — the
  * StatsManifest pattern applied to the LSH gate: tiny, stamped,
  * refreshed on append, conservation-guarded, and every consumer reads
  * it for the price of one small parquet file instead of a corpus scan.
  *
  * WHAT: `hist.parquet` under `target/lshcensus/<corpus-hash>/bits=<b>/`
  * — the FULL bucket histogram `(bucket, n)` at resolution `b` (full,
  * not overflow-only, so the row-conservation guard `Σn == count(*)` is
  * checkable from the artifact alone). The extension ladder (target /
  * splitFactor / maxExt) stays QUERY-time arithmetic over the tiny
  * histogram: the artifact depends only on the resolution, so one build
  * serves every split-knob setting — and the DuckDB oracle keeps
  * replaying census + ladder from the corpus itself (LshGate.oracleExtSql),
  * so the persisted path stays hash-gated against the recomputed one on
  * every Verify run.
  *
  * FRESHNESS: `_census_meta` records the corpus pathStamp + row count +
  * bits, written LAST (atomic move) — a crash mid-(re)build leaves a
  * stale stamp and the next ensure rebuilds. [[ensure]] additionally
  * checks conservation (artifact's Σn == the corpus's memoized count)
  * once per (session, corpus-stamp, bits) and rebuilds LOUDLY on any
  * mismatch: a stale census degrades to a rebuild, never to a wrong
  * extension width. [[append]] is the O(delta) ingest verb — an
  * embeddings delivery pipeline (the VecIngest shape) calls it after
  * landing each delta so queries never pay the rescan; the merged
  * histogram is conservation-checked against the post-append corpus and
  * divergence (an under- or over-covering delta) rebuilds from source.
  */
object LshCensus {

  private val Root = "/root/repo/target/lshcensus"
  private val MetaName = "_census_meta"

  private def corpusHash(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|lshcensus".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)

  /** off = the code's first dimension: 0 for the prefix code (q42), a
    * band window's start for the banded family (q78) — each (resolution,
    * offset) is its own artifact. */
  def dirFor(d: String, bits: Int, off: Int = 0): String =
    if (off == 0) s"$Root/${corpusHash(d)}/bits=$bits"
    else s"$Root/${corpusHash(d)}/bits=$bits.off=$off"

  /** Bucket code column — the native codegen'd sign code (values
    * bit-identical to the composed SQL forms, see SignCode's scaladoc),
    * cast to INT to keep the persisted histogram's schema (existing
    * artifacts stay readable and conservation-checkable). */
  private def bucketCol(s: SparkSession, off: Int, bits: Int)
      : org.apache.spark.sql.Column = {
    graft.functions.Natives.registerAll(s)
    graft.functions.SignCode.sign_code(col("embedding"), lit(off), lit(bits))
      .cast(org.apache.spark.sql.types.IntegerType)
  }

  // ---- meta ------------------------------------------------------------

  private def writeMeta(loc: String, stamp: Long, rows: Long, bits: Int): Unit = {
    val tmp = Paths.get(s"$loc/.$MetaName.tmp")
    Files.writeString(tmp,
      s"""{"sourceStamp":$stamp,"rows":$rows,"bits":$bits}""")
    Files.move(tmp, Paths.get(s"$loc/$MetaName"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private val stampRe = "\"sourceStamp\":(-?\\d+)".r
  private val rowsRe = "\"rows\":(\\d+)".r
  private[graft] def meta(loc: String): Option[(Long, Long)] = {
    val p = Paths.get(s"$loc/$MetaName")
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      for (st <- stampRe.findFirstMatchIn(s); r <- rowsRe.findFirstMatchIn(s))
        yield (st.group(1).toLong, r.group(1).toLong)
    }
  }

  // ---- build / read ----------------------------------------------------

  /** One fresh relation over the persisted histogram: (bucket INT, n
    * LONG). Each call reads anew — the q42 fresh-exprIds discipline holds
    * through the artifact. */
  def histogram(s: SparkSession, loc: String): DataFrame =
    s.read.parquet(s"$loc/hist.parquet")

  private def buildHist(s: SparkSession, d: String, bits: Int, off: Int,
                        loc: String): Long = {
    val hist = s.read.parquet(s"$d/embeddings.parquet")
      .select(bucketCol(s, off, bits).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    // tiny by construction (≤ 2^bits rows, bits ≤ 24 only when forced;
    // derived bits keep it ≤ ~N/target·2) — one file reads in one task
    hist.coalesce(1).write.mode("overwrite").parquet(s"$loc/hist.parquet")
    histogram(s, loc).agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
  }

  // validated once per (session, corpus stamp, bits): the conservation
  // check is a job over a tiny file, but q42 constructs two sides per
  // plan and Bench constructs per pass — metadata after the first hit
  private val validated =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String, Long)]()

  /** Drop the validation memo — specs that doctor an artifact in place
    * (same corpus stamp) use this to force the next ensure to re-check
    * conservation, the way a fresh session would. */
  private[graft] def invalidate(): Unit = validated.clear()

  /** Ensure the census artifact for `(corpus at d, bits)` exists and is
    * fresh; returns its directory. Fresh = meta stamp matches the live
    * corpus stamp AND the artifact's Σn equals the corpus row count
    * (memoized — Tables.tableRows); any mismatch rebuilds loudly. */
  def ensure(s: SparkSession, d: String, bits: Int, off: Int = 0): String = synchronized {
    // prune memo entries for stopped sessions (ADVICE r16 — the
    // Tables.rowCounts removeIf discipline): without it the set grows,
    // and RETAINS dead SparkSessions, across a long-lived multi-session
    // JVM such as the test harness
    validated.removeIf { case (ses, _, _) => ses.sparkContext.isStopped }
    val loc = dirFor(d, bits, off)
    val stamp = graft.Tables.pathStamp(s"$d/embeddings.parquet")
    if (validated.contains((s, loc, stamp))) return loc
    val n = graft.Tables.embeddingsCount(s, d)
    val fresh = meta(loc) match {
      case Some((st, rows)) if st == stamp && rows == n =>
        val total = histogram(s, loc)
          .agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
        if (total == n) true
        else {
          System.err.println(s"[lsh-census] conservation mismatch under " +
            s"$loc: artifact sums $total rows, corpus holds $n — rebuilding")
          false
        }
      case Some(_) => false // stale stamp or count: rebuild silently fresh
      case None => false
    }
    if (!fresh) {
      Files.createDirectories(Paths.get(loc))
      val total = buildHist(s, d, bits, off, loc)
      require(total == n,
        s"lsh-census build wrote $total rows of mass for a $n-row corpus")
      writeMeta(loc, stamp, n, bits) // meta LAST: crash ⇒ stale ⇒ rebuild
    }
    validated.add((s, loc, stamp))
    loc
  }

  /** O(delta) ingest refresh at the artifact's recorded resolution: merge
    * the delta's bucket histogram into the persisted one, advance the
    * stamp, conservation-check against the post-append corpus. The delta
    * must be exactly the rows appended to the corpus since the recorded
    * stamp; divergence rebuilds from source, loudly (the appendDelta
    * discipline every persisted structure carries). If the N-derived
    * resolution has stepped past this artifact's bits, the next ensure at
    * the new resolution builds its own artifact — this verb never
    * re-derives. */
  def append(s: SparkSession, d: String, bits: Int, delta: DataFrame,
             off: Int = 0): Unit =
    synchronized {
      val loc = dirFor(d, bits, off)
      require(meta(loc).isDefined,
        s"lsh-census append: no artifact at $loc — ensure first")
      val deltaHist = delta
        .select(bucketCol(s, off, bits).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("dn"))
      val merged = histogram(s, loc)
        .join(deltaHist, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"))
      // write-aside + swap: the merged read serves from the files being
      // replaced, so it must land elsewhere first; meta stays OLD until
      // the swap completes — a crash at any point reads as stale ⇒ rebuild
      val tmp = s"$loc/.hist_tmp"
      graft.Fs.deleteTree(Paths.get(tmp))
      merged.coalesce(1).write.parquet(tmp)
      graft.Fs.deleteTree(Paths.get(s"$loc/hist.parquet"))
      Files.move(Paths.get(tmp), Paths.get(s"$loc/hist.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
      graft.Tables.clearCaches() // the corpus stamp advanced with the delta
      val n = graft.Tables.embeddingsCount(s, d)
      val total = histogram(s, loc)
        .agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
      if (total != n) {
        System.err.println(s"[lsh-census] append divergence under $loc: " +
          s"merged artifact sums $total rows, corpus holds $n — the delta " +
          "was not exactly the appended rows. Rebuilding from source.")
        val rebuilt = buildHist(s, d, bits, off, loc)
        require(rebuilt == n)
      }
      writeMeta(loc, graft.Tables.pathStamp(s"$d/embeddings.parquet"), n, bits)
      // no validated-set invalidation needed: its key carries the corpus
      // stamp, which the append just advanced — consumers re-validate
    }
}
