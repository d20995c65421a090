package graft.operators

import org.apache.spark.sql.SparkSession

/** N-derived resolution gate for the sign-LSH near-dup join (q42) —
  * round 14, VERDICT r13 #1.
  *
  * WHY: at a FIXED resolution the bucket-local self-join's candidate count
  * grows quadratically with the corpus — at 8 bits (256 buckets) sf30's
  * 600 k vectors produce ~798 M candidate pairs (~51 G FLOP of dot
  * products, EXPLAIN_r13 §3), and 100 TB would be catastrophic. The design
  * was always "bits ∝ N" but the knob lived in documentation; this gate
  * makes it code, like every other scale lever in the engine.
  *
  * DERIVATION: `bits = smallest b in [MinBits, MaxBits] with
  * N ≤ target·2^b` — i.e. the expected bucket occupancy is held at
  * ~`target` rows, so candidate pairs ≈ N·target/2 grow LINEARLY with the
  * corpus (per-unit-data candidate count ~flat; the r14 ladder measures
  * it at sf0.1/1/10/30). The q41 bucket histogram is the sizing
  * instrument that justifies deriving from N alone: it shows the
  * axis-sign codes spread near-uniformly on this whitened corpus, so
  * expected occupancy N/2^b is the right planning quantity. MinBits keeps
  * the small-SF resolution at the historical 8 (sf0.001–sf0.1 outputs
  * unchanged); MaxBits bounds the code width far under the 64 available
  * dimensions.
  *
  * RECALL is the honest other side of the knob: single-band sign-LSH
  * recall against the weak cosine≥0.2 bar is ~1% ALREADY at 8 bits on
  * this near-orthogonal synthetic corpus (measured r14 — 1,304 of
  * 109,676 exact pairs at sf0.1), and more bits retrieve fewer of the
  * marginal pairs. q42 is the candidate-GENERATION operator; recall-
  * critical dedup rides the multi-band families (q35 MinHash bands, q36
  * SimHash fingerprint groups, q68 cell-local SemDeDup). Bench attests
  * the sampled recall at every rung rather than claiming it.
  *
  * ORACLE PARITY: the gate must be reproducible in plain SQL or the
  * oracle can't follow it. [[oracleBitsSql]] emits the SAME derivation as
  * a CASE ladder over `count(*)` (integer thresholds `target·2^b`, no
  * float log2 whose rounding could disagree), and honours the same
  * forced-conf overrides via SPARK_GRAFT_CONF — so the driver's default
  * Verify AND a forced-resolution Verify both hash-match.
  *
  * Confs:
  *  - `graft.lsh.bits` (>0 forces the resolution; 0/unset derives)
  *  - `graft.lsh.targetBucketRows` (expected bucket occupancy the
  *    derivation holds; default 32)
  */
object LshGate {

  val MinBits = 8
  val MaxBits = 24
  val DefaultTargetRows = 32L

  /** Smallest b in [MinBits, MaxBits] with n ≤ target·2^b. */
  def derivedBits(n: Long, target: Long = DefaultTargetRows): Int =
    (MinBits to MaxBits).find(b => n <= (target << b)).getOrElse(MaxBits)

  def targetRows(s: SparkSession): Long =
    s.conf.getOption("graft.lsh.targetBucketRows")
      .map(_.toLong).getOrElse(DefaultTargetRows)

  /** The live resolution for the corpus at `d`: forced conf if set, else
    * derived from the footer row count (metadata-only, memoized). */
  def bits(s: SparkSession, d: String): Int = {
    val forced = s.conf.getOption("graft.lsh.bits").map(_.toInt).getOrElse(0)
    if (forced > 0) forced
    else derivedBits(graft.Tables.embeddingsCount(s, d), targetRows(s))
  }

  /** Spark-SQL sign-bucket code over the first `bits` dimensions. */
  def sparkBucketExpr(bits: Int): String =
    s"""aggregate(sequence(0, ${bits - 1}),
         0, (acc, i) -> acc + CASE WHEN element_at(embedding, i + 1) > CAST(0 AS FLOAT)
                                   THEN CAST(shiftleft(1, i) AS INT) ELSE 0 END)"""

  /** DuckDB sign-bucket code; `bitsRef` is a SQL reference (column or
    * literal) holding the resolution. */
  def duckBucketExpr(bitsRef: String): String =
    s"""list_reduce(list_transform(generate_series(0, $bitsRef - 1),
         i -> CASE WHEN embedding[i + 1] > 0 THEN (1 << i) ELSE 0 END), (acc, v) -> acc + v)"""

  // ---- oracle-side derivation ------------------------------------------

  // The oracle SQL is rendered in the same JVM that runs the Spark
  // queries (Verify), so the forced-conf hook is the same SPARK_GRAFT_CONF
  // environment both sides see. Parsed once: env is immutable per JVM.
  private lazy val envConf: Map[String, String] =
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }.toMap

  /** SQL expression for the resolution, given `c` = corpus row count in
    * scope: a forced `graft.lsh.bits` renders as a literal; otherwise the
    * derivation's integer CASE ladder (bit-identical thresholds to
    * [[derivedBits]] — spec-pinned across the whole ladder). */
  def oracleBitsSql: String = {
    val forced = envConf.get("graft.lsh.bits").map(_.toInt).getOrElse(0)
    if (forced > 0) forced.toString
    else {
      val target = envConf.get("graft.lsh.targetBucketRows")
        .map(_.toLong).getOrElse(DefaultTargetRows)
      val arms = (MinBits until MaxBits)
        .map(b => s"WHEN c <= ${target << b} THEN $b").mkString(" ")
      s"CASE $arms ELSE $MaxBits END"
    }
  }
}
