package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{LshGate, VectorOps}

/** Measurement main for the q42 LSH resolution gate (round 14) and the
  * per-bucket overflow split (round 15): at a given SF / corpus, what
  * each resolution policy costs and buys.
  *
  * Per rung it reports, for each mode:
  *  - candidate pairs (Σ n·(n−1)/2 over the JOIN-GRAIN histogram —
  *    (bucket, extc) cells when the split is live, base buckets
  *    otherwise — the join's exact pre-filter cardinality)
  *  - the worst base bucket and the worst join cell (max_bucket /
  *    max_cell: the quantity the split bounds — a skewed corpus shows
  *    max_bucket ≫ target while max_cell returns to ~the irreducible
  *    duplicate-cluster size)
  *  - q42 output rows and wall seconds
  *  - probe-anchored sampled recall at cosine ≥ 0.2 and ≥ 0.4 (a partner
  *    counts as CAUGHT when it shares the probe's bucket AND extension
  *    code — the operator's own candidate grain). Honest single-band
  *    numbers; recall-critical dedup rides the multi-band families.
  *
  * Modes: `derived_split` (the live operator: N-derived bits + default
  * split factor), `derived_nosplit` (r14's gate alone — what the split
  * adds over it), `fixed8` (the historical constant — what the gate
  * added, printed when derived ≠ 8).
  *
  * Usage: runMain graft.LshLadder <sfDir>
  */
object LshLadder {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Natives.registerAll(spark)

    val n = Tables.embeddingsCount(spark, sfDir)
    val derived = LshGate.derivedBits(n, LshGate.targetRows(spark))

    def report(bits: Int, factor: Long, probes: Int, tag: String): Unit = {
      spark.conf.set("graft.lsh.bits", bits.toString)
      spark.conf.set("graft.lsh.splitFactor", factor.toString)
      spark.conf.set("graft.lsh.probes", probes.toString)
      try {
        def coded = VectorOps.lshCodedScan(spark, sfDir, bits)
        val cells = coded.groupBy("bucket", "ext", "extc").count()
        val h = cells
          .agg(sum(col("count") * (col("count") - 1) / 2).cast("long"),
               max(col("count")))
          .head
        // same-cell candidates; multi-probe adds the distance-1
        // cell-pair mass (each unordered cell pair once — the join's
        // d1<d2 keeps one orientation of every doc pair)
        val sameCell = h.getLong(0)
        val probeCand = if (probes <= 0) 0L else {
          val a = cells.select(col("bucket"), col("ext"),
            col("extc").as("ea"), col("count").as("na"))
          // side b from a SECOND groupBy over a fresh coded scan (`coded`
          // is a def → fresh exprIds end to end) — the q42 fresh-relation
          // discipline (ADVICE r15): two selects over the same `cells`
          // subtree lean on DeduplicateRelations, which was observed to
          // miss in long warm sessions (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
          val b = coded.groupBy("bucket", "ext", "extc").count()
            .select(col("bucket").as("bucket_b"),
            col("extc").as("eb"), col("count").as("nb"))
          val dx = col("ea").bitwiseXOR(col("eb"))
          a.join(b, col("bucket") === col("bucket_b") &&
              col("ea") < col("eb") && dx.bitwiseAND(dx - 1) === 0 &&
              dx < expr(s"shiftleft(CAST(1 AS BIGINT), least($probes, ext))"))
            .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).cast("long"))
            .head.getLong(0)
        }
        val (cand, maxCell) = (sameCell + probeCand, h.getLong(1))
        val maxBucket = coded.groupBy("bucket").count()
          .agg(max(col("count"))).head.getLong(0)
        // SPARK_GRAFT_LSH_SKIPJOIN=mode,mode — skip EXECUTING the
        // candidate join for reference modes whose cost is the ladder's
        // point (the f300 skew rung's unsplit join is ~7 G pairs / tens
        // of minutes; its cand_pairs census and recall probe — the
        // numbers the rung exists for — cost seconds). Skipped joins
        // report wall/out_rows as -1, like Bench's failed-query marker.
        val skipJoin = sys.env.get("SPARK_GRAFT_LSH_SKIPJOIN").toSeq
          .flatMap(_.split(",")).map(_.trim).contains(tag)
        val q42 = SparkEntry.queries("q42_lsh_neardup")
        val (rows, wall) =
          if (skipJoin) (-1L, -1.0)
          else timed { q42(spark, sfDir).count() }
        // probe-anchored sampled recall, both thresholds from one pass;
        // CAUGHT == the operator's own candidate grain: shares the
        // probe's (bucket, extc), or — under multi-probe — a cell at
        // Hamming distance 1 within the probed low bits
        val probeSet = coded.filter(col("vec_id") < 200)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
                  col("norm").as("qn"), col("bucket").as("qb"),
                  col("ext").as("qx"), col("extc").as("qe"))
        val dxq = col("extc").bitwiseXOR(col("qe"))
        val hit = col("bucket") === col("qb") && (col("extc") === col("qe") ||
          (lit(probes > 0) && dxq.bitwiseAND(dxq - 1) === 0 &&
            dxq < expr(s"shiftleft(CAST(1 AS BIGINT), least($probes, qx))")))
        val r = coded.join(broadcast(probeSet), col("vec_id") =!= col("q_id"))
          .withColumn("cos",
            graft.functions.DotProduct.dot_product(col("qv"), col("v")) /
              (col("qn") * col("norm")))
          .filter(col("cos") >= 0.2)
          .agg(
            count(lit(1)).as("ex02"),
            sum(when(hit, 1L).otherwise(0L)).as("c02"),
            sum(when(col("cos") >= 0.4, 1L).otherwise(0L)).as("ex04"),
            sum(when(col("cos") >= 0.4 && hit, 1L).otherwise(0L)).as("c04"))
          .head
        def ratio(c: Long, e: Long) =
          if (e == 0) 1.0 else math.rint(10000.0 * c / e) / 10000
        println(
          s"""{"sf_dir":"$sfDir","mode":"$tag","n":$n,"bits":$bits,""" +
          s""""split_factor":$factor,"probes":$probes,""" +
          s""""cand_pairs":$cand,"cand_per_row":${math.rint(100.0 * cand / n) / 100},""" +
          s""""max_bucket":$maxBucket,"max_cell":$maxCell,""" +
          s""""out_rows":$rows,"wall_s":${math.rint(wall * 100) / 100},""" +
          s""""recall02":${ratio(r.getLong(1), r.getLong(0))},""" +
          s""""recall04":${ratio(r.getLong(3), r.getLong(2))}}""")
      } finally {
        spark.conf.unset("graft.lsh.bits")
        spark.conf.unset("graft.lsh.splitFactor")
        spark.conf.unset("graft.lsh.probes")
      }
    }

    report(derived, LshGate.splitFactor(spark), 0, "derived_split")
    // the recall dial: distance-1 multi-probe over the low 4 suffix bits
    report(derived, LshGate.splitFactor(spark), 4, "derived_split_p4")
    report(derived, 0, 0, "derived_nosplit")
    if (derived != 8) report(8, 0, 0, "fixed8")
    spark.stop()
  }
}
