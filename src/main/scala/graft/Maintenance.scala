package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{BucketedLayout, HilbertLayout, ZOrderLayout}

/** ONE maintenance entry point for every persisted layout family (round
  * 16, VERDICT r15 #4): a deployment's daily loop calls `Maintenance.tick`
  * once and each family's own policy decides whether to fold — nobody
  * memorizes three knobs and three verbs.
  *
  * The families and their policies (knob → default → trigger → fold):
  *
  * | family | knob | default | trigger | fold verb |
  * |---|---|---|---|---|
  * | bucketed (lineitem×l_partkey, part×p_partkey, lineitem×l_orderkey, orders×o_orderkey) | `graft.bucketed.maxFilesPerBucket` | 4 | any bucket's file count > bound (name-only census) | compactBuckets (crash-forward swap) |
  * | z-order lineitem | `graft.cluster.maxProbeBloat` | 3.0 | point-probe must-read bytes > k·recorded floor (manifest arithmetic, domain-anchored) | recluster |
  * | Hilbert lineitem | `graft.cluster.maxProbeBloat` | 3.0 | same metric on the 3-dim curve | recluster |
  * | partitioned Item tree (opt-in via `itemDir`) | `graft.partitioned.maxFilesPerPartition` | 4 | any partition's file count > bound | compactPartitioned + crash-forward swap |
  * | Item partition EVOLUTION (needs `itemCalendar`) | `graft.partitioned.maxPartitionBytes` | never (Long.MaxValue) | any year partition's bytes > bound | whole-tree year → year-month rewrite (same swap) |
  *
  * Month is the evolution's TERMINAL grain by design: a month partition
  * past the bytes bound compacts under the files policy but never splits
  * further (Exporter.maintainItemPartitioned gates the rewrite to
  * year-grain trees). The escape hatch when a deployment outgrows month
  * partitions is a re-ensure at a NEW root — persistItemPartitioned into
  * a fresh directory with a day-bearing grain column, then swap the
  * serving path — i.e. a planned migration, not a tick policy: a grain
  * change below month multiplies leaf count ~30× and deserves an
  * operator decision, and the divergence-rebuild path already proves the
  * from-source rebuild is value-neutral at any grain.
  *
  * Design rules the tick inherits from its members:
  *  - MAINTAIN, never create: a family whose layout is absent (not
  *    ensured for this corpus, or gated off at this SF) is a safe no-op —
  *    every member's maintain() answers None on an empty census.
  *  - Every trigger is METADATA (file-name census or manifest
  *    arithmetic); corpus scans happen only inside a fold that fired.
  *  - Every fold is crash-forward (temp + completion marker + heal at
  *    next entry) and value-neutral (merged ≡ rebuilt, pinned per family
  *    in BucketedIncrementSpec / ClusteredDeltaSpec / ExporterSpec).
  *
  * Deliberately NOT in the tick: the streaming band index's rebuild
  * policy (BandIngest.needsRebuild) runs inside its own ingest loop —
  * it needs the drop/delta directories a batch tick doesn't know; the
  * LSH census (LshCensus) is freshness-stamped and self-heals at ensure,
  * so it has no fold to schedule. Both are documented here so the knob
  * table stays the single inventory.
  */
object Maintenance {

  /** One family's answer for one tick. `fired` = the policy folded;
    * `detail` is the human-readable evidence (census numbers or metric
    * vs floor). */
  final case class Action(family: String, target: String, fired: Boolean,
                          detail: String)

  /** The bucketed (table, key) families the engine registers — the two
    * co-location pairs (partkey join family, orderkey join/agg family). */
  val BucketedFamilies: Seq[(String, String)] = Seq(
    ("lineitem", "l_partkey"), ("part", "p_partkey"),
    ("lineitem", "l_orderkey"), ("orders", "o_orderkey"))

  /** Apply every registered family's maintenance policy once. Layouts
    * that do not exist for `sfDir` are safe no-ops; `itemDir` opts the
    * partitioned Item tree (a warehouse artifact, not an sfDir table)
    * into the same tick. Returns one [[Action]] per family, fired or
    * held — a caller's ledger line IS the tick's evidence. */
  def tick(s: SparkSession, sfDir: String,
           itemDir: Option[String] = None,
           itemCalendar: Option[org.apache.spark.sql.DataFrame] = None): Seq[Action] = {
    val bucketed = BucketedFamilies.map { case (t, k) =>
      val r = BucketedLayout.maintain(s, sfDir, t, k)
      Action("bucketed", s"$t/$k", r.isDefined,
        r.fold("held")(c => s"folded ${c._1} -> ${c._2} files"))
    }
    def curve(name: String, r: Option[(Double, Double)]): Action =
      Action(name, "lineitem", r.isDefined,
        r.fold("held")(mf =>
          f"folded at metric ${mf._1 / 1e6}%.2f MB vs floor ${mf._2 / 1e6}%.2f MB"))
    val z = curve("zorder", ZOrderLayout.maintain(s, sfDir))
    val h = curve("hilbert", HilbertLayout.maintain(s, sfDir))
    val item = itemDir.toSeq.map { dir =>
      val r = graft.superstore.Exporter.maintainItemPartitioned(s, dir, itemCalendar)
      Action("item-partitioned", dir, r.isDefined,
        r.fold("held")(c => s"folded ${c._1} -> ${c._2} files"))
    }
    bucketed ++ Seq(z, h) ++ item
  }
}
