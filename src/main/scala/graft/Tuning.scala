package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Session tuning the library's operators apply for themselves, with the
  * reasoning recorded next to the number. */
object Tuning {

  /** `ObjectHashAggregateExec` abandons its hash map and falls back to
    * SORT-based aggregation after
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
    * groups per task — default 128, sized for UNBOUNDED object buffers
    * (`collect_list` can hold anything). The shingle df-cap aggregate
    * carries a buffer bounded BY CONSTRUCTION (`bounded_doc_set` ≤ cap+1
    * longs ≈ 0.5 KB at cap=50), so its hash map stays ≤ ~0.5 GB/task even
    * at 1M resident groups and the fallback only costs CPU: on the q35
    * df-cap stage (sf0.1, 32 tasks) the sort path measured 41.3 CPU-s vs
    * 16.6 CPU-s hashed — the fallback was re-sorting the full exploded
    * shingle set, the exact cost the single-pass df-cap exists to delete.
    *
    * The raised threshold is SCOPED, not session-wide (round 8): the exec
    * reads the conf at runtime from the ACTING session, so a session-wide
    * set from a per-query builder would also govern every later
    * ObjectHashAggregate in the session — including genuinely unbounded
    * collect_list buffers (q9's per-brand part lists, user queries) whose
    * memory guard the 128 default IS. Bounded-buffer queries are instead
    * built (and therefore executed) against a memoized CHILD session
    * (`newSession`: own conf, shared context/catalog) that carries the
    * override; the parent's conf is never touched. The child re-mirrors
    * the parent's runtime conf on every access, so conf the caller sets
    * between constructions (broadcast budgets in the forced-swap specs,
    * shuffle widths) applies identically — the ONE divergence is the
    * fallback threshold.
    *
    * 1M (1<<20) keeps the worst case inside the 1 GB/core envelope the
    * sf1 heap audit pinned; past it the fallback re-engages, which
    * degrades to sorting (round-6 behavior) instead of failing. To force
    * the fallback in a test, set the key on `df.sparkSession` (the child),
    * not the parent. */
  def boundedAggSession(s: SparkSession): SparkSession = {
    boundedChildren.keySet.removeIf(_.sparkContext.isStopped)
    // a bounded child asked for its own bounded session is itself (keeps
    // builders composable without stacking sessions)
    if (boundedChildren.containsValue(s)) return s
    val child = boundedChildren.computeIfAbsent(s, p => p.newSession())
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val parentAll = s.conf.getAll
    // authoritative mirror: a key the parent UNSET since the last sync
    // must not survive as a stale child override (the forced-swap specs
    // set-then-unset broadcast budgets on the parent)
    child.conf.getAll.foreach { case (k, _) =>
      if (k != key && !parentAll.contains(k))
        try child.conf.unset(k)
        catch { case _: Exception => () }
    }
    parentAll.foreach { case (k, v) =>
      if (!child.conf.getOption(k).contains(v))
        try child.conf.set(k, v)
        catch { case _: Exception => () } // static confs are not settable
    }
    val want = 1L << 20
    val cur =
      try child.conf.get(key).toLong
      catch { case _: Exception => 128L }
    if (cur < want) child.conf.set(key, want.toString)
    child
  }
  private val boundedChildren =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]

  /** Presentation ORDER BY for outputs that are BOUNDED BY CONSTRUCTION —
    * grouped on dictionary/calendar-cardinality keys (returnflag,
    * priority, nation, year×month, …), so the result is ≤ a few thousand
    * rows at ANY input scale. A global `orderBy` plans a RangePartitioning
    * exchange whose boundary-sampling pass is an extra JOB before the sort
    * stage — three driver round-trips to order rows that fit in one task.
    * `coalesce(1)` + in-partition sort produces the identical global order
    * (every call site sorts on the full, unique-per-row group key, so the
    * order admits no tie ambiguity) with one task, zero exchanges, zero
    * sampling. The final aggregation folds into the same single task,
    * which is exactly where a bounded-group rollup wants to finish: its
    * partial aggregates are already map-side-combined to ≤|groups| rows
    * per upstream partition. NOT for unbounded outputs (per-order,
    * per-document, per-pair results) — those keep the scalable range sort. */
  def boundedOrderBy(df: DataFrame, cols: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols: _*)

  /** `.boundedOrderBy(...)` drop-in for `.orderBy(...)` at the call sites
    * whose outputs are bounded (see [[boundedOrderBy]]); both `orderBy`
    * signatures mirrored. */
  implicit class BoundedSortOps(private val df: DataFrame) extends AnyVal {
    def boundedOrderBy(cols: Column*): DataFrame =
      Tuning.boundedOrderBy(df, cols: _*)
    def boundedOrderBy(c1: String, cs: String*): DataFrame =
      Tuning.boundedOrderBy(df, (c1 +: cs).map(df.col): _*)
  }

  /** Global `row_number() OVER (ORDER BY key)` for an UNBOUNDED input,
    * without the single-partition window (surrogate-key assignment, q17):
    * `Window.orderBy(...)` with no partition funnels EVERY row through
    * ONE task — fine for bounded domains (q16's calendar), a scale-killer
    * for a dimension that grows with the data.
    *
    * Two distributed phases instead:
    *  1. range-partition on the UNIQUE order key (equal keys can never
    *     split across range partitions; uniqueness is the caller's
    *     contract and makes row_number == rank), sort within, and stamp
    *     `monotonically_increasing_id` — partition id in the high bits,
    *     the in-partition ROW INDEX of the sorted run in the low 33. No
    *     second exchange, no per-partition window.
    *  2. count rows per partition (the ONLY driver-side data: ≤ width
    *     longs) and add each partition's prefix offset back via a literal
    *     lookup map: global row number = offset(pid) + local index + 1.
    *
    * VALUES are partitioning-independent: whatever boundaries the range
    * sampler picks, offsets are computed from the realized counts and the
    * unique key fixes the total order — CPUS=8 and CPUS=32 produce
    * identical numbers (the determinism probe covers the gated consumer).
    * The input is persisted across the two passes; a recomputed-on-
    * eviction partition reproduces the same ids because the partitioner's
    * boundaries are frozen in the plan and the in-partition sort is total.
    * Construction is EAGER (the counts job) — the same deliberate
    * side-effect class as Tables.calendar/tableRows. */
  def globalRowNumber(df: DataFrame, order: Column, name: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val parts = math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    val pid = shiftrightunsigned(col("__mid"), 33)
    // localCheckpoint, not persist: CacheManager dedupes persist() by
    // logical plan, so a re-CONSTRUCTED identical query would silently
    // serve the whole upstream pipeline from the previous construction's
    // cache — correct values, dishonest cost accounting (and a stale
    // read if the source changed). The checkpoint materializes fresh per
    // construction and pins the ids the offsets were computed from; a
    // deployment on a lossy cluster would use reliable checkpoint or an
    // explicit staging write, same shape. (Consumers that benchmark this
    // path rebuild per pass — Bench.rebuildEachPass — because the
    // construction itself runs the heavy jobs.)
    val ranged = df.repartitionByRange(parts, order)
      .sortWithinPartitions(order)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val counts = ranged.groupBy(pid.as("__pid")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // prefix offsets: rows in all partitions BEFORE this one
    val prefix = counts.scanLeft(0L) { case (cum, (_, n)) => cum + n }
    val mapEntries = counts.map(_._1).zip(prefix)
      .flatMap { case (p, off) => Seq(lit(p), lit(off)) }
    val offCol =
      if (mapEntries.isEmpty) lit(0L)
      else element_at(map(mapEntries: _*), pid)
    ranged
      .withColumn(name, offCol + col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1)
      .drop("__mid")
  }
}
