package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Session tuning the library's operators apply for themselves, with the
  * reasoning recorded next to the number. */
object Tuning {

  /** `ObjectHashAggregateExec` abandons its hash map and falls back to
    * SORT-based aggregation after
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
    * groups per task — default 128, sized for UNBOUNDED object buffers
    * (`collect_list` can hold anything). Every object aggregate in this
    * library carries a buffer bounded BY CONSTRUCTION — `bounded_doc_set`
    * ≤ cap+1 longs (≈0.5 KB at cap=50), `top_k_by_score` ≤ k
    * (score,id,label) tuples — so the hash map stays ≤ ~0.5 GB/task even
    * at 1M resident groups and the fallback only costs CPU: on the q35
    * df-cap stage (sf0.1, 32 tasks) the sort path measured 41.3 CPU-s vs
    * 16.6 CPU-s hashed — the fallback was re-sorting the full exploded
    * shingle set, the exact cost the single-pass df-cap exists to delete.
    *
    * 1M (1<<20) keeps the worst case inside the 1 GB/core envelope the
    * sf1 heap audit pinned; past it the fallback re-engages, which
    * degrades to sorting (round-6 behavior) instead of failing. Called by
    * the query builders whose aggregates are bounded; never lowers a
    * user-raised value. */
  def boundedObjectAgg(s: SparkSession): Unit = {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val want = 1L << 20
    val cur =
      try s.conf.get(key).toLong
      catch { case _: Exception => 128L }
    if (cur < want) s.conf.set(key, want.toString)
  }

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
}
