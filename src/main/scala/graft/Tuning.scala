package graft

import org.apache.spark.sql.SparkSession

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
}
