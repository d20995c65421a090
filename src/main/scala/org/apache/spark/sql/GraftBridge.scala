package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge for the graft library: lift a custom
  * LogicalPlan into a DataFrame. `Dataset.ofRows` is package-private, so
  * every Spark-extension library that introduces whole-operator plans
  * (graft's BandJoin) needs this one-method hop into the sql package.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

/** Spill-aware UnsafeRow group buffer for graft's BandJoinExec — a thin
  * public facade over the `private[sql]` ExternalAppendOnlyUnsafeRowArray
  * that SortMergeJoin's buffered side uses. Rows accumulate on-heap up to
  * the in-memory threshold, then transparently migrate to an
  * UnsafeExternalSorter that spills to disk under memory pressure — so a
  * pathological key group degrades to disk bandwidth instead of OOM.
  * Constructor argument order follows SortMergeJoinScanner's call site:
  * (inMemoryRows, spillSizeBytes, spillRows, spillSizeBytes). */
final class GraftRowBuffer(inMemoryThreshold: Int, spillThreshold: Int,
                           spillSizeThreshold: Long) {
  private val arr = new execution.ExternalAppendOnlyUnsafeRowArray(
    inMemoryThreshold, spillSizeThreshold, spillThreshold, spillSizeThreshold)
  def add(r: org.apache.spark.sql.catalyst.expressions.UnsafeRow): Unit = arr.add(r)
  def clear(): Unit = arr.clear()
  def isEmpty: Boolean = arr.isEmpty
  def length: Int = arr.length
  /** Iterator starting at `start` (0-based). In-memory: O(1) positioning;
    * spilled: sequential skip, the same trade SortMergeJoin makes. A new
    * call invalidates previously returned iterators. */
  def iteratorFrom(start: Int): Iterator[org.apache.spark.sql.catalyst.expressions.UnsafeRow] =
    arr.generateIterator(start)
}

object GraftRowBuffer {
  /** Same thresholds SortMergeJoinExec reads for its buffered side. */
  def forJoin(conf: org.apache.spark.sql.internal.SQLConf): GraftRowBuffer =
    new GraftRowBuffer(
      conf.sortMergeJoinExecBufferInMemoryThreshold,
      conf.sortMergeJoinExecBufferSpillThreshold,
      conf.sortMergeJoinExecBufferSpillSizeThreshold)
}
