package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Whole-operator band join: `l ⋈ r ON keys AND r.time ∈ [l.time + lower,
  * l.time + upper]` for two LARGE inputs — the case the hour-bucket
  * rewrite (Warehouse.q49) approximates with bounded fan-out and a
  * re-filter, and a plain range-condition join degenerates into
  * per-key-group nested loops inside SortMergeJoin.
  *
  * Physical algorithm (BandJoinExec): both children hash-partitioned on
  * the keys (one shuffle each, exactly like an equi-SMJ) and sorted by
  * (keys, time). Within each co-partition a single merge pass buffers one
  * right key-group at a time — in SortMergeJoin's own spill-aware buffer
  * (ExternalAppendOnlyUnsafeRowArray behind GraftRowBuffer, same
  * thresholds), so a pathological key group degrades to disk bandwidth
  * instead of OOM, LITERALLY SMJ's memory envelope — and, because the
  * band `[t+lower, t+upper]` moves monotonically with the streamed
  * side's time, finds each left row's window by binary search over the
  * on-heap sorted times (8 B/row residual) + forward scan —
  * O(|group| log + matches), never |l|×|r|.
  *
  * At 100 TB this is the plan you want: shuffle on keys only, sorted
  * merge, state bounded by one key-group; skewed keys are the same
  * concern (and get the same salting/AQE remedies) as any SMJ.
  *
  * Keys and time columns are carried as resolved Attributes so Catalyst
  * sees real `references` — column pruning, through-the-node projection,
  * and attribute rewriting all behave exactly as for a built-in Join;
  * the exec resolves them to child ordinals at execution time.
  *
  * Supports inner and LEFT OUTER (unmatched left rows emit once with
  * null right columns — same merge pass, no second scan). Null keys
  * never match, matching SQL join semantics (see [[BandJoin.bandJoin]]).
  */
case class BandJoinPlan(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    lowerUs: Long, upperUs: Long, leftOuter: Boolean, matchLatest: Boolean,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override def references: AttributeSet =
    AttributeSet(leftKeys ++ rightKeys :+ leftTime :+ rightTime)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class BandJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    lowerUs: Long, upperUs: Long, leftOuter: Boolean, matchLatest: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // one shuffle per side, co-partitioned on the keys — EnsureRequirements
  // aligns the two hash partitionings exactly as it does for SMJ
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // sorted by (keys, time) so the merge is a single forward pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(a => SortOrder(a, Ascending)),
    (rightKeys :+ rightTime).map(a => SortOrder(a, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  private def ordinalOf(out: Seq[Attribute], a: Attribute): Int = {
    val i = out.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"attribute $a not found in $out")
    i
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = left.output; val rSchema = right.output
    val lKeyOrds = leftKeys.map(ordinalOf(lSchema, _))
    val rKeyOrds = rightKeys.map(ordinalOf(rSchema, _))
    val lTimeOrd = ordinalOf(lSchema, leftTime)
    val rTimeOrd = ordinalOf(rSchema, rightTime)
    val lo = lowerUs; val hi = upperUs
    val outAttrs = output
    // Same thresholds as SortMergeJoin's buffered side (captured on the
    // driver — SQLConf is not available executor-side)
    val inMemT = conf.sortMergeJoinExecBufferInMemoryThreshold
    val spillT = conf.sortMergeJoinExecBufferSpillThreshold
    val spillB = conf.sortMergeJoinExecBufferSpillSizeThreshold

    left.execute().zipPartitions(right.execute()) { (lRaw, rRaw) =>
      val lIter = lRaw; val rIter = rRaw.buffered
      val keyTypes = lKeyOrds.map(lSchema(_).dataType)
      val ord = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lKeyProj = UnsafeProjection.create(lKeyOrds.map(i =>
        BoundReference(i, lSchema(i).dataType, lSchema(i).nullable)))
      val rKeyProj = UnsafeProjection.create(rKeyOrds.map(i =>
        BoundReference(i, rSchema(i).dataType, rSchema(i).nullable)))
      // left outer: bind against nullable right attrs, else the generated
      // projection skips the null check and reads 0 from the null row
      val rBindSchema =
        if (leftOuter) rSchema.map(_.withNullability(true)) else rSchema
      val resultProj = UnsafeProjection.create(outAttrs, lSchema ++ rBindSchema)
      val joined = new JoinedRow
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rSchema.length)
      val outer = leftOuter

      new Iterator[InternalRow] {
        private var curKey: UnsafeRow = _                  // copied
        // Right key-group: rows in SortMergeJoin's spill-aware buffer (a
        // pathological group degrades to disk instead of OOM); sorted
        // event times kept on-heap for the binary search (8 B/row — the
        // documented residual bound; the row payloads are the spillable
        // bulk). Indexes align: times(i) is group row i's time.
        private val group =
          new org.apache.spark.sql.GraftRowBuffer(inMemT, spillT, spillB)
        private val times = new ArrayBuffer[Long]()
        private var groupIter: Iterator[UnsafeRow] = Iterator.empty
        private var curLeft: InternalRow = _               // zero-copy streamed row
        private var cursor = 0                             // next group index for curLeft
        private var windowEnd = 0L
        private var emitNull = false                       // left_outer: unmatched curLeft

        // first group index with time >= t
        private def lowerBound(t: Long): Int = {
          var a = 0; var b = times.length
          while (a < b) {
            val m = (a + b) >>> 1
            if (times(m) < t) a = m + 1 else b = m
          }
          a
        }

        // conversion fallback for direct Exec construction over non-Unsafe
        // rows (the planned path always feeds UnsafeRows via SortExec);
        // GraftRowBuffer.add copies internally, so the reused projection
        // output is safe to pass
        private val rToUnsafe = UnsafeProjection.create(rSchema.map(_.dataType).toArray)

        private def loadRightGroup(key: UnsafeRow): Unit = {
          group.clear(); times.clear(); groupIter = Iterator.empty
          while (rIter.hasNext && ord.compare(rKeyProj(rIter.head), key) < 0)
            rIter.next()
          while (rIter.hasNext && ord.compare(rKeyProj(rIter.head), key) == 0) {
            val r = rIter.next()
            // a NULL right time matches nothing (SQL range semantics) and
            // would corrupt the sorted times buffer (getLong on a null
            // field reads 0 = epoch); the API filters them, this guards
            // direct Exec construction too. Nulls sort first under the
            // required ascending order, so skipping preserves sortedness.
            if (!r.isNullAt(rTimeOrd)) {
              times += r.getLong(rTimeOrd)
              group.add(r match {
                case u: UnsafeRow => u
                case other        => rToUnsafe(other)
              })
            }
          }
        }

        /** Position (curLeft, cursor) on the next left row with matches —
          * or, in left-outer mode, on the next unmatched left row with
          * emitNull set.
          *
          * No copy of the streamed left row: the child's iterator may
          * reuse the row object, but it is only mutated by the NEXT
          * lIter.next(), which cannot happen until this left row's
          * matches are fully emitted (consume-then-process, the same
          * zero-copy discipline as SortMergeJoin's streamed side —
          * round 2 peeked via a BufferedIterator, which forced a
          * defensive copy of EVERY left row). The key projection is
          * copied only on group change. */
        private def advance(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l)
            if (curKey == null || ord.compare(lk, curKey) != 0) {
              curKey = lk.copy()
              loadRightGroup(curKey)
            }
            if (l.isNullAt(lTimeOrd)) {
              // NULL left time: matches nothing. Inner: drop (the API
              // already filters; this covers direct Exec use). Left
              // outer: emit null-extended, like any unmatched row.
              if (outer) { curLeft = l; emitNull = true; return true }
            } else {
              val lt = l.getLong(lTimeOrd)
              val start = if (times.isEmpty) 0 else lowerBound(lt + lo)
              if (start < times.length && times(start) <= lt + hi) {
                curLeft = l
                if (matchLatest) {
                  // as-of: only the greatest right time in the window — the
                  // last index with time <= lt+hi; windowEnd = its own time
                  // stops the emit loop after exactly one row (the next
                  // index, if any, is strictly greater)
                  cursor = lowerBound(lt + hi + 1) - 1
                  windowEnd = times(cursor)
                } else {
                  cursor = start; windowEnd = lt + hi
                }
                // fresh iterator per left row: overlapping windows move the
                // start backward relative to the previous row's last
                // position. In-memory this is O(1) positioning; spilled it
                // is a sequential skip — the same trade SortMergeJoin makes
                // re-iterating its buffered group per streamed row.
                groupIter = group.iteratorFrom(cursor)
                return true
              } else if (outer) {
                curLeft = l; emitNull = true
                return true
              }
            }
          }
          false
        }

        override def hasNext: Boolean = {
          if (emitNull) return true
          if (curLeft != null && cursor < times.length && times(cursor) <= windowEnd)
            return true
          curLeft = null
          advance()
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          if (emitNull) {
            emitNull = false
            val out = resultProj(joined(curLeft, nullRight))
            curLeft = null
            return out
          }
          // groupIter is positioned at `cursor` (fresh per left row); the
          // returned row may be a reused buffer on the spilled path, but it
          // is fully consumed by resultProj before the next call
          val r = groupIter.next(); cursor += 1
          resultProj(joined(curLeft, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)
}

object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BandJoinPlan(lk, rk, lt, rt, lo, hi, outer, latest, l, r) =>
      BandJoinExec(lk, rk, lt, rt, lo, hi, outer, latest,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object BandJoin {
  /** Register the planning strategy once per session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(BandJoinStrategy))
      spark.experimental.extraStrategies = cur :+ BandJoinStrategy
  }

  /** `left ⋈ right ON keys AND right.time ∈ [left.time+lowerUs,
    * left.time+upperUs]` (inner, or left outer with `leftOuter = true`).
    * Time columns must be TimestampType or LongType (micros). The right
    * side is re-aliased so self-joins get fresh attribute ids. Null keys
    * never match (SQL semantics): they are filtered from the right side
    * and — inner only — from the left; under left outer a null-key left
    * row flows through with null right columns (it sorts before every
    * non-null key group and finds an empty window). Null TIME values get
    * the same treatment: a null timestamp matches nothing (inner) or
    * emits null-extended (left outer) — never a spurious epoch-0 match. */
  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
               leftTime: String, rightTime: String,
               lowerUs: Long, upperUs: Long,
               leftOuter: Boolean = false,
               matchLatest: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    def fresh(df: DataFrame, notNull: Seq[String]): DataFrame = {
      val filtered = notNull.foldLeft(df)((d, k) => d.filter(col(k).isNotNull))
      filtered.select(filtered.columns.map(n => col(n).as(n)).toSeq: _*)
    }
    // Null TIME values match nothing (SQL range/ASOF semantics): filter
    // them with the null keys — right side always; left side only under
    // inner (a left-outer null-time row must surface null-extended, which
    // the exec handles explicitly).
    val l = fresh(left,
      if (leftOuter) Seq.empty else keys.map(_._1) :+ leftTime)
    val r = fresh(right, keys.map(_._2) :+ rightTime)
    val lPlan = l.queryExecution.analyzed; val rPlan = r.queryExecution.analyzed
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${out.map(_.name)}"))
    GraftBridge.ofRows(spark, BandJoinPlan(
      keys.map(k => attr(lPlan.output, k._1)),
      keys.map(k => attr(rPlan.output, k._2)),
      attr(lPlan.output, leftTime), attr(rPlan.output, rightTime),
      lowerUs, upperUs, leftOuter, matchLatest, lPlan, rPlan))
  }

  /** ~100 TB of lookback still fits a long: an effectively-unbounded
    * as-of window that can never overflow `time + lower`. */
  private val AsofLookbackUs: Long = 10000L * 365 * 24 * 3600 * 1000000L

  /** As-of join through the same operator: for each left row, the single
    * LATEST right row with `right.time <= left.time` (DuckDB/kdb ASOF
    * semantics), optionally LEFT OUTER. Ties at the exact same right
    * time are broken arbitrarily — pre-dedup the right side per
    * (keys, time) if ties exist (see Warehouse.q47's MAX(event_id)
    * dedup). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
               leftTime: String, rightTime: String,
               leftOuter: Boolean = false): DataFrame =
    bandJoin(left, right, keys, leftTime, rightTime,
      lowerUs = -AsofLookbackUs, upperUs = 0L,
      leftOuter = leftOuter, matchLatest = true)
}
