package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

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
  * WHOLE-STAGE CODEGEN (round 7): BandJoinExec implements CodegenSupport
  * the way SortMergeJoinExec does — both sorted children arrive as the
  * stage's two input iterators (WholeStageCodegenExec zip-partitions a
  * two-RDD stage), the merge state machine is the compiled
  * [[BandMerger]], and the generated loop drives advance()/nextRight()
  * and CONSUMES each joined row inline, so downstream projections,
  * filters and partial aggregates fuse into the same generated function
  * with no iterator hop or UnsafeProjection materialization per row.
  * One stock-Spark asymmetry is out of reach: CollapseCodegenStages
  * special-cases SMJ/SHJ *by class* to wrap their children in
  * InputAdapter, so for a third-party join the two Sort operators sit
  * outside the produce chain (they run their normal non-codegen
  * doExecute). The join itself — and everything above it — is inside the
  * WholeStageCodegen stage (BandJoinSpec pins this).
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

/** Per-partition merge state machine shared by the codegen and iterator
  * execution paths (one implementation ⇒ the two paths cannot diverge).
  *
  * Protocol: `hasPending || advance()` positions on a left row with work;
  * `currentLeft()` is that row (zero-copy — the child iterator's reuse
  * contract is honored because the row is fully consumed before the next
  * advance); `nextRight()` yields the window's right rows and then null
  * (for an unmatched LEFT OUTER row it yields the all-null right row
  * once). The generated loop re-enters after shouldStop() returns and
  * resumes exactly where it stopped via hasPending. */
final class BandMerger(
    lIter: Iterator[InternalRow], rIterRaw: Iterator[InternalRow],
    lKeyOrds: Array[Int], rKeyOrds: Array[Int],
    lTimeOrd: Int, rTimeOrd: Int,
    keyTypes: Array[DataType],
    lFieldTypes: Array[DataType], rFieldTypes: Array[DataType],
    lo: Long, hi: Long, outer: Boolean, matchLatest: Boolean,
    inMemT: Int, spillT: Int, spillB: Long) {

  private val rIter = rIterRaw.buffered
  private val ord = RowOrdering.createNaturalAscendingOrdering(keyTypes.toIndexedSeq)
  private val lKeyProj = UnsafeProjection.create(lKeyOrds.map(i =>
    BoundReference(i, lFieldTypes(i), nullable = true)).toIndexedSeq)
  private val rKeyProj = UnsafeProjection.create(rKeyOrds.map(i =>
    BoundReference(i, rFieldTypes(i), nullable = true)).toIndexedSeq)
  /** all-null right row for LEFT OUTER emission */
  val nullRight: InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rFieldTypes.length)

  private var curKey: UnsafeRow = _                  // copied on group change
  // Right key-group: rows in SortMergeJoin's spill-aware buffer (a
  // pathological group degrades to disk instead of OOM); sorted event
  // times kept on-heap for the binary search (8 B/row — the documented
  // residual bound; the row payloads are the spillable bulk).
  private val group = new org.apache.spark.sql.GraftRowBuffer(inMemT, spillT, spillB)
  private val times = new ArrayBuffer[Long]()
  private var groupIter: Iterator[UnsafeRow] = Iterator.empty
  private var curLeft: InternalRow = _               // zero-copy streamed row
  private var cursor = 0                             // next group index for curLeft
  private var windowEnd = 0L
  private var emitNull = false                       // left_outer: unmatched curLeft

  // conversion fallback for direct construction over non-Unsafe rows (the
  // planned path always feeds UnsafeRows via SortExec); GraftRowBuffer.add
  // copies internally, so the reused projection output is safe to pass
  private val rToUnsafe = UnsafeProjection.create(rFieldTypes)

  // first group index with time >= t
  private def lowerBound(t: Long): Int = {
    var a = 0; var b = times.length
    while (a < b) {
      val m = (a + b) >>> 1
      if (times(m) < t) a = m + 1 else b = m
    }
    a
  }

  private def loadRightGroup(key: UnsafeRow): Unit = {
    group.clear(); times.clear(); groupIter = Iterator.empty
    while (rIter.hasNext && ord.compare(rKeyProj(rIter.head), key) < 0)
      rIter.next()
    while (rIter.hasNext && ord.compare(rKeyProj(rIter.head), key) == 0) {
      val r = rIter.next()
      // a NULL right time matches nothing (SQL range semantics) and would
      // corrupt the sorted times buffer (getLong on a null field reads
      // 0 = epoch); the API filters them, this guards direct construction
      // too. Nulls sort first under the required ascending order, so
      // skipping preserves sortedness.
      if (!r.isNullAt(rTimeOrd)) {
        times += r.getLong(rTimeOrd)
        group.add(r match {
          case u: UnsafeRow => u
          case other        => rToUnsafe(other)
        })
      }
    }
  }

  def currentLeft(): InternalRow = curLeft

  /** Matches (or the pending null-emit) remain for the current left row. */
  def hasPending: Boolean =
    emitNull || (curLeft != null && cursor < times.length && times(cursor) <= windowEnd)

  /** Position on the next left row with matches — or, in left-outer mode,
    * on the next unmatched left row with the null-emit pending.
    *
    * No copy of the streamed left row: the child's iterator may reuse the
    * row object, but it is only mutated by the NEXT lIter.next(), which
    * cannot happen until this left row's matches are fully emitted
    * (consume-then-process, the same zero-copy discipline as
    * SortMergeJoin's streamed side). The key projection is copied only on
    * group change. */
  def advance(): Boolean = {
    curLeft = null
    while (lIter.hasNext) {
      val l = lIter.next()
      val lk = lKeyProj(l)
      if (curKey == null || ord.compare(lk, curKey) != 0) {
        curKey = lk.copy()
        loadRightGroup(curKey)
      }
      if (l.isNullAt(lTimeOrd)) {
        // NULL left time: matches nothing. Inner: drop (the API already
        // filters; this covers direct construction). Left outer: emit
        // null-extended, like any unmatched row.
        if (outer) { cursor = times.length; curLeft = l; emitNull = true; return true }
      } else {
        val lt = l.getLong(lTimeOrd)
        val start = if (times.isEmpty) 0 else lowerBound(lt + lo)
        if (start < times.length && times(start) <= lt + hi) {
          curLeft = l
          if (matchLatest) {
            // as-of: only the greatest right time in the window — the
            // last index with time <= lt+hi; windowEnd = its own time
            // stops the emit loop after exactly one row (the next index,
            // if any, is strictly greater)
            cursor = lowerBound(lt + hi + 1) - 1
            windowEnd = times(cursor)
          } else {
            cursor = start; windowEnd = lt + hi
          }
          // fresh iterator per left row: overlapping windows move the
          // start backward relative to the previous row's last position.
          // In-memory this is O(1) positioning; spilled it is a
          // sequential skip — the same trade SortMergeJoin makes
          // re-iterating its buffered group per streamed row.
          groupIter = group.iteratorFrom(cursor)
          return true
        } else if (outer) {
          // empty the window state: a stale cursor from the previous
          // row could otherwise read as pending after the null-emit
          cursor = times.length
          curLeft = l; emitNull = true
          return true
        }
      }
    }
    false
  }

  /** Next right row of the current left row's window, or null when done.
    * For an unmatched LEFT OUTER left row: the all-null right row once.
    * Callers must capture currentLeft() BEFORE calling (the null-emit
    * consumes the left row). */
  def nextRight(): InternalRow = {
    if (emitNull) { emitNull = false; curLeft = null; return nullRight }
    if (curLeft == null) return null
    if (cursor < times.length && times(cursor) <= windowEnd) {
      // the returned row may be a reused buffer on the spilled path, but
      // it is fully consumed (projected/consumed inline) before the next
      // call
      val r = groupIter.next(); cursor += 1
      r
    } else {
      curLeft = null
      null
    }
  }
}

/** Driver-built, task-serialized factory: captures ordinals, types and
  * buffer thresholds (SQLConf is driver-side only) and builds one
  * [[BandMerger]] per partition — from generated code (codegen path) or
  * zipPartitions (iterator path). */
case class BandMergerFactory(
    lKeyOrds: Array[Int], rKeyOrds: Array[Int],
    lTimeOrd: Int, rTimeOrd: Int,
    keyTypes: Array[DataType],
    lFieldTypes: Array[DataType], rFieldTypes: Array[DataType],
    lo: Long, hi: Long, outer: Boolean, matchLatest: Boolean,
    inMemT: Int, spillT: Int, spillB: Long) {
  def create(l: Iterator[InternalRow], r: Iterator[InternalRow]): BandMerger =
    new BandMerger(l, r, lKeyOrds, rKeyOrds, lTimeOrd, rTimeOrd, keyTypes,
      lFieldTypes, rFieldTypes, lo, hi, outer, matchLatest, inMemT, spillT, spillB)
}

case class BandJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    lowerUs: Long, upperUs: Long, leftOuter: Boolean, matchLatest: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode with CodegenSupport {

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

  private def mergerFactory: BandMergerFactory = {
    val lSchema = left.output; val rSchema = right.output
    BandMergerFactory(
      leftKeys.map(ordinalOf(lSchema, _)).toArray,
      rightKeys.map(ordinalOf(rSchema, _)).toArray,
      ordinalOf(lSchema, leftTime), ordinalOf(rSchema, rightTime),
      leftKeys.map(_.dataType).toArray,
      lSchema.map(_.dataType).toArray, rSchema.map(_.dataType).toArray,
      lowerUs, upperUs, leftOuter, matchLatest,
      conf.sortMergeJoinExecBufferInMemoryThreshold,
      conf.sortMergeJoinExecBufferSpillThreshold,
      conf.sortMergeJoinExecBufferSpillSizeThreshold)
  }

  // ------------------------------------------------- iterator path
  override protected def doExecute(): RDD[InternalRow] = {
    val factory = mergerFactory
    val outAttrs = output
    val lSchema = left.output
    // left outer: bind against nullable right attrs, else the generated
    // projection skips the null check and reads 0 from the null row
    val rBindSchema =
      if (leftOuter) right.output.map(_.withNullability(true)) else right.output

    left.execute().zipPartitions(right.execute()) { (lRaw, rRaw) =>
      val merger = factory.create(lRaw, rRaw)
      val resultProj = UnsafeProjection.create(outAttrs, lSchema ++ rBindSchema)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        private var ready: InternalRow = _
        override def hasNext: Boolean = {
          while (ready == null && (merger.hasPending || merger.advance())) {
            val l = merger.currentLeft() // capture BEFORE nextRight (null-emit)
            val r = merger.nextRight()
            if (r != null) ready = resultProj(joined(l, r))
          }
          ready != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val out = ready; ready = null; out
        }
      }
    }
  }

  // ------------------------------------------------- codegen path
  // Both sorted children are stage inputs (WholeStageCodegenExec supports
  // two input RDDs and zip-partitions them, the SMJ arrangement); the
  // produce chain therefore STOPS here — children are executed, not fused.
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // each left row fans out to its whole window → downstream buffering
  // operators must copy (same flag as SMJ)
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "leftInput",
      v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "rightInput",
      v => s"$v = inputs[1];", forceInline = true)
    val factoryRef = ctx.addReferenceObj("bandFactory", mergerFactory,
      classOf[BandMergerFactory].getName)
    val mergerCls = classOf[BandMerger].getName
    val merger = ctx.addMutableState(mergerCls, "bandMerger",
      v => s"$v = $factoryRef.create((scala.collection.Iterator)$leftInput, " +
        s"(scala.collection.Iterator)$rightInput);", forceInline = true)
    val joinedCls = classOf[JoinedRow].getName
    val joinRow = ctx.addMutableState(joinedCls, "bandJoinRow",
      v => s"$v = new $joinedCls();", forceInline = true)

    val leftRow = ctx.freshName("leftRow")
    val rightRow = ctx.freshName("rightRow")

    // output columns read straight off the joined row (nullable right
    // binding under LEFT OUTER comes from `output` itself)
    ctx.currentVars = null
    ctx.INPUT_ROW = joinRow
    val resultVars = output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }

    s"""
       |while ($merger.hasPending() || $merger.advance()) {
       |  InternalRow $leftRow = $merger.currentLeft();
       |  InternalRow $rightRow;
       |  while (($rightRow = $merger.nextRight()) != null) {
       |    $joinRow.apply($leftRow, $rightRow);
       |    ${consume(ctx, resultVars)}
       |    if (shouldStop()) return;
       |  }
       |}
     """.stripMargin
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
