package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The (exact count, bounded member list) of a shingle's document group —
  * the single-pass replacement for the df-cap window + self-join in the
  * near-dup pipelines (TextOps q34/q35/q37).
  *
  * Semantics: `n` is the EXACT document frequency of the shingle; `docs`
  * holds the SMALLEST `cap + 1` doc ids (ascending). A caller filtering
  * `n <= cap` therefore sees the COMPLETE member list for every surviving
  * shingle — identical to the window form `count(*) over (partition by
  * shingle) <= cap` — while a stop-shingle appearing in millions of
  * documents costs `cap + 1` longs of buffer, never an unbounded
  * collect_list. Map-side combine applies (the buffer is mergeable), so
  * the exchange carries one bounded row per (map task, shingle): this is
  * the 100 TB guard the window form lacked (the window buffered every
  * occurrence of the hottest shingle in one reducer partition before the
  * filter could drop it).
  *
  * Implemented as a native TypedImperativeAggregate (not an Aggregator
  * udaf): the buffer is a primitive long array with flat 8-byte-per-id
  * shuffle serialization. The udaf form measured ~2 CPU-seconds per query
  * at sf0.1 in Kryo encode/decode alone — one generic serializer call per
  * partial buffer crossing the exchange.
  *
  * Determinism: smallest-k of a set is order-free; merge order cannot
  * change the result.
  */
case class BoundedDocSetAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedDocSetAgg.Buf]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("docs", ArrayType(LongType, containsNull = false), nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bounded_doc_set requires a bigint doc id, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): BoundedDocSetAgg.Buf =
    new BoundedDocSetAgg.Buf(cap + 1)

  override def update(b: BoundedDocSetAgg.Buf, input: InternalRow): BoundedDocSetAgg.Buf = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: BoundedDocSetAgg.Buf, o: BoundedDocSetAgg.Buf): BoundedDocSetAgg.Buf = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: BoundedDocSetAgg.Buf): Any =
    new GenericInternalRow(Array[Any](b.count,
      new GenericArrayData(java.util.Arrays.copyOf(b.docs, b.len))))

  override def serialize(b: BoundedDocSetAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * b.len)
    bb.putLong(b.count).putInt(b.len)
    var i = 0
    while (i < b.len) { bb.putLong(b.docs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedDocSetAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new BoundedDocSetAgg.Buf(cap + 1)
    b.count = bb.getLong()
    b.len = bb.getInt()
    var i = 0
    while (i < b.len) { b.docs(i) = bb.getLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedDocSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedDocSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedDocSetAgg =
    copy(child = newChild)
  override def prettyName: String = "bounded_doc_set"
}

object BoundedDocSetAgg {
  /** Sorted-ascending bounded insert buffer: smallest `keep` ids + exact
    * total count. Plain long array; inserts are binary-search +
    * arraycopy (groups are tiny — `keep` = cap+1). */
  final class Buf(keep: Int) {
    var count: Long = 0L
    var len: Int = 0
    val docs: Array[Long] = new Array[Long](keep)

    def insert(x: Long): Unit = {
      count += 1
      var lo = 0; var hi = len
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (docs(m) < x) lo = m + 1 else hi = m
      }
      if (lo >= keep) return                 // beyond the kept prefix
      val end = math.min(len, keep - 1)      // last slot shifts out if full
      System.arraycopy(docs, lo, docs, lo + 1, end - lo)
      docs(lo) = x
      if (len < keep) len += 1
    }

    def mergeFrom(o: Buf): Unit = {
      count += o.count
      var i = 0
      while (i < o.len) { count -= 1; insert(o.docs(i)); i += 1 }
    }
  }

  /** Register `bounded_doc_set(doc, cap)` (cap a foldable int literal). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Natives.ensure(spark, "bounded_doc_set")(exprs =>
      BoundedDocSetAgg(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]).toAggregateExpression())

  /** Column-API entry: struct(n, docs) per group (requires register()). */
  def bounded_doc_set(cap: Int)(doc: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "bounded_doc_set", doc, org.apache.spark.sql.functions.lit(cap))
}

/** Native expression: all ordered pairs (a[i], a[j]), i < j, of an
  * ASCENDING-sorted long array, as array<struct<d1,d2>> — the in-row pair
  * generator that replaces the shingle self-join (the array is one
  * df-capped shingle group, so the fan-out is ≤ C(cap+1, 2) per row by
  * construction). Input sortedness is the producer's contract
  * ([[BoundedDocSet]] emits ascending); d1 < d2 follows. */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d1", LongType, nullable = false),
                   StructField("d2", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SortedPairs.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SortedPairs.pairs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Packed variant of [[SortedPairs]]: the same ordered pairs as single
  * longs `(d1 << 32) | d2` in a primitive array — no per-pair struct row
  * allocation, and the downstream group-by key is one long instead of a
  * two-field row. Valid only while every id fits an unsigned 32-bit slot;
  * the expression RAISES past that (the query builder selects this path
  * from the memoized max doc id — Tables.documentsMaxId — so the raise is
  * a contract backstop, not a control path). */
case class SortedPairKeys(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_pair_keys requires array<bigint>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SortedPairs.packedPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SortedPairs.packedPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedPairs {
  def packedPairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val di = a.getLong(i)
      if (di < 0L || di >= (1L << 32))
        throw new IllegalArgumentException(
          s"sorted_pair_keys: doc id $di outside [0, 2^32) — use sorted_pairs")
      var j = i + 1
      while (j < n) {
        val dj = a.getLong(j)
        if (dj < 0L || dj >= (1L << 32))
          throw new IllegalArgumentException(
            s"sorted_pair_keys: doc id $dj outside [0, 2^32) — use sorted_pairs")
        out(k) = (di << 32) | dj
        k += 1
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def pairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val di = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](di, a.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    // Guarded per NAME: an extension-built session injects sorted_pairs
    // but not sorted_pair_keys, so the two must be ensured independently.
    Natives.ensure(spark, "sorted_pairs")(exprs => SortedPairs(exprs.head))
    Natives.ensure(spark, "sorted_pair_keys")(exprs => SortedPairKeys(exprs.head))
  }

  def sorted_pairs(c: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_pairs", c)

  def sorted_pair_keys(c: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_pair_keys", c)
}
