package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing document fingerprints (Schleimer/
  * Wilkerson/Aiken, SIGMOD 2003 — the MOSS algorithm) over a Karp–Rabin
  * ROLLING hash of word 3-grams, in one compiled pass per document.
  *
  * Pipeline per document, all local to the row (no shuffle, no state):
  *
  *  1. tokenize — `split(text, " ", -1)`, the suite-wide token contract
  *     (identical to DuckDB `string_split`; see [[WordShingles]]).
  *  2. base-hash each token ONCE: `aᵢ = md5_long(tokenᵢ, 0, 10) mod P`
  *     (40-bit md5 slice — the oracle-portable hash contract — folded
  *     into the field `P = 2^31 − 1`).
  *  3. Karp–Rabin gram hash, genuinely rolling: `h₀ = ((a₀·B + a₁)·B +
  *     a₂) mod P` and then `hⱼ₊₁ = ((hⱼ − aⱼ·B² mod P + P)·B + aⱼ₊₃)
  *     mod P` — O(1) per gram regardless of k, one md5 per TOKEN rather
  *     than one per gram×k. Identical values to the closed form the
  *     DuckDB oracle computes (Horner with stepwise mod; every
  *     intermediate < 2^51, no overflow in either engine).
  *  4. position-encode: `key = h·2^20 + (2^20 − 1 − pos)`. A plain MIN
  *     over keys then implements the canonical winnowing tie rule for
  *     free: smallest hash first, RIGHTMOST position among equal hashes
  *     (larger pos ⇒ smaller key). Fits 51 bits; documents beyond 2^20
  *     grams are rejected with a named error rather than silently
  *     corrupting keys (same stance as the simhash capacity guard).
  *  5. winnow: over every window of `W = 4` consecutive gram keys
  *     (documents with 1..3 grams form one truncated window, so every
  *     shingleable document yields ≥1 fingerprint), select the window
  *     minimum via a monotonic deque — O(n) total, not O(n·W) — and emit
  *     the distinct selected keys in first-selection order.
  *
  * Guarantee (the reason pipelines fingerprint this way): any two
  * documents sharing ≥ W + k − 1 = 6 consecutive tokens share ≥ 1
  * fingerprint HASH (`key >> 20`) — a full window of shared grams exists
  * and its minimum is selected in both documents. WinnowSpec pins this
  * property, the composed-form parity, and the edge cases.
  *
  * Reference coverage: the reference has no substring-level fingerprint
  * (its dedup is whole-row; etl.py:69-101 drops exact duplicate order
  * lines) — this is part of the large-scale pipeline surface the north
  * star adds on top, alongside q33..q38.
  */
case class WinnowKeys(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_keys requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    WinnowKeys.winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowKeys.winnow($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowKeys {
  /** Gram width (tokens) — matches the suite's 3-gram shingles. */
  val K = 3
  /** Winnow window (grams). Guarantee threshold = W + K − 1 = 6 tokens. */
  val W = 4
  /** Rolling-hash base and modulus (P = 2^31 − 1; products stay < 2^51). */
  val B = 1000003L
  val P = 2147483647L
  /** Position bits: pos < 2^20 grams per document. */
  val PosBits = 20
  private val PosMask = (1L << PosBits) - 1
  private val B2 = B * B % P // aⱼ·B² mod P leaves the window in one step

  def winnow(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length - (K - 1) // gram count
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    if (n > (1L << PosBits))
      throw new IllegalStateException(
        s"winnow_keys: document has $n grams, beyond the 2^$PosBits position " +
          "encoding capacity — fingerprint longer documents in chunks")
    // token base hashes, one md5 per token (mod P up front)
    val a = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      a(i) = java.lang.Long.remainderUnsigned(
        Md5Long.hash(toks(i).getBytes("UTF-8"), 0, 10), P)
      i += 1
    }
    // rolling gram keys
    val key = new Array[Long](n)
    var h = (a(0) * B % P + a(1)) % P * B % P
    h = (h + a(2)) % P
    key(0) = (h << PosBits) | PosMask
    var j = 1
    while (j < n) {
      h = ((h - a(j - 1) * B2 % P + P) % P * B % P + a(j + K - 1)) % P
      key(j) = (h << PosBits) | (PosMask - j)
      j += 1
    }
    // sliding-window minimum (monotonic deque of indices), distinct keys
    val selected = new mutable.LinkedHashSet[Long]
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    j = 0
    while (j < n) {
      while (tail > head && key(deque(tail - 1)) > key(j)) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - W) head += 1
      if (j >= W - 1) selected += key(deque(head))
      j += 1
    }
    if (n < W) selected += key(deque(head)) // single truncated window
    val out = new Array[Any](selected.size)
    i = 0
    selected.foreach { k => out(i) = k; i += 1 }
    new GenericArrayData(out)
  }

  /** Register `winnow_keys(str)` in the session function registry
    * (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Natives.ensure(spark, "winnow_keys")(exprs => WinnowKeys(exprs.head))

  /** Column-API entry point (requires register()). */
  def winnow_keys(c: Column): Column =
    org.apache.spark.sql.functions.call_function("winnow_keys", c)
}
