package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Single idempotent registrar for the engine's native (codegen'd)
  * expressions and aggregates.
  *
  * Registration used to live beside every consumer (the round-11 lesson:
  * `sq_dist` resolved only when the index BUILD had run in-session), but
  * each consumer re-ran `createOrReplaceTempFunction`, flooding logs with
  * `SimpleFunctionRegistry ... replaced a previously registered function`
  * warnings — and registration-order coupling in this class already
  * produced one real bug. The fix is structural: every `register` is
  * per-NAME idempotent via [[ensure]] (a name injected at session build by
  * [[GraftExtensions]] is also honored — no shadowing re-registration),
  * and consumers call the one [[registerAll]] entry point so no path can
  * depend on which consumer ran first.
  */
object Natives {
  /** Register `name` only if the session doesn't already resolve it
    * (covers both a prior `registerAll` and session-build injection via
    * [[GraftExtensions]]). Guarded per NAME, not per register() call,
    * because one register() may add several names (e.g. `sorted_pairs` +
    * `sorted_pair_keys`) of which an extension-built session injects only
    * a subset. */
  private[functions] def ensure(s: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit =
    if (!s.sessionState.functionRegistry.functionExists(FunctionIdentifier(name)))
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")

  /** Register every graft native exactly once per session. Cheap when
    * already registered (ten registry lookups), so consumers call it
    * unconditionally at their entry points. Synchronized on the session:
    * concurrent first-callers (e.g. parallel test suites sharing a
    * session) must not interleave exists-check and registration. */
  def registerAll(s: SparkSession): Unit = s.synchronized {
    DotProduct.register(s)
    SqDist.register(s)
    Md5Long.register(s)
    PqAdc.register(s)
    WordShingles.register(s)
    WinnowKeys.register(s)
    SortedPairs.register(s)
    GramStats.register(s)
    BitmapAgg.register(s)
    BoundedDocSetAgg.register(s)
    HilbertIdx.register(s)
    SignCode.register(s)
  }
}
